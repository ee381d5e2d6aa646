"""Hand-authored literal fixtures (wordscape_spark/fixtures.py): the
classifier must reproduce span sequences that were derived BY HAND from the
reference semantics — no repo code generated the expectations, so this is an
independent pin (unlike the golden parquet, which the same classifier code
materializes)."""

from wordscape_spark.core.classify import classify_document
from wordscape_spark.fixtures import (
    FIXTURE_EXPECTED,
    FIXTURE_EXPECTED_REJECTS,
    FIXTURE_INPUT,
    fixture_rows,
)
from wordscape_spark.operators import extract as X

_REJECTED = {d for d, _ in FIXTURE_EXPECTED_REJECTS}


def _python_spans():
    got, rejects = [], []
    for doc_id, spans in FIXTURE_INPUT:
        tuples = [(k, t, m, i) for i, (k, t, m) in enumerate(spans)]
        res = classify_document(tuples)
        if not res.ok:
            rejects.append((doc_id, res.reject_reason))
            continue
        for (kind, text, media_ref, off), page in zip(
            res.spans, res.span_pages
        ):
            got.append((doc_id, off, kind, text, media_ref, page))
    return got, rejects


def test_python_oracle_matches_hand_derived_literals():
    got, rejects = _python_spans()
    assert got == list(FIXTURE_EXPECTED)
    assert rejects == list(FIXTURE_EXPECTED_REJECTS)


def test_every_accepted_fixture_clears_min_text_gate():
    for doc_id, spans in FIXTURE_INPUT:
        if doc_id in _REJECTED:
            continue
        tuples = [(k, t, m, i) for i, (k, t, m) in enumerate(spans)]
        res = classify_document(tuples)
        assert res.ok and len(res.text) >= 200, doc_id


def test_docx_roundtrip_matches_hand_derived_literals():
    """Fixtures → .docx bytes (independent inverse renderer) → OOXML parse →
    classify must ALSO reproduce the hand literals: pins the whole raw-byte
    ingestion chain (docx.py zip + document.xml walk) against expectations
    no repo code generated."""
    from wordscape_spark.docxgen import build_docx
    from wordscape_spark.operators.docx import parse_docx_bytes

    got, rejects = [], []
    for doc_id, spans in FIXTURE_INPUT:
        rows = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ]
        tuples = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in parse_docx_bytes(build_docx(rows))
        ]
        res = classify_document(tuples)
        if not res.ok:
            rejects.append((doc_id, res.reject_reason))
            continue
        for (kind, text, media_ref, off), page in zip(
            res.spans, res.span_pages
        ):
            got.append((doc_id, off, kind, text, media_ref, page))
    assert got == list(FIXTURE_EXPECTED)
    assert rejects == list(FIXTURE_EXPECTED_REJECTS)


def test_spark_extract_matches_hand_derived_literals(spark):
    docs = spark.createDataFrame(fixture_rows(), schema=X.INPUT_SCHEMA)
    rows = (
        X.extract(docs)
        .filter("ok")
        .selectExpr("doc_id", "explode(spans) AS s")
        .selectExpr(
            "doc_id", "s.offset", "s.kind", "s.text", "s.media_ref", "s.page"
        )
        .collect()
    )
    got = sorted(tuple(r) for r in rows)
    assert got == sorted(FIXTURE_EXPECTED)
