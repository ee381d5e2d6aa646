"""Hand-authored literal fixtures (wordscape_spark/fixtures.py): the
classifier must reproduce span sequences that were derived BY HAND from the
reference semantics — no repo code generated the expectations, so this is an
independent pin (unlike the golden parquet, which the same classifier code
materializes)."""

from wordscape_spark.core.classify import classify_document
from wordscape_spark.fixtures import (
    FIXTURE_EXPECTED,
    FIXTURE_INPUT,
    fixture_rows,
)
from wordscape_spark.operators import extract as X


def _python_spans():
    got = []
    for doc_id, spans in FIXTURE_INPUT:
        tuples = [(k, t, m, i) for i, (k, t, m) in enumerate(spans)]
        res = classify_document(tuples)
        assert res.ok, f"{doc_id} rejected: {res.reject_reason}"
        for (kind, text, media_ref, off), page in zip(
            res.spans, res.span_pages
        ):
            got.append((doc_id, off, kind, text, media_ref, page))
    return got


def test_python_oracle_matches_hand_derived_literals():
    assert _python_spans() == list(FIXTURE_EXPECTED)


def test_every_fixture_clears_min_text_gate():
    for doc_id, spans in FIXTURE_INPUT:
        tuples = [(k, t, m, i) for i, (k, t, m) in enumerate(spans)]
        res = classify_document(tuples)
        assert res.ok and len(res.text) >= 200, doc_id


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
