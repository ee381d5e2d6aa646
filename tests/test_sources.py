"""Source-boundary schema normalization (ADVICE r3).

A conforming producer table whose span struct children are REORDERED or
width-drifted (offset int64) must flow through extraction identically to the
canonical layout — the Arrow hot path decodes struct children, so the source
boundary canonicalizes by name.  NULL n_spans rows must never be dropped.
"""

import pyspark.sql.functions as F
import pytest

from wordscape_spark import datagen
from wordscape_spark.config import DEFAULT_CONFIG
from wordscape_spark.operators import extract as X
from wordscape_spark.sources.tables import normalize_docs, read_docs


def _canonical_docs(spark):
    path = datagen.ensure_interleaved(0.001)
    return read_docs(spark, path).drop("n_spans").limit(40)


def _reordered_path(spark, tmp_path):
    """The sf0.001 docs rewritten with struct children in REVERSED order
    (offset, media_ref, text, kind) and offset widened to int64."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(datagen.ensure_interleaved(0.001))
    docs = src.to_pylist()[:40]
    span_t = pa.struct([
        ("offset", pa.int64()),
        ("media_ref", pa.string()),
        ("text", pa.string()),
        ("kind", pa.string()),
    ])
    rewritten = [
        {"doc_id": d["doc_id"],
         "spans": [
             {"offset": s["offset"], "media_ref": s["media_ref"],
              "text": s["text"], "kind": s["kind"]}
             for s in d["spans"]
         ]}
        for d in docs
    ]
    table = pa.Table.from_pylist(
        rewritten, schema=pa.schema([("doc_id", pa.string()),
                                     ("spans", pa.list_(span_t))])
    )
    path = str(tmp_path / "reordered.parquet")
    pq.write_table(table, path)
    return path


def test_reordered_struct_fields_extract_identically(spark, tmp_path):
    path = _reordered_path(spark, tmp_path)
    got = {r["doc_id"]: r for r in
           X.extract(read_docs(spark, path), DEFAULT_CONFIG).collect()}
    want = {r["doc_id"]: r for r in
            X.extract(_canonical_docs(spark), DEFAULT_CONFIG).collect()}
    assert set(got) == set(want) and len(want) == 40
    for doc_id in want:
        assert got[doc_id]["ok"] == want[doc_id]["ok"], doc_id
        assert (got[doc_id]["reject_reason"]
                == want[doc_id]["reject_reason"]), doc_id
        g = [(s["kind"], s["text"], s["media_ref"], s["offset"])
             for s in got[doc_id]["spans"]]
        w = [(s["kind"], s["text"], s["media_ref"], s["offset"])
             for s in want[doc_id]["spans"]]
        assert g == w, doc_id
    assert any(r["ok"] and r["spans"] for r in want.values())


def test_normalize_docs_canonical_schema_and_errors(spark):
    df = normalize_docs(_canonical_docs(spark))
    assert [f.name for f in df.schema["spans"].dataType.elementType.fields] \
        == ["kind", "text", "media_ref", "offset"]
    with pytest.raises(ValueError, match="doc_id"):
        normalize_docs(spark.range(3))
    bad = _canonical_docs(spark).withColumn(
        "spans", F.expr("transform(spans, s -> named_struct('kind', s.kind))")
    )
    with pytest.raises(ValueError, match="missing fields"):
        normalize_docs(bad)


def test_null_n_spans_routes_to_small_path(spark):
    """Rows with NULL n_spans must be classified, not dropped (ADVICE r3):
    NULL the size column on half the docs and require full output parity
    with the no-column run."""
    base = _canonical_docs(spark)
    docs = base.withColumn(
        "n_spans",
        F.when(F.crc32(F.col("doc_id")) % 2 == 0, F.lit(None).cast("long"))
         .otherwise(F.size("spans").cast("long")),
    )
    out = {r["doc_id"]: r for r in X.extract(docs, DEFAULT_CONFIG).collect()}
    want = {r["doc_id"]: r for r in X.extract(base, DEFAULT_CONFIG).collect()}
    assert set(out) == set(want)
    for doc_id in want:
        assert out[doc_id]["ok"] == want[doc_id]["ok"], doc_id
        assert len(out[doc_id]["spans"]) == len(want[doc_id]["spans"]), doc_id
