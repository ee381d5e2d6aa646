"""Custom stateful streaming operators: state survives across micro-batches
and query restarts (applyInPandasWithState)."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_wave(path, rows):
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("key", pa.string()), ("doc_id", pa.string())]
            ),
        ),
        str(path),
    )


def test_stateful_first_k_across_batches(spark, tmp_path):
    from wordscape_spark.streaming.stateful import (
        FIRST_K_OUTPUT,
        stateful_first_k,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    _write_wave(
        indir / "w1.parquet",
        [{"key": "a", "doc_id": f"a{i}"} for i in range(2)]
        + [{"key": "b", "doc_id": "b0"}],
    )

    schema = "key string, doc_id string"
    outdir, cpdir = str(tmp_path / "out"), str(tmp_path / "cp")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir))
        )
        q = (
            stateful_first_k(stream, "key", k=3)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", cpdir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    got1 = {
        (r["key"], r["doc_id"], r["rank_in_key"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert got1 == {("a", "a0", 1), ("a", "a1", 2), ("b", "b0", 1)}

    # wave 2 in a NEW query run: state must resume from the checkpoint —
    # key 'a' has 2 seen, so only one more is admitted; 'c' is fresh
    _write_wave(
        indir / "w2.parquet",
        [{"key": "a", "doc_id": f"a{i}"} for i in range(2, 5)]
        + [{"key": "c", "doc_id": "c0"}],
    )
    run_once()
    got2 = {
        (r["key"], r["doc_id"], r["rank_in_key"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert got2 == got1 | {("a", "a2", 3), ("c", "c0", 1)}
    assert len(FIRST_K_OUTPUT.fields) == 3


def test_stateful_source_stats(spark, tmp_path):
    from wordscape_spark.streaming.stateful import stateful_source_stats

    indir = tmp_path / "in"
    indir.mkdir()
    rows = [
        {"source": "s1", "ok": True, "quality": 0.5},
        {"source": "s1", "ok": False, "quality": 0.0},
        {"source": "s2", "ok": True, "quality": 1.0},
    ]
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("ok", pa.bool_()),
                    ("quality", pa.float64()),
                ]
            ),
        ),
        str(indir / "w1.parquet"),
    )
    stream = (
        spark.readStream.schema("source string, ok boolean, quality double")
        .parquet(str(indir))
    )
    outdir, cpdir = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        stateful_source_stats(stream)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", cpdir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["source"]: r for r in spark.read.parquet(outdir).collect()}
    assert got["s1"]["docs_total"] == 2
    assert got["s1"]["ok_total"] == 1
    assert got["s1"]["mean_quality"] == 0.25
    assert got["s2"]["docs_total"] == 1
    assert got["s2"]["mean_quality"] == 1.0
