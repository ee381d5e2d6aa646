"""Streaming extraction must equal the batch path, incrementally: feed files
in two waves; after each availableNow run the sink holds exactly the docs
seen so far, classified identically to batch."""

import pathlib

import pyarrow.parquet as pq
import pytest

from wordscape_spark import datagen
from wordscape_spark.operators import extract as X
from wordscape_spark.streaming import stream as S


@pytest.fixture(scope="module")
def waves(tmp_path_factory):
    src = datagen.ensure_interleaved(0.001)
    table = pq.read_table(src)
    indir = tmp_path_factory.mktemp("stream_in")
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), str(indir / "wave1.parquet"))
    wave2 = table.slice(half)
    return indir, wave2, table


def _run_wave(spark, indir, outdir, cpdir):
    q = S.stream_extract(spark, str(indir), str(outdir), str(cpdir))
    q.awaitTermination(300)


def test_stream_matches_batch_incrementally(spark, waves, tmp_path):
    indir, wave2, table = waves
    outdir, cpdir = tmp_path / "out", tmp_path / "cp"

    _run_wave(spark, indir, outdir, cpdir)
    got1 = spark.read.parquet(str(outdir))
    assert got1.count() == table.num_rows // 2

    pq.write_table(wave2, str(pathlib.Path(indir) / "wave2.parquet"))
    _run_wave(spark, indir, outdir, cpdir)

    got = spark.read.parquet(str(outdir))
    assert got.count() == table.num_rows

    batch = X.extract(
        spark.read.parquet(str(datagen.ensure_interleaved(0.001)))
    )
    a = sorted(
        (r["doc_id"], r["ok"], r["text"], str(r["spans"]))
        for r in got.select("doc_id", "ok", "text", "spans").collect()
    )
    b = sorted(
        (r["doc_id"], r["ok"], r["text"], str(r["spans"]))
        for r in batch.select("doc_id", "ok", "text", "spans").collect()
    )
    assert a == b
