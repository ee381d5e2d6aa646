"""Checkpointed, resumable extraction runs with lineage + metrics tables.

The reference resumes by reconciling logs against listings and anti-joining
already-processed hashes (cc_parse_merge_and_recover_urls.py:71-101,
download_dump_data.py:155-160).  Here the same pattern is table-ified:

* the input is split into ``n_buckets`` deterministic partitions
  (``pmod(hash(doc_id), n))`` — the analog of Iceberg ``bucket(doc_id)``
  partitions on a real cluster);
* each bucket's output is written to its own directory, then a row is
  appended to the ``lineage`` table: (bucket, status, n_docs, n_ok,
  n_rejected, docs_per_sec);
* on restart, completed buckets are skipped (anti-join of buckets against
  lineage) — a killed run resumes idempotently and the final output is
  byte-identical (tested).

On a 1000-executor cluster each "bucket" is a partition-granularity commit;
the driver loop below is the sandbox stand-in for Iceberg's atomic
per-partition commits + snapshot metadata.
"""

from __future__ import annotations

import json
import pathlib
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wordscape_spark.config import DEFAULT_CONFIG, ExtractConfig
from wordscape_spark.operators import extract as X

LINEAGE_COLS = (
    "bucket",
    "status",
    "n_docs",
    "n_ok",
    "n_rejected",
    "wall_secs",
    "docs_per_sec",
)


def _lineage_path(out_dir: str) -> pathlib.Path:
    return pathlib.Path(out_dir) / "lineage.jsonl"


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    p = _lineage_path(out_dir)
    if not p.exists():
        return spark.createDataFrame([], "bucket INT, status STRING, n_docs LONG, n_ok LONG, n_rejected LONG, wall_secs DOUBLE, docs_per_sec DOUBLE")
    return spark.read.json(str(p))


def completed_buckets(out_dir: str) -> set[int]:
    p = _lineage_path(out_dir)
    done: set[int] = set()
    if p.exists():
        for line in p.read_text().splitlines():
            row = json.loads(line)
            if row.get("status") == "done":
                done.add(int(row["bucket"]))
    return done


def run_extract_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    fail_after: int | None = None,
) -> DataFrame:
    """Run extraction bucket-by-bucket with resume.

    ``fail_after`` aborts after N buckets (test hook for kill/resume).
    Returns the unioned extracted output read back from disk.
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    docs = docs.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )
    done = completed_buckets(str(out))
    lineage = _lineage_path(str(out))

    processed = 0
    for bucket in range(n_buckets):
        if bucket in done:
            continue  # idempotent resume: skip committed buckets
        t0 = time.monotonic()
        part = docs.filter(F.col("bucket") == bucket).drop("bucket")
        extracted = X.extract(part, cfg)
        target = out / f"bucket={bucket}"
        extracted.write.mode("overwrite").parquet(str(target))
        res = (
            spark.read.parquet(str(target))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("ok").cast("long")).alias("n_ok"),
            )
            .first()
        )
        wall = time.monotonic() - t0
        row = {
            "bucket": bucket,
            "status": "done",
            "n_docs": int(res["n"] or 0),
            "n_ok": int(res["n_ok"] or 0),
            "n_rejected": int((res["n"] or 0) - (res["n_ok"] or 0)),
            "wall_secs": round(wall, 3),
            "docs_per_sec": round((res["n"] or 0) / wall, 3) if wall > 0 else 0.0,
        }
        # append-only commit record — written *after* the bucket's data
        with lineage.open("a") as f:
            f.write(json.dumps(row) + "\n")
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} buckets")

    return spark.read.parquet(str(out / "bucket=*"))


def metrics_table(spark: SparkSession, out_dir: str) -> DataFrame:
    """Aggregate run metrics (the reference monitor's pages/s analog,
    annotate_run.py:65-156) from lineage rows."""
    lin = read_lineage(spark, out_dir)
    return lin.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum("n_ok").alias("total_ok"),
        F.sum("n_rejected").alias("total_rejected"),
        F.sum("wall_secs").alias("total_wall_secs"),
        F.expr("round(sum(n_docs) / sum(wall_secs), 3)").alias("docs_per_sec"),
    )
