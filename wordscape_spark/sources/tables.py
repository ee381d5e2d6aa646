"""Source/sink layer.

Reads (SURVEY §2.1 A1/A5, §2.5 E5):
* ``read_docs`` — the interleaved documents table.  Prefers an Iceberg
  catalog table when ``iceberg://db.table`` is given (partition pruning +
  snapshot isolation at 10^12 rows; needs the iceberg-spark runtime jar on a
  real cluster — not shipped in this sandbox, so the parquet path is the
  tested one), else a parquet directory/file with an enforced schema.
* ``read_jsonl`` — schema-checked union of jsonl shards (the reference's
  merge_annotations_metadata.py:28-116 as a plain multi-path read).
* ``read_binary_dir`` — raw byte payloads via Spark's binaryFile source
  (the WAT/tar-member scan analog, cc_url_process.py:81-183).

Sinks (B5/annotation shard rotation):
* ``write_sharded`` — parquet with bounded records per file (the tar-shard
  rotation analog, download_process.py:163-179) — at scale prefer Iceberg
  write.target-file-size-bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wordscape_spark.operators.extract import INPUT_SCHEMA


def read_docs(spark: SparkSession, location: str) -> DataFrame:
    if location.startswith("iceberg://"):
        return spark.read.format("iceberg").load(location[len("iceberg://"):])
    df = spark.read.parquet(location)
    # keep the maintained n_spans size column when the producer wrote it
    # (extract's salt split prunes on it via row-group stats); otherwise
    # project exactly the contract columns
    cols = ["doc_id", "spans"] + (
        ["n_spans"] if "n_spans" in df.columns else []
    )
    return df.select(*cols)


def read_jsonl(spark: SparkSession, location: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(location)


def read_binary_dir(spark: SparkSession, location: str, glob: str = "*") -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(location)
    )


def write_sharded(
    df: DataFrame, path: str, max_records_per_file: int = 50_000,
    mode: str = "overwrite",
) -> None:
    (
        df.write.option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .parquet(path)
    )
