"""Dataset shaping (E10) — the reference's extension-dataset filters
(README_EXTENSIONS.md:62-78, wordscape_yolo_formatter.py:15-93):
entity-class drops, class merges (heading_1..9 → heading), quality/language
thresholds, per-class minimum counts, stratified sampling.

Sampling is *hash-based*, not ``sample()``: ``pmod(hash(doc_id), 100) <
pct`` is deterministic under any partitioning/retry (a requirement the
reference meets trivially by being single-pass; Spark's seeded sample is not
stable across partitionings), and it is reproducible by the SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# default class merge: all heading levels into one class
HEADING_MERGE = {f"heading_{i}": "heading" for i in range(1, 10)}


def remap_kinds(
    spans: DataFrame, mapping: dict[str, str] | None = None
) -> DataFrame:
    """Merge/rename span classes (exploded spans input: doc_id, kind, ...)."""
    mapping = HEADING_MERGE if mapping is None else mapping
    expr = "CASE " + " ".join(
        f"WHEN kind = '{src}' THEN '{dst}'" for src, dst in mapping.items()
    ) + " ELSE kind END"
    return spans.withColumn("kind", F.expr(expr))


def drop_classes(spans: DataFrame, drop: tuple[str, ...]) -> DataFrame:
    return spans.filter(~F.col("kind").isin(list(drop)))


def class_minimum_filter(spans: DataFrame, min_count: int) -> DataFrame:
    """Keep only classes with at least ``min_count`` spans corpus-wide —
    one tiny aggregate broadcast back (never a window over all spans)."""
    counts = spans.groupBy("kind").agg(F.count("*").alias("n"))
    keep = counts.filter(F.col("n") >= min_count).select("kind")
    return spans.join(F.broadcast(keep), "kind")


def _bucket_expr(col: str, dialect: str) -> str:
    """Deterministic 0..99 bucket from an id (md5-based, oracle-parity)."""
    if dialect == "spark":
        return f"pmod(CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 8), 16, 10) AS BIGINT), 100)"
    return f"((('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT) % 100)"


def deterministic_sample(
    df: DataFrame, pct: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~pct% of rows, stable under repartitioning and retries."""
    return df.filter(F.expr(f"{_bucket_expr(id_col, 'spark')} < {pct}"))


def token_budget_sample(
    df: DataFrame,
    budget_per_lang: int,
    lang_col: str = "lang",
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Select documents per language until a token budget is filled
    (cumulative-sum window in deterministic ``order_col`` order) — the
    training-data "N tokens per language" shaping op.

    One shuffle on the language key; languages are few and large, and the
    window only carries (lang, order, tokens)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(lang_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .filter(F.col("cum_tokens") <= budget_per_lang)
    )


def stratified_sample(
    spans: DataFrame, pct_per_kind: dict[str, int], id_col: str = "doc_id"
) -> DataFrame:
    """Per-class sampling rates (the reference's per-class dataset shaping)."""
    bucket = _bucket_expr(id_col, "spark")
    expr = "CASE " + " ".join(
        f"WHEN kind = '{k}' THEN {bucket} < {p}"
        for k, p in pct_per_kind.items()
    ) + " ELSE TRUE END"
    return spans.filter(F.expr(expr))


def shard_pack(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_tokens: int = 50_000,
    n_streams: int = 32,
) -> DataFrame:
    """Pack documents into pretraining shards of ~``shard_tokens`` tokens
    each — the tar-shard creation step of the reference's pretrain
    extension (formatter.py:131-180 samples into tar shards), as a
    deterministic first-fit-streaming assignment: a document belongs to
    the shard its first token falls in, in a stable document order.

    Scale shape: a single global ordered cumulative sum is a
    one-partition sort — the classic Spark window trap.  Documents
    instead hash into ``n_streams`` independent streams (md5-based, so
    retry/partitioning-stable AND oracle-mirrorable), and the running
    token count is a window per stream: ``n_streams`` ≫ executor count
    keeps every sort local and bounded at any corpus size.  Shards may
    overflow by at most one document (first-fit semantics — standard for
    tar shards; a shard boundary never splits a document).

    Returns (doc_id, n_tokens, shard_id) with shard_id =
    '<stream>-<local shard index>'."""
    from pyspark.sql.window import Window

    stream = F.expr(
        f"pmod(CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 8),"
        f" 16, 10) AS BIGINT), {n_streams})"
    )
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .withColumn("stream", stream)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "n_tokens",
            F.concat_ws(
                "-",
                F.col("stream"),
                F.floor((F.col("cum") - F.col("n_tokens"))
                        / F.lit(shard_tokens)).cast("string"),
            ).alias("shard_id"),
        )
    )
