"""Similarity search over embedding columns.

* ``brute_force_topk`` — exact cosine top-k; the correctness baseline.
  Broadcast the (small) query set against the corpus: one scan, no shuffle of
  the corpus, per-partition top-k via window over (query, score).
* ``lsh_topk`` — random-hyperplane LSH bucketing: candidates share ≥1 band of
  sign bits, then exact re-rank.  The 100 TB path: the corpus is scanned
  once to bucket signatures; the join is band-key equi-join, AQE-skew-safe.

Hyperplanes are seeded deterministically (md5 of (plane, dim)) so results are
reproducible across runs/partitionings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def _cosine_expr(a: str, b: str) -> str:
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    na = (
        f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * "
        f"CAST(v AS DOUBLE)))"
    )
    nb = (
        f"sqrt(aggregate({b}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * "
        f"CAST(v AS DOUBLE)))"
    )
    return (
        f"CASE WHEN {na} = 0D OR {nb} = 0D THEN 0.0 "
        f"ELSE round({dot} / ({na} * {nb}), 4) END"
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos) — exact top-k per query.

    Ties broken by neighbor_id for determinism; self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.expr(_cosine_expr("qvec", "cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


N_PLANES = 16
N_BANDS = 8


def _plane_component(plane: int, dim: int) -> str:
    """Deterministic pseudo-gaussian component in [-1, 1)."""
    return (
        f"(CAST(conv(substr(md5(concat('{plane}:', CAST({dim} AS STRING))), "
        f"1, 8), 16, 10) AS DOUBLE) / 2147483648.0 - 1.0)"
    )


def with_lsh_signature(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = N_PLANES
) -> DataFrame:
    """Sign-bit signature per row: bit p = sign(<v, plane_p>)."""
    proj = (
        f"transform(sequence(0, {n_planes - 1}), p -> "
        f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
        f"(x, d) -> CAST(x AS DOUBLE) * "
        f"(CAST(conv(substr(md5(concat(CAST(p AS STRING), ':', "
        f"CAST(d AS STRING))), 1, 8), 16, 10) AS DOUBLE) / 2147483648.0 - 1.0)"
        f"), 0D, (acc, v) -> acc + v))"
    )
    sig = (
        f"transform({proj}, s -> CASE WHEN s >= 0D THEN 1 ELSE 0 END)"
    )
    return df.withColumn("lsh_sig", F.expr(sig))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates must share one LSH band, then exact
    cosine re-rank.  Recall < 1 by design; bench compares against brute force."""
    rows = N_PLANES // N_BANDS

    def banded(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        df = with_lsh_signature(df, vec_col)
        bands = F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(
                        "concat_ws(',', slice(lsh_sig, {}, {}))".format(
                            b * rows + 1, rows
                        )
                    ).alias("band_key"),
                )
                for b in range(N_BANDS)
            ])
        ).alias("bk")
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            bands,
        ).select(id_alias, vec_alias, "bk.band_id", "bk.band_key")

    qb = banded(queries, "query_id", "qvec")
    cb = banded(corpus, "neighbor_id", "nvec")
    candidates = (
        cb.join(F.broadcast(qb), ["band_id", "band_key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec")
        .distinct()
    )
    scored = candidates.withColumn(
        "cos", F.expr(_cosine_expr("qvec", "nvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
