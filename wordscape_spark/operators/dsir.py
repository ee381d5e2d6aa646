"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus, by importance weights between
two bag-of-hashed-n-grams models.

Method (public paper, §3):

1. features: unigrams + bigrams of lowercased ``[a-z0-9]+`` words,
   hashed into ``n_buckets`` buckets (here the md5-prefix integer used
   across this repo — identical expression in both oracle dialects);
2. fit bucket-count models on the target corpus (``p``) and the raw
   corpus (``q``), smoothed additively (``+ alpha`` per bucket);
3. per-document importance weight
   ``log w(x) = Σ_grams  log p[b(g)] − log q[b(g)]``;
4. resample without replacement via the Gumbel top-k trick:
   ``key = log w + g``, ``g = −ln(−ln(u))`` with ``u`` a deterministic
   md5-derived uniform per doc_id (reproducible, oracle-mirrorable —
   the same device as shaping.py's md5 streams).

Scale shape (100 TB story): the feature space is BOUNDED (``n_buckets``
rows), so both model fits are map-side-combined aggregations that
shuffle at most ``n_buckets`` rows per partition; the log-ratio table is
a broadcast; the per-document weight is one explode → broadcast-join →
``groupBy(doc_id)`` whose partial aggregation collapses each document
map-side (one shuffled row per doc); the resample is a bounded
``orderBy().limit(k)`` (TakeOrdered — no global sort).  No driver-side
collect anywhere.

Beyond-reference operator (training-data curation battery); no
WordScape counterpart — the reference stops at quality filters
(app/src/quality/), DSIR is the published next step the engine's users
run on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: smoothing pseudo-count per bucket (additive / Lidstone)
DEFAULT_ALPHA = 0.5
DEFAULT_BUCKETS = 1024

#: in-row hashed-n-gram instances (unigrams + bigrams) of a text column;
#: the sequence() is CASE-guarded — sequence(1, 0) is DESCENDING in
#: Spark, which would fabricate grams for one-word docs.  The word array
#: is bound ONCE via the single-element-array lambda trick: a bare
#: ``element_at({ws}, i)`` inside the bigram lambda would re-run the
#: split per gram (O(words²) per doc — the same trap documented in
#: ``fingerprint.winnow_fingerprints`` and ``dedup.shingles_expr``).
_GRAMS_TMPL = """
    transform(array({ws}), ws ->
    CASE WHEN size(ws) >= 2
         THEN concat(
            ws,
            transform(sequence(1, size(ws) - 1),
                      i -> concat(element_at(ws, i), ' ',
                                  element_at(ws, i + 1))))
         ELSE ws END)[0]
"""
_WORDS_TMPL = "filter(split(lower({col}), '[^a-z0-9]+'), w -> w != '')"


def gram_expr(text_col: str) -> str:
    """SQL expression: text column → array of gram instances."""
    ws = _WORDS_TMPL.format(col=text_col)
    return _GRAMS_TMPL.format(ws=ws)


def bucket_expr(gram_col: str, n_buckets: int) -> str:
    """SQL expression: gram string → bucket id (md5-prefix integer, the
    repo's dual-dialect hash — xxhash64 has no DuckDB mirror)."""
    return (
        f"pmod(CAST(conv(substr(md5({gram_col}), 1, 8), 16, 10) AS BIGINT),"
        f" {n_buckets})"
    )


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int
) -> DataFrame:
    """(bucket, cnt) gram-instance counts over a corpus — at most
    ``n_buckets`` result rows, partials combined map-side."""
    return (
        df.select(F.explode(F.expr(gram_expr(text_col))).alias("g"))
        .select(F.expr(bucket_expr("g", n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(bucket, lr) log-probability ratios between the smoothed target
    and raw hashed-n-gram models, dense over all ``n_buckets`` buckets.
    Small by construction — broadcast it into the weighting join."""
    spark = raw.sparkSession
    p = _bucket_counts(target, text_col, n_buckets)
    q = _bucket_counts(raw, text_col, n_buckets)
    tp = p.agg(F.sum("cnt").cast("double").alias("tp"))
    tq = q.agg(F.sum("cnt").cast("double").alias("tq"))
    dense = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(F.broadcast(p), "bucket", "left")
        .withColumnRenamed("cnt", "cp")
        .join(F.broadcast(q), "bucket", "left")
        .withColumnRenamed("cnt", "cq")
        .crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(tq))
    )
    ab = float(alpha) * n_buckets
    return dense.select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("cp"), F.lit(0)).cast("double") + alpha)
                / (F.col("tp") + ab)
            )
            - F.log(
                (F.coalesce(F.col("cq"), F.lit(0)).cast("double") + alpha)
                / (F.col("tq") + ab)
            )
        ).alias("lr"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(id_col, log_weight) per raw document.  Documents with no grams
    weigh ``0.0`` (the empty product) — restored by UNION with a
    zero-gram rescan, not a corpus-id join (a rescan prunes to two
    columns and shuffles nothing; the join would shuffle every id
    twice)."""
    ratios = dsir_log_ratios(raw, target, text_col, n_buckets, alpha)
    per_doc = (
        raw.select(
            id_col, F.explode(F.expr(gram_expr(text_col))).alias("g")
        )
        .select(id_col, F.expr(bucket_expr("g", n_buckets)).alias("bucket"))
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lr").alias("log_weight"))
    )
    empties = raw.filter(
        F.size(F.expr(gram_expr(text_col))) == 0
    ).select(F.col(id_col), F.lit(0.0).alias("log_weight"))
    return per_doc.unionByName(empties)


def gumbel_key_expr(id_col: str, weight_col: str) -> str:
    """SQL expression for the Gumbel top-k resampling key:
    ``log_weight − ln(−ln(u))`` with ``u`` md5-uniform in (0, 1)."""
    u = (
        f"((CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) + 0.5) / 4294967296.0)"
    )
    return f"{weight_col} + (-ln(-ln({u})))"


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Gumbel top-k sample WITHOUT replacement ∝ exp(log_weight):
    (id_col, log_weight, key), the ``k`` largest keys.  Deterministic
    (md5-derived Gumbel noise) and bounded — TakeOrdered, no global
    sort."""
    return (
        weights.withColumn(
            "key", F.expr(gumbel_key_expr(id_col, weight_col))
        )
        .orderBy(F.desc("key"), id_col)
        .limit(k)
    )
