"""Multilingual temperature sampling (data mixing): rebalance a corpus
across languages with the exponentiated-distribution trick used by
multilingual pretraining pipelines (mBERT/XLM-R style, Conneau et al.
2020 §3.1; mC4, Xue et al. 2021 §3.2): sample languages with
probability ``q_l ∝ p_l^alpha`` instead of the empirical ``p_l``, so
low-resource languages are upsampled relative to the head language.

Realized here as deterministic per-document keep rates: with ``N`` docs
total, language counts ``n_l`` and a target fraction ``t`` of the
corpus to keep,

    rate_l = min(1, t · N · q_l / n_l),   q_l = p_l^alpha / Σ p^alpha

and a document survives iff its md5-uniform ``u(doc_id) < rate_l`` —
reproducible, shuffle-free, and oracle-mirrorable (the same md5 device
as shaping.py/dsir.py).  Single-pass by design: rates capped at 1 are
NOT redistributed to other languages (the sampled total can undershoot
``t·N`` when a small language saturates); an exact-budget variant is a
water-filling iteration over the ≤|langs|-row rate table and is
documented out of scope.

Scale shape: one map-side-combined ``groupBy(lang)`` (≤|languages|
rows), a broadcast join of the rate table, and a per-row filter — the
corpus itself never shuffles.

Beyond-reference operator (training-data curation battery); pairs with
operators/dsir.py — DSIR picks documents LIKE a target, temperature
sampling fixes the LANGUAGE MIX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_ALPHA = 0.3  # XLM-R's exponent
DEFAULT_TARGET_FRAC = 0.5


def uniform_expr(id_col: str) -> str:
    """Deterministic md5-derived uniform in (0, 1) per id — the same
    expression DuckDB evaluates in the oracles."""
    return (
        f"((CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) + 0.5) / 4294967296.0)"
    )


def language_sampling_rates(
    df: DataFrame,
    lang_col: str = "lang",
    alpha: float = DEFAULT_ALPHA,
    target_frac: float = DEFAULT_TARGET_FRAC,
) -> DataFrame:
    """(lang, n_docs, rate): per-language keep rates for the
    temperature-``alpha`` mix at a ``target_frac`` corpus budget.
    ≤|languages| rows — broadcast it."""
    counts = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
    )
    qdenom = counts.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.pow(F.col("n_docs") / F.col("n_total"), F.lit(alpha))
        ).alias("q_denom")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(qdenom))
        .select(
            "lang",
            "n_docs",
            F.least(
                F.lit(1.0),
                F.lit(target_frac)
                * F.col("n_total")
                * (
                    F.pow(F.col("n_docs") / F.col("n_total"), F.lit(alpha))
                    / F.col("q_denom")
                )
                / F.col("n_docs"),
            ).alias("rate"),
        )
    )


def temperature_sample(
    df: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
    target_frac: float = DEFAULT_TARGET_FRAC,
) -> DataFrame:
    """The deterministically sampled corpus: rows whose md5-uniform
    falls under their language's rate.  Broadcast join + per-row
    predicate — zero corpus shuffle."""
    rates = language_sampling_rates(df, lang_col, alpha, target_frac)
    r = rates.select(F.col("lang").alias("_mix_lang"), "rate")
    return (
        df.join(F.broadcast(r), df[lang_col] == F.col("_mix_lang"))
        .filter(F.expr(uniform_expr(id_col)) < F.col("rate"))
        .drop("_mix_lang", "rate")
    )
