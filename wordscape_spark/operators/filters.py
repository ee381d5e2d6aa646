"""Quality-gate filters (E7/E8) — per-language percentile gates.

Reference: /root/reference/app/utilities/run_whitelist_pages.py:9-153 —
docs are dropped when quality < median, perplexity > per-language 80th
percentile, language unknown/low-confidence; pages with no entities or only
headings are dropped.

Here the thresholds are computed with exact interpolated percentiles
(`percentile()` in Spark ⇔ `quantile_cont` in DuckDB — identical linear
interpolation), grouped per language and broadcast-joined back: two narrow
shuffles of one row per language, never a window over the full table.

The sandbox has no KenLM; `pseudo_perplexity` is a deterministic surrogate
with the same operator shape (per-language score column + percentile gate):
average token length of the text (ref analog: perplexity.py:13-55).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pseudo_perplexity_expr(col: str, dialect: str) -> str:
    if dialect == "spark":
        ntok = f"size(split(trim({col}), '\\\\s+'))"
    else:
        ntok = f"len(regexp_split_to_array(trim({col}), '\\s+'))"
    return (
        f"CAST(CASE WHEN length(trim({col})) = 0 THEN 0.0 "
        f"ELSE round(length({col}) * 1.0 / {ntok}, 6) END AS DOUBLE)"
    )


def doc_whitelist(
    df: DataFrame,
    lang_col: str = "lang",
    quality_col: str = "quality",
    ppl_col: str = "pseudo_perplexity",
    lang_conf_col: str | None = None,
) -> DataFrame:
    """E7: keep docs with quality ≥ per-language median AND pseudo-perplexity
    ≤ per-language 80th percentile (and known language)."""
    thresholds = df.groupBy(lang_col).agg(
        F.expr(f"round(percentile({quality_col}, 0.5), 6)").alias("q_median"),
        F.expr(f"round(percentile({ppl_col}, 0.8), 6)").alias("ppl_p80"),
    )
    out = (
        df.join(F.broadcast(thresholds), lang_col)
        .filter(
            (F.col(quality_col) >= F.col("q_median"))
            & (F.col(ppl_col) <= F.col("ppl_p80"))
            & (F.col(lang_col) != "unknown")
        )
        .drop("q_median", "ppl_p80")
    )
    if lang_conf_col is not None:
        out = out.filter(F.col(lang_conf_col) > 0.5)
    return out


def page_filter(meta: DataFrame) -> DataFrame:
    """E8 analog at doc granularity: must have words, must have entities,
    must not consist solely of headings."""
    heading_kinds = [f"heading_{i}" for i in range(1, 10)] + ["title"]
    heading_sum = " + ".join(
        f"coalesce(element_at(counts, '{k}'), 0L)" for k in heading_kinds
    )
    total = (
        "aggregate(map_values(counts), 0L, (acc, x) -> acc + x)"
    )
    return meta.filter(F.col("num_words") > 0).filter(
        F.expr(f"({total}) > 0")
    ).filter(F.expr(f"({total}) - ({heading_sum}) > 0"))
