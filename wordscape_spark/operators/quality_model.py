"""Model-based quality classification — distributed Naive-Bayes train
+ zero-shuffle serve.

Public provenance: the FineWeb-Edu / DCLM recipe (Penedo et al. 2024
§3.3; Li et al. 2024 "DataComp-LM") trains a cheap linear classifier
to imitate an expensive quality signal, then scores the whole corpus
with it.  Here the teacher signal is the repo's own Gopher gate
(``quality_rules.gopher_quality``) and the student is multinomial
Naive Bayes over whitespace tokens — the classical fastText-without-
embeddings baseline whose training reduces to ONE distributed
count aggregation, so both training and scoring stay exactly
re-derivable by the DuckDB oracle (integer counts; 6dp-rounded
log-weights).

Scale shape:

* TRAIN: explode tokens → groupBy(token, label) COUNT — map-side
  combine collapses each partition's repeats, so the exchange carries
  (token, label, partial count), not the corpus.  The vocabulary cap
  is a two-phase deterministic top-k (per-md5-bucket row_number, then
  a final pass over ≤ 256·k candidate rows — bounded regardless of
  corpus vocabulary, the operators/urls.py A10 doc-id pattern).
* SERVE: the model is ≤ 2·vocab_k rows, collected (bounded, the IVF
  centroid precedent) and folded into a literal token→log-weight map;
  scoring is a per-row ``aggregate`` over the token array — zero
  Exchange, no Python on the hot path.

Weights are rounded to 6dp on BOTH sides before summing (libm ``ln``
may differ by 1 ulp between JVM/Python/DuckDB; the final score is
rounded to 6dp with ~7 orders of margin over fp association drift).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

VOCAB_K = 256
TOKENS_EXPR = "filter(split(lower(t), '\\\\s+'), w -> w != '')"


def train_quality_nb(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    vocab_k: int = VOCAB_K,
) -> DataFrame:
    """(token, label, cnt) counts over the top-``vocab_k`` tokens by
    total corpus frequency (ties broken by token ASC — a total order,
    so the two-phase top-k is exactly the global top-k)."""
    tok = labeled.select(
        F.col(label_col).cast("boolean").alias("label"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    ).select("label", F.explode(F.expr(TOKENS_EXPR)).alias("token"))
    tl = tok.groupBy("token", "label").agg(F.count("*").alias("cnt"))
    tot = tl.groupBy("token").agg(F.sum("cnt").alias("total"))
    w_bucket = Window.partitionBy("bucket").orderBy(
        F.col("total").desc(), F.col("token")
    )
    w_global = Window.orderBy(F.col("total").desc(), F.col("token"))
    vocab = (
        tot.withColumn("bucket", F.expr("substring(md5(token), 1, 2)"))
        .withColumn("rn", F.row_number().over(w_bucket))
        .filter(F.col("rn") <= vocab_k)
        .withColumn("rn2", F.row_number().over(w_global))
        .filter(F.col("rn2") <= vocab_k)
        .select("token")
    )
    return tl.join(F.broadcast(vocab), "token").select(
        "token", F.col("label").cast("int").alias("label"), "cnt"
    )


def nb_weights(
    model_rows, n_pos_docs: int, n_neg_docs: int
) -> tuple[dict[str, float], float, float]:
    """Laplace-smoothed per-token log-likelihood-ratio weights from
    collected (token, label, cnt) rows: weight(t) = ln p(t|pos) -
    ln p(t|neg); plus the unseen-token default and the log-prior.
    All three rounded to 6dp (dialect-parity margin)."""
    pos: dict[str, int] = {}
    neg: dict[str, int] = {}
    for r in model_rows:
        (pos if r["label"] else neg)[r["token"]] = r["cnt"]
    vocab = sorted(set(pos) | set(neg))
    v = len(vocab)
    tot_pos = sum(pos.values()) + v
    tot_neg = sum(neg.values()) + v
    weights = {
        t: round(
            math.log((pos.get(t, 0) + 1) / tot_pos)
            - math.log((neg.get(t, 0) + 1) / tot_neg),
            6,
        )
        for t in vocab
    }
    default_w = round(math.log(1.0 / tot_pos) - math.log(1.0 / tot_neg), 6)
    prior_w = round(
        math.log((n_pos_docs + 1) / (n_neg_docs + 1)), 6
    )
    return weights, default_w, prior_w


def score_quality_nb(
    df: DataFrame,
    weights: dict[str, float],
    default_w: float,
    prior_w: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score, pred) — per-row left fold of token weights over
    a literal map (zero Exchange; the ≤ vocab_k-entry map ships with
    the serialized plan, the broadcast-variable analog)."""
    kv = []
    for t, w in sorted(weights.items()):
        kv.append(F.lit(t))
        kv.append(F.lit(float(w)))
    m = F.create_map(*kv) if kv else F.expr("map()")
    out = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.coalesce(F.col(text_col), F.lit("")).alias("t"),
        )
        .withColumn("toks", F.expr(TOKENS_EXPR))
        .withColumn("_m", m)
        .withColumn(
            "score",
            F.round(
                F.expr(
                    "aggregate(toks, CAST(0.0 AS DOUBLE), (a, w) -> "
                    f"a + coalesce(element_at(_m, w), "
                    f"CAST({default_w!r} AS DOUBLE)))"
                )
                + F.lit(float(prior_w)),
                6,
            ),
        )
    )
    return out.select(
        "doc_id",
        "score",
        (F.col("score") > 0).cast("int").alias("pred"),
    )
