"""Training-prep plan: the post-curation half of the pipeline — split
assignment → BPE vocabulary training (train split ONLY) → corpus-wide
encoding → per-split concat-and-slice sequence packing, as ONE composed
DataFrame chain with a per-split audit table.

This is what a user does AFTER ``plans/curate.py``'s funnel: the curated
text table becomes fixed-length token sequences a causal-LM trainer
consumes.  The reference stops at dataset shaping
(``app/src/extensions/``); tokenizer training and loader geometry are
the beyond-reference half of "switch to this repo and run everything".

Leakage discipline: the BPE vocabulary is trained on the *train* split
only — val/test never influence the merges — while all three splits are
encoded under the trained vocabulary (the standard eval-honest setup).
Splits are md5-bucket deterministic (``shaping.assign_split``), so the
split column can be re-derived from ``doc_id`` anywhere downstream
instead of being carried through shuffles.

Scale shape (100 TB):
* split assignment is a per-row expression (zero Exchange);
* BPE training's corpus-scale work is one word histogram over the train
  split (map-side combinable; ``max_vocab_words`` caps the rounds'
  working set) — the merge rounds run on the distinct-word histogram;
* encoding is a chained per-row expression (zero Exchange);
* packing is the md5-stream-decomposed cumulative sum
  (``shaping.pack_sequences``) per split — sort partitions are bounded
  at ~|split|/n_streams, and the only Exchange carries the stream key.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from wordscape_spark.operators import bpe as BPE
from wordscape_spark.operators import shaping as SH


def pretrain_prep(
    docs: DataFrame,
    *,
    n_merges: int = 8,
    seq_len: int = 64,
    n_streams: int = 4,
    weights: dict[str, int] | None = None,
    max_vocab_words: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame | list]:
    """Run the chain; returns ``{"splits": df, "merges": list,
    "encoded": df, "packed": df}``.  ``encoded`` is (doc_id, split,
    n_tokens) under the trained vocabulary; ``packed`` is the
    (seq_id, doc_id, doc_from, doc_to, seq_off) loader geometry with
    seq_id prefixed by split (``train-<stream>-<k>``)."""
    weights = SH.DEFAULT_SPLITS if weights is None else weights
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    splits = SH.assign_split(base, weights)
    merges = BPE.bpe_train(
        splits.filter(F.col("split") == "train"),
        n_merges=n_merges,
        max_vocab_words=max_vocab_words,
    )
    # split is md5(doc_id)-deterministic: re-derive it per row after the
    # encode projection instead of threading it through the operator
    encoded = BPE.bpe_encode(splits, merges).withColumn(
        "split", F.expr(SH.split_expr("doc_id", weights, "spark"))
    )
    packed_parts = [
        SH.pack_sequences(
            encoded.filter(F.col("split") == name).select(
                "doc_id", "n_tokens"
            ),
            seq_len=seq_len,
            n_streams=n_streams,
        ).select(
            F.concat_ws("-", F.lit(name), "seq_id").alias("seq_id"),
            "doc_id",
            "doc_from",
            "doc_to",
            "seq_off",
        )
        for name in weights
    ]
    packed = reduce(DataFrame.unionByName, packed_parts)
    return {
        "splits": splits,
        "merges": merges,
        "encoded": encoded,
        "packed": packed,
    }


def split_audit(result: dict) -> DataFrame:
    """(split, n_docs, sum_tokens, n_seqs) — the job's audit record:
    document/token accounting from the encoded frame, sequence counts
    from the packed geometry (two single-pass aggregates joined on the
    3-row split key)."""
    enc = (
        result["encoded"]
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("sum_tokens"),
        )
    )
    seqs = (
        result["packed"]
        .select(F.split("seq_id", "-")[0].alias("split"), "seq_id")
        .groupBy("split")
        .agg(F.countDistinct("seq_id").cast("bigint").alias("n_seqs"))
    )
    return enc.join(seqs, "split", "left").select(
        "split",
        "n_docs",
        "sum_tokens",
        F.coalesce("n_seqs", F.lit(0)).cast("bigint").alias("n_seqs"),
    )
