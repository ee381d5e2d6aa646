"""Context-window chunking: split documents into fixed-size token
windows with a configurable stride (overlap) — the step that turns a
curated corpus into training-window rows (GPT-style pretraining data
prep: fixed-length sequences, optionally overlapping; see e.g. the
sliding-window feature generation of BERT's SQuAD processing and every
causal-LM data loader since).

Tokens here are whitespace words (the repo's token_counts convention);
real BPE happens in the trainer — what the ENGINE owes is the window
geometry, deterministically and at scale.

Semantics: with ``window`` tokens per chunk and ``stride`` tokens
between chunk starts (``stride == window`` → disjoint; ``stride <
window`` → overlapping), a document with ``n`` tokens yields
``ceil(n / stride)`` chunks starting at token 0, stride, 2·stride, …
(every start < n, so every token starts inside some chunk); trailing
chunks may be shorter than ``window``.  Empty documents yield no
chunks.

Scale shape: entirely per-row — ``split`` once, bound via the
array-of-struct device (a HOF lambda re-inlines a once-referenced alias
per element — the CollapseProject trap, see fingerprint.py), then one
``transform``+``explode``.  Zero Exchange end to end; chunk rows land
in the same partitions as their documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_WINDOW = 512
DEFAULT_STRIDE = 512

#: whitespace tokenization — identical in both oracle dialects
_WORDS_TMPL = "filter(split({col}, '\\\\s+'), w -> w != '')"


def chunks_expr(text_col: str, window: int, stride: int) -> str:
    """SQL expression: text → array of (chunk_idx, n_tokens, chunk)
    structs.  The words array is bound ONCE via transform-over-array;
    starts are 0, stride, 2·stride, … < n_words."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    ws = _WORDS_TMPL.format(col=text_col)
    n_chunks = f"CAST(ceil(size(ws) / {stride}.0) AS INT)"
    return f"""
    transform(array({ws}), ws ->
      transform(sequence(1, {n_chunks}), i ->
        named_struct(
          'chunk_idx', i - 1,
          'n_tokens', size(slice(ws, (i - 1) * {stride} + 1, {window})),
          'chunk', array_join(
              slice(ws, (i - 1) * {stride} + 1, {window}), ' ')
        )))[0]
    """


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, chunk_idx, n_tokens, chunk [, keep_cols…]) — one row per
    training window.  Empty docs yield no rows (sequence(1, 0) is
    DESCENDING in Spark — the ceil() of a 0-word doc is 0, which the
    guard below turns into an empty array, not a fabricated chunk)."""
    expr = chunks_expr(text_col, window, stride)
    guarded = (
        f"CASE WHEN size({_WORDS_TMPL.format(col=text_col)}) = 0 "
        f"THEN CAST(array() AS ARRAY<STRUCT<chunk_idx: INT, "
        f"n_tokens: INT, chunk: STRING>>) ELSE {expr} END"
    )
    return (
        df.select(id_col, *keep_cols, F.explode(F.expr(guarded)).alias("c"))
        .select(id_col, *keep_cols, "c.chunk_idx", "c.n_tokens", "c.chunk")
    )


# ------------------------------------------------------------------ FIM


def fim_transform(
    docs: DataFrame,
    rate_pct: int = 50,
    min_chars: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022; the
    StarCoder/code-model data-prep step): for a deterministic
    ``rate_pct``% of documents, cut the text at two md5-derived
    character positions and emit PSM order —
    ``<PRE> prefix <SUF> suffix <MID> middle`` — so the trainer learns
    infilling; the rest (and documents shorter than ``min_chars``) pass
    through unchanged.

    Determinism: the apply decision is the doc id's md5 bucket and the
    two cut points are md5 integers of ``id || ':fim1' / ':fim2'`` mod
    ``len+1`` (order-normalized) — stable under repartitioning/retries
    and replayable relationally.  Entirely per-row, zero Exchange.

    Tokens-vs-chars boundary: real FIM cuts at token boundaries after
    tokenization; the ENGINE owes the deterministic geometry, which is
    character-level here (the same relationship ``chunk_documents``
    has to real BPE windows)."""
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be in [0, 100]")

    def h(salt: str) -> str:
        return (
            f"CAST(conv(substr(md5(concat(CAST({id_col} AS STRING),"
            f" '{salt}')), 1, 8), 16, 10) AS BIGINT)"
        )

    bucket = f"pmod({h(':fim')}, 100)"
    t = f"coalesce({text_col}, '')"
    apply = (
        f"({bucket} < {rate_pct}) AND (length({t}) >= {min_chars})"
    )
    cut_a = f"pmod({h(':fim1')}, length({t}) + 1)"
    cut_b = f"pmod({h(':fim2')}, length({t}) + 1)"
    lo, hi = f"least({cut_a}, {cut_b})", f"greatest({cut_a}, {cut_b})"
    fim = (
        f"concat('<PRE>', substring({t}, 1, {lo}), "
        f"'<SUF>', substring({t}, {hi} + 1, length({t}) - ({hi})), "
        f"'<MID>', substring({t}, {lo} + 1, ({hi}) - ({lo})))"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(apply).alias("fim_applied"),
        F.expr(f"CASE WHEN {apply} THEN {fim} ELSE {t} END").alias(
            "text_out"
        ),
    )
