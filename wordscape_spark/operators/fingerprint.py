"""Document fingerprinting by winnowing (rolling k-gram hash + window-min
selection) — Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting" (SIGMOD 2003), the MOSS scheme.

A training-data-pipeline operator beyond the reference's surface (the build
brief's "document fingerprinting (rolling hash)" item, complementing
SimHash/MinHash): every document yields the set of selected k-gram hashes;
two documents sharing fingerprints share verbatim k-char substrings, which
catches *local* overlap (quotations, boilerplate blocks) that whole-document
sketches dilute.

Spark-first: the whole operator is native expressions — normalize →
``sequence``/``transform`` k-gram expansion → md5-prefix hash → window-frame
minimum — no Python UDF anywhere, so it stays inside whole-stage codegen and
is expressible identically in the DuckDB oracle dialect.

Winnowing selection (guarantee-preserving formulation): for every window of
``window`` consecutive k-gram hashes pick the minimum, rightmost position on
ties, then de-duplicate picks.  Implemented branch-free by packing
``(hash, position)`` into one orderable BIGINT:

    v = hash * 2^POS_BITS + (2^POS_BITS - 1 - pos)

so a plain windowed ``min(v)`` selects the smallest hash and, among equal
hashes, the LARGEST position — the rightmost-tie rule.  Hashes are 32-bit
(md5 prefix), positions bounded by 2^POS_BITS (texts are length-capped
first; at 100 TB the cap also bounds per-row work).

Scale notes: fingerprint extraction is embarrassingly parallel (zero
shuffle).  ``fingerprint_matches`` shuffles (fp, doc_id) pairs only and
caps hot fingerprints by document frequency (ubiquitous boilerplate k-grams
would otherwise create quadratic pair blowup — same escape hatch as the
Jaccard ``max_shingle_df`` cap, BENCH/JACCARD.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

POS_BITS = 20  # positions < 1,048,576 after the length cap
_POS_MOD = 1 << POS_BITS


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    max_chars: int = 100_000,
) -> DataFrame:
    """(id, pos, fp) — the winnowing fingerprint set of every document.

    ``pos`` is the 1-based position of the selected k-gram in the
    normalized text (lowercased, non-alphanumerics removed — the standard
    MOSS normalization so whitespace/punctuation edits don't shift grams).
    """
    norm = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""),
        1, max_chars,
    )
    grams = df.select(
        F.col(id_col).alias("doc_id"), norm.alias("t")
    ).filter(F.length("t") >= k).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(t) - {k} + 1),"
                f" i -> substring(t, i, {k}))"
            )
        ).alias("pos0", "gram"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr(
            "CAST(conv(substr(md5(gram), 1, 8), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    packed = grams.select(
        "doc_id", "pos", "h",
        (F.col("h") * F.lit(_POS_MOD)
         + (F.lit(_POS_MOD - 1) - F.col("pos"))).alias("v"),
    )
    picks = packed.select(
        "doc_id",
        F.expr(
            f"min(v) OVER (PARTITION BY doc_id ORDER BY pos"
            f" ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)"
        ).alias("vmin"),
        # only complete windows pick (pos <= n - window + 1): mark rows
        # whose frame is full via lead availability
        F.expr(
            f"lead(pos, {window - 1}) OVER (PARTITION BY doc_id"
            f" ORDER BY pos)"
        ).alias("frame_end"),
    ).filter(F.col("frame_end").isNotNull())
    return picks.select(
        "doc_id",
        (F.lit(_POS_MOD - 1) - F.col("vmin") % F.lit(_POS_MOD)).alias("pos"),
        # integer division — exact for the full 52-bit packed range
        F.expr(f"CAST(vmin DIV {_POS_MOD} AS BIGINT)").alias("fp"),
    ).distinct()


def _word_kgram_hashes(
    df: DataFrame, text_col: str, id_col: str, out_id: str, k: int
) -> DataFrame:
    """(id, gh) — distinct hashed word k-grams per row (normalized words:
    lowercased, whitespace-split)."""
    return (
        df.select(
            F.col(id_col).alias(out_id),
            F.expr(
                f"filter(split(lower({text_col}), '\\\\s+'), w -> w != '')"
            ).alias("words"),
        )
        .filter(F.size("words") >= k)
        .select(
            out_id,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(words) - {k} + 1),"
                    f" i -> concat_ws(' ', slice(words, i, {k})))"
                )
            ).alias("gram"),
        )
        .select(
            out_id,
            F.expr(
                "CAST(conv(substr(md5(gram), 1, 8), 16, 10) AS BIGINT)"
            ).alias("gh"),
        )
        .distinct()
    )


def contamination_check(
    docs: DataFrame,
    probes: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Benchmark decontamination: (doc_id, probe_id, n_shared) for every
    corpus document sharing ≥ 1 word ``k``-gram with a probe (evaluation)
    document — the standard 13-gram contamination rule (GPT-3 appendix C /
    PaLM-style decontamination; public methodology).

    Scale shape: the probe side is the benchmark suite (small by
    construction) — its distinct gram hashes broadcast; the corpus side
    streams through one scan + explode with a broadcast hash join, so no
    corpus shuffle until the tiny (doc, probe) aggregate."""
    d = _word_kgram_hashes(docs, text_col, id_col, "doc_id", k)
    p = _word_kgram_hashes(probes, text_col, probe_id_col, "probe_id", k)
    return (
        d.join(F.broadcast(p), "gh")
        .groupBy("doc_id", "probe_id")
        .agg(F.count("*").alias("n_shared"))
    )


def fingerprint_matches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
) -> DataFrame:
    """(id_a, id_b, n_shared) — document pairs sharing ≥ ``min_shared``
    winnowing fingerprints; fingerprints appearing in more than
    ``max_fp_df`` documents are dropped before the pair join (boilerplate
    cap — prevents the quadratic hot-key blowup at scale)."""
    fps = winnow_fingerprints(
        df, text_col=text_col, id_col=id_col, k=k, window=window
    ).select("doc_id", "fp").distinct()
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("df") <= max_fp_df)
        .select("fp", F.explode("ids").alias("doc_id"))
    )
    a = rare.select(F.col("doc_id").alias("id_a"), "fp")
    b = rare.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
