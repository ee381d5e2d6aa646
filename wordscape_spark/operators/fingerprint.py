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

Scale notes: fingerprint extraction is document-local and computed
entirely IN-ROW with array expressions (gram hashes via ``transform``,
window minima via ``transform(sequence(...), w -> array_min(slice(...)))``)
— zero Exchange: the r4 formulation posexploded ~one row per normalized
character and window-sorted them, shuffling roughly the corpus text volume
to compute a per-document set.  ``fingerprint_matches`` shuffles (fp,
doc_id) pairs only and caps hot fingerprints by document frequency with a
COUNT-ONLY aggregate (ubiquitous boilerplate k-grams would otherwise
create quadratic pair blowup — same escape hatch as the Jaccard
``max_shingle_df`` cap, BENCH/JACCARD.md).
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

    Precondition: ``id_col`` is unique per input row.  The in-row rewrite
    dedups picks per ROW (``array_distinct`` — zero Exchange); a corpus
    with duplicate doc_id rows (e.g. a union of sources) yields duplicated
    (doc_id, pos, fp) rows where the pre-r5 global ``.distinct()`` would
    have collapsed them.  Dedup doc_ids upstream if the input may repeat
    them (``fingerprint_matches`` applies its own distinct either way).
    """
    norm = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""),
        1, max_chars,
    )
    # complete windows need at least `window` grams = k + window - 1 chars
    base = df.select(
        F.col(id_col).alias("doc_id"), norm.alias("t")
    ).filter(F.length("t") >= k + window - 1)
    # packed (hash, pos) values, one per k-gram — BOUND ONCE per row via
    # the single-element-array lambda trick.  Two chained selects would be
    # inlined by Catalyst's CollapseProject, substituting this whole gram-
    # hash transform into every reference inside the minima lambda below —
    # i.e. the md5 of EVERY gram recomputed at EVERY window position, a
    # silent O(grams²)-per-doc blowup (measured 65×: 372s → 5.7s on the
    # sf0.01 fixture).  Higher-order functions are also interpreted (never
    # whole-stage codegen), which makes the duplication fatal rather than
    # just wasteful.
    vs = (
        f"transform(sequence(1, length(t) - {k - 1}),"
        f" i -> CAST(conv(substr(md5(substring(t, i, {k})), 1, 8),"
        f" 16, 10) AS BIGINT) * {_POS_MOD} + ({_POS_MOD - 1} - i))"
    )
    # window minima + in-row dedup: picks are already distinct per doc and
    # (doc_id, pos, fp) can't collide across docs, so no global distinct —
    # the whole operator runs with zero Exchange
    picks = base.select(
        "doc_id",
        F.expr(
            f"transform(array({vs}), vs ->"
            f" array_distinct(transform(sequence(1, size(vs) - {window - 1}),"
            f" w -> array_min(slice(vs, w, {window})))))[0]"
        ).alias("pv"),
    )
    # explode_outer, not explode: InferFiltersFromGenerate would add a
    # pushed-down Filter (size(pv) > 0 AND isnotnull(pv)) whose predicates
    # INLINE the whole pv expression — the md5 leg evaluated 3x per row.
    # Outer generate blocks that inference, and it is semantically
    # identical here: the length(t) >= k + window - 1 gate guarantees at
    # least one complete window, so pv is never null or empty (pinned by
    # test_winnow_gram_hash_bound_once).
    return picks.select("doc_id", F.explode_outer("pv").alias("v")).select(
        "doc_id",
        (F.lit(_POS_MOD - 1) - F.col("v") % F.lit(_POS_MOD)).alias("pos"),
        # integer division — exact for the full 52-bit packed range
        F.expr(f"CAST(v DIV {_POS_MOD} AS BIGINT)").alias("fp"),
    )


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
            # explode_outer: blocks InferFiltersFromGenerate from inlining
            # the gram transform into pushed-down size/isnotnull predicates
            # (3x evaluation); the size(words) >= k gate guarantees the
            # array is never empty, so outer == inner here
            F.explode_outer(
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
    # count-only document frequency: a boilerplate fingerprint shared by
    # millions of docs must never materialize its doc_id list in one
    # aggregation buffer (collect_list would be the exact hot-key blowup
    # the cap exists to prevent) — count first, semi-join the rare fps
    # back onto the (fp, doc_id) pairs
    rare_fps = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_fp_df)
        .select("fp")
    )
    rare = fps.join(rare_fps, "fp", "left_semi")
    a = rare.select(F.col("doc_id").alias("id_a"), "fp")
    b = rare.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
