"""Winnowing fingerprints: hand-checkable selection semantics, planted
local-overlap detection, and the all-native (no Python UDF) plan."""

import pyspark.sql.functions as F

from wordscape_spark.operators import fingerprint as FP


def test_winnowing_guarantee_and_rightmost_ties(spark):
    """Winnowing guarantees at least one pick per window of `window`
    consecutive grams, and every pick is that window's min hash."""
    text = "the quick brown fox jumps over the lazy dog " * 3
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    fps = FP.winnow_fingerprints(df, window=4).collect()
    assert fps
    # re-derive hashes natively to validate picks against the raw grams
    grams = (
        df.select(
            F.expr(
                "posexplode(transform(sequence(1, length(regexp_replace("
                "lower(text), '[^a-z0-9]', '')) - 7), i -> "
                "substring(regexp_replace(lower(text), '[^a-z0-9]', ''),"
                " i, 8)))"
            ).alias("pos0", "gram")
        )
        .selectExpr(
            "pos0 + 1 AS pos",
            "CAST(conv(substr(md5(gram), 1, 8), 16, 10) AS BIGINT) AS h",
        )
        .collect()
    )
    hashes = {r["pos"]: r["h"] for r in grams}
    picked = {(r["pos"], r["fp"]) for r in fps}
    for pos, fp in picked:
        assert hashes[pos] == fp
    # at least one pick covers every complete window
    n = len(hashes)
    for start in range(1, n - 4 + 2):
        window_positions = set(range(start, start + 4))
        assert any(p in window_positions for p, _ in picked), start


def test_planted_local_overlap_detected(spark):
    shared = "this exact boilerplate disclaimer paragraph appears verbatim"
    rows = [
        ("1", "totally unrelated opening prose here " + shared),
        ("2", shared + " followed by a different unrelated ending text"),
        ("3", "a third document with no overlap whatsoever in its body"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in FP.fingerprint_matches(df, min_shared=2).collect()
    }
    assert ("1", "2") in pairs
    assert not any("3" in p for p in pairs)


def test_plan_is_native(spark):
    df = spark.createDataFrame([("d", "x" * 200)], "doc_id string, text string")
    plan = FP.winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_winnow_plan_has_zero_exchange(spark):
    """Winnowing is document-local: the whole operator must plan without
    any Exchange (the r4 posexplode+window formulation shuffled ~one row
    per normalized character)."""
    df = spark.createDataFrame([("d", "x" * 200)], "doc_id string, text string")
    plan = FP.winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_winnow_gram_hash_bound_once(spark):
    """The gram-hash transform must appear exactly once in the optimized
    plan: CollapseProject inlining it into the window-minima lambda makes
    the operator O(grams²) per document (each position re-hashing every
    gram — measured 65x on the sf0.01 fixture)."""
    df = spark.createDataFrame([("d", "x" * 200)], "doc_id string, text string")
    optimized = (
        FP.winnow_fingerprints(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert optimized.count("md5") == 1, optimized


def test_contamination_detects_planted_probe_overlap(spark):
    from wordscape_spark.operators.fingerprint import contamination_check

    probe_text = "the exact benchmark question appears verbatim in this document body"
    rows = [
        ("1", "unrelated prose before " + probe_text + " and after"),
        ("2", "completely different content with no overlap at all in here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    probes = spark.createDataFrame(
        [("p1", probe_text)], "probe_id string, text string"
    )
    hits = {
        (r["doc_id"], r["probe_id"]): r["n_shared"]
        for r in contamination_check(docs, probes, k=5).collect()
    }
    assert ("1", "p1") in hits and hits[("1", "p1")] >= 1
    assert ("2", "p1") not in hits
