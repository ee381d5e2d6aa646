"""DSIR importance resampling (operators/dsir.py): hashed-n-gram
features, smoothed model ratios, per-doc log weights and the Gumbel
top-k resample must match an independent pure-Python re-derivation;
the plan must keep the ratio join broadcast and the resample bounded."""

import hashlib
import math
import re

import pytest

from pyspark.sql import functions as F

from wordscape_spark.operators import dsir

DOCS = [
    (0, "spark shuffles data between stages", "en"),
    (1, "der schnelle braune fuchs springt", "de"),
    (2, "spark joins broadcast small tables", "en"),
    (3, "one", "en"),  # single word → no bigrams
    (4, "", "de"),  # empty → zero grams, weight 0.0
    (5, "el rapido zorro marron salta", "es"),
    (6, "spark data spark data spark", "en"),
    (7, "fuchs springt uber den hund", "de"),
]

B = 64
ALPHA = 0.5


def _grams(text):
    ws = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _py_weights():
    """Independent single-node DSIR: same spec, shared no code."""
    cp, cq = {}, {}
    tp = tq = 0
    for _, text, lang in DOCS:
        for g in _grams(text):
            b = _bucket(g)
            cq[b] = cq.get(b, 0) + 1
            tq += 1
            if lang == "en":
                cp[b] = cp.get(b, 0) + 1
                tp += 1
    lr = {
        b: math.log((cp.get(b, 0) + ALPHA) / (tp + ALPHA * B))
        - math.log((cq.get(b, 0) + ALPHA) / (tq + ALPHA * B))
        for b in range(B)
    }
    out = {}
    for doc_id, text, _ in DOCS:
        out[doc_id] = sum(lr[_bucket(g)] for g in _grams(text))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )


@pytest.fixture(scope="module")
def weights_df(corpus):
    return dsir.dsir_log_weights(
        corpus, corpus.filter("lang = 'en'"), n_buckets=B, alpha=ALPHA
    ).cache()


def test_log_weights_match_python(weights_df):
    want = _py_weights()
    got = {r["doc_id"]: r["log_weight"] for r in weights_df.collect()}
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == pytest.approx(want[doc_id], abs=1e-9), doc_id


def test_empty_doc_weighs_zero(weights_df):
    got = {r["doc_id"]: r["log_weight"] for r in weights_df.collect()}
    assert got[4] == 0.0


def test_target_docs_outweigh_offtarget(weights_df):
    """English docs must land above the German/Spanish docs — the whole
    point of importance weighting toward an English target."""
    got = {r["doc_id"]: r["log_weight"] for r in weights_df.collect()}
    en = [got[i] for i, _, lang in DOCS if lang == "en" and got[i] != 0.0]
    other = [got[i] for i, _, lang in DOCS if lang != "en" and got[i] != 0.0]
    assert min(en) > max(other)


def test_gumbel_resample_deterministic_topk(weights_df):
    got = dsir.dsir_resample(weights_df, k=3).collect()
    assert len(got) == 3
    # keys strictly descending, and equal to the re-derived key
    keys = [r["key"] for r in got]
    assert keys == sorted(keys, reverse=True)
    for r in got:
        u = (
            int(
                hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16
            )
            + 0.5
        ) / 4294967296.0
        want = r["log_weight"] - math.log(-math.log(u))
        assert r["key"] == pytest.approx(want, abs=1e-9)
    # rerun → identical selection (no nondeterministic randomness)
    again = [r["doc_id"] for r in dsir.dsir_resample(weights_df, 3).collect()]
    assert again == [r["doc_id"] for r in got]


def test_plan_shape(corpus, weights_df):
    """Ratio table joins broadcast (no corpus-side shuffle for the
    lookup) and the resample is a TakeOrdered, not a global Sort.
    The plan is read from a FRESH lineage — the cached fixture would
    hide the join behind an InMemoryTableScan."""
    fresh = dsir.dsir_log_weights(
        corpus, corpus.filter("lang = 'en'"), n_buckets=B, alpha=ALPHA
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    sample_plan = (
        dsir.dsir_resample(weights_df, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in sample_plan


def test_single_word_doc_has_no_fabricated_bigrams(spark):
    """sequence(1, 0) is descending in Spark — the CASE guard must keep
    one-word docs at exactly one gram instance."""
    df = spark.createDataFrame([(0, "one")], "doc_id long, text string")
    n = df.select(
        F.explode(F.expr(dsir.gram_expr("text"))).alias("g")
    ).count()
    assert n == 1
