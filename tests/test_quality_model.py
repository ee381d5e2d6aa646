"""NB quality classifier (operators/quality_model.py) and CCNet
perplexity buckets (operators/filters.py)."""

import pyspark.sql.functions as F

from wordscape_spark.operators import filters as FL
from wordscape_spark.operators import quality_model as QM


def _labeled(spark):
    return spark.createDataFrame(
        [
            (True, "good good fine"),
            (True, "good fine"),
            (False, "bad bad awful"),
        ],
        "label boolean, text string",
    )


def test_train_counts_exact(spark):
    rows = {
        (r["token"], r["label"]): r["cnt"]
        for r in QM.train_quality_nb(_labeled(spark), vocab_k=100).collect()
    }
    assert rows == {
        ("good", 1): 3,
        ("fine", 1): 2,
        ("bad", 0): 2,
        ("awful", 0): 1,
    }


def test_vocab_cap_deterministic_ties(spark):
    # totals: good=3, bad=2, fine=2, awful=1; tie bad/fine -> token ASC
    toks = {
        r["token"]
        for r in QM.train_quality_nb(_labeled(spark), vocab_k=2).collect()
    }
    assert toks == {"good", "bad"}


def test_weights_and_score_signs(spark):
    model = QM.train_quality_nb(_labeled(spark), vocab_k=100).collect()
    import math

    weights, default_w, prior_w = QM.nb_weights(model, 2, 1)
    # sum_pos=5, sum_neg=3, V=4 -> tot_pos=9, tot_neg=7
    assert weights["good"] == round(math.log(4 / 9) - math.log(1 / 7), 6)
    assert weights["bad"] == round(math.log(1 / 9) - math.log(3 / 7), 6)
    assert default_w == round(math.log(7 / 9), 6)
    assert prior_w == round(math.log(3 / 2), 6)
    docs = spark.createDataFrame(
        [(1, "good good fine"), (2, "bad awful"), (3, "zzz unseen")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in QM.score_quality_nb(
            docs, weights, default_w, prior_w
        ).collect()
    }
    assert out[1]["score"] > 0 and out[1]["pred"] == 1
    assert out[2]["score"] < 0 and out[2]["pred"] == 0


def test_score_plan_zero_exchange(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        QM.score_quality_nb(docs, {"x": 1.0}, -0.5, 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_ccnet_buckets_terciles(spark):
    rows = [(i, "en", float(i)) for i in range(1, 10)]
    rows += [(100 + i, "de", float(10 * i)) for i in range(1, 4)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, pseudo_perplexity double"
    )
    out = {
        r["doc_id"]: r["bucket"]
        for r in FL.ccnet_buckets(df).collect()
    }
    # en: discrete terciles of 1..9 -> t1=3, t2=6
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # de: 10,20,30 -> one per stratum
    assert [out[100 + i] for i in range(1, 4)] == ["head", "middle", "tail"]


def test_ccnet_no_window_sort(spark):
    df = spark.createDataFrame(
        [(1, "en", 1.0)], "doc_id long, lang string, pseudo_perplexity double"
    )
    plan = (
        FL.ccnet_buckets(df)._jdf.queryExecution().executedPlan().toString()
    )
    # thresholds via hash aggregate, never a per-language window sort
    assert "Window" not in plan
