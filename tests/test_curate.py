"""Curation pipeline plan (plans/curate.py): stage containment, funnel
accounting, keep_cols passthrough, and plan shape."""

import pyspark.sql.functions as F
import pytest

from wordscape_spark.operators import quality_rules as QR
from wordscape_spark.plans import curate as CU


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        # a shared preamble + a dominant doc-specific block, so cross-doc
        # shingle Jaccard stays < 0.5 while a planted mutation stays > 0.5
        spec = " ".join(f"c{i}x{j}" for j in range(24))
        text = (
            f"the quick document speaks of shipping and ports and carries "
            f"enough plain words that have been set to clear the gates {spec}"
        )
        rows.append((str(i), "en" if i % 2 else "de", text))
    # planted exact duplicate of doc 3 and a near duplicate of doc 5
    rows.append(("900", "de", rows[3][2]))
    rows.append(("901", "en", rows[5][2] + " the end"))
    # a junk doc the quality gate must drop
    rows.append(("902", "en", "@@@ ### !!!"))
    return spark.createDataFrame(rows, "doc_id string, lang string, text string")


@pytest.fixture(scope="module")
def stages(corpus):
    return CU.curate(corpus, budget_per_lang=400, n_streams=2)


def test_stage_order_and_containment(stages):
    assert tuple(stages) == CU.STAGES
    ids = {
        name: {r["doc_id"] for r in df.select("doc_id").collect()}
        for name, df in stages.items()
    }
    assert (
        ids["token_budget"] <= ids["near_dedup"] <= ids["exact_dedup"]
        <= ids["quality"] <= ids["input"]
    )
    assert "902" not in ids["quality"]  # junk dropped by the gate
    # exact pair {3, 900}: string-min keeps "3"; near pair {5, 901}: keeps "5"
    assert "900" not in ids["exact_dedup"] and "3" in ids["exact_dedup"]
    assert "901" not in ids["near_dedup"] and "5" in ids["near_dedup"]


def test_funnel_matches_stage_counts(stages):
    funnel = {r["stage"]: r for r in CU.funnel(stages).collect()}
    assert [funnel[s]["stage_order"] for s in CU.STAGES] == [0, 1, 2, 3, 4]
    for name, df in stages.items():
        agg = df.agg(
            F.count("*").alias("n"), F.sum("tokens").alias("t")
        ).first()
        assert funnel[name]["n_docs"] == agg["n"]
        assert funnel[name]["n_tokens"] == (agg["t"] or 0)


def test_budget_respected_per_language(stages):
    per_stream = 400 // 2
    got = stages["token_budget"].groupBy("lang").agg(
        F.max("cum_tokens").alias("mx")
    ).collect()
    assert got and all(r["mx"] <= per_stream for r in got)


def test_keep_cols_passthrough_zero_exchange(spark):
    df = spark.createDataFrame(
        [("1", "en", "the ship and the port have cargo that be plenty "
          "loaded with goods of every kind to sail")],
        "doc_id string, lang string, text string",
    ).withColumn("tokens", F.lit(17).cast("bigint"))
    out = QR.gopher_quality(df, keep_cols=("lang", "text", "tokens"))
    row = out.first()
    assert row["lang"] == "en" and row["tokens"] == 17
    assert row["text"].startswith("the ship")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the gate flag stays per-row with keep_cols
