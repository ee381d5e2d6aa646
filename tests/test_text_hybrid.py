"""The hybrid (Python-counts + SQL-ratios) metric/langid operators must be
bit-identical to the pure-SQL expression forms — including NULL text, java
\\s edge characters, case-mapping oddities, and astral input."""

import pyspark.sql.functions as F

from wordscape_spark import datagen
from wordscape_spark.operators import text as T

ADVERSARIAL = [
    ("n1", None),
    ("e1", ""),
    ("s1", " "),
    ("s2", "   "),
    ("w1", "the and of la le und der die"),
    ("nb1", "the\xa0and"),          # NBSP is NOT java \s
    ("vt", "the\x0band\fof"),        # \x0b and \f ARE java \s
    ("nel", "x\x85y"),
    ("up", "THE AND OF"),
    ("mix", "  the  "),
    ("tr", "the "),
    ("p1", "...."),
    ("p2", "a....b __ c"),
    ("punct_only", "!@#$%^&*()"),
    ("digits", "123 456  789"),
    ("as1", "héllo wörld ÀÖØöøÿ 123"),
    ("cyr", "Привет the мир"),       # letters outside the 114-char set
    ("astral", "a\U0001F600b \U0001F600\U0001F600 c"),
    ("kelvin", "King the"),
    ("turk", "İstanbul the"),
]


def _adversarial_df(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id string, text string")


def _corpus(spark):
    datagen.ensure_interleaved(0.001)
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").selectExpr(
        "CAST(doc_id AS STRING) AS doc_id", "text"
    )


def test_with_metrics_matches_sql_form(spark):
    cols = ["doc_id"] + list(T.metrics_exprs("text", "spark").keys())

    def sql_form(df):
        for name, expr in T.metrics_exprs("text", "spark").items():
            df = df.withColumn(name, F.expr(expr))
        return df

    for df in (_corpus(spark), _adversarial_df(spark)):
        a = sorted(map(tuple, sql_form(df).select(cols).collect()))
        b = sorted(map(tuple, T.with_metrics(df).select(cols).collect()))
        assert a == b


def test_with_langid_matches_sql_form(spark):
    cols = (
        ["doc_id"]
        + [f"score_{lang}" for lang in T.LANGS]
        + ["top_lang", "top_lang_score", "languages_topk"]
    )

    def sql_form(df, col="text"):
        for name, expr in T.langid_exprs(col, "spark").items():
            df = df.withColumn(name, F.expr(expr))
        return df.withColumn("languages_topk", F.expr(T.langid_topk_expr("spark")))

    for df in (_corpus(spark), _adversarial_df(spark)):
        a = sorted(map(tuple, sql_form(df).select(cols).collect()))
        b = sorted(map(tuple, T.with_langid(df).select(cols).collect()))
        assert a == b


def test_with_whitelist_metrics_matches_sql_form(spark):
    from wordscape_spark.operators import filters as FL

    def sql_form(df, col="text"):
        return df.withColumn(
            "pseudo_perplexity", F.expr(FL.pseudo_perplexity_expr(col, "spark"))
        ).withColumn("quality", F.expr(T.alnum_prop_expr(col, "spark")))

    cols = ["doc_id", "pseudo_perplexity", "quality"]
    for df in (_corpus(spark), _adversarial_df(spark)):
        a = sorted(map(tuple, sql_form(df).select(cols).collect()))
        b = sorted(
            map(tuple, FL.with_whitelist_metrics(df).select(cols).collect())
        )
        assert a == b
