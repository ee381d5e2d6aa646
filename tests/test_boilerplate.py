"""HTML main-content extraction (operators/boilerplate.py) — block
classification, smoothing, entity/inline-tag handling, plan shape."""

import pyspark.sql.functions as F
import pytest

from wordscape_spark.operators import boilerplate as BP


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, html string")
    return {
        r["doc_id"]: r
        for r in BP.html_main_content(df).collect()
    }


def test_hand_page(spark):
    html = (
        "<html><head><title>Doc X</title></head><body>"
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<p>this paragraph has clearly enough words to be good.</p>"
        "<div>Read more</div>"
        "<p>another paragraph with plenty of words to keep around.</p>"
        '<footer>See <a href="/t">terms and conditions over here</a>'
        "</footer></body></html>"
    )
    out = _run(spark, [(1, html)])[1]
    # title short (2w, neighbors nav short) -> dropped; nav short
    # (2 anchors, 2 words) -> dropped; teaser short between goods ->
    # kept; footer link-dense -> dropped
    assert out["main_text"] == (
        "this paragraph has clearly enough words to be good.\n"
        "Read more\n"
        "another paragraph with plenty of words to keep around."
    )
    assert out["n_blocks"] == 6
    assert out["n_kept"] == 3


def test_link_density_gate(spark):
    # 8 words, anchor mass > 0.35 of chars -> bad despite length
    html = (
        '<p>Visit <a href="/x">this excellent page full of links</a>'
        " now</p><p>a normal sentence with sufficient words to pass"
        " the gate.</p>"
    )
    out = _run(spark, [(1, html)])[1]
    assert out["main_text"] == (
        "a normal sentence with sufficient words to pass the gate."
    )


def test_entities_and_inline_tags(spark):
    html = (
        "<p>Rock &amp; roll with <b>bold</b>&nbsp;spacing kept"
        " intact here.</p>"
    )
    out = _run(spark, [(1, html)])[1]
    assert out["main_text"] == "Rock & roll with bold spacing kept intact here."


def test_short_needs_good_neighbor(spark):
    # an isolated short block between two bad blocks is dropped
    html = (
        '<div><a href="/a">all links everywhere in this one</a></div>'
        "<p>tiny bit</p>"
        '<div><a href="/b">another fully linked boilerplate block</a></div>'
    )
    assert _run(spark, [(1, html)]) == {}


def test_empty_and_null_pages_dropped(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "<p></p><div></div>")],
        "doc_id long, html string",
    )
    assert BP.html_main_content(df).count() == 0


def test_boiler_char_frac(spark):
    html = (
        "<p>aaaa bbbb cccc dddd eeee</p>"
        '<div><a href="/">xx yy zzz qqq rrr</a></div>'
    )
    out = _run(spark, [(1, html)])[1]
    # kept 24 chars, dropped the 17-char link farm: 17/41
    assert out["boiler_char_frac"] == round(17 / 41, 6)
    assert out["n_blocks"] == 2 and out["n_kept"] == 1


def test_stop_density_gate_when_enabled(spark):
    df = spark.createDataFrame(
        [(1, "<p>alpha beta gamma delta epsilon zeta</p>"
             "<p>the word the appears with the stopwords here.</p>")],
        "doc_id long, html string",
    )
    out = BP.html_main_content(df, stop_frac_min=0.2).collect()
    assert len(out) == 1
    assert out[0]["main_text"].startswith("the word the")


def test_html_plan_zero_exchange(spark):
    """The scale claim: segmentation, features, classification and
    smoothing are one per-row projection — page HTML never shuffles
    and never crosses into Python."""
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = (
        BP.html_main_content(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_demo_generator_spark_shape(spark):
    """Generator fixture: every classification path present on a
    24-word doc with sidebar (doc_id % 3 = 0)."""
    words = " ".join(f"w{i:02d}" for i in range(24))
    df = spark.createDataFrame(
        [(3, words)], "doc_id long, text string"
    ).withColumn("html", F.expr(BP.demo_html_expr("spark")))
    out = BP.html_main_content(df).collect()[0]
    p1 = " ".join(f"w{i:02d}" for i in range(12)) + "."
    p2 = " ".join(f"w{i:02d}" for i in range(12, 24)) + "."
    assert out["main_text"] == (
        "w00 w01 w02\n" + p1 + "\n" + p2 + "\nRead more\n"
        "Here is bold text and this block has enough words to stay."
    )
    # title, nav, sidebar, h1, p1, p2, teaser, bold, footer
    assert out["n_blocks"] == 9
    assert out["n_kept"] == 5


@pytest.mark.parametrize("doc_id,n_blocks", [(1, 8), (3, 9)])
def test_demo_generator_sidebar_variation(spark, doc_id, n_blocks):
    words = " ".join(f"w{i}" for i in range(24))
    df = spark.createDataFrame(
        [(doc_id, words)], "doc_id long, text string"
    ).withColumn("html", F.expr(BP.demo_html_expr("spark")))
    out = BP.html_main_content(df).collect()[0]
    assert out["n_blocks"] == n_blocks
    assert out["n_kept"] == 5
