"""HTML → text extraction tests (functions/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.functions import html as hf


def _extract(spark, html: str) -> tuple[str, str]:
    df = spark.createDataFrame([(html,)], "html string").select(
        hf.html_title(F.col("html")).alias("t"),
        hf.html_to_text(F.col("html")).alias("x"),
    )
    row = df.collect()[0]
    return row["t"], row["x"]


def test_strips_script_style_content_and_tags(spark):
    t, x = _extract(
        spark,
        '<html><head><title> My &amp; Page </title>'
        "<style>body .m 1</style></head>"
        '<body><script type="text/javascript">var x = 1 < 2; alert("hi")'
        "</script><h1>Head</h1><p>para one</p><p>para   two</p>"
        "<div>tail</div></body></html>",
    )
    assert t == "My & Page"
    assert "var x" not in x and "body .m" not in x and "alert" not in x
    # title text rides along in the body extraction (naive strip keeps
    # head text), entities decoded after tag strip
    assert x == "My & Page\nHead\npara one\npara two\ntail"


def test_entities_decode_and_amp_last(spark):
    _, x = _extract(spark, "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp;lt; e&nbsp;f</p>")
    # &amp;lt; must decode to the literal text '&lt;', not '<'
    assert x == "a <b> \"c\" 'd' &lt; e f"


def test_break_tags_become_newlines_and_collapse(spark):
    _, x = _extract(spark, "<ul><li>one</li><li>two</li></ul><br><br>three")
    assert x == "one\ntwo\nthree"


def test_null_and_plain_text_passthrough(spark):
    df = spark.createDataFrame([(None,), ("no tags here",)], "html string").select(
        hf.html_to_text(F.col("html")).alias("x")
    )
    vals = [r["x"] for r in df.collect()]
    assert vals == [None, "no tags here"]


def test_html_extract_plan_is_shuffle_free_jvm_only(spark):
    df = spark.createDataFrame([("<p>a</p>",)], "html string").select(
        hf.html_to_text(F.col("html")).alias("x"),
        hf.html_title(F.col("html")).alias("t"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
