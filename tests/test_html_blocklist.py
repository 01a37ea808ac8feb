"""HTML -> text extraction and term-blocklist filtering."""

import pytest

from mrmr_spark.operators.curation import filter_by_terms
from mrmr_spark.operators.html import strip_html


CASES = [
    # (html, expected text)
    ("<p>hello world</p>", "hello world"),
    ("<P>hello</P><p>world</p>", "hello world"),  # tags become spaces
    ("<script>var a = '<p>x</p>';</script>keep", "keep"),
    ("<SCRIPT src='x'>1<2</SCRIPT>a<style>p{}</style>b", "a b"),
    ("<!-- a\nmultiline\ncomment -->text", "text"),
    ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; c&nbsp;d", "a & b <tag> \"q\" 's' c d"),
    ("&amp;lt;", "&lt;"),  # &amp; decodes LAST: no double-decode
    ("  lots \t of\n\nspace  ", "lots of space"),
    ("<script>one</script>mid<script>two</script>", "mid"),  # lazy blocks
    ("<div class='x' data-a=\"1\">v</div>", "v"),
    ("", ""),
    ("plain", "plain"),
]


def test_strip_html_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i long, text string"
    )
    got = {r.i: r.text for r in strip_html(df).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i], want)


def test_strip_html_out_col_keeps_raw(spark):
    df = spark.createDataFrame([(0, "<b>x</b>")], "i long, text string")
    (r,) = strip_html(df, out_col="clean").collect()
    assert r.text == "<b>x</b>" and r.clean == "x"


def test_strip_html_is_pure_projection(spark):
    df = spark.createDataFrame([(0, "<b>x</b>")], "i long, text string")
    plan = strip_html(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_filter_by_terms_drop_and_flag(spark):
    df = spark.createDataFrame(
        [
            (0, "clean words only"),
            (1, "contains BAD word"),
            (2, "bad bad and badge"),  # 'badge' must NOT match
            (3, ""),
        ],
        "i long, text string",
    )
    kept = sorted(r.i for r in filter_by_terms(df, ["bad"]).collect())
    assert kept == [0, 3]
    flags = {r.i: (r.n_blocked_terms, r.keep)
             for r in filter_by_terms(df, ["bad"], mode="flag").collect()}
    assert flags == {0: (0, True), 1: (1, False), 2: (2, False), 3: (0, True)}
    # case sensitivity off
    kept_cs = sorted(
        r.i for r in filter_by_terms(df, ["bad"], case_insensitive=False).collect()
    )
    assert kept_cs == [0, 1, 3]


def test_filter_by_terms_dataframe_and_empty_list(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "c d")], "i long, text string")
    terms = spark.createDataFrame([("c",)], "term string")
    assert sorted(r.i for r in filter_by_terms(df, terms).collect()) == [0]
    # empty blocklist keeps everything
    assert filter_by_terms(df, []).count() == 2
    with pytest.raises(ValueError, match="mode"):
        filter_by_terms(df, ["x"], mode="nope")


def test_filter_by_terms_literal_is_pure_projection(spark):
    df = spark.createDataFrame([(0, "a b")], "i long, text string")
    plan = (
        filter_by_terms(df, ["a"], mode="flag")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
