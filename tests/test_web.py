"""URL / domain operators (mrmr_spark.operators.web). Oracle is plain
Python urllib-style parsing on a messy fixture; the gate rows
(`url_parts`, `domain_stats`) value-check against a by-construction
ground-truth CASE table in DuckDB."""

import pandas as pd
import pytest

from mrmr_spark.operators.web import (
    COMMON_TWO_LABEL_SUFFIXES,
    domain_stats,
    filter_by_domains,
    url_parts,
)

URLS = [
    (0, "https://news.example.com/world/story.html?id=9#frag"),
    (1, "http://blog.sample.co.uk/post/1"),
    (2, "https://shop.example.org:8080/cart"),
    (3, "http://localhost/dev"),
    (4, "https://user:pw@sub.data.example.net/a/b"),
    (5, "HTTPS://WWW.EXAMPLE.COM/Keep/Case?x=1"),  # case-insens scheme/host
    (6, "ftp://files.example.com/pub"),
    (7, "not a url at all"),
    (8, ""),
    (9, "https://example.com"),  # no path
    (10, "//protocol-relative.example.com/x"),  # no scheme -> unparsed
]


def _py_parts(u):
    import re

    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", u)
    if not m:
        return ("", "", "", "", "")
    scheme = m.group(1).lower()
    hm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/?#]+)", u)
    raw = hm.group(1).lower() if hm else ""
    host = raw.split(":")[0]
    pm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = pm.group(1) if pm else ""
    if not host:
        return (scheme, "", path, "", "")
    labels = host.split(".")
    if len(labels) <= 1:
        reg = host
    elif len(labels) >= 3 and ".".join(labels[-2:]) in COMMON_TWO_LABEL_SUFFIXES:
        reg = ".".join(labels[-3:])
    else:
        reg = ".".join(labels[-2:])
    return (scheme, host, path, reg, labels[-1])


def test_url_parts_matches_python_oracle(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    got = {
        r["doc_id"]: (r["scheme"], r["host"], r["path"], r["registered_domain"], r["tld"])
        for r in url_parts(df).collect()
    }
    exp = {i: _py_parts(u) for i, u in URLS}
    assert got == exp
    # spot-check the shapes the fixture plants
    assert got[2][1] == "shop.example.org"  # port stripped
    assert got[4][1] == "sub.data.example.net"  # userinfo stripped
    assert got[1][3] == "sample.co.uk"  # two-label public suffix
    assert got[3][3] == "localhost"  # dotless host
    assert got[5] == ("https", "www.example.com", "/Keep/Case", "example.com", "com")
    assert got[7] == ("", "", "", "", "")  # junk -> all-'' parts, no NULLs
    assert got[10][0] == ""  # protocol-relative not claimed as parsed


def test_url_parts_is_pure_projection(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    plan = url_parts(df)._jdf.queryExecution().toString()
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Exchange" not in phys and "BatchEvalPython" not in phys


def test_url_parts_runs_on_streams(spark, tmp_path):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    d = str(tmp_path / "urls")
    df.coalesce(1).write.parquet(d)
    q = (
        url_parts(spark.readStream.schema(df.schema).parquet(d))
        .writeStream.format("memory")
        .queryName("urlstream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("urlstream").toPandas().sort_values("doc_id").reset_index(drop=True)
    batch = url_parts(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, batch)


@pytest.fixture(scope="module")
def parsed(spark):
    rows = [(i, u, f"tok{i} " * (i + 1)) for i, u in URLS]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    return url_parts(df).cache()


def test_filter_by_domains_list_and_frame(spark, parsed):
    # example.com is the registered domain of docs 0, 5, 6 (ftp host), 9
    blocked = filter_by_domains(parsed, ["example.com"], mode="block")
    assert set(blocked.toPandas()["doc_id"]) == {1, 2, 3, 4, 7, 8, 10}
    allowed = filter_by_domains(parsed, ["example.com"], mode="allow")
    assert set(allowed.toPandas()["doc_id"]) == {0, 5, 6, 9}
    # DataFrame blocklist: broadcast anti join, same result
    bl = spark.createDataFrame([("example.com",)], "d string")
    via_frame = filter_by_domains(parsed, bl, mode="block")
    assert set(via_frame.toPandas()["doc_id"]) == {1, 2, 3, 4, 7, 8, 10}
    plan = via_frame._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_filter_by_domains_validation(parsed, spark):
    with pytest.raises(ValueError, match="mode"):
        filter_by_domains(parsed, ["x"], mode="nope")
    with pytest.raises(ValueError, match="non-empty"):
        filter_by_domains(parsed, [])
    with pytest.raises(ValueError, match="one column"):
        filter_by_domains(parsed, spark.createDataFrame([(1, 2)], "a int, b int"))


def test_domain_stats_matches_python(parsed):
    got = {
        r["registered_domain"]: (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in domain_stats(parsed).collect()
    }
    texts = {i: f"tok{i} " * (i + 1) for i, _ in URLS}
    exp = {}
    for i, u in URLS:
        reg = _py_parts(u)[3]
        t = texts[i]
        d, tok, ch = exp.get(reg, (0, 0, 0))
        exp[reg] = (d + 1, tok + len(t.split(" ")), ch + len(t))
    assert got == exp
    assert got["example.com"][0] == 4  # docs 0, 5, 6, 9


# ---------------------------------------------------------------------------
# normalize_url
# ---------------------------------------------------------------------------

NORM_CASES = [
    # (input, expected with defaults)
    ("HTTPS://News.Example.COM:443/Path/Page?utm_source=x&id=9&utm_medium=y#f",
     "https://news.example.com/Path/Page?id=9"),
    ("http://a.example.com:80/x?gclid=1", "http://a.example.com/x"),
    ("http://a.example.com:8080/x?a=1&b=2", "http://a.example.com:8080/x?a=1&b=2"),
    ("https://example.com/x?", "https://example.com/x"),
    ("https://example.com/x?ref=abc&refid=keep", "https://example.com/x?refid=keep"),
    ("https://user@Host.Example.com/P?utm_a=1", "https://user@host.example.com/P"),
    ("https://example.com", "https://example.com"),
    ("not a url", "not a url"),
    ("", ""),
]


def test_normalize_url_cases(spark):
    from mrmr_spark.operators.web import normalize_url

    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(NORM_CASES)], "doc_id long, url string"
    )
    got = {r["doc_id"]: r["url_norm"] for r in normalize_url(df).collect()}
    for i, (u, want) in enumerate(NORM_CASES):
        assert got[i] == want, (u, got[i], want)


def test_normalize_url_options(spark):
    from mrmr_spark.operators.web import normalize_url

    df = spark.createDataFrame(
        [(0, "https://www.example.com/a#frag")], "doc_id long, url string"
    )
    keep_frag = normalize_url(df, strip_fragment=False).first()["url_norm"]
    assert keep_frag == "https://www.example.com/a#frag"
    no_www = normalize_url(df, strip_www=True).first()["url_norm"]
    assert no_www == "https://example.com/a"


def test_normalize_url_enables_url_dedup(spark):
    """The composition the operator exists for: crawl variants of one
    page collapse to a single canonical key."""
    from mrmr_spark.operators.web import normalize_url

    variants = [
        (0, "https://example.com/story?utm_source=feed"),
        (1, "HTTPS://EXAMPLE.COM:443/story"),
        (2, "https://example.com/story#comments"),
        (3, "https://example.com/other"),
    ]
    df = normalize_url(spark.createDataFrame(variants, "doc_id long, url string"))
    keys = df.groupBy("url_norm").count().collect()
    assert {r["url_norm"]: r["count"] for r in keys} == {
        "https://example.com/story": 3,
        "https://example.com/other": 1,
    }


def test_normalize_url_pure_projection_and_streams(spark, tmp_path):
    from mrmr_spark.operators.web import normalize_url

    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(NORM_CASES)], "doc_id long, url string"
    )
    plan = normalize_url(df)._jdf.queryExecution().toString()
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Exchange" not in phys and "BatchEvalPython" not in phys
    d = str(tmp_path / "normin")
    df.coalesce(1).write.parquet(d)
    q = (
        normalize_url(spark.readStream.schema(df.schema).parquet(d))
        .writeStream.format("memory").queryName("normstream")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("normstream").toPandas().sort_values("doc_id").reset_index(drop=True)
    batch = normalize_url(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, batch)
