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
