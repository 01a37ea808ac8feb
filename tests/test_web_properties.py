"""Property tests for the URL layer: component-generated URLs (plus junk)
run through url_parts / normalize_url in ONE batched frame per example and
compared against independent Python oracles."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mrmr_spark.operators.web import (
    COMMON_TWO_LABEL_SUFFIXES,
    DEFAULT_DROP_PARAM_PREFIXES,
    DEFAULT_DROP_PARAMS,
    normalize_url,
    url_parts,
)

SET = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_LABEL = st.sampled_from(
    ["example", "www", "a1", "x-y", "co", "uk", "EXAMPLE", "News", "shop"]
)
_SCHEME = st.sampled_from(["http", "https", "HTTPS", "ftp", "a+b-c."])
_USER = st.sampled_from(["", "user@", "u:pw@"])
_PORT = st.sampled_from(["", ":80", ":443", ":8080"])
_PATH = st.sampled_from(["", "/", "/a", "/A/b.c", "/p/q/"])
_PNAME = st.sampled_from(["id", "utm_source", "utm_x", "gclid", "a", "ref", "refid"])


@st.composite
def url_strategy(draw):
    if draw(st.integers(0, 9)) == 0:  # junk slice
        return draw(st.sampled_from(["", "not a url", "//x.y/z", "a b c", ":/"]))
    scheme = draw(_SCHEME)
    user = draw(_USER)
    host = ".".join(draw(st.lists(_LABEL, min_size=1, max_size=4)))
    port = draw(_PORT)
    path = draw(_PATH)
    q = "&".join(
        f"{draw(_PNAME)}={draw(st.integers(0, 99))}"
        for _ in range(draw(st.integers(0, 3)))
    )
    frag = draw(st.sampled_from(["", "#f", "#Frag/2"]))
    url = f"{scheme}://{user}{host}{port}{path}"
    if q or draw(st.booleans()):
        url += f"?{q}" if q else ""
    return url + frag


def _py_parts(u):
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


def _py_normalize(u):
    scheme = _py_parts(u)[0]
    if not scheme:
        return u
    base = u.split("#")[0]
    pre_q = base.split("?")[0]
    has_q = "?" in base
    q = base[len(pre_q) + 1 :] if has_q else ""
    pm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", base)
    path = pm.group(1) if pm else ""
    prefix = pre_q[: len(pre_q) - len(path)].lower()
    if scheme == "http":
        prefix = re.sub(r":80$", "", prefix)
    elif scheme == "https":
        prefix = re.sub(r":443$", "", prefix)
    kept = [
        p
        for p in q.split("&")
        if p.split("=")[0] not in DEFAULT_DROP_PARAMS
        and not any(p.split("=")[0].startswith(x) for x in DEFAULT_DROP_PARAM_PREFIXES)
    ]
    kq = "&".join(kept)
    return prefix + path + (f"?{kq}" if has_q and kq else "")


@SET
@given(st.lists(url_strategy(), min_size=1, max_size=40))
def test_url_parts_property(spark, urls):
    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    got = {
        r["doc_id"]: (r["scheme"], r["host"], r["path"], r["registered_domain"], r["tld"])
        for r in url_parts(df).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _py_parts(u), u


@SET
@given(st.lists(url_strategy(), min_size=1, max_size=40))
def test_normalize_url_property(spark, urls):
    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    got = {r["doc_id"]: r["url_norm"] for r in normalize_url(df).collect()}
    for i, u in enumerate(urls):
        assert got[i] == _py_normalize(u), u
    # idempotence: normalizing a normalized URL is a fixed point
    df2 = spark.createDataFrame(
        [(i, v) for i, v in got.items()], "doc_id long, url string"
    )
    got2 = {r["doc_id"]: r["url_norm"] for r in normalize_url(df2).collect()}
    assert got2 == got


@pytest.mark.parametrize("u", ["https://example.com/x?a=1&utm_source=t#f"])
def test_python_oracle_sanity(u):
    assert _py_normalize(u) == "https://example.com/x?a=1"
