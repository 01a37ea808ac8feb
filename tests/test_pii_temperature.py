"""PII redaction (mrmr_spark.operators.pii) and temperature-based
domain-mixture sampling (curation.temperature_sample). Oracles are plain
Python: the `re` module for the engine-portable regex subset, and a
literal largest-remainder implementation for the quota arithmetic; the
DuckDB SQL twins run in the gate (`pii_redact`, `temperature_sample`
rows)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.curation import temperature_quotas, temperature_sample
from mrmr_spark.operators.pii import (
    DEFAULT_KINDS,
    PII_PATTERNS,
    redact_pii,
)


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "reach me at jane.doe+spam@example.co.uk or on 415-555-0199 today", "a"),
        (1, "server 10.0.42.7 responded; token deadbeefcafebabe0123456789abcdef0042", "a"),
        (2, "ssn 123-45-6789 and phone (212) 555-0100, backup +1 646.555.0123", "b"),
        (3, "no pii here, just words and the number 17", "b"),
        (4, "double email a@b.io c@d.org and ip 255.255.255.255", "c"),
        (5, "", "c"),
        (6, "edge: version 1.2.3.4 redacts too (documented recall-leaning)", "c"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).cache()


def _py_redact(text, kinds=DEFAULT_KINDS):
    for k in kinds:
        text = re.sub(PII_PATTERNS[k], f"[{k.upper()}]", text)
    return text


def test_redact_pii_matches_python_re(pii_docs):
    out = redact_pii(pii_docs).orderBy("doc_id").collect()
    src = {r.doc_id: r.text for r in pii_docs.collect()}
    for r in out:
        orig = src[r.doc_id]
        assert r.text == _py_redact(orig), orig
        for k in DEFAULT_KINDS:
            assert r[f"n_{k}"] == len(re.findall(PII_PATTERNS[k], orig)), (k, orig)


def test_redact_pii_counts_hit_every_kind(pii_docs):
    tot = (
        redact_pii(pii_docs)
        .agg(*[F.sum(f"n_{k}").alias(k) for k in DEFAULT_KINDS])
        .first()
    )
    assert tot.email == 3 and tot.ssn == 1 and tot.hex_secret == 1
    assert tot.ipv4 >= 3 and tot.phone >= 3


def test_redact_pii_out_col_keeps_original(pii_docs):
    out = redact_pii(pii_docs, out_col="clean", with_counts=False)
    assert set(out.columns) == {"doc_id", "text", "source", "clean"}
    r = out.where("doc_id = 0").first()
    assert "jane.doe" in r.text and "[EMAIL]" in r.clean


def test_redact_pii_kind_subset_and_order(pii_docs):
    out = redact_pii(pii_docs, kinds=("ipv4",), with_counts=False)
    r = out.where("doc_id = 1").first()
    assert "[IPV4]" in r.text and "deadbeef" in r.text  # hex left alone


def test_redact_pii_rejects_unknown_kind(pii_docs):
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(pii_docs, kinds=("email", "nope"))
    with pytest.raises(ValueError, match="non-empty"):
        redact_pii(pii_docs, kinds=())


def test_redact_pii_plan_is_pure_project(pii_docs):
    plan = redact_pii(pii_docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# temperature sampling


def _py_quotas(counts: dict, total: int, temperature: float) -> dict:
    w = {s: c ** (1.0 / temperature) for s, c in counts.items()}
    sw = sum(w.values())
    ideal = {s: total * w[s] / sw for s in w}
    base = {s: math.floor(ideal[s]) for s in w}
    seats = total - sum(base.values())
    order = sorted(w, key=lambda s: (-round(ideal[s] - base[s], 9), s))
    for s in order[:seats]:
        base[s] += 1
    return {s: min(base[s], counts[s]) for s in w}


@pytest.fixture(scope="module")
def skew_docs(spark):
    rows = []
    sizes = {"web": 700, "books": 120, "code": 60, "wiki": 15, "tiny": 3}
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"text {i}", s))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).cache()


@pytest.mark.parametrize("temperature", [1.0, 2.0, 100.0])
def test_temperature_quotas_match_python(skew_docs, temperature):
    counts = {r.source: r.cnt for r in
              skew_docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    cdf = skew_docs.groupBy("source").agg(F.count(F.lit(1)).alias("_cnt"))
    got = {
        r.source: r.quota
        for r in temperature_quotas(cdf, 200, temperature).collect()
    }
    assert got == _py_quotas(counts, 200, temperature)
    assert sum(got.values()) <= 200


def test_temperature_extremes(skew_docs):
    counts = {r.source: r.cnt for r in
              skew_docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    cdf = skew_docs.groupBy("source").agg(F.count(F.lit(1)).alias("_cnt"))
    # T=1: proportional (largest-remainder of the exact shares)
    prop = {r.source: r.quota for r in temperature_quotas(cdf, 100, 1.0).collect()}
    assert prop["web"] > 70 and prop["tiny"] == 0
    # T large: near-uniform, clamped by the tiny stratum's size
    uni = {r.source: r.quota for r in temperature_quotas(cdf, 100, 1e6).collect()}
    assert uni["tiny"] == counts["tiny"] and uni["wiki"] == counts["wiki"]
    big = [uni[s] for s in ("web", "books", "code")]
    assert max(big) - min(big) <= 1 and min(big) >= 19


def test_temperature_sample_fills_quotas_deterministically(skew_docs):
    out = temperature_sample(skew_docs, "source", 150, 2.0, keep_rank=True)
    got = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    counts = {r.source: r.cnt for r in
              skew_docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    want = _py_quotas(counts, 150, 2.0)
    assert {r.source: r.n for r in got} == {s: q for s, q in want.items() if q > 0}
    # deterministic under repartitioning, and a subset of the input
    again = temperature_sample(
        skew_docs.repartition(13), "source", 150, 2.0, keep_rank=True
    )
    a = sorted((r.source, r.doc_id, r.sample_rank) for r in out.collect())
    b = sorted((r.source, r.doc_id, r.sample_rank) for r in again.collect())
    assert a == b
    ids = {r.doc_id for r in skew_docs.collect()}
    assert all(r.doc_id in ids for r in out.collect())
    assert out.columns == skew_docs.columns + ["sample_rank"]


def test_temperature_sample_rejects_bad_params(skew_docs):
    with pytest.raises(ValueError, match="positive"):
        temperature_sample(skew_docs, "source", 0)
    with pytest.raises(ValueError, match="temperature"):
        temperature_sample(skew_docs, "source", 10, temperature=0.0)
    with pytest.raises(ValueError, match="temperature"):
        temperature_sample(skew_docs, "source", 10, temperature=float("nan"))
