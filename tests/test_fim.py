"""Fill-in-the-middle transform: reassembly oracle, exact affine
re-derivation, PSM/SPM piece identity, rate edges, validation."""

import pytest

import pyspark.sql.functions as F

from mrmr_spark.operators.curation import (
    KNUTH_MULT,
    _FIM_MULT,
    _HASH_SPACE,
    fim_transform,
)

P, M, S = "<fim_prefix>", "<fim_middle>", "<fim_suffix>"

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "x"),
    (2, ""),
    (3, "hash join beats sort merge join on large tables"),
    (4, None),
    (5, "0123456789" * 7),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _affine_u(doc_id: int, salt: int) -> float:
    return ((doc_id * KNUTH_MULT + salt * _FIM_MULT) % _HASH_SPACE) / _HASH_SPACE


def _py_fim(doc_id: int, text: str, rate: float, mode: str):
    """Independent Python re-derivation of the affine-family transform."""
    applied = _affine_u(doc_id, 1) < rate
    if text is None:
        return applied, None
    if not applied:
        return False, text
    n = len(text)
    p1 = int(_affine_u(doc_id, 2) * (n + 1))
    p2 = int(_affine_u(doc_id, 3) * (n + 1))
    lo, hi = min(p1, p2), max(p1, p2)
    pre, mid, suf = text[:lo], text[lo:hi], text[hi:]
    if mode == "psm":
        return True, f"{P}{pre}{S}{suf}{M}{mid}"
    return True, f"{P}{S}{suf}{M}{pre}{mid}"


def test_fim_affine_matches_python_oracle(spark, docs):
    for mode in ("psm", "spm"):
        got = {
            r.doc_id: (r.fim_applied, r.text)
            for r in fim_transform(docs, rate=0.6, mode=mode, hash_fn="affine")
            .collect()
        }
        want = {d: _py_fim(d, t, 0.6, mode) for d, t in DOCS}
        assert got == want, mode


def test_fim_reassembly_roundtrip_xxhash(spark, docs):
    """For every applied row (any hash family), splitting the rendering
    on the sentinels and reassembling must give back the original text —
    the transform may rearrange, never lose or duplicate characters."""
    out = fim_transform(docs, rate=1.0).collect()
    orig = dict((d, t) for d, t in DOCS)
    for r in out:
        assert r.fim_applied
        if orig[r.doc_id] is None:
            assert r.text is None
            continue
        assert r.text.startswith(P)
        body = r.text[len(P):]
        suf_part, mid = body.split(M, 1)
        pre = suf_part.split(S, 1)[0]
        suf = suf_part.split(S, 1)[1]
        assert pre + mid + suf == orig[r.doc_id], r.doc_id


def test_fim_rate_edges_and_determinism(spark, docs):
    zero = fim_transform(docs, rate=0.0).collect()
    assert all(not r.fim_applied for r in zero)
    assert {r.doc_id: r.text for r in zero} == dict(DOCS)
    a = fim_transform(docs.repartition(5), rate=0.5).sort("doc_id").collect()
    b = fim_transform(docs.repartition(2), rate=0.5).sort("doc_id").collect()
    assert a == b  # seed-free hash decisions: layout-independent


def test_fim_spm_same_pieces_as_psm(spark, docs):
    psm = {r.doc_id: r.text for r in fim_transform(docs, rate=1.0, mode="psm").collect()}
    spm = {r.doc_id: r.text for r in fim_transform(docs, rate=1.0, mode="spm").collect()}
    for d, t in DOCS:
        if t is None:
            continue
        body = psm[d][len(P):]
        pre = body.split(S, 1)[0]
        suf, mid = body.split(S, 1)[1].split(M, 1)
        assert spm[d] == f"{P}{S}{suf}{M}{pre}{mid}", d


def test_fim_pure_projection_plan(spark, docs):
    plan = (
        fim_transform(docs, rate=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_fim_validation(spark, docs):
    with pytest.raises(ValueError, match="rate must be"):
        fim_transform(docs, rate=1.5)
    with pytest.raises(ValueError, match="mode must be"):
        fim_transform(docs, mode="pms")
    with pytest.raises(ValueError, match="Unknown hash_fn"):
        fim_transform(docs, hash_fn="md5").collect()
