"""Hypothesis property tests for the retrieval and shard kernels on
adversarial corpora — tiny alphabets (forced term collisions), empty
and single-token docs, repeated tokens — each against plain-Python /
numpy oracles. Same harness conventions as test_kernel_properties.py."""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from mrmr_spark.operators.retrieval import bm25_scores
from mrmr_spark.sources.shards import hash_shards, sized_shards

SET = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny alphabet forces shared terms; "" entries produce doubled
# separators the tokenizer must drop
TOKENS = ["a", "b", "c", "ab", ""]


def corpus_strategy(min_docs=1, max_docs=10):
    return st.lists(
        st.lists(st.sampled_from(TOKENS), min_size=0, max_size=12).map(" ".join),
        min_size=min_docs,
        max_size=max_docs,
    )


def _py_bm25(texts, qtexts, k1=1.2, b=0.75):
    toks = {i: [w for w in t.split(" ") if w] for i, t in enumerate(texts)}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qt in enumerate(qtexts):
        for w in sorted(set(x for x in qt.split(" ") if x)):
            df = sum(1 for t in toks.values() if w in t)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, t in toks.items():
                tf = t.count(w)
                if tf:
                    out[(qid, i)] = out.get((qid, i), 0.0) + (
                        idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
                    )
    return {k: round(v, 6) for k, v in out.items()}


@SET
@given(texts=corpus_strategy(), qidx=st.integers(0, 4))
def test_bm25_matches_python_oracle_on_random_corpora(spark, texts, qidx):
    # queries: one corpus doc's text (guaranteed-matching terms when
    # non-empty) + a fixed probe
    qtexts = [texts[qidx % len(texts)], "a zz"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(i, t) for i, t in enumerate(qtexts)], "q_id long, query string"
    )
    got = {(r.q_id, r.doc_id): r.score for r in bm25_scores(d, q).collect()}
    want = _py_bm25(texts, qtexts)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=2e-6), k


def test_bm25_null_and_empty_text_docs(spark):
    """NULL/empty docs never match and never corrupt N/avgdl: both count
    as zero-length documents (F.size on the filtered split is 0; NULL
    text tokenizes to NULL -> coalesced by the sum skip), so scores for
    real docs shift only through avgdl — which the oracle reproduces."""
    texts = [None, "", "a b a", "b b"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    q = spark.createDataFrame([(0, "a b")], "q_id long, query string")
    got = {(r.q_id, r.doc_id): r.score for r in bm25_scores(d, q).collect()}
    # python oracle with NULL treated as empty
    want = _py_bm25(["" if t is None else t for t in texts], ["a b"])
    assert set(got) == set(want) and 0 not in {k[1] for k in got} and 1 not in {
        k[1] for k in got
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=2e-6)


@SET
@given(
    keys=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    r=st.integers(1, 7),
)
def test_sized_shards_match_numpy_on_random_orders(spark, keys, r):
    rows = [(i, float(k)) for i, k in enumerate(keys)]
    d = spark.createDataFrame(rows, "doc_id long, key double").repartition(5)
    pin = []
    got = {
        x.doc_id: (x.rank, x.shard)
        for x in sized_shards(d, r, order_by=["key"], rank_col="rank",
                              pin=pin).collect()
    }
    for p in pin:
        p.unpersist()
    order = np.lexsort((np.arange(len(keys)), np.asarray(keys, dtype=float)))
    for rank, doc in enumerate(order):
        assert got[int(doc)] == (rank, rank // r)


@SET
@given(n_shards=st.integers(1, 9))
def test_hash_shards_partition_function_is_stable(spark, n_shards):
    d = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    a = {r.doc_id: r.shard for r in hash_shards(d, n_shards).collect()}
    b = {r.doc_id: r.shard
         for r in hash_shards(d.repartition(7), n_shards, seed=0).collect()}
    assert a == b
    assert set(a.values()) <= set(range(n_shards))
    # a different seed must produce a different assignment (n big enough)
    if n_shards > 1:
        c = {r.doc_id: r.shard for r in hash_shards(d, n_shards, seed=1).collect()}
        assert c != a
