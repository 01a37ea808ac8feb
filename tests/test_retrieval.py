"""BM25 lexical retrieval: exact parity with a pure-Python reference
implementation, edge cases, and determinism contracts."""

import math

import pytest

import pyspark.sql.functions as F

from mrmr_spark.operators.retrieval import bm25_scores, bm25_topk

DOCS = [
    (0, "fast scan over the table"),
    (1, "hash join beats sort merge join"),
    (2, "the table scan is slow but the scan is wide"),
    (3, "merge sort"),
    (4, "unrelated words entirely"),
]
QUERIES = [(100, "table scan"), (101, "join"), (102, "nowhere term"), (103, "")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent oracle: textbook Lucene BM25, dict-and-loop."""
    toks = {d: t.split() if t else [] for d, t in docs}
    toks = {d: [w for w in t if w] for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        qterms = sorted(set(w for w in qtext.split() if w))
        for d, t in toks.items():
            s = 0.0
            matched = False
            for w in qterms:
                tf = t.count(w)
                if tf == 0:
                    continue
                matched = True
                df = sum(1 for tt in toks.values() if w in tt)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            if matched:
                out[(qid, d)] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "q_id long, query string")
    return d, q


def test_bm25_scores_match_python_oracle(spark, frames):
    d, q = frames
    got = {(r.q_id, r.doc_id): r.score for r in bm25_scores(d, q).collect()}
    want = _py_bm25(DOCS, QUERIES)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-6), key


def test_bm25_topk_ranking_and_ties(spark, frames):
    d, q = frames
    rows = bm25_topk(d, q, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append((r.rank, r.doc_id, r.score))
    # every query with matches returns <= k rows, ranks 1..m contiguous,
    # scores non-increasing, doc_id ascending within equal scores
    want = _py_bm25(DOCS, QUERIES)
    for qid, xs in by_q.items():
        xs.sort()
        assert [r for r, _, _ in xs] == list(range(1, len(xs) + 1))
        scores = [s for _, _, s in xs]
        assert scores == sorted(scores, reverse=True)
        exp = sorted(
            ((v, k[1]) for k, v in want.items() if k[0] == qid),
            key=lambda t: (-t[0], t[1]),
        )[: len(xs)]
        assert [(s, d_) for _, d_, s in xs] == [
            (pytest.approx(v, abs=2e-6), d_) for v, d_ in exp
        ]
    # unseen-term and empty queries return nothing
    assert 102 not in by_q and 103 not in by_q


def test_bm25_query_term_dedup(spark, frames):
    d, _ = frames
    q1 = spark.createDataFrame([(0, "join join join")], "q_id long, query string")
    q2 = spark.createDataFrame([(0, "join")], "q_id long, query string")
    a = sorted(map(tuple, bm25_scores(d, q1).collect()))
    b = sorted(map(tuple, bm25_scores(d, q2).collect()))
    assert a == b and a


def test_bm25_partitioning_invariance(spark, frames):
    d, q = frames
    base = sorted(map(tuple, bm25_topk(d, q, k=3).collect()))
    re1 = sorted(map(tuple, bm25_topk(d.repartition(7), q, k=3).collect()))
    re2 = sorted(map(tuple, bm25_topk(d.coalesce(1), q, k=3).collect()))
    assert base == re1 == re2


def test_bm25_validation_and_plan(spark, frames):
    d, q = frames
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(d, q, k=0)
    plan = bm25_topk(d, q, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, "corpus must never sort-merge"
    assert "WindowGroupLimit" in plan, "top-k must push the group limit"
    assert "Python" not in plan, "BM25 must stay JVM-side"


def test_bm25_indexed_equals_direct_and_roundtrips(spark, frames, tmp_path):
    from mrmr_spark.operators.retrieval import bm25_build_index, bm25_topk_indexed

    d, q = frames
    direct = sorted(map(tuple, bm25_topk(d, q, k=4).collect()))
    postings, stats = bm25_build_index(d)
    viaidx = sorted(map(tuple, bm25_topk_indexed(postings, stats, q, k=4).collect()))
    assert viaidx == direct and direct

    # persisted index: term-sorted parquet round trip, identical results,
    # and the query-time term predicate is PUSHED into the parquet scan
    pdir, sdir = str(tmp_path / "postings"), str(tmp_path / "stats")
    postings.sortWithinPartitions("term").write.parquet(pdir)
    stats.write.parquet(sdir)
    p2, s2 = spark.read.parquet(pdir), spark.read.parquet(sdir)
    out = bm25_topk_indexed(p2, s2, q, k=4)
    assert sorted(map(tuple, out.collect())) == direct
    formatted = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [In(term" in formatted.replace(", ", ",").replace(
        "In(term,", "In(term"
    ) or "term IN" in formatted, formatted[:800]

    # empty / unseen queries return an empty, correctly-typed frame
    qe = spark.createDataFrame([(9, "")], "q_id long, query string")
    empty = bm25_topk_indexed(p2, s2, qe, k=4)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["q_id", "doc_id", "rank", "score"]
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk_indexed(p2, s2, q, k=0)


# ---------------------------------------------------------------- RRF


def _py_rrf(runs, k=60, weights=None):
    """Independent oracle: dict-and-loop reciprocal-rank fusion."""
    acc = {}
    for i, run in enumerate(runs):
        w = 1.0 if weights is None else weights[i]
        for qid, did, rank in run:
            acc[(qid, did)] = acc.get((qid, did), 0.0) + w / (k + rank)
    by_q = {}
    for (qid, did), s in acc.items():
        by_q.setdefault(qid, []).append((did, s))
    out = {}
    for qid, lst in by_q.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for r, (did, s) in enumerate(lst, start=1):
            out[(qid, did)] = (round(s, 6), r)
    return out


RUN_A = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)]
RUN_B = [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2), (2, 22, 3)]


def _runs(spark):
    schema = "q_id long, doc_id long, rank int"
    return (
        spark.createDataFrame(RUN_A, schema),
        spark.createDataFrame(RUN_B, schema),
    )


def test_rrf_matches_python_oracle(spark):
    from mrmr_spark.operators.retrieval import rrf_fuse

    a, b = _runs(spark)
    got = {
        (r.q_id, r.doc_id): (r.rrf_score, r.rank)
        for r in rrf_fuse([a, b]).collect()
    }
    want = _py_rrf([RUN_A, RUN_B])
    assert got == want
    # doc 11 appears in both runs -> must outrank every single-run doc
    assert got[(1, 11)][1] == 1


def test_rrf_weights_and_topk(spark):
    from mrmr_spark.operators.retrieval import rrf_fuse

    a, b = _runs(spark)
    got = {
        (r.q_id, r.doc_id): (r.rrf_score, r.rank)
        for r in rrf_fuse([a, b], weights=[2.0, 0.5]).collect()
    }
    assert got == _py_rrf([RUN_A, RUN_B], weights=[2.0, 0.5])
    top1 = rrf_fuse([a, b], topk=1).collect()
    assert sorted((r.q_id, r.rank) for r in top1) == [(1, 1), (2, 1)]


def test_rrf_tiebreak_and_partitioning_invariance(spark):
    from mrmr_spark.operators.retrieval import rrf_fuse

    # two docs with identical contribution sets -> exact score tie,
    # fused order must fall back to ascending doc id
    tie = spark.createDataFrame(
        [(1, 7, 1), (1, 5, 2), (1, 9, 2)], "q_id long, doc_id long, rank int"
    )
    rows = rrf_fuse([tie]).collect()
    assert [(r.doc_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)] == [
        (7, 1), (5, 2), (9, 3)
    ]
    a, b = _runs(spark)
    base = rrf_fuse([a, b]).sort("q_id", "rank").collect()
    repart = rrf_fuse([a.repartition(7), b.repartition(3)]).sort(
        "q_id", "rank"
    ).collect()
    assert base == repart  # decimal sums: bit-identical at any layout


def test_rrf_validation(spark):
    from mrmr_spark.operators.retrieval import rrf_fuse

    a, _ = _runs(spark)
    with pytest.raises(ValueError, match="at least one run"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k must be > 0"):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError, match="weights length"):
        rrf_fuse([a], weights=[1.0, 2.0])
    with pytest.raises(ValueError, match="topk must be"):
        rrf_fuse([a], topk=0)


def test_rrf_hybrid_composition(spark, frames):
    """End-to-end hybrid shape: fuse a real BM25 run with a synthetic
    dense run; a doc ranked mid-list by both must beat docs only one
    side retrieved (the reason hybrid retrieval works)."""
    from mrmr_spark.operators.retrieval import bm25_topk, rrf_fuse

    d, q = frames
    sparse = bm25_topk(d, q, k=3).select("q_id", "doc_id", "rank")
    dense = spark.createDataFrame(
        [(100, 2, 1), (100, 4, 2), (101, 4, 1), (101, 1, 2)],
        "q_id long, doc_id long, rank int",
    )
    fused = rrf_fuse([sparse, dense], topk=3)
    rows = {(r.q_id, r.rank): r.doc_id for r in fused.collect()}
    # q=101: doc 1 is in both runs (bm25 rank 1 + dense rank 2);
    # doc 4 only dense, doc 3 only sparse -> doc 1 must fuse first
    assert rows[(101, 1)] == 1
