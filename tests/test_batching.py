"""Length-bucketed batch assembly: assignment vs a Python sort oracle,
padding stats arithmetic, ascending mode, NULL lengths, ragged tail."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.curation import batch_by_length, batch_padding_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 101 + 1) for i in range(97)]  # lengths 1..101, ragged tail
    rows[5] = (5, None)  # NULL length -> sorts as 0
    pdf = pd.DataFrame(rows, columns=["doc_id", "n_tokens"])
    return spark.createDataFrame(pdf.astype(object), "doc_id long, n_tokens long").cache(), rows


def _py_batches(rows, B, ascending=False):
    key = lambda r: ((r[1] or 0) if ascending else -(r[1] or 0), r[0])
    order = sorted(rows, key=key)
    return {doc: i // B for i, (doc, _) in enumerate(order)}


@pytest.mark.parametrize("ascending", [False, True])
def test_assignment_matches_python_oracle(docs, ascending):
    df, rows = docs
    pin = []
    out = batch_by_length(df, 8, ascending=ascending, pin=pin)
    got = {r.doc_id: r.batch for r in out.collect()}
    assert got == _py_batches(rows, 8, ascending)
    assert set(out.columns) == {"doc_id", "n_tokens", "batch"}
    for s in pin:
        s.unpersist()


def test_padding_stats(docs):
    df, rows = docs
    pin = []
    out = batch_by_length(df, 8, pin=pin)
    stats = batch_padding_stats(out).toPandas().set_index("batch")
    assign = _py_batches(rows, 8)
    by_batch = {}
    for doc, length in rows:
        by_batch.setdefault(assign[doc], []).append(length or 0)
    for b, lens in by_batch.items():
        r = stats.loc[b]
        assert r["n_rows"] == len(lens)
        assert r["max_len"] == max(lens)
        assert r["sum_len"] == sum(lens)
        assert r["padded_tokens"] == len(lens) * max(lens) - sum(lens)
        vol = len(lens) * max(lens)
        exp_frac = (vol - sum(lens)) / vol if vol > 0 else 0.0
        assert abs(r["pad_frac"] - exp_frac) < 1e-12
    for s in pin:
        s.unpersist()
    # longest-first: the ragged final batch holds the SHORTEST rows
    tail = max(by_batch)
    assert len(by_batch[tail]) == 97 % 8
    assert max(by_batch[tail]) <= min(min(v) for b, v in by_batch.items() if b != tail)


def test_sorted_batches_cut_padding(docs, spark):
    """The point of the operator: length-sorted batches waste less padding
    than hash-ordered batches of the same size."""
    df, _ = docs
    pin = []
    srt = batch_padding_stats(batch_by_length(df, 8, pin=pin))
    rnd = batch_padding_stats(
        df.withColumn(
            "batch", F.pmod(F.xxhash64("doc_id"), F.lit(12)).cast("int")
        )
    )
    s = srt.agg(F.sum("padded_tokens")).collect()[0][0]
    r = rnd.agg(F.sum("padded_tokens")).collect()[0][0]
    assert s < r
    for p in pin:
        p.unpersist()


def test_validation(docs):
    df, _ = docs
    with pytest.raises(ValueError, match="batch_size"):
        batch_by_length(df, 0)


# ---------------------------------------------------------------------------
# grouped_ranks + interleave_sources
# ---------------------------------------------------------------------------

import hashlib

from mrmr_spark.operators.curation import interleave_sources
from mrmr_spark.sources.shards import grouped_ranks


def _md5_60(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def mix(spark):
    rows = [(i, "a" if i % 10 < 7 else ("b" if i % 10 < 9 else "c")) for i in range(200)]
    return (
        spark.createDataFrame(rows, "doc_id long, source string").cache(),
        rows,
    )


def test_grouped_ranks_matches_window(mix, spark):
    df, rows = mix
    pin = []
    got = {
        (r.doc_id): r.rank
        for r in grouped_ranks(df, ["source"], ["doc_id"], rank_col="rank", pin=pin).collect()
    }
    exp = {}
    for src in "abc":
        for i, (doc, _) in enumerate(
            sorted((r for r in rows if r[1] == src), key=lambda r: r[0])
        ):
            exp[doc] = i
    assert got == exp
    for s in pin:
        s.unpersist()


def test_grouped_ranks_skewed_partitioning(mix):
    df, _ = mix
    pin = []
    a = grouped_ranks(df.repartition(1), ["source"], ["doc_id"], rank_col="r", pin=pin)
    b = grouped_ranks(df.repartition(13), ["source"], ["doc_id"], rank_col="r", pin=pin)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    for s in pin:
        s.unpersist()


def _py_interleave(rows, weights, seed=0):
    ranks = {}
    for src in {r[1] for r in rows}:
        grp = sorted(
            (r for r in rows if r[1] == src),
            key=lambda r: (_md5_60(str(r[0]), seed), r[0]),
        )
        for i, (doc, _) in enumerate(grp):
            ranks[doc] = i
    keyed = sorted(
        rows, key=lambda r: ((ranks[r[0]] + 1) / weights.get(r[1], 1.0), r[1], r[0])
    )
    return {doc: i for i, (doc, _) in enumerate(keyed)}


def test_interleave_matches_python_oracle(mix):
    df, rows = mix
    pin = []
    weights = {"a": 3.0, "b": 1.5}
    out = interleave_sources(df, weights, seed=0, hash_fn="md5_60", pin=pin)
    got = {r.doc_id: r.global_pos for r in out.collect()}
    assert got == _py_interleave(rows, weights)
    for s in pin:
        s.unpersist()


def test_interleave_prefix_rates(mix):
    """WFQ guarantee: every prefix holds each domain at its weight share,
    off by at most one row per domain."""
    df, rows = mix
    pin = []
    weights = {"a": 2.0, "b": 2.0, "c": 1.0}
    out = (
        interleave_sources(df, weights, pin=pin)
        .toPandas()
        .sort_values("global_pos")
        .reset_index(drop=True)
    )
    # while all domains still have rows, domain counts track weight shares
    w = sum(weights.values())
    for L in (5, 10, 25, 50):
        head = out.head(L)["source"].value_counts()
        for d, wd in weights.items():
            assert abs(head.get(d, 0) - L * wd / w) <= 1.0 + wd
    for s in pin:
        s.unpersist()


def test_interleave_round_robin_and_validation(mix):
    df, rows = mix
    pin = []
    out = interleave_sources(df, None, pin=pin).toPandas().sort_values("global_pos")
    # equal weights -> while every domain has rows left, each cycle of 3
    # holds one row of each domain
    head = out.head(30)
    for i in range(0, 30, 3):
        assert set(head.iloc[i : i + 3]["source"]) == {"a", "b", "c"}
    with pytest.raises(ValueError, match="weights must be > 0"):
        interleave_sources(df, {"a": 0.0})
    for s in pin:
        s.unpersist()
