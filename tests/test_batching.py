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
