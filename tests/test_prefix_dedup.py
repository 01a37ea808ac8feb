"""Conversation prefix dedup: flag/drop semantics vs a brute-force Python
prefix oracle, the keep rule (longest wins, exact ties keep min id),
NULL-vs-empty distinctness, verify-path equality, and chain mechanics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.dedup import prefix_chains, prefix_dedup


def _turns(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []

    def conv(cid, seq):
        for i, (r, t) in enumerate(seq):
            rows.append((cid, i, r, t))

    full = [("user", "hi"), ("assistant", "hello"), ("user", "bye"), ("assistant", "later")]
    conv("c-full", full)
    conv("c-retry", full[:2])            # strict prefix -> dropped
    conv("c-retry2", full[:3])           # longer strict prefix -> dropped
    conv("c-dupA", [("user", "same"), ("assistant", "yes")])
    conv("c-dupB", [("user", "same"), ("assistant", "yes")])  # exact dup, larger id
    conv("c-nearmiss", full[:3] + [("assistant", "LATER")])   # last turn differs -> kept
    conv("c-solo", [("user", "only")])
    conv("c-nulltext", [("user", None), ("assistant", "x")])
    conv("c-emptytext", [("user", ""), ("assistant", "x")])   # NULL != '' -> both kept
    conv("c-rolediff", [("system", "hi"), ("assistant", "hello")])  # role differs
    df = spark.createDataFrame(
        _turns(rows), "conv_id string, turn_idx int, role string, text string"
    )
    return df.cache(), rows


def _py_oracle(rows):
    seqs = {}
    for cid, i, r, t in rows:
        seqs.setdefault(cid, []).append((i, r, t))
    seqs = {c: [(r, t) for _, r, t in sorted(v)] for c, v in seqs.items()}
    out = {}
    for a, sa in seqs.items():
        cover = [
            (len(sb), b)
            for b, sb in seqs.items()
            if b != a
            and sb[: len(sa)] == sa
            and (len(sb) > len(sa) or (len(sb) == len(sa) and b < a))
        ]
        out[a] = min(cover, key=lambda x: (-x[0], x[1]))[1] if cover else None
    return out


@pytest.mark.parametrize("verify", [False, True])
def test_flags_match_python_oracle(corpus, verify):
    df, rows = corpus
    got = {
        r.conv_id: (r.keep, r.covered_by)
        for r in prefix_dedup(df, verify=verify).collect()
    }
    exp = _py_oracle(rows)
    assert set(got) == set(exp)
    for c, covered_by in exp.items():
        assert got[c] == (covered_by is None, covered_by), c


def test_drop_mode_returns_kept_turns(corpus):
    df, rows = corpus
    exp = _py_oracle(rows)
    kept = {c for c, v in exp.items() if v is None}
    out = prefix_dedup(df, mode="drop").toPandas()
    assert set(out["conv_id"]) == kept
    assert len(out) == sum(1 for cid, *_ in rows if cid in kept)
    assert list(out.columns) == ["conv_id", "turn_idx", "role", "text"]


def test_keep_rule_chain_keeps_only_longest(spark):
    seq = [("u", f"t{i}") for i in range(5)]
    rows = []
    for cid, n in [("a", 2), ("b", 4), ("c", 5)]:
        rows += [(cid, i, r, t) for i, (r, t) in enumerate(seq[:n])]
    df = spark.createDataFrame(
        _turns(rows), "conv_id string, turn_idx int, role string, text string"
    )
    got = {r.conv_id: (r.keep, r.covered_by) for r in prefix_dedup(df).collect()}
    assert got == {"a": (False, "c"), "b": (False, "c"), "c": (True, None)}


def test_chains_position_salted(spark):
    """Same turn multiset in a different order must NOT chain-collide."""
    rows = [
        ("x", 0, "u", "p"), ("x", 1, "u", "q"),
        ("y", 0, "u", "q"), ("y", 1, "u", "p"),
    ]
    df = spark.createDataFrame(
        _turns(rows), "conv_id string, turn_idx int, role string, text string"
    )
    ch = prefix_chains(df).toPandas().set_index(["conv_id", "pos1"])
    assert (
        ch.loc[("x", 2), "c1"] != ch.loc[("y", 2), "c1"]
        or ch.loc[("x", 2), "c2"] != ch.loc[("y", 2), "c2"]
    )
    out = {r.conv_id: r.keep for r in prefix_dedup(df).collect()}
    assert out == {"x": True, "y": True}


def test_multi_order_cols_and_partition_invariance(corpus, spark):
    df, _ = corpus
    two = df.withColumn("ts", F.col("turn_idx").cast("long"))
    a = prefix_dedup(two.repartition(1), order_cols=("ts", "turn_idx")).toPandas()
    b = prefix_dedup(
        two.repartition(7, "conv_id"), order_cols=("ts", "turn_idx")
    ).toPandas()
    key = ["conv_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_mode_validation(corpus):
    df, _ = corpus
    with pytest.raises(ValueError, match="mode"):
        prefix_dedup(df, mode="purge")
