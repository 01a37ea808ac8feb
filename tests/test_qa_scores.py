"""QA eval scoring: SQuAD-style EM/F1 vs a Python oracle, no-answer
convention, NULLs, normalization toggle, pure-projection plan."""

import re

import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.textstats import qa_scores


def _norm(s):
    s = (s or "").lower()
    s = re.sub(r"[^a-z0-9 ]", " ", s)
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return re.sub(r" +", " ", s).strip()


def _py_scores(pred, ref):
    p = _norm(pred).split()
    r = _norm(ref).split()
    if not p and not r:
        return 1, 1.0, 1.0, 1.0
    from collections import Counter

    common = sum((Counter(p) & Counter(r)).values())
    prec = common / len(p) if p else 0.0
    rec = common / len(r) if r else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return int(_norm(pred) == _norm(ref)), prec, rec, f1


CASES = [
    ("The quick brown fox", "quick brown fox!", "em after normalization"),
    ("Paris", "paris.", "punct+case"),
    ("a cat sat", "the cat stood", "partial overlap"),
    ("one two two three", "two two four", "multiset counts"),
    ("", "", "both empty"),
    ("something", "", "ref empty"),
    ("", "an answer", "pred empty"),
    (None, None, "both null"),
    ("word", None, "null ref"),
    ("the a an", "a the", "articles only -> both empty"),
]


def test_qa_scores_match_python_oracle(spark):
    df = spark.createDataFrame(
        [(i, p, r) for i, (p, r, _) in enumerate(CASES)],
        "id long, pred string, ref string",
    )
    out = qa_scores(df).toPandas().set_index("id")
    for i, (p, r, label) in enumerate(CASES):
        em, prec, rec, f1 = _py_scores(p, r)
        row = out.loc[i]
        assert row["exact_match"] == em, label
        assert abs(row["precision"] - prec) < 1e-12, label
        assert abs(row["recall"] - rec) < 1e-12, label
        assert abs(row["f1"] - f1) < 1e-12, label


def test_qa_scores_raw_mode_and_plan(spark):
    df = spark.createDataFrame(
        [(0, "Paris", "paris"), (1, "x y", "x y")], "id long, pred string, ref string"
    )
    out_df = qa_scores(df, normalize=False)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    out = out_df.toPandas().set_index("id")
    assert out.loc[0, "exact_match"] == 0  # case-sensitive without normalization
    assert out.loc[1, "exact_match"] == 1 and out.loc[1, "f1"] == 1.0


# ---------------------------------------------------------------------------
# pass@k
# ---------------------------------------------------------------------------

from math import comb

from mrmr_spark.operators.textstats import pass_at_k


def _py_pass_at_k(n, c, k):
    if c == 0:
        return 0.0
    if n - c < k:
        return 1.0
    return 1.0 - comb(n - c, k) / comb(n, k)


def test_pass_at_k_matches_comb_oracle(spark):
    rows = [(i, n, c) for i, (n, c) in enumerate(
        [(200, 0), (200, 1), (200, 37), (200, 199), (200, 200),
         (10, 3), (100, 50)]
    )]
    df = spark.createDataFrame(rows, "id long, n_samples long, n_correct long")
    out_df = pass_at_k(df, ks=(1, 10))
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    out = out_df.toPandas().set_index("id")
    for i, n, c in rows:
        for k in (1, 10):
            assert abs(out.loc[i, f"pass_at_{k}"] - _py_pass_at_k(n, c, k)) < 1e-12, (n, c, k)
    # single-sample rows are fine at k=1
    one = spark.createDataFrame(
        [(0, 1, 0), (1, 1, 1)], "id long, n_samples long, n_correct long"
    )
    got = pass_at_k(one, ks=(1,)).toPandas().set_index("id")
    assert got.loc[0, "pass_at_1"] == 0.0 and got.loc[1, "pass_at_1"] == 1.0
    # invalid rows raise at execution: k > n, c > n
    bad = spark.createDataFrame([(1, 0)], "n_samples long, n_correct long")
    with pytest.raises(Exception, match="pass_at_k"):
        pass_at_k(bad, ks=(10,)).collect()
    with pytest.raises(Exception, match="pass_at_k"):
        pass_at_k(
            spark.createDataFrame([(5, 7)], "n_samples long, n_correct long"), ks=(1,)
        ).collect()
    with pytest.raises(ValueError, match="k must be"):
        pass_at_k(bad, ks=(0,))
