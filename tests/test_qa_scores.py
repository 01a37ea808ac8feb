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
