"""Learned quality classifier + deterministic Pareto admission
(mrmr_spark.operators.quality_model). The classifier is pytest-only
(LBFGS isn't SQL — same tier as Boruta/GBDT); the Pareto admission rule
is fully oracled in the gate (`pareto_sample` row) and python-oracled
here."""

import math
import random

import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.quality_model import (
    pareto_quality_sample,
    pareto_uniform,
    train_quality_classifier,
)

KNUTH_MULT = 2654435761
SPACE = 2**32


@pytest.fixture(scope="module")
def corpora(spark):
    """Separable corpora: positives use a disjoint 'good' vocabulary."""
    rng = random.Random(13)
    good = [f"fine{i}" for i in range(40)]
    junk = [f"spam{i}" for i in range(40)]
    pos = [(i, " ".join(rng.choice(good) for _ in range(30))) for i in range(120)]
    neg = [(1000 + i, " ".join(rng.choice(junk) for _ in range(30))) for i in range(120)]
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(pos[:100], schema),
        spark.createDataFrame(neg[:100], schema),
        spark.createDataFrame(pos[100:] + neg[100:], schema),  # held out
    )


def test_classifier_separates_heldout(corpora):
    pos, neg, held = corpora
    model = train_quality_classifier(pos, neg, n_features=2**12)
    scored = model.score(held).collect()
    pos_scores = [r["quality_score"] for r in scored if r["doc_id"] < 1000]
    neg_scores = [r["quality_score"] for r in scored if r["doc_id"] >= 1000]
    assert len(pos_scores) == 20 and len(neg_scores) == 20
    assert min(pos_scores) > 0.9 > 0.1 > max(neg_scores)


def test_classifier_score_is_probability_and_deterministic(corpora):
    pos, neg, held = corpora
    model = train_quality_classifier(pos, neg, n_features=2**12, use_idf=False)
    a = {r["doc_id"]: r["quality_score"] for r in model.score(held).collect()}
    b = {r["doc_id"]: r["quality_score"] for r in model.score(held).collect()}
    assert a == b
    assert all(0.0 <= v <= 1.0 for v in a.values())
    # original columns survive, one score column appended
    assert set(model.score(held).columns) == {"doc_id", "text", "quality_score"}


def _py_uniform(i):
    return max(((i * KNUTH_MULT) % SPACE) / SPACE, 0.5 / SPACE)


def test_pareto_uniform_matches_python(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select("doc_id", pareto_uniform(hash_fn="affine").alias("u")).collect()
    }
    for i in range(500):
        assert got[i] == pytest.approx(_py_uniform(i), abs=0, rel=1e-15)
    # xxhash64 family: still in (0, 1], deterministic
    ux = df.select("doc_id", pareto_uniform().alias("u")).collect()
    assert all(0.0 < r["u"] <= 1.0 for r in ux)


def test_pareto_sample_matches_python_oracle(spark):
    rows = [(i, (i % 97) / 96.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double")
    flagged = pareto_quality_sample(df, hash_fn="affine", mode="flag", alpha=9.0)
    got = {r["doc_id"]: (r["pareto_x"], r["kept"]) for r in flagged.collect()}
    n_kept = 0
    for i, s in rows:
        x = (1.0 - _py_uniform(i)) ** (-1.0 / 9.0) - 1.0
        assert got[i][0] == pytest.approx(x, rel=1e-12)
        assert got[i][1] == (s > 1.0 - x)
        n_kept += got[i][1]
    # drop mode = the flagged subset
    dropped = pareto_quality_sample(df, hash_fn="affine", alpha=9.0)
    assert dropped.count() == n_kept
    assert 0 < n_kept < len(rows), "fixture must split"
    # score >= 1 is always admitted (x >= 0)
    top = spark.createDataFrame([(i, 1.0) for i in range(100)], "doc_id long, quality_score double")
    assert pareto_quality_sample(top, hash_fn="affine").count() == 100


def test_pareto_sample_validation_and_plan(spark):
    df = spark.createDataFrame([(1, 0.5)], "doc_id long, quality_score double")
    with pytest.raises(ValueError, match="mode"):
        pareto_quality_sample(df, mode="nope")
    with pytest.raises(ValueError, match="alpha"):
        pareto_quality_sample(df, alpha=0.0)
    plan = pareto_quality_sample(df)._jdf.queryExecution().toString()
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Exchange" not in phys and "BatchEvalPython" not in phys


def test_pareto_sample_runs_on_streams(spark, tmp_path):
    import pandas as pd

    df = spark.createDataFrame(
        [(i, (i % 11) / 10.0) for i in range(200)], "doc_id long, quality_score double"
    )
    d = str(tmp_path / "pareto_in")
    df.coalesce(1).write.parquet(d)
    q = (
        pareto_quality_sample(spark.readStream.schema(df.schema).parquet(d), mode="flag")
        .writeStream.format("memory")
        .queryName("paretostream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("paretostream").toPandas().sort_values("doc_id").reset_index(drop=True)
    batch = pareto_quality_sample(df, mode="flag").toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, batch)
