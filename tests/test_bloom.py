"""Bloom-filter membership: no false negatives (structural), false
positives appear on saturated filters and the exact verify removes them,
the probe is a pure projection, and sizing math tracks measurement."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.bloom import (
    bloom_build,
    bloom_filter_against,
    bloom_fpp,
    bloom_probe_expr,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(5, 12)))
        for _ in range(400)
    ]
    pdf = pd.DataFrame({"doc_id": range(400), "text": texts})
    return spark.createDataFrame(pdf).cache()


def test_no_false_negatives(corpus):
    ref = corpus.where(F.col("doc_id") % 4 == 0)
    b = bloom_build(ref, n_bits=256, k_hashes=2)  # tiny on purpose
    flagged = corpus.withColumn("maybe", bloom_probe_expr("text", b))
    missed = (
        flagged.join(ref.select("text").distinct(), "text", "left_semi")
        .where(~F.col("maybe"))
        .count()
    )
    assert missed == 0


def test_false_positives_exist_and_verify_removes_them(corpus):
    """A saturated filter must flag non-members; is_dup must equal plain
    exact membership regardless."""
    ref = corpus.where(F.col("doc_id") % 4 == 0)
    out = bloom_filter_against(
        corpus, ref, n_bits=256, k_hashes=2, verify=True
    ).toPandas()
    ref_texts = set(r["text"] for r in ref.select("text").collect())
    exact = out["text"].isin(ref_texts)
    assert (out["is_dup"] == exact).all()
    # FP evidence: flagged strictly more than true members
    assert out["maybe_dup"].sum() > out["is_dup"].sum()
    # no false negatives: every exact member flagged
    assert (out.loc[exact, "maybe_dup"]).all()


def test_drop_mode_keeps_exact_non_members(corpus):
    ref = corpus.where(F.col("doc_id") % 4 == 0)
    kept = bloom_filter_against(
        corpus, ref, n_bits=256, k_hashes=2, verify=True, mode="drop"
    )
    ref_texts = set(r["text"] for r in ref.select("text").collect())
    kp = kept.toPandas()
    assert not kp["text"].isin(ref_texts).any()
    exp_n = corpus.where(~F.col("text").isin(list(ref_texts))).count()
    assert len(kp) == exp_n
    assert "maybe_dup" not in kp.columns and "is_dup" not in kp.columns


def test_probe_is_pure_projection(corpus):
    b = bloom_build(corpus.limit(50), n_bits=1024, k_hashes=3)
    probed = corpus.withColumn("maybe", bloom_probe_expr("text", b))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_build_partitioning_invariant(corpus):
    ref = corpus.where(F.col("doc_id") % 4 == 0)
    b1 = bloom_build(ref, n_bits=1024, k_hashes=3)
    b2 = bloom_build(ref.repartition(7), n_bits=1024, k_hashes=3)
    assert b1["words"] == b2["words"]


def test_fpp_formula_tracks_measurement(corpus):
    """Measured FP rate within ~3x of the sizing formula (a coarse check —
    the formula is asymptotic)."""
    ref = corpus.where(F.col("doc_id") % 4 == 0)
    n_ref = ref.select("text").distinct().count()
    b = bloom_build(ref, n_bits=1024, k_hashes=3)
    est = bloom_fpp(b, n_ref)
    out = bloom_filter_against(corpus, ref, n_bits=1024, k_hashes=3).toPandas()
    nonmem = out[~out["is_dup"]]
    measured = nonmem["maybe_dup"].mean()
    assert measured <= max(3 * est, 0.05), (measured, est)


def test_null_values(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a", None, "b"]})
    df = spark.createDataFrame(pdf)
    b = bloom_build(df, n_bits=64, k_hashes=2)
    probed = df.withColumn("maybe", bloom_probe_expr("text", b)).toPandas()
    assert probed.set_index("doc_id")["maybe"].to_dict() == {
        0: True,
        1: False,
        2: True,
    }


def test_md5_family_verified_answer_identical(corpus):
    """The two hash families flag different FPs but the VERIFIED answer is
    family-independent."""
    ref = corpus.where(F.col("doc_id") % 4 == 0)
    a = (
        bloom_filter_against(corpus, ref, n_bits=256, k_hashes=2, hash_fn="xxhash64")
        .select("doc_id", "is_dup")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bloom_filter_against(corpus, ref, n_bits=256, k_hashes=2, hash_fn="md5_60")
        .select("doc_id", "is_dup")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_validation(corpus):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(corpus, n_bits=100)
    with pytest.raises(ValueError, match="dedup_against"):
        bloom_build(corpus, n_bits=1 << 30)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(corpus, k_hashes=0)
    with pytest.raises(ValueError, match="mode"):
        bloom_filter_against(corpus, corpus.limit(5), mode="purge")
