"""Smart leverage subsampler (reference sift/sampling/smart.py:108-398):
coverage, anchors, share caps, weights, determinism — mirrors the
reference's own test assertions (tests/test_stability_selection.py:189-210)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mrmr_spark.select.sampling import SmartSamplerConfig, smart_sample


@pytest.fixture(scope="module")
def panel_df(spark):
    rng = np.random.default_rng(11)
    n_g, per = 50, 40
    n = n_g * per
    pdf = pd.DataFrame(
        {
            "grp": np.repeat(np.arange(n_g), per),
            "t": np.tile(np.arange(per), n_g),
            "f0": rng.normal(size=n),
            "f1": rng.normal(size=n),
            "f2": rng.normal(size=n),
        }
    )
    pdf["y"] = 1.5 * pdf["f0"] - pdf["f1"] + 0.2 * rng.normal(size=n)
    sdf = spark.createDataFrame(pdf).cache()
    sdf.count()
    return sdf, pdf


FEATS = ["f0", "f1", "f2"]


def test_smart_sample_budget_and_coverage(panel_df):
    sdf, pdf = panel_df
    out = smart_sample(sdf, FEATS, "y", sample_frac=0.2, group_col="grp",
                       time_col="t", random_state=0)
    res = out.toPandas()
    n = len(pdf)
    # budget: roughly 20% (Poisson draws + top-up; generous tolerance)
    assert 0.1 * n < len(res) < 0.35 * n
    # every group covered with >= min_per_group rows
    per_g = res.groupby("grp").size()
    assert len(per_g) == pdf["grp"].nunique()
    assert per_g.min() >= 2
    # weights: positive, finite, mean ~1
    w = res["sample_weight"].to_numpy()
    assert np.isfinite(w).all() and (w > 0).all()
    assert abs(w.mean() - 1.0) < 1e-6


def test_smart_sample_anchors_and_share_cap(panel_df, spark):
    sdf, pdf = panel_df
    first = F.row_number().over(Window.partitionBy("grp").orderBy("t")) == 1
    with_anchor = sdf.withColumn("is_first", first)
    out = smart_sample(
        with_anchor, FEATS, "y", sample_frac=0.2, group_col="grp",
        time_col="t", anchor_col="is_first", random_state=0,
    ).toPandas()
    # every group's first row (t=0) is an anchor and must be included
    firsts = out[out["t"] == 0]
    assert len(firsts) == pdf["grp"].nunique()
    # anchors carry inclusion probability 1 -> weight = 1 / mean-norm factor
    assert firsts["sample_weight"].min() > 0

    # anchor_max_share=0 excludes all anchors but still samples
    # (reference test_anchor_max_share_zero_excludes_all_anchors)
    out0 = smart_sample(
        with_anchor, FEATS, "y", sample_frac=0.2, group_col="grp",
        time_col="t", anchor_col="is_first", anchor_max_share=0.0,
        random_state=0,
    ).toPandas()
    assert len(out0) > 0


def test_smart_sample_deterministic_and_no_group(panel_df):
    sdf, _ = panel_df
    a = smart_sample(sdf, FEATS, "y", sample_frac=0.15, group_col="grp",
                     random_state=3).toPandas().sort_values(["grp", "t"])
    b = smart_sample(sdf, FEATS, "y", sample_frac=0.15, group_col="grp",
                     random_state=3).toPandas().sort_values(["grp", "t"])
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    # no group: hash-shard path
    c = smart_sample(sdf, FEATS, "y", sample_frac=0.15, random_state=3).toPandas()
    assert 0.05 * 2000 < len(c) < 0.3 * 2000
    assert "sample_weight" in c.columns


def test_smart_sample_validation(panel_df):
    sdf, _ = panel_df
    with pytest.raises(ValueError, match="sample_frac"):
        smart_sample(sdf, FEATS, "y", sample_frac=0.0)
    with pytest.raises(ValueError, match="Missing columns"):
        smart_sample(sdf, FEATS + ["nope"], "y")
    # non-finite y rejected when residual weighting is on (smart.py:174-176)
    bad = sdf.withColumn("y", F.when(F.col("t") == 0, float("nan")).otherwise(F.col("y")))
    with pytest.raises(ValueError, match="finite"):
        smart_sample(bad, FEATS, "y", sample_frac=0.2, group_col="grp")
