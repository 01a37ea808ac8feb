"""Categorical target encoding (B8) vs pandas oracles.

loo and target replicate category_encoders' public train-transform
formulas (CE itself is the reference's optional dependency and absent
from this runtime — encoding.py docstring); james_stein is a documented
approximation, asserted structurally (shrinkage between group mean and
prior, monotone in group size).
"""

import numpy as np
import pandas as pd
import pytest

from mrmr_spark.select.encoding import target_encode


@pytest.fixture(scope="module")
def cat_df(spark):
    rng = np.random.default_rng(7)
    cats = ["a"] * 40 + ["b"] * 25 + ["c"] * 3 + ["d"]  # incl. a singleton
    y = rng.normal(size=len(cats))
    y[:40] += 2.0  # category 'a' has a shifted mean
    pdf = pd.DataFrame({"cat": cats, "y": y})
    return spark.createDataFrame(pdf).repartition(4).cache(), pdf


def test_loo_matches_exact_formula(cat_df):
    sdf, pdf = cat_df
    out = target_encode(sdf, ["cat"], "y", method="loo").toPandas()
    out = out.sort_values(["cat", "y"]).reset_index(drop=True)
    prior = pdf["y"].mean()
    g = pdf.groupby("cat")["y"].agg(["sum", "count"])
    exp = pdf.apply(
        lambda r: (g.loc[r["cat"], "sum"] - r["y"]) / (g.loc[r["cat"], "count"] - 1)
        if g.loc[r["cat"], "count"] > 1
        else prior,
        axis=1,
    )
    pdf2 = pdf.assign(exp=exp).sort_values(["cat", "y"]).reset_index(drop=True)
    np.testing.assert_allclose(out["cat_enc"].to_numpy(), pdf2["exp"].to_numpy(),
                               rtol=1e-12)


def test_target_sigmoid_blend_matches_ce_formula(cat_df):
    sdf, pdf = cat_df
    out = target_encode(
        sdf, ["cat"], "y", method="target", smoothing=10.0, min_samples_leaf=20.0
    ).toPandas().sort_values(["cat", "y"]).reset_index(drop=True)
    prior = pdf["y"].mean()
    g = pdf.groupby("cat")["y"].agg(["mean", "count"])
    w = 1.0 / (1.0 + np.exp(-(g["count"] - 20.0) / 10.0))
    blend = prior * (1.0 - w) + g["mean"] * w
    blend[g["count"] <= 1] = prior
    exp = pdf["cat"].map(blend)
    pdf2 = pdf.assign(exp=exp).sort_values(["cat", "y"]).reset_index(drop=True)
    np.testing.assert_allclose(out["cat_enc"].to_numpy(), pdf2["exp"].to_numpy(),
                               rtol=1e-12)
    # big categories sit near their group mean, the singleton at the prior
    enc = out.set_index("cat")["cat_enc"]
    assert abs(enc.loc["d"].mean() - prior) < 1e-9
    assert abs(enc.loc["a"].mean() - g.loc["a", "mean"]) < 0.1


def test_james_stein_shrinks_toward_prior(cat_df):
    sdf, pdf = cat_df
    out = target_encode(sdf, ["cat"], "y", method="james_stein").toPandas()
    prior = pdf["y"].mean()
    g = pdf.groupby("cat")["y"].mean()
    enc = out.groupby("cat")["cat_enc"].first()
    for c in ("a", "b", "c"):
        lo, hi = sorted([prior, g[c]])
        assert lo - 1e-9 <= enc[c] <= hi + 1e-9, c
    # more data -> less shrinkage (relative pull toward the group mean)
    pull = {c: abs(enc[c] - prior) / max(abs(g[c] - prior), 1e-12) for c in ("a", "c")}
    assert pull["a"] >= pull["c"] - 1e-9


def test_encoding_plan_broadcasts(cat_df):
    """The fact table must not shuffle: the category stats join is a
    broadcast join (usable at 10^12 rows)."""
    sdf, _ = cat_df
    out = target_encode(sdf, ["cat"], "y", method="target")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_unknown_method_raises(cat_df):
    sdf, _ = cat_df
    with pytest.raises(ValueError, match="Unknown encoding method"):
        target_encode(sdf, ["cat"], "y", method="nope")
