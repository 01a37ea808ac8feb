import numpy as np
import pandas as pd
import pytest

from mrmr_spark.select.importance import permutation_importance
from mrmr_spark.select.linear import fit_ridge


@pytest.fixture(scope="module")
def reg_panel(spark):
    rng = np.random.default_rng(21)
    n_g, per = 30, 40
    n = n_g * per
    pdf = pd.DataFrame(
        {
            "grp": np.repeat(np.arange(n_g), per),
            "t": np.tile(np.arange(per), n_g),
            "x0": rng.normal(size=n),
            "x1": rng.normal(size=n),
            "x2": rng.normal(size=n),
            "noise1": rng.normal(size=n),
            "noise2": rng.normal(size=n),
        }
    )
    pdf["y"] = 2.0 * pdf["x0"] + 1.0 * pdf["x1"] + 0.3 * pdf["x2"] + 0.1 * rng.normal(size=n)
    return spark.createDataFrame(pdf).cache(), pdf


FEATS = ["x0", "x1", "x2", "noise1", "noise2"]


def test_ridge_matches_numpy(reg_panel):
    sdf, pdf = reg_panel
    model = fit_ridge(sdf, FEATS, "y", alpha=1.0)
    X = pdf[FEATS].to_numpy()
    y = pdf["y"].to_numpy()
    mu, sd = X.mean(axis=0), X.std(axis=0)
    Z = (X - mu) / sd
    n = len(y)
    G = Z.T @ Z
    g = Z.T @ (y - y.mean())
    beta = np.linalg.solve(G + np.eye(5), g)
    assert np.allclose(model.beta, beta, rtol=1e-8)
    # prediction expression evaluates correctly
    from pyspark.sql import functions as F

    pred = sdf.select(model.predict_expr().alias("p"), "y").toPandas()
    exp = y.mean() + Z @ beta
    got = pred.sort_values("y")["p"].to_numpy()
    assert np.allclose(np.sort(exp), np.sort(got)[np.argsort(np.argsort(np.sort(exp)))], rtol=1e-6) or np.allclose(
        sorted(exp), sorted(got), rtol=1e-6
    )


def test_permutation_importance_ranks_signal(reg_panel):
    sdf, pdf = reg_panel
    model = fit_ridge(sdf, FEATS, "y", alpha=1.0)
    imp = permutation_importance(
        sdf, model, "y", group="grp", order=["t"], n_repeats=3, seed=1,
        permute_method="within_group",
    )
    assert list(imp["feature"][:3]) == ["x0", "x1", "x2"]
    top = imp.set_index("feature")["importance_mean"]
    assert top["x0"] > top["x1"] > top["x2"] > 0
    assert abs(top["noise1"]) < 0.05 and abs(top["noise2"]) < 0.05


def test_permutation_importance_r2_and_methods(reg_panel):
    sdf, _ = reg_panel
    model = fit_ridge(sdf, FEATS[:3], "y", alpha=1.0)
    for method in ("circular_shift", "block", "global"):
        imp = permutation_importance(
            sdf, model, "y", group="grp", order=["t"], n_repeats=2,
            permute_method=method, scoring="r2", seed=2,
        )
        assert imp.iloc[0]["feature"] == "x0", method
        assert imp.iloc[0]["importance_mean"] > 0
