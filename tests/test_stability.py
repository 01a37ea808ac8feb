import numpy as np
import pandas as pd
import pytest

from mrmr_spark.select.stability import (
    _block_indices,
    _stratified_indices,
    lasso_cd,
    logistic_l1_pg,
    stability_selection,
)


def test_lasso_cd_recovers_signal():
    rng = np.random.default_rng(1)
    n, p = 400, 10
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0)
    y = 3 * X[:, 0] + 1.5 * X[:, 1] + 0.05 * rng.normal(size=n)
    beta = lasso_cd(X, y - y.mean(), alpha=0.1)
    assert abs(beta[0]) > 1 and abs(beta[1]) > 0.5
    assert np.all(np.abs(beta[2:]) < 0.1)


def test_logistic_l1_recovers_signal():
    rng = np.random.default_rng(2)
    n, p = 600, 8
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0)
    z = 2 * X[:, 0] - 2 * X[:, 1]
    y = (rng.random(n) < 1 / (1 + np.exp(-z))).astype(float)
    beta = logistic_l1_pg(X, y, alpha=0.01, max_iter=500)
    assert beta[0] > 0.3 and beta[1] < -0.3
    assert np.all(np.abs(beta[2:]) < 0.2)


def test_stratified_indices_proportional():
    rng = np.random.default_rng(3)
    y = np.array([0] * 80 + [1] * 20)
    idx = _stratified_indices(rng, y, 0.5)
    assert len(idx) == 50
    assert (y[idx] == 1).sum() == 10
    assert len(set(idx)) == len(idx)


def test_block_indices_contiguous():
    rng = np.random.default_rng(4)
    starts = np.array([0, 20, 40])
    lens = np.array([20, 20, 20])
    for method in ("moving", "circular", "stationary"):
        in_bag, oob = _block_indices(rng, starts, lens, 5, method)
        assert ((in_bag >= 0) & (in_bag < 60)).all(), method
        # in-bag resamples ~n_g per group WITH replacement; oob = complement
        assert len(in_bag) >= 50, method
        assert set(oob).isdisjoint(set()) or set(oob) <= set(range(60))
        assert set(np.unique(in_bag)).isdisjoint(set(oob)), method
        for s, ln in zip(starts, lens):
            grp = in_bag[(in_bag >= s) & (in_bag < s + ln)]
            assert len(grp) >= 1, method


@pytest.fixture(scope="module")
def stab_data(spark):
    rng = np.random.default_rng(8)
    n_g, per = 40, 25
    n = n_g * per
    pdf = pd.DataFrame(
        {
            "grp": np.repeat(np.arange(n_g), per),
            "t": np.tile(np.arange(per), n_g),
        }
    )
    for j in range(10):
        pdf[f"x{j}"] = rng.normal(size=n)
    pdf["y"] = 2 * pdf["x0"] + 1.2 * pdf["x1"] + 0.2 * rng.normal(size=n)
    pdf["ycls"] = (pdf["x0"] + pdf["x1"] > 0).astype(int)
    return spark.createDataFrame(pdf).cache(), pdf


FEATS = [f"x{j}" for j in range(10)]


def test_stability_regression(stab_data):
    sdf, _ = stab_data
    res = stability_selection(sdf, FEATS, "y", n_bootstrap=30, seed=1)
    assert res.selected[:2] in (["x0", "x1"], ["x1", "x0"]) or set(res.selected[:2]) == {"x0", "x1"}
    fr = res.frequencies.set_index("feature")["frequency"]
    assert fr["x0"] >= 0.9 and fr["x1"] >= 0.9
    assert all(fr[f"x{j}"] <= 0.5 for j in range(2, 10))


def test_stability_block_bootstrap_and_determinism(stab_data):
    sdf, _ = stab_data
    r1 = stability_selection(
        sdf, FEATS, "y", n_bootstrap=20, group_col="grp", time_col="t", seed=2
    )
    assert r1.extras["bootstrap"] == "block"
    assert "x0" in r1.selected and "x1" in r1.selected
    r2 = stability_selection(
        sdf, FEATS, "y", n_bootstrap=20, group_col="grp", time_col="t", seed=2
    )
    assert r1.selected == r2.selected
    assert np.allclose(
        r1.frequencies["frequency"].to_numpy(), r2.frequencies["frequency"].to_numpy()
    )


def test_stability_classification(stab_data):
    sdf, _ = stab_data
    res = stability_selection(
        sdf, FEATS, "ycls", task="classification", n_bootstrap=20,
        alpha="scale", alpha_scale=0.05, seed=3,
    )
    assert res.extras["bootstrap"] == "stratified"
    assert {"x0", "x1"}.issubset(set(res.selected))


def test_stability_max_features(stab_data):
    sdf, _ = stab_data
    res = stability_selection(sdf, FEATS, "y", n_bootstrap=10, max_features=1, seed=4)
    assert len(res.selected) == 1 and res.selected[0] in ("x0", "x1")


def test_block_method_variants_and_alpha_cv(stab_data):
    sdf, _ = stab_data
    for method in ("circular", "stationary"):
        res = stability_selection(
            sdf, FEATS, "y", n_bootstrap=15, group_col="grp", time_col="t",
            block_method=method, seed=5,
        )
        assert res.extras["block_method"] == method
        assert {"x0", "x1"}.issubset(set(res.selected)), method
    # alpha CV picks a data-driven alpha (recorded in extras)
    res = stability_selection(sdf, FEATS, "y", n_bootstrap=10, seed=6)
    assert res.extras["alpha"] > 0


def test_stability_with_smart_sampler(stab_data):
    """use_smart_sampler pre-samples rows and feeds inverse-probability
    weights into every fit (reference stability.py:576-671)."""
    sdf, _ = stab_data
    res = stability_selection(
        sdf, FEATS, "y", n_bootstrap=15, group_col="grp", time_col="t",
        use_smart_sampler=True, smart_sampler_kwargs={"sample_frac": 0.5},
        seed=7,
    )
    assert {"x0", "x1"}.issubset(set(res.selected))
