import numpy as np
import pandas as pd
import pytest

from mrmr_spark.select.boruta import (
    auto_n_estimators,
    boruta_select,
    poisson_binom_pmf,
    tail_pvals,
)


def test_poisson_binom_pmf_matches_binomial():
    pmf = poisson_binom_pmf(np.full(10, 0.3))
    from math import comb

    exp = np.array([comb(10, k) * 0.3**k * 0.7 ** (10 - k) for k in range(11)])
    assert np.allclose(pmf, exp, atol=1e-12)
    assert abs(pmf.sum() - 1.0) < 1e-12


def test_tail_pvals():
    pmf = poisson_binom_pmf(np.full(5, 0.5))
    p_hi, p_lo = tail_pvals(pmf, 5)
    assert abs(p_hi - 0.5**5) < 1e-12
    assert abs(p_lo - 1.0) < 1e-12
    p_hi0, p_lo0 = tail_pvals(pmf, 0)
    assert p_hi0 == 1.0
    assert abs(p_lo0 - 0.5**5) < 1e-12


def test_auto_n_estimators():
    assert auto_n_estimators(2, 5) == 50       # clamped at min
    assert auto_n_estimators(5000, 1) == 500   # clamped at max
    assert auto_n_estimators(50, 5) == int(50 * np.sqrt(100) / 5)


@pytest.fixture(scope="module")
def boruta_data(spark):
    rng = np.random.default_rng(31)
    n_g, per = 25, 30
    n = n_g * per
    pdf = pd.DataFrame(
        {"grp": np.repeat(np.arange(n_g), per), "t": np.tile(np.arange(per), n_g)}
    )
    for j in range(8):
        pdf[f"x{j}"] = rng.normal(size=n)
    pdf["y"] = 3 * pdf["x0"] + 2 * pdf["x1"] + 0.3 * rng.normal(size=n)
    return spark.createDataFrame(pdf).cache()


def test_boruta_accepts_signal_rejects_noise(boruta_data):
    feats = [f"x{j}" for j in range(8)]
    res = boruta_select(
        boruta_data, feats, "y", max_iter=8, n_estimators=25, seed=1,
        group_col="grp", time_col="t",
    )
    assert "x0" in res.selected and "x1" in res.selected
    # pure-noise features must not be accepted
    for j in range(2, 8):
        assert res.status[f"x{j}"] != "accepted" or res.mean_importance[f"x{j}"] < 0.05
    assert res.extras["shadow_method"] == "circular_shift"
    assert res.n_iter <= 8
    # iteration cost telemetry: one entry per RF fit, positive seconds
    tel = res.extras["iteration_seconds"]
    assert len(tel) == res.n_iter
    assert all(d["fit_s"] > 0 and d["n_model_cols"] >= d["n_live"] for d in tel)
    assert res.extras["total_fit_s"] >= max(d["fit_s"] for d in tel)


def test_boruta_max_features(boruta_data):
    feats = [f"x{j}" for j in range(8)]
    res = boruta_select(
        boruta_data, feats, "y", max_iter=5, n_estimators=25, seed=2, max_features=1
    )
    assert len(res.selected) == 1 and res.selected[0] in ("x0", "x1")


def test_boruta_reproducible_across_runs(boruta_data):
    """Same seed -> identical statuses/hits across repeated runs (the
    round-1 Python hash(c) shadow-seed salting made this fail; seeds are
    now crc32 of the column name)."""
    feats = [f"x{j}" for j in range(8)]
    kw = dict(max_iter=3, n_estimators=25, seed=5, group_col="grp", time_col="t")
    a = boruta_select(boruta_data, feats, "y", **kw)
    b = boruta_select(boruta_data, feats, "y", **kw)
    assert a.status == b.status
    assert a.hits == b.hits
    assert a.selected == b.selected
