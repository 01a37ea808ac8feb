import numpy as np
import pandas as pd
import pytest

from mrmr_spark.select import select_mrmr
from mrmr_spark.select.autok import AutoKConfig, build_k_grid
from mrmr_spark.select.loops import select_k_elbow


def test_build_k_grid_matches_reference_shape():
    assert build_k_grid(5, 20) == [5, 7, 9, 11, 13, 15, 17, 19, 20]
    g = build_k_grid(5, 100)
    assert g[0] == 5 and g[-1] == 100
    assert 40 in g and 75 in g and 150 not in g


def test_select_k_elbow():
    # strong gains then a plateau from k=6 on
    obj = np.array([1.0, 1.8, 2.4, 2.8, 3.0, 3.02, 3.03, 3.035, 3.04, 3.041])
    k = select_k_elbow(obj, min_k=2, max_k=10, min_rel_gain=0.02, patience=3)
    assert 5 <= k <= 7


@pytest.fixture(scope="module")
def autok_data(spark):
    rng = np.random.default_rng(77)
    n = 1500
    pdf = pd.DataFrame({"grp": np.arange(n) % 25, "t": np.arange(n)})
    for j in range(12):
        pdf[f"x{j}"] = rng.normal(size=n)
    pdf["y"] = 2 * pdf["x0"] + 1.0 * pdf["x1"] + 0.5 * pdf["x2"] + 0.3 * rng.normal(size=n)
    return spark.createDataFrame(pdf).cache()


FEATS = [f"x{j}" for j in range(12)]


def test_auto_k_time_holdout(autok_data):
    cfg = AutoKConfig(k_method="evaluate", strategy="time_holdout", max_k=10, min_k=1)
    res = select_mrmr(
        autok_data, FEATS, "y", "auto", task="regression",
        auto_k_config=cfg, time_col="t",
    )
    assert 2 <= len(res.names) <= 6  # 3 signal features + maybe a stray
    assert {"x0", "x1"}.issubset(set(res.names))


def test_auto_k_group_cv(autok_data):
    cfg = AutoKConfig(k_method="evaluate", strategy="group_cv", max_k=10, min_k=1, n_splits=3)
    res = select_mrmr(
        autok_data, FEATS, "y", "auto", task="regression",
        auto_k_config=cfg, group_col="grp",
    )
    assert {"x0", "x1"}.issubset(set(res.names))
    assert len(res.names) <= 8


def test_auto_k_gaussian_elbow(autok_data):
    cfg = AutoKConfig(k_method="elbow", max_k=10, min_k=2)
    res = select_mrmr(
        autok_data, FEATS, "y", "auto", task="regression",
        estimator="gaussian", auto_k_config=cfg, subsample=None,
    )
    assert {"x0", "x1"}.issubset(set(res.names[:4]))
    assert len(res.names) <= 10
