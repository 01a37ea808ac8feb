"""GBDT wrapper selection (Spark ML boosted trees standing in for the
reference's optional-dependency CatBoost tier, catboost.py:1050-1864).
Approximate tier: selection quality + search mechanics, not bit-parity."""

import numpy as np
import pandas as pd
import pytest

from mrmr_spark.select import gbdt_classif, select_gbdt
from mrmr_spark.select.gbdt import build_feature_counts


def test_build_feature_counts_geometric():
    assert build_feature_counts(100, min_features=5, step_function=0.67)[0] == 100
    g = build_feature_counts(100, min_features=5, step_function=0.67)
    assert g[-1] == 5 and all(a > b for a, b in zip(g, g[1:]))
    assert build_feature_counts(10, feature_counts=[3, 7, 7, 99]) == [7, 3]
    assert build_feature_counts(4, min_features=5) == [4]


@pytest.fixture(scope="module")
def gbdt_data(spark):
    rng = np.random.default_rng(9)
    n = 1500
    pdf = pd.DataFrame({"grp": np.arange(n) % 20, "t": np.arange(n)})
    for j in range(10):
        pdf[f"x{j}"] = rng.normal(size=n)
    pdf["y"] = (
        2.0 * pdf["x0"] - 1.5 * pdf["x1"] + np.abs(pdf["x2"])
        + 0.3 * rng.normal(size=n)
    )
    pdf["y_cls"] = np.where(pdf["x0"] + pdf["x1"] > 0, "pos", "neg")
    # Spark ML trees reject NaN vectors; the selector must impute (the
    # reference's CatBoost ingests NaN natively, so users WILL pass NaN)
    pdf.loc[pdf.sample(frac=0.05, random_state=1).index, "x5"] = np.nan
    return spark.createDataFrame(pdf).cache()


FEATS = [f"x{j}" for j in range(10)]


def test_gbdt_fixed_k_regression(gbdt_data):
    res = select_gbdt(gbdt_data, FEATS, "y", k=3, task="regression",
                      n_estimators=10, max_depth=3, seed=3)
    assert len(res.names) == 3
    assert {"x0", "x1"}.issubset(set(res.names))


def test_gbdt_k_search_time_holdout(gbdt_data):
    res = select_gbdt(gbdt_data, FEATS, "y", k=None, task="regression",
                      feature_counts=[8, 3], time_col="t",
                      n_estimators=10, max_depth=3, seed=3)
    assert {"x0", "x1"}.issubset(set(res.names))
    # 3 signal features; the noise-padded count must not win by > tolerance
    assert res.extras["chosen_k"] == 3
    assert set(res.extras["k_scores"]) == {8, 3}
    # fit telemetry: one rank fit + one grid fit per count, positive seconds
    stages = [d["stage"] for d in res.extras["fit_seconds"]]
    assert stages.count("rank") == 1
    assert {"grid_8", "grid_3"}.issubset(set(stages))
    assert all(d["seconds"] > 0 for d in res.extras["fit_seconds"])


def test_gbdt_classification_wrapper(gbdt_data):
    names = gbdt_classif(gbdt_data, FEATS, "y_cls", 3,
                         n_estimators=10, max_depth=3, seed=3)
    assert len(names) == 3
    assert {"x0", "x1"}.issubset(set(names))
