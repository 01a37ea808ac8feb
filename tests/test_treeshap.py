"""Driver-side interventional TreeSHAP for Spark ML forests: local accuracy
(efficiency), symmetry-ish sanity, and the Boruta-SHAP backend
(reference sift/boruta.py:237-291, tests/test_boruta.py:316-324)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rf_fixture(spark):
    rng = np.random.default_rng(5)
    n = 400
    pdf = pd.DataFrame({f"x{j}": rng.normal(size=n) for j in range(5)})
    pdf["y"] = 2.0 * pdf["x0"] + 1.0 * pdf["x1"] + 0.1 * rng.normal(size=n)
    sdf = spark.createDataFrame(pdf).cache()
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    vec = VectorAssembler(inputCols=[f"x{j}" for j in range(5)], outputCol="_v").transform(sdf)
    model = RandomForestRegressor(
        featuresCol="_v", labelCol="y", numTrees=20, maxDepth=4, seed=0
    ).fit(vec)
    return sdf, pdf, model, vec


def test_treeshap_local_accuracy(rf_fixture):
    """Efficiency: Σφ_i(x) + base == f(x) exactly (per-leaf Shapley
    efficiency + exact Gauss-Legendre quadrature)."""
    sdf, pdf, model, vec = rf_fixture
    from mrmr_spark.select.treeshap import forest_shap

    X = pdf[[f"x{j}" for j in range(5)]].to_numpy()[:100]
    phi, base = forest_shap(model, X)
    preds = np.array(
        [r.prediction for r in model.transform(vec).select("prediction").limit(100).collect()]
    )
    # background = the same 100 rows, so base = mean prediction structure;
    # local accuracy must hold row-wise
    assert np.allclose(phi.sum(axis=1) + base, preds, rtol=1e-8, atol=1e-10)


def test_treeshap_signal_ordering(rf_fixture):
    sdf, pdf, model, _ = rf_fixture
    from mrmr_spark.select.treeshap import shap_importances

    X = pdf[[f"x{j}" for j in range(5)]].to_numpy()
    imp = shap_importances(model, X)
    assert imp[0] > imp[1] > max(imp[2:])  # x0 strongest, x1 second


def test_parse_debug_tree_roundtrip(rf_fixture):
    from mrmr_spark.select.treeshap import parse_debug_tree

    _, _, model, _ = rf_fixture
    leaves = parse_debug_tree(model.trees[0].toDebugString)
    assert len(leaves) >= 2
    for path, val in leaves:
        assert all(isinstance(f, int) for f, _, _ in path)
        assert np.isfinite(val)


def test_boruta_shap_backend(spark):
    """Boruta with importance='shap' accepts planted signal, rejects noise
    (mirrors reference tests/test_boruta.py:316-324)."""
    from mrmr_spark.select.boruta import boruta_select

    rng = np.random.default_rng(42)
    n, p = 300, 6
    pdf = pd.DataFrame({f"f{i}": rng.normal(size=n) for i in range(p)})
    pdf["y"] = pdf["f0"] + 0.8 * pdf["f1"] + rng.normal(size=n) * 0.3
    sdf = spark.createDataFrame(pdf).cache()
    res = boruta_select(
        sdf, [f"f{i}" for i in range(p)], "y", max_iter=5, n_estimators=25,
        importance="shap", seed=1,
    )
    assert "f0" in res.selected and "f1" in res.selected
    assert not {"f3", "f4", "f5"} & set(res.selected)
