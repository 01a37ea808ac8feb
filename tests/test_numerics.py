import numpy as np

from mrmr_spark.functions.ndtri import ndtri


def test_ndtri_known_values():
    # reference values (scipy.special.ndtri / standard normal quantiles)
    known = {
        0.5: 0.0,
        0.975: 1.959963984540054,
        0.025: -1.959963984540054,
        0.841344746068543: 1.0,
        0.9986501019683699: 3.0,
        1e-6: -4.753424308822899,
        0.9999999: 5.199337582290661,
    }
    for p, z in known.items():
        assert abs(ndtri(np.array([p]))[0] - z) < 1e-12, p


def test_ndtri_roundtrip():
    """ndtri is the inverse of the normal CDF: Φ(ndtri(p)) == p."""
    from math import erf, sqrt

    p = np.linspace(1e-9, 1 - 1e-9, 10001)
    z = ndtri(p)
    phi = np.array([0.5 * (1 + erf(v / sqrt(2))) for v in z])
    assert np.max(np.abs(phi - p)) < 1e-13


def test_ndtri_edges():
    out = ndtri(np.array([0.0, 1.0, -0.1, 1.1]))
    assert out[0] == -np.inf and out[1] == np.inf
    assert np.isnan(out[2]) and np.isnan(out[3])


def test_arrow_reduce_sums(spark):
    import pyarrow as pa

    from mrmr_spark.select.kernels import arrow_reduce

    df = spark.range(0, 1000, 1, 7).selectExpr("cast(id as double) as x")

    def term(batch: pa.RecordBatch):
        x = batch.column(0).to_numpy(zero_copy_only=False)
        return np.array([x.sum(), (x * x).sum(), len(x)], dtype=np.float64)

    got = arrow_reduce(df, term, 3)
    ids = np.arange(1000, dtype=np.float64)
    assert np.allclose(got, [ids.sum(), (ids * ids).sum(), 1000.0])


def test_exact_percentile_matches_numpy(spark):
    import pandas as pd

    from mrmr_spark.select.binning import exact_percentile_edges

    rng = np.random.default_rng(3)
    x = rng.normal(size=1001).astype(np.float32).astype(np.float64)
    df = spark.createDataFrame(pd.DataFrame({"x": x})).repartition(5)
    edges = exact_percentile_edges(df, ["x"], 10)["x"]
    exp = np.percentile(x, np.linspace(0, 100, 11))
    assert np.allclose(edges, exp, rtol=1e-12, atol=1e-14)
