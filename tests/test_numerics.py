import numpy as np
import pytest

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


def test_ranged_percentile_edges_matches_aggregate(spark):
    """The range-partitioned order-statistics backend (the subsample=None
    scale path — no task or reducer ever holds a full value map) must
    reproduce the JVM percentile aggregate and numpy: ties, skewed
    columns, a constant column, nulls, and a column count above the
    shuffle-partition count."""
    import pandas as pd

    from mrmr_spark.select.binning import (
        exact_percentile_edges,
        ranged_percentile_edges,
    )

    rng = np.random.default_rng(11)
    n = 1003
    pdf = pd.DataFrame(
        {
            "a": rng.normal(size=n),
            "b": rng.integers(0, 7, size=n).astype(np.float64),  # heavy ties
            "c": np.exp(rng.normal(size=n) * 3),                 # skewed
            "d": np.full(n, 4.25),                               # constant
            "e": rng.uniform(-5, 5, size=n),
            "f": rng.standard_cauchy(size=n),
            "g": np.arange(n, dtype=np.float64),
            "h": rng.normal(size=n).round(1),                    # more ties
            "i": -np.arange(n, dtype=np.float64),
            "j": rng.normal(loc=1e9, scale=1e-3, size=n),        # offset
        }
    )
    pdf.loc[pdf.sample(frac=0.03, random_state=5).index, "a"] = None
    cols = list(pdf.columns)
    df = spark.createDataFrame(pdf).repartition(7)

    agg = exact_percentile_edges(df, cols, 10)
    ranged = ranged_percentile_edges(df, cols, 10)
    for c in cols:
        np.testing.assert_allclose(ranged[c], agg[c], rtol=1e-12, atol=1e-14,
                                   err_msg=c)
    finite_a = pdf["a"].dropna().to_numpy()
    np.testing.assert_allclose(
        ranged["a"], np.percentile(finite_a, np.linspace(0, 100, 11)),
        rtol=1e-12, atol=1e-14,
    )


def test_ranged_percentile_edges_tiny_and_empty(spark):
    """n < shuffle partitions, n=1, and an all-null column (NaN ladder)."""
    import pandas as pd

    from mrmr_spark.select.binning import ranged_percentile_edges

    pdf = pd.DataFrame({"x": [3.0, 1.0, 2.0], "z": [None, None, None]})
    df = spark.createDataFrame(pdf.astype({"z": "float64"}))
    got = ranged_percentile_edges(df, ["x", "z"], 4)
    np.testing.assert_allclose(
        got["x"], np.percentile([1.0, 2.0, 3.0], [0, 25, 50, 75, 100])
    )
    assert np.isnan(got["z"]).all()

    one = spark.createDataFrame(pd.DataFrame({"x": [7.5]}))
    np.testing.assert_allclose(
        ranged_percentile_edges(one, ["x"], 10)["x"], np.full(11, 7.5)
    )


def test_ranged_percentiles_scalar_matches_aggregate(spark):
    """The single-quantile form (the auto-k/GBDT time-cut and sampler
    weight-clip path) matches F.percentile."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mrmr_spark.select.binning import ranged_percentiles

    rng = np.random.default_rng(23)
    pdf = pd.DataFrame({"t": rng.uniform(0, 1e9, size=777)})
    df = spark.createDataFrame(pdf).repartition(6)
    for q in (0.2, 0.8, 0.95):
        got = ranged_percentiles(df, ["t"], [q])["t"][0]
        exp = df.select(F.percentile(F.col("t"), F.lit(q)).alias("c")).collect()[0].c
        assert got == pytest.approx(exp, rel=1e-12), q
