"""Hypothesis property tests: FE operators vs independent pandas oracles
on randomized small panels (the SURVEY §5 strategy, extended from fixed
fixtures to generated ones). Deterministic derandomized profile; small
example counts keep the suite inside the wall-clock budget."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mrmr_spark.operators.lags import with_lags
from mrmr_spark.operators.rolling import backfilled_rolling
from mrmr_spark.operators.sessionize import sessionize

SET = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def panel_strategy():
    """(group sizes, value seed, gap seed) — panels of 1-6 groups, 1-12 rows."""
    return st.tuples(
        st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=6),
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=0, max_value=10_000),
    )


def make_panel(sizes, vseed, gseed):
    rng_v = np.random.default_rng(vseed)
    rng_g = np.random.default_rng(gseed)
    rows = []
    for g, size in enumerate(sizes):
        t = 0.0
        for i in range(size):
            # gaps cross the 100s sessionization threshold sometimes
            t += float(rng_g.choice([1.0, 5.0, 50.0, 99.9, 100.1, 500.0]))
            rows.append((f"g{g}", i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t),
                         float(rng_v.normal())))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark timestamps are µs
    return pdf


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@SET
@given(panel_strategy())
def test_rolling_matches_pandas(sp, params):
    pdf = make_panel(*params)
    sdf = sp.createDataFrame(pdf)
    out = (
        backfilled_rolling(sdf, {"avg_value": F.avg("value")}, n=3)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    # oracle: trailing 3-row mean EXCLUDING the current row
    exp = (
        pdf.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["value"]
        .apply(lambda s: s.shift(1).rolling(3, min_periods=1).mean())
        .reset_index(drop=True)
    )
    got = out["avg_value_3"].reset_index(drop=True)
    assert ((got.isna() == exp.isna()).all())
    np.testing.assert_allclose(got.dropna(), exp.dropna(), rtol=1e-12)


@SET
@given(panel_strategy())
def test_sessionize_matches_pandas(sp, params):
    pdf = make_panel(*params)
    sdf = sp.createDataFrame(pdf)
    out = (
        sessionize(sdf, gap_s=100.0)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    exp_sessions = []
    for _, grp in pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        gaps = grp["ts"].diff().dt.total_seconds()
        sid = ((gaps > 100.0) | gaps.isna()).cumsum() - 1
        exp_sessions.extend(sid.tolist())
    assert out["session_id"].tolist() == [int(s) for s in exp_sessions]


@SET
@given(panel_strategy())
def test_lags_match_pandas(sp, params):
    pdf = make_panel(*params)
    sdf = sp.createDataFrame(pdf)
    out = (
        with_lags(sdf, {"value": [1, -1]})
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    g = pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["value"]
    exp_lag = g.shift(1).reset_index(drop=True)
    exp_lead = g.shift(-1).reset_index(drop=True)
    for got, exp in [(out["value_lag1"], exp_lag), (out["value_lead1"], exp_lead)]:
        got = got.reset_index(drop=True)
        assert (got.isna() == exp.isna()).all()
        np.testing.assert_allclose(got.dropna(), exp.dropna(), rtol=0)


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=12),
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=8),
    st.booleans(),
)
def test_asof_join_matches_merge_asof(sp, fact_ts, snap_ts, strict):
    from mrmr_spark.operators.asof import asof_join

    facts = pd.DataFrame({
        "conv_id": "a", "turn_idx": range(len(fact_ts)),
        "ts": pd.to_datetime(sorted(fact_ts), unit="s").astype("datetime64[us]"),
    })
    snaps = pd.DataFrame({
        "conv_id": "a",
        "effective_ts": pd.to_datetime(sorted(set(snap_ts)), unit="s").astype("datetime64[us]"),
    })
    snaps["snap_val"] = np.arange(len(snaps), dtype=np.float64)
    out = (
        asof_join(sp.createDataFrame(facts), sp.createDataFrame(snaps),
                  value_cols=["snap_val"], strict=strict)
        .orderBy("turn_idx").toPandas()
    )
    exp = pd.merge_asof(
        facts.sort_values("ts"), snaps.rename(columns={"effective_ts": "ts"}),
        on="ts", by="conv_id",
        allow_exact_matches=not strict,
    ).sort_values("turn_idx")
    got = out["snap_val"].reset_index(drop=True)
    want = exp["snap_val"].reset_index(drop=True)
    assert (got.isna() == want.isna()).all()
    assert (got.dropna() == want.dropna()).all()
