"""Feature-layer correctness vs a pandas re-computation (the oracle here is
plain pandas groupby logic, independent of the Spark plan)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mrmr_spark.fe.pipeline import FEATURE_COLS, build_features
from mrmr_spark.operators.anchors import first_last_per_group, periodic_anchors
from mrmr_spark.operators.lags import with_lags
from mrmr_spark.operators.rolling import backfilled_rolling
from mrmr_spark.operators.sessionize import sessionize

GAP = 1800.0


def _pdf_sorted(df, keys=("conv_id", "turn_idx")):
    return df.toPandas().sort_values(list(keys)).reset_index(drop=True)


def _epoch_s(ts: pd.Series) -> pd.Series:
    # rebase before any float conversion: epoch-ns int64 exceeds float64's
    # exact-integer range (ulp ~256ns in 2024), rebased values are exact
    ns = ts.astype("datetime64[ns]").astype("int64")
    return (ns - ns.min()) / 1e9


def _pandas_gaps(pdf):
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    s = _epoch_s(pdf["ts"])
    gap = s.groupby(pdf["conv_id"]).diff()
    return pdf, gap


def test_sessionize_matches_pandas(transcripts):
    got = _pdf_sorted(sessionize(transcripts, gap_s=GAP))
    pdf, gap = _pandas_gaps(got[["conv_id", "turn_idx", "ts"]].copy())
    new = gap.isna() | (gap > GAP)
    sess = new.groupby(pdf["conv_id"]).cumsum() - 1
    assert (got["session_id"].to_numpy() == sess.to_numpy()).all()
    g = got["gap_s"].to_numpy()
    assert np.allclose(g[~np.isnan(g)], gap.to_numpy()[~gap.isna()], rtol=1e-9)


def test_lag_lead_matches_pandas(transcripts):
    df = sessionize(transcripts, gap_s=GAP)
    got = _pdf_sorted(with_lags(df, {"gap_s": [1, -1]}))
    grp = got.groupby("conv_id")["gap_s"]
    exp_lag = grp.shift(1).to_numpy()
    exp_lead = grp.shift(-1).to_numpy()
    for exp, col in [(exp_lag, "gap_s_lag1"), (exp_lead, "gap_s_lead1")]:
        g = got[col].to_numpy()
        m = ~np.isnan(exp)
        assert np.array_equal(np.isnan(g), ~m)
        assert np.allclose(g[m], exp[m], rtol=1e-12)


def test_rolling_excludes_current_row(transcripts):
    df = sessionize(transcripts, gap_s=GAP)
    got = _pdf_sorted(
        backfilled_rolling(df, {"avg_gap": F.avg("gap_s"), "cnt": F.count(F.lit(1))}, n=3)
    )
    exp = (
        got.groupby("conv_id")["gap_s"]
        .apply(lambda s: s.shift(1).rolling(3, min_periods=1).mean())
        .reset_index(drop=True)
    )
    g = got["avg_gap_3"].to_numpy()
    e = exp.to_numpy()
    m = ~np.isnan(e)
    assert np.array_equal(np.isnan(g), ~m)
    assert np.allclose(g[m], e[m], rtol=1e-9)
    # count window: min(turn_idx, 3), and 0 rows -> count column is 0? Spark count over empty frame = 0
    cnt = got["cnt_3"].to_numpy().astype(float)
    exp_cnt = np.minimum(got["turn_idx"].to_numpy(), 3)
    assert np.array_equal(cnt, exp_cnt.astype(float))


def test_time_range_rolling(transcripts):
    df = sessionize(transcripts, gap_s=GAP)
    got = _pdf_sorted(backfilled_rolling(df, {"cnt": F.count(F.lit(1))}, range_s=3600.0))
    # pandas oracle: count of prior rows within 3600s
    for _, g in got.groupby("conv_id"):
        t = _epoch_s(g["ts"]).to_numpy()
        exp = np.array([((t < ti) & (t >= ti - 3600.0)).sum() for ti in t], dtype=float)
        assert np.array_equal(g["cnt_3600s"].to_numpy().astype(float), exp)


def test_anchors(transcripts):
    fl = _pdf_sorted(first_last_per_group(transcripts))
    sizes = _pdf_sorted(transcripts).groupby("conv_id").size()
    for conv, g in fl.groupby("conv_id"):
        n = sizes[conv]
        kinds = dict(zip(g["turn_idx"], g["anchor_kind"]))
        assert kinds[0] == "first"
        assert kinds[n - 1] == "last"
    per = _pdf_sorted(periodic_anchors(transcripts, period=10))
    assert (per["turn_idx"] % 10 == 0).all()


def test_build_features_no_python_in_plan(transcripts):
    feats = build_features(transcripts)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, "feature build must not run per-row Python"
    assert set(FEATURE_COLS).issubset(set(feats.columns))


def test_build_features_narrow_exchange(transcripts):
    """Physical-shape guard: the conv_id exchange must carry the projected
    numeric features, never the raw text/role/tool strings
    (shuffle-fewer-bytes contract). Sort count stays at the 3-sort shape —
    the 2-sort sess_turn rewrite measured slower (see pipeline.py note)."""
    import re

    feats = build_features(transcripts)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    n_sorts = len(re.findall(r"\bSort \[", plan))
    assert n_sorts == 3, f"expected 3 sorts, plan has {n_sorts}"
    exchange_child = None
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange hashpartitioning(conv_id" in line:
            exchange_child = lines[i + 1]
    assert exchange_child is not None
    # the exchange must be fed by the Project that REDUCES text/role/tool
    # to doubles (i.e. the computation happens below the shuffle, so only
    # numerics cross it) — not by the raw scan
    assert "AS text_len" in exchange_child and "AS has_tool" in exchange_child, (
        "the feature projection must sit below the conv_id exchange"
    )


def test_temporal_leakage_probe(spark, transcripts_pdf):
    """Features computed on a time-truncated prefix equal full-data features
    on all covered rows (zero temporal leakage)."""
    cutoff = transcripts_pdf["ts"].quantile(0.6)
    full = spark.createDataFrame(transcripts_pdf)
    trunc = spark.createDataFrame(transcripts_pdf[transcripts_pdf["ts"] <= cutoff])

    f_full = _pdf_sorted(build_features(full))
    f_full = f_full[f_full["ts"] <= cutoff].reset_index(drop=True)
    f_trunc = _pdf_sorted(build_features(trunc))

    assert len(f_full) == len(f_trunc)
    for c in FEATURE_COLS:
        a, b = f_full[c].to_numpy(), f_trunc[c].to_numpy()
        both = ~(pd.isna(a) & pd.isna(b))
        assert np.allclose(a[both].astype(float), b[both].astype(float), rtol=1e-12, equal_nan=True), c


def test_build_features_rich_range_windows(transcripts):
    """Rich mode: the 600s-range columns match a pandas brute-force oracle,
    and sharing the materialized µs ordering key keeps the plan at the base
    mode's shape — 3 sorts, 1 exchange (the two range windows reuse one sort)."""
    from mrmr_spark.fe.pipeline import RICH_EXTRA_COLS
    import re

    feats = build_features(transcripts, rich=True)
    assert set(RICH_EXTRA_COLS).issubset(set(feats.columns))
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bSort \[", plan)) == 3
    assert plan.count("Exchange ") == 1

    got = _pdf_sorted(feats)
    src = _pdf_sorted(transcripts)
    for conv, g in got.groupby("conv_id"):
        t = _epoch_s(src[src["conv_id"] == conv]["ts"]).to_numpy()
        tl = src[src["conv_id"] == conv]["text"].str.len().to_numpy(dtype=float)
        n600 = np.array([((t < ti) & (t >= ti - 600.0)).sum() for ti in t], dtype=float)
        s600 = np.array(
            [tl[(t < ti) & (t >= ti - 600.0)].sum() if ((t < ti) & (t >= ti - 600.0)).any() else np.nan for ti in t]
        )
        assert np.array_equal(got.loc[g.index, "n_turns_600s"].to_numpy().astype(float), n600)
        a = got.loc[g.index, "sum_text_len_600s"].to_numpy().astype(float)
        m = ~np.isnan(s600)
        assert np.array_equal(np.isnan(a), ~m)
        assert np.allclose(a[m], s600[m], rtol=1e-12)
