import numpy as np
import pandas as pd

from mrmr_spark.operators.asof import asof_join


def _oracle_asof(facts: pd.DataFrame, snaps: pd.DataFrame, strict: bool) -> pd.DataFrame:
    out = []
    snaps = snaps.sort_values(["conv_id", "effective_ts"])
    by_conv = dict(tuple(snaps.groupby("conv_id")))
    for _, r in facts.iterrows():
        g = by_conv.get(r["conv_id"])
        val, seg = None, None
        if g is not None:
            mask = g["effective_ts"] < r["ts"] if strict else g["effective_ts"] <= r["ts"]
            gg = g[mask]
            if len(gg):
                val = gg.iloc[-1]["priority_score"]
                seg = gg.iloc[-1]["segment"]
        out.append((r["conv_id"], r["turn_idx"], val, seg))
    return pd.DataFrame(out, columns=["conv_id", "turn_idx", "priority_score", "segment"])


def test_asof_join_matches_bruteforce(spark, transcripts_pdf, snapshots):
    facts_pdf = transcripts_pdf[transcripts_pdf["conv_id"].isin([f"conv-{i}" for i in range(12)])]
    facts = spark.createDataFrame(facts_pdf)
    snaps_pdf = snapshots.toPandas()

    for strict in (False, True):
        got = (
            asof_join(facts, snapshots, strict=strict)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        exp = _oracle_asof(facts_pdf, snaps_pdf, strict).sort_values(
            ["conv_id", "turn_idx"]
        ).reset_index(drop=True)
        assert len(got) == len(exp)
        ps_g = got["priority_score"].to_numpy(dtype=float)
        ps_e = exp["priority_score"].to_numpy(dtype=float)
        assert np.array_equal(np.isnan(ps_g), np.isnan(ps_e)), f"strict={strict}"
        m = ~np.isnan(ps_e)
        assert np.allclose(ps_g[m], ps_e[m]), f"strict={strict}"
        assert (got["segment"].fillna("∅") == exp["segment"].fillna("∅")).all()


def test_asof_boundary_semantics(spark):
    """Snapshot exactly AT the fact ts: visible unless strict."""
    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c"],
                "turn_idx": [0],
                "ts": [pd.Timestamp("2024-01-02 00:00:00")],
            }
        )
    )
    snaps = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c", "c"],
                "effective_ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
                "priority_score": [1.0, 2.0],
                "segment": ["a", "b"],
            }
        )
    )
    loose = asof_join(facts, snaps, strict=False).collect()[0]
    strict = asof_join(facts, snaps, strict=True).collect()[0]
    assert loose["priority_score"] == 2.0
    assert strict["priority_score"] == 1.0


def test_asof_preserves_fact_count(spark, transcripts, snapshots):
    n = transcripts.count()
    assert asof_join(transcripts, snapshots).count() == n


def test_asof_leakage_probe(spark, transcripts_pdf, snapshots):
    """Truncating snapshots at T leaves all features at ts<=T unchanged."""
    facts = spark.createDataFrame(transcripts_pdf)
    snaps_pdf = snapshots.toPandas()
    cutoff = transcripts_pdf["ts"].quantile(0.5)

    full = (
        asof_join(facts, snapshots)
        .toPandas()
        .query("ts <= @cutoff")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    snaps_trunc = spark.createDataFrame(snaps_pdf[snaps_pdf["effective_ts"] <= cutoff])
    facts_trunc = spark.createDataFrame(transcripts_pdf[transcripts_pdf["ts"] <= cutoff])
    trunc = (
        asof_join(facts_trunc, snaps_trunc)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(full) == len(trunc)
    a = full["priority_score"].to_numpy(dtype=float)
    b = trunc["priority_score"].to_numpy(dtype=float)
    assert np.array_equal(np.isnan(a), np.isnan(b))
    assert np.allclose(a[~np.isnan(a)], b[~np.isnan(b)])
