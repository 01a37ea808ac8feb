"""Group/time-aware permutation importance (SURVEY.md §2.G G8).

Reference semantics (/root/reference/sift/importance.py:20-149): per
(feature, repeat), permute that feature with the group/time-aware strategy,
re-score the fitted model, importance = baseline − permuted score.

Spark shape: ALL (feature × repeat) permuted copies are produced in ONE
group-partitioned Arrow pass (``permute_columns_arrow`` — one exchange
total), and every score is an aggregate of one further scan: the model's
prediction is a closed-form codegen expression, so the full importance
table costs 2 scans + 1 exchange regardless of p and n_repeats (vs the
old p × n_repeats window+self-join chains). r2 scoring uses raw weighted
moments (Σw, Σwy, Σwy²) from the same scan — no second pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.permute import permute_columns_arrow, resolve_method
from mrmr_spark.select.linear import RidgeModel, score_expr

#: cap on permuted columns materialized per Arrow pass (width guard: keeps
#: per-task Arrow memory and the aggregate expression count bounded)
MAX_FUSED_COLS = 512


def _chunks(seq, size):
    for i in range(0, len(seq), size):
        yield seq[i : i + size]


def permutation_importance(
    df: DataFrame,
    model: RidgeModel,
    target_col: str,
    weight_col: str | None = None,
    group: str | None = None,
    order: list[str] | None = None,
    key_cols: list[str] | None = None,
    scoring: str = "neg_mse",
    n_repeats: int = 5,
    permute_method: str = "auto",
    block_size: int | str = "auto",
    seed: int = 0,
) -> pd.DataFrame:
    """Returns DataFrame(feature, importance_mean, importance_std,
    baseline_score), sorted by importance (importance.py:111-125)."""
    method = resolve_method(permute_method, group is not None, bool(order))
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    y = F.col(target_col).cast("double")
    key_cols = key_cols or ([group] + (order or []) if group else None)
    feats = model.feature_cols

    def ss_res(pred):
        return F.sum(w * (y - pred) * (y - pred))

    def score_from_row(row, name: str, sw, ss_tot_mean) -> float:
        if scoring == "r2":
            return float(1.0 - (row[name] / sw) / (ss_tot_mean + 1e-10))
        return float(row[name])

    df = df.persist()
    try:
        # baseline + weighted y moments in one scan
        base_aggs = [
            F.sum(w).alias("_sw"),
            F.sum(w * y).alias("_swy"),
            F.sum(w * y * y).alias("_swyy"),
        ]
        if scoring == "r2":
            base_aggs.append(ss_res(model.predict_expr()).alias("_b"))
        else:
            base_aggs.append(score_expr(y, model.predict_expr(), w, scoring).alias("_b"))
        brow = df.select(*base_aggs).collect()[0]
        sw = float(brow["_sw"])
        ym = brow["_swy"] / sw
        ss_tot_mean = max(brow["_swyy"] / sw - ym * ym, 0.0)
        baseline = score_from_row(brow, "_b", sw, ss_tot_mean)

        # all (feature, repeat) copies in one fused pass; chunk if very wide
        all_specs = [
            (feat, f"_pf_{j}_{rep}", j * 1009 + rep)
            for j, feat in enumerate(feats)
            for rep in range(n_repeats)
        ]
        drops: dict[str, list[float]] = {feat: [] for feat in feats}
        for chunk in _chunks(all_specs, MAX_FUSED_COLS):
            work = permute_columns_arrow(
                df, chunk, method, group=group, order=order,
                key_cols=key_cols, seed=seed * 10_007, block_size=block_size,
            )
            aggs = []
            for src, out, _ in chunk:
                pred = model.predict_expr({src: out})
                if scoring == "r2":
                    aggs.append(ss_res(pred).alias(f"s_{out}"))
                else:
                    aggs.append(score_expr(y, pred, w, scoring).alias(f"s_{out}"))
            row = work.select(*aggs).collect()[0]
            for src, out, _ in chunk:
                drops[src].append(
                    baseline - score_from_row(row, f"s_{out}", sw, ss_tot_mean)
                )
    finally:
        df.unpersist()

    rows = [
        (feat, float(np.mean(d)), float(np.std(d)), baseline)
        for feat, d in drops.items()
    ]
    return (
        pd.DataFrame(rows, columns=["feature", "importance_mean", "importance_std", "baseline_score"])
        .sort_values("importance_mean", ascending=False)
        .reset_index(drop=True)
    )
