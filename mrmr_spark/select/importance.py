"""Group/time-aware permutation importance (SURVEY.md §2.G G8).

Reference semantics (/root/reference/sift/importance.py:20-149): per
(feature, repeat), permute that feature with the group/time-aware strategy,
re-score the fitted model, importance = baseline − permuted score.

Spark shape: the model's prediction is a single codegen expression
(closed-form ridge or any ``predict_expr`` provider), so one pass per
feature computes ALL repeats at once — each repeat is an independently
seeded permuted column in the same plan, and every (repeat-)score is an
aggregate of the same scan. Total cost: p scans, zero Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.permute import permute_column, resolve_method
from mrmr_spark.select.linear import RidgeModel, score_expr


def _r2_score(df: DataFrame, y, pred, w) -> float:
    row = df.select(
        (F.sum(w * (y - pred) * (y - pred)) / F.sum(w)).alias("ss_res"),
        (F.sum(w * y) / F.sum(w)).alias("ym"),
        F.sum(w).alias("sw"),
    ).collect()[0]
    ss_tot = df.select(
        (F.sum(w * (y - F.lit(row.ym)) * (y - F.lit(row.ym))) / F.sum(w)).alias("v")
    ).collect()[0].v
    return float(1 - row.ss_res / (ss_tot + 1e-10))


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

    df = df.persist()
    try:
        baseline = _agg_score(df, y, model.predict_expr(), w, scoring)

        rows = []
        for j, feat in enumerate(model.feature_cols):
            # one plan: n_repeats independently-seeded permutations of feat
            work = df
            score_aggs = []
            for rep in range(n_repeats):
                s = seed * 10_007 + j * 101 + rep
                work = permute_column(
                    work, feat, method, group=group, order=order,
                    key_cols=key_cols, seed=s, block_size=block_size,
                    out=f"_pf_{rep}",
                )
                pred = model.predict_expr({feat: f"_pf_{rep}"})
                if scoring == "r2":
                    score_aggs.append(None)  # handled below (needs two-pass)
                else:
                    score_aggs.append(score_expr(y, pred, w, scoring).alias(f"s{rep}"))
            if scoring == "r2":
                drops = []
                for rep in range(n_repeats):
                    pred = model.predict_expr({feat: f"_pf_{rep}"})
                    drops.append(baseline - _r2_score(work, y, pred, w))
            else:
                row = work.select(*score_aggs).collect()[0]
                drops = [baseline - float(row[f"s{rep}"]) for rep in range(n_repeats)]
            rows.append((feat, float(np.mean(drops)), float(np.std(drops)), baseline))
    finally:
        df.unpersist()

    return (
        pd.DataFrame(rows, columns=["feature", "importance_mean", "importance_std", "baseline_score"])
        .sort_values("importance_mean", ascending=False)
        .reset_index(drop=True)
    )


def _agg_score(df, y, pred, w, scoring: str) -> float:
    if scoring == "r2":
        return _r2_score(df, y, pred, w)
    return float(df.select(score_expr(y, pred, w, scoring).alias("s")).collect()[0].s)
