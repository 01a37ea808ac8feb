"""Closed-form linear models from Gram reductions — no sklearn.

Ridge: β = (ZᵀWZ + λI)⁻¹ ZᵀWy on weighted-standardized features; all
sufficient statistics come from the SAME kernels the selector uses (one
moments pass + one Gram pass), so a fit costs two scans regardless of n.
Used by permutation importance (the scored model) and auto-k evaluate mode
(SURVEY.md §7 Phase 3: 'closed-form ridge via the same Gram blocks').
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrmr_spark.select import kernels, relevance


@dataclass
class RidgeModel:
    feature_cols: list[str]
    beta: np.ndarray          # on standardized scale
    means: np.ndarray
    stds: np.ndarray
    impute_means: np.ndarray
    y_mean: float

    def predict_expr(self, col_override: dict[str, str] | None = None) -> Column:
        """ŷ as a single codegen expression; ``col_override`` substitutes
        source columns (e.g. a permuted copy of one feature)."""
        ov = col_override or {}
        pred = F.lit(float(self.y_mean))
        for j, c in enumerate(self.feature_cols):
            src = F.col(ov.get(c, c)).cast("double")
            fin = ~F.isnull(src) & ~F.isnan(src) & (F.abs(src) != float("inf"))
            x = F.when(fin, src).otherwise(F.lit(float(self.impute_means[j])))
            z = (x - F.lit(float(self.means[j]))) / F.lit(float(self.stds[j]))
            pred = pred + F.lit(float(self.beta[j])) * z
        return pred


def fit_ridge(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    weight_col: str | None = None,
    alpha: float = 1.0,
    quantize_f32: bool = False,
) -> RidgeModel:
    stats = relevance.f_regression_scores(
        df, feature_cols, target_col, weight_col, quantize_f32
    )
    gram = kernels.gram_pass(
        df, feature_cols, weight_col,
        stats["impute_means"], stats["wmeans"], stats["wstds"],
        y_col=target_col, y_wmean=stats["y_wmean"], y_wstd=stats["y_wstd"],
        quantize_f32=quantize_f32, clip=None,
    )
    sw = gram["sw"]
    G = gram["R"] * sw                       # ZᵀWZ
    g = gram["r_y"] * sw * stats["y_wstd"]   # ZᵀW(y - ȳ)
    beta = np.linalg.solve(G + alpha * np.eye(len(feature_cols)), g)
    return RidgeModel(
        feature_cols=list(feature_cols),
        beta=beta,
        means=stats["wmeans"],
        stds=stats["wstds"],
        impute_means=stats["impute_means"],
        y_mean=stats["y_wmean"],
    )


def score_expr(y: Column, y_pred: Column, w: Column, scoring: str) -> Column:
    """Weighted scoring aggregates (importance.py:127-149 semantics)."""
    if scoring == "neg_mse":
        return -(F.sum(w * (y - y_pred) * (y - y_pred)) / F.sum(w))
    if scoring == "neg_rmse":
        return -F.sqrt(F.sum(w * (y - y_pred) * (y - y_pred)) / F.sum(w))
    if scoring == "neg_mae":
        return -(F.sum(w * F.abs(y - y_pred)) / F.sum(w))
    raise ValueError(f"Unknown scoring: {scoring} (r2 handled by caller)")
