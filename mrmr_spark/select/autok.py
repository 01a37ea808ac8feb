"""Automatic k selection (SURVEY.md F7/auto-k; reference:
/root/reference/sift/selection/auto_k.py).

Two modes, as in the reference:

- **elbow**: on the CEFS+ objective path (2·I(y;S)) — driver-side rule in
  ``loops.select_k_elbow``.
- **evaluate**: score each k-prefix of the selection path on held-out data
  (time holdout = train on past / validate on future; group CV = leave
  whole groups out). The reference fits sklearn Ridge per (split, k); here
  ONE Gram pass per split yields the sufficient statistics and every
  (alpha, k)-prefix solve is a driver-side ``np.linalg.solve`` on the
  leading submatrix — closed-form ridge, no sklearn, no per-k scans
  (SURVEY.md §7 Phase 3).

The k grid replicates ``_build_k_grid`` exactly (auto_k.py:35-48).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.select import kernels, relevance


@dataclass
class AutoKConfig:
    k_method: str = "evaluate"          # 'evaluate' | 'elbow'
    strategy: str = "time_holdout"      # 'time_holdout' | 'group_cv'
    metric: str = "rmse"                # 'rmse' | 'mae'
    max_k: int = 100
    min_k: int = 5
    val_frac: float = 0.2
    n_splits: int = 5
    elbow_min_rel_gain: float = 0.02
    elbow_patience: int = 3


def build_k_grid(min_k: int, max_k: int) -> list[int]:
    if max_k <= 30:
        grid = list(range(min_k, max_k + 1, 2))
        if grid and grid[-1] != max_k:
            grid.append(max_k)
        return grid
    grid = set(range(min_k, min(30, max_k) + 1, 5))
    grid.update([40, 50, 60, 75, 100, 125, 150])
    grid.add(min_k)
    grid.add(max_k)
    return sorted(k for k in grid if min_k <= k <= max_k)


def _ridge_path_scores(
    train: DataFrame,
    val: DataFrame,
    path: list[str],
    target_col: str,
    weight_col: str | None,
    k_grid: list[int],
    metric: str,
) -> dict[int, float]:
    """Fit closed-form ridge on ``train`` for every (alpha, k-prefix); pick
    alpha per k by... the reference uses RidgeCV on train then one Ridge —
    here: best alpha by validation score directly (one Gram pass per split,
    the rest is driver algebra). Validation scoring for ALL k at once via a
    single select of |k_grid| prediction expressions."""
    stats = relevance.f_regression_scores(train, path, target_col, weight_col, quantize_f32=False)
    gram = kernels.gram_pass(
        train, path, weight_col,
        stats["impute_means"], stats["wmeans"], stats["wstds"],
        y_col=target_col, y_wmean=stats["y_wmean"], y_wstd=stats["y_wstd"],
        quantize_f32=False, clip=None,
    )
    sw = gram["sw"]
    G = gram["R"] * sw
    g = gram["r_y"] * sw * stats["y_wstd"]

    alphas = np.logspace(-3, 3, 10)
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    y = F.col(target_col).cast("double")

    # validation prediction expression for a beta vector on prefix k
    def pred_expr(beta, kk):
        pred = F.lit(float(stats["y_wmean"]))
        for j in range(kk):
            c = F.col(path[j]).cast("double")
            fin = ~F.isnull(c) & ~F.isnan(c) & (F.abs(c) != float("inf"))
            x = F.when(fin, c).otherwise(F.lit(float(stats["impute_means"][j])))
            z = (x - F.lit(float(stats["wmeans"][j]))) / F.lit(float(stats["wstds"][j]))
            pred = pred + F.lit(float(beta[j])) * z
        return pred

    aggs = []
    keys = []
    for kk in k_grid:
        kk_eff = min(kk, len(path))
        for ai, a in enumerate(alphas):
            beta = np.linalg.solve(G[:kk_eff, :kk_eff] + a * np.eye(kk_eff), g[:kk_eff])
            pe = pred_expr(beta, kk_eff)
            if metric == "mae":
                aggs.append((F.sum(w * F.abs(y - pe)) / F.sum(w)).alias(f"s_{kk}_{ai}"))
            else:
                aggs.append((F.sum(w * (y - pe) * (y - pe)) / F.sum(w)).alias(f"s_{kk}_{ai}"))
            keys.append((kk, ai))
    row = val.select(*aggs).collect()[0]
    scores: dict[int, float] = {}
    for (kk, ai), name in zip(keys, [f"s_{kk}_{ai}" for kk, ai in keys]):
        v = row[name]
        v = float(v) if v is not None else np.inf
        if metric == "rmse":
            v = float(np.sqrt(v))
        scores[kk] = min(scores.get(kk, np.inf), v)
    return scores


def select_k_evaluate(
    df: DataFrame,
    path: list[str],
    target_col: str,
    config: AutoKConfig,
    weight_col: str | None = None,
    group_col: str | None = None,
    time_col: str | None = None,
) -> tuple[int, list[str], dict]:
    """Pick best k over the grid by held-out error (lower is better).
    Regression metrics only (the reference's classification eval needs a
    logistic fit — out of the closed-form tier; use elbow there)."""
    max_k = min(config.max_k, len(path))
    min_k = max(1, min(config.min_k, max_k))
    k_grid = build_k_grid(min_k, max_k)
    path = path[:max_k]

    if config.strategy == "time_holdout":
        if time_col is None:
            raise ValueError("time_holdout strategy requires time_col")
        # exact percentile aggregate + filter — same "train on the oldest
        # 1-val_frac, validate on the newest val_frac" semantics as a
        # percent_rank cut, but with NO single-partition global window
        # (that plan pulls the whole table through one task at scale)
        t = F.col(time_col).cast("double")
        cut_val = df.select(
            F.expr(
                f"percentile(cast({time_col} as double), {1.0 - config.val_frac})"
            ).alias("c")
        ).collect()[0].c
        if cut_val is None:
            raise ValueError(f"time_col '{time_col}' has no non-null values")
        train = df.where(t < F.lit(float(cut_val))).persist()
        val = df.where(t >= F.lit(float(cut_val))).persist()
        scores = _ridge_path_scores(train, val, path, target_col, weight_col, k_grid, config.metric)
        train.unpersist()
        val.unpersist()
    elif config.strategy == "group_cv":
        if group_col is None:
            raise ValueError("group_cv strategy requires group_col")
        n_groups = df.select(group_col).distinct().count()
        n_splits = min(config.n_splits, n_groups)
        if n_splits < 2:
            raise ValueError(f"group_cv requires at least 2 groups, got {n_groups}")
        fold = F.pmod(F.xxhash64(F.col(group_col)), F.lit(n_splits))
        folded = df.withColumn("_fold", fold).persist()
        all_scores: dict[int, list[float]] = {kk: [] for kk in k_grid}
        for f_ in range(n_splits):
            train = folded.where(F.col("_fold") != f_)
            val = folded.where(F.col("_fold") == f_)
            s = _ridge_path_scores(train, val, path, target_col, weight_col, k_grid, config.metric)
            for kk, v in s.items():
                all_scores[kk].append(v)
        folded.unpersist()
        scores = {kk: float(np.mean(v)) for kk, v in all_scores.items()}
    else:
        raise ValueError(f"Unknown strategy: {config.strategy}")

    finite = {kk: v for kk, v in scores.items() if np.isfinite(v)}
    if not finite:
        return max_k, path[:max_k], scores
    best_k = min(finite.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return best_k, path[:best_k], scores
