"""Automatic k selection (SURVEY.md F7/auto-k; reference:
/root/reference/sift/selection/auto_k.py).

Two modes, as in the reference:

- **elbow**: on the CEFS+ objective path (2·I(y;S)) — driver-side rule in
  ``loops.select_k_elbow``.
- **evaluate**: score each k-prefix of the selection path on held-out data
  (time holdout = train on past / validate on future; group CV = leave
  whole groups out). The reference fits sklearn Ridge per (split, k); here
  EVERY strategy runs as shared scans over the fold-tagged frame: ONE
  fold-keyed fused stats scan (an indicator-augmented Gram accumulator
  per fold — any train split's exact imputed/standardized moments AND
  Gram follow by driver-side Chan merges of the other folds' slots,
  ``kernels.fused_foldwise_stats``/``finish_loo_stats``) and ONE
  fold-grouped loss scan scoring every split's models on its own val
  fold. Every (alpha, k)-prefix solve is a driver-side
  ``np.linalg.solve`` on the leading submatrix — closed-form ridge, no
  sklearn, no per-split scans, no persisted split frames (SURVEY.md §7
  Phase 3). Group CV: 2 scans total at any n_splits (was 3 × n_splits);
  time holdout: 2 scans, no persist.

Classification (metric 'logloss'/'error', auto_k.py:142-161): the
reference fits sklearn LogisticRegression(C=1.0, lbfgs) per k-prefix on
the standardized train split. Logistic has no closed form, so here the
fit runs on the driver over a deterministic bounded subsample of train
(numpy accelerated-gradient softmax, L2 as in C=1.0) while
standardization stats AND the validation metric stay distributed. Group
CV shares ONE bounded collect across all splits' fits (per-split budget
~(S−1)/S of ``fit_subsample``; identical to per-split draws when
n ≤ fit_subsample — see ``_logistic_group_cv_scores``).

**Documented deviation from the reference** (auto_k.py:142-161): when a
``weight_col`` is given, both the softmax fit and the distributed
logloss/error aggregates are sample-weighted; the reference fits
LogisticRegression and computes log_loss *unweighted* even when sample
weights exist. Weighted scoring is the consistent choice with the rest
of this engine (the ridge path and every relevance kernel honor
weights); pass ``weight_col=None`` for reference-exact behavior.

Validation scoring plan (both tasks): ALL (k-prefix × hyperparameter)
models are scored in ONE ``mapInArrow`` scan of the val split — the
per-row predictions for every model are a single (n×p)·(p×M) GEMM on
the standardized Arrow batch, reduced to an (M+1)-float64 accumulator
per partition. This replaces the round-2 design (|k_grid|×|alphas|
aggregate expressions of up to max_k terms each in one select), which
hit Spark's codegen width cliff at the default ``max_k=100`` — the same
planning/codegen-width cost class that drove ``GRAM_JVM_MAX_P`` down to
trivial widths in ``kernels.py``.
Expression width is now O(p) regardless of the k grid.

The k grid replicates ``_build_k_grid`` exactly (auto_k.py:35-48);
metric resolution replicates ``_resolve_metric`` (auto_k.py:52-60).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.select import binning, kernels, relevance


@dataclass
class AutoKConfig:
    k_method: str = "evaluate"          # 'evaluate' | 'elbow'
    strategy: str = "time_holdout"      # 'time_holdout' | 'group_cv'
    metric: str = "auto"                # 'rmse' | 'mae' | 'logloss' | 'error'
    max_k: int = 100
    min_k: int = 5
    val_frac: float = 0.2
    n_splits: int = 5
    elbow_min_rel_gain: float = 0.02
    elbow_patience: int = 3
    #: driver-side train budget for the logistic fits (classification only;
    #: the ridge path needs no row collection at all)
    fit_subsample: int = 50_000
    seed: int = 42


def resolve_metric(metric: str, task: str) -> str:
    """Replicates reference _resolve_metric (auto_k.py:52-60)."""
    if metric == "auto":
        return "rmse" if task == "regression" else "logloss"
    if task == "regression" and metric in ("logloss", "error"):
        raise ValueError(f"metric='{metric}' is invalid for task='regression'")
    if task == "classification" and metric in ("rmse", "mae"):
        raise ValueError(f"metric='{metric}' is invalid for task='classification'")
    return metric


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


def _standardized_batch(
    batch, cols: list[str], imput: np.ndarray, mu: np.ndarray, sd: np.ndarray
) -> np.ndarray:
    """(n, p) standardized matrix from an Arrow batch: impute non-finite
    with the train means, center/scale with the train stats (no f32
    quantization — auto-k runs quantize_f32=False end to end)."""
    X = kernels._batch_cols(batch, cols)
    fin = np.isfinite(X)
    Xq = np.where(fin, X, imput[None, :])
    return (Xq - mu[None, :]) / sd[None, :]


def _regression_loss_pass(
    val: DataFrame,
    path: list[str],
    y_col: str,
    weight_col: str | None,
    imput: np.ndarray,
    mu: np.ndarray,
    sd: np.ndarray,
    y_wmean: float,
    B: np.ndarray,
    metric: str,
) -> np.ndarray:
    """Weighted mean squared/absolute error of ALL M ridge models on the
    val split in ONE Arrow scan: predictions for every (k-prefix, alpha)
    model are one (n×p)·(p×M) GEMM per batch (prefix models are zero-padded
    beta columns). Communication: one (M+1)-float64 accumulator per
    partition. Bounded expression width — this is the fix for the round-2
    codegen-cliff finding at max_k=100."""
    M = B.shape[1]
    proj = [F.col(c).cast("double").alias(c) for c in path]
    proj.append(F.col(y_col).cast("double").alias("_y_"))
    if weight_col:
        proj.append(F.col(weight_col).cast("double").alias("_w_"))
    dfp = val.select(*proj)
    imput = np.ascontiguousarray(imput, dtype=np.float64)
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    sd = np.ascontiguousarray(sd, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)

    def term(batch) -> np.ndarray:
        Z = _standardized_batch(batch, path, imput, mu, sd)
        y = np.asarray(
            batch.column(batch.schema.get_field_index("_y_")).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(Z.shape[0])
        )
        # drop rows with a null/NaN val target (their weight too): one bad
        # y row would make R NaN and poison w@L for ALL M models at once.
        # The old aggregate-expression path skipped null y implicitly
        # (Spark sum ignores nulls) and the classification twin masks —
        # this keeps the three paths consistent.
        ok = np.isfinite(y)
        if not ok.all():
            Z, y, w = Z[ok], y[ok], w[ok]
        R = (y - y_wmean)[:, None] - Z @ B
        L = np.abs(R) if metric == "mae" else R * R
        out = np.empty(M + 1, dtype=np.float64)
        out[:M] = w @ L
        out[M] = w.sum()
        return out

    acc = kernels.arrow_reduce(dfp, term, M + 1)
    sw = acc[M]
    if sw <= 0.0:
        return np.full(M, np.inf)
    return acc[:M] / sw


def _ridge_path_scores(
    train: DataFrame,
    val: DataFrame,
    path: list[str],
    target_col: str,
    weight_col: str | None,
    k_grid: list[int],
    metric: str | tuple[str, ...],
) -> dict[int, float] | dict[str, dict[int, float]]:
    """Fit closed-form ridge on ``train`` for every (alpha, k-prefix); pick
    alpha per k by... the reference uses RidgeCV on train then one Ridge —
    here: best alpha by validation score directly (one Gram pass per split,
    the rest is driver algebra). Validation scoring for ALL (k, alpha)
    models at once via ONE Arrow GEMM pass (``_regression_loss_pass``).

    ``metric`` may be a tuple of metrics: the metric-independent stats,
    Gram, and betas are computed once and only the loss pass repeats —
    returns ``{metric: {k: score}}`` then (used by the parity tests)."""
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

    B, keys = _ridge_betas(G, g, k_grid, len(path))

    metrics = (metric,) if isinstance(metric, str) else tuple(metric)
    out: dict[str, dict[int, float]] = {}
    for m in metrics:
        losses = _regression_loss_pass(
            val, path, target_col, weight_col,
            stats["impute_means"], stats["wmeans"], stats["wstds"],
            float(stats["y_wmean"]), B, m,
        )
        out[m] = _min_over_alphas(keys, losses, m)
    return out[metric] if isinstance(metric, str) else out


_RIDGE_ALPHAS = np.logspace(-3, 3, 10)


def _ridge_inputs_from_fused(st: dict) -> dict:
    """Standardized ridge inputs (R, r_y, stds) from a fused imputed-moment
    stats dict (kernels._finish_fused_acc) — the same driver algebra as
    relevance.fused_regression_stats' tail."""
    sw = float(st["sw"])
    C, c_y, y_ss = st["C"], st["c_y"], float(st["c_yy"])
    with np.errstate(invalid="ignore", divide="ignore"):
        x_ss = np.diag(C).copy()
        var = x_ss / sw
        wstds = np.where(var > 1e-12, np.sqrt(var), 1.0)
        y_var = y_ss / sw
        y_wstd = float(np.sqrt(y_var)) if y_var > 1e-12 else 1.0
        denom = np.outer(wstds, wstds) * sw
        R = 0.5 * (C + C.T) / denom
        r_y = c_y / (wstds * y_wstd * sw)
    return {
        "sw": sw, "wmeans": st["col_wmeans"], "wstds": wstds,
        "impute_means": st["impute_means"], "y_wmean": float(st["y_wmean"]),
        "y_wstd": y_wstd, "R": R, "r_y": r_y,
    }


def _ridge_betas(G: np.ndarray, g: np.ndarray, k_grid: list[int], p: int):
    """All (k-prefix × alpha) closed-form ridge solutions as zero-padded
    beta columns; returns (B[p, M], keys[(k, alpha_idx)])."""
    keys: list[tuple[int, int]] = []
    bcols: list[np.ndarray] = []
    for kk in k_grid:
        kk_eff = min(kk, p)
        for ai, a in enumerate(_RIDGE_ALPHAS):
            beta = np.linalg.solve(G[:kk_eff, :kk_eff] + a * np.eye(kk_eff), g[:kk_eff])
            bc = np.zeros(p)
            bc[:kk_eff] = beta
            bcols.append(bc)
            keys.append((kk, ai))
    return np.column_stack(bcols), keys


def _min_over_alphas(
    keys: list[tuple[int, int]], losses: np.ndarray, metric: str
) -> dict[int, float]:
    """Per-k best validation score over the alpha grid (sqrt first for
    rmse; min of sqrt == sqrt of min, so order is immaterial)."""
    scores: dict[int, float] = {}
    for (kk, _ai), v in zip(keys, losses):
        v = float(v) if np.isfinite(v) else np.inf
        if metric == "rmse" and np.isfinite(v):
            v = float(np.sqrt(v))
        scores[kk] = min(scores.get(kk, np.inf), v)
    return scores


def _ridge_holdout_scores(
    tagged: DataFrame,
    path: list[str],
    target_col: str,
    weight_col: str | None,
    k_grid: list[int],
    metric: str,
) -> dict[int, float]:
    """Time-holdout ridge evaluate in TWO scans, no persist: the frame is
    tagged _fold 0 (train) / 1 (val); one fused fold-keyed stats scan
    yields the train split's statistics (finish_loo_stats with val_fold=1
    merges only fold 0), and one loss scan scores all (k, alpha) models on
    the val rows."""
    p = len(path)
    accs = kernels.fused_foldwise_stats(
        tagged, path, target_col, "_fold", 2, weight_col, quantize_f32=False
    )
    _require_finite_y_accs(accs)
    st = kernels.finish_loo_stats(accs, 1, p, quantize_f32=False)
    ri = _ridge_inputs_from_fused(st)
    G = ri["R"] * ri["sw"]
    g = ri["r_y"] * ri["sw"] * ri["y_wstd"]
    if not (np.isfinite(G).all() and np.isfinite(g).all() and ri["sw"] > 0):
        return {kk: float("inf") for kk in k_grid}
    B, keys = _ridge_betas(G, g, k_grid, p)
    losses = _regression_loss_pass(
        tagged.where(F.col("_fold") == 1), path, target_col, weight_col,
        ri["impute_means"], ri["wmeans"], ri["wstds"], ri["y_wmean"], B, metric,
    )
    return _min_over_alphas(keys, losses, metric)


def _grouped_regression_loss_pass(
    df: DataFrame,
    path: list[str],
    y_col: str,
    weight_col: str | None,
    fold_col: str,
    imput: np.ndarray,
    mu: np.ndarray,
    sd: np.ndarray,
    y_wmean: np.ndarray,
    B: np.ndarray,
    metric: str,
) -> np.ndarray:
    """Fold-grouped twin of ``_regression_loss_pass``: ONE Arrow scan of the
    fold-tagged frame scores every split's models on that split's val fold.
    Each row is val data for exactly the split whose index equals its fold,
    standardized with THAT split's train stats (``imput``/``mu``/``sd``/
    ``y_wmean`` are (S, p) / (S,); ``B`` is (S, p, M)). Returns (S, M)
    weighted mean losses (inf where a fold had no weight)."""
    S, p, M = B.shape
    proj = [F.col(c).cast("double").alias(c) for c in path]
    proj.append(F.col(y_col).cast("double").alias("_y_"))
    proj.append(F.col(fold_col).cast("long").alias("_f_"))
    if weight_col:
        proj.append(F.col(weight_col).cast("double").alias("_w_"))
    dfp = df.select(*proj)
    imput = np.ascontiguousarray(imput, dtype=np.float64)
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    sd = np.ascontiguousarray(sd, dtype=np.float64)
    y_wmean = np.ascontiguousarray(y_wmean, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)

    def term(batch) -> np.ndarray:
        X = kernels._batch_cols(batch, path)
        y = np.asarray(
            batch.column(batch.schema.get_field_index("_y_")).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        fold = np.asarray(
            batch.column(batch.schema.get_field_index("_f_")).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(X.shape[0])
        )
        out = np.zeros((S, M + 1), dtype=np.float64)
        ok = np.isfinite(y)
        for f in np.unique(fold):
            if f < 0 or f >= S:
                # null fold (NaN wraps to INT64_MIN) or foreign tag: a
                # negative in [-S,-1] would silently credit another fold's
                # slot — skip, like fused_foldwise_stats' range guard
                continue
            sel = (fold == f) & ok
            if not sel.any():
                continue
            fin = np.isfinite(X[sel])
            Xq = np.where(fin, X[sel], imput[f][None, :])
            Z = (Xq - mu[f][None, :]) / sd[f][None, :]
            R = (y[sel] - y_wmean[f])[:, None] - Z @ B[f]
            L = np.abs(R) if metric == "mae" else R * R
            out[f, :M] += w[sel] @ L
            out[f, M] += w[sel].sum()
        return out.ravel()

    acc = kernels.arrow_reduce(dfp, term, S * (M + 1)).reshape(S, M + 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        losses = np.where(acc[:, M:] > 0.0, acc[:, :M] / acc[:, M:], np.inf)
    return losses


def _algebraic_regression_losses(
    accs: np.ndarray, v: int, p: int, ri: dict, B: np.ndarray
) -> np.ndarray:
    """Squared-error validation losses of all M ridge models on fold ``v``
    WITHOUT a data pass: the weighted squared residual sum is a quadratic
    form in the val fold's imputed second moments (already inside the fused
    fold accumulators) under the train split's impute/center/scale stats —
    Σw·r² = Syy − 2·b'Szy + b'Szz·b with Szz/Szy/Syy shifted from
    fold-mean-centered moments to train-mean-centered ones. Exact up to
    float reassociation vs the row-wise ``_grouped_regression_loss_pass``
    (parity-tested at 1e-9); only valid for squared loss — mae keeps the
    row pass."""
    M = B.shape[1]
    st = kernels.finish_fold_stats(accs, v, p, ri["impute_means"])
    sw_v = float(st["sw"])
    if sw_v <= 0.0:
        return np.full(M, np.inf)
    d = st["col_wmeans"] - ri["wmeans"]
    dy = float(st["y_wmean"]) - ri["y_wmean"]
    Sxx = st["C"] + sw_v * np.outer(d, d)
    Sxy = st["c_y"] + sw_v * d * dy
    Syy = float(st["c_yy"]) + sw_v * dy * dy
    dinv = 1.0 / ri["wstds"]
    Szz = Sxx * np.outer(dinv, dinv)
    Szy = Sxy * dinv
    t1 = B.T @ Szy
    t2 = np.einsum("pm,pq,qm->m", B, Szz, B, optimize=True)
    # clamp: the quadratic form can go an ulp negative where the fit is
    # near-perfect; the row pass is a sum of squares and cannot
    return np.maximum((Syy - 2.0 * t1 + t2) / sw_v, 0.0)


class _InsufficientFolds(Exception):
    """Fewer than 2 hash folds are non-empty: either a single group, or a
    tiny group cardinality whose hashes collided. The caller decides —
    select_k_evaluate retries once with an exact round-robin group→fold
    map (bounded distinct collect + broadcast join) before giving up."""


def _require_finite_y_accs(accs: np.ndarray) -> None:
    """Reference y-validation on the shared-scan regression evaluates,
    read from the fold accumulators' tail (``[-2]`` = per-fold non-finite-y
    count) — no extra scan. Without this a single NaN/null y row NaN-poisons
    the fused Gram, every (k, alpha) score goes inf, and select_k_evaluate
    silently returns max_k — while the per-split path (via
    ``f_regression_scores``) raises. Both paths must raise identically."""
    if float(np.asarray(accs)[:, -2].sum()) > 0:
        raise ValueError("Non-finite values in y are not allowed for regression.")


def _occupied_folds(accs: np.ndarray) -> np.ndarray:
    """Per-fold row presence read from the fused accumulator tail — free,
    replacing the former distinct-count pre-scan (a full scan + exchange
    at scale)."""
    occ = np.array([float(a[-1]) > 0 for a in accs])
    if occ.sum() < 2:
        raise _InsufficientFolds()
    return occ


def _ridge_group_cv_scores(
    folded: DataFrame,
    path: list[str],
    target_col: str,
    weight_col: str | None,
    k_grid: list[int],
    metric: str,
    n_splits: int,
) -> dict[int, float]:
    """Group-CV ridge evaluate in ONE scan for squared-error metrics (TWO
    for mae; was 3 × n_splits sequential scans): one fold-keyed fused stats
    pass (every leave-one-fold-out train split's moments AND Gram by
    driver-side Chan merges of the per-fold accumulators); squared-error
    validation losses then follow algebraically from the SAME per-fold
    accumulators (``_algebraic_regression_losses``) — mae is not a
    quadratic form, so it keeps the fold-grouped row-wise loss pass."""
    p = len(path)
    accs = kernels.fused_foldwise_stats(
        folded, path, target_col, "_fold", n_splits, weight_col, quantize_f32=False
    )
    _require_finite_y_accs(accs)
    occupied = _occupied_folds(accs)
    M = len(k_grid) * len(_RIDGE_ALPHAS)
    B = np.zeros((n_splits, p, M))
    imput = np.zeros((n_splits, p))
    mus = np.zeros((n_splits, p))
    sds = np.ones((n_splits, p))
    ymn = np.zeros(n_splits)
    live = np.zeros(n_splits, dtype=bool)
    ris: list[dict | None] = [None] * n_splits
    keys = None
    for v in range(n_splits):
        if not occupied[v]:
            continue  # no val rows: a split GroupKFold could not produce
        st = kernels.finish_loo_stats(accs, v, p, quantize_f32=False)
        ri = _ridge_inputs_from_fused(st)
        G = ri["R"] * ri["sw"]
        g = ri["r_y"] * ri["sw"] * ri["y_wstd"]
        if not (np.isfinite(G).all() and np.isfinite(g).all() and ri["sw"] > 0):
            continue  # degenerate train split -> inf scores for this fold
        B[v], keys = _ridge_betas(G, g, k_grid, p)
        imput[v], mus[v], sds[v], ymn[v] = (
            ri["impute_means"], ri["wmeans"], ri["wstds"], ri["y_wmean"],
        )
        ris[v] = ri
        live[v] = True
    if keys is None:
        return {kk: float("inf") for kk in k_grid}

    if metric == "mae":
        losses = _grouped_regression_loss_pass(
            folded, path, target_col, weight_col, "_fold", imput, mus, sds,
            ymn, B, metric,
        )
    else:
        losses = np.full((n_splits, M), np.inf)
        for v in range(n_splits):
            if live[v]:
                losses[v] = _algebraic_regression_losses(accs, v, p, ris[v], B[v])
    per_split: list[dict[int, float]] = []
    for v in range(n_splits):
        if not occupied[v]:
            continue  # excluded from the mean, like min(n_splits, n_groups)
        if live[v]:
            per_split.append(_min_over_alphas(keys, losses[v], metric))
        else:
            per_split.append({kk: np.inf for kk in k_grid})
    return {
        kk: float(np.mean([s[kk] for s in per_split])) for kk in k_grid
    }


def _softmax_fit(
    Z: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    w: np.ndarray | None,
    lam: float,
    max_iter: int = 400,
    tol: float = 1e-7,
) -> tuple[np.ndarray, np.ndarray]:
    """L2-regularized multinomial logistic on standardized ``Z`` via
    Nesterov-accelerated gradient (no scipy/sklearn in this container).
    Returns (W[k, C], b[C]). Matches sklearn LogisticRegression(C=1/ (lam·n))
    up to optimizer tolerance; intercept unpenalized, as sklearn."""
    n, k = Z.shape
    ww = np.full(n, 1.0 / n) if w is None else (w / w.sum())
    Y = np.zeros((n, n_classes))
    Y[np.arange(n), y] = 1.0
    Zb = np.concatenate([Z, np.ones((n, 1))], axis=1)
    # Lipschitz bound for softmax CE: 0.5 * lambda_max(Zb' diag(ww) Zb) + lam
    G = (Zb * ww[:, None]).T @ Zb
    L = 0.5 * float(np.linalg.eigvalsh(G)[-1]) + lam
    step = 1.0 / max(L, 1e-12)

    Wb = np.zeros((k + 1, n_classes))
    V = Wb.copy()
    t_prev = 1.0
    for _ in range(max_iter):
        S = Zb @ V
        S -= S.max(axis=1, keepdims=True)
        P = np.exp(S)
        P /= P.sum(axis=1, keepdims=True)
        grad = Zb.T @ ((P - Y) * ww[:, None])
        grad[:k] += lam * V[:k]  # intercept row unpenalized
        W_new = V - step * grad
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t_prev * t_prev))
        V = W_new + ((t_prev - 1.0) / t_new) * (W_new - Wb)
        if np.max(np.abs(W_new - Wb)) < tol:
            Wb = W_new
            break
        Wb, t_prev = W_new, t_new
    return Wb[:k], Wb[k]


def _logistic_path_scores(
    train: DataFrame,
    val: DataFrame,
    path: list[str],
    y_code_col: str,
    n_classes: int,
    weight_col: str | None,
    k_grid: list[int],
    metric: str | tuple[str, ...],
    fit_subsample: int,
    seed: int,
) -> dict[int, float] | dict[str, dict[int, float]]:
    """Classification evaluate: per-k softmax fit on a bounded train
    subsample (driver), logloss/error scored distributed on the FULL val
    split via one Arrow GEMM pass (reference auto_k.py:142-161; weighted
    scoring is a documented deviation — see module docstring).

    ``metric`` may be a tuple: the stats scan, the bounded collect, and
    the softmax fits happen once and only the loss pass repeats — returns
    ``{metric: {k: score}}`` then (used by the parity tests)."""
    from mrmr_spark.select.preprocess import deterministic_subsample

    stats = relevance.f_classif_scores(
        train, path, y_code_col, n_classes, weight_col, quantize_f32=False
    )
    mu, sd, imput = stats["wmeans"], stats["wstds"], stats["impute_means"]

    def std_expr(j):
        c = F.col(path[j]).cast("double")
        fin = ~F.isnull(c) & ~F.isnan(c) & (F.abs(c) != float("inf"))
        x = F.when(fin, c).otherwise(F.lit(float(imput[j])))
        return (x - F.lit(float(mu[j]))) / F.lit(float(sd[j]))

    # bounded driver-side train matrix, standardized JVM-side before collect
    tr = train
    ntr = tr.count()
    if ntr > fit_subsample:
        tr = deterministic_subsample(tr, fit_subsample, seed)
        ntr = fit_subsample
    sel = [std_expr(j).alias(f"z{j}") for j in range(len(path))]
    sel.append(F.col(y_code_col).cast("int").alias("_y"))
    if weight_col:
        sel.append(F.col(weight_col).cast("double").alias("_w"))
    pdf = tr.select(*sel).toPandas()
    Z = pdf[[f"z{j}" for j in range(len(path))]].to_numpy(np.float64)
    y = pdf["_y"].to_numpy(np.int64)
    wv = pdf["_w"].to_numpy(np.float64) if weight_col else None

    metrics = (metric,) if isinstance(metric, str) else tuple(metric)
    if len(np.unique(y)) < 2:
        inf_scores = {kk: float("inf") for kk in k_grid}
        return inf_scores if isinstance(metric, str) else {m: dict(inf_scores) for m in metrics}

    # one softmax fit per k-prefix; pack all models into a single (p, M·C)
    # coefficient matrix so the val split is scored in ONE Arrow GEMM pass
    # (see module docstring — the per-k aggregate-expression select hit the
    # codegen width cliff at max_k=100)
    p = len(path)
    M = len(k_grid)
    C = n_classes
    Ws = np.zeros((p, M * C))
    bs = np.zeros(M * C)
    for mi, kk in enumerate(k_grid):
        kk_eff = min(kk, p)
        # sklearn C=1.0: loss = sum(CE) + 0.5||W||^2  ->  mean-CE lam = 1/n
        Wk, bk = _softmax_fit(Z[:, :kk_eff], y, n_classes, wv, lam=1.0 / max(ntr, 1))
        Ws[:kk_eff, mi * C : (mi + 1) * C] = Wk
        bs[mi * C : (mi + 1) * C] = bk

    out: dict[str, dict[int, float]] = {}
    for m in metrics:
        losses = _classification_loss_pass(
            val, path, y_code_col, weight_col, imput, mu, sd, Ws, bs, C, m
        )
        out[m] = {
            kk: (float(v) if np.isfinite(v) else float("inf"))
            for kk, v in zip(k_grid, losses)
        }
    return out[metric] if isinstance(metric, str) else out


def _softmax_losses(
    Z: np.ndarray, y: np.ndarray, M: int, C: int,
    Ws: np.ndarray, bs: np.ndarray, metric: str,
) -> np.ndarray:
    """(n, M) per-row losses of all M softmax models: class scores are one
    (n×p)·(p×M·C) GEMM reshaped (n, M, C); logloss via row-wise logsumexp,
    error rate via first-argmax (np.argmax, the reference's tie-break)."""
    n = Z.shape[0]
    S = (Z @ Ws + bs[None, :]).reshape(n, M, C)
    if metric == "logloss":
        mx = S.max(axis=2, keepdims=True)
        lse = mx[:, :, 0] + np.log(np.exp(S - mx).sum(axis=2))
        sy = S[np.arange(n)[:, None], np.arange(M)[None, :], y[:, None]]
        return lse - sy
    return (S.argmax(axis=2) != y[:, None]).astype(np.float64)


def _classification_loss_pass(
    val: DataFrame,
    path: list[str],
    y_code_col: str,
    weight_col: str | None,
    imput: np.ndarray,
    mu: np.ndarray,
    sd: np.ndarray,
    Ws: np.ndarray,
    bs: np.ndarray,
    n_classes: int,
    metric: str,
) -> np.ndarray:
    """Weighted mean logloss / error rate of ALL M softmax models on the
    val split in ONE Arrow scan: class scores for every model are one
    (n×p)·(p×M·C) GEMM per batch, reshaped (n, M, C); logloss is a
    row-wise logsumexp, error rate is first-argmax (np.argmax, matching
    the reference's prediction tie-break). Returns the M weighted means."""
    p = len(path)
    C = int(n_classes)
    M = Ws.shape[1] // C
    proj = [F.col(c).cast("double").alias(c) for c in path]
    proj.append(F.col(y_code_col).cast("double").alias("_y_"))
    if weight_col:
        proj.append(F.col(weight_col).cast("double").alias("_w_"))
    dfp = val.select(*proj)
    imput = np.ascontiguousarray(imput, dtype=np.float64)
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    sd = np.ascontiguousarray(sd, dtype=np.float64)
    Ws = np.ascontiguousarray(Ws, dtype=np.float64)
    bs = np.ascontiguousarray(bs, dtype=np.float64)

    def term(batch) -> np.ndarray:
        Z = _standardized_batch(batch, path, imput, mu, sd)
        yraw = np.asarray(
            batch.column(batch.schema.get_field_index("_y_")).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(Z.shape[0])
        )
        ok = np.isfinite(yraw)
        if not ok.all():
            Z, yraw, w = Z[ok], yraw[ok], w[ok]
        y = yraw.astype(np.int64)
        n = Z.shape[0]
        out = np.zeros(M + 1, dtype=np.float64)
        if n:
            L = _softmax_losses(Z, y, M, C, Ws, bs, metric)
            out[:M] = w @ L
            out[M] = w.sum()
        return out

    acc = kernels.arrow_reduce(dfp, term, M + 1)
    sw = acc[M]
    if sw <= 0.0:
        return np.full(M, np.inf)
    return acc[:M] / sw


def _grouped_classification_loss_pass(
    df: DataFrame,
    path: list[str],
    y_code_col: str,
    weight_col: str | None,
    fold_col: str,
    imput: np.ndarray,
    mu: np.ndarray,
    sd: np.ndarray,
    Ws: np.ndarray,
    bs: np.ndarray,
    n_classes: int,
    metric: str,
) -> np.ndarray:
    """Fold-grouped twin of ``_classification_loss_pass``: ONE Arrow scan
    of the fold-tagged frame scores every split's softmax models on that
    split's val fold, each row standardized with ITS split's train stats
    (``imput``/``mu``/``sd`` are (S, p); ``Ws`` is (S, p, M·C), ``bs``
    (S, M·C)). Returns (S, M) weighted mean losses (inf where a fold had
    no weight)."""
    S, p, MC = Ws.shape
    C = int(n_classes)
    M = MC // C
    proj = [F.col(c).cast("double").alias(c) for c in path]
    proj.append(F.col(y_code_col).cast("double").alias("_y_"))
    proj.append(F.col(fold_col).cast("long").alias("_f_"))
    if weight_col:
        proj.append(F.col(weight_col).cast("double").alias("_w_"))
    dfp = df.select(*proj)
    imput = np.ascontiguousarray(imput, dtype=np.float64)
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    sd = np.ascontiguousarray(sd, dtype=np.float64)
    Ws = np.ascontiguousarray(Ws, dtype=np.float64)
    bs = np.ascontiguousarray(bs, dtype=np.float64)

    def term(batch) -> np.ndarray:
        X = kernels._batch_cols(batch, path)
        yraw = np.asarray(
            batch.column(batch.schema.get_field_index("_y_")).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        fold = np.asarray(
            batch.column(batch.schema.get_field_index("_f_")).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(X.shape[0])
        )
        out = np.zeros((S, M + 1), dtype=np.float64)
        ok = np.isfinite(yraw)
        for f in np.unique(fold):
            if f < 0 or f >= S:
                continue  # null/foreign fold tag — see the regression twin
            sel = (fold == f) & ok
            if not sel.any():
                continue
            fin = np.isfinite(X[sel])
            Xq = np.where(fin, X[sel], imput[f][None, :])
            Z = (Xq - mu[f][None, :]) / sd[f][None, :]
            y = yraw[sel].astype(np.int64)
            L = _softmax_losses(Z, y, M, C, Ws[f], bs[f], metric)
            out[f, :M] += w[sel] @ L
            out[f, M] += w[sel].sum()
        return out.ravel()

    acc = kernels.arrow_reduce(dfp, term, S * (M + 1)).reshape(S, M + 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        losses = np.where(acc[:, M:] > 0.0, acc[:, :M] / acc[:, M:], np.inf)
    return losses


def _logistic_group_cv_scores(
    folded: DataFrame,
    path: list[str],
    y_code_col: str,
    n_classes: int,
    weight_col: str | None,
    k_grid: list[int],
    metric: str,
    fit_subsample: int,
    seed: int,
    n_splits: int,
) -> dict[int, float]:
    """Classification group-CV evaluate with shared scans: ONE fold-keyed
    fused stats scan (per-split standardization statistics via
    leave-one-fold-out Chan merges — the y slot of the regression kernel
    is unused for standardization, so the same accumulator serves), ONE
    bounded driver collect of a fold-tagged raw sample shared by all
    splits' softmax fits, and ONE fold-grouped loss scan. Replaces the
    per-split loop's ~4 jobs × n_splits.

    Documented deviation (in addition to the module-docstring ones): the
    per-split fit sample is the shared ``fit_subsample``-bounded frame
    filtered to that split's train folds, so each fit sees ~(S−1)/S of
    the budget rather than a full independent ``fit_subsample`` draw.
    When n ≤ fit_subsample every split fits on its complete train split —
    identical to the per-split loop."""
    from mrmr_spark.select.preprocess import deterministic_subsample

    p = len(path)
    C = int(n_classes)
    accs = kernels.fused_foldwise_stats(
        folded, path, y_code_col, "_fold", n_splits, weight_col,
        quantize_f32=False,
    )
    occupied = _occupied_folds(accs)
    stats = []
    for v in range(n_splits):
        st = (kernels.finish_loo_stats(accs, v, p, quantize_f32=False)
              if occupied[v] else None)
        stats.append(_ridge_inputs_from_fused(st) if st is not None else None)

    # one bounded raw collect shared by every split's fit (row counts per
    # fold come from the accumulator tail — no count() job)
    n_total = int(sum(float(a[-1]) for a in accs))
    samp = folded
    if n_total > fit_subsample:
        samp = deterministic_subsample(folded, fit_subsample, seed)
    sel = [F.col(c).cast("double").alias(c) for c in path]
    sel.append(F.col(y_code_col).cast("int").alias("_y"))
    sel.append(F.col("_fold").cast("long").alias("_f"))
    if weight_col:
        sel.append(F.col(weight_col).cast("double").alias("_w"))
    pdf = samp.select(*sel).toPandas()
    Xs = pdf[path].to_numpy(np.float64)
    ys = pdf["_y"].to_numpy(np.int64)
    fs = pdf["_f"].to_numpy(np.int64)
    wv = pdf["_w"].to_numpy(np.float64) if weight_col else None

    M = len(k_grid)
    Ws_all = np.zeros((n_splits, p, M * C))
    bs_all = np.zeros((n_splits, M * C))
    imput = np.zeros((n_splits, p))
    mus = np.zeros((n_splits, p))
    sds = np.ones((n_splits, p))
    live = np.zeros(n_splits, dtype=bool)
    for v in range(n_splits):
        ri = stats[v]
        if ri is None or not (ri["sw"] > 0 and np.isfinite(ri["wmeans"]).all()):
            continue
        tr = fs != v
        if len(np.unique(ys[tr])) < 2:
            continue
        fin = np.isfinite(Xs[tr])
        Xq = np.where(fin, Xs[tr], ri["impute_means"][None, :])
        Z = (Xq - ri["wmeans"][None, :]) / ri["wstds"][None, :]
        yv = ys[tr]
        wtr = wv[tr] if wv is not None else None
        m = int(tr.sum())
        for mi, kk in enumerate(k_grid):
            kk_eff = min(kk, p)
            Wk, bk = _softmax_fit(Z[:, :kk_eff], yv, C, wtr, lam=1.0 / max(m, 1))
            Ws_all[v, :kk_eff, mi * C : (mi + 1) * C] = Wk
            bs_all[v, mi * C : (mi + 1) * C] = bk
        imput[v], mus[v], sds[v] = ri["impute_means"], ri["wmeans"], ri["wstds"]
        live[v] = True
    if not live.any():
        return {kk: float("inf") for kk in k_grid}

    losses = _grouped_classification_loss_pass(
        folded, path, y_code_col, weight_col, "_fold", imput, mus, sds,
        Ws_all, bs_all, C, metric,
    )
    per_split = [
        {kk: (float(losses[v, mi]) if live[v] and np.isfinite(losses[v, mi])
              else float("inf"))
         for mi, kk in enumerate(k_grid)}
        for v in range(n_splits)
        if occupied[v]  # empty val folds excluded, like min(n_splits, n_groups)
    ]
    return {kk: float(np.mean([s[kk] for s in per_split])) for kk in k_grid}


def _logistic_holdout_scores(
    tagged: DataFrame,
    path: list[str],
    y_code_col: str,
    n_classes: int,
    weight_col: str | None,
    k_grid: list[int],
    metric: str,
    fit_subsample: int,
    seed: int,
) -> dict[int, float]:
    """Classification time-holdout without persists: the frame is tagged
    _fold 0 (train) / 1 (val). One fused fold-keyed stats scan gives the
    train split's standardization stats AND its row count (no count job),
    one bounded collect draws the softmax fit sample from the train rows
    (identical semantics to the per-split path — the subsample is taken
    from the train side only), and one loss scan scores all k-prefix
    models on the val rows."""
    from mrmr_spark.select.preprocess import deterministic_subsample

    p = len(path)
    C = int(n_classes)
    accs = kernels.fused_foldwise_stats(
        tagged, path, y_code_col, "_fold", 2, weight_col, quantize_f32=False
    )
    ri = _ridge_inputs_from_fused(
        kernels.finish_loo_stats(accs, 1, p, quantize_f32=False)
    )
    if not (ri["sw"] > 0 and np.isfinite(ri["wmeans"]).all()):
        return {kk: float("inf") for kk in k_grid}

    n_train = int(float(accs[0][-1]))
    tr = tagged.where(F.col("_fold") == 0)
    if n_train > fit_subsample:
        tr = deterministic_subsample(tr, fit_subsample, seed)
        n_fit = fit_subsample
    else:
        n_fit = n_train
    sel = [F.col(c).cast("double").alias(c) for c in path]
    sel.append(F.col(y_code_col).cast("int").alias("_y"))
    if weight_col:
        sel.append(F.col(weight_col).cast("double").alias("_w"))
    pdf = tr.select(*sel).toPandas()
    Xs = pdf[path].to_numpy(np.float64)
    ys = pdf["_y"].to_numpy(np.int64)
    wv = pdf["_w"].to_numpy(np.float64) if weight_col else None
    if len(np.unique(ys)) < 2:
        return {kk: float("inf") for kk in k_grid}
    fin = np.isfinite(Xs)
    Xq = np.where(fin, Xs, ri["impute_means"][None, :])
    Z = (Xq - ri["wmeans"][None, :]) / ri["wstds"][None, :]

    M = len(k_grid)
    Ws = np.zeros((p, M * C))
    bs = np.zeros(M * C)
    for mi, kk in enumerate(k_grid):
        kk_eff = min(kk, p)
        Wk, bk = _softmax_fit(Z[:, :kk_eff], ys, C, wv, lam=1.0 / max(n_fit, 1))
        Ws[:kk_eff, mi * C : (mi + 1) * C] = Wk
        bs[mi * C : (mi + 1) * C] = bk

    losses = _classification_loss_pass(
        tagged.where(F.col("_fold") == 1), path, y_code_col, weight_col,
        ri["impute_means"], ri["wmeans"], ri["wstds"], Ws, bs, C, metric,
    )
    return {
        kk: (float(v) if np.isfinite(v) else float("inf"))
        for kk, v in zip(k_grid, losses)
    }


def select_k_evaluate(
    df: DataFrame,
    path: list[str],
    target_col: str,
    config: AutoKConfig,
    weight_col: str | None = None,
    group_col: str | None = None,
    time_col: str | None = None,
    task: str = "regression",
) -> tuple[int, list[str], dict]:
    """Pick best k over the grid by held-out error (lower is better).
    Regression: closed-form ridge (rmse/mae). Classification: driver
    softmax fit + distributed logloss/error (reference auto_k.py:96-204)."""
    max_k = min(config.max_k, len(path))
    min_k = max(1, min(config.min_k, max_k))
    k_grid = build_k_grid(min_k, max_k)
    path = path[:max_k]
    metric = resolve_metric(config.metric, task)
    if not path or not k_grid:
        # nothing to evaluate (empty candidate path, e.g. no feature
        # passed the relevance validity filter)
        return 0, [], {}

    n_classes = 0
    if task == "classification":
        from mrmr_spark.select.preprocess import factorize_target

        df, labels = factorize_target(df, target_col, "_y_code")
        n_classes = len(labels)

    # NOTE: every strategy now routes through the shared-scan paths;
    # _ridge_path_scores / _logistic_path_scores remain as the per-split
    # parity references (exercised by the parity tests).

    if config.strategy == "time_holdout":
        if time_col is None:
            raise ValueError("time_holdout strategy requires time_col")
        # exact percentile cut + filter — same "train on the oldest
        # 1-val_frac, validate on the newest val_frac" semantics as a
        # percent_rank cut, but with NO single-partition global window
        # (that plan pulls the whole table through one task at scale) and
        # NO value-buffering percentile aggregate (its value→count map
        # grows with distinct timestamps — range-partitioned order
        # statistics instead, binning.ranged_percentiles)
        t = F.col(time_col).cast("double")
        cut_arr = binning.ranged_percentiles(
            df.select(t.alias("_t_")), ["_t_"], [1.0 - config.val_frac]
        )["_t_"]
        if np.isnan(cut_arr[0]):
            raise ValueError(f"time_col '{time_col}' has no non-null values")
        cut_val = float(cut_arr[0])
        # shared-scan path: tag train/val as folds 0/1, ONE fused stats
        # scan (fold 0's slot = the train split's exact imputed-moment
        # statistics, via finish_loo_stats(val_fold=1)) + ONE loss scan
        # on the val rows (+ for classification the bounded fit collect) —
        # no persist (was 3-4 jobs over two persisted frames; at 10¹² rows
        # the persists are exactly the materialization the no-persist
        # discipline avoids)
        # null-time rows are dropped (the former where(t<cut)/where(t>=cut)
        # split excluded them from BOTH sides; a null comparison here would
        # otherwise produce a null fold -> garbage index in the Arrow
        # mapper). NaN sorts above every value in Spark, so NaN-time rows
        # land in the val fold — same as the old t >= cut filter.
        tagged = df.where(t.isNotNull()).withColumn(
            "_fold", (t >= F.lit(float(cut_val))).cast("long")
        )
        if task == "regression":
            scores = _ridge_holdout_scores(
                tagged, path, target_col, weight_col, k_grid, metric
            )
        else:
            scores = _logistic_holdout_scores(
                tagged, path, "_y_code", n_classes, weight_col, k_grid,
                metric, config.fit_subsample, config.seed,
            )
    elif config.strategy == "group_cv":
        if group_col is None:
            raise ValueError("group_cv strategy requires group_col")
        # NOTE: no distinct-count pre-scan — at 10¹² rows that is a full
        # scan + exchange spent only on clamping n_splits. Fold occupancy
        # is read for free from the fold-keyed accumulator inside the
        # scorers: empty val folds are excluded from the mean (the splits
        # GroupKFold could not have produced), and < 2 non-empty folds
        # raises the same "at least 2 groups" error.
        n_splits = int(config.n_splits)
        if n_splits < 2:
            raise ValueError(
                f"group_cv requires n_splits >= 2, got {n_splits}"
            )

        def _run_cv(folded_df, n_s):
            if task == "regression":
                # shared-scan path: TWO scans total (fold-keyed fused
                # stats + fold-grouped loss) instead of 3 × n_splits
                # sequential scans — no persist at exactly two reads
                return _ridge_group_cv_scores(
                    folded_df, path, target_col, weight_col, k_grid,
                    metric, n_s,
                )
            # classification shared-scan twin: 2 scans + ONE bounded
            # collect shared by all splits' softmax fits (see
            # _logistic_group_cv_scores for the fit-sample deviation)
            return _logistic_group_cv_scores(
                folded_df, path, "_y_code", n_classes, weight_col, k_grid,
                metric, config.fit_subsample, config.seed, n_s,
            )

        fold = F.pmod(F.xxhash64(F.col(group_col)), F.lit(n_splits))
        try:
            scores = _run_cv(df.withColumn("_fold", fold), n_splits)
        except _InsufficientFolds:
            # tiny group cardinality (or a pathological hash collision):
            # build an exact GroupKFold-style round-robin group→fold map —
            # a bounded distinct collect + broadcast join, paid only on
            # this rare path. Raises for a genuinely single-group input.
            groups = [
                r[0] for r in df.select(group_col).distinct().limit(100_001).collect()
            ]
            if len(groups) < 2:
                raise ValueError(
                    f"group_cv requires at least 2 groups, got {len(groups)}"
                ) from None
            if len(groups) > 100_000:
                # unreachable in practice: >100k distinct groups cannot all
                # hash into one fold — refuse rather than silently folding
                # a truncated subset (the join would drop unmapped rows)
                raise RuntimeError(
                    "group_cv fold fallback engaged with >100k distinct "
                    "groups; hash folding should not have collapsed"
                ) from None
            n_s = min(n_splits, len(groups))
            groups.sort(key=lambda g: (g is None, str(g)))
            # eqNullSafe: a NULL group is a legitimate group value (the
            # hash path folds it via xxhash64's seed); a plain equi-join
            # would silently drop those rows
            mdf = df.sparkSession.createDataFrame(
                [(g, i % n_s) for i, g in enumerate(groups)],
                [group_col, "_fold"],
            ).withColumnRenamed(group_col, "_grp_key")
            remapped = (
                df.join(
                    F.broadcast(mdf),
                    F.col(group_col).eqNullSafe(F.col("_grp_key")),
                    "inner",
                ).drop("_grp_key")
            )
            try:
                scores = _run_cv(remapped, n_s)
            except _InsufficientFolds:
                raise ValueError(
                    "group_cv requires at least 2 groups with rows"
                ) from None
    else:
        raise ValueError(f"Unknown strategy: {config.strategy}")

    finite = {kk: v for kk, v in scores.items() if np.isfinite(v)}
    if not finite:
        return max_k, path[:max_k], scores
    best_k = min(finite.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return best_k, path[:best_k], scores
