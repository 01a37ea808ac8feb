"""Stability selection: bootstrapped L1 model fits, task-parallel
(SURVEY.md §2.G G1-G4; reference: /root/reference/sift/stability.py).

Spark shape (SURVEY.md §3.3): the (subsampled) feature matrix is collected
once (bounded by ``subsample``, the reference's own scale answer — its alpha
CV also caps at 30k rows) and broadcast; ``spark.range(n_bootstrap)`` fans
out ONE task per bootstrap round; each task draws its seeded resample
(i.i.d. / stratified / per-group block bootstrap) and runs a pure-NumPy
coordinate-descent Lasso (regression) or proximal-gradient L1 logistic
(classification); selection masks reduce by groupBy-sum; thresholding on the
driver.

Parity tier: **approximate** (SURVEY.md §7 hard-point 5) — the reference's
own tests assert selection sets/frequencies, not coefficients; exact
sklearn coordinate-descent parity is explicitly out of contract. Matching
semantics kept exactly: sample fraction 0.5 default, frequency threshold,
max_features capped by frequency with stable order (stability.py:503-523),
mean-normalized weights.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrmr_spark.select.preprocess import assert_numeric, deterministic_subsample


# --- executor-side numerics (pure NumPy, vectorized) -------------------------

def lasso_cd(
    X: np.ndarray, y: np.ndarray, alpha: float, max_iter: int = 300, tol: float = 1e-6
) -> np.ndarray:
    """Coordinate-descent Lasso on standardized columns; returns beta on the
    standardized scale. Objective: (1/2n)||y − Xβ||² + α||β||₁."""
    n, p = X.shape
    beta = np.zeros(p)
    r = y - X @ beta
    col_sq = (X * X).sum(axis=0) / n
    for _ in range(max_iter):
        max_delta = 0.0
        for j in range(p):
            if col_sq[j] <= 0:
                continue
            rho = (X[:, j] @ r) / n + col_sq[j] * beta[j]
            new = np.sign(rho) * max(abs(rho) - alpha, 0.0) / col_sq[j]
            d = new - beta[j]
            if d != 0.0:
                r -= X[:, j] * d
                beta[j] = new
                max_delta = max(max_delta, abs(d))
        if max_delta < tol:
            break
    return beta


def logistic_l1_pg(
    X: np.ndarray, y01: np.ndarray, alpha: float, max_iter: int = 200, tol: float = 1e-6
) -> np.ndarray:
    """Proximal-gradient (ISTA) L1 logistic regression; y in {0,1}."""
    n, p = X.shape
    beta = np.zeros(p)
    b0 = 0.0
    L = 0.25 * (np.linalg.norm(X, ord="fro") ** 2) / n + 1e-12  # lipschitz bound
    step = 1.0 / L
    for _ in range(max_iter):
        z = X @ beta + b0
        mu = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (mu - y01) / n
        g0 = float(np.mean(mu - y01))
        new = beta - step * g
        new = np.sign(new) * np.maximum(np.abs(new) - step * alpha, 0.0)
        b0_new = b0 - step * g0
        if np.max(np.abs(new - beta)) < tol and abs(b0_new - b0) < tol:
            beta, b0 = new, b0_new
            break
        beta, b0 = new, b0_new
    return beta


def _iid_indices(rng, n, frac):
    k = max(1, int(round(frac * n)))
    return rng.choice(n, size=min(k, n), replace=False)


def _stratified_indices(rng, ycodes, frac):
    """Proportional per-class counts with largest-remainder top-up
    (stability.py:21-91 semantics)."""
    n = len(ycodes)
    total = max(1, int(round(frac * n)))
    out = []
    classes, counts = np.unique(ycodes, return_counts=True)
    exact = counts * total / n
    base = np.floor(exact).astype(int)
    rem = total - base.sum()
    order = np.argsort(-(exact - base))
    base[order[:rem]] += 1
    for c, k in zip(classes, base):
        idx = np.where(ycodes == c)[0]
        k = min(max(k, 1 if len(idx) else 0), len(idx))
        if k:
            out.append(rng.choice(idx, size=k, replace=False))
    return np.concatenate(out) if out else np.arange(n)

def _block_indices(rng, group_starts, group_lens, frac, block_size):
    """Moving-block bootstrap within each group's timeline
    (stability.py:94-178 semantics: contiguous runs resampled per group)."""
    out = []
    for s, ln in zip(group_starts, group_lens):
        if ln <= 1:
            out.append(np.arange(s, s + ln))
            continue
        bs = max(1, int(np.sqrt(ln)) if block_size == "auto" else int(block_size))
        bs = min(bs, ln)
        target = max(1, int(round(frac * ln)))
        picks = []
        while sum(len(p_) for p_ in picks) < target:
            start = int(rng.integers(0, ln - bs + 1))
            picks.append(np.arange(s + start, s + start + bs))
        idx = np.concatenate(picks)[:target]
        out.append(np.unique(idx))
    return np.concatenate(out)


# --- the selector -------------------------------------------------------------

@dataclass
class StabilityResult:
    selected: list[str]
    frequencies: pd.DataFrame  # feature, frequency
    n_bootstrap: int
    extras: dict = field(default_factory=dict)


def stability_selection(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    task: str = "regression",
    n_bootstrap: int = 50,
    sample_fraction: float = 0.5,
    threshold: float = 0.6,
    alpha_scale: float = 0.1,
    bootstrap: str = "auto",
    group_col: str | None = None,
    time_col: str | None = None,
    block_size: int | str = "auto",
    max_features: int | None = None,
    subsample: int = 30_000,
    seed: int = 0,
) -> StabilityResult:
    """Bootstrapped-L1 stability selection over a Spark DataFrame.

    ``bootstrap``: 'auto' -> block if group+time given, stratified for
    classification, else iid. ``alpha_scale``: α = alpha_scale * α_max
    where α_max = max|Xᵀy|/n zeroes every coefficient (the standard
    regularization-path anchor; replaces the reference's sklearn CV —
    approximate-parity tier).
    """
    assert_numeric(df, feature_cols)
    spark = df.sparkSession

    sel_cols = list(feature_cols) + [target_col]
    if group_col:
        sel_cols.append(group_col)
    if time_col:
        sel_cols.append(time_col)
    data = df.select(*sel_cols)
    n_total = data.count()
    if n_total > subsample:
        data = deterministic_subsample(data, subsample, seed)
    if group_col:
        order = [group_col] + ([time_col] if time_col else [])
        data = data.orderBy(*order)
    pdf = data.toPandas()

    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    # impute + standardize once (every bootstrap standardizes its own slice
    # in the reference; shared standardization changes only the alpha scale)
    bad = ~np.isfinite(X)
    if bad.any():
        X[bad] = np.nan
        means = np.where(np.isfinite(np.nanmean(X, axis=0)), np.nanmean(X, axis=0), 0.0)
        ii, jj = np.where(bad)
        X[ii, jj] = means[jj]
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd = np.where(sd > 1e-12, sd, 1.0)
    X = (X - mu) / sd

    if task == "classification":
        _, ycodes = np.unique(pdf[target_col].to_numpy(), return_inverse=True)
        y = ycodes.astype(np.float64)
    else:
        y = pdf[target_col].to_numpy(dtype=np.float64)
        y = y - y.mean()
        ycodes = None

    if bootstrap == "auto":
        if group_col and time_col:
            bootstrap = "block"
        elif task == "classification":
            bootstrap = "stratified"
        else:
            bootstrap = "iid"

    group_starts = group_lens = None
    if bootstrap == "block":
        if not group_col:
            raise ValueError("block bootstrap requires group_col")
        grp = pdf[group_col].to_numpy()
        change = np.flatnonzero(grp[1:] != grp[:-1]) + 1
        group_starts = np.concatenate([[0], change])
        group_lens = np.diff(np.concatenate([group_starts, [len(grp)]]))

    n, p = X.shape
    alpha_max = float(np.max(np.abs(X.T @ y)) / n)
    alpha = alpha_scale * max(alpha_max, 1e-12)

    sc = spark.sparkContext
    bX = sc.broadcast(X)
    bY = sc.broadcast(y)
    bYc = sc.broadcast(ycodes)
    bGS = sc.broadcast(group_starts)
    bGL = sc.broadcast(group_lens)
    is_cls = task == "classification"

    def fit_rounds(batches):
        for bdf in batches:
            masks = []
            for r_ in bdf["id"]:
                rng = np.random.default_rng(seed * 100_003 + int(r_))
                if bootstrap == "iid":
                    idx = _iid_indices(rng, n, sample_fraction)
                elif bootstrap == "stratified":
                    idx = _stratified_indices(rng, bYc.value, sample_fraction)
                elif bootstrap == "block":
                    idx = _block_indices(rng, bGS.value, bGL.value, sample_fraction, block_size)
                else:
                    raise ValueError(f"unknown bootstrap: {bootstrap}")
                Xb, yb = bX.value[idx], bY.value[idx]
                if is_cls:
                    beta = logistic_l1_pg(Xb, yb, alpha)
                else:
                    beta = lasso_cd(Xb, yb - yb.mean(), alpha)
                masks.append((np.abs(beta) > 1e-10).astype(np.int64))
            out = pd.DataFrame(np.array(masks), columns=[f"m{j}" for j in range(p)])
            yield out

    schema = ", ".join(f"m{j} long" for j in range(p))
    masks = spark.range(n_bootstrap).repartition(min(n_bootstrap, 32)).mapInPandas(
        fit_rounds, schema
    )
    sums = masks.select(*[F.sum(f"m{j}").alias(f"m{j}") for j in range(p)]).collect()[0]
    freq = np.array([float(sums[f"m{j}"] or 0) for j in range(p)]) / n_bootstrap

    # frequency-ordered, stable in original column order on ties
    order = np.argsort(-freq, kind="stable")
    chosen = [i for i in order if freq[i] >= threshold]
    if max_features is not None:
        chosen = chosen[:max_features]
    freq_df = pd.DataFrame(
        {"feature": feature_cols, "frequency": freq}
    ).sort_values("frequency", ascending=False, kind="stable").reset_index(drop=True)
    return StabilityResult(
        selected=[feature_cols[i] for i in chosen],
        frequencies=freq_df,
        n_bootstrap=n_bootstrap,
        extras={"alpha": alpha, "bootstrap": bootstrap},
    )
