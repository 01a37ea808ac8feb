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
    X: np.ndarray, y01: np.ndarray, alpha: float, max_iter: int = 200,
    tol: float = 1e-6, w: np.ndarray | None = None,
) -> np.ndarray:
    """Proximal-gradient (ISTA) L1 logistic regression; y in {0,1};
    optional row weights enter the gradient (mean-normalized)."""
    n, p = X.shape
    wn = None if w is None else (w / max(w.mean(), 1e-12))
    beta = np.zeros(p)
    b0 = 0.0
    L = 0.25 * (np.linalg.norm(X, ord="fro") ** 2) / n + 1e-12  # lipschitz bound
    if wn is not None:
        L *= max(float(wn.max()), 1.0)
    step = 1.0 / L
    for _ in range(max_iter):
        z = X @ beta + b0
        mu = 1.0 / (1.0 + np.exp(-z))
        resid = (mu - y01) if wn is None else wn * (mu - y01)
        g = X.T @ resid / n
        g0 = float(np.mean(resid))
        new = beta - step * g
        new = np.sign(new) * np.maximum(np.abs(new) - step * alpha, 0.0)
        b0_new = b0 - step * g0
        if np.max(np.abs(new - beta)) < tol and abs(b0_new - b0) < tol:
            beta, b0 = new, b0_new
            break
        beta, b0 = new, b0_new
    return beta


def lasso_path_cd(
    X: np.ndarray, y: np.ndarray, alphas: np.ndarray, max_iter: int = 300,
    tol: float = 1e-6,
) -> np.ndarray:
    """Warm-started coordinate-descent path over a DESCENDING alpha grid
    (sklearn LassoCV's pathwise strategy); returns (n_alphas, p) betas."""
    n, p = X.shape
    betas = np.zeros((len(alphas), p))
    beta = np.zeros(p)
    r = y - X @ beta
    col_sq = (X * X).sum(axis=0) / n
    for ai, alpha in enumerate(alphas):
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
        betas[ai] = beta
    return betas


def cv_alpha(
    X: np.ndarray,
    y: np.ndarray,
    task: str = "regression",
    n_folds: int = 3,
    n_alphas: int = 30,
    eps: float = 1e-3,
    seed: int = 0,
    sample_weight: np.ndarray | None = None,
) -> float:
    """Alpha by k-fold CV on the (≤30k) collected matrix — the scipy-free
    re-derivation of the reference's LassoCV(cv=3, n_alphas=30) /
    LogisticRegressionCV(Cs=20, cv=3) step (stability.py:673-717).

    Regression: pathwise warm-started CD over a log grid from α_max down to
    eps·α_max; pick the α with the lowest mean held-out MSE. Classification:
    L1 logistic over the same grid shape, held-out logloss."""
    n, p = X.shape
    rng = np.random.default_rng(seed)
    if sample_weight is not None:
        sw = np.sqrt(sample_weight / sample_weight.mean())
        Xw, yw = X * sw[:, None], y * sw
    else:
        Xw, yw = X, y
    if task == "classification":
        yc = y - y.mean()
        alpha_max = float(np.max(np.abs(Xw.T @ yc)) / n)
        n_alphas = min(n_alphas, 20)
    else:
        alpha_max = float(np.max(np.abs(Xw.T @ yw)) / n)
    alpha_max = max(alpha_max, 1e-12)
    alphas = np.logspace(np.log10(alpha_max), np.log10(alpha_max * eps), n_alphas)

    folds = rng.integers(0, n_folds, size=n)
    cv_err = np.zeros(len(alphas))
    for f in range(n_folds):
        tr, va = folds != f, folds == f
        if not va.any() or not tr.any():
            continue
        if task == "classification":
            beta = np.zeros(p)
            for ai, a in enumerate(alphas):
                beta = _logistic_l1_warm(Xw[tr], y[tr], a, beta0=beta)
                z = np.clip(Xw[va] @ beta, -30, 30)
                mu = 1.0 / (1.0 + np.exp(-z))
                eps_ = 1e-12
                cv_err[ai] += -float(
                    np.mean(y[va] * np.log(mu + eps_) + (1 - y[va]) * np.log(1 - mu + eps_))
                )
        else:
            betas = lasso_path_cd(Xw[tr], yw[tr] - yw[tr].mean(), alphas)
            pred = Xw[va] @ betas.T + yw[tr].mean()
            cv_err += np.mean((yw[va][:, None] - pred) ** 2, axis=0)
    return float(alphas[int(np.argmin(cv_err))])


def _logistic_l1_warm(X, y01, alpha, beta0=None, max_iter=120, tol=1e-6):
    """ISTA L1 logistic with warm start (path-friendly variant of
    logistic_l1_pg; no intercept for the CV scorer)."""
    n, p = X.shape
    beta = np.zeros(p) if beta0 is None else beta0.copy()
    L = 0.25 * (np.linalg.norm(X, ord="fro") ** 2) / n + 1e-12
    step = 1.0 / L
    for _ in range(max_iter):
        z = np.clip(X @ beta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (mu - y01) / n
        new = beta - step * g
        new = np.sign(new) * np.maximum(np.abs(new) - step * alpha, 0.0)
        if np.max(np.abs(new - beta)) < tol:
            return new
        beta = new
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

def _block_indices(
    rng, group_starts, group_lens, block_size, method: str = "moving"
):
    """One block-bootstrap draw per group timeline (reference
    stability.py:94-207): ~n_g in-bag rows WITH replacement per group via
    moving / circular / stationary blocks; returns (in_bag, oob)."""
    in_bag_parts, oob_parts = [], []
    for s, ln in zip(group_starts, group_lens):
        ln = int(ln)
        if ln == 0:
            continue
        bs = max(1, int(np.sqrt(ln)) if block_size == "auto" else min(int(block_size), ln))
        n_blocks = max(1, int(np.ceil(ln / bs)))
        local = []
        if method == "moving":
            for _ in range(n_blocks):
                st = int(rng.integers(0, max(1, ln - bs + 1)))
                local.extend(range(st, min(st + bs, ln)))
        elif method == "circular":
            for _ in range(n_blocks):
                st = int(rng.integers(0, ln))
                local.extend((st + i) % ln for i in range(bs))
        elif method == "stationary":
            pgeo = 1.0 / bs
            while len(local) < ln:
                st = int(rng.integers(0, ln))
                length = min(int(rng.geometric(pgeo)), ln - st)
                local.extend(range(st, st + length))
            local = local[:ln]
        else:
            raise ValueError(f"Unknown block_method: {method}")
        local_arr = np.asarray(local, dtype=np.int64)
        in_bag_parts.append(s + local_arr)
        oob_mask = np.ones(ln, dtype=bool)
        oob_mask[np.unique(local_arr)] = False
        oob_parts.append(s + np.nonzero(oob_mask)[0])
    in_bag = np.concatenate(in_bag_parts) if in_bag_parts else np.empty(0, np.int64)
    oob = np.concatenate(oob_parts) if oob_parts else np.empty(0, np.int64)
    return in_bag, oob


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
    alpha: float | str | None = None,
    alpha_scale: float = 0.1,
    bootstrap: str = "auto",
    block_method: str = "moving",
    min_oob: int = 10,
    group_col: str | None = None,
    time_col: str | None = None,
    block_size: int | str = "auto",
    max_features: int | None = None,
    subsample: int = 30_000,
    seed: int = 0,
    use_smart_sampler: bool = False,
    smart_sampler_kwargs: dict | None = None,
    weight_col: str | None = None,
) -> StabilityResult:
    """Bootstrapped-L1 stability selection over a Spark DataFrame.

    ``bootstrap``: 'auto' -> block if group+time given, stratified for
    classification, else iid. ``block_method``: moving | circular |
    stationary (reference stability.py:94-207), with min-OOB and
    class-coverage retry per round. ``alpha``: None -> 3-fold CV over a
    log α-grid on the collected matrix (the reference's LassoCV /
    LogRegCV step, stability.py:673-717, re-derived scipy-free);
    float -> used verbatim; 'scale' -> alpha_scale·α_max.
    ``use_smart_sampler``: pre-sample rows with the leverage sampler and
    carry its inverse-probability weights into every fit
    (stability.py:576-671).
    """
    assert_numeric(df, feature_cols)
    spark = df.sparkSession

    if use_smart_sampler:
        from mrmr_spark.select.sampling import smart_sample

        kw = dict(smart_sampler_kwargs or {})
        kw.setdefault("group_col", group_col)
        kw.setdefault("time_col", time_col)
        kw.setdefault("random_state", seed)
        df = smart_sample(df, feature_cols, target_col, **kw)
        weight_col = "sample_weight"

    sel_cols = list(feature_cols) + [target_col]
    if group_col:
        sel_cols.append(group_col)
    if time_col:
        sel_cols.append(time_col)
    if weight_col:
        sel_cols.append(weight_col)
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
    w_rows = (
        pdf[weight_col].to_numpy(dtype=np.float64) if weight_col else None
    )
    if w_rows is not None:
        w_rows = w_rows / max(w_rows.mean(), 1e-12)

    alpha_max = float(np.max(np.abs(X.T @ y)) / n)
    if alpha is None:
        alpha_val = cv_alpha(X, y, task, seed=seed, sample_weight=w_rows)
    elif alpha == "scale":
        alpha_val = alpha_scale * max(alpha_max, 1e-12)
    else:
        alpha_val = float(alpha)

    sc = spark.sparkContext
    bX = sc.broadcast(X)
    bY = sc.broadcast(y)
    bYc = sc.broadcast(ycodes)
    bGS = sc.broadcast(group_starts)
    bGL = sc.broadcast(group_lens)
    bW = sc.broadcast(w_rows)
    is_cls = task == "classification"
    classes = set(np.unique(ycodes)) if is_cls and ycodes is not None else None

    def _draw(rng):
        """One bootstrap draw; block path retries until ≥min_oob rows are
        out-of-bag and (classification) all classes are in-bag with ≥2 OOB
        classes (reference stability.py:160-176), ≤10 attempts."""
        if bootstrap == "iid":
            return _iid_indices(rng, n, sample_fraction)
        if bootstrap == "stratified":
            return _stratified_indices(rng, bYc.value, sample_fraction)
        if bootstrap == "block":
            for _ in range(10):
                in_bag, oob = _block_indices(
                    rng, bGS.value, bGL.value, block_size, block_method
                )
                if oob.size < min_oob:
                    continue
                if classes is not None:
                    yv = bY.value
                    if set(yv[in_bag]) != classes or len(set(yv[oob])) < 2:
                        continue
                return in_bag
            return in_bag  # best effort after max attempts (reference warns)
        raise ValueError(f"unknown bootstrap: {bootstrap}")

    def fit_rounds(batches):
        for bdf in batches:
            masks = []
            for r_ in bdf["id"]:
                rng = np.random.default_rng(seed * 100_003 + int(r_))
                idx = _draw(rng)
                Xb, yb = bX.value[idx], bY.value[idx]
                wb = bW.value[idx] if bW.value is not None else None
                if is_cls:
                    beta = logistic_l1_pg(Xb, yb, alpha_val, w=wb)
                else:
                    if wb is not None:
                        # √w row scaling = exact weighted least squares in
                        # the quadratic term (L1 term unweighted, as sklearn)
                        sb = np.sqrt(wb / wb.mean())
                        Xb, yb = Xb * sb[:, None], yb * sb
                    beta = lasso_cd(Xb, yb - yb.mean(), alpha_val)
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
        extras={
            "alpha": alpha_val,
            "bootstrap": bootstrap,
            "block_method": block_method if bootstrap == "block" else None,
        },
    )
