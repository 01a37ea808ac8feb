"""Driver-side greedy selection loops (vectorized NumPy).

Faithful re-derivations of the reference's selection math
(/root/reference/sift/selection/loops.py, /root/reference/sift/selection/cefsplus.py,
/root/reference/sift/selection/objective.py, /root/reference/sift/selection/auto_k.py:207-251).
The loops are *inherently sequential* (each pick conditions on the last), and
their state is tiny (top_m ≤ a few thousand after the relevance prefilter),
so they run on the driver by design — Spark's job is the reductions that feed
them (SURVEY.md §3.1 "Spark lifecycle"). All constants (FLOOR=1e-6, clip
0.99999, eps 1e-8/1e-12, shrink 1e-6) are the reference's parity-defining
numerical-stability rewrites (SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np

FLOOR = 1e-6


def gaussian_mi_from_corr(r: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """I = -0.5·log(1-r²), r² clipped below 1 (copula.py:243-247)."""
    r2 = np.clip(np.asarray(r) ** 2, 0.0, 1.0 - eps)
    return -0.5 * np.log(1.0 - r2)


def mrmr_greedy(
    R: np.ndarray,
    relevance: np.ndarray,
    k: int,
    use_quotient: bool = True,
    redundancy: str = "abs_corr",
) -> np.ndarray:
    """Greedy mRMR with incremental redundancy vs the last pick.

    redundancy='abs_corr'  -> classic (loops.py:58-115): red = |R[last]|
    redundancy='gaussian_mi' -> gaussian (cefsplus.py:22-61): red = MI(R[last])
    """
    rel = np.asarray(relevance, dtype=np.float64)
    m = rel.size
    k = min(k, m)
    if k <= 0 or m == 0:
        return np.empty(0, dtype=np.int64)

    selected = np.empty(k, dtype=np.int64)
    is_sel = np.zeros(m, dtype=bool)
    red_sum = np.zeros(m, dtype=np.float64)

    selected[0] = int(np.argmax(rel))
    is_sel[selected[0]] = True

    for t in range(1, k):
        row = np.asarray(R[selected[t - 1]], dtype=np.float64)
        red = np.abs(row) if redundancy == "abs_corr" else gaussian_mi_from_corr(row)
        red_sum[~is_sel] += red[~is_sel]

        mean_red = red_sum / t
        score = (
            rel / np.maximum(mean_red, FLOOR) if use_quotient else rel - mean_red
        )
        score[is_sel] = -np.inf
        j = int(np.argmax(score))
        if not np.isfinite(score[j]):
            return selected[:t]
        selected[t] = j
        is_sel[j] = True

    return selected


def jmi_greedy_r2(
    R: np.ndarray,
    r_y: np.ndarray,
    relevance: np.ndarray,
    k: int,
    use_min: bool = False,
) -> np.ndarray:
    """JMI / JMIM with the analytic two-regressor R² estimator.

    score step: R²(f,s;y) = r_ys² + (r_yf − r_ys·r_fs)²/(1−r_fs²) (fallback
    r_ys² when the denominator < 1e-8), clipped to [0, 0.99999], then
    I = −½log(1−R²); aggregate sum (JMI) or min (JMIM)
    (joint_mi.py:120-220, cefsplus.py:64-121).
    """
    rel = np.asarray(relevance, dtype=np.float64)
    ry = np.asarray(r_y, dtype=np.float64)
    m = rel.size
    k = min(k, m)
    if k <= 0 or m == 0:
        return np.empty(0, dtype=np.int64)

    scores = np.full(m, np.inf) if use_min else np.zeros(m)
    selected = np.empty(k, dtype=np.int64)
    is_sel = np.zeros(m, dtype=bool)

    selected[0] = int(np.argmax(rel))
    is_sel[selected[0]] = True
    count = 1

    for t in range(1, k):
        last = selected[t - 1]
        r_ys = float(ry[last])
        r_fs = np.asarray(R[last], dtype=np.float64)
        denom = 1.0 - r_fs * r_fs
        a = ry - r_ys * r_fs
        r2 = np.full(m, r_ys * r_ys)
        ok = denom >= 1e-8
        r2[ok] += (a[ok] * a[ok]) / denom[ok]
        np.clip(r2, 0.0, 0.99999, out=r2)
        mi = -0.5 * np.log(1.0 - r2)

        mask = ~is_sel
        if use_min:
            scores[mask] = np.minimum(scores[mask], mi[mask])
        else:
            scores[mask] += mi[mask]

        eff = np.where(np.isfinite(scores), scores, rel)
        eff[is_sel] = -np.inf
        j = int(np.argmax(eff))
        if not np.isfinite(eff[j]):
            break
        selected[t] = j
        is_sel[j] = True
        count += 1

    return selected[:count]


def jmi_greedy_binned(
    codes: np.ndarray,
    y_codes: np.ndarray,
    w: np.ndarray,
    relevance: np.ndarray,
    k: int,
    n_bins: int = 10,
    n_y_states: int | None = None,
    use_min: bool = False,
) -> np.ndarray:
    """JMI/JMIM with the binned estimator on precomputed integer codes.

    ``codes``: (n, m) int bin codes per candidate (exact-percentile binned),
    ``y_codes``: (n,) target codes. Each step scores all candidates via
    I(f,s;y) = H(f,s) + H(y) − H(f,s,y) over weighted composite-code
    histograms (joint_mi.py:58-117). Runs on the (subsampled) collected code
    matrix — n is bounded by the engine's subsample budget, codes are int16.
    """
    n, m = codes.shape
    k = min(k, m)
    if k <= 0 or m == 0:
        return np.empty(0, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    w_sum = float(w.sum())
    ny = int(n_y_states if n_y_states is not None else y_codes.max() + 1)

    def entropy(c: np.ndarray, n_states: int) -> float:
        counts = np.bincount(c, weights=w, minlength=n_states)
        pr = counts / w_sum
        mask = pr > 1e-12
        return float(-(pr[mask] * np.log(pr[mask])).sum())

    h_y = entropy(y_codes, ny)
    fs_states = n_bins * n_bins
    fsy_states = fs_states * ny

    rel = np.asarray(relevance, dtype=np.float64)
    scores = np.full(m, np.inf) if use_min else np.zeros(m)
    selected = np.empty(k, dtype=np.int64)
    is_sel = np.zeros(m, dtype=bool)
    selected[0] = int(np.argmax(rel))
    is_sel[selected[0]] = True
    count = 1

    for t in range(1, k):
        s_b = codes[:, selected[t - 1]].astype(np.int64)
        cand = np.where(~is_sel)[0]
        if cand.size == 0:
            break
        mi = np.empty(cand.size)
        for i, j in enumerate(cand):
            fs = codes[:, j].astype(np.int64) * n_bins + s_b
            fsy = fs * ny + y_codes
            mi[i] = max(0.0, entropy(fs, fs_states) + h_y - entropy(fsy, fsy_states))
        if use_min:
            scores[cand] = np.minimum(scores[cand], mi)
        else:
            scores[cand] += mi

        eff = np.where(np.isfinite(scores), scores, rel)
        eff[is_sel] = -np.inf
        j = int(np.argmax(eff))
        if not np.isfinite(eff[j]):
            break
        selected[t] = j
        is_sel[j] = True
        count += 1

    return selected[:count]


def digamma(x):
    """Vectorized digamma ψ(x) for x > 0 (no scipy in this container):
    recurrence to x ≥ 6, then the standard asymptotic series — ~1e-12
    absolute accuracy over the integer arguments KSG uses."""
    x = np.asarray(x, dtype=np.float64).copy()
    out = np.zeros_like(x)
    while True:
        small = x < 6.0
        if not small.any():
            break
        out[small] -= 1.0 / x[small]
        x[small] += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    out += (
        np.log(x) - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
    )
    return out


def ksg_joint_mi(
    selected: np.ndarray,
    candidates: np.ndarray,
    y: np.ndarray,
    k: int = 3,
    block: int = 256,
) -> np.ndarray:
    """KSG k-NN joint-MI I((f,s); y) per candidate f
    (reference sift/estimators/joint_mi.py:380-421).

    The reference uses scipy cKDTree + digamma; neither exists in this
    container, so the Chebyshev kth-NN radii and the in-radius counts are
    exact brute force, blocked to ``block``×n distance tiles. O(n²) per
    candidate — run it on the KSG subsample budget (the estimator itself is
    a small-n tool: no weights, ~n·3 doubles per tree in the reference too).
    Matches the reference's tie/self conventions: radius = (k+1)th smallest
    full-space distance including self, minus 1e-15; counts are ≤ radius,
    minus self.
    """
    n, p = candidates.shape
    scores = np.empty(p, dtype=np.float64)
    y_s = (y - y.mean()) / (y.std() + 1e-10)
    s_s = (selected - selected.mean()) / (selected.std() + 1e-10)
    dg_k_n = float(digamma(np.array([k]))[0] + digamma(np.array([n]))[0])

    for j in range(p):
        f = candidates[:, j]
        f_s = (f - f.mean()) / (f.std() + 1e-10)
        n_x = np.empty(n, dtype=np.int64)
        n_y = np.empty(n, dtype=np.int64)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            df_ = np.abs(f_s[lo:hi, None] - f_s[None, :])
            ds_ = np.abs(s_s[lo:hi, None] - s_s[None, :])
            dy_ = np.abs(y_s[lo:hi, None] - y_s[None, :])
            dxy = np.maximum(df_, ds_)          # joint (f,s) space
            dfull = np.maximum(dxy, dy_)        # full (f,s,y) space
            kth = np.partition(dfull, k, axis=1)[:, k]   # incl. self at d=0
            eps = np.maximum(kth - 1e-15, 0.0)[:, None]
            n_x[lo:hi] = (dxy <= eps).sum(axis=1) - 1
            n_y[lo:hi] = (dy_ <= eps).sum(axis=1) - 1
        n_x = np.maximum(n_x, 0)
        n_y = np.maximum(n_y, 0)
        mi = dg_k_n - float(np.mean(digamma(n_x + 1) + digamma(n_y + 1)))
        scores[j] = max(mi, 0.0)
    return scores


def jmi_greedy_ksg(
    X: np.ndarray,
    y: np.ndarray,
    relevance: np.ndarray,
    k: int,
    knn: int = 3,
    use_min: bool = False,
) -> np.ndarray:
    """JMI/JMIM with the KSG estimator on the collected candidate matrix
    (reference loops.py:216-218 closure + the shared incremental loop).
    Imputed float64 columns in candidate ORDER; weights unsupported, as in
    the reference."""
    rel = np.asarray(relevance, dtype=np.float64)
    m = rel.size
    k = min(k, m)
    if k <= 0 or m == 0:
        return np.empty(0, dtype=np.int64)
    scores = np.full(m, np.inf) if use_min else np.zeros(m)
    selected = np.empty(k, dtype=np.int64)
    is_sel = np.zeros(m, dtype=bool)
    selected[0] = int(np.argmax(rel))
    is_sel[selected[0]] = True
    count = 1
    for t in range(1, k):
        last = selected[t - 1]
        cand = np.where(~is_sel)[0]
        if cand.size == 0:
            break
        mi = ksg_joint_mi(X[:, last], X[:, cand], y, k=knn)
        if use_min:
            scores[cand] = np.minimum(scores[cand], mi)
        else:
            scores[cand] += mi
        eff = np.where(np.isfinite(scores), scores, rel)
        eff[is_sel] = -np.inf
        j = int(np.argmax(eff))
        if not np.isfinite(eff[j]):
            break
        selected[t] = j
        is_sel[j] = True
        count += 1
    return selected[:count]


def greedy_corr_prune(
    R: np.ndarray, scores: np.ndarray, threshold: float = 0.95
) -> np.ndarray:
    """Drop candidates |corr| ≥ threshold with a kept higher-scoring one
    (copula.py:250-275). Returns kept indices in descending-score order."""
    m = len(scores)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-np.asarray(scores))
    active = np.ones(m, dtype=bool)
    keep = []
    for i, fi in enumerate(order):
        if not active[i]:
            continue
        keep.append(int(fi))
        later = order[i + 1:]
        hits = np.abs(np.asarray(R[fi])[later]) >= threshold
        active[i + 1:][hits] = False
    return np.array(keep, dtype=np.int64)


def _schur_extend(inv_M: np.ndarray, logdet: float, b: np.ndarray, eps: float):
    """Rank-1 bordering update of an inverse + log-det: append row/col b,1."""
    v = inv_M @ b
    s = max(float(1.0 - b @ v), eps)
    t = inv_M.shape[0]
    out = np.empty((t + 1, t + 1))
    out[:t, :t] = inv_M + np.outer(v, v) / s
    out[:t, t] = -v / s
    out[t, :t] = -v / s
    out[t, t] = 1.0 / s
    return out, logdet + float(np.log(s)), s


def cefsplus_greedy(
    R: np.ndarray,
    r: np.ndarray,
    k: int,
    tie_break_rel: np.ndarray,
    shrink: float = 1e-6,
    eps: float = 1e-12,
    return_objective: bool = False,
):
    """CEFS+ greedy log-det selection with Schur-complement updates.

    Maximizes log|Σ_S∪f| − log|Σ_{y,S∪f}| (= 2·I(y; S∪f) under the Gaussian
    proxy) one feature at a time (cefsplus.py:124-281). Off-diagonal
    shrinkage (1−1e-6), determinant floors at eps, tie-break within 1e-12 by
    relevance — replicated exactly (parity-defining constants).
    """
    r = np.asarray(r, dtype=np.float64).ravel()
    m = r.size
    rel = np.asarray(tie_break_rel, dtype=np.float64)
    if k <= 0 or m == 0:
        return (np.empty(0, np.int64), np.empty(0)) if return_objective else np.empty(0, np.int64)
    k = min(k, m)

    Rs = (1.0 - shrink) * np.asarray(R, dtype=np.float64)
    np.fill_diagonal(Rs, 1.0)
    rs = (1.0 - shrink) * r

    selected = np.empty(k, dtype=np.int64)
    objective = np.empty(k, dtype=np.float64)
    remaining = np.ones(m, dtype=bool)

    j0 = int(np.argmax(rel))
    selected[0] = j0
    remaining[j0] = False
    count = 1

    inv_S = np.array([[1.0]])
    logdet_S = 0.0
    r0 = rs[j0]
    det_yS = max(1.0 - r0 * r0, eps)
    inv_yS = np.array([[1.0, -r0], [-r0, 1.0]]) / det_yS
    logdet_yS = float(np.log(det_yS))
    objective[0] = logdet_S - logdet_yS

    while count < k:
        rem = np.where(remaining)[0]
        if rem.size == 0:
            break
        sel = selected[:count]

        B = Rs[np.ix_(sel, rem)]                      # (s, n_rem)
        t1 = np.einsum("sr,sr->r", B, inv_S @ B)
        s1 = np.maximum(1.0 - t1, eps)
        lf = logdet_S + np.log(s1)

        B2 = np.vstack([rs[rem], B])                  # (s+1, n_rem)
        t2 = np.einsum("sr,sr->r", B2, inv_yS @ B2)
        s2 = np.maximum(1.0 - t2, eps)
        lc = logdet_yS + np.log(s2)

        score = lf - lc
        best_pos = int(np.argmax(score))
        # tie-break by relevance within 1e-12, first-strictly-greater wins
        best_rel = rel[rem[best_pos]]
        for ri in np.where(np.abs(score - score[best_pos]) < 1e-12)[0]:
            if rel[rem[ri]] > best_rel:
                best_rel = rel[rem[ri]]
                best_pos = int(ri)

        j = int(rem[best_pos])
        inv_S, logdet_S, _ = _schur_extend(inv_S, logdet_S, B[:, best_pos], eps)
        inv_yS, logdet_yS, _ = _schur_extend(inv_yS, logdet_yS, B2[:, best_pos], eps)

        selected[count] = j
        objective[count] = logdet_S - logdet_yS
        remaining[j] = False
        count += 1

    if return_objective:
        return selected[:count], objective[:count]
    return selected[:count]


def objective_from_corr_path(
    R_path: np.ndarray,
    r_path: np.ndarray,
    shrink: float = 1e-6,
    eps: float = 1e-12,
) -> np.ndarray:
    """Cumulative 2·I(y;S) along a fixed path (objective.py:8-94)."""
    r = np.asarray(r_path, dtype=np.float64).ravel()
    k = r.size
    if k == 0:
        return np.empty(0)
    Rp = np.asarray(R_path, dtype=np.float64)
    if shrink > 0.0:
        Rp = (1.0 - shrink) * Rp
        r = (1.0 - shrink) * r
        np.fill_diagonal(Rp, 1.0)

    obj = np.empty(k)
    inv_S = np.array([[1.0]])
    logdet_S = 0.0
    det_yS = max(1.0 - r[0] * r[0], eps)
    inv_yS = np.array([[1.0, -r[0]], [-r[0], 1.0]]) / det_yS
    logdet_yS = float(np.log(det_yS))
    obj[0] = logdet_S - logdet_yS

    for t in range(1, k):
        b = Rp[:t, t]
        inv_S, logdet_S, _ = _schur_extend(inv_S, logdet_S, b, eps)
        b2 = np.concatenate([[r[t]], b])
        inv_yS, logdet_yS, _ = _schur_extend(inv_yS, logdet_yS, b2, eps)
        obj[t] = logdet_S - logdet_yS
    return obj


def select_k_elbow(
    objective_path: np.ndarray,
    min_k: int = 5,
    max_k: int = 100,
    min_rel_gain: float = 0.02,
    patience: int = 3,
) -> int:
    """Elbow rule on a cumulative objective path (auto_k.py:207-251):
    stop after ``patience`` consecutive steps whose relative gain
    (delta / max(|prev obj|, 1)) drops below ``min_rel_gain``."""
    obj = np.asarray(objective_path, dtype=np.float64).ravel()
    max_k = min(max_k, obj.size)
    if max_k <= 0:
        return 0
    delta = np.empty_like(obj)
    delta[0] = obj[0]
    delta[1:] = np.diff(obj)
    rel_gain = np.empty_like(obj)
    rel_gain[0] = np.inf
    rel_gain[1:] = delta[1:] / np.maximum(np.abs(obj[:-1]), 1.0)

    best_k = max_k
    run = 0
    for kk in range(max(min_k, 2), max_k + 1):
        if rel_gain[kk - 1] < min_rel_gain:
            run += 1
            if run >= patience:
                best_k = kk - patience + 1
                break
        else:
            run = 0
    return best_k
