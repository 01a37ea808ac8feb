"""Driver-side TreeSHAP for Spark ML random forests (Boruta-SHAP backend;
reference /root/reference/sift/boruta.py:237-291 uses the ``shap`` package —
absent here, so the values are re-derived from first principles).

Method: exact **interventional SHAP under feature independence** via the
multilinear extension. A depth-D tree is a sum over leaves of
``leaf_value · ∏_j 1[x satisfies condition j]`` where the path conditions,
merged per feature, are disjoint interval tests on ≤D distinct features.
For a product of independent coordinates the Shapley value has the closed
form (Owen's multilinear extension):

    φ_i = (b_i − p_i) · ∫₀¹ ∏_{j≠i} (q·b_j + (1−q)·p_j) dq

with b_j = 1[x passes condition j] and p_j = P_background[passes]. The
integrand is a polynomial of degree ≤ D−1, so Gauss–Legendre quadrature
with ⌈D/2⌉ nodes is EXACT. Efficiency holds exactly per leaf
(Σ_i φ_i = ∏b − ∏p), hence globally: Σφ + E_bg[f] = f(x) — asserted in
tests. Deviation from the shap package: the background enters through
factorized per-condition marginals, not joint background rows (equivalent
when features are independent; this is the 'interventional, independent
features' variant).

Tree structures come from ``toDebugString`` of each Spark ML decision tree
(continuous splits only — the engine's feature matrices are numeric).
Complexity: O(trees · leaves · D² · n) fully vectorized over samples.
"""

from __future__ import annotations

import re

import numpy as np

_IF_RE = re.compile(r"^If \(feature (\d+) (<=|>) (.+)\)$")
_ELSE_RE = re.compile(r"^Else \(feature (\d+) (<=|>) (.+)\)$")
_PRED_RE = re.compile(r"^Predict: (.+)$")


def parse_debug_tree(debug: str) -> list[tuple[list[tuple[int, float, bool]], float]]:
    """Parse one Spark ML tree's ``toDebugString`` into leaves:
    [(path, value)] where path = [(feature, threshold, is_le)]."""
    lines = [ln.strip() for ln in debug.splitlines() if ln.strip()]
    # drop header line(s) until the first If/Predict
    start = 0
    while start < len(lines) and not (
        lines[start].startswith("If ") or lines[start].startswith("Predict:")
    ):
        start += 1
    lines = lines[start:]
    if any("in {" in ln for ln in lines):
        raise ValueError("categorical splits are not supported by this SHAP backend")

    pos = 0
    leaves: list[tuple[list[tuple[int, float, bool]], float]] = []

    def walk(path):
        nonlocal pos
        ln = lines[pos]
        m = _PRED_RE.match(ln)
        if m:
            pos += 1
            leaves.append((list(path), float(m.group(1))))
            return
        m = _IF_RE.match(ln)
        if not m:
            raise ValueError(f"unparseable tree line: {ln!r}")
        feat, op, thr = int(m.group(1)), m.group(2), float(m.group(3))
        pos += 1
        walk(path + [(feat, thr, op == "<=")])
        m2 = _ELSE_RE.match(lines[pos])
        if not m2:
            raise ValueError(f"expected Else, got: {lines[pos]!r}")
        pos += 1
        walk(path + [(feat, thr, op != "<=")])

    walk([])
    return leaves


def _merge_path(path):
    """Merge a path's conditions per feature into one interval (lo, hi]."""
    iv: dict[int, list[float]] = {}
    for feat, thr, is_le in path:
        lo, hi = iv.setdefault(feat, [-np.inf, np.inf])
        if is_le:
            iv[feat][1] = min(hi, thr)
        else:
            iv[feat][0] = max(lo, thr)
    return iv


def forest_shap(
    model,
    X_eval: np.ndarray,
    X_background: np.ndarray | None = None,
) -> tuple[np.ndarray, float]:
    """SHAP values (n, p) + base value for a Spark ML RandomForest
    regression model (or a classifier's vote function) at ``X_eval``.
    Background defaults to X_eval itself."""
    bg = X_eval if X_background is None else X_background
    n, p = X_eval.shape
    phi = np.zeros((n, p))
    base = 0.0
    trees = model.trees
    weights = getattr(model, "treeWeights", [1.0] * len(trees))
    wsum = float(sum(weights))

    for tree, tw in zip(trees, weights):
        leaves = parse_debug_tree(tree.toDebugString)
        scale = tw / wsum
        for path, value in leaves:
            if not path:
                base += scale * value
                continue
            iv = _merge_path(path)
            feats = list(iv.keys())
            d = len(feats)
            b = np.empty((d, n))
            pbg = np.empty(d)
            for j, f in enumerate(feats):
                lo, hi = iv[f]
                b[j] = ((X_eval[:, f] > lo) & (X_eval[:, f] <= hi)).astype(np.float64)
                pbg[j] = float(np.mean((bg[:, f] > lo) & (bg[:, f] <= hi)))
            base += scale * value * float(np.prod(pbg))
            # Gauss–Legendre on [0,1], exact for degree ≤ 2*nq−1 ≥ d−1
            nq = max(1, (d + 1) // 2)
            gx, gw = np.polynomial.legendre.leggauss(nq)
            q = 0.5 * (gx + 1.0)
            w_q = 0.5 * gw
            # terms[j, k, :] = q_k·b_j + (1−q_k)·p_j
            terms = q[None, :, None] * b[:, None, :] + (1 - q)[None, :, None] * pbg[:, None, None]
            for j, f in enumerate(feats):
                others = np.prod(np.delete(terms, j, axis=0), axis=0)  # (nq, n)
                integral = np.einsum("k,kn->n", w_q, others)
                phi[:, f] += scale * value * (b[j] - pbg[j]) * integral
    return phi, base


def shap_importances(
    model,
    X_eval: np.ndarray,
    w_eval: np.ndarray | None = None,
) -> np.ndarray:
    """Weighted mean |SHAP| per feature (reference _weighted_mean_abs,
    boruta.py:283-291)."""
    phi, _ = forest_shap(model, X_eval)
    if w_eval is None:
        return np.abs(phi).mean(axis=0)
    w = np.asarray(w_eval, dtype=np.float64)
    return (np.abs(phi) * w[:, None]).sum(axis=0) / max(w.sum(), 1e-12)
