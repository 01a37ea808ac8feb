"""Partition-parallel Arrow block reductions.

The engine's distributed numeric core: every statistic the selection layer
needs (imputation means, weighted moments, per-class moments, the p×p Gram /
correlation matrix) is a **sum over rows of a per-row vector/matrix term**,
so it map-reduces as

    mapInArrow(partition -> float64 accumulator vector)  ->  driver np.sum

Each partition emits ONE row containing its accumulator (serialized float64
bytes), i.e. communication is ``numPartitions × out_len × 8`` bytes — for the
flagship Gram reduction at top_m=1250 that is ~12.5MB/partition (SURVEY.md
§4.2). Beyond ~64 partitions a two-level combine keeps the driver collect
flat: we optionally repartition the tiny accumulator rows and reduce once
more executor-side before the final collect.

All kernels cast inputs float64->float32->float64 when ``quantize_f32`` —
the reference's precision contract (X validated float64, imputed, cast
float32, reductions accumulate float64: /root/reference/sift/_preprocess.py:172-177,
/root/reference/sift/estimators/copula.py:180-183).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

_ACC_SCHEMA = "acc binary"
#: partition counts above this get a two-level (tree) combine before collect
TREE_COMBINE_THRESHOLD = 64


def _batch_cols(batch: pa.RecordBatch, cols: list[str]) -> np.ndarray:
    """(n, len(cols)) float64 matrix from an Arrow batch (zero-copy per col
    where possible; nulls -> NaN)."""
    arrs = []
    for c in cols:
        col = batch.column(batch.schema.get_field_index(c))
        arrs.append(np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64))
    return np.column_stack(arrs) if arrs else np.empty((batch.num_rows, 0))


def arrow_reduce(
    df: DataFrame,
    partition_term: Callable[[pa.RecordBatch], np.ndarray],
    out_len: int,
) -> np.ndarray:
    """Sum ``partition_term(batch)`` over all batches of ``df``.

    ``partition_term`` must return a 1-D float64 array of length ``out_len``
    (flatten matrices). Returns the global float64 sum.
    """

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = np.zeros(out_len, dtype=np.float64)
        nonempty = False
        for b in batches:
            if b.num_rows:
                acc += partition_term(b)
                nonempty = True
        if nonempty:
            yield pa.RecordBatch.from_arrays([pa.array([acc.tobytes()])], ["acc"])

    reduced = df.mapInArrow(mapper, _ACC_SCHEMA)
    n_parts = df.rdd.getNumPartitions()
    if n_parts > TREE_COMBINE_THRESHOLD:
        # tree combine: shuffle the tiny accumulator rows down to a handful
        # of partitions and pre-sum executor-side (treeAggregate depth=2).
        def combine(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            acc = np.zeros(out_len, dtype=np.float64)
            nonempty = False
            for b in batches:
                col = b.column(0)
                for i in range(b.num_rows):
                    acc += np.frombuffer(col[i].as_py(), dtype=np.float64)
                    nonempty = True
            if nonempty:
                yield pa.RecordBatch.from_arrays([pa.array([acc.tobytes()])], ["acc"])

        reduced = reduced.repartition(8).mapInArrow(combine, _ACC_SCHEMA)

    total = np.zeros(out_len, dtype=np.float64)
    for row in reduced.collect():
        total += np.frombuffer(row.acc, dtype=np.float64)
    return total


def _quantize(X: np.ndarray, quantize_f32: bool) -> np.ndarray:
    return X.astype(np.float32).astype(np.float64) if quantize_f32 else X


# ---------------------------------------------------------------------------
# Pass 1: finite-value means (imputation) + weighted means
# ---------------------------------------------------------------------------

def impute_mean_pass(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    y_col: str | None,
    quantize_f32: bool = True,
) -> dict:
    """One scan -> everything needed to impute and weighted-center.

    Returns dict with per-column arrays (len p): n_fin, sum_fin (raw f64,
    pre-quantization — imputation means are computed on float64 like the
    reference's ``np.nanmean`` before the f32 cast), w_fin, wx (weighted sum
    of quantized finite values), w_nonfin, wy_nonfin; and globals: sw, n,
    swy, (swy only if y_col).
    """
    p = len(feature_cols)
    cols = list(feature_cols)
    HAS_Y = y_col is not None

    def term(batch: pa.RecordBatch) -> np.ndarray:
        X = _batch_cols(batch, cols)
        n = X.shape[0]
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index(weight_col)).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(n)
        )
        fin = np.isfinite(X)
        Xq = _quantize(np.where(fin, X, 0.0), quantize_f32)
        out = np.empty(6 * p + 3, dtype=np.float64)
        out[0:p] = fin.sum(axis=0)                      # n_fin
        out[p:2 * p] = np.where(fin, X, 0.0).sum(axis=0)  # sum_fin (f64 raw)
        out[2 * p:3 * p] = (fin * w[:, None]).sum(axis=0)  # w_fin
        out[3 * p:4 * p] = (Xq * (fin * w[:, None])).sum(axis=0)  # wx (quantized)
        wnf = ((~fin) * w[:, None])
        out[4 * p:5 * p] = wnf.sum(axis=0)               # w_nonfin
        if HAS_Y:
            y = np.asarray(
                batch.column(batch.schema.get_field_index(y_col)).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            yq = _quantize(y, quantize_f32)
            out[5 * p:6 * p] = (wnf * yq[:, None]).sum(axis=0)  # wy_nonfin
            out[6 * p + 2] = float(np.dot(w, yq))
        else:
            out[5 * p:6 * p] = 0.0
            out[6 * p + 2] = 0.0
        out[6 * p] = w.sum()
        out[6 * p + 1] = n
        return out

    acc = arrow_reduce(df, term, 6 * p + 3)
    n_fin = acc[0:p]
    sum_fin = acc[p:2 * p]
    impute_means = np.where(n_fin > 0, sum_fin / np.maximum(n_fin, 1), 0.0)
    m_q = _quantize(impute_means, quantize_f32)  # value actually written into cells
    sw = acc[6 * p]
    wx_imputed = acc[3 * p:4 * p] + acc[4 * p:5 * p] * m_q
    return {
        "impute_means": m_q,
        "n_fin": n_fin,
        "w_fin": acc[2 * p:3 * p],
        "w_nonfin": acc[4 * p:5 * p],
        "wy_nonfin": acc[5 * p:6 * p],
        "sw": sw,
        "n": acc[6 * p + 1],
        "wy": acc[6 * p + 2],
        "col_wmeans": wx_imputed / sw,  # weighted means of imputed columns
    }


# ---------------------------------------------------------------------------
# Pass 2: centered second moments (x_ss, xy_cov, y_ss) — regression relevance
# ---------------------------------------------------------------------------

def centered_moments_pass(
    df: DataFrame,
    feature_cols: list[str],
    y_col: str | None,
    weight_col: str | None,
    impute_means: np.ndarray,
    col_wmeans: np.ndarray,
    y_wmean: float = 0.0,
    quantize_f32: bool = True,
) -> dict:
    """Exact two-pass centering, mirroring the reference's shape
    (/root/reference/sift/estimators/relevance.py:39-45): weighted x_ss,
    xy_cov per column, global y_ss, plus the *unweighted* centered sumsq
    around the impute mean (for constant-column pruning, copula.py:64-69 —
    exact zero for truly constant columns, no cancellation)."""
    p = len(feature_cols)
    cols = list(feature_cols)
    mu = np.asarray(col_wmeans, dtype=np.float64)
    mq = np.asarray(impute_means, dtype=np.float64)
    HAS_Y = y_col is not None

    def term(batch: pa.RecordBatch) -> np.ndarray:
        X = _batch_cols(batch, cols)
        n = X.shape[0]
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index(weight_col)).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(n)
        )
        fin = np.isfinite(X)
        Xq = np.where(fin, _quantize(np.where(fin, X, 0.0), quantize_f32), mq[None, :])
        Xc = Xq - mu[None, :]
        wXc = Xc * w[:, None]
        Xum = Xq - mq[None, :]
        out = np.zeros(3 * p + 1, dtype=np.float64)
        out[0:p] = (wXc * Xc).sum(axis=0)                 # x_ss (weighted)
        out[2 * p:3 * p] = (Xum * Xum).sum(axis=0)        # unweighted ss @ impute mean
        if HAS_Y:
            y = np.asarray(
                batch.column(batch.schema.get_field_index(y_col)).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            yc = _quantize(y, quantize_f32) - y_wmean
            out[p:2 * p] = (wXc * yc[:, None]).sum(axis=0)  # xy_cov
            out[3 * p] = float(np.dot(w, yc * yc))          # y_ss
        return out

    acc = arrow_reduce(df, term, 3 * p + 1)
    return {
        "x_ss": acc[0:p],
        "xy_cov": acc[p:2 * p],
        "x_ss_unw": acc[2 * p:3 * p],
        "y_ss": float(acc[3 * p]),
    }


# ---------------------------------------------------------------------------
# Pass 2 (classification): per-class centered moments
# ---------------------------------------------------------------------------

def class_moments_pass(
    df: DataFrame,
    feature_cols: list[str],
    ycode_col: str,
    weight_col: str | None,
    n_classes: int,
    impute_means: np.ndarray,
    col_wmeans: np.ndarray,
    quantize_f32: bool = True,
) -> dict:
    """Per-class weighted sums needed by the weighted-ANOVA F
    (/root/reference/sift/estimators/relevance.py:57-107), centered at the
    global weighted mean for numerical stability (algebraically identical).

    Returns B[c,j] = Σ_{i∈c} w·(x−x̄_j), A[c,j] = Σ_{i∈c} w·(x−x̄_j)²,
    class_w[c] = Σ_{i∈c} w.
    """
    p = len(feature_cols)
    cols = list(feature_cols)
    mu = np.asarray(col_wmeans, dtype=np.float64)
    mq = np.asarray(impute_means, dtype=np.float64)
    C = int(n_classes)

    def term(batch: pa.RecordBatch) -> np.ndarray:
        X = _batch_cols(batch, cols)
        n = X.shape[0]
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index(weight_col)).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(n)
        )
        yc = np.asarray(
            batch.column(batch.schema.get_field_index(ycode_col)).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        ).astype(np.int64)
        fin = np.isfinite(X)
        Xq = np.where(fin, _quantize(np.where(fin, X, 0.0), quantize_f32), mq[None, :])
        Xc = Xq - mu[None, :]
        out = np.zeros(2 * C * p + C, dtype=np.float64)
        for c in range(C):
            m = yc == c
            if not m.any():
                continue
            wc = w[m]
            Xm = Xc[m]
            out[c * p:(c + 1) * p] = (Xm * wc[:, None]).sum(axis=0)
            out[C * p + c * p:C * p + (c + 1) * p] = (Xm * Xm * wc[:, None]).sum(axis=0)
            out[2 * C * p + c] = wc.sum()
        return out

    acc = arrow_reduce(df, term, 2 * C * p + C)
    return {
        "B": acc[: C * p].reshape(C, p),
        "A": acc[C * p:2 * C * p].reshape(C, p),
        "class_w": acc[2 * C * p:],
    }


# ---------------------------------------------------------------------------
# Pass 3: weighted Gram of standardized columns -> correlation matrix
# ---------------------------------------------------------------------------

def gram_pass(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    impute_means: np.ndarray,
    col_wmeans: np.ndarray,
    col_wstds: np.ndarray,
    y_col: str | None = None,
    y_wmean: float = 0.0,
    y_wstd: float = 1.0,
    quantize_f32: bool = True,
    clip: float | None = 0.999999,
) -> dict:
    """THE flagship reduction (SURVEY.md D4): per partition
    ``G += Zᵀ (w ⊙ Z)`` on standardized Z (driver-known μ, σ), plus Σw;
    driver normalizes/clips into the redundancy matrix R. When ``y_col``
    is given, y is appended as column p (one pass also yields the
    feature↔target correlation vector, SURVEY.md D6)."""
    p = len(feature_cols)
    cols = list(feature_cols)
    mu = np.asarray(col_wmeans, dtype=np.float64)
    sd = np.asarray(col_wstds, dtype=np.float64)
    mq = np.asarray(impute_means, dtype=np.float64)
    HAS_Y = y_col is not None
    q = p + (1 if HAS_Y else 0)

    def term(batch: pa.RecordBatch) -> np.ndarray:
        X = _batch_cols(batch, cols)
        n = X.shape[0]
        w = (
            np.asarray(
                batch.column(batch.schema.get_field_index(weight_col)).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            if weight_col
            else np.ones(n)
        )
        fin = np.isfinite(X)
        Xq = np.where(fin, _quantize(np.where(fin, X, 0.0), quantize_f32), mq[None, :])
        Z = (Xq - mu[None, :]) / sd[None, :]
        if HAS_Y:
            y = np.asarray(
                batch.column(batch.schema.get_field_index(y_col)).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            zy = (_quantize(y, quantize_f32) - y_wmean) / y_wstd
            Z = np.column_stack([Z, zy])
        G = Z.T @ (Z * w[:, None])
        out = np.empty(q * q + 1, dtype=np.float64)
        out[: q * q] = G.ravel()
        out[q * q] = w.sum()
        return out

    acc = arrow_reduce(df, term, q * q + 1)
    G = acc[: q * q].reshape(q, q)
    sw = float(acc[q * q])
    R = G / sw
    R = 0.5 * (R + R.T)
    if clip is not None:
        # gaussian path clips (copula.py:187-189); classic corr-with-last
        # does NOT (loops.py:42-55) — callers choose
        np.clip(R, -clip, clip, out=R)
        np.fill_diagonal(R, 1.0)
    result = {"sw": sw}
    if HAS_Y:
        result["R"] = R[:p, :p].copy()
        result["r_y"] = R[:p, p].copy()
    else:
        result["R"] = R
    return result
