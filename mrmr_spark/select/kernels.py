"""Distributed reduction kernels for the selection layer.

Two tiers, chosen by output shape (SURVEY.md §4.2):

- **O(p) moments** (imputation means, weighted/centered moments, per-class
  ANOVA sums): built-in aggregate expressions — one whole-stage-codegen scan
  computes all p columns' statistics JVM-side, zero Python in the hot path.
- **O(p²) Gram** (the redundancy matrix): a ``mapInArrow`` block reduction —
  per partition ``G += Zᵀ(w⊙Z)`` via NumPy GEMM, then a driver sum:

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
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: accumulator rows carry their source partition id so every downstream
#: merge can run in sorted-pid order — Chan merging (and fp addition) is
#: not associative, and shuffle-fetch arrival order is not deterministic;
#: a fixed merge tree makes results bit-identical run to run.
_ACC_SCHEMA = "pid long, acc binary"
#: partition counts above this get a two-level (tree) combine before collect
TREE_COMBINE_THRESHOLD = 64

#: plan-audit hook (tools/audit_plans.py): when set to a list, every ARROW
#: kernel scan (everything routed through ``_merge_collect``) appends its
#: executed physical plan string after its collect. The selection passes
#: drive their own Spark jobs internally (the caller only sees numpy
#: results), so the PLANS.md audit cannot reach these plans from any
#: returned DataFrame — this is the tap. The JVM-aggregate kernels for
#: narrow frames (impute_mean_pass, centered_moments_pass,
#: class_moments_pass, _gram_jvm) collect directly and are NOT captured —
#: the audit targets the wide/fused Arrow paths, which are the default
#: plans. None (the default) is free.
PLAN_LOG: list[str] | None = None


def _acc_batch(acc: np.ndarray, pid: int | None = None) -> pa.RecordBatch:
    """One (source-partition-id, accumulator-bytes) row."""
    if pid is None:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
    return pa.RecordBatch.from_arrays(
        [pa.array([pid], type=pa.int64()), pa.array([acc.tobytes()])],
        ["pid", "acc"],
    )


def _batch_cols(batch: pa.RecordBatch, cols: list[str]) -> np.ndarray:
    """(n, len(cols)) float64 matrix from an Arrow batch (zero-copy per col
    where possible; nulls -> NaN)."""
    arrs = []
    for c in cols:
        col = batch.column(batch.schema.get_field_index(c))
        arrs.append(np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64))
    return np.column_stack(arrs) if arrs else np.empty((batch.num_rows, 0))


def _merge_collect(reduced: DataFrame, n_parts: int, merge_two) -> np.ndarray | None:
    """Deterministically merge (pid, acc) accumulator rows into one vector.

    Above ``TREE_COMBINE_THRESHOLD`` source partitions, a hash-on-pid
    executor-side pre-merge keeps the driver collect flat (without it the
    driver collects one accumulator per partition — e.g. ~13 KB × 100k
    partitions ≈ 1.3 GB on a 1000-executor job). Every merge — inside the
    combine tasks and on the driver — runs in sorted source-pid order, and
    each combine task reports its min pid, so the whole merge tree is a
    fixed function of the data: bit-identical results run to run even
    though Chan merging is not floating-point associative.

    ``merge_two(a, b) -> acc`` must implement the kernel's exact merge
    (Chan for centered blocks, plain sum for raw sums). Returns None when
    the input was empty.
    """
    if n_parts > TREE_COMBINE_THRESHOLD:

        def combine(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            pairs: list[tuple[int, np.ndarray]] = []
            for b in batches:
                pids = b.column(0).to_pylist()
                col = b.column(1)
                for i in range(b.num_rows):
                    pairs.append(
                        (int(pids[i]), np.frombuffer(col[i].as_py(), dtype=np.float64))
                    )
            if pairs:
                pairs.sort(key=lambda t: t[0])
                acc = pairs[0][1].copy()
                for _, cur in pairs[1:]:
                    acc = merge_two(acc, cur)
                yield _acc_batch(acc, pid=pairs[0][0])

        reduced = reduced.repartition(8, F.col("pid")).mapInArrow(combine, _ACC_SCHEMA)

    total = None
    for row in sorted(reduced.collect(), key=lambda r: r.pid):
        cur = np.frombuffer(row.acc, dtype=np.float64)
        total = cur.copy() if total is None else merge_two(total, cur)
    if PLAN_LOG is not None:
        PLAN_LOG.append(reduced._jdf.queryExecution().executedPlan().toString())
    return total


def arrow_reduce(
    df: DataFrame,
    partition_term: Callable[[pa.RecordBatch], np.ndarray],
    out_len: int,
) -> np.ndarray:
    """Sum ``partition_term(batch)`` over all batches of ``df``.

    ``partition_term`` must return a 1-D float64 array of length ``out_len``
    (flatten matrices). Returns the global float64 sum (summed in sorted
    source-partition order — deterministic run to run).
    """

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = np.zeros(out_len, dtype=np.float64)
        nonempty = False
        for b in batches:
            if b.num_rows:
                acc += partition_term(b)
                nonempty = True
        if nonempty:
            yield _acc_batch(acc)

    total = _merge_collect(
        df.mapInArrow(mapper, _ACC_SCHEMA),
        df.rdd.getNumPartitions(),
        lambda a, b: a + b,
    )
    return total if total is not None else np.zeros(out_len, dtype=np.float64)


def _quantize(X: np.ndarray, quantize_f32: bool) -> np.ndarray:
    return X.astype(np.float32).astype(np.float64) if quantize_f32 else X


# ---------------------------------------------------------------------------
# Single-pass fused statistics (no persist): indicator-augmented Gram
# ---------------------------------------------------------------------------

def _chan_merge(sw_a, mu_a, C_a, sw_b, mu_b, C_b):
    """Exact pairwise merge of weighted (Σw, mean, centered Gram) triples
    (Chan/Golub/LeVeque parallel-moments update) — the numerically stable
    way to combine per-batch centered statistics."""
    tot = sw_a + sw_b
    if sw_b == 0.0:
        return sw_a, mu_a, C_a
    if sw_a == 0.0:
        return sw_b, mu_b.copy(), C_b.copy()
    d = mu_b - mu_a
    C = C_a + C_b + (sw_a * sw_b / tot) * np.outer(d, d)
    mu = mu_a + (sw_b / tot) * d
    return tot, mu, C


def _class_batch_block(A_: np.ndarray, F_: np.ndarray, wc: np.ndarray, p: int):
    """Per-class centered statistics of one batch's class subset.

    Returns ``(swb, stb)`` with ``stb = [mu_a(p), mu_f(p), Caa(p), Caf(p),
    Cff(p)]`` — weighted means and centered second moments of the
    indicator pair ``(a = f⊙x_q, f)`` within the class. Centering per
    batch (instead of raw Σw·a² sums cancelled on the driver) avoids the
    catastrophic cancellation that raw sums hit for |mean|/std ≳ 1e3."""
    swb = float(wc.sum())
    if swb <= 0.0:
        return 0.0, None
    mu_a = (wc @ A_) / swb
    mu_f = (wc @ F_) / swb
    Ac = A_ - mu_a[None, :]
    Fc = F_ - mu_f[None, :]
    wAc = Ac * wc[:, None]
    stb = np.concatenate([
        mu_a, mu_f,
        (wAc * Ac).sum(axis=0),
        (wAc * Fc).sum(axis=0),
        (Fc * Fc * wc[:, None]).sum(axis=0),
    ])
    return swb, stb


def _class_block_merge(cls: np.ndarray, c: int, swb: float, stb: np.ndarray, p: int):
    """In-place Chan merge of one class row ``cls[c] = [sw, mu_a(p),
    mu_f(p), Caa(p), Caf(p), Cff(p)]`` with a batch block."""
    sw_a = float(cls[c, 0])
    if swb <= 0.0:
        return
    if sw_a == 0.0:
        cls[c, 0] = swb
        cls[c, 1:] = stb
        return
    tot = sw_a + swb
    k = sw_a * swb / tot
    mu = cls[c, 1 : 1 + 2 * p]
    d = stb[: 2 * p] - mu
    da, df_ = d[:p], d[p:]
    cls[c, 1 : 1 + 2 * p] = mu + (swb / tot) * d
    o = 1 + 2 * p
    cls[c, o : o + p] += stb[2 * p : 3 * p] + k * da * da
    cls[c, o + p : o + 2 * p] += stb[3 * p : 4 * p] + k * da * df_
    cls[c, o + 2 * p :] += stb[4 * p : 5 * p] + k * df_ * df_
    cls[c, 0] = tot


def _class_blocks_merge(blk_a: np.ndarray, blk_b: np.ndarray, p: int) -> np.ndarray:
    """Pairwise Chan merge of two per-class centered block matrices
    (C × (1+5p)) — the cross-accumulator twin of ``_class_block_merge``."""
    out = blk_a.copy()
    for c in range(blk_a.shape[0]):
        if blk_b[c, 0] > 0.0:
            _class_block_merge(out, c, float(blk_b[c, 0]), blk_b[c, 1:], p)
    return out


def _class_anova_moments(
    cls: np.ndarray, m: np.ndarray, col_wmeans: np.ndarray, p: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver algebra: per-class centered (a, f) blocks → the ANOVA moments
    ``B[c,j] = Σ_{i∈c} w·(x_imp − x̄_j)`` and ``A[c,j] = Σ_{i∈c}
    w·(x_imp − x̄_j)²``. Because ``x_imp = a − m·f + m`` is affine, its
    within-class centered SS is ``Caa − 2m·Caf + m²·Cff`` and its class
    mean is ``mu_a + m(1 − mu_f)``; the shift to the global mean adds
    ``sw_c·d²`` (exact, no cancellation of large raw sums)."""
    class_w = cls[:, 0].copy()
    mu_a_c = cls[:, 1 : 1 + p]
    mu_f_c = cls[:, 1 + p : 1 + 2 * p]
    o = 1 + 2 * p
    Caa_c = cls[:, o : o + p]
    Caf_c = cls[:, o + p : o + 2 * p]
    Cff_c = cls[:, o + 2 * p :]
    mu_imp_c = mu_a_c + m[None, :] * (1.0 - mu_f_c)
    C_imp_c = Caa_c - 2.0 * m[None, :] * Caf_c + (m * m)[None, :] * Cff_c
    d = mu_imp_c - col_wmeans[None, :]
    B = class_w[:, None] * d
    A = C_imp_c + class_w[:, None] * d * d
    return class_w, B, A


def fused_singlepass_stats(
    df: DataFrame,
    feature_cols: list[str],
    y_col: str,
    weight_col: str | None = None,
    quantize_f32: bool = True,
) -> dict:
    """ONE ``mapInArrow`` scan — no persist, no second pass — computing
    everything the two-pass (means scan + centered-Gram scan) path computes,
    bit-comparable at float64 rounding:

    Imputation needs global means, which classically forces pass 1 before
    the centered Gram of pass 2. Instead this kernel accumulates the
    centered Gram of the INDICATOR-AUGMENTED vector
    ``V = [f⊙x_q, f, y_q]`` (f = finite mask) with per-batch centering and
    Chan merging (stable), plus exact raw-f64 finite sums. Because the
    imputed column is affine in the augmented variables —
    ``x_imp = (f⊙x) − m⊙f + m`` for impute means m — the centered imputed
    Gram, weighted means, relevance moments and y-covariances all follow
    from driver-side algebra:

        C_imp[i,j] = C[a_i,a_j] − m_j·C[a_i,f_j] − m_i·C[a_j,f_i]
                     + m_i·m_j·C[f_i,f_j]

    At 100 TB this halves the job's memory traffic vs persist+2 scans (the
    in-memory columnar encode is the single most expensive phase of the
    e2e pipeline and is entirely skipped) and leaves the upstream
    window/shuffle stage as the only exchange. Cost: one Arrow transfer of
    the (p+1)-column matrix into Python workers and a (2p+1)-wide GEMM per
    batch. Communication: one (2p+1)²+O(p) float64 accumulator per
    partition.
    """
    p = len(feature_cols)
    q = 2 * p + 1
    cols = list(feature_cols)
    wname = weight_col
    yname = y_col

    proj = [F.col(c).cast("double").alias(c) for c in cols]
    proj.append(F.col(yname).cast("double").alias("_y_"))
    if wname:
        proj.append(F.col(wname).cast("double").alias("_w_"))
    dfp = df.select(*proj)

    # accumulator layout: [sw, mu(q), C(q²), rawsum(p), nfin(p), ybad, n]
    out_len = 1 + q + q * q + 2 * p + 2

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sw = 0.0
        mu = np.zeros(q)
        C = np.zeros((q, q))
        rawsum = np.zeros(p)
        nfin = np.zeros(p)
        ybad = 0.0
        n = 0.0
        nonempty = False
        for b in batches:
            if not b.num_rows:
                continue
            nonempty = True
            X = _batch_cols(b, cols)
            y = np.asarray(
                b.column(b.schema.get_field_index("_y_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            w = (
                np.asarray(
                    b.column(b.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                )
                if wname
                else np.ones(X.shape[0])
            )
            swb, mub, Cb, rs, nf, yb, nn = _fused_batch_block(X, y, w, p, quantize_f32)
            rawsum += rs
            nfin += nf
            ybad += yb
            n += nn
            if swb <= 0.0:
                continue
            sw, mu, C = _chan_merge(sw, mu, C, swb, mub, Cb)
        if nonempty:
            acc = np.concatenate([[sw], mu, C.ravel(), rawsum, nfin, [ybad, n]])
            yield _acc_batch(acc)

    def merge_two(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return _fused_slot_merge(a, b, q)

    total = _merge_collect(
        dfp.mapInArrow(mapper, _ACC_SCHEMA), df.rdd.getNumPartitions(), merge_two
    )
    if total is None:
        total = np.zeros(out_len)
    return _finish_fused_acc(total, p, quantize_f32)


def _fused_batch_block(X, y, w, p: int, quantize_f32: bool):
    """One batch's contribution to the indicator-augmented accumulator:
    ``(swb, mub, Cb, rawsum, nfin, ybad, n)`` for V = [f⊙x_q, f, y_q].
    ``ybad`` counts non-finite y rows so callers can enforce the
    reference's y-validation without a separate scan."""
    q = 2 * p + 1
    fin = np.isfinite(X)
    Xz = np.where(fin, X, 0.0)
    rawsum = Xz.sum(axis=0)
    nfin = fin.sum(axis=0).astype(np.float64)
    n = float(X.shape[0])
    ybad = float((~np.isfinite(y)).sum())
    V = np.empty((X.shape[0], q))
    # Xz is already zero where non-finite and _quantize(0.0) == 0.0, so no
    # mask multiply is needed here (this runs in the hottest scan)
    V[:, :p] = _quantize(Xz, quantize_f32)
    V[:, p : 2 * p] = fin
    V[:, 2 * p] = _quantize(y, quantize_f32)
    swb = float(w.sum())
    if swb <= 0.0:
        return 0.0, None, None, rawsum, nfin, ybad, n
    mub = (w @ V) / swb
    Vc = V - mub[None, :]
    Cb = Vc.T @ (Vc * w[:, None])
    return swb, mub, Cb, rawsum, nfin, ybad, n


def _fused_slot_merge(a: np.ndarray, b: np.ndarray, q: int) -> np.ndarray:
    """Merge two fused accumulators [sw, mu(q), C(q²), raw-sums...]: Chan
    for the centered triple, plain sum for the raw tail."""
    sw_m, mu_m, C_m = _chan_merge(
        float(a[0]), a[1 : 1 + q], a[1 + q : 1 + q + q * q].reshape(q, q),
        float(b[0]), b[1 : 1 + q], b[1 + q : 1 + q + q * q].reshape(q, q),
    )
    return np.concatenate(
        [[sw_m], np.asarray(mu_m).ravel(), np.asarray(C_m).ravel(),
         a[1 + q + q * q :] + b[1 + q + q * q :]]
    )


def _finish_fused_acc(total: np.ndarray, p: int, quantize_f32: bool) -> dict:
    """Driver algebra from a fused accumulator to the imputed-moment stats
    dict (see ``fused_singlepass_stats`` for the derivation)."""
    q = 2 * p + 1
    sw = float(total[0])
    mu = total[1 : 1 + q]
    C = total[1 + q : 1 + q + q * q].reshape(q, q)
    rawsum = total[1 + q + q * q : 1 + q + q * q + p]
    nfin = total[1 + q + q * q + p : 1 + q + q * q + 2 * p]
    y_nonfinite = float(total[-2])
    n = float(total[-1])

    impute_means = _quantize(
        np.where(nfin > 0, rawsum / np.maximum(nfin, 1), 0.0), quantize_f32
    )
    m = impute_means
    mu_a, mu_f, y_wmean = mu[:p], mu[p : 2 * p], float(mu[2 * p])
    Caa = C[:p, :p]
    Caf = C[:p, p : 2 * p]
    Cff = C[p : 2 * p, p : 2 * p]
    Cay = C[:p, 2 * p]
    Cfy = C[p : 2 * p, 2 * p]
    y_ss = float(C[2 * p, 2 * p])

    afm = Caf * m[None, :]
    C_imp = Caa - afm - afm.T + np.outer(m, m) * Cff
    c_y = Cay - m * Cfy
    col_wmeans = mu_a + m * (1.0 - mu_f)
    return {
        # np scalar: an empty frame (sw=0) must degrade to nan statistics
        # exactly like the two-pass path (Python float 0.0 would raise
        # ZeroDivisionError in the shared driver tail instead)
        "sw": np.float64(sw),
        "n": n,
        "y_nonfinite": y_nonfinite,
        "impute_means": impute_means,
        "col_wmeans": col_wmeans,
        "y_wmean": y_wmean,
        "C": C_imp,
        "c_y": c_y,
        "c_yy": y_ss,
    }


def fused_foldwise_stats(
    df: DataFrame,
    feature_cols: list[str],
    y_col: str,
    fold_col: str,
    n_folds: int,
    weight_col: str | None = None,
    quantize_f32: bool = False,
) -> np.ndarray:
    """ONE ``mapInArrow`` scan of the fold-tagged frame producing an
    independent fused accumulator PER FOLD (shape ``(n_folds, slot)``).

    This is the shared-scan backbone of auto-k group CV: the per-split
    (moments + Gram) scans collapse into this single pass, and any
    leave-one-fold-out train split's full imputed-moment statistics follow
    driver-side by Chan-merging the other folds' slots
    (``finish_loo_stats``) — the augmented-Gram algebra makes the
    per-split imputation/standardization exact even though every fold was
    accumulated blind to which split it will serve. Communication:
    ``n_folds`` fused accumulators per partition (n_folds × (2p+1)²
    doubles — bounded by the same O(p²) budget as the fused kernels,
    ×n_splits).
    """
    p = len(feature_cols)
    q = 2 * p + 1
    cols = list(feature_cols)
    slot = 1 + q + q * q + 2 * p + 2

    proj = [F.col(c).cast("double").alias(c) for c in cols]
    proj.append(F.col(y_col).cast("double").alias("_y_"))
    proj.append(F.col(fold_col).cast("long").alias("_f_"))
    if weight_col:
        proj.append(F.col(weight_col).cast("double").alias("_w_"))
    dfp = df.select(*proj)

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = np.zeros((n_folds, slot))
        nonempty = False
        for b in batches:
            if not b.num_rows:
                continue
            nonempty = True
            X = _batch_cols(b, cols)
            y = np.asarray(
                b.column(b.schema.get_field_index("_y_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            # a null fold would arrive as NaN and wrap to INT64_MIN below —
            # guard the range instead of indexing blind (negative codes
            # would otherwise silently merge into the LAST fold)
            fold = np.asarray(
                b.column(b.schema.get_field_index("_f_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            w = (
                np.asarray(
                    b.column(b.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                )
                if weight_col
                else np.ones(X.shape[0])
            )
            valid = np.isfinite(fold) & (fold >= 0) & (fold < n_folds)
            fold_i = np.where(valid, fold, 0).astype(np.int64)
            for f in np.unique(fold_i[valid]):
                sel = valid & (fold_i == f)
                swb, mub, Cb, rs, nf, yb, nn = _fused_batch_block(
                    X[sel], y[sel], w[sel], p, quantize_f32
                )
                a = acc[f]
                a[1 + q + q * q :] += np.concatenate([rs, nf, [yb, nn]])
                if swb <= 0.0:
                    continue
                sw_m, mu_m, C_m = _chan_merge(
                    float(a[0]), a[1 : 1 + q],
                    a[1 + q : 1 + q + q * q].reshape(q, q),
                    swb, mub, Cb,
                )
                a[0] = sw_m
                a[1 : 1 + q] = np.asarray(mu_m).ravel()
                a[1 + q : 1 + q + q * q] = np.asarray(C_m).ravel()
        if nonempty:
            yield _acc_batch(acc.ravel())

    def merge_two(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        A = a.reshape(n_folds, slot)
        B = b.reshape(n_folds, slot)
        return np.stack(
            [_fused_slot_merge(A[f], B[f], q) for f in range(n_folds)]
        ).ravel()

    total = _merge_collect(
        dfp.mapInArrow(mapper, _ACC_SCHEMA), df.rdd.getNumPartitions(), merge_two
    )
    if total is None:
        total = np.zeros(n_folds * slot)
    return total.reshape(n_folds, slot)


def finish_loo_stats(
    fold_accs: np.ndarray, val_fold: int, p: int, quantize_f32: bool = False
) -> dict:
    """Leave-one-fold-out train statistics: Chan-merge every fold slot
    except ``val_fold`` (sorted fold order — deterministic) and finish with
    the fused driver algebra."""
    q = 2 * p + 1
    total = None
    for f in range(fold_accs.shape[0]):
        if f == val_fold:
            continue
        total = (
            fold_accs[f].copy()
            if total is None
            else _fused_slot_merge(total, fold_accs[f], q)
        )
    if total is None:
        total = np.zeros(fold_accs.shape[1])
    return _finish_fused_acc(total, p, quantize_f32)


def finish_fold_stats(
    fold_accs: np.ndarray, fold: int, p: int, impute_means: np.ndarray
) -> dict:
    """ONE fold's imputed-moment statistics under a CALLER-SUPPLIED impute
    vector (the train split's means, not the fold's own) — the val-side
    counterpart of ``finish_loo_stats``. Same augmented-Gram algebra as
    ``_finish_fused_acc``: with a = f⊙x and indicator f, the imputed column
    is a + m·(1−f), so its (sw-scaled, fold-mean-centered) covariance is
    Caa − Caf·m' − m·Caf' + (m m')⊙Cff, its y-covariance Cay − m⊙Cfy, and
    its weighted mean mu_a + m·(1−mu_f). Lets ridge validation losses be
    evaluated driver-side from the ONE fused stats scan (see
    autok._algebraic_regression_losses) instead of a second data pass."""
    q = 2 * p + 1
    total = fold_accs[fold]
    sw = float(total[0])
    mu = total[1 : 1 + q]
    C = total[1 + q : 1 + q + q * q].reshape(q, q)
    m = np.asarray(impute_means, dtype=np.float64)
    mu_a, mu_f, y_wmean = mu[:p], mu[p : 2 * p], float(mu[2 * p])
    Caa = C[:p, :p]
    Caf = C[:p, p : 2 * p]
    Cff = C[p : 2 * p, p : 2 * p]
    Cay = C[:p, 2 * p]
    Cfy = C[p : 2 * p, 2 * p]
    y_ss = float(C[2 * p, 2 * p])
    afm = Caf * m[None, :]
    return {
        "sw": np.float64(sw),
        "C": Caa - afm - afm.T + np.outer(m, m) * Cff,
        "c_y": Cay - m * Cfy,
        "c_yy": y_ss,
        "col_wmeans": mu_a + m * (1.0 - mu_f),
        "y_wmean": y_wmean,
    }


def fused_singlepass_class_stats(
    df: DataFrame,
    feature_cols: list[str],
    ycode_col: str,
    n_classes: int,
    weight_col: str | None = None,
    quantize_f32: bool = True,
) -> dict:
    """Classification twin of ``fused_singlepass_stats``: ONE ``mapInArrow``
    scan — no persist, no separate means/class/Gram passes — computing
    everything the weighted-ANOVA relevance + |corr| redundancy pipeline
    needs:

    - the centered Gram of the indicator-augmented vector ``V = [f⊙x_q, f]``
      (per-batch centering + Chan merge) → imputed correlation matrix via
      the same affine algebra as the regression kernel;
    - per-class CENTERED blocks ``(sw_c, mu_a, mu_f, Caa, Caf, Cff)``,
      centered per batch and Chan-merged like the Gram block → exact
      per-class imputed ANOVA moments on the driver
      (``_class_anova_moments``). Raw Σw·a² sums cancelled against the
      global mean would lose ~all precision at |mean|/std ≳ 1e3 — the
      round-3 advice finding; the centered scheme is stable at any scale;
    - exact raw-f64 finite sums for the imputation means.

    Communication: one ``(2p)² + C·(5p+1) + O(p)`` float64 accumulator per
    partition. Rows with a null/NaN class code are skipped (factorization
    rejects missing labels upstream, so this only guards malformed input).
    """
    p = len(feature_cols)
    q = 2 * p
    C_CLS = int(n_classes)
    cols = list(feature_cols)
    wname = weight_col

    proj = [F.col(c).cast("double").alias(c) for c in cols]
    proj.append(F.col(ycode_col).cast("double").alias("_yc_"))
    if wname:
        proj.append(F.col(wname).cast("double").alias("_w_"))
    dfp = df.select(*proj)

    # accumulator: [sw, mu(q), G(q²), rawsum(p), nfin(p), n,
    #               per-class (sw_c, mu_a(p), mu_f(p), Caa(p), Caf(p), Cff(p)) × C]
    base = 1 + q + q * q + 2 * p + 1
    cls_block = 1 + 5 * p
    out_len = base + C_CLS * cls_block

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sw = 0.0
        mu = np.zeros(q)
        G = np.zeros((q, q))
        rawsum = np.zeros(p)
        nfin = np.zeros(p)
        n = 0.0
        cls = np.zeros((C_CLS, cls_block))
        nonempty = False
        for b in batches:
            if not b.num_rows:
                continue
            nonempty = True
            X = _batch_cols(b, cols)
            yc = np.asarray(
                b.column(b.schema.get_field_index("_yc_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            w = (
                np.asarray(
                    b.column(b.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                )
                if wname
                else np.ones(X.shape[0])
            )
            fin = np.isfinite(X)
            Xz = np.where(fin, X, 0.0)
            rawsum += Xz.sum(axis=0)
            nfin += fin.sum(axis=0)
            n += X.shape[0]
            # Xz already zero where non-finite; no mask multiply needed
            Xq = _quantize(Xz, quantize_f32)
            V = np.concatenate([Xq, fin.astype(np.float64)], axis=1)
            swb = float(w.sum())
            if swb > 0.0:
                mub = (w @ V) / swb
                Vc = V - mub[None, :]
                Gb = Vc.T @ (Vc * w[:, None])
                sw, mu, G = _chan_merge(sw, mu, G, swb, mub, Gb)
            ok = np.isfinite(yc)
            yi = yc[ok].astype(np.int64)
            Xo, fo, wo = Xq[ok], fin[ok].astype(np.float64), w[ok]
            for c in np.unique(yi):
                if not (0 <= c < C_CLS):  # malformed code: skip, don't crash
                    continue
                m_ = yi == c
                swb_c, stb = _class_batch_block(Xo[m_], fo[m_], wo[m_], p)
                _class_block_merge(cls, c, swb_c, stb, p)
        if nonempty:
            acc = np.concatenate(
                [[sw], mu, G.ravel(), rawsum, nfin, [n], cls.ravel()]
            )
            yield _acc_batch(acc)

    def merge_two(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        sw_m, mu_m, G_m = _chan_merge(
            float(a[0]), a[1 : 1 + q], a[1 + q : 1 + q + q * q].reshape(q, q),
            float(b[0]), b[1 : 1 + q], b[1 + q : 1 + q + q * q].reshape(q, q),
        )
        # raw sums, finite counts and n are plain sums; the per-class
        # centered blocks Chan-merge like the Gram block
        cls_m = _class_blocks_merge(
            a[base:].reshape(C_CLS, cls_block),
            b[base:].reshape(C_CLS, cls_block),
            p,
        )
        return np.concatenate(
            [[sw_m], np.asarray(mu_m).ravel(), np.asarray(G_m).ravel(),
             a[1 + q + q * q : base] + b[1 + q + q * q : base], cls_m.ravel()]
        )

    total = _merge_collect(
        dfp.mapInArrow(mapper, _ACC_SCHEMA), df.rdd.getNumPartitions(), merge_two
    )
    if total is None:
        total = np.zeros(out_len)
    sw = float(total[0])
    mu = total[1 : 1 + q]
    G = total[1 + q : 1 + q + q * q].reshape(q, q)
    rawsum = total[1 + q + q * q : 1 + q + q * q + p]
    nfin = total[1 + q + q * q + p : 1 + q + q * q + 2 * p]
    n = float(total[base - 1])
    cls = total[base:].reshape(C_CLS, cls_block)

    impute_means = _quantize(
        np.where(nfin > 0, rawsum / np.maximum(nfin, 1), 0.0), quantize_f32
    )
    m = impute_means
    mu_a, mu_f = mu[:p], mu[p:]
    Caa = G[:p, :p]
    Caf = G[:p, p:]
    Cff = G[p:, p:]
    afm = Caf * m[None, :]
    C_imp = Caa - afm - afm.T + np.outer(m, m) * Cff
    col_wmeans = mu_a + m * (1.0 - mu_f)

    # centered at the global weighted mean, like class_moments_pass —
    # from the per-class centered blocks (no raw-sum cancellation)
    class_w, B, A = _class_anova_moments(cls, m, col_wmeans, p)
    return {
        "sw": np.float64(sw),
        "n": n,
        "impute_means": impute_means,
        "col_wmeans": col_wmeans,
        "C": C_imp,
        "class_w": class_w,
        "B": B,
        "A": A,
    }


#: width above which the per-column moment statistics run as ONE Arrow
#: scan instead of the 6p+3 / 3p+1 JVM aggregate selects. Same cost class
#: as the Gram crossover: Catalyst planning + codegen of O(p) deep
#: expression trees dominates — measured 5.7 s at p=50, 11.1 s at p=100,
#: 24 s (with janino 64KB-method overflow → interpreted fallback) at
#: p=200 for the JVM 2-pass, vs a flat sub-second Arrow pass.
MOMENTS_JVM_MAX_P = 24


def _colwise_chan_merge(sw_a, st_a, sw_b, st_b, p):
    """Vectorized per-column Chan merge for the O(p) moments kernel.

    ``st`` packs, for p independent (a=f⊙x_q, f, y) triples sharing one
    weight column: mu (2p+1) then the tracked centered products
    Caa, Caf, Cff, Cay, Cfy (p each) and Cyy (1). Only within-column and
    column↔y covariances are tracked — O(p), never the p×p Gram.
    """
    if sw_b == 0.0:
        return sw_a, st_a
    if sw_a == 0.0:
        return sw_b, st_b.copy()
    tot = sw_a + sw_b
    k = sw_a * sw_b / tot
    mu_a, mu_b = st_a[: 2 * p + 1], st_b[: 2 * p + 1]
    d = mu_b - mu_a
    da, df_, dy = d[:p], d[p : 2 * p], d[2 * p]
    out = np.empty_like(st_a)
    out[: 2 * p + 1] = mu_a + (sw_b / tot) * d
    o = 2 * p + 1
    prods = (da * da, da * df_, df_ * df_, da * dy, df_ * dy)
    for blk, pr in enumerate(prods):
        s = o + blk * p
        out[s : s + p] = st_a[s : s + p] + st_b[s : s + p] + k * pr
    out[o + 5 * p] = st_a[o + 5 * p] + st_b[o + 5 * p] + k * dy * dy
    return tot, out


def moments_singlepass_pass(
    df: DataFrame,
    feature_cols: list[str],
    y_col: str | None,
    weight_col: str | None,
    quantize_f32: bool = True,
) -> dict:
    """ONE Arrow scan replacing impute_mean_pass + centered_moments_pass
    for wide frames: per-column weighted moments of the indicator pair
    ``(f⊙x_q, f)`` and y, centered per batch and Chan-merged (stable), plus
    exact raw-f64 finite sums. O(p) accumulator — never the p×p Gram.
    Driver algebra (the same affine identities as the fused Gram kernels)
    yields impute means, weighted means, x_ss, xy_cov, y_ss and the
    unweighted centered sumsq used for constant-column pruning."""
    p = len(feature_cols)
    cols = list(feature_cols)
    HAS_Y = y_col is not None
    wname = weight_col

    proj = [F.col(c).cast("double").alias(c) for c in cols]
    if HAS_Y:
        proj.append(F.col(y_col).cast("double").alias("_y_"))
    if wname:
        proj.append(F.col(wname).cast("double").alias("_w_"))
    dfp = df.select(*proj)

    st_len = (2 * p + 1) + 5 * p + 1
    # acc: [sw, st(st_len), rawsum(p), nfin(p), sumq(p), sumsqq(p), ybad, n]
    out_len = 1 + st_len + 4 * p + 2

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sw = 0.0
        st = np.zeros(st_len)
        rawsum = np.zeros(p)
        nfin = np.zeros(p)
        sumq = np.zeros(p)
        sumsqq = np.zeros(p)
        ybad = 0.0
        n = 0.0
        nonempty = False
        for b in batches:
            if not b.num_rows:
                continue
            nonempty = True
            X = _batch_cols(b, cols)
            y = (
                np.asarray(
                    b.column(b.schema.get_field_index("_y_")).to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                )
                if HAS_Y
                else np.zeros(X.shape[0])
            )
            w = (
                np.asarray(
                    b.column(b.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                )
                if wname
                else np.ones(X.shape[0])
            )
            fin = np.isfinite(X)
            Xz = np.where(fin, X, 0.0)
            rawsum += Xz.sum(axis=0)
            nfin += fin.sum(axis=0)
            # Xz already zero where non-finite; no mask multiply needed
            Aq = _quantize(Xz, quantize_f32)
            sumq += Aq.sum(axis=0)
            sumsqq += (Aq * Aq).sum(axis=0)
            if HAS_Y:
                ybad += float((~np.isfinite(y)).sum())
            n += X.shape[0]
            swb = float(w.sum())
            if swb <= 0.0:
                continue
            yq = _quantize(y, quantize_f32)
            Fm = fin.astype(np.float64)
            mu_a = (w @ Aq) / swb
            mu_f = (w @ Fm) / swb
            mu_y = float(w @ yq) / swb
            Ac = Aq - mu_a[None, :]
            Fc = Fm - mu_f[None, :]
            yc = yq - mu_y
            wA = Ac * w[:, None]
            stb = np.concatenate([
                mu_a, mu_f, [mu_y],
                (wA * Ac).sum(axis=0),
                (wA * Fc).sum(axis=0),
                (Fc * Fc * w[:, None]).sum(axis=0),
                wA.T @ yc,
                (Fc * w[:, None]).T @ yc,
                [float(w @ (yc * yc))],
            ])
            sw, st = _colwise_chan_merge(sw, st, swb, stb, p)
        if nonempty:
            acc = np.concatenate([[sw], st, rawsum, nfin, sumq, sumsqq, [ybad, n]])
            yield _acc_batch(acc)

    def merge_two(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        sw_m, st_m = _colwise_chan_merge(
            float(a[0]), a[1 : 1 + st_len], float(b[0]), b[1 : 1 + st_len], p
        )
        return np.concatenate([[sw_m], st_m, a[1 + st_len :] + b[1 + st_len :]])

    total = _merge_collect(
        dfp.mapInArrow(mapper, _ACC_SCHEMA), df.rdd.getNumPartitions(), merge_two
    )
    if total is None:
        total = np.zeros(out_len)

    sw = float(total[0])
    st = total[1 : 1 + st_len]
    tail = total[1 + st_len :]
    rawsum, nfin = tail[:p], tail[p : 2 * p]
    sumq, sumsqq = tail[2 * p : 3 * p], tail[3 * p : 4 * p]
    y_nonfinite = float(tail[-2])
    n = float(tail[-1])

    mu_a, mu_f, mu_y = st[:p], st[p : 2 * p], float(st[2 * p])
    o = 2 * p + 1
    Caa = st[o : o + p]
    Caf = st[o + p : o + 2 * p]
    Cff = st[o + 2 * p : o + 3 * p]
    Cay = st[o + 3 * p : o + 4 * p]
    Cfy = st[o + 4 * p : o + 5 * p]
    Cyy = float(st[o + 5 * p])

    impute_means = _quantize(
        np.where(nfin > 0, rawsum / np.maximum(nfin, 1), 0.0), quantize_f32
    )
    m = impute_means
    # affine identities: x_imp = a + m(1−f) ⇒ shifts vanish in covariances
    x_ss = Caa - 2.0 * m * Caf + m * m * Cff
    xy_cov = Cay - m * Cfy
    col_wmeans = mu_a + m * (1.0 - mu_f)
    # unweighted centered sumsq around the impute mean (constant pruning):
    # non-finite entries contribute exactly 0 (imputed to m)
    x_ss_unw = sumsqq - 2.0 * m * sumq + m * m * nfin
    return {
        "impute_means": impute_means,
        "col_wmeans": col_wmeans,
        "sw": np.float64(sw),
        "n": n,
        "wy": mu_y * sw,
        "x_ss": x_ss,
        "xy_cov": xy_cov,
        "x_ss_unw": np.maximum(x_ss_unw, 0.0),
        "y_ss": Cyy,
        "y_nonfinite": y_nonfinite,
    }


# ---------------------------------------------------------------------------
# Pass 1: finite-value means (imputation) + weighted means — pure JVM aggs
# ---------------------------------------------------------------------------

def _fin(col):
    return ~F.isnull(col) & ~F.isnan(col) & (F.abs(col) != float("inf"))


def _q32(col, quantize_f32: bool):
    return col.cast("float").cast("double") if quantize_f32 else col


def impute_mean_pass(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    y_col: str | None,
    quantize_f32: bool = True,
) -> dict:
    """One whole-stage-codegen scan -> everything needed to impute and
    weighted-center: per-column finite counts/sums (raw f64, matching the
    reference's ``np.nanmean`` before the f32 cast), weighted sums of the
    f32-quantized finite values, non-finite weight mass, and globals.

    Expressed as built-in aggregate expressions (4p + 4 aggs in one
    ``select``) — per-column moments stay entirely JVM-side; Python is
    reserved for the O(p²) Gram kernel (SURVEY.md §4.2 'column-parallel
    loops → per-column aggregate expressions')."""
    p = len(feature_cols)
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    aggs = []
    for c in feature_cols:
        x = F.col(c).cast("double")
        xq = _q32(x, quantize_f32)
        fin = _fin(x)
        zero = F.lit(0.0)
        aggs += [
            F.count(F.when(fin, 1)),                                   # n_fin
            F.sum(F.when(fin, x).otherwise(zero)),                      # sum_fin raw f64
            F.sum(F.when(fin, w * xq).otherwise(zero)),                 # wx quantized
            F.sum(F.when(~fin, w).otherwise(zero)),                     # w_nonfin
        ]
    if y_col is not None:
        yraw = F.col(y_col).cast("double")
        yq = _q32(yraw, quantize_f32)
        aggs += [
            F.sum(w), F.count(F.lit(1)), F.sum(w * yq),
            F.count(F.when(~_fin(yraw), 1)),                            # y_nonfinite
        ]
    else:
        aggs += [F.sum(w), F.count(F.lit(1)), F.sum(F.lit(0.0)),
                 F.sum(F.lit(0))]

    row = df.select(*[a.alias(f"a{i}") for i, a in enumerate(aggs)]).collect()[0]
    vals = np.array([0.0 if v is None else float(v) for v in row], dtype=np.float64)
    per = vals[: 4 * p].reshape(p, 4).T
    n_fin, sum_fin, wx, w_nonfin = per
    sw, n, swy = vals[4 * p], vals[4 * p + 1], vals[4 * p + 2]
    y_nonfinite = vals[4 * p + 3]

    impute_means = np.where(n_fin > 0, sum_fin / np.maximum(n_fin, 1), 0.0)
    m_q = _quantize(impute_means, quantize_f32)
    wx_imputed = wx + w_nonfin * m_q
    return {
        "impute_means": m_q,
        "n_fin": n_fin,
        "w_nonfin": w_nonfin,
        "sw": sw,
        "n": n,
        "wy": swy,
        "y_nonfinite": y_nonfinite,
        "col_wmeans": wx_imputed / sw,
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
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    HAS_Y = y_col is not None
    yc = None
    if HAS_Y:
        yc = _q32(F.col(y_col).cast("double"), quantize_f32) - F.lit(float(y_wmean))

    aggs = []
    for j, c in enumerate(feature_cols):
        x = F.col(c).cast("double")
        xi = F.when(_fin(x), _q32(x, quantize_f32)).otherwise(F.lit(float(impute_means[j])))
        xc = xi - F.lit(float(col_wmeans[j]))
        xu = xi - F.lit(float(impute_means[j]))
        aggs += [
            F.sum(w * xc * xc),                                  # x_ss weighted
            F.sum(w * xc * yc) if HAS_Y else F.sum(F.lit(0.0)),  # xy_cov
            F.sum(xu * xu),                                      # unweighted ss
        ]
    aggs.append(F.sum(w * yc * yc) if HAS_Y else F.sum(F.lit(0.0)))

    row = df.select(*[a.alias(f"a{i}") for i, a in enumerate(aggs)]).collect()[0]
    vals = np.array([0.0 if v is None else float(v) for v in row], dtype=np.float64)
    per = vals[: 3 * p].reshape(p, 3).T
    return {
        "x_ss": per[0],
        "xy_cov": per[1],
        "x_ss_unw": per[2],
        "y_ss": float(vals[3 * p]),
    }


def class_moments_singlepass_pass(
    df: DataFrame,
    feature_cols: list[str],
    ycode_col: str,
    n_classes: int,
    weight_col: str | None = None,
    quantize_f32: bool = True,
) -> dict:
    """O(C·p)-accumulator Arrow twin of impute_mean_pass +
    class_moments_pass for wide frames (no Gram): per-class CENTERED
    weighted blocks of the indicator pair ``(f⊙x_q, f)`` (per-batch
    centering + Chan merge — stable at any |mean|/std, unlike the raw
    Σw·a² sums this replaced) plus exact f64 finite sums; the ANOVA
    moments follow from the same affine identities as the fused
    classification kernel (``_class_anova_moments``)."""
    p = len(feature_cols)
    C_CLS = int(n_classes)
    cols = list(feature_cols)
    wname = weight_col

    proj = [F.col(c).cast("double").alias(c) for c in cols]
    proj.append(F.col(ycode_col).cast("double").alias("_yc_"))
    if wname:
        proj.append(F.col(wname).cast("double").alias("_w_"))
    dfp = df.select(*proj)

    cls_block = 1 + 5 * p
    # acc: [rawsum(p), nfin(p), n, per-class centered blocks (C×cls_block)]
    out_len = 2 * p + 1 + C_CLS * cls_block

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rawsum = np.zeros(p)
        nfin = np.zeros(p)
        n = 0.0
        cls = np.zeros((C_CLS, cls_block))
        nonempty = False
        for b in batches:
            if not b.num_rows:
                continue
            nonempty = True
            X = _batch_cols(b, cols)
            yc = np.asarray(
                b.column(b.schema.get_field_index("_yc_")).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            w = (
                np.asarray(
                    b.column(b.schema.get_field_index("_w_")).to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                )
                if wname
                else np.ones(X.shape[0])
            )
            fin = np.isfinite(X)
            Xz = np.where(fin, X, 0.0)
            rawsum += Xz.sum(axis=0)
            nfin += fin.sum(axis=0)
            n += X.shape[0]
            # Xz already zero where non-finite; no mask multiply needed
            Xq = _quantize(Xz, quantize_f32)
            ok = np.isfinite(yc)
            yi = yc[ok].astype(np.int64)
            Xo, fo, wo = Xq[ok], fin[ok].astype(np.float64), w[ok]
            for c in np.unique(yi):
                if not (0 <= c < C_CLS):
                    continue
                m_ = yi == c
                swb_c, stb = _class_batch_block(Xo[m_], fo[m_], wo[m_], p)
                _class_block_merge(cls, c, swb_c, stb, p)
        if nonempty:
            acc = np.concatenate([rawsum, nfin, [n], cls.ravel()])
            yield _acc_batch(acc)

    def merge_two(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        head = a[: 2 * p + 1] + b[: 2 * p + 1]  # raw sums, finite counts, n
        cls_m = _class_blocks_merge(
            a[2 * p + 1 :].reshape(C_CLS, cls_block),
            b[2 * p + 1 :].reshape(C_CLS, cls_block),
            p,
        )
        return np.concatenate([head, cls_m.ravel()])

    total = _merge_collect(
        dfp.mapInArrow(mapper, _ACC_SCHEMA), df.rdd.getNumPartitions(), merge_two
    )
    if total is None:
        total = np.zeros(out_len)

    rawsum, nfin, n = total[:p], total[p : 2 * p], float(total[2 * p])
    cls = total[2 * p + 1 :].reshape(C_CLS, cls_block)
    impute_means = _quantize(
        np.where(nfin > 0, rawsum / np.maximum(nfin, 1), 0.0), quantize_f32
    )
    m = impute_means
    class_w = cls[:, 0]
    sw = float(class_w.sum())
    # global weighted mean of the imputed columns from the class blocks
    mu_imp_c = cls[:, 1 : 1 + p] + m[None, :] * (1.0 - cls[:, 1 + p : 1 + 2 * p])
    col_wmeans = (class_w @ mu_imp_c) / sw if sw > 0 else np.zeros(p)
    class_w, B, A = _class_anova_moments(cls, m, col_wmeans, p)
    return {
        "sw": np.float64(sw),
        "n": n,
        "impute_means": impute_means,
        "col_wmeans": col_wmeans,
        "class_w": class_w,
        "B": B,
        "A": A,
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
    C = int(n_classes)
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    aggs = [F.sum(w).alias("cw")]
    for j, c in enumerate(feature_cols):
        x = F.col(c).cast("double")
        xi = F.when(_fin(x), _q32(x, quantize_f32)).otherwise(F.lit(float(impute_means[j])))
        xc = xi - F.lit(float(col_wmeans[j]))
        aggs += [F.sum(w * xc).alias(f"b{j}"), F.sum(w * xc * xc).alias(f"s{j}")]

    rows = df.groupBy(F.col(ycode_col).cast("int").alias("_yc")).agg(*aggs).collect()
    B = np.zeros((C, p))
    A = np.zeros((C, p))
    class_w = np.zeros(C)
    for r in rows:
        # skip malformed codes (null, negative, >= C) like the Arrow twins —
        # int(None) would raise and a -1 would silently merge into class C-1
        if r["_yc"] is None or not (0 <= int(r["_yc"]) < C):
            continue
        c = int(r["_yc"])
        class_w[c] = float(r["cw"])
        for j in range(p):
            B[c, j] = float(r[f"b{j}"] or 0.0)
            A[c, j] = float(r[f"s{j}"] or 0.0)
    return {"B": B, "A": A, "class_w": class_w}


# ---------------------------------------------------------------------------
# Pass 3: weighted Gram of standardized columns -> correlation matrix
# ---------------------------------------------------------------------------

def centered_gram_pass(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    impute_means: np.ndarray,
    col_wmeans: np.ndarray,
    y_col: str | None = None,
    y_wmean: float = 0.0,
    quantize_f32: bool = True,
) -> dict:
    """ONE scan -> centered weighted Gram C[q,q] (q = p + y) + Σw.

    C_ij = Σ w (x_i − μ_i)(x_j − μ_j); standardization is exact scalar
    algebra on the driver (R_ij = C_ij/(σ_i σ_j)/Σw), so this single pass
    yields relevance moments (diag, y column) AND the redundancy matrix —
    the fused fast path that makes classic mRMR two scans total.
    JVM aggregates for q <= GRAM_JVM_MAX_P, Arrow GEMM beyond.
    """
    ones = np.ones(len(feature_cols))
    return gram_pass(
        df, feature_cols, weight_col, impute_means, col_wmeans, ones,
        y_col=y_col, y_wmean=y_wmean, y_wstd=1.0,
        quantize_f32=quantize_f32, clip=None, normalize=False,
    )


#: below this width the Gram is computed as p(p+1)/2 JVM aggregate
#: expressions in one codegen scan (no Python at all); above it, the Arrow
#: GEMM block reduction wins. Round-3 re-measurement (after worker-BLAS
#: pinning and warm Python worker pools) moved the crossover far below the
#: round-2 estimate of 24: per-call wall at p=20 is 2.4 s JVM vs 0.41 s
#: Arrow even on 500 ROWS (the cost is Catalyst planning + codegen of
#: ~p²/2 deep expression trees, not execution), and at p=10 it is 0.94 vs
#: 0.31. The backends tie around p=3 (0.32 vs 0.27), so the JVM path is
#: kept only for trivial widths where the Python-worker round-trip buys
#: nothing.
GRAM_JVM_MAX_P = 4


def _gram_jvm(
    df, feature_cols, weight_col, impute_means, col_wmeans, col_wstds,
    y_col, y_wmean, y_wstd, quantize_f32,
) -> tuple[np.ndarray, float]:
    p = len(feature_cols)
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    zs = []
    for j, c in enumerate(feature_cols):
        x = F.col(c).cast("double")
        xi = F.when(_fin(x), _q32(x, quantize_f32)).otherwise(F.lit(float(impute_means[j])))
        zs.append((xi - F.lit(float(col_wmeans[j]))) / F.lit(float(col_wstds[j])))
    if y_col is not None:
        yq = _q32(F.col(y_col).cast("double"), quantize_f32)
        zs.append((yq - F.lit(float(y_wmean))) / F.lit(float(y_wstd)))
    q = len(zs)
    aggs = []
    for i in range(q):
        for j in range(i, q):
            aggs.append(F.sum(w * zs[i] * zs[j]))
    aggs.append(F.sum(w))
    row = df.select(*[a.alias(f"g{i}") for i, a in enumerate(aggs)]).collect()[0]
    vals = [0.0 if v is None else float(v) for v in row]
    G = np.zeros((q, q))
    idx = 0
    for i in range(q):
        for j in range(i, q):
            G[i, j] = G[j, i] = vals[idx]
            idx += 1
    return G, float(vals[idx])


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
    normalize: bool = True,
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

    if p <= GRAM_JVM_MAX_P:
        G, sw = _gram_jvm(
            df, cols, weight_col, mq, mu, sd, y_col, y_wmean, y_wstd, quantize_f32
        )
        return _finish_gram(G, sw, p, HAS_Y, clip, normalize)

    # mapInArrow cannot column-prune: project exactly what the kernel reads
    proj = [F.col(c).cast("double").alias(c) for c in cols]
    if weight_col:
        proj.append(F.col(weight_col).cast("double").alias(weight_col))
    if HAS_Y:
        proj.append(F.col(y_col).cast("double").alias(y_col))
    df = df.select(*proj)

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
    return _finish_gram(G, sw, p, HAS_Y, clip, normalize)


def _finish_gram(
    G: np.ndarray, sw: float, p: int, has_y: bool, clip: float | None,
    normalize: bool = True,
) -> dict:
    if not normalize:
        # raw centered Gram: caller standardizes on the driver
        out = {"sw": sw}
        if has_y:
            out["C"] = G[:p, :p].copy()
            out["c_y"] = G[:p, p].copy()
            out["c_yy"] = float(G[p, p])
        else:
            out["C"] = G
        return out
    with np.errstate(invalid="ignore", divide="ignore"):  # sw=0 nan-degrade
        R = G / sw
    R = 0.5 * (R + R.T)
    if clip is not None:
        # gaussian path clips (copula.py:187-189); classic corr-with-last
        # does NOT (loops.py:42-55) — callers choose
        np.clip(R, -clip, clip, out=R)
        np.fill_diagonal(R, 1.0)
    result = {"sw": sw}
    if has_y:
        result["R"] = R[:p, :p].copy()
        result["r_y"] = R[:p, p].copy()
    else:
        result["R"] = R
    return result


def r_vector_pass(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    y_col: str,
    quantize_f32: bool = True,
    clip: float | None = 0.999999,
) -> dict:
    """Job 2 of the cached-selection lifecycle (SURVEY.md §3.2; reference
    cefsplus.py:464-487): the corr-with-target vector ALONE, as one O(p)
    Arrow scan over already-standardized columns (copula Z: mean 0, std 1,
    non-finite impossible by construction but treated as 0 like
    ``gram_pass`` with zero impute means).

    The accumulator is ``[Σ w·z_j·z_y (p), Σ w·z_y², Σw]`` — O(p) doubles
    per partition, never O(p²). This lets ``select_cached`` rank ALL p
    cached features cheaply and reserve the O(m²) Gram (job 3) for the
    top_m ≤ max(5k, 250) candidates, instead of a full p×p Gram whose
    per-partition accumulator would be 200 MB at p = 5,000.
    """
    p = len(feature_cols)
    cols = list(feature_cols)
    proj = [F.col(c).cast("double").alias(c) for c in cols]
    proj.append(F.col(y_col).cast("double").alias(y_col))
    if weight_col:
        proj.append(F.col(weight_col).cast("double").alias(weight_col))
    dfp = df.select(*proj)

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
        Z = np.where(fin, _quantize(np.where(fin, X, 0.0), quantize_f32), 0.0)
        y = np.asarray(
            batch.column(batch.schema.get_field_index(y_col)).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        zy = _quantize(np.where(np.isfinite(y), y, 0.0), quantize_f32)
        wzy = w * zy
        out = np.empty(p + 2, dtype=np.float64)
        out[:p] = wzy @ Z
        out[p] = wzy @ zy
        out[p + 1] = w.sum()
        return out

    acc = arrow_reduce(dfp, term, p + 2)
    sw = float(acc[p + 1])
    with np.errstate(invalid="ignore", divide="ignore"):  # sw=0 nan-degrade
        r = acc[:p] / sw
    if clip is not None:
        np.clip(r, -clip, clip, out=r)
    return {"r_y": r, "sw": sw, "c_yy": float(acc[p])}
