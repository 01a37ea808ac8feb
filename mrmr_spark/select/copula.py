"""Distributed Gaussian-copula (weighted rank-gauss) transform — SURVEY.md D1-D3.

Reference semantics (copula.py:85-117) per column:

  order by value (non-finite excluded, output 0) →
  midrank u_i = (Σ_{j<i} w_j + w_i/2) / Σw, clipped to [1e-6, 1−1e-6] →
  z = ndtri(u) → weighted standardize (mean 0, var 1; var ≤ 1e-12 → std 1)

The Spark formulation: melt to (row_key, col_idx, value, w), then a
**range-partitioned two-phase cumulative weight sum** per column — the
same scan pattern as the KS ECDF (relevance.py): ``repartitionByRange``
on (col, value, row_key) splits every column's sort across tasks, tiny
per-(range, col) weight totals are prefix-summed over range ids and
broadcast back as offsets, and the in-range window partitions by
(range, col), so no column ever funnels through a single task. Tie order
is deterministic via the row key (the reference's unstable argsort makes
ties implementation-defined, so parity fixtures are tie-free — SURVEY.md
§7 hard-point 1). ndtri runs in an Arrow batch; the wide Z row is
re-assembled via groupBy(row_key) + array positioning.

The melted range partitioning is persisted and pinned (count()) before
the offset join: range ids come from ``spark_partition_id`` after a
sampled range shuffle, so both consumers MUST read the same shuffle
output. Callers pass ``pin`` to receive the persisted handle and
unpersist it once the returned frame is materialized.

At 10^12 rows the copula path follows the reference's own scale answer —
it runs on the bounded subsample (default 50k) that ``build_cache`` defines
(copula.py:29) — but the transform itself no longer has a
single-task-per-column stage even at ``subsample=None``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from mrmr_spark.functions.ndtri import ndtri


def _midrank_long(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    row_key: str,
    pin: list | None = None,
) -> DataFrame:
    """Phases 1-2 of the copula transform: the melted frame with the
    weighted midrank ``_u`` attached — (``_rk``, ``_w``, ``_cid``, ``_val``,
    ``_fin``, ``_nfin``, ``_u``). Shared by ``rank_gauss_transform`` (which
    continues with ndtri + standardization) and ``weighted_midranks`` (the
    SQL-oracleable public surface of the rank machinery)."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)

    melted = df.select(
        F.col(row_key).alias("_rk"),
        w.cast("double").alias("_w"),
        F.posexplode(F.array(*[F.col(c).cast("double") for c in feature_cols])).alias(
            "_cid", "_val"
        ),
    )
    finite = ~F.isnull("_val") & ~F.isnan("_val") & (F.abs("_val") != float("inf"))
    melted = melted.withColumn("_fin", finite)
    fin_w = F.when(F.col("_fin"), F.col("_w")).otherwise(F.lit(0.0))

    # phase 1: range-partition each column's sort across tasks; pin the
    # shuffle (persist + count) so every consumer sees one rid assignment
    ranged = (
        melted.repartitionByRange("_cid", "_val", "_rk")
        .withColumn("_rid", F.spark_partition_id())
        .persist()
    )
    ranged.count()
    if pin is not None:
        pin.append(ranged)

    # per-column totals (replaces the unordered per-column window — that
    # window was the other single-task-per-column stage)
    totals = ranged.groupBy("_cid").agg(
        F.sum(fin_w).alias("_tot"),
        F.sum(F.col("_fin").cast("long")).alias("_nfin"),
    )
    # tiny per-(range, col) weight totals -> exclusive prefix over ranges
    wo = Window.partitionBy("_cid").orderBy("_rid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("_rid", "_cid")
        .agg(F.sum(fin_w).alias("_rw"))
        .select(
            "_rid", "_cid",
            F.coalesce(F.sum("_rw").over(wo), F.lit(0.0)).alias("_off"),
        )
    )

    # phase 2: in-range exclusive cumsum + cross-range offset = the global
    # prefix weight; group sizes bounded by the range-partition size
    ws = Window.partitionBy("_rid", "_cid").orderBy(
        F.col("_val").asc(), F.col("_rk").asc()
    )
    ranked = (
        ranged.join(F.broadcast(offsets), ["_rid", "_cid"])
        .join(F.broadcast(totals), "_cid")
        .withColumn(
            "_cum",
            F.coalesce(
                F.sum(fin_w).over(ws.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            )
            + F.col("_off"),
        )
        .withColumn(
            "_u",
            F.when(
                F.col("_fin") & (F.col("_nfin") > 1),
                (F.col("_cum") + F.col("_w") / 2.0) / F.col("_tot"),
            ),
        )
    )
    return ranked


def weighted_midranks(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    row_key: str,
    pin: list | None = None,
) -> DataFrame:
    """Long-format weighted midranks u_i = (Σ_{j<i} w_j + w_i/2) / Σw per
    column (reference copula.py:93-101) — the distributed rank machinery
    alone, without the ndtri/standardization tail, so the range-partitioned
    two-phase prefix-sum is directly comparable against a window-SQL oracle.

    Returns (row_key, col_idx:int, u:double); non-finite values and
    single-point columns yield NULL u. Same ``pin`` contract as
    ``rank_gauss_transform``: the range-partitioned melt stays persisted
    until the caller unpersists the appended handle (after materializing
    the result) — or until the session drops it when ``pin`` is omitted."""
    ranked = _midrank_long(df, feature_cols, weight_col, row_key, pin=pin)
    return ranked.select(
        F.col("_rk").alias(row_key),
        F.col("_cid").cast("int").alias("col_idx"),
        F.col("_u").alias("u"),
    )


#: cells (rows × columns) at or below which ``rank_gauss_transform`` runs
#: the DRIVER kernel instead of the distributed melt. The gaussian path's
#: contract-mandated scale answer is the bounded ``build_cache`` subsample
#: (default 50k rows — reference copula.py:29), and at that size the
#: distributed pipeline is pure Spark job overhead: ~6 jobs (ranged melt
#: shuffle, totals, offsets, window+ndtri, two stats aggregates, wide
#: reassembly) measured 6.7 s at 50k×20 on local[32], vs ~0.3 s for the
#: same math in NumPy on 8 MB of data. 4M cells ≈ 32 MB f64 driver-side —
#: the same bounded-collect class as the rest of the selection layer.
#: Callers force the distributed path with ``driver_max_cells=0``
#: (``subsample=None`` full-corpus runs exceed the bound on their own).
RANKGAUSS_DRIVER_MAX_CELLS = 4_000_000


def rank_gauss_numpy(
    X: np.ndarray, w: np.ndarray, rk: np.ndarray, quantize_f32: bool = True
) -> np.ndarray:
    """Driver kernel: the exact math of the distributed pipeline — midrank
    u=(Σ_{j<i} w_j + w_i/2)/Σw over (value, row_key) order, clip
    [1e-6, 1−1e-6], AS241 ndtri, weighted standardization (var ≤ 1e-12 →
    std 1), non-finite rows and ≤1-finite columns → 0.0, optional f32
    quantize. Unweighted results are bit-identical to the distributed
    backend up to sum reassociation (~1e-16 before the f32 round, which
    absorbs it); weighted prefix sums differ only in add association."""
    n, m = X.shape
    Z = np.zeros((n, m))
    for j in range(m):
        x = X[:, j]
        fin = np.isfinite(x)
        if int(fin.sum()) <= 1:
            continue
        idx = np.where(fin)[0]
        order = idx[np.lexsort((rk[idx], x[idx]))]
        wo = np.asarray(w, dtype=np.float64)[order]
        tot = wo.sum()
        cum = np.concatenate(([0.0], np.cumsum(wo)[:-1]))
        u = (cum + wo / 2.0) / tot
        zs = ndtri(np.clip(u, 1e-6, 1.0 - 1e-6))
        zm = float(np.dot(wo, zs) / tot)
        zv = float(np.dot(wo, (zs - zm) * (zs - zm)) / tot)
        zstd = float(np.sqrt(zv)) if zv > 1e-12 else 1.0
        Z[order, j] = (zs - zm) / zstd
    if quantize_f32:
        Z = Z.astype(np.float32).astype(np.float64)
    return Z


def _rank_gauss_driver(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    row_key: str,
    z_prefix: str,
    store_f32: bool,
) -> DataFrame:
    w = (F.col(weight_col) if weight_col else F.lit(1.0)).cast("double")
    pdf = df.select(
        F.col(row_key),
        w.alias("_w"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    ).toPandas()
    rk = pdf[row_key].to_numpy()
    wv = pdf["_w"].to_numpy(dtype=np.float64)
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    Z = rank_gauss_numpy(X, wv, rk, quantize_f32=store_f32)
    out = pd.DataFrame({row_key: pdf[row_key], "weight": wv})
    for i, c in enumerate(feature_cols):
        out[f"{z_prefix}{c}"] = Z[:, i]
    return df.sparkSession.createDataFrame(out)


def rank_gauss_transform(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    row_key: str,
    z_prefix: str = "z_",
    store_f32: bool = True,
    pin: list | None = None,
    n_rows: int | None = None,
    driver_max_cells: int | None = None,
) -> DataFrame:
    """Return (row_key, weight, z_<col>...) with each column copula-transformed.

    Output z columns are float32-quantized when ``store_f32`` (the cache
    stores float32 Z, copula.py:77) but typed double for downstream kernels.

    ``pin``: the range-partitioned melt is persisted (required — see module
    docstring); when a list is passed, the persisted DataFrame is appended
    to it so the caller can unpersist after materializing the result.
    Without ``pin`` it stays cached until the session drops it.

    Backend choice: when the caller supplies ``n_rows`` and
    ``n_rows × p ≤ driver_max_cells`` (default
    ``RANKGAUSS_DRIVER_MAX_CELLS``), the transform runs as ONE bounded
    collect + ``rank_gauss_numpy`` + ``createDataFrame`` — same math, no
    melt shuffle (see the constant's docstring for the measured 50k-row
    cliff). ``driver_max_cells=0`` forces the distributed pipeline; with
    ``n_rows=None`` the distributed pipeline always runs (no extra count
    job is issued to decide).
    """
    p = len(feature_cols)
    cells_cap = (
        RANKGAUSS_DRIVER_MAX_CELLS if driver_max_cells is None else driver_max_cells
    )
    if n_rows is not None and cells_cap and n_rows * p <= cells_cap:
        return _rank_gauss_driver(
            df, feature_cols, weight_col, row_key, z_prefix, store_f32
        )
    ranked = _midrank_long(df, feature_cols, weight_col, row_key, pin=pin)

    # z = ndtri(clip(u)) — Arrow-batched, then weighted standardization per
    # column via one aggregate pass on the melted frame
    @F.pandas_udf(DoubleType())
    def _ndtri_udf(u: pd.Series) -> pd.Series:
        vals = u.to_numpy(dtype=np.float64)
        out = np.zeros_like(vals)
        m = np.isfinite(vals)
        out[m] = ndtri(np.clip(vals[m], 1e-6, 1.0 - 1e-6))
        return pd.Series(out)

    zed = ranked.withColumn("_zraw", F.when(F.col("_u").isNotNull(), _ndtri_udf(F.col("_u"))).otherwise(F.lit(0.0)))

    stats = (
        zed.where(F.col("_fin") & (F.col("_nfin") > 1))
        .groupBy("_cid")
        .agg(
            (F.sum(F.col("_w") * F.col("_zraw")) / F.sum("_w")).alias("_zm"),
        )
    )
    zed = zed.join(F.broadcast(stats), "_cid", "left")
    var_stats = (
        zed.where(F.col("_fin") & (F.col("_nfin") > 1))
        .groupBy("_cid")
        .agg(
            (
                F.sum(F.col("_w") * (F.col("_zraw") - F.col("_zm")) * (F.col("_zraw") - F.col("_zm")))
                / F.sum("_w")
            ).alias("_zv")
        )
    )
    zed = zed.join(F.broadcast(var_stats), "_cid", "left")
    zstd = F.when(F.col("_zv") > 1e-12, F.sqrt("_zv")).otherwise(F.lit(1.0))
    zfin = (F.col("_zraw") - F.col("_zm")) / zstd
    zexpr = F.when(F.col("_fin") & (F.col("_nfin") > 1), zfin).otherwise(F.lit(0.0))
    if store_f32:
        zexpr = zexpr.cast("float").cast("double")
    zed = zed.withColumn("_z", zexpr)

    # reassemble wide: one shuffle on row_key; array ordered by col idx
    wide = (
        zed.groupBy("_rk")
        .agg(
            F.first("_w").alias("_w"),
            F.array_sort(F.collect_list(F.struct("_cid", "_z"))).alias("_pairs"),
        )
        .select(
            F.col("_rk").alias(row_key),
            F.col("_w").alias("weight"),
            *[
                F.col("_pairs").getItem(i).getField("_z").alias(f"{z_prefix}{c}")
                for i, c in enumerate(feature_cols)
            ],
        )
    )
    return wide
