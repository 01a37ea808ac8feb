"""Distributed Gaussian-copula (weighted rank-gauss) transform — SURVEY.md D1-D3.

Reference semantics (copula.py:85-117) per column:

  order by value (non-finite excluded, output 0) →
  midrank u_i = (Σ_{j<i} w_j + w_i/2) / Σw, clipped to [1e-6, 1−1e-6] →
  z = ndtri(u) → weighted standardize (mean 0, var 1; var ≤ 1e-12 → std 1)

The Spark formulation is ONE shuffle for all p columns: melt to
(row_key, col_idx, value, w), range-partition the per-column global sort via
``Window.partitionBy(col_idx).orderBy(value, row_key)`` (the tie order is
deterministic; the reference's unstable argsort makes ties
implementation-defined, so parity fixtures are tie-free — SURVEY.md §7
hard-point 1), cumulative-sum weights, apply ndtri in an Arrow batch, and
re-assemble the wide Z row via groupBy(row_key) + array positioning.

At 10^12 rows the copula path follows the reference's own scale answer —
it runs on the bounded subsample (default 50k) that ``build_cache`` defines
(copula.py:29) — so the sort is over subsample×p melted rows.
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


def rank_gauss_transform(
    df: DataFrame,
    feature_cols: list[str],
    weight_col: str | None,
    row_key: str,
    z_prefix: str = "z_",
    store_f32: bool = True,
) -> DataFrame:
    """Return (row_key, weight, z_<col>...) with each column copula-transformed.

    Output z columns are float32-quantized when ``store_f32`` (the cache
    stores float32 Z, copula.py:77) but typed double for downstream kernels.
    """
    p = len(feature_cols)
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

    ws = Window.partitionBy("_cid").orderBy(F.col("_val").asc(), F.col("_rk").asc())
    wtot = Window.partitionBy("_cid")
    fin_w = F.when(F.col("_fin"), F.col("_w")).otherwise(F.lit(0.0))
    ranked = (
        melted.withColumn("_cum", F.sum(fin_w).over(ws.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("_tot", F.sum(fin_w).over(wtot))
        .withColumn("_nfin", F.sum(F.col("_fin").cast("long")).over(wtot))
        .withColumn(
            "_u",
            F.when(
                F.col("_fin") & (F.col("_nfin") > 1),
                (F.coalesce(F.col("_cum"), F.lit(0.0)) + F.col("_w") / 2.0) / F.col("_tot"),
            ),
        )
    )

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
