"""Categorical target encoding (SURVEY.md §2.B B8; reference delegates to
category_encoders, _preprocess.py:268-291).

All three encoders are two Spark operations: one groupBy over the category
(tiny result) and one **broadcast** join back — no shuffle of the fact
table, which is what makes them usable at 10^12 rows.

- loo:  (Σy_g − y_i) / (n_g − 1), singletons → prior — matches
  category_encoders.LeaveOneOutEncoder's train-time transform exactly
  (sigma noise off, its default).
- target: category_encoders.TargetEncoder's published sigmoid blend —
  ``w = 1 / (1 + exp(−(n_g − min_samples_leaf)/smoothing))``,
  ``enc = (1−w)·ȳ + w·ȳ_g``, singletons → prior (CE defaults
  min_samples_leaf=20, smoothing=10).
- james_stein: shrink group means toward the prior by
  B = σ²_between / (σ²_between + σ²_within/n_g).

Parity note: category_encoders is an OPTIONAL dependency of the reference
(_preprocess.py:278-282) and is absent from this runtime (as from any
runtime without the extra install), so value-level parity cannot be
executed here; loo/target replicate CE's public formulas, james_stein is
a documented approximation of CE's 'independent' model. The reference's
own tests never assert encoded values, only downstream selections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_stats(df: DataFrame, cat_col: str, y_col: str):
    g = df.groupBy(cat_col).agg(
        F.sum(F.col(y_col).cast("double")).alias("_sum_y"),
        F.count(F.col(y_col)).alias("_cnt"),
        F.avg(F.col(y_col).cast("double")).alias("_mean_y"),
        F.var_pop(F.col(y_col).cast("double")).alias("_var_y"),
    )
    prior = df.select(
        F.avg(F.col(y_col).cast("double")).alias("p"),
        F.var_pop(F.col(y_col).cast("double")).alias("v"),
    ).collect()[0]
    return g, float(prior.p), float(prior.v or 0.0)


def target_encode(
    df: DataFrame,
    cat_cols: list[str],
    y_col: str,
    method: str = "loo",
    smoothing: float = 10.0,
    min_samples_leaf: float = 20.0,
    suffix: str = "_enc",
) -> DataFrame:
    """Append ``{col}{suffix}`` double columns; originals are kept."""
    out = df
    for c in cat_cols:
        g, prior_mean, prior_var = _group_stats(df, c, y_col)
        if method == "loo":
            enc = F.when(
                F.col("_cnt") > 1,
                (F.col("_sum_y") - F.col(y_col).cast("double")) / (F.col("_cnt") - 1),
            ).otherwise(F.lit(prior_mean))
        elif method == "target":
            # CE TargetEncoder sigmoid blend; singletons get the prior
            w = 1.0 / (
                1.0
                + F.exp(-(F.col("_cnt") - F.lit(float(min_samples_leaf))) / F.lit(float(smoothing)))
            )
            enc = F.when(F.col("_cnt") <= 1, F.lit(prior_mean)).otherwise(
                F.lit(prior_mean) * (1.0 - w) + F.col("_mean_y") * w
            )
        elif method == "james_stein":
            within = F.coalesce(F.col("_var_y"), F.lit(0.0)) / F.greatest(F.col("_cnt"), F.lit(1))
            between = F.lit(max(prior_var, 1e-12))
            b = between / (between + within + F.lit(1e-12))
            enc = F.lit(prior_mean) + b * (F.col("_mean_y") - F.lit(prior_mean))
        else:
            raise ValueError(f"Unknown encoding method: {method}")
        out = (
            out.join(F.broadcast(g), c, "left")
            .withColumn(f"{c}{suffix}", F.coalesce(enc, F.lit(prior_mean)))
            .drop("_sum_y", "_cnt", "_mean_y", "_var_y")
        )
    return out
