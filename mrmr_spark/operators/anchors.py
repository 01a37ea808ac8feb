"""Anchor-row operators (SURVEY.md §2.A A7).

Re-derivations of the reference's anchor utilities
(``sift/sampling/anchors.py:13-174``) as window predicates:

- first / last / first-and-last per group       -> row_number over asc/desc
- periodic anchors (every k-th turn, or per calendar period)
- quantile anchors (rows nearest to timeline quantiles) -> percent_rank
- event-window anchors (rows within ±w rows of a marker event) -> max(flag)

All are *filters* (they tag or keep rows), so they compose with any
downstream plan and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mrmr_spark.operators.ordering import turn_window


def first_per_group(df: DataFrame, group: str = "conv_id", order="turn_idx") -> DataFrame:
    w = turn_window(group, order)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def first_last_per_group(
    df: DataFrame, group: str = "conv_id", order: str | list[str] = "turn_idx"
) -> DataFrame:
    oc = [order] if isinstance(order, str) else list(order)
    wa = Window.partitionBy(group).orderBy(*[F.col(c).asc() for c in oc])
    wd = Window.partitionBy(group).orderBy(*[F.col(c).desc() for c in oc])
    return (
        df.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rd", F.row_number().over(wd))
        .where((F.col("_ra") == 1) | (F.col("_rd") == 1))
        .withColumn("anchor_kind", F.when(F.col("_ra") == 1, "first").otherwise("last"))
        .drop("_ra", "_rd")
    )


def periodic_anchors(
    df: DataFrame,
    period: int | None = None,
    calendar: str | None = None,
    group: str = "conv_id",
    order: str | list[str] = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Every ``period``-th row per group, or the first row of each
    (group, calendar-period) — e.g. ``calendar='day'``."""
    if (period is None) == (calendar is None):
        raise ValueError("pass exactly one of period= or calendar=")
    if period is not None:
        w = turn_window(group, order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") - 1) % period == 0)
            .drop("_rn")
        )
    oc = [order] if isinstance(order, str) else list(order)
    bucket = F.date_trunc(calendar, F.col(ts_col))
    w = Window.partitionBy(group, bucket).orderBy(*[F.col(c) for c in oc])
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def quantile_anchors(
    df: DataFrame,
    quantiles: list[float],
    group: str = "conv_id",
    order: str = "turn_idx",
) -> DataFrame:
    """Keep, per group, the first row whose percent_rank reaches each
    requested quantile (one row per (group, quantile))."""
    w = turn_window(group, order)
    pr = F.percent_rank().over(w)
    df2 = df.withColumn("_pr", pr)
    parts = []
    for q in quantiles:
        wq = Window.partitionBy(group).orderBy(F.col("_pr"))
        parts.append(
            df2.where(F.col("_pr") >= q)
            .withColumn("_rn", F.row_number().over(wq))
            .where(F.col("_rn") == 1)
            .withColumn("anchor_q", F.lit(q))
            .drop("_rn")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.drop("_pr")


def event_window_anchors(
    df: DataFrame,
    flag: Column,
    w_rows: int = 2,
    group: str = "conv_id",
    order: str | list[str] = "turn_idx",
) -> DataFrame:
    """Keep rows within ±w_rows of any row matching ``flag``."""
    oc = [order] if isinstance(order, str) else list(order)
    win = (
        Window.partitionBy(group)
        .orderBy(*[F.col(c) for c in oc])
        .rowsBetween(-w_rows, w_rows)
    )
    return (
        df.withColumn("_hit", F.max(flag.cast("int")).over(win))
        .where(F.col("_hit") == 1)
        .drop("_hit")
    )
