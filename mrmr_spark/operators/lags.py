"""Lag/lead turn features (SURVEY.md §2.A A3).

Semantics anchor: the reference treats rows as ordered sequences per group
(circular-shift / block permutation, ``sift/_permute.py:103-124``); the Spark
form is ``F.lag``/``F.lead`` over the stable turn window. Point-in-time
correctness: a lag only ever reads strictly earlier turns, a lead is only for
*target* construction (never a feature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.ordering import turn_window


def with_lags(
    df: DataFrame,
    cols: dict[str, list[int]],
    group: str = "conv_id",
    order: str | list[str] = "turn_idx",
) -> DataFrame:
    """Add lag/lead columns.

    ``cols`` maps column name -> list of offsets; positive = lag (past),
    negative = lead (future). Output names: ``{col}_lag{n}`` / ``{col}_lead{n}``.
    One window spec → one sort per partition, all offsets share it (a single
    Window exchange in the physical plan, no matter how many offsets).
    """
    w = turn_window(group, order)
    out = df
    for col, offsets in cols.items():
        for off in offsets:
            if off >= 0:
                out = out.withColumn(f"{col}_lag{off}", F.lag(col, off).over(w))
            else:
                out = out.withColumn(f"{col}_lead{-off}", F.lead(col, -off).over(w))
    return out
