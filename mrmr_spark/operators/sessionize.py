"""ts-gap sessionization (SURVEY.md §2.A A4).

Batch analog of Structured Streaming's ``session_window``: a new session
starts whenever the gap to the previous turn exceeds ``gap`` seconds. The
session id is the running count of boundary flags over the stable turn window
— one window exchange, no shuffle beyond it, and the whole thing is
whole-stage-codegen (no Python).

Semantics anchor: the reference's block bootstrap treats contiguous runs
within a group timeline as the resampling unit (``sift/stability.py:94-178``);
a session is exactly such a contiguous run, delimited by a time-gap predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.ordering import ts_micros, turn_window


def sessionize(
    df: DataFrame,
    gap_s: float = 1800.0,
    group: str = "conv_id",
    ts_col: str = "ts",
    order: str | list[str] | None = None,
    out: str = "session_id",
) -> DataFrame:
    """Add ``session_id`` (0-based per group) and ``gap_s`` (seconds since
    previous turn; null on the first turn of a group)."""
    order = order if order is not None else ["turn_idx"]
    w = turn_window(group, order)
    prev_ts = F.lag(ts_col).over(w)
    # integer-µs subtraction first: exact to the timestamp's native precision
    # (a double of epoch *seconds* only has ~0.25µs ulp in 2024, which breaks
    # allclose parity with any int64-based oracle)
    gap = (ts_micros(ts_col) - ts_micros(prev_ts)) / F.lit(1_000_000.0)
    is_new = F.when(prev_ts.isNull() | (gap > gap_s), F.lit(1)).otherwise(F.lit(0))
    return (
        df.withColumn("gap_s", gap)
        .withColumn("_newsess", is_new)
        .withColumn(out, (F.sum("_newsess").over(w) - 1).cast("int"))
        .drop("_newsess")
    )
