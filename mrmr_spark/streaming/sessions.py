"""Structured-Streaming surface (thin by design).

The reference is a pure batch library — it has **no streaming surface at
all** (SURVEY.md §2.I), and the engine's contract is batch feature
engineering. This module exists so the transcript data model has a
streaming ingest path with the SAME session semantics as the batch
``sessionize`` operator: Spark's ``session_window`` closes a session when
no event arrives within the gap — identical boundaries to the batch
ts-gap rule for in-order data; the watermark bounds state for late data.

Use case: incremental per-session rollups feeding the same parquet/Iceberg
tables the batch FE layer reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    stream: DataFrame,
    gap_s: float = 1800.0,
    group: str = "conv_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(conv, session) rolling aggregates over a streaming transcript
    source. Returns one row per closed session: conv_id, session start/end,
    n_turns, n_tool_turns.

    The result is append-mode writable once the watermark passes the
    session end; semantics match the batch operator's session boundaries
    for in-order events (late events within the watermark merge sessions,
    which the batch recompute would also do).
    """
    gap = f"{int(gap_s)} seconds"
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(group))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_turns"),
        )
        .select(
            group,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "n_tool_turns",
        )
    )
