"""Backfilled rolling-window aggregates, leakage-free (SURVEY.md §2.A A5).

Every window here EXCLUDES the current row (``rowsBetween(-n, -1)`` /
``rangeBetween(-Δ, -1)``): a feature at (conv_id, ts) reads strictly the past.
That is the reference's train-on-past/validate-on-future rule
(``sift/selection/auto_k.py:84-93``) pushed down to feature construction —
the zero-temporal-leakage invariant the driver contract verifies.

All aggregates over one window spec share a single sort + exchange in the
physical plan; at 10^12 rows the only shuffle is the hash exchange on
conv_id, which AQE skew-split handles for hot conversations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def backfilled_rolling(
    df: DataFrame,
    aggs: dict[str, Column],
    n: int | None = None,
    range_s: float | None = None,
    group: str = "conv_id",
    order: str | list[str] = "turn_idx",
    ts_col: str = "ts",
    suffix: str | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Add trailing-window aggregates that exclude the current row.

    ``aggs`` maps output-name -> aggregate Column (e.g. ``F.avg("gap_s")``).
    Exactly one of ``n`` (last n rows) or ``range_s`` (last range_s seconds)
    must be given.

    ``keep_key=True`` leaves the materialized µs ordering key in the output so
    a later range window over the same ``ts_col`` reuses the SAME attribute —
    and therefore the same physical sort — instead of minting a fresh one.
    """
    if (n is None) == (range_s is None):
        raise ValueError("pass exactly one of n= or range_s=")
    order_cols = [order] if isinstance(order, str) else list(order)
    if n is not None:
        w = (
            Window.partitionBy(group)
            .orderBy(*[F.col(c) for c in order_cols])
            .rowsBetween(-n, -1)
        )
        sfx = suffix or f"_{n}"
    else:
        # order on integer microseconds so RANGE bounds are exact integers;
        # end at -1µs excludes the current row (and any exact-tie timestamp,
        # which cannot occur within a conv — ts strictly increases per conv).
        # The key is materialized as a real column (not an inline expression)
        # so every agg's window spec references the SAME attribute —
        # otherwise each withColumn mints a fresh `_w0#n` ordering alias,
        # CollapseWindow cannot merge the Window operators, and the plan
        # re-sorts the partition once PER AGGREGATE.
        from mrmr_spark.operators.ordering import ts_micros

        key = f"_ord_us_{ts_col}"
        if key not in df.columns:
            df = df.withColumn(key, ts_micros(ts_col))
        w = (
            Window.partitionBy(group)
            .orderBy(key)
            .rangeBetween(-int(range_s * 1_000_000), -1)
        )
        sfx = suffix or f"_{int(range_s)}s"
    out = df
    for name, col in aggs.items():
        out = out.withColumn(f"{name}{sfx}", col.over(w))
    if range_s is not None and not keep_key:
        out = out.drop(key)
    return out
