"""Skew handling for hot conversation keys (SURVEY.md §2.I joins, §4.2).

Two tools, used where AQE can't help:

- ``salted_agg``: two-stage aggregation — stage 1 groups on
  (key, salt = hash(row) % n), stage 2 merges the partials. Turns a single
  hot key's reduction into n parallel partials. Use for algebraic
  aggregates over Zipf-skewed conv_ids.
- ``salted_broadcast_left``: explode the *small* side n ways so a skewed
  large-side key hashes across n tasks. (For plain joins, prefer
  AQE skew-join splitting — ``spark.sql.adaptive.skewJoin.enabled`` is on
  by default in mrmr_spark.session.)

Windows over conv_id cannot be salted (order within the key is global by
definition); there the bound is the per-conversation length, which the data
model caps — sessionize/rolling costs are O(conv length) per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``partial_aggs``: name -> aggregate over raw rows (stage 1).
    ``merge_aggs``: name -> aggregate over the stage-1 columns (stage 2),
    referring to the stage-1 output names.

    Example (count + sum):
        salted_agg(df, "conv_id",
                   {"cnt": F.count(F.lit(1)), "s": F.sum("x")},
                   {"cnt": F.sum("cnt"), "s": F.sum("s")})
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[a.alias(n) for n, a in partial_aggs.items()])
    )
    return stage1.groupBy(key).agg(*[a.alias(n) for n, a in merge_aggs.items()])


def salted_broadcast_left(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Join a skewed large table against a small dim by replicating the dim
    n_salts times; each large row picks one replica via a row hash."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    small_rep = small.withColumn("_salt", salts)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    return large.withColumn("_salt", lsalt).join(
        F.broadcast(small_rep), [key, "_salt"]
    ).drop("_salt")
