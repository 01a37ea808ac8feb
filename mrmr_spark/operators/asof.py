"""As-of join against reference snapshots (SURVEY.md §2.A A6).

Spark has no native AS OF join; the scalable formulation is the
**union + last(ignorenulls) window** trick:

1. tag snapshot rows 0, fact rows 1; union by (key, ts, tag);
2. per key, ordered by (ts, tag), each fact row takes
   ``last(snapshot_col, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, 0)`` — snapshots at the exact fact ts
   sort *before* the fact (tag 0 < 1), giving ``effective_ts <= ts``
   semantics ("most recent state at or strictly before t", the reference's
   time-holdout rule, ``sift/selection/auto_k.py:84-93``).

Cost model at 10^12 rows: ONE sort-shuffle of facts+snapshots on the key —
strictly cheaper than the range-join alternative (which explodes into an
inequality join) and immune to snapshot-per-key fan-out. Hot keys are a
window (not join) skew, mitigated by conv bucketing; AQE cannot split a
window partition, so extreme single-conv skew is bounded by conv length by
construction of the data model.

Leakage guarantee: the frame never looks past the current row, so truncating
snapshots at time T provably leaves all features at ts<=T unchanged — the
temporal-leakage probe in tests/test_asof.py asserts exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    facts: DataFrame,
    snapshots: DataFrame,
    on: str = "conv_id",
    ts_col: str = "ts",
    snap_ts_col: str = "effective_ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: each fact row gets the latest snapshot with
    ``snap_ts <= ts`` (or ``< ts`` when ``strict``).

    Returns facts with ``value_cols`` appended (null when no snapshot yet).
    """
    if value_cols is None:
        value_cols = [c for c in snapshots.columns if c not in (on, snap_ts_col)]

    fact_cols = facts.columns
    snap_side = snapshots.select(
        F.col(on),
        F.col(snap_ts_col).alias(ts_col),
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(facts.schema[c].dataType).alias(f"_f_{c}")
          for c in fact_cols if c not in (on, ts_col)],
    )
    fact_side = facts.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(snapshots.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c).alias(f"_f_{c}") for c in fact_cols if c not in (on, ts_col)],
    )
    unioned = snap_side.unionByName(fact_side)

    # strict: a snapshot at exactly ts must NOT be visible -> facts sort first
    tag_order = F.col("_tag").desc() if strict else F.col("_tag").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    filled = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}") for c in value_cols],
    )
    out = filled.where(F.col("_tag") == 1).select(
        F.col(on),
        F.col(ts_col),
        *[F.col(f"_f_{c}").alias(c) for c in fact_cols if c not in (on, ts_col)],
        *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
    )
    return out
