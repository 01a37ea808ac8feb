"""Group/time-aware permutation operators (SURVEY.md §2.G G5-G7).

Spark re-derivations of the reference's permutation semantics
(/root/reference/sift/_permute.py:67-244) as window/join plans:

- **global / within-group shuffle**: re-key rows by
  ``row_number() over (partitionBy group orderBy xxhash64(key, seed))`` and
  join values back by (group, new_rank) — a true permutation (multiset-
  preserving per group), deterministic given the seed.
- **circular shift**: ``lag(x, shift_g)`` with wraparound; per-group shift
  drawn deterministically from the group key + seed, in [1, n).
- **block shuffle**: block id = rank / block_size; blocks re-ordered by a
  seeded hash of (group, block); rows keep their in-block order.

'auto' resolution matches the reference: groups+time -> circular_shift,
groups -> within_group, else global (_permute.py:13-26).

Exact RNG parity with NumPy's Generator is out of contract (SURVEY.md §7
hard-point 3); tests assert the *semantic* invariants the reference's own
tests assert — per-group multiset equality, true-rotation, block integrity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resolve_method(method: str, has_groups: bool, has_time: bool) -> str:
    if method != "auto":
        return method
    if has_groups and has_time:
        return "circular_shift"
    if has_groups:
        return "within_group"
    return "global"


def _ranked(df: DataFrame, group: str | None, order: list[str]):
    part = Window.partitionBy(group) if group else Window.partitionBy()
    return part.orderBy(*[F.col(c) for c in order])


def permute_column(
    df: DataFrame,
    col: str,
    method: str = "within_group",
    group: str | None = None,
    order: list[str] | None = None,
    key_cols: list[str] | None = None,
    seed: int = 0,
    block_size: int | str = "auto",
    out: str | None = None,
) -> DataFrame:
    """Return df with ``out`` (default ``{col}_perm``) = permuted copy of
    ``col`` under the given method. ``key_cols`` identify rows (for the
    deterministic shuffle hash); ``order`` is the within-group timeline
    (required for circular_shift / block)."""
    out = out or f"{col}_perm"
    key_cols = key_cols or order or [col]
    if method in ("within_group", "block", "circular_shift") and group is None:
        raise ValueError(f"method='{method}' requires group")
    if method in ("circular_shift", "block") and not order:
        raise ValueError(f"method='{method}' requires order (time)")

    if method in ("global", "within_group"):
        grp_part = Window.partitionBy(group) if group else Window.partitionBy()
        worig = grp_part.orderBy(*[F.col(c) for c in key_cols])
        wshuf = grp_part.orderBy(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)))
        base = df.withColumn("_pos", F.row_number().over(worig))
        donor_keys = [group] if group else []
        donor = base.withColumn("_spos", F.row_number().over(wshuf)).select(
            *donor_keys, F.col("_spos").alias("_pos"), F.col(col).alias(out)
        )
        return base.join(donor, donor_keys + ["_pos"]).drop("_pos")

    if method == "circular_shift":
        w = _ranked(df, group, order)
        cnt = F.count(F.lit(1)).over(Window.partitionBy(group))
        # deterministic shift in [1, n) from (group, seed)
        shift = (
            F.pmod(F.xxhash64(F.col(group), F.lit(seed)), F.greatest(cnt - 1, F.lit(1))) + 1
        )
        rn = F.row_number().over(w) - 1
        base = (
            df.withColumn("_n", cnt)
            .withColumn("_rn", rn)
            .withColumn("_src", F.pmod(F.col("_rn") - shift, F.col("_n")))
        )
        donor = base.select(
            F.col(group).alias("_g"), F.col("_rn").alias("_src_rn"), F.col(col).alias(out)
        )
        joined = base.join(
            donor,
            (F.col(group) == F.col("_g")) & (F.col("_src") == F.col("_src_rn")),
        )
        return joined.drop("_g", "_src_rn", "_n", "_rn", "_src")

    if method == "block":
        w = _ranked(df, group, order)
        cnt = F.count(F.lit(1)).over(Window.partitionBy(group))
        bs = (
            F.greatest(F.floor(F.sqrt(cnt.cast("double"))), F.lit(1))
            if block_size == "auto"
            else F.lit(int(block_size))
        )
        rn = F.row_number().over(w) - 1
        base = (
            df.withColumn("_rn", rn)
            .withColumn("_bs", bs.cast("long"))
            .withColumn("_blk", (F.col("_rn") / F.col("_bs")).cast("long"))
            .withColumn("_inblk", F.col("_rn") % F.col("_bs"))
        )
        # shuffle blocks: new block order = rank of hash(group, blk, seed)
        wblk = Window.partitionBy(group).orderBy(
            F.xxhash64(F.col(group), F.col("_blk"), F.lit(seed))
        )
        blocks = (
            base.select(group, "_blk").distinct()
            .withColumn("_newpos", F.row_number().over(wblk) - 1)
        )
        # target slot of each row = position of its block in the new order
        wnew = Window.partitionBy(group).orderBy("_newpos", "_inblk")
        donor = (
            base.join(blocks, [group, "_blk"])
            .withColumn("_tgt", F.row_number().over(wnew) - 1)
            .select(F.col(group).alias("_g"), F.col("_tgt"), F.col(col).alias(out))
        )
        joined = base.join(
            donor, (F.col(group) == F.col("_g")) & (F.col("_rn") == F.col("_tgt"))
        )
        return joined.drop("_g", "_tgt", "_rn", "_bs", "_blk", "_inblk")

    raise ValueError(f"Unknown permutation method: {method}")


def permute_rows_struct(
    df: DataFrame,
    cols: list[str],
    method: str = "within_group",
    group: str | None = None,
    order: list[str] | None = None,
    key_cols: list[str] | None = None,
    seed: int = 0,
    block_size: int | str = "auto",
    suffix: str = "_perm",
) -> DataFrame:
    """Row-wise permutation: the SAME permutation applied to all ``cols``
    (preserves cross-feature covariance, _permute.py:129-186) — one struct
    column through permute_column, then unpacked."""
    packed = df.withColumn("_rowstruct", F.struct(*[F.col(c) for c in cols]))
    permed = permute_column(
        packed, "_rowstruct", method, group, order, key_cols, seed, block_size,
        out="_rowstruct_p",
    )
    for c in cols:
        permed = permed.withColumn(f"{c}{suffix}", F.col(f"_rowstruct_p.{c}"))
    return permed.drop("_rowstruct", "_rowstruct_p")
