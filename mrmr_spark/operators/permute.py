"""Group/time-aware permutation operators (SURVEY.md §2.G G5-G7).

Spark re-derivations of the reference's permutation semantics
(/root/reference/sift/_permute.py:67-244) as window/join plans:

- **global / within-group shuffle**: re-key rows by a seeded-hash rank
  and join values back by (group, new_rank) — a true permutation
  (multiset-preserving per group), deterministic given the seed. The
  within-group rank is a grouped window (bounded by group size); the
  group-less global rank is a range-partitioned two-phase row number
  (``_global_rank`` — no single-task global window at any n).
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


def _ranked(df: DataFrame, group: str, order: list[str]):
    # callers (circular_shift / block) always have a group — the
    # group-less global method uses _global_rank, never a global window
    return Window.partitionBy(group).orderBy(*[F.col(c) for c in order])


def _global_rank(
    df: DataFrame, order_exprs: list, name: str, pin: list | None = None
) -> DataFrame:
    """Global 1-based row number over ``order_exprs`` WITHOUT a
    single-partition window (that plan pulls the whole table through one
    task): range-partition the sort, per-range counts -> exclusive
    offsets, in-range row_number + offset — the copula/KS two-phase
    prefix pattern (copula.py:48). The ranged frame is pinned
    (persist+count) so its two consumers (offsets pass, ranked output)
    see one partition assignment; appended to ``pin`` when given (the
    copula.py caller-unpersist convention), otherwise cached until
    evicted/session end."""
    tagged = (
        df.repartitionByRange(*order_exprs)
        .withColumn("_rid", F.spark_partition_id())
        .persist()
    )
    tagged.count()
    if pin is not None:
        pin.append(tagged)
    wo = Window.orderBy("_rid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        tagged.groupBy("_rid")
        .agg(F.count(F.lit(1)).alias("_rn_"))
        .select(
            "_rid",
            F.coalesce(F.sum("_rn_").over(wo), F.lit(0)).alias("_off"),
        )
    )
    w = Window.partitionBy("_rid").orderBy(*order_exprs)
    return (
        tagged.join(F.broadcast(offs), "_rid")
        .withColumn(name, F.row_number().over(w) + F.col("_off"))
        .drop("_rid", "_off")
    )


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
    pin: list | None = None,
) -> DataFrame:
    """Return df with ``out`` (default ``{col}_perm``) = permuted copy of
    ``col`` under the given method. ``key_cols`` identify rows (for the
    deterministic shuffle hash); ``order`` is the within-group timeline
    (required for circular_shift / block). ``method='global'`` pins two
    range exchanges — pass ``pin`` (a list) to receive the handles and
    unpersist after materializing the output."""
    out = out or f"{col}_perm"
    key_cols = key_cols or order or [col]
    if method in ("within_group", "block", "circular_shift") and group is None:
        raise ValueError(f"method='{method}' requires group")
    if method in ("circular_shift", "block") and not order:
        raise ValueError(f"method='{method}' requires order (time)")

    if method == "global":
        # no group to bound the window: both global rankings (original
        # order, seeded-hash order) run as range-partitioned two-phase
        # row numbers — no single-task stage at any n
        keyexprs = [F.col(c) for c in key_cols]
        base = _global_rank(df, keyexprs, "_pos", pin)
        donor = _global_rank(
            base, [F.xxhash64(*keyexprs, F.lit(seed))], "_spos", pin
        ).select(F.col("_spos").alias("_pos"), F.col(col).alias(out))
        return base.join(donor, ["_pos"]).drop("_pos")

    if method == "within_group":
        grp_part = Window.partitionBy(group)
        worig = grp_part.orderBy(*[F.col(c) for c in key_cols])
        wshuf = grp_part.orderBy(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)))
        base = df.withColumn("_pos", F.row_number().over(worig))
        donor = base.withColumn("_spos", F.row_number().over(wshuf)).select(
            group, F.col("_spos").alias("_pos"), F.col(col).alias(out)
        )
        return base.join(donor, [group, "_pos"]).drop("_pos")

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


def permute_columns_arrow(
    df: DataFrame,
    specs: list[tuple[str, str, int]],
    method: str = "within_group",
    group: str | None = None,
    order: list[str] | None = None,
    key_cols: list[str] | None = None,
    seed: int = 0,
    block_size: int | str = "auto",
) -> DataFrame:
    """Produce MANY independently-permuted column copies in ONE Arrow pass.

    ``specs`` is a list of ``(src_col, out_name, col_seed)``; every output
    column gets its own permutation (seeded per (seed, col_seed, group)),
    all computed inside a single group-partitioned ``mapInArrow`` — exactly
    ONE exchange total, vs one window+self-join of the full matrix per
    column in :func:`permute_column`. This is the Boruta-shadow /
    permutation-importance hot path (p columns × n iterations would
    otherwise shuffle the matrix O(p·iter) times).

    Semantics per method match :func:`permute_column` (reference
    /root/reference/sift/_permute.py:67-244): within_group / block /
    circular_shift operate on each group's time-sorted run; 'global' treats
    each hash partition as one run (a true multiset-preserving permutation
    of the whole column — partition assignment is itself a seeded hash, so
    values mix across the table; deterministic for a fixed partition count).

    Scale note: each task materializes its partition's batches (np.roll /
    permutation need whole group runs); partitions are the shuffle-sized
    units that already fit executor memory, and groups never straddle
    partitions (hash partitioning on the group key).
    """
    import pyarrow as pa

    if method in ("within_group", "block", "circular_shift") and group is None:
        raise ValueError(f"method='{method}' requires group")
    if method in ("circular_shift", "block") and not order:
        raise ValueError(f"method='{method}' requires order (time)")
    src_set = {s for s, _, _ in specs}
    for s in src_set:
        if s not in df.columns:
            raise ValueError(f"unknown source column: {s}")

    if group is not None:
        work = df.repartition(F.col(group)).sortWithinPartitions(
            group, *(order or []), *[c for c in (key_cols or []) if c != group]
        )
        drop_key = None
    else:
        keys = key_cols or df.columns
        work = df.withColumn(
            "_permkey", F.xxhash64(*[F.col(c) for c in keys], F.lit(seed))
        )
        work = work.repartition(F.col("_permkey")).sortWithinPartitions("_permkey")
        drop_key = "_permkey"

    in_fields = work.schema.fields
    spark_type = {f.name: f.dataType for f in in_fields}
    out_schema_parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in in_fields] + [
        f"`{out}` {spark_type[src].simpleString()}" for src, out, _ in specs
    ]
    out_ddl = ", ".join(out_schema_parts)
    bs_fixed = None if block_size == "auto" else int(block_size)

    def _run_perm(rng, m: int):
        import math

        import numpy as np

        if method in ("global", "within_group"):
            return rng.permutation(m)
        if method == "circular_shift":
            shift = 1 + int(rng.integers(m - 1)) if m > 1 else 0
            return (np.arange(m) - shift) % m
        # block: √n blocks (or fixed), shuffle block order, keep in-block order
        bs = bs_fixed or max(int(math.sqrt(m)), 1)
        n_blocks = (m + bs - 1) // bs
        if n_blocks <= 0:
            return np.empty(0, dtype=np.int64)
        border = rng.permutation(n_blocks)
        return np.concatenate(
            [np.arange(b * bs, min((b + 1) * bs, m)) for b in border]
        )

    def mapper(batches):
        import zlib

        import numpy as np

        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list).combine_chunks()
        m_tot = tbl.num_rows
        if m_tot == 0:
            return
        # group runs (input is sorted by group within the partition)
        if group is not None:
            gv = tbl.column(group).to_numpy(zero_copy_only=False)
            change = np.nonzero(gv[1:] != gv[:-1])[0] + 1
            starts = np.concatenate([[0], change, [m_tot]]).astype(np.int64)
            ghashes = [
                zlib.crc32(str(gv[int(s)]).encode()) for s in starts[:-1]
            ]
        else:
            starts = np.array([0, m_tot], dtype=np.int64)
            ghashes = [0]

        new_cols = []
        for src, _out, cseed in specs:
            x = tbl.column(src).to_numpy(zero_copy_only=False)
            out_x = np.empty_like(x)
            for ri in range(len(starts) - 1):
                s, e = int(starts[ri]), int(starts[ri + 1])
                rng = np.random.default_rng([seed & 0x7FFFFFFF, cseed & 0x7FFFFFFF, ghashes[ri]])
                out_x[s:e] = x[s:e][_run_perm(rng, e - s)]
            new_cols.append(pa.array(out_x, from_pandas=True))
        out_tbl = tbl
        for (src, out, _), arr in zip(specs, new_cols):
            out_tbl = out_tbl.append_column(out, arr.cast(out_tbl.schema.field(src).type))
        yield from out_tbl.to_batches(max_chunksize=65536)

    result = work.mapInArrow(mapper, out_ddl)
    return result.drop(drop_key) if drop_key else result


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
    pin: list | None = None,
) -> DataFrame:
    """Row-wise permutation: the SAME permutation applied to all ``cols``
    (preserves cross-feature covariance, _permute.py:129-186) — one struct
    column through permute_column, then unpacked."""
    packed = df.withColumn("_rowstruct", F.struct(*[F.col(c) for c in cols]))
    permed = permute_column(
        packed, "_rowstruct", method, group, order, key_cols, seed, block_size,
        out="_rowstruct_p", pin=pin,
    )
    for c in cols:
        permed = permed.withColumn(f"{c}{suffix}", F.col(f"_rowstruct_p.{c}"))
    return permed.drop("_rowstruct", "_rowstruct_p")
