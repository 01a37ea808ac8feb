"""Training-shard sink: the last mile of the curation pipeline — turn a
curated (and usually :func:`~mrmr_spark.operators.curation.epoch_shuffle`-ordered)
corpus into fixed-size, deterministically-ordered shards a data loader
streams sequentially. The reference engine (kmedved/mrmr) has no sink
layer; this extends the `documents`-table curation family.

Two assignment strategies, one writer:

- :func:`sized_shards` — EXACT ``rows_per_shard`` rows per shard (last
  shard partial), shard i holding global ranks [i·R, (i+1)·R) under a
  caller-supplied total order. The global rank is computed scale-safely:
  one ``repartitionByRange`` + local sort, then
  ``monotonically_increasing_id`` (partition id in the high bits, local
  ordinal in the low 33) pinned by a persist, per-partition counts
  (#partitions rows) prefix-summed into exclusive offsets, broadcast
  back — the copula/KS two-phase pattern (`select/copula.py`), so NO
  single-task global window ever materializes and the only data-sized
  cost is the one range exchange. Range boundary placement does not
  affect the result: the rank is derived from (partition order, sorted
  local ordinal), which is the total order regardless of where the
  sampled boundaries fell.
- :func:`hash_shards` — shard = pmod(hash(id), n_shards): zero-sort,
  single-expression, streaming-safe; shard sizes are multinomial-equal
  (±O(√(n/k))) rather than exact. The WebDataset-style default when
  exact sizes don't matter. ``hash_fn='md5_60'`` is the
  DuckDB-reproducible family for the gate.

:func:`write_training_shards` materializes either assignment as
``shard=K/`` partition directories (parquet or jsonl), clustering each
shard's rows into one task so a shard is one file per written
partition, and returns a manifest dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_LOCAL_MASK = (1 << 33) - 1  # monotonically_increasing_id: low 33 bits = ordinal


def sized_shards(
    df: DataFrame,
    rows_per_shard: int,
    order_by: list[str] | None = None,
    id_col: str = "doc_id",
    shard_col: str = "shard",
    rank_col: str | None = None,
    pin: list | None = None,
) -> DataFrame:
    """Assign each row its global rank under ``(*order_by, id_col)``
    (the id tiebreak makes the order total, hence deterministic) and the
    exact-size shard ``rank // rows_per_shard``. Returns the input
    columns + ``shard_col`` (+ ``rank_col`` if named).

    The frame is persisted internally to pin the partition/ordinal
    assignment (pass ``pin`` to take ownership of the unpersist, the
    same contract as the LSH/copula pin lists)."""
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    order = [F.col(c) for c in (order_by or [])] + [F.col(id_col)]
    ranged = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    ranged.count()
    if pin is not None:
        pin.append(ranged)

    rid = F.shiftrightunsigned(F.col("_mid"), 33)
    local = F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK))
    counts = ranged.groupBy(rid.alias("_rid")).agg(F.count(F.lit(1)).alias("_c"))
    # exclusive prefix over the (tiny, #partitions-row) count frame;
    # range partitions are ordered by construction, so _rid order IS key
    # order and the offset is the number of rows in lower partitions
    wo = Window.orderBy("_rid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_rid", F.coalesce(F.sum("_c").over(wo), F.lit(0)).alias("_off")
    )
    rn = F.col("_off") + local
    extra = [rn.alias(rank_col)] if rank_col else []
    return (
        ranged.join(F.broadcast(offsets), rid == F.col("_rid"))
        .select(
            *df.columns,
            F.floor(rn / F.lit(int(rows_per_shard))).cast("int").alias(shard_col),
            *extra,
        )
    )


def hash_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    shard_col: str = "shard",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """shard = pmod(hash64(id), n_shards): one pure projection, no sort,
    no shuffle — deterministic membership at any scale and on streams."""
    from mrmr_spark.operators.dedup import hash64

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = hash64(F.col(id_col).cast("string"), seed, hash_fn)
    return df.withColumn(shard_col, F.pmod(h, F.lit(n_shards)).cast("int"))


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int | None = None,
    n_shards: int | None = None,
    order_by: list[str] | None = None,
    id_col: str = "doc_id",
    format: str = "parquet",
) -> dict:
    """Write the corpus as ``shard=K/`` directories under ``path``.
    Exactly one of ``rows_per_shard`` (sized mode: deterministic global
    order, exact sizes) or ``n_shards`` (hash mode) must be given.
    Rows are clustered by shard before the write so each shard lands as
    one file per written partition, ordered by ``(*order_by, id)``
    within — the sequential-read layout a training loader wants.

    Returns ``{"path", "format", "n_rows", "n_shards", "mode"}``.
    """
    if (rows_per_shard is None) == (n_shards is None):
        raise ValueError("pass exactly one of rows_per_shard / n_shards")
    if format not in ("parquet", "json"):
        raise ValueError(f"format must be 'parquet' or 'json', got {format!r}")
    pin: list = []
    if rows_per_shard is not None:
        mode = "sized"
        assigned = sized_shards(
            df, rows_per_shard, order_by=order_by, id_col=id_col, pin=pin
        )
    else:
        mode = "hash"
        assigned = hash_shards(df, n_shards, id_col=id_col)
    order = [F.col(c) for c in (order_by or [])] + [F.col(id_col)]
    (
        assigned.repartition("shard")
        .sortWithinPartitions(F.col("shard"), *order)
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(format)
        .save(path)
    )
    spark = df.sparkSession
    back = spark.read.format(format).load(path)
    out = {
        "path": path,
        "format": format,
        "n_rows": back.count(),
        "n_shards": back.select("shard").distinct().count(),
        "mode": mode,
    }
    for p in pin:
        p.unpersist()
    return out


def grouped_ranks(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    pin: list | None = None,
) -> DataFrame:
    """Exact 0-based rank WITHIN each group under
    ``(*order_cols, id_col)`` — the skew-safe replacement for a
    ``row_number() OVER (PARTITION BY group ...)`` window when one group
    can dominate the corpus (a plain window funnels that whole group
    through a single task; at 100 TB one 90%-domain means one straggler
    doing 90% of the work).

    Same two-phase shape as :func:`sized_shards`, grouped: range-exchange
    on ``(*group_cols, *order_cols, id_col)`` + local sort, pin the
    ordinals, then per-(partition, group) counts (a tiny frame: at most
    #partitions x #groups-touching-them rows) prefix-summed PER GROUP
    into exclusive offsets and broadcast back. The in-partition group
    start comes from a min-window bounded by one range partition. Every
    window in the plan is either over the counts frame or inside a
    single range partition — no single-task-per-group stage.

    Cardinality contract: the broadcast counts frame is at most
    #partitions x #groups-touching-them rows, and the range exchange on
    ``(*group_cols, ...)`` clusters each group into few partitions, so
    in practice it is O(#partitions + #groups). This operator targets
    bounded-cardinality skew-prone groups (domains, languages, sources);
    for millions of tiny groups a plain per-group window has no skew
    problem and is the right tool.
    """
    order = [F.col(c) for c in (*group_cols, *order_cols, id_col)]
    ranged = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    ranged.count()
    if pin is not None:
        pin.append(ranged)

    rid = F.shiftrightunsigned(F.col("_mid"), 33)
    counts = ranged.groupBy(rid.alias("_rid"), *group_cols).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wo = (
        Window.partitionBy(*group_cols)
        .orderBy("_rid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_rid",
        *[F.col(c).alias(f"_g_{c}") for c in group_cols],
        F.coalesce(F.sum("_c").over(wo), F.lit(0)).alias("_off"),
    )
    # group start inside the range partition: bounded by the partition
    gstart = F.min("_mid").over(Window.partitionBy(rid, *group_cols))
    cond = [rid == F.col("_rid")] + [
        F.col(c).eqNullSafe(F.col(f"_g_{c}")) for c in group_cols
    ]
    rn = F.col("_off") + (F.col("_mid") - F.col("_gs"))
    return (
        ranged.withColumn("_gs", gstart)
        .join(F.broadcast(offsets), cond, "inner")
        .select(*df.columns, rn.alias(rank_col))
    )
