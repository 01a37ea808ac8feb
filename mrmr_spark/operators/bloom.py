"""Bloom-filter membership (Bloom 1970; the CCNet/The-Pile-era dedup
pre-filter): build a bit array over a REFERENCE value set with one
distributed aggregation, then test corpus membership as a pure Column
projection — zero shuffle, zero Python, no join on the 10^12-row side.

Where it sits next to the exact paths:

- ``dedup_against`` (exact anti-join) shuffles corpus fingerprints by hash
  — the right tool when the reference is itself huge (a prior snapshot).
- A Bloom filter instead BROADCASTS the reference as ``n_bits/8`` bytes
  riding the plan (e.g. 2^23 bits = 1 MiB for ~10^6 items at 1% fpp), so
  probing 10^12 rows is map-side only. False positives exist by design;
  ``bloom_filter_against(verify=True)`` removes them with an exact
  semi-join whose shuffle is proportional to the FLAGGED rows only —
  n·fpp + true dups, not n.

The hash family is the dedup-layer ``hash64`` (seeded xxhash64 in
production; ``md5_60`` is the ANSI-SQL-reproducible twin the correctness
gate runs, where DuckDB rebuilds the identical bit array — false
positives included — proving bit-level agreement of the construction).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.dedup import hash64

# literal arrays ride the serialized plan to every task; cap the filter at
# 16 MiB of words. Past this, the reference is big enough that the exact
# dedup_against anti-join is the right primitive anyway.
_MAX_BITS = 1 << 27


def _positions(col: Column, n_bits: int, k_hashes: int, seed: int, hash_fn: str):
    """The k bit positions of a value: pmod(hash_i, n_bits), hash_i seeded
    ``seed*1000 + i`` (distinct 64-bit hashes, not the Kirsch-Mitzenmacher
    two-hash scheme — k is small and the gate needs each position
    independently SQL-reproducible)."""
    return [
        F.pmod(hash64(col, seed=seed * 1000 + i, hash_fn=hash_fn), F.lit(n_bits))
        for i in range(k_hashes)
    ]


def _validate(n_bits: int, k_hashes: int) -> None:
    if n_bits < 64 or n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    if n_bits > _MAX_BITS:
        raise ValueError(
            f"n_bits={n_bits} > {_MAX_BITS}: the filter rides the plan as a "
            "literal array; for references this large use the exact "
            "dedup_against anti-join instead"
        )
    if not (1 <= k_hashes <= 16):
        raise ValueError(f"k_hashes must be in [1, 16], got {k_hashes}")


def bloom_build(
    df: DataFrame,
    col: str = "text",
    n_bits: int = 1 << 23,
    k_hashes: int = 5,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> dict:
    """Build the filter: ONE map-side-combined aggregation — explode each
    value's k positions, group by 64-bit word index, ``bit_or`` the set
    bits — collecting at most ``n_bits/64`` rows to the driver (the word
    table is bounded by the filter size, never by the reference size).
    NULL values are skipped (they hash to NULL and cannot be members).

    Returns the filter dict: ``words`` (dense list of n_bits/64 int64
    words), ``n_bits``, ``k``, ``seed``, ``hash_fn``.
    """
    _validate(n_bits, k_hashes)
    pos = F.explode(F.array(*_positions(F.col(col), n_bits, k_hashes, seed, hash_fn)))
    rows = (
        df.where(F.col(col).isNotNull())
        .select(pos.alias("_pos"))
        .select(
            F.shiftright("_pos", 6).alias("_w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod("_pos", F.lit(64)).cast("int")
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_word"))
        .collect()
    )
    words = [0] * (n_bits >> 6)
    for r in rows:
        words[r["_w"]] = r["_word"]
    return {
        "words": words,
        "n_bits": n_bits,
        "k": k_hashes,
        "seed": seed,
        "hash_fn": hash_fn,
    }


def bloom_fpp(bloom: dict, n_items: int) -> float:
    """Expected false-positive probability for ``n_items`` inserted keys:
    (1 - e^(-k·n/m))^k — the standard sizing formula."""
    import math

    m, k = bloom["n_bits"], bloom["k"]
    return (1.0 - math.exp(-k * n_items / m)) ** k


def bloom_probe_expr(col: Column | str, bloom: dict) -> Column:
    """Membership test as ONE Column expression (zero shuffle, zero
    Python): all k positions' bits set. The word array is bound ONCE as a
    literal (the curation ``_bind`` trick — k probes share one array node
    instead of embedding k copies in the plan). NULL values probe to
    false. No false negatives by construction; false positives at the
    :func:`bloom_fpp` rate until verified."""
    col = F.col(col) if isinstance(col, str) else col
    n_bits, k, seed, fam = bloom["n_bits"], bloom["k"], bloom["seed"], bloom["hash_fn"]
    positions = _positions(col, n_bits, k, seed, fam)

    def _test(words: Column) -> Column:
        conds = []
        for pos in positions:
            word = F.element_at(words, (F.shiftright(pos, 6) + F.lit(1)).cast("int"))
            bit = F.pmod(pos, F.lit(64)).cast("int")
            conds.append(
                F.call_function("shiftright", word, bit).bitwiseAND(F.lit(1)) == F.lit(1)
            )
        return reduce(lambda a, b: a & b, conds)

    bound = F.get(
        F.transform(F.array(F.lit(bloom["words"])), _test), 0
    )
    return F.coalesce(bound, F.lit(False))


def bloom_filter_against(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 23,
    k_hashes: int = 5,
    seed: int = 7,
    hash_fn: str = "xxhash64",
    verify: bool = True,
    mode: str = "flag",
) -> DataFrame:
    """Incremental exact-dup check of ``corpus`` against ``reference``
    through a Bloom pre-filter: flag map-side, then (``verify=True``)
    confirm ONLY the flagged rows with an exact semi-join on the value —
    the verify shuffle carries n·fpp + true-dup rows, not the corpus.

    ``mode="flag"`` returns corpus + ``maybe_dup`` (+ ``is_dup`` when
    verifying); ``mode="drop"`` keeps only rows that are not (verified)
    duplicates. Bloom filters have no false negatives, so ``is_dup``
    equals the plain exact-membership answer — the gate row proves this
    end to end against a DuckDB ``IN`` oracle.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    bloom = bloom_build(
        reference, col=text_col, n_bits=n_bits, k_hashes=k_hashes, seed=seed,
        hash_fn=hash_fn,
    )
    flagged = corpus.withColumn(
        "maybe_dup", bloom_probe_expr(F.col(text_col), bloom)
    )
    if not verify:
        if mode == "drop":
            return flagged.where(~F.col("maybe_dup")).drop("maybe_dup")
        return flagged
    ref_vals = reference.select(F.col(text_col).alias("_ref_v")).distinct()
    hit_ids = (
        flagged.where("maybe_dup")
        .select(id_col, F.col(text_col).alias("_ref_v"))
        .join(ref_vals, "_ref_v", "left_semi")
        .select(F.col(id_col).alias("_hit_id"))
        .withColumn("_is_dup", F.lit(True))
    )
    out = flagged.join(
        hit_ids, flagged[id_col] == hit_ids["_hit_id"], "left"
    ).select(
        *[flagged[c] for c in flagged.columns],
        F.coalesce("_is_dup", F.lit(False)).alias("is_dup"),
    )
    if mode == "drop":
        return out.where(~F.col("is_dup")).drop("maybe_dup", "is_dup")
    return out
