"""Document deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Design: everything except the (optional) final exact-verify runs **entirely
JVM-side** — shingling is a codegen ``transform``+``explode``, hashing is
``xxhash64`` (seeded by a literal), MinHash signatures are K ``min``
aggregates, SimHash is 64 bit-count aggregates. No Python in any hot path;
at 100TB the only shuffles are the doc-id groupBys and the band/bucket join,
all key-partitioned and AQE-skew-splittable.

MinHash estimate: J(A,B) ≈ (# equal minhashes)/K; banding (b bands × r rows,
K = b·r) makes the candidate probability s-curve 1-(1-s^r)^b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """Distinct character n-gram shingles per document (JVM codegen)."""
    return (
        df.where(F.length(text_col) >= n)
        .select(
            id_col,
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length({text_col}) - {n - 1}),"
                        f" i -> substring({text_col}, i, {n}))"
                    )
                )
            ).alias("shingle"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical id + group size per document by normalized-text equality."""
    from pyspark.sql.window import Window

    key = F.lower(F.trim(F.col(text_col)))
    w = Window.partitionBy(key)
    return df.select(
        id_col,
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """K-permutation MinHash signature per doc: K seeded-xxhash64 ``min``
    aggregates in ONE scan (map-side partial agg does the heavy lifting)."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    Returns (doc_a, doc_b, est_jaccard) for pairs sharing >=1 LSH band,
    filtered by the MinHash Jaccard estimate >= min_jaccard.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sigs = minhash_signatures(char_shingles(df, text_col, id_col, n), num_hashes, id_col).persist()

    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col(f"mh{b * r + j}") for j in range(r)]).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    a, b = band_rows.alias("a"), band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )

    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    eq = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = (
        pairs.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select("doc_a", "doc_b", (eq / F.lit(float(num_hashes))).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= min_jaccard)
    )
    return est


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over whitespace tokens, as ``bits`` signed bit-count
    aggregates (JVM). Returns (id, simhash long)."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*aggs)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long") if b < 63 else bit * F.lit(-(1 << 63)).cast("long")
        sig = term if sig is None else sig + term
    return agg.select(id_col, sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    chunk_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, candidate-
    generated by exact match on one of the 64/chunk_bits chunks (pigeonhole:
    any pair within max_hamming < #chunks shares at least one chunk)."""
    sigs = simhash(df, text_col, id_col).persist()
    n_chunks = 64 // chunk_bits
    mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cv"),
    ).select(id_col, "simhash", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle."""
    sh = char_shingles(df, text_col, id_col, n)
    cnt = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    return (
        inter.join(F.broadcast(ca), F.col("doc_a") == F.col(f"ca.{id_col}"))
        .join(F.broadcast(cb), F.col("doc_b") == F.col(f"cb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
