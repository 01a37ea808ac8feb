"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce``: exact cosine top-k of queries vs corpus, all JVM-side
  (``zip_with``/``aggregate`` for the dot product, broadcast of the query
  side, window top-k). The correctness baseline.
- ``ann_lsh``: random-hyperplane LSH — signatures via ONE Arrow GEMM per
  partition (NumPy matrix multiply, the legitimate Python-vectorized path),
  bucketed candidate join, exact cosine re-rank inside buckets. The scale
  path: at 10^12 vectors the bucket join replaces the O(Q·N) cross join.
- ``ann_ivf``: IVF-Flat — spherical k-means coarse quantizer trained on a
  bounded driver-side sample, distributed one-GEMM-per-batch assignment to
  inverted lists, query probes ``n_probe`` lists, exact re-rank on the
  probed candidates only. The second scale path: list sizes are ~n/n_lists
  by construction (k-means balances mass), vs LSH's distribution-dependent
  bucket sizes.

Hyperplanes are seeded NumPy normals and k-means is seeded on a
deterministic-hash sample — deterministic across runs/cluster sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a: str, b: str):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _as_double(df: DataFrame, emb_col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.transform(emb_col, lambda x: x.cast("double")))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, vec_id, rank, sim). Queries broadcast."""
    c = _as_double(corpus, emb_col, "_e").select(id_col, "_e")
    q = _as_double(queries, emb_col, "_qe").select(
        F.col(id_col).alias("q_id"), F.col("_qe")
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col(id_col) != F.col("q_id"))
        .select("q_id", id_col, _cosine("_qe", "_e").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, F.col("rank").cast("int").alias("rank"), "sim")
    )


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = 1,
    table_seed_stride: int = 1000,
) -> DataFrame:
    """Random-hyperplane signatures per vector via ONE NumPy GEMM per Arrow
    batch — for ALL ``n_tables`` hash tables at once (a single
    (dim × n_tables·n_planes) GEMM and a single Python stage in the plan,
    instead of one mapInArrow per table). Output: (id, table, bucket), one
    row per table. Table t's planes are seeded ``seed + table_seed_stride·t``
    — identical values to building each table separately."""
    planes = np.concatenate(
        [
            np.random.default_rng(seed + table_seed_stride * t).normal(size=(dim, n_planes))
            for t in range(n_tables)
        ],
        axis=1,
    )
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    proj = df.select(id_col, F.transform(emb_col, lambda x: x.cast("double")).alias("_e"))

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if not b.num_rows:
                continue
            ids_np = b.column(0).to_numpy(zero_copy_only=False)
            # zero-copy-ish: flatten the list column and reshape (fixed dim)
            emb = (
                b.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, dim)
                .astype(np.float64)
            )
            bits = (emb @ planes) > 0.0                       # (n, T·P)
            sig = bits.reshape(len(emb), n_tables, n_planes) @ weights  # (n, T)
            out_ids = np.repeat(ids_np, n_tables)
            out_tbl = np.tile(np.arange(n_tables, dtype=np.int32), len(emb))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids),
                    pa.array(out_tbl, type=pa.int32()),
                    pa.array(sig.reshape(-1).astype(np.int64), type=pa.int64()),
                ],
                [id_col, "table", "bucket"],
            )

    return proj.mapInArrow(mapper, f"`{id_col}` long, table int, bucket long")


def embedding_near_dup(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    pin: list | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) for pairs
    with cosine >= threshold that collide in >=1 hyperplane-LSH table.

    The self-join analog of ``ann_lsh``: one Arrow GEMM pass computes all
    tables' signatures, the bucket join generates candidates (never
    all-pairs), exact cosine verifies. Recall is the standard multi-table
    amplification 1-(1-p^n_planes)^n_tables with p = 1-θ/π — raise
    n_tables for near-1.0 recall at high thresholds (θ small). At 10^12
    vectors the bucket join is the only quadratic-risk stage; raise
    n_planes so expected bucket sizes stay bounded.
    """
    # pin the signatures: both self-join sides read them, and re-executing
    # the lineage would run the Arrow GEMM over the full corpus twice. The
    # pinned frame is (id, table, bucket) — n_tables longs per vector, no
    # embeddings. Same precedent as minhash/ngram/winnow candidate gens.
    sig = lsh_signatures(
        corpus, dim, n_planes, seed, id_col, emb_col, n_tables=n_tables
    ).persist()
    if pin is not None:
        pin.append(sig)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    c = _as_double(corpus, emb_col, "_e").select(id_col, "_e")
    return (
        cand.join(c.select(F.col(id_col).alias("id_a"), F.col("_e").alias("_ea")), "id_a")
        .join(c.select(F.col(id_col).alias("id_b"), F.col("_e").alias("_eb")), "id_b")
        .select("id_a", "id_b", _cosine("_ea", "_eb").alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def ivf_train(
    corpus: DataFrame,
    dim: int,
    n_lists: int = 64,
    iters: int = 5,
    sample_n: int = 100_000,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Train IVF coarse-quantizer centroids: spherical k-means (Lloyd on
    unit vectors) over a deterministic seeded sample collected to the driver.

    The sample is bounded (``sample_n``) and chosen by ``xxhash64(id, seed)``
    order, so the centroids are identical across runs and cluster sizes —
    the same determinism contract as the LSH hyperplanes. At 10^12 vectors
    training still sees only ``sample_n`` rows; the expensive phase
    (assignment) stays distributed in ``ivf_assign``.
    Returns (n_lists, dim) float64 unit-norm centroids.
    """
    samp = (
        _as_double(corpus, emb_col, "_e")
        .select(id_col, "_e")
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample_n)
        .toPandas()
    )
    if len(samp) == 0:
        # match the selection APIs' degenerate-input behavior: a clear
        # error instead of np.stack/rng.choice exploding on empties
        raise ValueError(
            f"ivf_train: corpus has no rows in column '{emb_col}' — "
            "cannot train a quantizer on an empty sample"
        )
    X = np.stack(samp["_e"].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(X))
    C = X[rng.choice(len(X), size=n_lists, replace=False)].copy()
    for _ in range(iters):
        asg = np.argmax(X @ C.T, axis=1)
        for j in range(n_lists):
            m = asg == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
            # empty list: keep the previous centroid (seeded-init row)
    return C


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by cosine —
    ONE NumPy GEMM per Arrow batch (same vectorized shape as
    ``lsh_signatures``). Output: (id, list_id), one row per probe.
    Ties break toward the lowest list_id (np.argsort is stable on the
    negated similarities)."""
    C = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(C))
    dim = C.shape[1]
    proj = df.select(id_col, F.transform(emb_col, lambda x: x.cast("double")).alias("_e"))

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if not b.num_rows:
                continue
            ids_np = b.column(0).to_numpy(zero_copy_only=False)
            emb = (
                b.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, dim)
                .astype(np.float64)
            )
            emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            sims = emb @ C.T                                  # (n, n_lists)
            if n_probe == 1:
                lists = np.argmax(sims, axis=1)[:, None]
            else:
                lists = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids_np, n_probe)),
                    pa.array(lists.reshape(-1).astype(np.int32), type=pa.int32()),
                ],
                [id_col, "list_id"],
            )

    return proj.mapInArrow(mapper, f"`{id_col}` long, list_id int")


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 64,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF-Flat: coarse k-means quantizer -> inverted
    lists -> exact cosine re-rank inside the probed lists.

    The second scale path next to ``ann_lsh`` (SURVEY task brief: "an IVF or
    LSH-bucketed variant"): corpus vectors land in exactly ONE list (bucket
    sizes ~n/n_lists, an equi-join on an int key), queries probe ``n_probe``
    lists, so the re-rank scans ~n·n_probe/n_lists candidates per query
    instead of n. Recall/latency dials: n_lists up = cheaper lists, lower
    recall per probe; n_probe up = recall toward exact. Pass precomputed
    ``centroids`` to skip training (the gate oracle does, for
    SQL-reproducibility).
    """
    if centroids is None:
        centroids = ivf_train(
            corpus, dim, n_lists=n_lists, seed=seed, id_col=id_col, emb_col=emb_col
        )
    c_asg = ivf_assign(corpus, centroids, 1, id_col, emb_col)
    q_asg = ivf_assign(queries, centroids, n_probe, id_col, emb_col).select(
        F.col(id_col).alias("q_id"), "list_id"
    )
    cand = (
        q_asg.join(c_asg, "list_id")
        .where(F.col(id_col) != F.col("q_id"))
        .select("q_id", id_col)
        .distinct()
    )
    c = _as_double(corpus, emb_col, "_e").select(id_col, "_e")
    q = _as_double(queries, emb_col, "_qe").select(F.col(id_col).alias("q_id"), "_qe")
    sims = (
        cand.join(c, id_col)
        .join(F.broadcast(q), "q_id")
        .select("q_id", id_col, _cosine("_qe", "_e").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, F.col("rank").cast("int").alias("rank"), "sim")
    )


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Candidates = union over ``n_tables`` independent hash tables of
    same-bucket pairs (standard recall amplification: P[cand] =
    1-(1-p^n_planes)^n_tables), then exact cosine re-rank. Dials:
    n_planes (bucket size down, precision up), n_tables (recall up).
    All tables' signatures come from ONE Arrow GEMM pass per side.
    """
    def sigs(df, alias_id):
        s = lsh_signatures(
            df, dim, n_planes, seed, id_col, emb_col, n_tables=n_tables
        )
        return s.select(F.col(id_col).alias(alias_id), "table", "bucket")

    c_sig = sigs(corpus, id_col)
    q_sig = sigs(queries, "q_id")
    cand = (
        q_sig.join(c_sig, ["table", "bucket"])
        .where(F.col(id_col) != F.col("q_id"))
        .select("q_id", id_col)
        .distinct()
    )
    c = _as_double(corpus, emb_col, "_e").select(id_col, "_e")
    q = _as_double(queries, emb_col, "_qe").select(F.col(id_col).alias("q_id"), "_qe")
    sims = (
        cand.join(c, id_col)
        .join(F.broadcast(q), "q_id")
        .select("q_id", id_col, _cosine("_qe", "_e").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, F.col("rank").cast("int").alias("rank"), "sim")
    )


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_levels: int = 127,
    with_error_stats: bool = False,
) -> DataFrame:
    """Per-vector symmetric int8-style scalar quantization of an embedding
    column — the standard 4x memory/IO shrink before ANN indexing at
    10^12-vector scale (brute-force and IVF re-rank both stream ~4 bytes
    -> 1 byte per dimension).

    q_i = clamp(floor(x_i / scale + 0.5), -n_levels, n_levels) with
    scale = max_i |x_i| / n_levels, emitted as ``q`` (array<int>) plus
    ``scale``. All-zero vectors quantize to zeros with scale 0. The
    rounding is floor(x+0.5) (half-up) explicitly — not a library
    ``round`` — so the values are bit-reproducible in ANSI SQL, which is
    how the gate oracles this operator.

    ``with_error_stats`` adds the dequantization diagnostics ``max_abs_err``
    (<= scale/2 by construction; asserted in pytest) and ``cos_dequant``
    (cosine between original and dequantized vector).

    Pure Column expressions over the array (zero shuffle, zero Python);
    arithmetic in float64 on float32 inputs (exact widening).
    """
    e = F.transform(F.col(emb_col), lambda x: x.cast("double"))

    def _q(ed, scale):
        return F.transform(
            ed,
            lambda x: F.greatest(
                F.lit(-n_levels),
                F.least(F.lit(n_levels), F.floor(x / scale + F.lit(0.5))),
            ).cast("int"),
        )

    def _build(ed):
        scale = F.array_max(F.transform(ed, F.abs)) / F.lit(float(n_levels))
        q = F.when(scale > 0, _q(ed, scale)).otherwise(
            F.transform(ed, lambda x: F.lit(0))
        )
        return F.struct(q.alias("q"), scale.alias("scale"))

    out = df.select("*", F.inline(F.array(_get_once(e, _build))))
    if not with_error_stats:
        return out
    dq = F.transform("q", lambda qi: qi.cast("double") * F.col("scale"))
    err = F.array_max(
        F.zip_with(F.col(emb_col), dq, lambda x, d: F.abs(x.cast("double") - d))
    )
    # cosine over the double-cast original: float32 x*x inside the fold
    # would lose ~1e-8 relative precision vs the double dequant side
    cos = _cosine(F.transform(F.col(emb_col), lambda x: x.cast("double")), "_dq")
    return (
        out.withColumn("_dq", dq)
        .select("*", err.alias("max_abs_err"), cos.alias("cos_dequant"))
        .drop("_dq")
    )


def _get_once(x, f):
    """Evaluate ``x`` once, feed it to ``f`` as a lambda variable (the
    interpreted-HOF single-evaluation bind; see curation._bind)."""
    return F.get(F.transform(F.array(x), f), 0)


def semdedup(
    corpus: DataFrame,
    dim: int,
    eps: float = 0.95,
    n_lists: int = 64,
    centroids: np.ndarray | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    keep: str = "far_from_centroid",
    pin: list | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embeddings
    with a k-means coarse quantizer, then WITHIN each cluster drop every
    vector whose cosine similarity to a better-ranked cluster member
    exceeds ``eps``. Returns one row per vector:
    ``(id_col, list_id, centroid_sim, keep)``.

    ``keep="far_from_centroid"`` is the paper's rule — rank within a
    cluster by ascending centroid similarity (most atypical first, the
    diversity-maximizing choice), drop i iff some pair (j, i) with
    sim > eps has rank_j < rank_i. ``keep="min_id"`` ranks by id — the
    keep-first convention of the rest of the dedup family. Either way
    the drop decision is single-pass (a pair only ever drops its
    higher-ranked side), no iteration and no transitive clustering.

    Scale: the quadratic work is per-CLUSTER by construction — the
    paper's own design point (n_lists is chosen so clusters are small,
    e.g. 50k lists over 100M docs); the pair join is an equi-join on
    ``list_id``, never a corpus self-join, and a skewed cluster is
    capped by raising ``n_lists``. The ranked frame feeds both sides of
    the self-join — pass ``pin`` (a list) to persist it and receive the
    handle (the pack_documents/dedup contract); unpinned, the
    deterministic lineage is recomputed once. Pass ``centroids`` to skip
    :func:`ivf_train` (the gate oracle does, for SQL-reproducibility —
    ranking by centroid_sim compares doubles computed through slightly
    different parenthesizations across engines, so as with the sampler
    oracles, hash agreement doubles as evidence the ulps never flip a
    rank). Cites the dedup family conventions at
    `mrmr_spark/operators/dedup.py:354` (canonical = best-ranked copy).
    """
    if keep not in ("far_from_centroid", "min_id"):
        raise ValueError(f"keep must be 'far_from_centroid' or 'min_id', got {keep!r}")
    if not (0.0 < eps < 1.0):
        raise ValueError("eps must be in (0, 1)")
    if centroids is None:
        centroids = ivf_train(
            corpus, dim, n_lists=n_lists, seed=seed, id_col=id_col, emb_col=emb_col
        )
    asg = ivf_assign(corpus, centroids, 1, id_col, emb_col)
    e = _as_double(corpus, emb_col, "_e").select(id_col, "_e")
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(np.asarray(centroids))],
        f"list_id int, _c array<double>",
    )
    base = (
        asg.join(e, id_col)
        .join(F.broadcast(cent), "list_id")
        .select(id_col, "list_id", "_e", _cosine("_e", "_c").alias("centroid_sim"))
    )
    order = (
        [F.col("centroid_sim").asc(), F.col(id_col).asc()]
        if keep == "far_from_centroid"
        else [F.col(id_col).asc()]
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(Window.partitionBy("list_id").orderBy(*order))
        .alias("_rk"),
    )
    if pin is not None:
        ranked = ranked.persist()
        pin.append(ranked)
    lo = ranked.select(
        "list_id", F.col("_e").alias("_ei"), F.col("_rk").alias("_ri")
    )
    hi = ranked.select(
        F.col(id_col), "list_id", F.col("_e").alias("_ej"), F.col("_rk").alias("_rj")
    )
    drops = (
        lo.join(hi, "list_id")
        .where(F.col("_ri") < F.col("_rj"))
        .where(_cosine("_ei", "_ej") > eps)
        .select(id_col)
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return ranked.join(drops, id_col, "left").select(
        id_col,
        "list_id",
        "centroid_sim",
        F.col("_dup").isNull().alias("keep"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011 — "Product Quantization
# for Nearest Neighbor Search", IVFADC). The third ANN scale path next to
# ann_lsh / ann_ivf: compress each vector to m sub-codes (dim float32 ->
# m bytes, e.g. 256 B -> 8 B), then answer top-k with Asymmetric Distance
# Computation (ADC): per query one (m x ksub) lookup table of exact
# subspace distances, per corpus vector m table lookups — never a float
# recompute against the raw vectors. At 10^12 vectors this is the only
# family whose INDEX fits a cluster's memory.
# ---------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 256,
    iters: int = 10,
    sample_n: int = 100_000,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Train the ``m`` per-subspace PQ codebooks: plain (L2) Lloyd k-means
    with ``ksub`` centroids over each dim/m-wide slice of a bounded
    deterministic driver sample — the same determinism contract as
    :func:`ivf_train` (xxhash64-ordered sample, seeded init, empty
    clusters keep their previous centroid). Training sees ``sample_n``
    rows at ANY corpus size; the distributed phase is :func:`pq_encode`.
    Returns float64 codebooks of shape (m, ksub, dim//m).
    """
    if dim % m != 0:
        raise ValueError(f"pq_train: dim={dim} is not divisible by m={m}")
    samp = (
        _as_double(corpus, emb_col, "_e")
        .select(id_col, "_e")
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample_n)
        .toPandas()
    )
    if len(samp) == 0:
        raise ValueError(
            f"pq_train: corpus has no rows in column '{emb_col}' — "
            "cannot train codebooks on an empty sample"
        )
    X = np.stack(samp["_e"].to_numpy()).astype(np.float64)
    if X.shape[1] != dim:
        raise ValueError(f"pq_train: embeddings have dim {X.shape[1]}, expected {dim}")
    ksub = min(ksub, len(X))
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=ksub, replace=False)].copy()
        for _ in range(iters):
            # squared L2 as a direct (n, ksub, dsub) diff — no x^2+c^2-2xc
            # cancellation, so encode-side distances reproduce these exactly
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
            asg = np.argmin(d2, axis=1)
            for c in range(ksub):
                msk = asg == c
                if msk.any():
                    C[c] = S[msk].mean(axis=0)
        books[j] = C
    return books


def _check_codebooks(codebooks: np.ndarray) -> np.ndarray:
    B = np.asarray(codebooks, dtype=np.float64)
    if B.ndim != 3:
        raise ValueError(
            f"codebooks must have shape (m, ksub, dsub); got ndim={B.ndim}"
        )
    return B


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    code_col: str = "code",
) -> DataFrame:
    """Encode each vector to its ``m`` nearest-subspace-centroid codes:
    ONE Arrow batch kernel (a (batch, ksub, dsub) squared-diff reduction
    per subspace — the same vectorized shape as :func:`ivf_assign`), zero
    shuffle. Output ``(id_col, code_col: array<smallint>)`` — the 4·dim ->
    m byte index row. Ties break toward the lowest code (np.argmin is
    first-occurrence). Distances are computed as direct squared
    differences (sum((x-c)^2)), NEVER the x^2+c^2-2xc expansion, so the
    codes match an ANSI-SQL re-derivation bit-for-bit (the gate oracles
    this operator; cancellation in the expanded form flips argmin ties).
    """
    B = _check_codebooks(codebooks)
    m, ksub, dsub = B.shape
    dim = m * dsub
    proj = df.select(
        id_col, F.transform(emb_col, lambda x: x.cast("double")).alias("_e")
    )

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if not b.num_rows:
                continue
            ids_np = b.column(0).to_numpy(zero_copy_only=False)
            X = (
                b.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, dim)
                .astype(np.float64)
            )
            codes = np.empty((b.num_rows, m), dtype=np.int16)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=-1)
                codes[:, j] = np.argmin(d2, axis=1).astype(np.int16)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_np),
                    pa.array(list(codes), type=pa.list_(pa.int16())),
                ],
                [id_col, code_col],
            )

    return proj.mapInArrow(mapper, f"`{id_col}` long, `{code_col}` array<smallint>")


def _collect_query_mat(
    queries: DataFrame, id_col: str, emb_col: str, max_queries: int
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded driver-side collect of the query table (ids, float64 matrix).
    ADC builds one (m x ksub) lookup table per query, so the query side is
    driver-bounded by design — the corpus side is the 10^12 half."""
    qp = (
        _as_double(queries, emb_col, "_qe")
        .select(id_col, "_qe")
        .limit(max_queries + 1)
        .toPandas()
    )
    if len(qp) > max_queries:
        raise ValueError(
            f"pq_search: more than max_queries={max_queries} query rows — "
            "ADC broadcasts one (m x ksub) LUT per query; raise max_queries "
            "only with the executor memory to carry the LUT tensor"
        )
    if len(qp) == 0:
        raise ValueError("pq_search: queries has no rows")
    qids = qp[id_col].to_numpy()
    Q = np.stack(qp["_qe"].to_numpy()).astype(np.float64)
    return qids, Q


def pq_search(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    metric: str = "l2",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    code_col: str = "code",
    exclude_self: bool = True,
    max_queries: int = 1024,
) -> DataFrame:
    """Asymmetric Distance Computation top-k over a PQ-coded corpus
    (Jégou 2011 §4.1): per query, the exact subspace distances to every
    codebook centroid form an (m x ksub) lookup table; the approximate
    distance to a corpus vector is the sum of its m coded entries —
    m table lookups per vector, the raw corpus is never read.

    Distributed shape: queries are a bounded driver-side collect (the LUT
    tensor, Q x m x ksub float64, rides the task closure); the corpus codes
    stream through ONE Arrow kernel that emits only the per-batch top-k per
    query under the total order (adist, id) — so the exchange that feeds
    the final global top-k window carries <= Q*k rows per batch, never the
    corpus. Top-k is decomposable, so batch-local pruning is exact.

    ``metric="l2"`` ranks by ascending squared-L2 estimate (the paper's
    ADC); ``metric="ip"`` by descending inner-product estimate. The LUT
    entries and the m-term sum are evaluated in fixed ascending-subspace
    order — reproducible in ANSI SQL (gate row ``pq_search``).
    Returns ``(q_id, id_col, rank, adist)``.
    """
    if metric not in ("l2", "ip"):
        raise ValueError(f"metric must be 'l2' or 'ip', got {metric!r}")
    B = _check_codebooks(codebooks)
    m, ksub, dsub = B.shape
    qids, Qm = _collect_query_mat(queries, id_col, emb_col, max_queries)
    if Qm.shape[1] != m * dsub:
        raise ValueError(
            f"pq_search: query dim {Qm.shape[1]} != codebook dim {m * dsub}"
        )
    nq = len(qids)
    lut = np.empty((nq, m, ksub), dtype=np.float64)
    for j in range(m):
        Sq = Qm[:, j * dsub : (j + 1) * dsub]
        if metric == "l2":
            lut[:, j, :] = ((Sq[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=-1)
        else:
            lut[:, j, :] = Sq @ B[j].T
    sign = 1.0 if metric == "l2" else -1.0
    bad = np.inf if metric == "l2" else -np.inf

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if not b.num_rows:
                continue
            ids_np = b.column(0).to_numpy(zero_copy_only=False)
            cd = (
                b.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, m)
                .astype(np.int64)
            )
            # ascending-j accumulation: the SQL oracle sums the same order
            D = lut[:, 0, cd[:, 0]].copy()
            for j in range(1, m):
                D += lut[:, j, cd[:, j]]
            out_q, out_v, out_d = [], [], []
            for qi in range(nq):
                d = D[qi]
                if exclude_self:
                    d = np.where(ids_np == qids[qi], bad, d)
                top = np.lexsort((ids_np, sign * d))[:k]
                keep = np.isfinite(d[top])
                top = top[keep]
                out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
                out_v.append(ids_np[top])
                out_d.append(d[top])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_v)),
                    pa.array(np.concatenate(out_d)),
                ],
                ["q_id", id_col, "adist"],
            )

    part = codes.select(id_col, code_col).mapInArrow(
        mapper, f"q_id long, `{id_col}` long, adist double"
    )
    order = (
        [F.col("adist").asc(), F.col(id_col).asc()]
        if metric == "l2"
        else [F.col("adist").desc(), F.col(id_col).asc()]
    )
    w = Window.partitionBy("q_id").orderBy(*order)
    return (
        part.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, F.col("rank").cast("int").alias("rank"), "adist")
    )


def ann_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 256,
    n_lists: int = 64,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    refine: int = 0,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_queries: int = 1024,
) -> DataFrame:
    """IVFADC (Jégou 2011 §5): the IVF coarse quantizer prunes the corpus
    to ``n_probe`` inverted lists per query, and within the probed lists
    distances come from PQ codes of the RESIDUAL x/||x|| - centroid(list)
    — the paper's memory layout (one byte-scale code per vector) with the
    paper's accuracy trick (residuals are centered, so the codebooks spend
    their ksub levels on a much tighter ball than raw vectors).

    All vectors are unit-normalized first, so ascending squared-L2 ADC
    ranking is exactly descending-cosine ranking — the same order the
    rest of the similarity family returns. Per (query, probed list) the
    LUT targets q - c_list; corpus-side work stays m lookups per
    candidate inside ONE Arrow kernel emitting per-batch top-k only.

    ``refine=r > 0`` re-ranks the ADC top-(r*k) with exact cosine against
    the raw embeddings (Jégou's IVFADC-R) — the join touches r*k rows per
    query, not the corpus. Returns ``(q_id, id_col, rank, score)`` where
    score is -adist (refine=0) or the exact cosine (refine>0), both
    descending-better.
    """
    if centroids is None:
        centroids = ivf_train(
            corpus, dim, n_lists=n_lists, seed=seed, id_col=id_col, emb_col=emb_col
        )
    C = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(C))
    # residual frame: unit vector minus its single nearest centroid
    asg = ivf_assign(corpus, C, 1, id_col, emb_col)
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "list_id int, _c array<double>",
    )
    e = _as_double(corpus, emb_col, "_e").select(id_col, "_e")
    norm = F.sqrt(F.aggregate("_e", F.lit(0.0), lambda a, x: a + x * x))
    resid = (
        asg.join(e, id_col)
        .join(F.broadcast(cent), "list_id")
        .withColumn("_n", F.greatest(norm, F.lit(1e-12)))
        .select(
            id_col,
            "list_id",
            F.zip_with(F.transform("_e", lambda x: x / F.col("_n")), "_c",
                       lambda x, c: x - c).alias("_r"),
        )
    )
    if codebooks is None:
        codebooks = pq_train(
            resid, dim, m=m, ksub=ksub, seed=seed, id_col=id_col, emb_col="_r"
        )
    B = _check_codebooks(codebooks)
    m, ksub, dsub = B.shape
    coded = pq_encode(resid.select(id_col, "list_id", "_r"), B, id_col, "_r", "code")
    coded = coded.join(resid.select(id_col, "list_id"), id_col)

    qids, Qm = _collect_query_mat(queries, id_col, emb_col, max_queries)
    Qm = Qm / np.maximum(np.linalg.norm(Qm, axis=1, keepdims=True), 1e-12)
    probed = np.argsort(-(Qm @ C.T), axis=1, kind="stable")[:, :n_probe]
    nq = len(qids)
    # LUT per (query, probed list): targets q - c_list
    lut = np.empty((nq, n_probe, m, ksub), dtype=np.float64)
    for qi in range(nq):
        for pi, L in enumerate(probed[qi]):
            t = Qm[qi] - C[L]
            for j in range(m):
                tj = t[j * dsub : (j + 1) * dsub]
                lut[qi, pi, j, :] = ((tj[None, :] - B[j]) ** 2).sum(axis=-1)

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if not b.num_rows:
                continue
            ids_np = b.column(0).to_numpy(zero_copy_only=False)
            cd = (
                b.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, m)
                .astype(np.int64)
            )
            lists_np = b.column(2).to_numpy(zero_copy_only=False)
            out_q, out_v, out_d = [], [], []
            for qi in range(nq):
                dists, vids = [], []
                for pi in range(n_probe):
                    msk = lists_np == probed[qi, pi]
                    if not msk.any():
                        continue
                    sub = cd[msk]
                    d = lut[qi, pi, 0, sub[:, 0]].copy()
                    for j in range(1, m):
                        d += lut[qi, pi, j, sub[:, j]]
                    sid = ids_np[msk]
                    ok = sid != qids[qi]
                    dists.append(d[ok])
                    vids.append(sid[ok])
                if not dists:
                    continue
                d = np.concatenate(dists)
                v = np.concatenate(vids)
                top = np.lexsort((v, d))[: max(k, k * refine)]
                out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
                out_v.append(v[top])
                out_d.append(d[top])
            if not out_q:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_v)),
                    pa.array(np.concatenate(out_d)),
                ],
                ["q_id", id_col, "adist"],
            )

    part = coded.select(id_col, "code", "list_id").mapInArrow(
        mapper, f"q_id long, `{id_col}` long, adist double"
    )
    kk = max(k, k * refine)
    w = Window.partitionBy("q_id").orderBy(F.col("adist").asc(), F.col(id_col).asc())
    adc = (
        part.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
    )
    if refine <= 0:
        return adc.where(F.col("rank") <= k).select(
            "q_id",
            id_col,
            F.col("rank").cast("int").alias("rank"),
            (-F.col("adist")).alias("score"),
        )
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(qids, Qm)],
        f"q_id long, _qe array<double>",
    )
    exact = (
        adc.select("q_id", id_col)
        .join(e, id_col)
        .join(F.broadcast(qdf), "q_id")
        .select("q_id", id_col, _cosine("_qe", "_e").alias("score"))
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, F.col("rank").cast("int").alias("rank"), "score")
    )
