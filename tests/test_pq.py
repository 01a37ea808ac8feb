"""Product-quantization family (Jégou 2011): pq_train / pq_encode /
pq_search (ADC) / ann_ivf_pq (IVFADC, residual codes, optional exact
refine). Oracles are straight numpy re-derivations of the paper's math."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.similarity import (
    ann_ivf_pq,
    ivf_train,
    knn_bruteforce,
    pq_encode,
    pq_search,
    pq_train,
)


@pytest.fixture(scope="module")
def pq_vectors(spark):
    """240 x 16 with planted clusters (PQ needs structure for recall)."""
    rng = np.random.default_rng(31)
    A = rng.normal(size=(12, 16)) * 3.0
    X = np.concatenate([A[i] + rng.normal(scale=0.4, size=(20, 16)) for i in range(12)])
    X = X.astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(len(X)), "embedding": [list(map(float, v)) for v in X]}
    )
    sdf = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    return sdf.cache(), X.astype(np.float64)


def _np_encode(X, B):
    m, ksub, dsub = B.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = np.argmin(((S[:, None, :] - B[j][None]) ** 2).sum(-1), axis=1)
    return codes


def _np_adc(Qm, qids, ids, codes, B, k, metric="l2", exclude_self=True):
    m, ksub, dsub = B.shape
    rows = []
    for qi, qid in enumerate(qids):
        lut = np.empty((m, ksub))
        for j in range(m):
            s = Qm[qi, j * dsub : (j + 1) * dsub]
            lut[j] = (
                ((s[None] - B[j]) ** 2).sum(-1) if metric == "l2" else B[j] @ s
            )
        D = lut[np.arange(m)[None, :], codes].sum(1)
        if exclude_self:
            D = np.where(ids == qid, np.inf if metric == "l2" else -np.inf, D)
        sign = 1.0 if metric == "l2" else -1.0
        top = np.lexsort((ids, sign * D))[:k]
        for r, t in enumerate(top):
            rows.append((qid, ids[t], r + 1, D[t]))
    return pd.DataFrame(rows, columns=["q_id", "vec_id", "rank", "adist"])


def test_pq_train_shapes_and_determinism(pq_vectors):
    sdf, X = pq_vectors
    B1 = pq_train(sdf, 16, m=4, ksub=16, iters=4)
    B2 = pq_train(sdf.repartition(7), 16, m=4, ksub=16, iters=4)
    assert B1.shape == (4, 16, 4)
    assert np.array_equal(B1, B2), "codebooks must be partitioning-invariant"


def test_pq_train_validation(pq_vectors):
    sdf, _ = pq_vectors
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(sdf, 16, m=5)
    with pytest.raises(ValueError, match="empty sample"):
        pq_train(sdf.where(F.lit(False)), 16, m=4)


def test_pq_encode_matches_numpy(pq_vectors):
    sdf, X = pq_vectors
    B = pq_train(sdf, 16, m=4, ksub=16, iters=4)
    got = (
        pq_encode(sdf, B)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp = _np_encode(X, B)
    assert got["code"].map(len).eq(4).all()
    got_codes = np.stack(got["code"].map(np.asarray).to_numpy()).astype(np.int64)
    assert np.array_equal(got_codes, exp)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_pq_search_matches_numpy_adc(pq_vectors, metric):
    sdf, X = pq_vectors
    B = pq_train(sdf, 16, m=4, ksub=16, iters=4)
    codes = pq_encode(sdf, B)
    q = sdf.where(F.col("vec_id") < 6)
    got = (
        pq_search(codes, q, B, k=4, metric=metric)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    ids = np.arange(len(X))
    exp = _np_adc(X[:6], ids[:6], ids, _np_encode(X, B), B, 4, metric)
    assert np.array_equal(
        got[["q_id", "vec_id", "rank"]].to_numpy(), exp[["q_id", "vec_id", "rank"]].to_numpy()
    )
    assert np.allclose(got["adist"], exp["adist"], rtol=0, atol=1e-12)


def test_pq_search_partitioning_invariant(pq_vectors):
    """Per-batch top-k pruning + the global window must be exact at any
    partitioning (top-k is decomposable)."""
    sdf, _ = pq_vectors
    B = pq_train(sdf, 16, m=4, ksub=16, iters=4)
    q = sdf.where(F.col("vec_id") < 6)
    a = pq_search(pq_encode(sdf, B), q, B, k=4).toPandas()
    b = pq_search(pq_encode(sdf.repartition(13), B), q, B, k=4).toPandas()
    key = ["q_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pq_search_validation(pq_vectors):
    sdf, _ = pq_vectors
    B = pq_train(sdf, 16, m=4, ksub=8, iters=2)
    codes = pq_encode(sdf, B)
    q = sdf.where(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="metric"):
        pq_search(codes, q, B, metric="cosine")
    with pytest.raises(ValueError, match="max_queries"):
        pq_search(codes, sdf, B, max_queries=10)
    with pytest.raises(ValueError, match="no rows"):
        pq_search(codes, q.where(F.lit(False)), B)


def test_pq_recall_as_candidate_generator(pq_vectors):
    """ADC is a candidate generator (a refine step re-ranks exactly):
    the exact L2 top-5 must sit inside the ADC top-20 nearly always, and
    finer codebooks (more subspaces) must not lower direct top-5 recall.
    (Direct top-5-in-top-5 recall is inherently modest for PQ — measured
    0.56 at m=4/ksub=32 on this fixture vs 1.0 candidate recall.)"""
    sdf, X = pq_vectors
    q = sdf.where(F.col("vec_id") < 20)
    # exact L2 neighbors
    exact = {}
    for qi in range(20):
        d = ((X - X[qi]) ** 2).sum(1)
        d[qi] = np.inf
        exact[qi] = set(np.argsort(d)[:5])

    def recall(m, ksub, k):
        B = pq_train(sdf, 16, m=m, ksub=ksub, iters=6)
        got = pq_search(pq_encode(sdf, B), q, B, k=k).toPandas()
        sets = got.groupby("q_id")["vec_id"].apply(set)
        return np.mean([len(sets[qi] & exact[qi]) / 5 for qi in range(20)])

    assert recall(8, 16, 20) >= 0.95
    r_coarse, r_fine = recall(4, 32, 5), recall(16, 32, 5)
    assert r_fine >= r_coarse - 0.05, (r_coarse, r_fine)


def _np_ivfpq(X, qids, C, B, k, n_probe, refine=0):
    """Full IVFADC oracle: unit-normalize, assign, residual-encode, per
    (q, probed list) LUT over q - c_list, top-k by (adist, id)."""
    m, ksub, dsub = B.shape
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    asg = np.argmax(Xn @ C.T, axis=1)
    R = Xn - C[asg]
    codes = _np_encode(R, B)
    ids = np.arange(len(X))
    rows = []
    for qid in qids:
        probes = np.argsort(-(Xn[qid] @ C.T), kind="stable")[:n_probe]
        dists, vids = [], []
        for L in probes:
            msk = asg == L
            t = Xn[qid] - C[L]
            lut = np.empty((m, ksub))
            for j in range(m):
                lut[j] = ((t[j * dsub : (j + 1) * dsub][None] - B[j]) ** 2).sum(-1)
            d = lut[np.arange(m)[None, :], codes[msk]].sum(1)
            sid = ids[msk]
            ok = sid != qid
            dists.append(d[ok])
            vids.append(sid[ok])
        d = np.concatenate(dists)
        v = np.concatenate(vids)
        top = np.lexsort((v, d))[: max(k, k * refine)]
        if refine > 0:
            cand = v[top]
            sims = Xn[cand] @ Xn[qid]
            order = np.lexsort((cand, -sims))[:k]
            for r, t in enumerate(order):
                rows.append((qid, cand[t], r + 1, sims[t]))
        else:
            for r, t in enumerate(top[:k]):
                rows.append((qid, v[t], r + 1, -d[t]))
    return pd.DataFrame(rows, columns=["q_id", "vec_id", "rank", "score"])


@pytest.mark.parametrize("refine", [0, 3])
def test_ann_ivf_pq_matches_numpy_oracle(pq_vectors, refine):
    sdf, X = pq_vectors
    C = ivf_train(sdf, 16, n_lists=8, iters=4)
    resid_pdf = None  # codebooks trained inside; re-derive via same math
    q = sdf.where(F.col("vec_id") < 6)
    out = ann_ivf_pq(
        sdf, q, 16, k=4, m=4, ksub=16, n_probe=3, centroids=C, refine=refine
    )
    got = out.toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    # rebuild the codebooks exactly like the operator: pq_train on the
    # residual frame, which samples ALL rows here (sample_n default)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    asg = np.argmax(Xn @ C.T, axis=1)
    # the operator trains on the distributed residual frame; replicate by
    # calling pq_train on the same frame it builds
    from mrmr_spark.operators.similarity import _as_double, ivf_assign

    e = _as_double(sdf, "embedding", "_e").select("vec_id", "_e")
    a = ivf_assign(sdf, C, 1)
    cent = sdf.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "list_id int, _c array<double>",
    )
    norm = F.sqrt(F.aggregate("_e", F.lit(0.0), lambda acc, x: acc + x * x))
    resid = (
        a.join(e, "vec_id")
        .join(F.broadcast(cent), "list_id")
        .withColumn("_n", F.greatest(norm, F.lit(1e-12)))
        .select(
            "vec_id",
            F.zip_with(
                F.transform("_e", lambda x: x / F.col("_n")),
                "_c",
                lambda x, c: x - c,
            ).alias("_r"),
        )
    )
    B = pq_train(resid, 16, m=4, ksub=16, emb_col="_r")
    exp = _np_ivfpq(X, list(range(6)), C, B, 4, 3, refine=refine)
    assert np.array_equal(
        got[["q_id", "vec_id", "rank"]].to_numpy(),
        exp[["q_id", "vec_id", "rank"]].to_numpy(),
    )
    assert np.allclose(got["score"], exp["score"], rtol=0, atol=1e-9)


def test_ann_ivf_pq_refine_improves_recall(pq_vectors):
    sdf, X = pq_vectors
    q = sdf.where(F.col("vec_id") < 20)
    exact = knn_bruteforce(sdf, q, k=5).toPandas()
    exact_sets = exact.groupby("q_id")["vec_id"].apply(set)

    def recall(refine):
        got = ann_ivf_pq(
            sdf, q, 16, k=5, m=4, ksub=16, n_lists=8, n_probe=4, refine=refine
        ).toPandas()
        sets = got.groupby("q_id")["vec_id"].apply(set)
        return np.mean([len(sets[qi] & exact_sets[qi]) / 5 for qi in exact_sets.index])

    r0, r3 = recall(0), recall(3)
    assert r3 >= r0 - 1e-9, (r0, r3)
    assert r3 >= 0.7, r3
