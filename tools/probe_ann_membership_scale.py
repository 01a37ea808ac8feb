"""Scale probe for the round-5 late families: product quantization,
Bloom membership, and the unigram-LM tokenizer — planted-truth corpora
deliberately bigger than the gate fixtures, every verification exact and
aggregated distributed-side (no corpus-scale collects).

Truths:

- pq_encode at corpus scale: the full code matrix equals the numpy
  argmin re-derivation, compared via an exact integer checksum
  Σ_vec Σ_j code[vec,j]·(j+1)·((vec % 97)+1) (codes are small ints —
  the checksum is exact in int64 and collision-hostile across both
  index axes);
- pq_search: top-10 ADC answers for 20 queries equal the full numpy
  ADC oracle — ids, ranks AND distances (atol 1e-12);
- bloom_filter_against: is_dup equals the planted membership truth for
  EVERY row (texts are unique by construction, so truth is exact);
  measured FP rate within 5x of the sizing formula; zero false
  negatives — all counted on the cluster;
- unigram: corpus round-trip violations == 0 counted distributed-side;
  the corpus token total equals Σ_w count(w)·|viterbi(w)| derived
  driver-side from the word table (the word table is the contract).

Usage:
  MRMR_PROBE_N=200000 python tools/probe_ann_membership_scale.py

Prints one JSON line: per-stage seconds + verification verdicts.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("MRMR_PROBE_N", "200000"))
DIM = 32
PQ_M, PQ_KSUB = 8, 64
N_QUERIES, TOPK = 20, 10
BLOOM_BITS = 1 << 21
UNI_VOCAB_WORDS = 200
UNI_TOKens_PER_DOC = 24


def main() -> None:
    from pyspark.sql import functions as F

    from mrmr_spark.operators.bloom import bloom_filter_against, bloom_fpp
    from mrmr_spark.operators.similarity import pq_encode, pq_search, pq_train
    from mrmr_spark.operators.tokenizer import word_counts
    from mrmr_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
        viterbi_segment_py,
    )
    from mrmr_spark.session import get_spark

    out: dict = {"n": N}
    spark = get_spark(app_name="ann-membership-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------- PQ ----------------
    rng = np.random.default_rng(31)
    A = rng.normal(size=(64, DIM)) * 3.0
    X = (A[rng.integers(0, 64, size=N)] +
         rng.normal(scale=0.5, size=(N, DIM))).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64),
                        "embedding": [v for v in X.tolist()]})
    vecs = spark.createDataFrame(pdf, "vec_id long, embedding array<float>") \
        .repartition(64).persist()
    vecs.count()
    Xd = X.astype(np.float64)

    t0 = time.time()
    B = pq_train(vecs, DIM, m=PQ_M, ksub=PQ_KSUB, sample_n=100_000)
    out["pq_train_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    codes = pq_encode(vecs, B).persist()
    chk = codes.select(
        F.aggregate(
            F.zip_with(
                F.col("code"),
                F.sequence(F.lit(1), F.lit(PQ_M)),
                lambda c, j: c.cast("long") * j,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("rowsum"),
        ((F.col("vec_id") % 97) + 1).alias("w"),
    ).agg(F.sum(F.col("rowsum") * F.col("w"))).first()[0]
    out["pq_encode_s"] = round(time.time() - t0, 3)

    dsub = DIM // PQ_M
    np_codes = np.empty((N, PQ_M), dtype=np.int64)
    for j in range(PQ_M):
        S = Xd[:, j * dsub : (j + 1) * dsub]
        np_codes[:, j] = np.argmin(
            ((S[:, None, :] - B[j][None]) ** 2).sum(-1), axis=1
        )
    w = (np.arange(N) % 97) + 1
    np_chk = int((np_codes * (np.arange(PQ_M) + 1)[None, :]).sum(1) @ w)
    out["pq_codes_exact"] = bool(chk == np_chk)

    t0 = time.time()
    q = vecs.where(F.col("vec_id") < N_QUERIES)
    got = (
        pq_search(codes, q, B, k=TOPK)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    out["pq_search_s"] = round(time.time() - t0, 3)
    ids = np.arange(N)
    ok = True
    for qi in range(N_QUERIES):
        lut = np.empty((PQ_M, PQ_KSUB))
        for j in range(PQ_M):
            s = Xd[qi, j * dsub : (j + 1) * dsub]
            lut[j] = ((s[None] - B[j]) ** 2).sum(-1)
        D = lut[np.arange(PQ_M)[None, :], np_codes].sum(1)
        D[qi] = np.inf
        top = np.lexsort((ids, D))[:TOPK]
        sub = got[got["q_id"] == qi]
        ok &= bool((sub["vec_id"].to_numpy() == ids[top]).all())
        ok &= bool(np.allclose(sub["adist"].to_numpy(), D[top], atol=1e-12, rtol=0))
    out["pq_search_exact"] = ok
    codes.unpersist()

    # ---------------- Bloom ----------------
    texts = [f"doc {i} payload {i * 2654435761 % 1_000_003}" for i in range(N)]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(N, dtype=np.int64), "text": texts})
    ).repartition(64).persist()
    docs.count()
    ref = docs.where(F.col("doc_id") % 3 == 0)
    n_ref = N // 3 + (1 if N % 3 else 0)

    t0 = time.time()
    flagged = bloom_filter_against(
        docs, ref, n_bits=BLOOM_BITS, k_hashes=5, verify=True
    ).persist()
    agg = flagged.agg(
        F.sum(F.when((F.col("doc_id") % 3 == 0) & ~F.col("is_dup"), 1).otherwise(0)),
        F.sum(F.when((F.col("doc_id") % 3 != 0) & F.col("is_dup"), 1).otherwise(0)),
        F.sum(F.when((F.col("doc_id") % 3 == 0) & ~F.col("maybe_dup"), 1).otherwise(0)),
        F.sum(F.when((F.col("doc_id") % 3 != 0) & F.col("maybe_dup"), 1).otherwise(0)),
        F.count(F.lit(1)),
    ).first()
    out["bloom_s"] = round(time.time() - t0, 3)
    missed_dups, wrong_dups, false_neg, false_pos, total = (int(x) for x in agg)
    out["bloom_is_dup_exact"] = missed_dups == 0 and wrong_dups == 0
    out["bloom_false_negatives"] = false_neg
    fpp_est = bloom_fpp({"n_bits": BLOOM_BITS, "k": 5}, n_ref)
    fp_rate = false_pos / max(total - n_ref, 1)
    out["bloom_fp_rate"] = round(fp_rate, 6)
    out["bloom_fpp_est"] = round(fpp_est, 6)
    out["bloom_fp_within_5x"] = bool(fp_rate <= max(5 * fpp_est, 1e-4))
    flagged.unpersist()

    # ---------------- unigram ----------------
    morphs = ["walk", "jump", "run", "talk", "ing", "ed", "er", "s"]
    uvocab = [a + b for a in morphs[:4] for b in morphs[4:]] + morphs[:4]
    uvocab = (uvocab * (UNI_VOCAB_WORDS // len(uvocab) + 1))[:UNI_VOCAB_WORDS]
    uv = np.array([w + chr(ord("a") + i % 26) for i, w in enumerate(uvocab)])
    idm = rng.integers(0, len(uv), size=(N, UNI_TOKens_PER_DOC))
    utexts = [" ".join(row) for row in uv[idm]]
    udocs = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(N, dtype=np.int64), "text": utexts})
    ).repartition(64).persist()
    udocs.count()

    t0 = time.time()
    wc = word_counts(udocs).persist()
    model = unigram_train(wc, vocab_size=120, max_piece_len=6)
    out["unigram_train_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    enc = unigram_encode(udocs, model)
    viol, tok_total = enc.select(
        F.sum(
            F.when(
                F.concat_ws("", "unigram_tokens")
                != F.replace(F.col("text"), F.lit(" "), F.lit("")),
                1,
            ).otherwise(0)
        ),
        F.sum(F.size("unigram_tokens")),
    ).first()
    out["unigram_encode_s"] = round(time.time() - t0, 3)
    out["unigram_roundtrip_violations"] = int(viol)
    exp_total = 0
    for r in wc.collect():
        exp_total += r["count"] * len(
            viterbi_segment_py(r["word"], model["logp"], model["max_piece_len"])[0]
        )
    out["unigram_token_total_exact"] = bool(int(tok_total) == exp_total)
    out["ok"] = bool(
        out["pq_codes_exact"] and out["pq_search_exact"]
        and out["bloom_is_dup_exact"] and out["bloom_false_negatives"] == 0
        and out["bloom_fp_within_5x"] and out["unigram_roundtrip_violations"] == 0
        and out["unigram_token_total_exact"]
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
