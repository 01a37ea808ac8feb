"""Retrieval/shard/incremental-dedup scale probe: a planted synthetic
corpus (deliberately bigger than the gate fixtures) driven through
bm25_topk / sized_shards / dedup_against / cross_corpus_candidates,
timed per stage, with exact driver-side verification of every planted
property (aggregates and a bounded top-k collect — no big collects).

Corpus: N_DOCS docs of exactly L_TOKENS tokens drawn from a VOCAB-word
vocabulary. Plants:

- every doc with doc_id % 997 == 0 has its first 1 + (doc_id//997) % 5
  tokens overwritten by the out-of-vocabulary marker 'bm25mark' ->
  for the query 'bm25mark', exactly those docs match; document length
  is constant so the BM25 score is strictly monotone in tf, and the
  numpy re-derivation of Lucene's formula must reproduce the top-k
  list (ids AND rounded scores) exactly;
- sized_shards ordered by a Knuth-permuted sort key: per-shard
  (count, min rank, max rank) must be (R, i*R, (i+1)*R - 1) for every
  shard, and the corpus-wide checksum sum(rank * doc_id) must equal
  the numpy argsort's — a single aggregate verifying every row's rank
  without collecting anything;
- dedup_against(exact): the reference is re-id'd UPPERCASED copies of
  every doc_id % 23 == 0 doc -> survivors = exactly the non-%23 docs
  (random 64-token texts collide with probability ~ N^2/VOCAB^64 ~ 0);
- cross_corpus_candidates: the reference also carries VERBATIM copies
  of every doc_id % 41 == 0 doc under new ids -> each must come back
  as a candidate with est_jaccard == 1.0 (J=1 pairs cannot be missed
  by banding), and nothing else pairs (band collisions of independent
  random texts need near-identical MinHash vectors: P ~ 0).

Usage:
  MRMR_PROBE_DOCS=200000 python tools/probe_retrieval_shards_scale.py

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

N_DOCS = int(os.environ.get("MRMR_PROBE_DOCS", "200000"))
L_TOKENS = int(os.environ.get("MRMR_PROBE_TOKENS", "64"))
VOCAB = int(os.environ.get("MRMR_PROBE_VOCAB", "4000"))
TOPK = 50
ROWS_PER_SHARD = 4096
KNUTH_MULT = 2654435761
HASH_SPACE = 2**32
MARK = "bm25mark"


def build_corpus():
    rng = np.random.default_rng(20260819 + 1)
    vocab = np.array([f"tok{i:05d}" for i in range(VOCAB)])
    ids_mat = rng.integers(0, VOCAB, size=(N_DOCS, L_TOKENS))
    toks = vocab[ids_mat].astype("<U16")
    mark_rows = np.arange(0, N_DOCS, 997)
    tf = 1 + (mark_rows // 997) % 5
    for r, t in zip(mark_rows, tf):
        toks[r, :t] = MARK
    texts = [" ".join(row) for row in toks]
    pdf = pd.DataFrame({"doc_id": np.arange(N_DOCS, dtype=np.int64), "text": texts})
    return pdf, mark_rows, tf


def bm25_truth(mark_rows, tf, k1=1.2, b=0.75):
    """Numpy Lucene BM25 for the single-term query on constant-length
    docs: idf from df=len(mark_rows), dl == avgdl so the length norm
    is exactly 1."""
    n, df = N_DOCS, len(mark_rows)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    scores = idf * (tf * (k1 + 1)) / (tf + k1)
    order = np.lexsort((mark_rows, -scores))
    top = [(int(mark_rows[i]), round(float(scores[i]), 6)) for i in order[:TOPK]]
    return top, df


def main() -> None:
    from pyspark.sql import functions as F

    from mrmr_spark.operators.dedup import cross_corpus_candidates, dedup_against
    from mrmr_spark.operators.retrieval import bm25_topk
    from mrmr_spark.session import get_spark
    from mrmr_spark.sources.shards import sized_shards

    t0 = time.time()
    pdf, mark_rows, tf = build_corpus()
    build_s = round(time.time() - t0, 3)

    spark = get_spark(app_name="retrieval-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(pdf).repartition(64).persist()
    n = docs.count()
    out: dict = {"n_docs": n, "tokens_per_doc": L_TOKENS, "build_s": build_s}

    # --- bm25_topk (planted rare term, graded tf) ------------------------
    q = spark.createDataFrame([(0, MARK)], "q_id long, query string")
    t0 = time.time()
    got = [
        (r.doc_id, r.score)
        for r in bm25_topk(docs, q, k=TOPK).orderBy("rank").collect()
    ]
    out["bm25_s"] = round(time.time() - t0, 3)
    want, df_t = bm25_truth(mark_rows, tf)
    out["bm25_topk_exact"] = got == want
    out["bm25_planted_df"] = int(df_t)

    # --- sized_shards (Knuth-permuted order, aggregate-only truth) -------
    key = (F.col("doc_id") * F.lit(KNUTH_MULT)) % F.lit(HASH_SPACE)
    keyed = docs.select("doc_id", key.alias("sortkey"))
    pin: list = []
    t0 = time.time()
    sh = sized_shards(keyed, ROWS_PER_SHARD, order_by=["sortkey"],
                      rank_col="rank", pin=pin)
    per = (
        sh.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("c"), F.min("rank").alias("lo"),
             F.max("rank").alias("hi"))
        .collect()
    )
    chk = sh.agg(F.sum(F.col("rank") * F.col("doc_id")).alias("s")).first()["s"]
    out["shards_s"] = round(time.time() - t0, 3)
    n_full, tail = divmod(N_DOCS, ROWS_PER_SHARD)
    ok = len(per) == n_full + (1 if tail else 0)
    for r in per:
        lo = r.shard * ROWS_PER_SHARD
        size = ROWS_PER_SHARD if r.shard < n_full else tail
        ok &= (r.c, r.lo, r.hi) == (size, lo, lo + size - 1)
    out["shard_ranges_exact"] = bool(ok)
    ids = np.arange(N_DOCS, dtype=np.int64)
    np_key = (ids * KNUTH_MULT) % HASH_SPACE
    rank_of = np.empty(N_DOCS, dtype=np.int64)
    rank_of[np.lexsort((ids, np_key))] = ids  # doc at rank r gets rank r
    out["shard_checksum_exact"] = int(chk) == int((ids * rank_of).sum())
    for p in pin:
        p.unpersist()

    # --- dedup_against exact (re-id'd uppercased reference) --------------
    ref_exact = docs.where(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    t0 = time.time()
    surv = dedup_against(docs, ref_exact, mode="exact")
    agg = surv.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("doc_id") % 23 == 0).cast("long")).alias("bad"),
    ).first()
    out["dedup_exact_s"] = round(time.time() - t0, 3)
    n_ref = len(range(0, N_DOCS, 23))
    out["dedup_exact_survivors_exact"] = (agg["n"], agg["bad"]) == (N_DOCS - n_ref, 0)

    # --- cross_corpus_candidates (verbatim J=1 plants) -------------------
    ref_near = docs.where(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    t0 = time.time()
    cands = cross_corpus_candidates(docs, ref_near, min_jaccard=0.99).collect()
    out["cross_cands_s"] = round(time.time() - t0, 3)
    got_pairs = {(r.new_id, r.ref_id) for r in cands}
    want_pairs = {(i, i + 20_000_000) for i in range(0, N_DOCS, 41)}
    out["cross_pairs_exact"] = got_pairs == want_pairs
    out["cross_est_all_one"] = all(r.est_jaccard == 1.0 for r in cands)

    out["all_ok"] = all(
        v is True for k, v in out.items() if k.endswith("_exact") or k.endswith("_one")
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
