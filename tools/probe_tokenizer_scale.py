"""Tokenizer/embedding scale probe: a Zipf-weighted synthetic corpus
(deliberately bigger than the gate fixtures, with a real vocabulary —
the testdata tables carry only 31 distinct words) driven through
word_counts / bpe_train / bpe_encode / hashed_embedding, timed per
stage, with exact verification of every planted property (the word
table and trained merges checked in full; the corpus-scale stages by
row-level invariants counted distributed-side and integer checksums —
no big collects).

Truths:

- word_counts: full 20k-row table == the numpy bincount of the id
  matrix (the table is vocab-bounded, so collecting it IS the contract);
- bpe_train: merge list == a recount-from-scratch naive trainer (no
  incremental pair stats, no inverted index) on the same counts;
- bpe_encode (arrow default) at corpus scale:
  * corpus total token count == Σ_w count(w) · |encode(w)| derived
    driver-side from the word table,
  * per-row round-trip invariant counted ON the cluster: the encoded
    symbols' total length must equal len(text without spaces) +
    len('</w>') · n_words for EVERY row (violations aggregated, not
    collected);
- hashed_embedding (poly family):
  * normalize=False corpus checksum Σ_doc Σ_b value·(b+1) — exact in
    f64 (bounded integers) — == the numpy per-word g(w)=sign·(bucket+1)
    folded over the id matrix,
  * normalize=True exact equality on a 500-doc sample vs the Python
    oracle (identical f64 arithmetic from integer sums).

Usage:
  MRMR_PROBE_DOCS=200000 python tools/probe_tokenizer_scale.py

Prints one JSON line: per-stage seconds + verification verdicts.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from collections import Counter

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("MRMR_PROBE_DOCS", "200000"))
L_TOKENS = int(os.environ.get("MRMR_PROBE_TOKENS", "48"))
VOCAB = int(os.environ.get("MRMR_PROBE_VOCAB", "20000"))
NUM_MERGES = int(os.environ.get("MRMR_PROBE_MERGES", "150"))
EMB_DIM = 32
SAMPLE = 500

_POLY_MOD = 2_147_483_647


def _word(i: int) -> str:
    # base-26 letter encoding: words share prefixes/suffixes, so BPE has
    # real structure to learn (pure random strings would merge nothing)
    s = ""
    i += 26  # 2+ letters
    while i:
        i, r = divmod(i, 26)
        s = chr(ord("a") + r) + s
    return s


def build_corpus():
    rng = np.random.default_rng(20260819 + 7)
    vocab = np.array([_word(i) for i in range(VOCAB)])
    # Zipf-ish frequencies: rank r drawn with p ∝ 1/(r+1)
    w = 1.0 / (np.arange(VOCAB) + 1.0)
    p = w / w.sum()
    ids_mat = rng.choice(VOCAB, size=(N_DOCS, L_TOKENS), p=p)
    texts = [" ".join(row) for row in vocab[ids_mat]]
    pdf = pd.DataFrame({"doc_id": np.arange(N_DOCS, dtype=np.int64), "text": texts})
    return pdf, vocab, ids_mat


def naive_train(counts: dict[str, int], num_merges: int, eow: str):
    from mrmr_spark.operators.tokenizer import merge_word

    words = {w: list(w) + [eow] for w in counts}
    merges = []
    for _ in range(num_merges):
        stats: Counter = Counter()
        for w, syms in words.items():
            c = counts[w]
            for p in zip(syms, syms[1:]):
                stats[p] += c
        if not stats:
            break
        bc = max(stats.values())
        best = min(p for p, c in stats.items() if c == bc)
        merges.append(best)
        words = {w: merge_word(s, best) for w, s in words.items()}
    return merges, words


def _poly(tok: str, base: int) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * base + ord(ch)) % _POLY_MOD
    return acc


def main() -> None:
    from pyspark.sql import functions as F

    from mrmr_spark.operators.embedding import (
        _POLY_BASE_BUCKET,
        _POLY_BASE_SIGN,
        hashed_embedding,
    )
    from mrmr_spark.operators.tokenizer import (
        END_OF_WORD,
        bpe_encode,
        bpe_train,
        word_counts,
    )
    from mrmr_spark.session import get_spark

    t0 = time.time()
    pdf, vocab, ids_mat = build_corpus()
    build_s = round(time.time() - t0, 3)

    spark = get_spark(app_name="tokenizer-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(pdf).repartition(64).persist()
    n = docs.count()
    out: dict = {"n_docs": n, "tokens_per_doc": L_TOKENS, "vocab": VOCAB,
                 "num_merges": NUM_MERGES, "build_s": build_s}

    # --- word_counts: the vocab-bounded table, checked in full -----------
    t0 = time.time()
    wc = word_counts(docs).persist()
    got_counts = {r.word: r["count"] for r in wc.collect()}
    out["word_counts_s"] = round(time.time() - t0, 3)
    binc = np.bincount(ids_mat.ravel(), minlength=VOCAB)
    want_counts = {vocab[i]: int(binc[i]) for i in range(VOCAB) if binc[i] > 0}
    out["word_counts_exact"] = got_counts == want_counts

    # --- bpe_train vs the recount-from-scratch trainer -------------------
    t0 = time.time()
    model = bpe_train(wc, num_merges=NUM_MERGES, max_words=VOCAB)
    out["bpe_train_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    naive_merges, naive_words = naive_train(want_counts, NUM_MERGES, END_OF_WORD)
    out["naive_train_s"] = round(time.time() - t0, 3)
    out["bpe_merges_exact"] = model["merges"] == naive_merges
    out["n_merges"] = len(model["merges"])

    # --- bpe_encode at corpus scale ---------------------------------------
    # expected corpus token total from the word table + the naive trainer's
    # final segmentations (encode(training word) == trainer segmentation)
    want_total = sum(want_counts[w] * len(naive_words[w]) for w in want_counts)
    t0 = time.time()
    enc = bpe_encode(docs, model["merges"])
    tok_len_sum = F.aggregate(
        "bpe_tokens", F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t),
    )
    eow_extra = F.lit(len(END_OF_WORD)) * F.size(
        F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    )
    agg = enc.agg(
        F.sum(F.size("bpe_tokens")).alias("total_tokens"),
        F.sum(
            F.when(
                tok_len_sum
                != F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + eow_extra,
                1,
            ).otherwise(0)
        ).alias("roundtrip_violations"),
    ).first()
    out["bpe_encode_s"] = round(time.time() - t0, 3)
    out["bpe_total_tokens"] = int(agg["total_tokens"])
    out["bpe_total_exact"] = int(agg["total_tokens"]) == want_total
    out["bpe_roundtrip_violations"] = int(agg["roundtrip_violations"])

    # --- hashed_embedding -------------------------------------------------
    # corpus checksum on the unnormalized integer histogram (exact in f64)
    g = np.array(
        [
            (1 - 2 * ((_poly(w, _POLY_BASE_SIGN)) % 2))
            * ((_poly(w, _POLY_BASE_BUCKET)) % EMB_DIM + 1)
            for w in vocab
        ],
        dtype=np.int64,
    )
    want_chk = int(g[ids_mat].sum())
    t0 = time.time()
    raw = hashed_embedding(docs, dim=EMB_DIM, hash_fn="poly", normalize=False,
                           out_col="emb")
    chk = raw.select(
        F.aggregate(
            F.zip_with(
                "emb",
                F.sequence(F.lit(1), F.lit(EMB_DIM)).cast("array<double>"),
                lambda v, i: v * i,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("c")
    ).agg(F.sum("c")).first()[0]
    out["embedding_s"] = round(time.time() - t0, 3)
    out["embedding_checksum_exact"] = int(chk) == want_chk

    # normalized sample: exact f64 equality vs the Python oracle
    bucket = np.array([_poly(w, _POLY_BASE_BUCKET) % EMB_DIM for w in vocab])
    sign = np.array([1 - 2 * (_poly(w, _POLY_BASE_SIGN) % 2) for w in vocab])
    sample_ids = np.linspace(0, N_DOCS - 1, SAMPLE, dtype=np.int64)
    normed = hashed_embedding(docs, dim=EMB_DIM, hash_fn="poly", out_col="emb")
    got = {
        r.doc_id: r.emb
        for r in normed.where(F.col("doc_id").isin([int(i) for i in sample_ids]))
        .select("doc_id", "emb")
        .collect()
    }
    ok = True
    for d in sample_ids:
        v = np.zeros(EMB_DIM, dtype=np.int64)
        np.add.at(v, bucket[ids_mat[d]], sign[ids_mat[d]])
        nrm = math.sqrt(float((v.astype(np.float64) ** 2).sum()))
        exp = [x / nrm if nrm > 0 else float(x) for x in v]
        ok &= got[int(d)] == exp
    out["embedding_sample_exact"] = bool(ok)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
