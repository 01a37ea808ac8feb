"""Line/web/mixing-layer scale probe: a planted synthetic LINED corpus
(deliberately bigger than the gate fixtures) driven through
remove_common_lines / c4_line_filter / tfidf_top_terms /
mix_to_token_budget, timed per stage, with exact driver-side
verification of every planted property (aggregates + a vectorized numpy
re-derivation of the budget admission — no big collects).

Corpus: N_DOCS docs of L_TOKENS tokens drawn from a VOCAB-word
vocabulary (fresh matrix, independent of probe_curation_scale's plants)
joined into lines of LINE_LEN tokens. Random 16-token lines are unique
across the corpus with overwhelming probability (expected collisions
~ (N_DOCS * L/LINE_LEN)^2 / 2 / VOCAB^LINE_LEN ~ 1e-50), so the planted
lines are the only common ones.

Planted truth:
- every doc with doc_id % 13 == 0 gets the fixed BOILER line inserted at
  line index 2 -> remove_common_lines(max_df=1000) must remove exactly
  one line from exactly those docs;
- every doc with doc_id % 19 == 0 gets the 4-token C4_BAIT line
  (contains the blocklisted phrase) inserted at line index 5 ->
  c4_line_filter(min_words=3, blocklist=("click here",),
  require_terminal_punct=False) must drop exactly one line from exactly
  those docs (all random lines have LINE_LEN >= min_words words and
  cannot contain the phrase);
- every doc with doc_id % 17 == 0 has tokens [0, 6) overwritten by
  'tfidfmark' -> tf=6 beats any chance multiplicity (P(tf>=6 of a random
  term in one doc) ~ C(L,6)/VOCAB^5 ~ 2e-11), and its df ~ N/17 keeps
  idf high, so tfidf_top_terms rank 1 must be 'tfidfmark' for exactly
  those docs;
- mix_to_token_budget(affine) admission is re-derived with numpy (sort
  by the affine key per source, cumulative token sums from the known
  per-doc token counts) and the kept (doc count, token total) per source
  must match exactly.

Usage:
  MRMR_PROBE_DOCS=200000 python tools/probe_lines_scale.py

Prints one JSON line: per-stage seconds + verification verdicts.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("MRMR_PROBE_DOCS", "200000"))
L_TOKENS = int(os.environ.get("MRMR_PROBE_TOKENS", "160"))
VOCAB = int(os.environ.get("MRMR_PROBE_VOCAB", "4000"))
LINE_LEN = 16
N_SOURCES = 50
BOILER = "cookie notice accept all terms and conditions apply"
C4_BAIT = "click here to subscribe"
MARK = "tfidfmark"
KNUTH_MULT = 2654435761
HASH_SPACE = 2**32


def build_corpus():
    rng = np.random.default_rng(20260819)
    vocab = np.array([f"tok{i:05d}" for i in range(VOCAB)])
    ids = rng.integers(0, VOCAB, size=(N_DOCS, L_TOKENS))
    toks = vocab[ids].astype("<U16")
    mark_rows = np.arange(0, N_DOCS, 17)
    toks[mark_rows, :6] = MARK

    n_lines = L_TOKENS // LINE_LEN
    line_mat = toks.reshape(N_DOCS, n_lines, LINE_LEN)
    texts = []
    n_tok = np.full(N_DOCS, L_TOKENS, dtype=np.int64)
    boiler_rows = set(range(0, N_DOCS, 13))
    bait_rows = set(range(0, N_DOCS, 19))
    for i in range(N_DOCS):
        lines = [" ".join(row) for row in line_mat[i]]
        if i in boiler_rows:
            lines.insert(2, BOILER)
            n_tok[i] += len(BOILER.split(" "))
        if i in bait_rows:
            lines.insert(5, C4_BAIT)
            n_tok[i] += len(C4_BAIT.split(" "))
        texts.append("\n".join(lines))

    w = 1.0 / (np.arange(N_SOURCES) + 1)
    src = rng.choice(N_SOURCES, size=N_DOCS, p=w / w.sum())
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": texts,
            "source": [f"src{s}" for s in src],
        }
    )
    return pdf, src, n_tok


def expected_mix(src: np.ndarray, n_tok_flat: np.ndarray, budgets: dict, default: int):
    """Numpy re-derivation of mix_to_token_budget's admission."""
    ids = np.arange(N_DOCS, dtype=np.int64)
    key = (ids * KNUTH_MULT) % HASH_SPACE
    out = {}
    for s in range(N_SOURCES):
        name = f"src{s}"
        b = budgets.get(name, default)
        mask = src == s
        order = np.lexsort((ids[mask], key[mask]))
        toks = n_tok_flat[mask][order]
        cum = np.cumsum(toks)
        kept = (cum - toks) < b
        out[name] = (int(kept.sum()), int(toks[kept].sum()))
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from mrmr_spark.operators.curation import mix_to_token_budget, tfidf_top_terms
    from mrmr_spark.operators.lines import c4_line_filter, remove_common_lines
    from mrmr_spark.session import get_spark

    t0 = time.time()
    pdf, src, n_tok = build_corpus()
    build_s = round(time.time() - t0, 3)

    spark = get_spark(app_name="lines-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(pdf).repartition(64).persist()
    n = docs.count()
    out: dict = {"n_docs": n, "tokens_per_doc": L_TOKENS, "build_s": build_s}

    # --- remove_common_lines (planted boilerplate, hash128 backend) ------
    # BOTH planted lines cross max_df once N_DOCS is large enough (the C4
    # bait repeats in N/19 docs too — removing it here is correct behavior,
    # so the truth accounts for each planted line independently).
    max_df = 1000
    boiler_ids = np.arange(0, N_DOCS, 13, dtype=np.int64)
    bait_ids_cl = np.arange(0, N_DOCS, 19, dtype=np.int64)
    exp_sets = [s for s in (boiler_ids, bait_ids_cl) if len(s) >= max_df]
    exp_tot = sum(len(s) for s in exp_sets)
    # id_sum counts each TOUCHED doc once — dedup the %13 ∩ %19 overlap
    touched = np.unique(np.concatenate(exp_sets)) if exp_sets else np.array([], dtype=np.int64)
    exp_idsum = int(touched.sum())
    exp_mx = 0 if not exp_sets else (2 if len(exp_sets) == 2 and N_DOCS > 13 * 19 else 1)
    t0 = time.time()
    cleaned = remove_common_lines(docs, max_df=max_df)
    agg = cleaned.agg(
        F.sum("n_removed_lines").alias("tot"),
        F.sum(F.when(F.col("n_removed_lines") > 0, F.col("doc_id"))).alias("id_sum"),
        F.max("n_removed_lines").alias("mx"),
        F.sum(F.when(F.col("text").contains(BOILER), 1).otherwise(0)).alias("leftover"),
    ).first()
    out["common_lines_s"] = round(time.time() - t0, 3)
    out["common_lines_ok"] = bool(
        agg.tot == exp_tot
        and agg.id_sum == exp_idsum
        and agg.mx == exp_mx
        and agg.leftover == 0
    )

    # --- c4_line_filter (planted blocklist bait) --------------------------
    bait_ids = np.arange(0, N_DOCS, 19, dtype=np.int64)
    t0 = time.time()
    c4 = c4_line_filter(
        docs, min_words=3, require_terminal_punct=False, blocklist=("click here",)
    )
    agg = c4.agg(
        F.sum("n_dropped_lines").alias("tot"),
        F.sum(F.when(F.col("n_dropped_lines") > 0, F.col("doc_id"))).alias("id_sum"),
        F.max("n_dropped_lines").alias("mx"),
    ).first()
    out["c4_lines_s"] = round(time.time() - t0, 3)
    out["c4_lines_ok"] = bool(
        agg.tot == len(bait_ids)
        and agg.id_sum == int(bait_ids.sum())
        and agg.mx == 1
    )

    # --- tfidf_top_terms (planted tf=6 marker wins rank 1) ----------------
    mark_ids = np.arange(0, N_DOCS, 17, dtype=np.int64)
    flat = docs.select(
        "doc_id", "source", F.replace(F.col("text"), F.lit("\n"), F.lit(" ")).alias("text")
    )
    t0 = time.time()
    tf = tfidf_top_terms(flat, k=1)
    agg = tf.agg(
        F.sum(F.when(F.col("term") == MARK, 1).otherwise(0)).alias("n_mark"),
        F.sum(F.when(F.col("term") == MARK, F.col("doc_id"))).alias("id_sum"),
        F.min(F.when(F.col("term") == MARK, F.col("tf"))).alias("tf_min"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    out["tfidf_s"] = round(time.time() - t0, 3)
    out["tfidf_ok"] = bool(
        agg.n_mark == len(mark_ids)
        and agg.id_sum == int(mark_ids.sum())
        and agg.tf_min == 6
        and agg.n == n
    )

    # --- mix_to_token_budget (numpy admission oracle) ----------------------
    budgets = {"src0": 500_000, "src1": 100_000, "src2": 0}
    default = 20_000
    exp = expected_mix(src, n_tok, budgets, default)
    t0 = time.time()
    mixed = mix_to_token_budget(flat, budgets, hash_fn="affine", default_budget=default)
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .collect()
    }
    out["mix_budget_s"] = round(time.time() - t0, 3)
    exp_nonzero = {k: v for k, v in exp.items() if v[0] > 0}
    out["mix_budget_ok"] = got == exp_nonzero

    out["all_ok"] = all(v for k, v in out.items() if k.endswith("_ok"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
