"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": <e2e sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

The headline is the driver-contract metric: turns/sec for the end-to-end
transcript feature-build + mRMR selection pipeline (BASELINE.md §3), on a
deterministic synthetic transcript corpus sized to the scale factor
(~10x the events table, Zipf-skewed conv sizes). Operator benches run over
the driver testdata tables.

Scaling evidence (N vs 4N executors -> local[8] vs local[32]):
  python tools/bench_scaling.py   (writes BENCH.md)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
E2E_ONLY = os.environ.get("MRMR_BENCH_E2E_ONLY", "") == "1"
#: override corpus size (n_convs) for scaling runs
N_CONVS_OVERRIDE = int(os.environ.get("MRMR_BENCH_NCONVS", "0"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_label(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def _stat_counters() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat — None where unavailable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = list(map(int, parts[1:]))
        # total = user..steal only: the guest/guest_nice tail fields are
        # already counted inside user/nice, so summing them would double-count
        # guest time and understate steal% on nested-virt hosts
        return vals[7], sum(vals[:8])
    except Exception:
        return None


def steal_pct(before, after) -> float | None:
    """Hypervisor steal % of total cpu time between two _stat_counters
    samples. The sandbox host shows bursty co-tenant steal (measured
    0-50%+ under load); attributing each timed run lets a slow sample be
    distinguished from a real regression directly in the bench JSON."""
    if before is None or after is None:
        return None
    ds, dt = after[0] - before[0], after[1] - before[1]
    return round(100.0 * ds / dt, 1) if dt > 0 else None


def ensure_transcripts(sf_dir: str) -> tuple[str, int]:
    """Deterministic transcript corpus sized to the sf (cached parquet)."""
    label = _sf_label(sf_dir)
    # ~1M turns at sf0.1 (10x the events table there): n_convs*mean_turns
    try:
        scale = float(label)
    except ValueError:
        scale = 0.1
    n_convs = N_CONVS_OVERRIDE or max(200, int(350_000 * scale))
    path = f"/tmp/mrmr_bench/transcripts_c{n_convs}.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from mrmr_spark.sources.transcripts import write_transcripts_parquet

        write_transcripts_parquet(path, n_convs=n_convs, mean_turns=30, seed=42)
    import pyarrow.parquet as pq

    return path, pq.read_metadata(path).num_rows


def main():
    from pyspark.sql import functions as F

    from mrmr_spark import gate
    from mrmr_spark.fe import FEATURE_COLS, build_features
    from mrmr_spark.select import select_mrmr
    from mrmr_spark.session import get_spark

    tr_path, n_turns = ensure_transcripts(SF_DIR)
    spark = get_spark(
        app_name="mrmr-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the bench corpus is ONE parquet file; the default 128MB split
            # packing would cap scan parallelism at ~2-3 tasks regardless of
            # cores (prod reads thousands of files, where 128MB is right)
            "spark.sql.files.maxPartitionBytes": str(8 << 20),
            "spark.sql.inMemoryColumnarStorage.compressed": "false",
            "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # warm the JVM + the Python worker pool once (excluded from timings —
    # production clusters run long-lived executors/workers; the first-ever
    # Arrow pass pays a ~1s/worker daemon+import cost that is not throughput)
    import pyarrow as pa

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.count()

    def _ident(it):
        for b in it:
            yield pa.RecordBatch.from_arrays([pa.array([b.num_rows])], ["n"])

    ev.select("value").mapInArrow(_ident, "n long").agg(F.sum("n")).collect()

    transcripts = spark.read.parquet(tr_path)

    # headline: end-to-end feature build + mRMR selection over the corpus.
    # Run twice: the first pays one-time plan/codegen compilation (a per-JOB
    # constant that amortizes to nothing over hours-long production runs);
    # the steady-state number is the throughput metric.
    from mrmr_spark.fe.pipeline import RICH_EXTRA_COLS

    rich = os.environ.get("MRMR_BENCH_RICH", "0") == "1"
    feat_cols = FEATURE_COLS + RICH_EXTRA_COLS if rich else FEATURE_COLS

    def e2e():
        feats = build_features(transcripts, rich=rich).where(
            F.col("target_next_gap").isNotNull()
        )
        # subsample=None: bench the full-data selection path (the API default
        # is the reference's 50k-row budget, which would hide the Gram scans)
        res = select_mrmr(
            feats, feat_cols, "target_next_gap", 8, task="regression", subsample=None
        )
        return res

    timed("fe_mrmr_e2e_cold", e2e)
    # 6 warm runs by default (matches tools/bench_scaling.py): the sandbox
    # host shows multi-second co-tenant bursts (BENCH.md §4), and round 4
    # proved 3 runs can fail to reach steady state entirely (warm series
    # 8.5/13.7/5.2 still descending at run 3). The min is the throughput
    # statistic under noisy-neighbor steal; the median and the last-3
    # spread are reported alongside so convergence is checkable from the
    # JSON itself.
    n_warm = int(os.environ.get("MRMR_BENCH_WARM_RUNS", "6"))
    warm = []
    warm_steal = []
    res = None

    def one_warm():
        nonlocal res
        s0 = _stat_counters()
        t0 = time.perf_counter()
        res = e2e()
        warm.append(round(time.perf_counter() - t0, 3))
        warm_steal.append(steal_pct(s0, _stat_counters()))

    for i in range(n_warm):
        one_warm()
    # adaptive extension: if the BEST sample so far was itself taken under
    # co-tenant steal, the min is still contaminated — buy up to
    # MRMR_BENCH_MAX_EXTRA_RUNS more shots at a clean window (a clean
    # sample ends the loop immediately; extra runs can only improve a min)
    max_extra = int(os.environ.get("MRMR_BENCH_MAX_EXTRA_RUNS", "4"))
    for _ in range(max_extra):
        best_steal = warm_steal[warm.index(min(warm))]
        if best_steal is None or best_steal <= 1.0:
            break
        one_warm()
    timings["fe_mrmr_e2e"] = min(warm)
    timings["fe_mrmr_e2e_median"] = round(statistics.median(warm), 3)
    last3 = warm[-3:]
    # relative spread of the final 3 runs: <0.15 means the series is flat
    last3_spread = round((max(last3) - min(last3)) / max(min(last3), 1e-9), 3)

    # feature build alone (forced with a cheap full-scan agg, no collect)
    def fe_only():
        feats = build_features(transcripts)
        return feats.select(F.sum("n_turns_5"), F.count(F.lit(1))).collect()

    timed("fe_build", fe_only)

    # auto-k group-CV evaluate over the full corpus (round 4: 2 shared
    # scans total regardless of n_splits — fold-keyed fused stats +
    # fold-grouped loss; warm, plans already compiled by the e2e runs)
    if not E2E_ONLY:
        from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate

        feats_ak = build_features(transcripts).where(
            F.col("target_next_gap").isNotNull()
        )

        def autok_cv():
            cfg = AutoKConfig(k_method="evaluate", strategy="group_cv",
                              max_k=len(feat_cols), min_k=2, n_splits=4)
            return select_k_evaluate(
                feats_ak, list(feat_cols), "target_next_gap", cfg,
                group_col="conv_id", task="regression",
            )

        timed("autok_group_cv", autok_cv)

        # gaussian cached selection at the reference's default 50k-row
        # subsample budget (copula cache build + CEFS+). First call pays
        # this path's one-time plan/codegen compile like the headline, so
        # run twice and record the steady number (cold kept alongside)
        from mrmr_spark.select.cache import build_cache, select_cached

        def gauss_cached():
            cache = build_cache(feats_ak, list(feat_cols), subsample=50_000)
            res = select_cached(cache, "target_next_gap", 8, method="cefsplus")
            cache.unpersist()
            return res

        timed("gauss_cached_select_cold", gauss_cached)
        timed("gauss_cached_select", gauss_cached)

    # operator benches over driver testdata
    for name in [] if E2E_ONLY else [
        "sessionize",
        "rolling_time",
        "asof_join",
        "feature_matrix",
        "pricing_summary",
        "revenue_by_nation",
        "dedup_exact",
        "token_stats",
        "repetition_stats",
        "decontaminate",
        "pack_documents",
        "quantize_embeddings",
        "lm_score",
        "pii_redact",
        "temperature_sample",
        "duplicate_spans",
        "duplicate_trim",
        "dsir_logweights",
        "semdedup",
        "knn_cosine",
        "winnow_pairs",
        "common_lines",
        "c4_lines",
        "tfidf_terms",
        "mix_budget",
        "url_parts",
        "domain_stats",
        "pareto_sample",
        "epoch_shuffle",
        "fim_transform",
        "normalize_url",
        "sliding_chunks",
        "ppl_buckets_cut",
        "bm25_topk",
        "rrf_fusion",
        "strip_html",
        "term_blocklist",
        "dedup_incremental",
        "shard_sized",
        "corpus_report",
        "bpe_encode",
        "hashed_embedding",
        "chat_render",
        "chat_spans",
        "token_loss_mask",
        "pq_search",
        "bloom_membership",
        "preference_pairs",
        "unigram_segment",
        "prefix_dedup",
        "length_batches",
        "interleave_mix",
        "fewshot_prompts",
        "qa_scores",
        "pass_at_k",
        "bleu_scores",
        "rouge_l",
        "bt_ratings",
        "roc_auc",
        "classification_report",
        "psi_report",
        "majority_vote",
        "pca_project",
        "bootstrap_ci",
        "paired_bootstrap",
    ]:
        fn = gate.QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).select(F.count(F.lit(1))).collect())

    e2e_sec = timings["fe_mrmr_e2e"]
    out = {
        "metric": "fe+mrmr end-to-end seconds (headline; turns_per_sec derived)",
        "value": e2e_sec,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / e2e_sec, 1),
        "cpus": CPUS,
        "selected": res.names,
        "warm_runs": warm,
        "warm_median": timings["fe_mrmr_e2e_median"],
        "warm_last3_spread": last3_spread,
        "warm_steal_pct": warm_steal,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
