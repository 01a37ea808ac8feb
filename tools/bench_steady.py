"""Steady-state repeats for the expensive bench entries, one JSON line.

The per-round driver bench (bench.py) times `autok_group_cv` and
`winnow_pairs` ONCE each — a single sample on a host with documented
multi-second co-tenant bursts (BENCH.md §4) is not a comparison base.
This tool runs N repeats of each inside one warm session and reports the
full series + median + min, for recording in BENCH.md §6. Run it on an
idle window (check `vmstat`'s steal column first).

  MRMR_STEADY_REPEATS=3 python tools/bench_steady.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the bench corpus + session config)

REPEATS = int(os.environ.get("MRMR_STEADY_REPEATS", "3"))
E2E_REPEATS = int(os.environ.get("MRMR_STEADY_E2E_REPEATS", "8"))


def main():
    from pyspark.sql import functions as F

    from mrmr_spark import gate
    from mrmr_spark.fe import FEATURE_COLS, build_features
    from mrmr_spark.select import select_mrmr
    from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate
    from mrmr_spark.session import get_spark

    tr_path, n_turns = bench.ensure_transcripts(bench.SF_DIR)
    spark = get_spark(
        app_name="mrmr-bench-steady",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": str(8 << 20),
            "spark.sql.inMemoryColumnarStorage.compressed": "false",
            "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(tr_path)

    def e2e():
        feats = build_features(transcripts).where(
            F.col("target_next_gap").isNotNull()
        )
        return select_mrmr(
            feats, FEATURE_COLS, "target_next_gap", 8,
            task="regression", subsample=None,
        )

    feats_ak = build_features(transcripts).where(F.col("target_next_gap").isNotNull())

    def autok_cv():
        cfg = AutoKConfig(k_method="evaluate", strategy="group_cv",
                          max_k=len(FEATURE_COLS), min_k=2, n_splits=4)
        return select_k_evaluate(
            feats_ak, list(FEATURE_COLS), "target_next_gap", cfg,
            group_col="conv_id", task="regression",
        )

    def winnow():
        return (
            gate.QUERIES["winnow_pairs"](spark, bench.SF_DIR)
            .select(F.count(F.lit(1))).collect()
        )

    series: dict[str, list[float]] = {}
    steals: dict[str, list[float | None]] = {}

    def run(name: str, fn, n: int):
        s, st = [], []
        fn()  # discarded warm-up: plan/codegen compile, Arrow worker spin-up
        for _ in range(n):
            c0 = bench._stat_counters()
            t0 = time.perf_counter()
            fn()
            s.append(round(time.perf_counter() - t0, 3))
            st.append(bench.steal_pct(c0, bench._stat_counters()))
        series[name] = s
        steals[name] = st

    run("fe_mrmr_e2e", e2e, E2E_REPEATS)
    run("autok_group_cv", autok_cv, REPEATS)
    run("winnow_pairs", winnow, REPEATS)

    out = {
        "sf": bench._sf_label(bench.SF_DIR),
        "cpus": bench.CPUS,
        "n_turns": n_turns,
        "series": series,
        "steal_pct": steals,
        "median": {k: round(statistics.median(v), 3) for k, v in series.items()},
        "min": {k: min(v) for k, v in series.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
