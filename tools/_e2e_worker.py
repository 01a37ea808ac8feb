"""One e2e worker process for the multi-process scaling evidence: runs the
flagship feature-build + mRMR job on ONE corpus slice in its own JVM
(= one 'executor' of the proxy cluster). Prints a single JSON line.

Usage: python tools/_e2e_worker.py <slice.parquet> <cpus> <warm_runs>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # per-run hypervisor-steal attribution (bench.steal_pct)
import pyarrow.dataset as pads
from pyspark.sql import functions as F

from mrmr_spark.fe import FEATURE_COLS, build_features
from mrmr_spark.select import select_mrmr
from mrmr_spark.session import get_spark


def main():
    path, cpus, warm_runs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    n_turns = pads.dataset(path, format="parquet").count_rows()
    spark = get_spark(
        app_name=f"e2e-worker-{os.getpid()}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": str(8 << 20),
            "spark.sql.inMemoryColumnarStorage.compressed": "false",
            "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(path)

    def e2e():
        feats = build_features(tr).where(F.col("target_next_gap").isNotNull())
        return select_mrmr(
            feats, FEATURE_COLS, "target_next_gap", 8,
            task="regression", subsample=None,
        )

    t0 = time.perf_counter()
    res = e2e()  # cold: codegen compile + JIT
    cold = time.perf_counter() - t0
    warm = []
    warm_steal = []
    for _ in range(warm_runs):
        c0 = bench._stat_counters()
        t0 = time.perf_counter()
        res = e2e()
        warm.append(round(time.perf_counter() - t0, 3))
        warm_steal.append(bench.steal_pct(c0, bench._stat_counters()))
    print(json.dumps({
        "pid": os.getpid(), "cpus": cpus, "turns": n_turns,
        "cold": round(cold, 3), "warm": warm, "min_warm": min(warm),
        "warm_steal_pct": warm_steal,
        "selected": res.names,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
