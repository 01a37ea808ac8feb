"""Warm phase-timing breakdown of the e2e job at one parallelism level.

Each phase runs REPS times after a cold warm-up; reports min (the stable
statistic under noisy-neighbor steal and JIT ramp). Feeds BENCH.md §3's
per-phase scaling table. Usage:
  SPARK_GRAFT_CPUS=8 python tools/profile_phases.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pyspark.sql import functions as F

from mrmr_spark.session import get_spark
from mrmr_spark.fe import build_features, FEATURE_COLS
from mrmr_spark.select import kernels

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))
CORPUS = os.environ.get("MRMR_CORPUS", "/tmp/mrmr_bench/transcripts_c280000.parquet")

spark = get_spark(app_name=f"phases-{CPUS}", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS,
                  extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.sql.files.maxPartitionBytes": str(8 << 20),
                              "spark.sql.inMemoryColumnarStorage.compressed": "false",
                              "spark.sql.inMemoryColumnarStorage.batchSize": "65536"})
spark.sparkContext.setLogLevel("ERROR")
t = {}

def timed(name, fn, reps=REPS):
    fn()  # cold (codegen compile / JIT) — excluded
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    t[name] = round(best, 2)

tr = spark.read.parquet(CORPUS)
timed("scan_count", lambda: tr.count())

T = "target_next_gap"
def mk_proj():
    feats = build_features(tr).where(F.col(T).isNotNull())
    return feats.select(*FEATURE_COLS, T)

# FE compute forced via a sum over every feature column (no cache, no prune)
sums = [F.sum(c) for c in FEATURE_COLS] + [F.sum(T)]
timed("fe_compute", lambda: mk_proj().select(*sums).collect())

# persist encode (unpersist + re-materialize each rep)
def materialize():
    p = mk_proj().persist()
    p.count()
    p.unpersist()
timed("fe_materialize", materialize)

proj = mk_proj().persist()
proj.count()
timed("pass1_means", lambda: kernels.impute_mean_pass(proj, FEATURE_COLS, None, T))
p1 = kernels.impute_mean_pass(proj, FEATURE_COLS, None, T)
timed("pass2_gram", lambda: kernels.centered_gram_pass(
    proj, FEATURE_COLS, None, p1["impute_means"], p1["col_wmeans"],
    y_col=T, y_wmean=p1["wy"] / p1["sw"]))
proj.unpersist()

# the no-persist single-pass backend, straight over the window pipeline
timed("single_pass_total", lambda: kernels.fused_singlepass_stats(
    mk_proj(), FEATURE_COLS, T, None))

print(json.dumps({"cpus": CPUS, "reps": REPS, **t}))
spark.stop()
