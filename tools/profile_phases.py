"""Phase-timing breakdown of the e2e job at one parallelism level.
Usage: SPARK_GRAFT_CPUS=8 python tools/profile_phases.py
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
CORPUS = os.environ.get("MRMR_CORPUS", "/tmp/mrmr_bench/transcripts_c280000.parquet")

spark = get_spark(app_name=f"phases-{CPUS}", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
t = {}

def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    t[name] = round(time.perf_counter() - t0, 2)
    return out

tr = spark.read.parquet(CORPUS)
timed("scan_count", lambda: tr.count())

feats = build_features(tr).where(F.col("target_next_gap").isNotNull())
proj = feats.select(*FEATURE_COLS, "target_next_gap")
timed("fe_nocache_count", lambda: proj.count())

proj = proj.persist()
timed("fe_materialize", lambda: proj.count())

p1 = timed("pass1", lambda: kernels.impute_mean_pass(proj, FEATURE_COLS, None, "target_next_gap"))
p2 = timed("pass2", lambda: kernels.centered_moments_pass(
    proj, FEATURE_COLS, "target_next_gap", None, p1["impute_means"], p1["col_wmeans"], p1["wy"]/p1["sw"]))
sd = np.sqrt(np.maximum(p2["x_ss"]/p1["sw"], 1e-12))
timed("gram", lambda: kernels.gram_pass(
    proj, FEATURE_COLS, None, p1["impute_means"], p1["col_wmeans"], sd, clip=None))
timed("pass1_again", lambda: kernels.impute_mean_pass(proj, FEATURE_COLS, None, "target_next_gap"))

print(json.dumps({"cpus": CPUS, **t}))
spark.stop()
