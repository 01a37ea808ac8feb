"""Compare materialization strategies for the FE matrix at one parallelism
level. Usage: SPARK_GRAFT_CPUS=32 MODE=persist|nocomp|localckpt|parquet \
python tools/probe_materialize.py"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mrmr_spark.fe import FEATURE_COLS, build_features
from mrmr_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MODE = os.environ.get("MODE", "persist")
extra = {"spark.ui.showConsoleProgress": "false"}
if MODE == "nocomp":
    extra["spark.sql.inMemoryColumnarStorage.compressed"] = "false"

spark = get_spark(app_name=f"mat-{CPUS}-{MODE}", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
tr = spark.read.parquet("/tmp/mrmr_bench/transcripts_c280000.parquet")
tr.count()
proj = build_features(tr).where(F.col("target_next_gap").isNotNull()).select(
    *FEATURE_COLS, "target_next_gap"
)
t0 = time.perf_counter()
if MODE in ("persist", "nocomp"):
    proj = proj.persist(StorageLevel.MEMORY_AND_DISK)
    proj.count()
elif MODE == "localckpt":
    proj = proj.localCheckpoint(eager=True)
elif MODE == "parquet":
    path = f"/tmp/mrmr_mat_{CPUS}"
    proj.write.mode("overwrite").parquet(path)
    proj = spark.read.parquet(path)
    proj.count()
mat = time.perf_counter() - t0
# warm read: one full-width scan
t0 = time.perf_counter()
proj.select(*[F.sum(c) for c in FEATURE_COLS]).collect()
read1 = time.perf_counter() - t0
t0 = time.perf_counter()
proj.select(*[F.sum(c) for c in FEATURE_COLS]).collect()
read2 = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "mode": MODE, "materialize": round(mat, 2),
                  "read1": round(read1, 2), "read2": round(read2, 2)}))
spark.stop()
