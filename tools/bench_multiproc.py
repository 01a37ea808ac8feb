"""Multi-process scaling evidence: 4 CONCURRENT local[8] JVMs — each its own
process with its own heap, GC, and Python workers, i.e. the closest one-host
proxy for 4 separate 8-core executors — vs 1 local[8] JVM, on equal slices
of the same corpus.

This separates the two candidate explanations for a weak single-JVM
local[8]->local[32] strong-scaling number:

- If 4 concurrent JVMs aggregate ~4x one JVM's throughput, the ENGINE scales
  across executors and the single-JVM shortfall is intra-JVM (shared young
  gen, allocation contention, one code cache) — artifacts a real 4N-executor
  cluster does not have.
- If they do not, the host itself (shared DRAM bandwidth) is the ceiling.

Writes its findings to stdout as JSON lines; the numbers go into BENCH.md §3.
Usage: python tools/bench_multiproc.py  (env: MRMR_SCALING_NCONVS, WARM_RUNS)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CONVS = int(os.environ.get("MRMR_SCALING_NCONVS", "280000"))
# 6, matching bench.py's headline default: with 3 warm runs the four
# concurrent JVMs never reach steady state (their series are still
# descending at run 3 — 4 cold JITs + GC churn overlap) while the lone
# baseline JVM turbos on an idle host, and the efficiency statistic
# reads 0.38-0.43 on the same code that measures 0.81 at steady state
# (like-for-like series in BENCH.md §1).
WARM_RUNS = int(os.environ.get("WARM_RUNS", "6"))
N_PROCS = 4
CPUS_EACH = 8
SLICES = [f"/tmp/mrmr_bench/slice{N_PROCS}_{i}_c{N_CONVS}.parquet" for i in range(N_PROCS)]


def ensure_slices():
    if all(os.path.exists(s) for s in SLICES):
        return
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from mrmr_spark.session import get_spark
    from mrmr_spark.sources.transcripts import write_transcripts_parquet

    corpus = f"/tmp/mrmr_bench/transcripts_c{N_CONVS}.parquet"
    if not os.path.exists(corpus):
        os.makedirs("/tmp/mrmr_bench", exist_ok=True)
        write_transcripts_parquet(corpus, n_convs=N_CONVS, mean_turns=30, seed=42)
    spark = get_spark(app_name="slices", master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(corpus)
    # conv-hash split: whole conversations stay together (the job's group key)
    sliced = tr.withColumn("_s", F.pmod(F.xxhash64("conv_id"), F.lit(N_PROCS)))
    for i, path in enumerate(SLICES):
        (sliced.where(F.col("_s") == i).drop("_s")
         .repartition(8).write.mode("overwrite").parquet(path + ".tmp"))
        os.rename(path + ".tmp", path)
    spark.stop()


def run_worker(path: str, cpus: int) -> subprocess.Popen:
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO,
        "OPENBLAS_NUM_THREADS": "1",
        "OMP_NUM_THREADS": "1",
        "SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    })
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "_e2e_worker.py"),
         path, str(cpus), str(WARM_RUNS)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def parse(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate(timeout=2400)
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    ensure_slices()

    # N baseline: ONE local[8] process on slice 0 (otherwise-idle host)
    r_single = parse(run_worker(SLICES[0], CPUS_EACH))
    print(json.dumps({"phase": "single", **r_single}))
    tp_single = r_single["turns"] / r_single["min_warm"]

    # 4N: four concurrent local[8] processes, one slice each
    t0 = time.perf_counter()
    procs = [run_worker(s, CPUS_EACH) for s in SLICES]
    results = [parse(p) for p in procs]
    wall = time.perf_counter() - t0
    for r in results:
        print(json.dumps({"phase": "concurrent", **r}))

    agg_tp = sum(r["turns"] / r["min_warm"] for r in results)
    total_turns = sum(r["turns"] for r in results)
    eff = agg_tp / (N_PROCS * tp_single)
    summary = {
        "phase": "summary",
        "single_proc_turns_per_sec": round(tp_single, 1),
        "concurrent_agg_turns_per_sec": round(agg_tp, 1),
        "n_procs": N_PROCS,
        "cpus_each": CPUS_EACH,
        "total_turns": total_turns,
        "wall_incl_startup": round(wall, 1),
        "process_scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
