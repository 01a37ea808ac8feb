"""Scaling-efficiency evidence: the same end-to-end job (transcript feature
build + mRMR selection) at two parallelism levels — local[8] vs local[32],
the sandbox proxy for N vs 4N executors (BASELINE.json north_rule; a real
cluster is not available here).

Each level runs in a fresh JVM (subprocess) on the SAME cached corpus.
Efficiency = throughput(32) / (4 * throughput(8)). Writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: ~8.7M turns: big enough that per-core work dominates the fixed costs
#: (codegen compile, job scheduling, driver collects) — the regime that
#: matches per-executor data volume at the 10^12-turn target
N_CONVS = int(os.environ.get("MRMR_SCALING_NCONVS", "280000"))
RUNS = {}


def run(cpus: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "MRMR_BENCH_E2E_ONLY": "1",
            "MRMR_BENCH_NCONVS": str(N_CONVS),
            "PYTHONPATH": REPO,
            # same heap at both levels; sized so 32 concurrent window sorts
            # + the cached feature frame never spill
            "SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
            # 6 matches bench.py's headline default: round 4 proved a 3-run
            # series can still be descending at run 3 under co-tenant steal
            "MRMR_BENCH_WARM_RUNS": os.environ.get("MRMR_BENCH_WARM_RUNS", "6"),
        }
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    r8 = run(8)
    print(json.dumps(r8))
    r32 = run(32)
    print(json.dumps(r32))

    tp8 = r8["turns_per_sec"]
    tp32 = r32["turns_per_sec"]
    eff = tp32 / (4.0 * tp8)
    report = f"""# BENCH — scaling evidence (local[8] vs local[32])

The BASELINE.json north_rule requires >=0.8 throughput scaling efficiency
from N to 4N executors. No real cluster exists in this sandbox; per the
driver instruction the evidence is the SAME job at two parallelism levels
on identical input.

**Job**: end-to-end transcript feature build (sessionize, lag/lead,
leakage-free rolling aggregates, per-session ranks) + Spark-native mRMR
(2 JVM moment scans + 1 Arrow Gram reduction + driver greedy loop), k=8.

**Input**: deterministic synthetic transcript corpus, {r8['n_turns']:,} turns
(Zipf-skewed conversation sizes), parquet.

| parallelism | e2e sec | turns/sec |
|---|---|---|
| local[8]  (N)  | {r8['value']} | {tp8:,.0f} |
| local[32] (4N) | {r32['value']} | {tp32:,.0f} |

**Scaling efficiency** = tp32 / (4 x tp8) = **{eff:.3f}**
({'MEETS' if eff >= 0.8 else 'BELOW'} the >=0.8 criterion)

Selected features agree across parallelism levels: {r8['selected'] == r32['selected']}
(`{r8['selected']}`)

Machine: single host, 32 CPUs, PySpark {{4.1.2}}, shuffle partitions = cpu
count, AQE on. Reproduce: `python tools/bench_scaling.py`.
"""
    # BENCH.md is hand-authored (multi-evidence); persist raw numbers here
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump({"local8": r8, "local32": r32, "efficiency": round(eff, 3)}, f)
    print(report)


if __name__ == "__main__":
    main()
