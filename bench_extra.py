"""Optimization-round measurement harness (guide §1): per-query isolation.

Times individual gate queries with the SAME methodology as the frozen
bench.py (`.select(count(1)).collect()` after a JVM/Arrow warmup), plus
optional noop-sink runs and `.explain("formatted")` capture.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--explain OUTDIR]
                        [--noop] [--e2e] name [name ...]

Prints one JSON line: {"queries": {name: [sec, ...]}, "sf": ...}.
bench.py itself stays frozen (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for explain(formatted) dumps")
    ap.add_argument("--suffix", default="", help="suffix for explain files, e.g. _before")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink run")
    ap.add_argument("--e2e", action="store_true", help="time the fe+mrmr e2e headline")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mrmr_spark import gate
    from mrmr_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": str(8 << 20),
            "spark.sql.inMemoryColumnarStorage.compressed": "false",
            "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: JVM + Python worker pool
    import pyarrow as pa

    ev = spark.read.parquet(f"{args.sf}/events.parquet")
    ev.count()

    def _ident(it):
        for b in it:
            yield pa.RecordBatch.from_arrays([pa.array([b.num_rows])], ["n"])

    ev.select("value").mapInArrow(_ident, "n long").agg(F.sum("n")).collect()

    out: dict[str, list[float]] = {}

    def record(name, fn):
        ts = out.setdefault(name, [])
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))

    if args.e2e:
        from mrmr_spark.fe import FEATURE_COLS, build_features
        from mrmr_spark.select import select_mrmr

        from bench import ensure_transcripts

        tr_path, n_turns = ensure_transcripts(args.sf)
        transcripts = spark.read.parquet(tr_path)

        def e2e():
            feats = build_features(transcripts).where(
                F.col("target_next_gap").isNotNull()
            )
            return select_mrmr(
                feats, FEATURE_COLS, "target_next_gap", 8,
                task="regression", subsample=None,
            )

        e2e()  # cold (plan/codegen compile), untimed
        record("fe_mrmr_e2e", e2e)

    for name in args.names:
        fn = gate.QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        record(name, lambda fn=fn: fn(spark, args.sf).select(F.count(F.lit(1))).collect())
        if args.noop:
            record(
                f"{name}__noop",
                lambda fn=fn: fn(spark, args.sf)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": out, "sf": args.sf, "cpus": args.cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
