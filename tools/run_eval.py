"""spark-submit entrypoint: resumable eval-set preparation + scoring.

The evaluation twin of ``run_curation.py`` / ``run_sft.py``: an eval
table in, k-shot prompts and per-task scores out, every phase
checkpointed through ``plans.checkpoint.PhaseRunner`` (kill the driver
anywhere; completed phases resume from their manifests).

    zip -r mrmr_spark.zip mrmr_spark
    spark-submit --py-files mrmr_spark.zip tools/run_eval.py \\
        --input <eval parquet> --pool <exemplar parquet> --shots 5 \\
        --predictions <model-output parquet> --checkpoint-dir /lake/ck/eval1

Local smoke:
    python tools/run_eval.py --input /tmp/eval.parquet --shots 3 \\
        --checkpoint-dir /tmp/eval_run

Phases (each resumable): ingest -> prompts (k-shot assembly via
``fewshot_prompts``; ``--pool`` supplies the exemplar table, otherwise a
deterministic hash split carves a disjoint pool out of the input — the
eval rows that remain are never in their own block) -> predict (JOIN of
``--predictions`` (id_col, prediction) — generation itself is EXTERNAL
to this engine; without it, ``--baseline empty`` scores the no-answer
baseline and ``--baseline echo-input`` the copy-input baseline, useful
to exercise the harness and calibrate floor scores) -> score
(``qa_scores`` EM + token F1 per row; ``--metrics qa,bleu,rouge,chrf,wer``
adds sentence BLEU-4, ROUGE-L F, chrF2 and word-error-rate columns from
the same (prediction, target) pair — all pure projections, so extra
metrics cost no extra shuffle) -> report (per-task n / EM / F1 and the
enabled extra means).
Returns the report dict and prints it as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="eval table (parquet): id_col, task_col, input_col, target_col")
    ap.add_argument("--pool", default=None,
                    help="exemplar pool table (same schema); default: hash-split from input")
    ap.add_argument("--pool-frac", type=float, default=0.5,
                    help="pool fraction when carving the pool out of --input")
    ap.add_argument("--predictions", default=None,
                    help="model outputs (parquet): id_col, prediction")
    ap.add_argument("--baseline", default="empty", choices=["empty", "echo-input"],
                    help="scoring baseline when --predictions is absent")
    ap.add_argument("--metrics", default="qa",
                    help="comma list: qa (EM+F1, always useful), bleu "
                         "(sentence BLEU-4), rouge (ROUGE-L F), chrf "
                         "(chrF2), wer (word error rate)")
    ap.add_argument("--shots", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default="/tmp/mrmr_eval")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--task-col", default="source")
    ap.add_argument("--input-col", default="text")
    ap.add_argument("--target-col", default="lang")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mrmr_spark.operators.chat import fewshot_prompts
    from mrmr_spark.operators.evalmetrics import (
        bleu_scores,
        chrf_scores,
        rouge_l_scores,
        wer_scores,
    )
    from mrmr_spark.operators.curation import hash_split
    from mrmr_spark.operators.textstats import qa_scores
    from mrmr_spark.plans.checkpoint import PhaseRunner

    spark = SparkSession.getActiveSession()
    if spark is None:
        from mrmr_spark.session import get_spark

        spark = get_spark(app_name="mrmr-eval")
    spark.sparkContext.setLogLevel("WARN")
    idc, task = args.id_col, args.task_col

    def ingest(_):
        df = spark.read.parquet(args.input).select(
            idc, task, args.input_col, args.target_col
        )
        if args.pool is None:
            # deterministic disjoint pool out of the input: growth-stable
            # hash split, so re-running with more eval rows never moves an
            # existing row between pool and eval
            fr = {"pool": args.pool_frac, "eval": round(1.0 - args.pool_frac, 12)}
            return hash_split(df, fr, id_col=idc, split_col="_role")
        return df.withColumn("_role", F.lit("eval"))

    def prompts(prev):
        ev = prev.where(F.col("_role") == "eval").drop("_role")
        pool = (
            spark.read.parquet(args.pool)
            if args.pool is not None
            else prev.where(F.col("_role") == "pool").drop("_role")
        )
        return fewshot_prompts(
            ev, pool, args.shots, task_col=task, input_col=args.input_col,
            target_col=args.target_col, id_col=idc, seed=args.seed,
        )

    def predict(prev):
        if args.predictions is not None:
            preds = spark.read.parquet(args.predictions).select(
                idc, F.col("prediction").cast("string").alias("prediction")
            )
            return prev.join(preds, idc, "left")
        base = (
            F.lit("")
            if args.baseline == "empty"
            else F.col(args.input_col).cast("string")
        )
        return prev.withColumn("prediction", base)

    metrics = [m.strip() for m in args.metrics.split(",") if m.strip()]
    unknown = set(metrics) - {"qa", "bleu", "rouge", "chrf", "wer"}
    if unknown or "qa" not in metrics:
        raise ValueError(
            "--metrics must be a subset of qa,bleu,rouge,chrf,wer and "
            f"include qa; got {args.metrics!r}"
        )

    def score(prev):
        # every metric is a projection over (prediction, target) —
        # chaining them adds zero shuffles; the only care is the shared
        # diagnostic names: n_pred/n_ref are dropped before each
        # re-derivation, and bleu's per-order match_n/total_n stats are
        # RENAMED to bleu_* (they are corpus_bleu's inputs — a later
        # chrf would otherwise collide with and destroy them)
        def _clean(d):
            shared = [c for c in d.columns if c in ("n_pred", "n_ref")]
            return d.drop(*shared) if shared else d

        out = qa_scores(prev, pred_col="prediction", ref_col=args.target_col)
        if "bleu" in metrics:
            out = bleu_scores(
                _clean(out), pred_col="prediction", ref_col=args.target_col,
            )
            for c in [c for c in out.columns
                      if c.startswith(("match_", "total_"))]:
                out = out.withColumnRenamed(c, f"bleu_{c}")
        if "rouge" in metrics:
            out = rouge_l_scores(
                _clean(out), pred_col="prediction", ref_col=args.target_col,
            )
        if "chrf" in metrics:
            out = chrf_scores(
                _clean(out), pred_col="prediction", ref_col=args.target_col,
            )
            # per-order char-gram stats are corpus_chrf inputs, noise in
            # a per-row eval frame (18 columns) — the score is the point
            out = out.drop(*[c for c in out.columns
                             if c.startswith(("match_", "total_c_", "total_r_"))])
        if "wer" in metrics:
            out = wer_scores(
                _clean(out), pred_col="prediction", ref_col=args.target_col,
            )
        return out

    def report(prev):
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("exact_match").cast("double")).alias("em"),
            F.avg("f1").alias("f1"),
            F.avg("n_shots").alias("avg_shots"),
        ]
        if "bleu" in metrics:
            aggs.append(F.avg("bleu").alias("bleu"))
        if "rouge" in metrics:
            aggs.append(F.avg("rouge_l_f").alias("rouge_l_f"))
        if "chrf" in metrics:
            aggs.append(F.avg("chrf").alias("chrf"))
        if "wer" in metrics:
            aggs.append(F.avg("wer").alias("wer"))
        return prev.groupBy(task).agg(*aggs)

    runner = PhaseRunner(spark, args.checkpoint_dir, config=vars(args))
    scored = runner.run(
        [
            ("ingest", ingest),
            ("prompts", prompts),
            ("predict", predict),
            ("score", score),
        ],
        key_cols=[idc],
    )
    # the report frame keys on the task, not the row id
    rep = runner.run([("report", lambda _: report(scored))], key_cols=[task])
    rows = sorted(
        (r.asDict() for r in rep.collect()), key=lambda r: str(r[task])
    )
    extra_cols = [
        c for c in ("bleu", "rouge_l_f", "chrf", "wer")
        if any(c in r for r in rows)
    ]
    out = {
        "tasks": [
            {task: r[task], "n": int(r["n"]), "em": round(float(r["em"]), 6),
             "f1": round(float(r["f1"]), 6), "avg_shots": round(float(r["avg_shots"]), 3),
             **{c: (round(float(r[c]), 6) if r[c] is not None else None)
                for c in extra_cols}}
            for r in rows
        ],
        "micro_em": round(
            sum(r["em"] * r["n"] for r in rows) / max(sum(r["n"] for r in rows), 1), 6
        ),
        "micro_f1": round(
            sum(r["f1"] * r["n"] for r in rows) / max(sum(r["n"] for r in rows), 1), 6
        ),
        "shots": args.shots,
        "phases": [
            {k: m[k] for k in ("phase", "n_rows", "n_partitions", "wall_s", "manifest_id")}
            for m in runner.manifests
        ],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
