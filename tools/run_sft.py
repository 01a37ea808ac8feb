"""spark-submit entrypoint: resumable SFT training-data preparation.

The supervised-finetuning twin of ``run_curation.py``: multi-turn
transcripts in, packed training chunks WITH per-token loss masks out,
every phase checkpointed through ``plans.checkpoint.PhaseRunner`` — kill
the driver anywhere and completed phases resume from their manifests
(per-partition lineage + metrics inside).

    zip -r mrmr_spark.zip mrmr_spark
    spark-submit --py-files mrmr_spark.zip tools/run_sft.py \\
        --input <transcript parquet dir> \\
        --checkpoint-dir /lake/checkpoints/sft1 --budget 4096 --merges 32000

Local smoke:
    python tools/run_sft.py --input /tmp/mrmr_bench/transcripts_c200.parquet \\
        --checkpoint-dir /tmp/sft_run --budget 512 --merges 30

Phases (each resumable): ingest -> render (chat-template string per
conversation, stable turn order) -> dedup (exact dedup of rendered
conversations, keep the canonical copy) -> decontaminate (opt-in
``--eval-set``, on the rendered strings) -> mask (BPE vocabulary trained
on the surviving rendered corpus — the merge list persists beside the
manifests so a resumed driver re-masks with the SAME vocabulary — then
``token_loss_mask`` over the original turns, aggregated to one mask
vector + exact token count per conversation) -> split (stable hash
train/val assignment) -> pack (concatenate-and-chunk by the exact BPE
counts). Output: the packed frame; the chunk-span table is one
``explode_chunks(packed, budget, id_col="conv_id")`` away, and slicing
each conversation's mask vector by those spans yields the per-chunk
loss masks a trainer loads (the composition is pytest-proven in
``tests/test_chat.py::test_token_masks_pack_into_training_chunks``).
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
                    help="transcript table (parquet dir/file): conv_id, turn order, role, text")
    ap.add_argument("--checkpoint-dir", default="/tmp/mrmr_sft")
    ap.add_argument("--eval-set", default=None,
                    help="benchmark table to decontaminate the rendered corpus against")
    ap.add_argument("--contam-n", type=int, default=13)
    ap.add_argument("--budget", type=int, default=4096)
    ap.add_argument("--merges", type=int, default=2000,
                    help="BPE merge count trained on the rendered corpus")
    ap.add_argument("--order-col", default="turn_idx")
    ap.add_argument("--assistant-role", default="assistant")
    ap.add_argument("--train-frac", type=float, default=0.99)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mrmr_spark.operators.chat import render_conversations, token_loss_mask
    from mrmr_spark.operators.curation import hash_split, pack_documents
    from mrmr_spark.operators.dedup import exact_dedup
    from mrmr_spark.plans.checkpoint import PhaseRunner

    spark = SparkSession.getActiveSession()
    if spark is None:
        from mrmr_spark.session import get_spark

        spark = get_spark(app_name="mrmr-sft")
    spark.sparkContext.setLogLevel("WARN")
    order_cols = (args.order_col,)

    def ingest(_):
        return spark.read.parquet(args.input).select(
            "conv_id", args.order_col, "role", "text"
        )

    def render(prev):
        return render_conversations(prev, order_cols=order_cols, out_col="text")

    def dedup(prev):
        # exact dedup of the rendered strings: identical conversations
        # (same turns, same order) collapse to their canonical conv_id
        m = exact_dedup(prev, id_col="conv_id")
        keep = m.where(F.col("conv_id") == F.col("canonical_id")).select("conv_id")
        return prev.join(keep, "conv_id", "semi")

    def decontam(prev):
        from mrmr_spark.operators.curation import decontaminate

        bench = spark.read.parquet(args.eval_set)
        return decontaminate(prev, bench, id_col="conv_id", n=args.contam_n, mode="drop")

    def mask(prev):
        # the merge list is a resume artifact (run_curation convention):
        # persisted next to the manifests so a restarted driver re-masks
        # with the SAME vocabulary instead of retraining mid-resume
        from mrmr_spark.operators.tokenizer import bpe_train, word_counts

        mpath = os.path.join(args.checkpoint_dir, "bpe_merges.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                merges = [tuple(m) for m in json.load(f)["merges"]]
        else:
            model = bpe_train(word_counts(prev), num_merges=args.merges)
            os.makedirs(args.checkpoint_dir, exist_ok=True)
            tmp = mpath + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"merges": model["merges"], "n_words": model["n_words"],
                     "truncated": model["truncated"]},
                    f,
                )
            os.replace(tmp, mpath)
            merges = model["merges"]
        turns = spark.read.parquet(args.input).join(
            prev.select("conv_id"), "conv_id", "semi"
        )
        tlm = token_loss_mask(
            turns, merges, order_cols=order_cols,
            assistant_role=args.assistant_role,
        )
        return (
            tlm.groupBy("conv_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("tok_idx", "loss_mask"))).alias("z")
            )
            .select(
                "conv_id",
                F.transform(F.col("z"), lambda x: x["loss_mask"]).alias("mask"),
                F.size(F.col("z")).cast("long").alias("n_tok"),
                F.aggregate(
                    F.col("z"),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x["loss_mask"].cast("long"),
                ).alias("n_loss"),
            )
        )

    def split(prev):
        fr = {"train": args.train_frac, "val": round(1.0 - args.train_frac, 12)}
        return hash_split(prev, fr, id_col="conv_id")

    def pack(prev):
        return pack_documents(prev, budget=args.budget, id_col="conv_id", token_col="n_tok")

    runner = PhaseRunner(spark, args.checkpoint_dir, config=vars(args))
    packed = runner.run(
        [
            ("ingest", ingest),
            ("render", render),
            ("dedup", dedup),
            *([("decontaminate", decontam)] if args.eval_set else []),
            ("mask", mask),
            ("split", split),
            ("pack", pack),
        ],
        key_cols=["conv_id"],
    )
    totals = packed.agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.coalesce(F.max("chunk_last") + 1, F.lit(0)).alias("n_chunks"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.sum("n_loss"), F.lit(0)).alias("n_loss_tokens"),
    ).first()
    out = {
        "n_convs": int(totals["n_convs"]),
        "n_chunks": int(totals["n_chunks"]),
        "n_tokens": int(totals["n_tokens"]),
        "loss_token_frac": round(
            totals["n_loss_tokens"] / totals["n_tokens"], 6
        ) if totals["n_tokens"] else 0.0,
        "budget": args.budget,
        "phases": [
            {k: m[k] for k in ("phase", "n_rows", "n_partitions", "wall_s", "manifest_id")}
            for m in runner.manifests
        ],
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
