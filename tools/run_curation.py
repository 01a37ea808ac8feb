"""spark-submit entrypoint: resumable corpus curation.

The training-data twin of ``run_pipeline.py``: documents in, a cleaned /
deduplicated / split / chunk-packed corpus out, with every phase
checkpointed through ``plans.checkpoint.PhaseRunner`` — kill the driver
anywhere and completed phases resume from their manifests
(per-partition lineage + metrics inside).

    zip -r mrmr_spark.zip mrmr_spark
    spark-submit --py-files mrmr_spark.zip tools/run_curation.py \\
        --input <parquet dir> --eval-set <parquet dir> \\
        --checkpoint-dir /lake/checkpoints/curation1 --budget 4096

Local smoke:
    python tools/run_curation.py --input /root/testdata/sf0.01/documents.parquet \\
        --checkpoint-dir /tmp/curation_run --budget 1024

Phases (each resumable): ingest -> html (WET-style extraction, opt-in
``--strip-html``) -> decontaminate (skipped without --eval-set) ->
pii (opt-in ``--pii``) -> lines (boilerplate-line removal, opt-in
``--line-max-df N``) -> quality (Gopher rules) -> blocklist (opt-in
``--blocklist w1,w2``) -> dedup (winnow candidates -> exact verify ->
transitive clusters -> canonical corpus) -> refdedup (incremental
exact dedup against a prior curated snapshot, opt-in ``--ref-corpus``)
-> split -> tokenize (BPE train + exact subword token counts, opt-in
``--bpe-merges N``; the trained merge list persists beside the phase
manifests so a resumed driver re-encodes with the same vocabulary)
-> pack (by exact BPE counts when tokenize ran, else the whitespace
estimate). The chunk-span table and per-phase row counts are the
output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents table (parquet dir/file)")
    ap.add_argument("--eval-set", default=None, help="benchmark table to decontaminate against")
    ap.add_argument("--checkpoint-dir", default="/tmp/mrmr_curation")
    ap.add_argument("--contam-n", type=int, default=13)
    ap.add_argument("--budget", type=int, default=4096)
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-stopword-hits", type=int, default=2)
    ap.add_argument("--train-frac", type=float, default=0.99)
    ap.add_argument("--pii", action="store_true",
                    help="redact PII (emails/IPs/phones/...) before quality")
    ap.add_argument("--line-max-df", type=int, default=0,
                    help=">0: drop lines occurring in >= N docs (boilerplate)")
    ap.add_argument("--strip-html", action="store_true",
                    help="run WET-style HTML->text extraction first")
    ap.add_argument("--blocklist", default=None,
                    help="comma-separated bad-word list; docs containing any are dropped")
    ap.add_argument("--ref-corpus", default=None,
                    help="prior curated snapshot (parquet); exact cross-corpus dedup against it")
    ap.add_argument("--bpe-merges", type=int, default=0,
                    help=">0: train a BPE vocabulary with N merges on the curated "
                         "corpus, count exact subword tokens per doc, and pack by "
                         "those counts instead of the whitespace estimate")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from mrmr_spark.operators.curation import (
        decontaminate,
        gopher_quality_filter,
        hash_split,
        pack_documents,
    )
    from mrmr_spark.operators.dedup import dedup_documents, verify_candidate_pairs
    from mrmr_spark.operators.textstats import winnow_candidate_pairs
    from mrmr_spark.plans.checkpoint import PhaseRunner

    spark = SparkSession.getActiveSession()
    if spark is None:
        from mrmr_spark.session import get_spark

        spark = get_spark(app_name="mrmr-curation")
    spark.sparkContext.setLogLevel("WARN")

    def ingest(_):
        return spark.read.parquet(args.input)

    def decontam(prev):
        if args.eval_set is None:
            return prev
        bench = spark.read.parquet(args.eval_set)
        return decontaminate(prev, bench, n=args.contam_n, mode="drop")

    def html(prev):
        from mrmr_spark.operators.html import strip_html

        return strip_html(prev)

    def pii(prev):
        from mrmr_spark.operators.pii import redact_pii

        return redact_pii(prev)

    def blocklist(prev):
        from mrmr_spark.operators.curation import filter_by_terms

        return filter_by_terms(prev, args.blocklist.split(","), mode="drop")

    def refdedup(prev):
        from mrmr_spark.operators.dedup import dedup_against

        return dedup_against(prev, spark.read.parquet(args.ref_corpus), mode="exact")

    def lines(prev):
        from mrmr_spark.operators.lines import remove_common_lines

        return remove_common_lines(prev, max_df=args.line_max_df).drop(
            "n_removed_lines"
        )

    def quality(prev):
        return gopher_quality_filter(
            prev,
            min_words=args.min_words,
            min_stopword_hits=args.min_stopword_hits,
            mode="drop",
        )

    def dedup(prev):
        pairs = verify_candidate_pairs(prev, winnow_candidate_pairs(prev))
        ckpt = os.path.join(args.checkpoint_dir, "_cc")
        return dedup_documents(prev, pairs, checkpoint_dir=ckpt)

    def split(prev):
        fr = {"train": args.train_frac, "val": round(1.0 - args.train_frac, 12)}
        return hash_split(prev, fr)

    def tokenize(prev):
        # the trained merge list is itself a resume artifact: persisted next
        # to the phase manifests so a restarted driver re-encodes with the
        # SAME vocabulary instead of retraining on whatever the corpus looks
        # like mid-resume (same local-fs convention as the manifests)
        from mrmr_spark.operators.tokenizer import (
            bpe_token_count,
            bpe_train,
            word_counts,
        )

        mpath = os.path.join(args.checkpoint_dir, "bpe_merges.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                merges = [tuple(m) for m in json.load(f)["merges"]]
        else:
            model = bpe_train(word_counts(prev), num_merges=args.bpe_merges)
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
        return bpe_token_count(prev, merges, out_col="n_bpe_tokens")

    def pack(prev):
        token_col = "n_bpe_tokens" if args.bpe_merges > 0 else None
        return pack_documents(prev, budget=args.budget, token_col=token_col)

    runner = PhaseRunner(spark, args.checkpoint_dir, config=vars(args))
    packed = runner.run(
        [
            ("ingest", ingest),
            # opt-in phases are omitted entirely when off (a pass-through
            # phase would still checkpoint a full corpus copy)
            *([("html", html)] if args.strip_html else []),
            ("decontaminate", decontam),
            *([("pii", pii)] if args.pii else []),
            *([("lines", lines)] if args.line_max_df > 0 else []),
            ("quality", quality),
            *([("blocklist", blocklist)] if args.blocklist else []),
            ("dedup", dedup),
            *([("refdedup", refdedup)] if args.ref_corpus else []),
            ("split", split),
            *([("tokenize", tokenize)] if args.bpe_merges > 0 else []),
            ("pack", pack),
        ],
        key_cols=["doc_id"],
    )
    max_chunk = packed.agg({"chunk_last": "max"}).first()[0]
    n_chunks = 0 if max_chunk is None else max_chunk + 1  # empty corpus is legal
    out = {
        "n_docs": packed.count(),
        "n_chunks": int(n_chunks),
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
