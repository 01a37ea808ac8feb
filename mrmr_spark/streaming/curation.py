"""Streaming corpus curation.

The reference is a pure batch library (no streaming surface; SURVEY.md
§2.I); this extends the curation family (``operators/curation``) to
Structured Streaming ingest — the shape a live training-data feed runs:
documents arrive continuously and must be checked against the eval
benchmarks BEFORE admission.

``streaming_decontaminate`` is deliberately stateless: the benchmark
n-gram set is (a) finite and small by the nature of the problem — eval
benchmarks are MBs against a TB-scale stream — and (b) static for the
lifetime of the query. So it is collected once, broadcast to the
executors, and each micro-batch is flagged by a vectorized membership
check in a ``mapInPandas`` stage: no state store, no watermark, no
shuffle, identical results to the batch ``decontaminate`` (replay
equality is pytest-verified). Gram matching is by the gram STRING
(set lookup), which is exactly the batch semantics — the batch
operator's 128-bit hash join is an equality join on the same strings.

The other curation columns need no twin at all: repetition stats,
n-gram builders and the quantizer are per-row expressions and run on a
streaming frame unchanged (the repetition Column backend is tested on
streams alongside the stateless text ops). DSIR admission scoring
follows the same principle via
``operators.curation.dsir_logweight_expr`` — the bucket models fold
into one literal log-ratio array, so the scorer is a pure projection
and streams unchanged (pytest: ``test_dsir_logweight_expr_runs_on_streams``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_benchmark_grams(
    benchmark: DataFrame, text_col: str = "text", n: int = 13, split: str = " "
) -> set:
    """Driver-side distinct word-``n``-gram STRING set of an eval table.
    Bounded by the benchmark size by definition (the op exists because
    the benchmark is small); the one justified collect in this module."""
    from mrmr_spark.operators.curation import word_ngrams

    rows = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(text_col, n, split))).alias("g")
        )
        .distinct()
        .collect()
    )
    return {r.g for r in rows}


def streaming_decontaminate(
    stream: DataFrame,
    bench_grams: set,
    text_col: str = "text",
    n: int = 13,
    split: str = " ",
    mode: str = "flag",
) -> DataFrame:
    """Flag (or drop) streaming documents sharing any word ``n``-gram with
    the benchmark set (from :func:`collect_benchmark_grams`). Stateless —
    works identically on batch frames; on streams it composes with any
    output mode because it is a pure per-row map.

    mode="flag": adds ``contaminated`` + ``n_hit_grams`` (count of
    DISTINCT doc grams found in the benchmark — the same definition as
    batch ``decontaminate``). mode="drop": contaminated rows removed.

    The gram set ships to executors once via a Spark broadcast (not the
    task closure), so a 10^5-gram benchmark costs one transfer per
    executor, not one per task.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    sc = stream.sparkSession.sparkContext
    bc = sc.broadcast(frozenset(bench_grams))
    in_cols = [f.name for f in stream.schema.fields]
    out_schema = StructType(
        list(stream.schema.fields)
        + [StructField("contaminated", BooleanType()), StructField("n_hit_grams", LongType())]
    )

    def _flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grams = bc.value
        for pdf in batches:
            hits = []
            for t in pdf[text_col]:
                toks = t.split(split)
                if len(toks) < n:
                    hits.append(0)
                    continue
                seen = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                hits.append(len(seen & grams))
            pdf = pdf.copy()
            pdf["n_hit_grams"] = pd.array(hits, dtype="int64")
            pdf["contaminated"] = pdf["n_hit_grams"] > 0
            yield pdf[in_cols + ["contaminated", "n_hit_grams"]]

    flagged = stream.mapInPandas(_flag, out_schema)
    if mode == "drop":
        return flagged.where(~F.col("contaminated")).drop("contaminated", "n_hit_grams")
    return flagged


def streaming_contamination_trim(
    stream: DataFrame,
    bench_grams: set,
    text_col: str = "text",
    n: int = 13,
    split: str = " ",
) -> DataFrame:
    """Surgical decontamination on a live feed: cut the benchmark-covered
    token spans out of each arriving document instead of dropping it —
    the streaming twin of batch ``contamination_spans`` +
    ``trim_duplicate_spans`` (replay equality pytest-verified). Adds
    ``n_removed_tokens``. Stateless like :func:`streaming_decontaminate`
    (the benchmark set is broadcast once); a document's spans depend on
    nothing but its own text and the static set, so no state store, no
    watermark, no shuffle.

    Span semantics match batch exactly: gram positions whose n-gram is
    in the benchmark set, merged while ``pos <= prev + n``; tokens in
    any merged ``[start, end)`` dropped; survivors re-joined on
    ``split``."""
    from pyspark.sql.types import LongType, StructField, StructType

    sc = stream.sparkSession.sparkContext
    bc = sc.broadcast(frozenset(bench_grams))
    in_cols = [f.name for f in stream.schema.fields]
    out_schema = StructType(
        list(stream.schema.fields) + [StructField("n_removed_tokens", LongType())]
    )

    def _trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grams = bc.value
        for pdf in batches:
            texts, removed = [], []
            for t in pdf[text_col]:
                toks = t.split(split)
                ps = [
                    i
                    for i in range(len(toks) - n + 1)
                    if " ".join(toks[i : i + n]) in grams
                ]
                if not ps:
                    texts.append(t)
                    removed.append(0)
                    continue
                drop = set()
                for p in ps:
                    drop.update(range(p, p + n))
                kept = [tok for i, tok in enumerate(toks) if i not in drop]
                texts.append(split.join(kept))
                removed.append(len(toks) - len(kept))
            pdf = pdf.copy()
            pdf[text_col] = texts
            pdf["n_removed_tokens"] = pd.array(removed, dtype="int64")
            yield pdf[in_cols + ["n_removed_tokens"]]

    return stream.mapInPandas(_trim, out_schema)
