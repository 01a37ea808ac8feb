"""Distributed unigram-LM tokenizer (Kudo 2018, "Subword Regularization";
the SentencePiece ``--model_type=unigram`` trainer) — the second subword
family next to the BPE trainer in :mod:`mrmr_spark.operators.tokenizer`.

Scale decomposition (same contract as the BPE family):

1. :func:`word_counts` (shared) — ONE corpus scan to the vocab-bounded
   word-frequency table.
2. :func:`substring_counts` — seed statistics: every substring occurrence
   of every word, weighted by word frequency, as one explode + map-side-
   combined agg over the WORD table (vocab-bounded, never the corpus).
3. :func:`unigram_train` — the EM + prune loop. The E-step is distributed
   (:func:`unigram_em_counts`: per-word forward-backward inside one Arrow
   kernel, expected counts aggregated as DECIMAL(28,12) sums so the
   reduction is bit-reproducible under ANY partitioning — the lm_score
   decimal trick); the M-step and pruning are driver-side over the
   vocab-bounded piece table.
4. :func:`unigram_encode` — Viterbi segmentation of the corpus (memoized
   mapInPandas, each distinct word segmented once per partition).

Deviations from SentencePiece, stated: (a) piece pruning ranks by expected
count (the common reimplementation shortcut) instead of the exact
leave-one-out likelihood delta; (b) no Bayesian (digamma) M-step smoothing;
(c) words are segmented independently (the word-boundary marker is the
split, not a ``▁`` prefix piece). All three keep the distributed shape
identical; swapping the driver-side scoring back to the paper's exact form
touches no Spark code.

Viterbi ties break (max score, then lexicographically smallest
space-joined token string) — a total order the correctness gate reproduces
by full path enumeration in a recursive CTE (``unigram_segment``).
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    StringType,
    StructField,
    StructType,
)

#: log-prob charged per character that no vocabulary piece covers (the unk
#: path): worse than any real piece so it is only used when unavoidable.
UNK_LOGP = -100.0


def substring_counts(
    words: DataFrame,
    max_len: int = 8,
    word_col: str = "word",
    count_col: str = "count",
) -> DataFrame:
    """``(piece, weight)``: every substring occurrence (by position, so
    ``"aa"`` contributes ``"a"`` twice) of every word up to ``max_len``
    chars, weighted by the word's corpus frequency. One explode over the
    vocab-bounded word table + a map-side-combined sum — the distributed
    seed statistic for :func:`unigram_train`."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    w = F.col(word_col)
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_len), F.length(w) - i + 1)
                ),
                lambda l: F.substring(w, i, l),
            ),
        )
    )
    return (
        words.select(F.explode(pieces).alias("piece"), F.col(count_col).alias("_c"))
        .groupBy("piece")
        .agg(F.sum("_c").cast("bigint").alias("weight"))
    )


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _word_lattice(word: str, logp: dict[str, float], max_piece_len: int):
    """Arcs (i, j, piece, lp) of the segmentation lattice, including the
    per-character unk fallback so every word is segmentable."""
    n = len(word)
    arcs = []
    for i in range(n):
        hi = min(n, i + max_piece_len)
        for j in range(i + 1, hi + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is not None:
                arcs.append((i, j, p, lp))
        if word[i : i + 1] not in logp:
            arcs.append((i, i + 1, word[i], UNK_LOGP))
    return arcs


def expected_counts_py(
    word: str, freq: float, logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Forward-backward expected piece counts for one word (the E-step
    body; pure Python so tests and the Arrow kernel share it)."""
    n = len(word)
    arcs = _word_lattice(word, logp, max_piece_len)
    fwd = [[] for _ in range(n + 1)]
    bwd = [[] for _ in range(n + 1)]
    alpha = [-math.inf] * (n + 1)
    beta = [-math.inf] * (n + 1)
    for a in arcs:
        fwd[a[1]].append(a)
        bwd[a[0]].append(a)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        xs = [alpha[i] + lp for (i, _, _, lp) in fwd[j]]
        if xs:
            alpha[j] = _logsumexp(xs)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        xs = [lp + beta[j] for (_, j, _, lp) in bwd[i]]
        if xs:
            beta[i] = _logsumexp(xs)
    total = alpha[n]
    out: dict[str, float] = defaultdict(float)
    if total == -math.inf:
        return out
    for i, j, p, lp in arcs:
        post = math.exp(alpha[i] + lp + beta[j] - total)
        if post > 0:
            out[p] += freq * post
    return out


def viterbi_segment_py(
    word: str, logp: dict[str, float], max_piece_len: int
) -> tuple[list[str], float]:
    """Best segmentation under (max score, then lexicographically smallest
    space-joined token string). DP over positions; the tie-break composes
    because two candidate token strings at the same position can never be
    proper prefixes of each other (they cover the same raw text, so the
    first divergence is a real character difference)."""
    n = len(word)
    best: list[tuple[float, str] | None] = [None] * (n + 1)
    best[0] = (0.0, "")
    for j in range(1, n + 1):
        cand = None
        for i in range(max(0, j - max_piece_len), j):
            if best[i] is None:
                continue
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                if j - i == 1:
                    lp = UNK_LOGP
                else:
                    continue
            s = best[i][0] + lp
            toks = p if best[i][1] == "" else best[i][1] + " " + p
            if (
                cand is None
                or s > cand[0]
                or (s == cand[0] and toks < cand[1])
            ):
                cand = (s, toks)
        best[j] = cand
    assert best[n] is not None  # unk arcs make every word segmentable
    return best[n][1].split(" "), best[n][0]


def unigram_em_counts(
    words: DataFrame,
    model: dict,
    word_col: str = "word",
    count_col: str = "count",
) -> DataFrame:
    """Distributed E-step: ``(piece, expected_count)`` over the word table.
    Per-word forward-backward runs inside ONE Arrow kernel (distinct words
    only, by construction of the word table); the cross-partition reduction
    sums DECIMAL(28,12) — decimal addition is associative, so the result is
    bit-identical under any partitioning (pytest-proven)."""
    logp, max_len = dict(model["logp"]), int(model["max_piece_len"])
    schema = StructType(
        [
            StructField("piece", StringType()),
            StructField("ec", DecimalType(28, 12)),
        ]
    )

    def _estep(batches):
        for pdf in batches:
            # quantize each WORD's contribution to decimal BEFORE summing:
            # per-word values are partition-independent and decimal addition
            # is associative, so the total is bit-identical at any layout
            acc: dict[str, Decimal] = defaultdict(Decimal)
            for w, c in zip(pdf[word_col], pdf[count_col]):
                for p, v in expected_counts_py(w, float(c), logp, max_len).items():
                    acc[p] += Decimal(f"{v:.12f}")
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "ec": list(acc.values())}
            )

    part = words.select(word_col, count_col).mapInPandas(_estep, schema=schema)
    return part.groupBy("piece").agg(F.sum("ec").alias("expected_count"))


def unigram_seed(
    words: DataFrame,
    seed_size: int,
    max_piece_len: int = 8,
    word_col: str = "word",
    count_col: str = "count",
) -> dict:
    """Seed model: ALL single characters (coverage guarantee) + the
    ``seed_size`` highest-weight multi-char substrings (ties by piece asc —
    fully deterministic), probabilities ∝ substring weights."""
    sc = substring_counts(words, max_piece_len, word_col, count_col)
    chars = sc.where(F.length("piece") == 1)
    multi = (
        sc.where(F.length("piece") >= 2)
        .orderBy(F.col("weight").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    rows = chars.unionByName(multi).collect()
    if not rows:
        raise ValueError("unigram_seed: word table is empty")
    total = float(sum(r["weight"] for r in rows))
    logp = {r["piece"]: math.log(r["weight"] / total) for r in rows}
    return {"logp": logp, "max_piece_len": max_piece_len}


def unigram_train(
    words: DataFrame,
    vocab_size: int = 64,
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    shrink: float = 0.75,
    word_col: str = "word",
    count_col: str = "count",
) -> dict:
    """EM + prune training loop. Each round: ``em_iters`` EM sweeps (the
    distributed E-step + the driver M-step), then prune the multi-char
    pieces to ``shrink`` of their count (never below what ``vocab_size``
    needs), ranked by expected count (deviation (a) above); single chars
    are never pruned (coverage). Stops when the vocab is at
    ``vocab_size`` (or chars alone exceed it). Returns the model dict
    ``{"logp": {piece: float}, "max_piece_len": int}``.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not (0.0 < shrink < 1.0):
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if seed_size is None:
        seed_size = 4 * vocab_size
    model = unigram_seed(words, seed_size, max_piece_len, word_col, count_col)
    # coverage set: single chars are structural — they survive every M-step
    # and every prune even when the posterior mass concentrates on big
    # pieces and their expected counts underflow to zero (SentencePiece's
    # required_chars rule)
    cover = {p for p in model["logp"] if len(p) == 1}

    def _em(model: dict) -> dict[str, float]:
        rows = unigram_em_counts(words, model, word_col, count_col).collect()
        # driver-side ordering is fixed regardless of collect order
        ec = {r["piece"]: float(r["expected_count"]) for r in rows}
        total = sum(v for v in ec.values())
        floor = total * 1e-9
        for c in cover:
            ec[c] = max(ec.get(c, 0.0), floor)
        total = sum(v for v in ec.values())
        return {
            p: math.log(ec[p] / total)
            for p in sorted(ec)
            if ec.get(p, 0.0) > 0.0
        }

    while True:
        ec_logp = None
        for _ in range(em_iters):
            ec_logp = _em(model)
            model = {"logp": ec_logp, "max_piece_len": max_piece_len}
        chars = {p for p in model["logp"] if len(p) == 1}
        multi = [p for p in model["logp"] if len(p) >= 2]
        if len(chars) + len(multi) <= vocab_size or not multi:
            break
        keep_n = max(int(len(multi) * shrink), vocab_size - len(chars), 0)
        if keep_n >= len(multi):
            keep_n = max(vocab_size - len(chars), 0)
        # rank by expected count = logp here (same total), ties piece asc
        ranked = sorted(multi, key=lambda p: (-model["logp"][p], p))
        kept = set(ranked[:keep_n]) | chars
        pruned = {p: lp for p, lp in model["logp"].items() if p in kept}
        # renormalize over the survivors
        tot = _logsumexp(list(pruned.values()))
        model = {
            "logp": {p: lp - tot for p, lp in pruned.items()},
            "max_piece_len": max_piece_len,
        }
        if len(pruned) <= vocab_size:
            break
    return model


def unigram_encode(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    split: str = " ",
    with_score: bool = False,
) -> DataFrame:
    """Viterbi-segment the corpus under a trained model: ``out_col`` is the
    document's token sequence (words segmented independently, concatenated
    in document order). ``with_score=True`` adds ``{out_col}_score`` — the
    summed Viterbi log-prob (prefix-sum order, left to right — the order
    the gate oracle reproduces). Memoized mapInPandas: each distinct word
    is segmented once per partition."""
    import re

    from pyspark.sql.types import ArrayType, DoubleType

    logp, max_len = dict(model["logp"]), int(model["max_piece_len"])
    splitter = re.compile(split)
    fields = list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    if with_score:
        fields.append(StructField(f"{out_col}_score", DoubleType()))
    schema = StructType(fields)

    def _encode(batches):
        cache: dict[str, tuple[list[str], float]] = {}
        for pdf in batches:
            toks_col, score_col = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                score = 0.0
                if text is not None and text == text:
                    for w in splitter.split(text):
                        if not w:
                            continue
                        hit = cache.get(w)
                        if hit is None:
                            hit = viterbi_segment_py(w, logp, max_len)
                            cache[w] = hit
                        toks.extend(hit[0])
                        score += hit[1]
                toks_col.append(toks)
                score_col.append(score)
            out = pdf.copy()
            out[out_col] = pd.Series(toks_col, index=pdf.index, dtype=object)
            if with_score:
                out[f"{out_col}_score"] = pd.Series(score_col, index=pdf.index)
            yield out

    return df.mapInPandas(_encode, schema=schema)


def unigram_token_count(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "n_unigram_tokens",
    **kwargs,
) -> DataFrame:
    """Exact unigram-vocabulary token count per document."""
    tmp = f"__{out_col}_toks"
    enc = unigram_encode(df, model, text_col, out_col=tmp, **kwargs)
    return enc.withColumn(out_col, F.size(F.col(tmp)).cast("bigint")).drop(tmp)
