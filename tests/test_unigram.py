"""Unigram-LM tokenizer (Kudo 2018): forward-backward E-step vs a
brute-force segmentation-enumeration oracle, Viterbi vs exhaustive best
path, the distributed decimal E-step's partitioning invariance, and the
EM+prune trainer recovering planted morphemes."""

import itertools
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.tokenizer import word_counts
from mrmr_spark.operators.unigram import (
    UNK_LOGP,
    expected_counts_py,
    substring_counts,
    unigram_em_counts,
    unigram_encode,
    unigram_seed,
    unigram_token_count,
    unigram_train,
    viterbi_segment_py,
)


def _all_segmentations(word, vocab, max_len):
    """Every way to tile `word` with vocab pieces (or single-char unk)."""
    if word == "":
        yield []
        return
    for l in range(1, min(len(word), max_len) + 1):
        head = word[:l]
        if head in vocab or l == 1:
            for rest in _all_segmentations(word[l:], vocab, max_len):
                yield [head] + rest


def _lp(piece, logp):
    return logp.get(piece, UNK_LOGP if len(piece) == 1 else None)


def test_expected_counts_match_enumeration():
    logp = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
            "ba": math.log(0.15), "aba": math.log(0.1)}
    for word in ["ab", "aba", "abab", "bbaa", "ababa"]:
        segs = list(_all_segmentations(word, logp, 3))
        probs = [math.exp(sum(_lp(p, logp) for p in s)) for s in segs]
        z = sum(probs)
        exp = {}
        for s, pr in zip(segs, probs):
            for p in s:
                exp[p] = exp.get(p, 0.0) + pr / z
        got = expected_counts_py(word, 1.0, logp, 3)
        assert set(got) == set(exp)
        for p in exp:
            assert got[p] == pytest.approx(exp[p], rel=1e-12), (word, p)


def test_expected_counts_weighting():
    logp = {"a": math.log(0.5), "aa": math.log(0.5)}
    one = expected_counts_py("aaa", 1.0, logp, 2)
    five = expected_counts_py("aaa", 5.0, logp, 2)
    for p in one:
        assert five[p] == pytest.approx(5 * one[p], rel=1e-12)


def test_viterbi_matches_exhaustive_best():
    logp = {"a": math.log(0.25), "b": math.log(0.2), "ab": math.log(0.3),
            "bb": math.log(0.15), "abb": math.log(0.1)}
    for word in ["abba", "abbb", "aabb", "babab", "abbabb"]:
        segs = list(_all_segmentations(word, logp, 3))
        scored = [
            (sum(_lp(p, logp) for p in s), " ".join(s)) for s in segs
        ]
        best = min(scored, key=lambda t: (-t[0], t[1]))
        toks, score = viterbi_segment_py(word, logp, 3)
        assert " ".join(toks) == best[1], word
        assert score == pytest.approx(best[0], abs=1e-12)


def test_viterbi_tie_breaks_lexicographically():
    # "ab" via {a,b} or {ab} with EXACTLY equal scores -> "a b" < "ab"
    logp = {"a": math.log(0.25), "b": math.log(0.25),
            "ab": math.log(0.25) + math.log(0.25)}
    toks, _ = viterbi_segment_py("ab", logp, 2)
    assert toks == ["a", "b"]


def test_viterbi_unk_fallback():
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    toks, score = viterbi_segment_py("axb", logp, 2)
    assert toks == ["a", "x", "b"]
    assert score == pytest.approx(math.log(0.5) * 2 + UNK_LOGP)


@pytest.fixture(scope="module")
def morpheme_corpus(spark):
    """Words built from 4 morphemes: the trainer should recover them."""
    morphs = ["walk", "jump", "ing", "ed"]
    words = [a + b for a in morphs[:2] for b in morphs[2:]] + morphs[:2]
    texts = []
    for i in range(120):
        texts.append(" ".join(words[(i + j) % len(words)] for j in range(8)))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    return df.cache()


def test_em_counts_distributed_match_python_and_partitioning(morpheme_corpus):
    wc = word_counts(morpheme_corpus)
    model = unigram_seed(wc, seed_size=30, max_piece_len=6)
    got = {
        r["piece"]: float(r["expected_count"])
        for r in unigram_em_counts(wc, model).collect()
    }
    exp = {}
    for r in wc.collect():
        for p, v in expected_counts_py(
            r["word"], float(r["count"]), model["logp"], 6
        ).items():
            exp[p] = exp.get(p, 0.0) + v
    assert set(got) == {p for p, v in exp.items() if v > 0}
    for p in got:
        # the kernel quantizes each partition's contribution to 1e-12
        assert got[p] == pytest.approx(exp[p], abs=1e-9), p
    # decimal sums: bit-identical under any partitioning
    got2 = {
        r["piece"]: float(r["expected_count"])
        for r in unigram_em_counts(wc.repartition(7), model).collect()
    }
    assert got == got2


def test_train_recovers_morphemes(morpheme_corpus):
    wc = word_counts(morpheme_corpus)
    n_chars = wc.select(F.explode(F.split("word", "")).alias("c")).where(
        F.col("c") != ""
    ).distinct().count()
    model = unigram_train(wc, vocab_size=n_chars + 6, max_piece_len=6)
    multi = {p for p in model["logp"] if len(p) >= 2}
    assert {"walk", "jump", "ing", "ed"} <= multi, sorted(multi)
    assert len(model["logp"]) <= n_chars + 6
    # all corpus chars kept (coverage)
    chars = {p for p in model["logp"] if len(p) == 1}
    assert len(chars) == n_chars


def test_encode_roundtrip_and_score(morpheme_corpus):
    wc = word_counts(morpheme_corpus)
    model = unigram_train(wc, vocab_size=20, max_piece_len=6)
    enc = unigram_encode(morpheme_corpus, model, with_score=True)
    pdf = enc.toPandas()
    for _, row in pdf.iterrows():
        assert "".join(row["unigram_tokens"]) == row["text"].replace(" ", "")
        s = sum(model["logp"].get(t, UNK_LOGP) for t in row["unigram_tokens"])
        assert row["unigram_tokens_score"] == pytest.approx(s, abs=1e-9)
    # token count agrees
    cnt = unigram_token_count(morpheme_corpus, model).toPandas()
    m = pdf.merge(cnt[["doc_id", "n_unigram_tokens"]], on="doc_id")
    assert (m["unigram_tokens"].map(len) == m["n_unigram_tokens"]).all()


def test_encode_null_and_empty(spark):
    model = {"logp": {"a": -1.0}, "max_piece_len": 2}
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a a", None, ""]})
    )
    got = unigram_encode(df, model).toPandas().set_index("doc_id")
    assert list(got.loc[0, "unigram_tokens"]) == ["a", "a"]
    assert list(got.loc[1, "unigram_tokens"]) == []
    assert list(got.loc[2, "unigram_tokens"]) == []


def test_substring_counts_positional_multiplicity(spark):
    df = spark.createDataFrame(pd.DataFrame({"word": ["aa"], "count": [3]}))
    got = {
        r["piece"]: r["weight"] for r in substring_counts(df, max_len=2).collect()
    }
    assert got == {"a": 6, "aa": 3}  # "a" occurs at two positions


def test_validation(morpheme_corpus):
    wc = word_counts(morpheme_corpus)
    with pytest.raises(ValueError, match="max_len"):
        substring_counts(wc, max_len=0)
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train(wc, vocab_size=0)
    with pytest.raises(ValueError, match="shrink"):
        unigram_train(wc, shrink=1.5)
    with pytest.raises(ValueError, match="empty"):
        unigram_seed(wc.where(F.lit(False)), seed_size=5)
