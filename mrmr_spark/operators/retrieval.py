"""Lexical retrieval over the documents table: BM25 scoring and top-k
keyword search on an inverted-index shape.

Complements the embedding-side search family (`operators/similarity.py`
— brute-force cosine, hyperplane LSH, IVF-Flat) with the classic sparse
path: Robertson/Spärck Jones BM25 exactly as Lucene ships it
(``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``, non-negative), the
standard tool for corpus exploration, eval-set retrieval, and hard-
negative mining over a training corpus. The reference engine
(kmedved/mrmr) has no retrieval layer, so this has no reference
counterpart; it extends the `documents`-table curation family.

Scale design (100 TB):

- The corpus text is tokenized in ONE pass and NEVER used as a shuffle
  key. Exploded term rows are filtered against the (broadcast) distinct
  query-term set BEFORE any aggregation, so every shuffle in the plan is
  proportional to *postings of the query terms*, not to the corpus:
  corpus-side work per stage is scan → explode → broadcast-hash semi
  filter, all map-side.
- Document frequency per query term and the per-(query, doc) score sum
  are the only aggregations — both run over the filtered posting rows
  with map-side partial combine.
- Corpus statistics (N, avgdl) are one column-pruned aggregate (the
  scan reads only the text column) cross-joined back as a broadcast
  1-row frame — nothing is collected to the driver, so the whole plan
  stays lazy and composable.
- Top-k per query is a rank-filtered window; Spark ≥ 3.5 rewrites
  ``row_number() <= k`` into WindowGroupLimit, which truncates each
  partial partition to k rows BEFORE the exchange — the per-query
  candidate lists never materialize on one task.
- Determinism: per-term score contributions are cast to
  ``DECIMAL(28, 12)`` before summing (exact, association-free — the
  same convention as `ngram_lm_score` / DSIR), so results are
  bit-identical across partitionings and re-runs; rank ties break on
  ascending doc id.

The per-term math is plain double arithmetic + one ``ln`` — the gate
row ``bm25_topk`` replays it in DuckDB on the same parquet and
hash-matches end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tokens(col: str | Column, split: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, split), lambda t: t != F.lit(""))


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    qid_col: str = "q_id",
    split: str = " ",
) -> DataFrame:
    """BM25 score for every (query, document) pair that shares at least
    one term: ``(q_id, doc_id, score)``.

    ``queries`` is ``(q_id, query)`` and is assumed small (it is
    broadcast twice: once as the distinct term set that gates the
    corpus-side explode, once as the (q_id, term) map joined onto the
    filtered postings). Query terms are de-duplicated within a query —
    the Lucene convention: each unique term contributes once, weighted
    by its *document* frequency statistics, not its count in the query.

    Scoring (Lucene's BM25Similarity):
    ``score(q, d) = Σ_t∈q  ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
    · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))``.

    Documents matching no query term are absent from the output (their
    score is 0 by definition); a query whose terms appear nowhere in
    the corpus returns no rows.
    """
    toks = docs.select(F.col(id_col), _tokens(text_col, split).alias("_ts"))

    # N and avgdl: one column-pruned aggregate, broadcast back as 1 row.
    # Integer token-count sum is exact, so avgdl is the same double in
    # any engine (sum::double / count).
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (
            F.sum(F.size("_ts")).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("_avgdl"),
    )

    qt = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(_tokens(query_col, split))).alias("term"),
    )
    terms = qt.select("term").distinct()

    # Corpus side: explode, then broadcast-filter to query terms BEFORE
    # any shuffle — posting rows past this point ∝ query-term matches.
    # Persisted: matched feeds BOTH the per-term df broadcast build and the
    # final scoring stream, and without the pin each consumer re-runs the
    # full corpus tokenize+explode+filter+agg (a broadcast build and a
    # stream never share an exchange). The pinned frame is bounded by
    # query-term matches, not the corpus — the operator's own scale
    # contract (winnow/duplicate_spans pin precedent; stays cached until
    # session drop, like theirs).
    matched = (
        toks.select(
            F.col(id_col),
            F.size("_ts").alias("_dl"),
            F.explode("_ts").alias("term"),
        )
        .join(F.broadcast(terms), "term")
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    ).persist()

    # df per query term, computed from the filtered postings (exact: the
    # filter is by term, df is per term). One small agg; broadcast back.
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))

    k1_l, b_l = F.lit(float(k1)), F.lit(float(b))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tf = F.col("_tf").cast("double")
    tfn = (tf * (k1_l + F.lit(1.0))) / (
        tf + k1_l * (F.lit(1.0) - b_l + b_l * F.col("_dl").cast("double") / F.col("_avgdl"))
    )
    contrib = (idf * tfn).cast("decimal(28,12)")

    return (
        matched.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qt), "term")
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(contrib).cast("double"), 6).alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    qid_col: str = "q_id",
    split: str = " ",
) -> DataFrame:
    """Top-k BM25 search: ``(q_id, doc_id, rank, score)``, rank 1 = best,
    ties broken by ascending document id (deterministic).

    The ``row_number() <= k`` filter is the WindowGroupLimit shape:
    each task truncates its partial per-query groups to k rows before
    the exchange, so a query matching half the corpus still moves only
    O(k · tasks) rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = bm25_scores(
        docs, queries, k1=k1, b=b, text_col=text_col, id_col=id_col,
        query_col=query_col, qid_col=qid_col, split=split,
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "rank", "score")
    )


def bm25_build_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    split: str = " ",
) -> tuple[DataFrame, DataFrame]:
    """Materialize the inverted-index shape ONCE for reuse across many
    query batches — the production retrieval pattern (building postings
    per query batch, as :func:`bm25_scores` does, is right for one-off
    searches; an index amortizes the corpus scan). Returns
    ``(postings, stats)``:

    - ``postings``: one row per (doc, term) — ``(term, <id>, _dl, _tf,
      _df)``, document length and the term's corpus document frequency
      denormalized in so query time needs NO corpus-side aggregation at
      all;
    - ``stats``: one row — ``(_n_docs, _avgdl)``.

    Persist with ``postings.sortWithinPartitions("term").write.parquet``
    (or bucketBy("term") into a table on a real cluster): a term-sorted
    layout gives every row group tight term min/max stats, so the
    query-time literal ``term IN (...)`` predicate prunes row groups —
    the scan reads ~postings-of-the-query-terms, which is exactly the
    inverted-index access pattern.
    """
    toks = docs.select(F.col(id_col), _tokens(text_col, split).alias("_ts"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (
            F.sum(F.size("_ts")).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("_avgdl"),
    )
    tf = (
        toks.select(
            F.col(id_col), F.size("_ts").alias("_dl"), F.explode("_ts").alias("term")
        )
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    postings = tf.join(dfs, "term").select("term", id_col, "_dl", "_tf", "_df")
    return postings, stats


def bm25_topk_indexed(
    postings: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_col: str = "query",
    qid_col: str = "q_id",
    split: str = " ",
) -> DataFrame:
    """Top-k BM25 over a prebuilt index — bit-identical results to
    :func:`bm25_topk` (same formula, same DECIMAL(28,12) summation,
    same tiebreak), but the only corpus-sized work is ONE scan of the
    postings frame filtered by a LITERAL ``term IN (...)`` predicate:
    the distinct query terms are collected (bounded by the query batch,
    the one intentional driver action) and compiled into the filter, so
    Catalyst pushes it into the parquet scan and a term-sorted index
    skips every non-matching row group. No aggregation over the corpus
    happens at query time — tf, df, dl are all read off the index.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qt = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(_tokens(query_col, split))).alias("term"),
    )
    terms = [r.term for r in qt.select("term").distinct().collect()]
    if not terms:
        empty = f"{qid_col} long, {id_col} long, rank int, score double"
        return postings.sparkSession.createDataFrame([], empty)

    k1_l, b_l = F.lit(float(k1)), F.lit(float(b))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tf = F.col("_tf").cast("double")
    tfn = (tf * (k1_l + F.lit(1.0))) / (
        tf + k1_l * (F.lit(1.0) - b_l + b_l * F.col("_dl").cast("double") / F.col("_avgdl"))
    )
    contrib = (idf * tfn).cast("decimal(28,12)")

    scored = (
        postings.where(F.col("term").isin(terms))
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qt), "term")
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(contrib).cast("double"), 6).alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "rank", "score")
    )


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 60,
    weights: list[float] | None = None,
    topk: int | None = None,
    qid_col: str = "q_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of several
    ranked runs into one hybrid ranking: ``rrf = sum_r w_r / (k + rank_r)``
    over the runs each document appears in, the standard way to combine
    the sparse path (:func:`bm25_topk`) with the dense path (cosine
    kNN / ANN from `operators/similarity.py`) without score calibration
    — only ranks are consumed, so the runs' score scales never meet.

    Each ``runs[i]`` needs ``(qid_col, id_col, rank_col)`` with rank 1 =
    best (exactly the shape every retrieval/top-k operator here emits).
    Returns ``(qid_col, id_col, rrf_score, rank)``; fused rank ties break
    on ascending id. ``k`` is the published dampening constant (60 in the
    paper and in Elasticsearch/Vespa's implementations).

    Scale shape: every input run is already top-k-bounded (O(#queries *
    k_run) rows), so the union + one map-side-combined groupBy + the
    per-query window all move candidate rows only — the corpus is never
    touched. Per-run contributions are computed in double (deterministic
    per row) and summed as DECIMAL(28,12), so the fused scores — and
    therefore the ranking — are bit-identical across partitionings and
    run order; the reference engine has no retrieval layer, so this has
    no reference counterpart (extends the documents-table family).
    """
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if weights is not None and len(weights) != len(runs):
        raise ValueError(
            f"weights length {len(weights)} != number of runs {len(runs)}"
        )
    if topk is not None and topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    fused = None
    for i, r in enumerate(runs):
        wt = 1.0 if weights is None else float(weights[i])
        c = r.select(
            F.col(qid_col),
            F.col(id_col),
            (
                F.lit(wt) / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            ).cast("decimal(28,12)").alias("_c"),
        )
        fused = c if fused is None else fused.unionByName(c)
    scored = fused.groupBy(qid_col, id_col).agg(F.sum("_c").alias("_s"))
    w = Window.partitionBy(qid_col).orderBy(F.col("_s").desc(), F.col(id_col).asc())
    out = scored.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.where(F.col("rank") <= topk)
    return out.select(
        qid_col,
        id_col,
        F.round(F.col("_s").cast("double"), 6).alias("rrf_score"),
        "rank",
    )
