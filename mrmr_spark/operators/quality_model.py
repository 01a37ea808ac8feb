"""Learned quality filtering: a Spark ML logistic-regression classifier
over hashed term features (the GPT-3 / PaLM "quality classifier" data
selection step — Brown et al. 2020 Appendix A trains LR on hashed
features of WebText-vs-CommonCrawl and admits documents by a Pareto
draw against the score), re-expressed Spark-first.

The reference engine (kmedved/mrmr) has no text layer; this extends the
`documents`-table curation family. Training uses Spark ML's own
Tokenizer → HashingTF → IDF → LogisticRegression pipeline (idiomatic,
JVM-side, distributed); scoring is one model.transform; the famous
Pareto admission is a PURE Column expression over a seed-free hash
uniform, so it is deterministic, engine-independent, and SQL-oracle-able
(gate row `pareto_sample`).

Scale design (100 TB):

- Training runs on a bounded LABELED set (positives = a curated target
  corpus, negatives = a corpus sample) — small by construction; the
  model is a dense coefficient vector the executors hold once.
- Scoring is one distributed transform: tokenize/hash/dot-product per
  row, zero shuffles, no Python.
- :func:`pareto_quality_sample` is a stateless filter — admission of a
  document depends only on (its id, its score), so it composes with
  streaming frames and re-runs are bit-identical (no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.curation import sample_key

_HASH_SPACE = 2**32


class QualityModel:
    """A fitted quality classifier: wraps the Spark ML PipelineModel and
    exposes `score(df)`. Cite: reference has no counterpart; the shape
    follows Brown et al. 2020 App. A."""

    def __init__(self, pipeline_model, text_col: str):
        self.model = pipeline_model
        self.text_col = text_col

    def score(self, df: DataFrame, score_col: str = "quality_score") -> DataFrame:
        """Append ``score_col`` = P(high quality) in [0, 1]. One
        distributed transform; the probability is extracted JVM-side
        (vector_to_array), no Python UDF."""
        from pyspark.ml.functions import vector_to_array

        out = self.model.transform(df)
        return out.select(
            *df.columns,
            F.element_at(vector_to_array("probability"), 2)
            .cast("double")
            .alias(score_col),
        )


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_features: int = 2**18,
    use_idf: bool = True,
    reg_param: float = 1e-3,
    max_iter: int = 50,
) -> QualityModel:
    """Train the LR quality classifier: positives = the curated target
    corpus (label 1), negatives = a sample of the raw corpus (label 0).

    Both inputs should be BOUNDED (the labeled set, not the 100 TB
    corpus — sample the negatives upstream; LBFGS on n_features dense
    coefficients is driver-cheap, the data passes are distributed).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    pos = positives.select(F.col(text_col), F.lit(1.0).alias("label"))
    neg = negatives.select(F.col(text_col), F.lit(0.0).alias("label"))
    labeled = pos.unionByName(neg)

    stages = [
        Tokenizer(inputCol=text_col, outputCol="_words"),
        HashingTF(inputCol="_words", outputCol="_tf", numFeatures=n_features),
    ]
    feat_col = "_tf"
    if use_idf:
        stages.append(IDF(inputCol="_tf", outputCol="_tfidf"))
        feat_col = "_tfidf"
    stages.append(
        LogisticRegression(
            featuresCol=feat_col,
            labelCol="label",
            regParam=reg_param,
            maxIter=max_iter,
            standardization=False,
        )
    )
    model = Pipeline(stages=stages).fit(labeled)
    return QualityModel(model, text_col)


def pareto_uniform(id_col: str | Column = "doc_id", hash_fn: str = "xxhash64") -> Column:
    """Seed-free per-document uniform in (0, 1] from the id hash — the
    same two families as :func:`sample_key` (`xxhash64` production,
    `affine` for SQL oracles). Never exactly 0 so the Pareto inverse
    CDF below stays finite."""
    # pmod in LONG space (a double cast first would lose low bits: xxhash64
    # values exceed 2^53), then the exact double division by 2^32.
    u = F.pmod(sample_key(id_col, hash_fn), F.lit(_HASH_SPACE)).cast("double")
    return F.greatest(u / float(_HASH_SPACE), F.lit(0.5 / _HASH_SPACE))


def pareto_quality_sample(
    df: DataFrame,
    score_col: str = "quality_score",
    alpha: float = 9.0,
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    mode: str = "drop",
) -> DataFrame:
    """GPT-3's Pareto admission rule, deterministic: keep a document iff

        score > 1 - x_i,   x_i = (1 - u_i)^(-1/alpha) - 1

    where x_i is a Pareto(alpha) draw from the document's seed-free hash
    uniform u_i (Brown et al. 2020 App. A used numpy.random.pareto(9);
    the hash uniform makes the draw reproducible and engine-independent).
    High-score documents are always kept (x >= 0 admits score >= 1);
    low-score documents survive occasionally — the long tail the paper
    wanted for diversity. Admission depends only on (id, score): pure
    filter, no shuffle, streaming-safe.

    ``mode="drop"`` filters; ``mode="flag"`` appends boolean ``kept``
    (plus the draw as ``pareto_x``) for auditing.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"Unknown mode: {mode!r}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    u = pareto_uniform(id_col, hash_fn)
    x = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    keep = F.col(score_col) > (F.lit(1.0) - x)
    if mode == "flag":
        return df.select("*", x.alias("pareto_x"), keep.alias("kept"))
    return df.where(keep)
