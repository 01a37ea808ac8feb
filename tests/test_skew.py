"""Skew utilities: the salted two-stage aggregation and the replicated-dim
join must be result-identical to their unsalted counterparts (the salt only
changes row routing). Reference context: the hot-conversation-key problem in
SURVEY.md §4.2; the gate twins are ``salted_agg`` / ``salted_join`` in
mrmr_spark/gate.py (oracled against plain GROUP BY / JOIN in DuckDB).

Sums run on decimal so equality is exact regardless of the salted
partial-merge add order.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.skew import salted_agg, salted_broadcast_left


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (~70% of rows) + a tail, the shape salting exists for
    rows = []
    for i in range(700):
        rows.append(("hot", float(i) * 0.37 - 11.0, i))
    for i in range(300):
        rows.append((f"k{i % 29}", float(i) * 1.91 + 3.0, 700 + i))
    pdf = pd.DataFrame(rows, columns=["k", "x", "rid"])
    return spark.createDataFrame(pdf).withColumn(
        "xd", F.col("x").cast("decimal(18,6)")
    ).cache()


def _agg_pdf(df):
    return (
        df.toPandas()
        .astype({"n": "int64", "s": "float64", "mn": "float64", "mx": "float64"})
        .sort_values("k")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("n_salts", [1, 4, 16])
def test_salted_agg_equals_plain_groupby(skewed, n_salts):
    plain = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xd").cast("double").alias("s"),
        F.min("xd").cast("double").alias("mn"),
        F.max("xd").cast("double").alias("mx"),
    )
    salted = salted_agg(
        skewed.select("k", "xd", "rid"),
        "k",
        {
            "n": F.count(F.lit(1)),
            "s": F.sum("xd"),
            "mn": F.min("xd"),
            "mx": F.max("xd"),
        },
        {
            "n": F.sum("n"),
            "s": F.sum("s"),
            "mn": F.min("mn"),
            "mx": F.max("mx"),
        },
        n_salts=n_salts,
    ).select(
        "k",
        "n",
        F.col("s").cast("double").alias("s"),
        F.col("mn").cast("double").alias("mn"),
        F.col("mx").cast("double").alias("mx"),
    )
    pd.testing.assert_frame_equal(_agg_pdf(plain), _agg_pdf(salted))


def test_salted_agg_stage1_fans_out_hot_key(skewed):
    # the point of the salt: stage 1 must split the hot key into >1 partial
    salt = F.pmod(F.xxhash64("k", "xd", "rid"), F.lit(16))
    n_partials = (
        skewed.select("k", "xd", "rid")
        .withColumn("_salt", salt)
        .where(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_partials > 1


def test_salted_broadcast_left_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["hot"] + [f"k{i}" for i in range(29)],
             "label": [f"L{i}" for i in range(30)]}
        )
    )
    large = skewed.select("k", "rid")
    plain = large.join(dim, "k").select("k", "rid", "label")
    salted = salted_broadcast_left(large, dim, "k", n_salts=8).select(
        "k", "rid", "label"
    )
    lp = plain.toPandas().sort_values(["k", "rid"]).reset_index(drop=True)
    ls = salted.toPandas().sort_values(["k", "rid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(lp, ls)
