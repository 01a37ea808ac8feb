"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``mrmr_spark.gate`` (operator queries + SQL
oracles); the engine itself is the ``mrmr_spark`` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events@sf0.001 -> sessionize/lag/rolling feature matrix ->
    Spark-native mRMR -> ranked selected features."""
    from mrmr_spark.gate import q_mrmr_event_features

    return q_mrmr_event_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mrmr_spark.gate import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mrmr_spark.gate import ORACLE_SQL

    return dict(ORACLE_SQL)
