"""Iceberg session wiring (SURVEY.md A1 'prod' path).

The offline sandbox has no iceberg-spark-runtime jar, so the round-trip
test skips cleanly here and passes where the runtime exists; the conf
builder and URI dispatch are exercised unconditionally.
"""

import glob
import os

import pytest


def _iceberg_jar_present() -> bool:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jars, "*iceberg-spark-runtime*.jar")))


def test_iceberg_session_conf_shape():
    from mrmr_spark.session import iceberg_session_conf

    conf = iceberg_session_conf("lake", "/tmp/wh")
    assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.type"] == "hadoop"
    assert conf["spark.sql.catalog.lake.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
    rest = iceberg_session_conf("prod", "s3://bucket/wh", catalog_type="rest")
    assert rest["spark.sql.catalog.prod.type"] == "rest"


def test_read_transcripts_dispatch(spark, transcripts):
    """Parquet branch reads; the iceberg:// branch resolves through
    spark.table (catalog lookup — fails with an *analysis* error here, not
    an attribute/dispatch error, proving the code path is wired)."""
    from pyspark.errors import AnalysisException

    from mrmr_spark.sources.transcripts import read_transcripts

    path = "/tmp/_ice_dispatch_transcripts.parquet"
    transcripts.limit(50).write.mode("overwrite").parquet(path)
    got = read_transcripts(spark, path)
    assert got.count() == 50
    assert set(got.columns) == set(transcripts.columns)

    with pytest.raises(AnalysisException):
        read_transcripts(spark, "iceberg://nosuch.db.tbl").count()


@pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath (offline sandbox)",
)
def test_iceberg_round_trip(spark, transcripts, tmp_path):
    """Where the runtime jar exists: wire a hadoop catalog onto the live
    session, write the transcript table partitioned by days(ts), read it
    back via read_transcripts — schema and rows must round-trip."""
    from mrmr_spark.session import iceberg_session_conf
    from mrmr_spark.sources.transcripts import read_transcripts

    for k, v in iceberg_session_conf("icetest", str(tmp_path)).items():
        if k != "spark.sql.extensions":  # extensions are start-time-only
            spark.conf.set(k, v)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS icetest.db")
    (
        transcripts.limit(200)
        .writeTo("icetest.db.transcripts")
        .partitionedBy(__import__("pyspark").sql.functions.days("ts"))
        .createOrReplace()
    )
    back = read_transcripts(spark, "iceberg://icetest.db.transcripts")
    assert back.count() == 200
    assert set(back.columns) == set(transcripts.columns)
