import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small/fast


@pytest.fixture(scope="session")
def spark():
    from mrmr_spark.session import get_spark

    s = get_spark(app_name="mrmr_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from mrmr_spark.sources.transcripts import generate_transcripts_pandas

    return generate_transcripts_pandas(n_convs=60, mean_turns=25, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf).cache()


@pytest.fixture(scope="session")
def snapshots(spark):
    from mrmr_spark.sources.transcripts import generate_snapshots_pandas

    return spark.createDataFrame(generate_snapshots_pandas(n_convs=60, seed=43)).cache()
