from mrmr_spark.streaming.sessions import streaming_sessionize  # noqa: F401
