from mrmr_spark.functions.ndtri import ndtri  # noqa: F401
