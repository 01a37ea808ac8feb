from mrmr_spark.fe.pipeline import FEATURE_COLS, build_features  # noqa: F401
