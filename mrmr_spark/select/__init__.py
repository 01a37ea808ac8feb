from mrmr_spark.select.api import (  # noqa: F401
    SelectionResult,
    select_cefsplus,
    select_jmi,
    select_mrmr,
)
