from mrmr_spark.select.api import (  # noqa: F401
    SelectionResult,
    select_cefsplus,
    select_jmi,
    select_mrmr,
)
from mrmr_spark.select.gbdt import (  # noqa: F401
    gbdt_classif,
    gbdt_regression,
    select_gbdt,
)
