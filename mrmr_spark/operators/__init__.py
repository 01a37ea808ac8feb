from mrmr_spark.operators.ordering import turn_window, with_row_key  # noqa: F401
from mrmr_spark.operators.lags import with_lags  # noqa: F401
from mrmr_spark.operators.sessionize import sessionize  # noqa: F401
from mrmr_spark.operators.rolling import backfilled_rolling  # noqa: F401
from mrmr_spark.operators.asof import asof_join  # noqa: F401
from mrmr_spark.operators.anchors import (  # noqa: F401
    event_window_anchors,
    first_last_per_group,
    first_per_group,
    periodic_anchors,
    quantile_anchors,
)
