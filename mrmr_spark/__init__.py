"""mrmr_spark — a PySpark-native feature-engineering + mRMR-family selection engine.

Two layers, one repo (SURVEY.md §7):

- ``mrmr_spark.operators`` / ``mrmr_spark.fe``: point-in-time-correct feature
  engineering over transcript-shaped tables ``(conv_id, turn_idx, role, text,
  tool, ts)`` — stable turn ordering, lag/lead, ts-gap sessionization,
  backfilled rolling aggregates, as-of joins, anchor rows — all expressed as
  declarative DataFrame plans (windows, built-in functions), zero per-row
  Python.
- ``mrmr_spark.select``: Spark-native re-derivation of the reference's
  (kmedved/mrmr, package ``sift`` 0.6.0) selection math — F-stat / Gaussian-MI
  relevance, Pearson redundancy as partition-parallel Arrow block reductions
  into a driver-side matrix, greedy mRMR / JMI / JMIM / CEFS+ loops on the
  driver.

Design rule: Spark does scans, shuffles and reductions; the driver does the
tiny sequential greedy state (k × top_m² flops). Every numeric kernel that
leaves the JVM is a vectorized Arrow/pandas kernel (``mapInArrow``), never
row-at-a-time Python.
"""

__version__ = "0.1.0"

import os as _os

# BLAS thread cap BEFORE any numpy-backed module loads: OpenBLAS/MKL read
# these at library initialization, so setting them only inside get_spark is
# too late for driver-side GEMMs (ivf_train, auto-k softmax, Chan merges)
# in processes that imported numpy first. Harmless if already set.
for _var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_var, "1")
del _os, _var

from mrmr_spark.session import get_spark  # noqa: E402,F401
