"""Exact quantile binning + code collection for the binned JMI path
(SURVEY.md E1-E3).

The reference bins with ``np.percentile`` (linear interpolation) and
``np.digitize`` over the interior edges (joint_mi.py:424-432). Spark's exact
``percentile`` aggregate uses the same (n−1)·q linear-interpolation
definition, so edges match to f64 rounding; ``percentile_approx`` is NOT
used anywhere (not parity-safe, SURVEY.md §7 hard-point 2).

Flow: one aggregate computes the 11-point percentile ladder for every
column simultaneously; codes are assigned in a vectorized Arrow kernel
(np.digitize); the resulting int16 code matrix is collected for the
driver-side greedy loop (rows bounded by the subsample budget — the
reference's own scale answer).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentile_edges(
    df: DataFrame,
    cols: list[str],
    n_bins: int = 10,
) -> dict[str, np.ndarray]:
    """Exact percentile ladders (n_bins+1 points incl. min/max) per column,
    all in ONE aggregation pass."""
    qs = [i / n_bins for i in range(n_bins + 1)]
    aggs = [
        F.expr(
            f"percentile(`{c}`, array({','.join(str(q) for q in qs)}))"
        ).alias(c)
        for c in cols
    ]
    row = df.select(*aggs).collect()[0]
    return {c: np.asarray(row[c], dtype=np.float64) for c in cols}


def collect_bin_codes(
    df: DataFrame,
    cols: list[str],
    edges: dict[str, np.ndarray],
    stds: np.ndarray,
    extra_cols: list[str] | None = None,
) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Assign codes = np.digitize(x, interior_edges) per column in an Arrow
    kernel and collect the compact (n, p) int16 matrix (plus any extra
    columns verbatim, e.g. y / weights). Constant columns (std < 1e-12) get
    all-zero codes (joint_mi.py:426-427)."""
    extra_cols = extra_cols or []
    interior = {c: edges[c][1:-1] for c in cols}
    const = {c: bool(stds[i] < 1e-12) for i, c in enumerate(cols)}

    out_fields = [(f"b_{c}", pa.int16()) for c in cols] + [
        (e, pa.float64()) for e in extra_cols
    ]
    out_schema = pa.schema(out_fields)
    spark_schema = ", ".join(
        [f"`b_{c}` smallint" for c in cols] + [f"`{e}` double" for e in extra_cols]
    )

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if not b.num_rows:
                continue
            arrays = []
            for c in cols:
                x = np.asarray(
                    b.column(b.schema.get_field_index(c)).to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                )
                if const[c]:
                    codes = np.zeros(len(x), dtype=np.int16)
                else:
                    codes = np.digitize(x, interior[c]).astype(np.int16)
                arrays.append(pa.array(codes, type=pa.int16()))
            for e in extra_cols:
                arrays.append(
                    pa.array(
                        np.asarray(
                            b.column(b.schema.get_field_index(e)).to_numpy(zero_copy_only=False),
                            dtype=np.float64,
                        )
                    )
                )
            yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    coded = df.mapInArrow(mapper, spark_schema)
    pdf = coded.toPandas()
    codes = pdf[[f"b_{c}" for c in cols]].to_numpy(dtype=np.int16)
    extras = {e: pdf[e].to_numpy(dtype=np.float64) for e in extra_cols}
    return codes, extras
