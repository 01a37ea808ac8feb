"""Streaming twin of the flagship batch feature build (``fe.build_features``).

The batch pipeline computes, per (conv_id, turn_idx): session ids, inter-turn
gaps + lags, current-turn text/role features, trailing ROW windows (last 5
turns, excluding current) and a trailing TIME window (last 3600 s, excluding
current), plus the future-only regression target ``target_next_gap``
(``fe/pipeline.py:29-51``). This module computes the SAME vectors
incrementally on a stream with ``applyInPandasWithState``:

- **State per conversation** (compact JSON blob): last event ts, current
  session id + per-session position, the last-5 ring (gap / is_assistant /
  has_tool / text_len), the trailing-1h (ts, gap) buffer, and the previous
  turn's completed feature vector *pending its target*.
- **Emit-on-target-complete**: a turn's ``target_next_gap`` is the gap to
  its NEXT turn, so its training row becomes emittable only when that next
  turn arrives. Each arrival therefore completes and emits its
  predecessor's row. The emitted row set equals the batch matrix filtered
  to ``target_next_gap IS NOT NULL`` — exactly the rows batch training
  consumes (the per-conv final turn stays pending, as it is unlabeled in
  batch too). Verified by micro-batch replay equality in tests.
- **Scale shape**: one hash exchange on conv_id (the same minimum shuffle
  as the batch plan); state is O(turns-in-last-hour) per live conversation;
  ``idle_timeout_s`` (ProcessingTimeTimeout eviction) bounds the set of
  live conversations when conv_id cardinality grows without bound.

In-order delivery per conversation is assumed, like
``streaming_turn_sessionize`` (late turns would need a replay/upsert sink).
"""

from __future__ import annotations

import json
import math
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mrmr_spark.fe.pipeline import FEATURE_COLS

_WS = re.compile(r"\s+")


def _turn_row_features(
    turn_idx: int,
    gap: float | None,
    session_id: int,
    sess_turn: int,
    text: str | None,
    role: str | None,
    tool: str | None,
    gap1: float | None,
    gap2: float | None,
    buf5: list[list[float]],
    tbuf: list[list[float]],
    t_us: int,
    range_us: int,
) -> dict:
    """One turn's feature dict, replicating the batch expressions exactly
    (window aggregates exclude the current row; avg/max ignore null gaps;
    counts count rows)."""
    f: dict[str, float | None] = {}
    f["turn_idx_f"] = float(turn_idx)
    f["gap_s"] = gap
    f["gap_s_lag1"] = gap1
    f["gap_s_lag2"] = gap2
    if text is None:
        f["text_len"] = None
        f["token_count"] = None
    else:
        f["text_len"] = float(len(text))
        f["token_count"] = float(len(_WS.split(text)))
    f["is_user"] = None if role is None else float(role == "user")
    f["is_assistant"] = None if role is None else float(role == "assistant")
    f["is_tool_role"] = None if role is None else float(role == "tool")
    f["has_tool"] = float(tool is not None)
    f["session_idx"] = float(session_id)
    f["sess_turn"] = float(sess_turn)

    # trailing 5 rows, current excluded (buf5 holds [gap, is_assistant,
    # has_tool, text_len] per prior turn; None encoded as NaN)
    gaps = [b[0] for b in buf5 if not math.isnan(b[0])]
    f["n_turns_5"] = float(len(buf5))
    f["avg_gap_5"] = (sum(gaps) / len(gaps)) if gaps else None
    f["max_gap_5"] = max(gaps) if gaps else None
    ia = [b[1] for b in buf5 if not math.isnan(b[1])]  # avg ignores null role
    f["assistant_frac_5"] = (sum(ia) / len(ia)) if ia else None
    f["tool_frac_5"] = (sum(b[2] for b in buf5) / len(buf5)) if buf5 else None
    tls = [b[3] for b in buf5 if not math.isnan(b[3])]
    f["avg_text_len_5"] = (sum(tls) / len(tls)) if tls else None

    # trailing range_s seconds, current excluded: rows with
    # us in [t_us - range_us, t_us - 1] (rangeBetween(-range_us, -1))
    lo = t_us - range_us
    in_win = [b for b in tbuf if lo <= b[0] <= t_us - 1]
    rgaps = [b[1] for b in in_win if not math.isnan(b[1])]
    f["n_turns_3600s"] = float(len(in_win))
    f["avg_gap_3600s"] = (sum(rgaps) / len(rgaps)) if rgaps else None
    return f


def streaming_turn_features(
    stream: DataFrame,
    session_gap_s: float = 1800.0,
    range_s: float = 3600.0,
    group: str = "conv_id",
    order: str = "turn_idx",
    ts_col: str = "ts",
    idle_timeout_s: float | None = None,
) -> DataFrame:
    """Per-turn FEATURE_COLS + target_next_gap on a transcript stream.

    Output schema: (conv_id, turn_idx, ts) + the 20 batch FEATURE_COLS +
    target_next_gap, one row per turn whose target became known this
    micro-batch (see module docstring for the emit-on-complete contract).

    ``idle_timeout_s`` bounds state on unbounded conv_id cardinality: a
    conversation idle (no new turns) for that long has its state evicted
    via ProcessingTimeTimeout. Its final pending turn is dropped unlabeled
    — the same row batch training never consumes. Default None preserves
    exact replay equality with the batch matrix (no eviction).

    With a timeout registered the engine schedules micro-batches even with
    no new data (to fire timers), so pair it with a trigger interval
    (``.trigger(processingTime="1 minute")``) to bound the empty-batch
    rate; ``processAllAvailable()``/``availableNow`` never terminate on a
    timer-bearing query.
    """
    fields = [
        StructField(group, StringType()),
        StructField(order, LongType()),
        StructField(ts_col, TimestampType()),
    ]
    fields += [StructField(c, DoubleType()) for c in FEATURE_COLS]
    fields.append(StructField("target_next_gap", DoubleType()))
    out_schema = StructType(fields)
    state_schema = StructType([StructField("blob", StringType())])
    gap_us = int(round(session_gap_s * 1_000_000))
    range_us = int(round(range_s * 1_000_000))
    out_cols = [group, order, ts_col, *FEATURE_COLS, "target_next_gap"]

    def _nan(v):  # None -> NaN for the JSON-array buffers
        return float("nan") if v is None else float(v)

    timeout_ms = (
        None if idle_timeout_s is None else max(1, int(round(idle_timeout_s * 1000)))
    )

    def tag(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if timeout_ms is not None and state.hasTimedOut:
            state.remove()  # evict the idle conversation (pending stays unlabeled)
            return
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {
                "last_us": None, "sid": -1, "spos": 0,
                "gap1": None, "gap2": None,
                "buf5": [], "tbuf": [], "pending": None,
            }
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts_us = rows[ts_col].astype("datetime64[us]").astype("int64")
        out: list[tuple] = []
        for i in range(len(rows)):
            r = rows.iloc[i]
            t_us = int(ts_us.iloc[i])
            gap = (
                None if st["last_us"] is None
                else (t_us - st["last_us"]) / 1_000_000.0
            )
            if gap is None or gap > session_gap_s:
                st["sid"] += 1
                st["spos"] = 0
            feats = _turn_row_features(
                int(r[order]), gap, st["sid"], st["spos"],
                r["text"] if "text" in rows.columns and pd.notna(r["text"]) else None,
                r["role"] if pd.notna(r["role"]) else None,
                r["tool"] if pd.notna(r["tool"]) else None,
                st["gap1"], st["gap2"], st["buf5"], st["tbuf"], t_us, range_us,
            )
            if st["pending"] is not None:
                pend = st["pending"]
                out.append((
                    key[0], pend["turn_idx"], pend["ts_us"],
                    *[pend["f"].get(c) for c in FEATURE_COLS], gap,
                ))
            st["pending"] = {"turn_idx": int(r[order]), "ts_us": t_us, "f": feats}

            st["gap2"] = st["gap1"]
            st["gap1"] = gap
            st["buf5"].append([
                _nan(gap), _nan(feats["is_assistant"]),
                feats["has_tool"], _nan(feats["text_len"]),
            ])
            st["buf5"] = st["buf5"][-5:]
            st["tbuf"].append([t_us, _nan(gap)])
            st["tbuf"] = [b for b in st["tbuf"] if b[0] >= t_us - range_us]
            st["spos"] += 1
            st["last_us"] = t_us

        state.update((json.dumps(st),))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            pdf = pd.DataFrame(out, columns=out_cols)
            pdf[ts_col] = pd.to_datetime(pdf[ts_col], unit="us")
            pdf[order] = pdf[order].astype("int64")
            yield pdf

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return stream.groupBy(group).applyInPandasWithState(
        tag, out_schema, state_schema, "append", timeout_conf
    )
