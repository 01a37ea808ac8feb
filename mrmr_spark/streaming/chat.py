"""Streaming SFT-corpus rendering: the live twin of
``operators.chat.render_conversations``.

A transcript stream accumulates per-conversation turns in
``applyInPandasWithState`` state (a JSON blob — the feature twin's
pattern) and emits ONE rendered training string per conversation when
the conversation completes:

- ``end_role``: a turn whose role equals it is a CONTROL record — it
  closes the conversation immediately and is not rendered (the shape a
  producer with explicit conversation-done events uses);
- ``idle_timeout_s``: a ProcessingTimeTimeout closes conversations the
  marker never reached, bounding live state exactly like the feature
  twin (a timer-bearing query schedules empty micro-batches to fire
  timers — run it with a trigger interval, and don't wait on
  ``processAllAvailable``; see test_streaming.py's eviction note).

Replay equality: streaming output == batch ``render_conversations`` on
the same turns, byte for byte (``render_turns_py`` is the shared Python
renderer, kept next to the Column version and equality-tested). State
per live conversation is its accumulated turns — bounded by
conversation length, cleared on emit.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mrmr_spark.operators.chat import DEFAULT_FOOTER, DEFAULT_HEADER, render_turns_py


def streaming_render_conversations(
    stream: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    header: str = DEFAULT_HEADER,
    footer: str = DEFAULT_FOOTER,
    bos: str = "",
    end_role: str = "end",
    idle_timeout_s: float | None = None,
) -> DataFrame:
    """One output row ``(conv_col, text, n_turns)`` per completed
    conversation; completion = an ``end_role`` control turn, or
    ``idle_timeout_s`` of processing-time silence when set."""
    out_schema = StructType(
        [
            StructField(conv_col, StringType()),
            StructField("text", StringType()),
            StructField("n_turns", LongType()),
        ]
    )
    state_schema = StructType([StructField("turns_json", StringType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_s is not None
        else GroupStateTimeout.NoTimeout
    )

    def _emit(key, turns):
        return pd.DataFrame(
            {
                conv_col: [key],
                "text": [render_turns_py(turns, header, footer, bos)],
                "n_turns": [len(turns)],
            }
        )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            turns = [tuple(t) for t in json.loads(state.get[0])]
            state.remove()
            if turns:
                yield _emit(key[0], turns)
            return
        turns = (
            [tuple(t) for t in json.loads(state.get[0])] if state.exists else []
        )
        done = False
        for pdf in pdfs:
            for o, r, t in zip(pdf[order_col], pdf[role_col], pdf[text_col]):
                if r == end_role:
                    done = True
                    continue
                turns.append((int(o), None if r != r or r is None else str(r),
                              None if t != t or t is None else str(t)))
        if done:
            state.remove()
            if turns:
                yield _emit(key[0], turns)
            return
        state.update((json.dumps(turns),))
        if idle_timeout_s is not None:
            state.setTimeoutDuration(int(idle_timeout_s * 1000))

    return stream.groupBy(conv_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
