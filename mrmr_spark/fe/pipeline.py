"""Transcript -> wide per-(conv_id, ts) feature matrix (the flagship build).

Composes the A-layer operators into one declarative plan:

  sessionize -> lag/lead -> backfilled rolling (rows + time-range) ->
  current-turn text/role features -> regression target (next-turn latency)

Physical shape: every window shares the conv_id partitioning, so the entire
feature build is ONE hash exchange on conv_id followed by in-partition sorts
— at 10^12 turns that is the minimum possible shuffle for per-conversation
features. No Python runs anywhere in this plan (checked by tests asserting
no BatchEvalPython / ArrowEvalPython node in the physical plan).

Leakage contract: features at (conv_id, ts) read only turns with
turn_idx' < turn_idx (rolling/lag) or the current turn's own content; the
target reads the future (lead) and is excluded from the feature list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.lags import with_lags
from mrmr_spark.operators.rolling import backfilled_rolling
from mrmr_spark.operators.sessionize import sessionize

#: Feature columns produced by build_features (targets and keys excluded).
FEATURE_COLS = [
    "turn_idx_f",
    "gap_s",
    "gap_s_lag1",
    "gap_s_lag2",
    "text_len",
    "token_count",
    "is_user",
    "is_assistant",
    "is_tool_role",
    "has_tool",
    "session_idx",
    "sess_turn",
    "n_turns_5",
    "avg_gap_5",
    "max_gap_5",
    "assistant_frac_5",
    "tool_frac_5",
    "avg_text_len_5",
    "n_turns_3600s",
    "avg_gap_3600s",
]


#: extra columns produced by build_features(rich=True) — wider trailing
#: windows and deeper lags; all row-windows share the single conv sort.
RICH_EXTRA_COLS = [
    "gap_s_lag3",
    "gap_s_lag5",
    "text_len_lag1",
    "token_count_lag1",
    "n_turns_20",
    "avg_gap_20",
    "max_gap_20",
    "min_gap_20",
    "std_gap_20",
    "assistant_frac_20",
    "tool_frac_20",
    "avg_text_len_20",
    "std_text_len_20",
    "n_turns_60",
    "avg_gap_60",
    "avg_text_len_60",
    "tool_frac_60",
    "n_turns_600s",
    "avg_gap_600s",
    "sum_text_len_600s",
]


def build_features(
    transcripts: DataFrame,
    session_gap_s: float = 1800.0,
    n_rows: int = 5,
    range_s: float = 3600.0,
    rich: bool = False,
) -> DataFrame:
    """Return (conv_id, turn_idx, ts) + FEATURE_COLS (+ RICH_EXTRA_COLS when
    ``rich``) + target_next_gap."""
    # Project the per-turn scalar features BEFORE the first window: the
    # conv_id exchange otherwise carries the raw text/role/tool strings
    # (hundreds of bytes/row) only for a projection ABOVE the shuffle to
    # reduce them to six doubles — plan-verified that Catalyst does not
    # hoist this on its own (the Exchange sat directly on the FileScan).
    # Shuffle fewer bytes, guide §2.3; per-row expressions are unchanged,
    # so every feature value is bit-identical.
    df = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").cast("double").alias("text_len"),
        F.size(F.split(F.col("text"), r"\s+")).cast("double").alias("token_count"),
        (F.col("role") == "user").cast("double").alias("is_user"),
        (F.col("role") == "assistant").cast("double").alias("is_assistant"),
        (F.col("role") == "tool").cast("double").alias("is_tool_role"),
        F.col("tool").isNotNull().cast("double").alias("has_tool"),
    )
    df = sessionize(df, gap_s=session_gap_s)

    df = with_lags(df, {"gap_s": [1, 2]})

    # keep every (conv_id, turn_idx)-ordered window ADJACENT: Catalyst only
    # collapses sorts of consecutive same-spec Window operators, so the
    # differently-keyed wsess window goes after the rows-based rolling —
    # one physical sort serves sessionize + lags + rolling-n
    df = backfilled_rolling(
        df,
        {
            "n_turns": F.count(F.lit(1)),
            "avg_gap": F.avg("gap_s"),
            "max_gap": F.max("gap_s"),
            "assistant_frac": F.avg("is_assistant"),
            "tool_frac": F.avg("has_tool"),
            "avg_text_len": F.avg("text_len"),
        },
        n=n_rows,
    )

    feature_cols = list(FEATURE_COLS)
    if rich:
        # rich ROW-ordered windows stay in the same (conv, turn_idx) block
        df = with_lags(df, {"gap_s": [3, 5], "text_len": [1], "token_count": [1]})
        df = backfilled_rolling(
            df,
            {
                "n_turns": F.count(F.lit(1)),
                "avg_gap": F.avg("gap_s"),
                "max_gap": F.max("gap_s"),
                "min_gap": F.min("gap_s"),
                "std_gap": F.stddev_pop("gap_s"),
                "assistant_frac": F.avg("is_assistant"),
                "tool_frac": F.avg("has_tool"),
                "avg_text_len": F.avg("text_len"),
                "std_text_len": F.stddev_pop("text_len"),
            },
            n=20,
        )
        df = backfilled_rolling(
            df,
            {
                "n_turns": F.count(F.lit(1)),
                "avg_gap": F.avg("gap_s"),
                "avg_text_len": F.avg("text_len"),
                "tool_frac": F.avg("has_tool"),
            },
            n=60,
        )
        feature_cols = feature_cols + RICH_EXTRA_COLS

    # target: time until the NEXT turn (regression) — future-only, never a
    # feature. Computed inside the (conv, turn_idx) block so its window
    # shares the block's single physical sort.
    df = with_lags(df, {"gap_s": [-1]})
    df = df.withColumn("target_next_gap", F.col("gap_s_lead1"))

    # per-session turn index (0-based) — window over (conv, session).
    # NOTE (r06, measured): deriving this inside the (conv, turn) sort
    # block (row_number minus a running last() of the session-start
    # row_number) removes this sort but chains THREE dependent WindowExec
    # passes — +2.7 s on the 10.8M-row bench vs ~1 s for sorting the
    # already-clustered data. The plain sort wins; keep it.
    from pyspark.sql.window import Window

    wsess = Window.partitionBy("conv_id", "session_id").orderBy("turn_idx")
    df = df.withColumn("sess_turn", (F.row_number().over(wsess) - 1).cast("double"))

    # RANGE (event-time) windows last: they sort by the µs key instead.
    # In rich mode the first call keeps the materialized µs key so the second
    # range window orders by the SAME attribute — one physical sort serves
    # both (the frames differ, the sort spec doesn't).
    df = backfilled_rolling(
        df,
        {
            "n_turns": F.count(F.lit(1)),
            "avg_gap": F.avg("gap_s"),
        },
        range_s=range_s,
        keep_key=rich,
    )
    if rich:
        df = backfilled_rolling(
            df,
            {
                "n_turns": F.count(F.lit(1)),
                "avg_gap": F.avg("gap_s"),
                "sum_text_len": F.sum("text_len"),
            },
            range_s=600.0,
        )

    df = (
        df.withColumn("turn_idx_f", F.col("turn_idx").cast("double"))
        .withColumn("session_idx", F.col("session_id").cast("double"))
    )

    keep = ["conv_id", "turn_idx", "ts"]
    return df.select(
        *keep,
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col("target_next_gap").cast("double").alias("target_next_gap"),
    )
