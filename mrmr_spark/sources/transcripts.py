"""Deterministic synthetic transcript corpus + table loaders.

The driver contract (``BASELINE.json`` input_hint) fixes the input shape:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

This module synthesizes that table deterministically (seeded, vectorized
NumPy — no Python loops over rows) at any scale, with:

- **Zipf-skewed conversation sizes** — the top conversation holds a few
  percent of all turns, so salting/AQE skew handling is actually exercised;
- **per-turn text that is a pure function of (conv_id, turn_idx)** — the
  "per-turn text equality under stable (conv_id, turn_idx) ordering"
  invariant can be re-checked at any time from the ids alone;
- **strictly increasing ts within a conversation** with heavy-tailed
  inter-turn gaps so some gaps exceed any reasonable sessionization
  threshold (FIXTURES.md F1).

In production the same schema lives in an Iceberg table partitioned by
``days(ts)`` + ``bucket(conv_id, N)``; here parquet stands in (same
DataFrame code path, SURVEY.md §2.A A1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "exec", "browse", "fetch"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark shuffle partition window "
    "agg join filter scan feature target select rank gauss copula greedy "
    "session turn role tool latency token batch arrow kernel driver executor".split()
)

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def _mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cheap deterministic 64-bit mix of two int arrays (splitmix-style)."""
    h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    )
    h ^= h >> np.uint64(31)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(29)
    return h


def turn_text(conv_num: np.ndarray, turn_idx: np.ndarray, n_words: int = 8) -> np.ndarray:
    """Deterministic pseudo-text: a pure function of (conv, turn).

    Assembled with pyarrow's vectorized element-wise join — np.char.add
    reallocates the full (growing) unicode array per append, which goes
    quadratic at 10^7 rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = [
        pa.array(np.char.add(np.char.add("c", conv_num.astype(str)), " t")),
        pa.array(turn_idx.astype(str)),
    ]
    for i in range(n_words):
        w = _WORDS[(_mix(conv_num + i * 7919, turn_idx * 31 + i) % len(_WORDS)).astype(np.int64)]
        parts.append(pa.array(w))
    # join: "c<conv> t<idx> w1 w2 ..." — first two parts glue without space
    head = pc.binary_join_element_wise(parts[0], parts[1], "")
    joined = pc.binary_join_element_wise(head, *parts[2:], " ")
    return np.asarray(joined.to_pandas(), dtype=object)


def generate_transcripts_pandas(
    n_convs: int = 200,
    mean_turns: int = 30,
    seed: int = 42,
    session_gap_s: float = 1800.0,
) -> pd.DataFrame:
    """Synthesize the transcript table as a pandas frame (vectorized).

    Conversation sizes follow a truncated Zipf (exponent ~1.1) so conv sizes
    are heavily skewed; inter-turn gaps are lognormal with a 5% chance of a
    long (> session_gap_s) pause, which creates session boundaries.
    """
    rng = np.random.default_rng(seed)
    raw = rng.zipf(1.6, size=n_convs).astype(np.float64)
    raw = np.minimum(raw, max(50.0, mean_turns * 40.0))  # cap the zipf tail first
    sizes = np.maximum(3, np.round(raw * (mean_turns / raw.mean())).astype(np.int64))
    sizes = np.minimum(sizes, max(50, mean_turns * 40))

    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)
    n = conv_num.size
    # dense 0-based turn index per conversation
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)).astype(np.int32)

    role_code = _mix(conv_num, turn_idx.astype(np.int64)) % np.uint64(100)
    # deterministic role pattern: alternate user/assistant, sprinkle system/tool
    role = np.where(
        role_code < 8,
        "system",
        np.where(role_code < 24, "tool", np.where(turn_idx % 2 == 0, "user", "assistant")),
    )
    tool = np.where(
        role == "tool",
        TOOLS[(_mix(conv_num * 3 + 1, turn_idx.astype(np.int64)) % len(TOOLS)).astype(np.int64)],
        None,
    )

    gaps = rng.lognormal(mean=2.5, sigma=1.2, size=n)  # seconds, median ~12s
    long_pause = rng.random(n) < 0.05
    gaps = np.where(long_pause, gaps + session_gap_s * (1.0 + rng.random(n) * 3), gaps)
    gaps = np.where(turn_idx == 0, 0.0, gaps)
    conv_t0 = rng.uniform(0, 86400.0 * 30, size=n_convs)  # convs start over 30 days
    t = np.repeat(conv_t0, sizes) + np.concatenate(
        [np.cumsum(g) for g in np.split(gaps, np.cumsum(sizes)[:-1])]
    )
    ts = EPOCH + (t * 1e6).astype("timedelta64[us]")

    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", conv_num.astype(str)),
            "turn_idx": turn_idx,
            "role": role,
            "text": turn_text(conv_num, turn_idx.astype(np.int64)),
            "tool": tool,
            "ts": ts,
        }
    )


def generate_snapshots_pandas(
    n_convs: int = 200,
    snapshots_per_conv: int = 4,
    seed: int = 43,
) -> pd.DataFrame:
    """Slowly-changing per-conversation dimension for as-of joins (FIXTURES.md F2)."""
    rng = np.random.default_rng(seed)
    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), snapshots_per_conv)
    snap_idx = np.tile(np.arange(snapshots_per_conv), n_convs)
    eff = rng.uniform(0, 86400.0 * 32, size=conv_num.size)
    ts = EPOCH + (eff * 1e6).astype("timedelta64[us]")
    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", conv_num.astype(str)),
            "effective_ts": ts,
            "priority_score": np.round(rng.uniform(0, 1, conv_num.size), 6),
            "segment": np.where(snap_idx % 2 == 0, "core", "longtail"),
        }
    )


def write_transcripts_parquet(path: str, row_group_size: int = 131_072, **kwargs) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_transcripts_pandas(**kwargs)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    # small row groups: the row group is Spark's scan-split unit — a single
    # fat-row-group file caps scan parallelism no matter how many cores
    pq.write_table(tbl, path, row_group_size=row_group_size)
    return path


def load_table(spark, sf_dir: str, name: str):
    """Load one driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


#: the input_hint transcript schema, declared explicitly so the text
#: readers never run Spark's schema-inference pre-pass (at 100 TB that
#: pass is a full extra scan of the corpus before the real job starts)
#: ts is timestamp_ntz to match what the parquet path yields for the
#: corpus files (pandas datetime64[us] → TIMESTAMP_NTZ under Spark 4) —
#: the three dispatches must agree so downstream operators are
#: storage-agnostic
TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz"
)


def read_transcripts(spark, source: str):
    """Load the transcript table from any backing store (SURVEY.md A1):

    - ``iceberg://<catalog>.<db>.<table>`` → the Iceberg catalog wired by
      ``session.iceberg_session_conf`` (prod; partition pruning on
      days(ts)/bucket(conv_id) comes from the table spec, and Spark's
      catalog read pushes filters into the Iceberg scan);
    - ``jsonl://<path>`` → newline-delimited JSON (the common raw-dump
      format for transcript corpora), read with the EXPLICIT input_hint
      schema — no inference pass, malformed rows dropped by the parser
      (DROPMALFORMED) instead of failing the job;
    - ``csv://<path>`` → headered CSV, same explicit schema;
    - anything else → a parquet path (sandbox/lake files).

    All return the same DataFrame schema, so every downstream operator is
    storage-agnostic.
    """
    if source.startswith("iceberg://"):
        return spark.table(source[len("iceberg://"):])
    if source.startswith("jsonl://"):
        # DROPMALFORMED discards malformed lines inside the parser; without
        # it they would survive as all-null rows and sessionize into a
        # phantom NULL conversation, silently poisoning the feature matrix.
        # NOT the PERMISSIVE + where(_corrupt_record isNull) pattern: any
        # column-pruned consumer (df.count(), select(one_col)) prunes the
        # scan down to the corrupt column alone and Spark raises
        # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN.
        return (
            spark.read.schema(TRANSCRIPT_DDL)
            .option("mode", "DROPMALFORMED")
            .json(source[len("jsonl://"):])
        )
    if source.startswith("csv://"):
        return (
            spark.read.schema(TRANSCRIPT_DDL)
            .option("header", True)
            .csv(source[len("csv://"):])
        )
    return spark.read.parquet(source)


def transcripts_from_events(spark, sf_dir: str):
    """View the driver's ``events`` table through the transcript schema.

    ``events(event_id, ts, user_id, event_type, value, props)`` is
    transcript-shaped (FIXTURES.md F6): user_id ≈ conv_id, ts gives the
    timeline. turn_idx is the per-user event rank — derived with a window so
    it is dense and 0-based, matching the input_hint contract.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "click", F.lit("browse")).alias("tool"),
        F.col("ts"),
        F.col("value"),
    )
