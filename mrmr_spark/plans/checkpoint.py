"""Phase-boundary checkpointing with manifests, lineage and per-partition
metrics (BASELINE.json north_rule: 'resumable from checkpoint with
per-partition lineage + metrics').

Each phase writes parquet + a ``manifest.json`` containing:

- phase name, wall-clock, total rows, schema
- **per-partition metrics**: rows + key ranges per output partition
  (collected with one tiny ``spark_partition_id()`` groupBy — no extra scan
  beyond the write-side read-back)
- **lineage**: the manifest ids of the parent phases (sha-like id of
  name+schema+rows), so a resumed run can verify its inputs are the ones
  the checkpoint was built from.

``resume_or_run`` makes a pipeline idempotent: a phase whose manifest is
complete is read back instead of recomputed; kill the job at any phase
boundary and the next run continues from the last completed phase.

Resume additionally keys on a **config fingerprint** when the caller
provides one (the entrypoints fingerprint their full argument set): a
checkpoint dir reused with a CHANGED configuration — different metrics,
input path, seed — rebuilds instead of silently replaying the stale
phase outputs of the old configuration. Manifests written before this
field resume only under a fingerprint-free caller (config=None).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def _manifest_id(payload: dict) -> str:
    key = json.dumps(
        {k: payload[k] for k in ("phase", "schema", "n_rows")}, sort_keys=True
    )
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def config_fingerprint(config: dict | None) -> str | None:
    """Canonical sha-16 of a configuration dict (sorted-key JSON with
    strings for non-JSON values); None passes through — the
    fingerprint-free legacy mode."""
    if config is None:
        return None
    key = json.dumps(config, sort_keys=True, default=str)
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def checkpoint_phase(
    df: DataFrame,
    path: str,
    phase: str,
    key_cols: list[str] | None = None,
    parents: list[str] | None = None,
    config_id: str | None = None,
) -> DataFrame:
    """Write ``df`` to ``path`` with a manifest; returns the read-back frame
    (so downstream lineage starts from the files, not the upstream plan)."""
    spark = df.sparkSession
    t0 = time.time()
    data_path = os.path.join(path, "data")
    # invalidate any prior COMPLETE manifest BEFORE overwriting the data:
    # a driver killed after the parquet overwrite but before the new
    # manifest lands would otherwise leave the OLD config's complete
    # manifest paired with the NEW config's data, and a later run matching
    # the old config_id (or a legacy config=None caller) would silently
    # resume the wrong configuration's output. A crash mid-rebuild now
    # forces a rebuild instead of a stale resume. (r05 advice, medium.)
    mp = _manifest_path(path)
    if os.path.exists(mp):
        os.remove(mp)
    df.write.mode("overwrite").parquet(data_path)
    back = spark.read.parquet(data_path)

    metrics_agg = [F.count(F.lit(1)).alias("rows")]
    for c in key_cols or []:
        metrics_agg += [F.min(c).cast("string").alias(f"min_{c}"),
                        F.max(c).cast("string").alias(f"max_{c}")]
    part_metrics = (
        back.groupBy(F.spark_partition_id().alias("partition"))
        .agg(*metrics_agg)
        .orderBy("partition")
        .collect()
    )
    partitions = [row.asDict() for row in part_metrics]
    n_rows = int(sum(p["rows"] for p in partitions))

    payload = {
        "phase": phase,
        "schema": back.schema.simpleString(),
        "n_rows": n_rows,
        "n_partitions": len(partitions),
        "partitions": partitions,
        "parents": parents or [],
        "config_id": config_id,
        "wall_s": round(time.time() - t0, 3),
        "complete": True,
    }
    payload["manifest_id"] = _manifest_id(payload)
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, _manifest_path(path))  # atomic completion marker
    return back


def load_manifest(path: str) -> dict | None:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        m = json.load(f)
    return m if m.get("complete") else None


def resume_or_run(
    spark: SparkSession,
    path: str,
    phase: str,
    build: Callable[[], DataFrame],
    key_cols: list[str] | None = None,
    parents: list[str] | None = None,
    config_id: str | None = None,
) -> tuple[DataFrame, dict]:
    """Read the checkpoint if its manifest is complete AND carries the
    same configuration fingerprint, else build + write. Returns
    (frame, manifest). A config_id of None (legacy callers) resumes any
    complete manifest; a fingerprinting caller never resumes a phase
    built under a different — or unknown — configuration."""
    m = load_manifest(path)
    if (
        m is not None
        and m["phase"] == phase
        and (config_id is None or m.get("config_id") == config_id)
    ):
        return spark.read.parquet(os.path.join(path, "data")), m
    out = checkpoint_phase(build(), path, phase, key_cols, parents, config_id)
    return out, load_manifest(path)


class PhaseRunner:
    """Sequential resumable pipeline: each phase is (name, build_fn(prev)).

    ``run`` threads the previous phase's frame into the next builder and
    records lineage (parent manifest ids). Killing the driver between
    phases loses nothing: completed phases are read back on the next run.

    Pass ``config`` (any JSON-able dict — the entrypoints pass their full
    argument namespace) to fingerprint every manifest: re-running against
    the same checkpoint dir with a changed configuration rebuilds instead
    of silently replaying the old configuration's outputs.
    """

    def __init__(
        self, spark: SparkSession, base_dir: str, config: dict | None = None
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.manifests: list[dict] = []
        self.config_id = config_fingerprint(config)

    def run(self, phases: list[tuple[str, Callable]], key_cols: list[str] | None = None):
        df = None
        parent_ids: list[str] = []
        for name, build in phases:
            path = os.path.join(self.base_dir, name)
            df, manifest = resume_or_run(
                self.spark, path, name,
                (lambda b=build, d=df: b(d)),
                key_cols=key_cols, parents=parent_ids,
                config_id=self.config_id,
            )
            self.manifests.append(manifest)
            parent_ids = [manifest["manifest_id"]]
        return df
