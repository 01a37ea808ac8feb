"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata
(``media_meta`` struct) — the lakehouse-native representation. The
Spark-side machinery here (schemas, batch shapes, ``mapInPandas``
signatures, partition sizing) is real and tested; the actual
decode/feature-extract step is STUBBED because no image/audio codec
libraries exist in this container:

- ``decode_media(..., codec="real")`` raises ``NotImplementedError`` at the
  point where PIL/torchaudio/ffmpeg would be called;
- ``codec="fake"`` (default for tests) produces a deterministic feature
  vector derived from the bytes (length, byte histogram moments, seeded
  hash) with the exact batch mechanics production would use — so
  partitioning, Arrow transfer, schema evolution and downstream joins are
  all exercised for real.

At 100TB: media bytes dominate row size, so ``spark.sql.files.
maxPartitionBytes`` should be lowered (e.g. 32MB) for media tables and the
feature extraction fused into ONE mapInPandas pass to avoid re-shuffling
blobs; outputs (small vectors) are written to a separate table keyed by
media_id (never carry blobs past the extract stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, mime:string>"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, kind string, n_bytes long, feature array<double>"


def synth_media_df(spark, n: int = 64, seed: int = 9) -> DataFrame:
    """Deterministic fake media table with realistic byte payloads."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        content = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(16, 512)) if kind == "image" else None,
            "height": int(rng.integers(16, 512)) if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": int(rng.integers(100, 60000)) if kind != "image" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, bytearray(content), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoder+embedder: byte-histogram moments
    in a fixed-dim vector. Pure function of the bytes."""
    arr = np.frombuffer(content, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(dim)
    hist = np.bincount((arr // (256 // dim)).astype(np.int64), minlength=dim)[:dim]
    return hist / arr.size


def extract_media_features(
    df: DataFrame,
    codec: str = "fake",
    dim: int = FEATURE_DIM,
    batch_limit_bytes: int = 64 << 20,
) -> DataFrame:
    """One vectorized mapInPandas pass: (media rows) -> (media_id, kind,
    n_bytes, feature vector). ``codec='real'`` marks where the actual
    decoder goes (PIL/librosa/ffmpeg) — NotImplementedError here."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg — not in "
                    "this container; wire the decoder here (batch shape and "
                    "output schema are already production-ready)"
                )
            feats = [_fake_features(c, dim) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].str.len().astype("int64"),
                    "feature": feats,
                }
            )

    # blobs never persist past this projection; downstream sees small rows
    return df.select("media_id", "kind", "content").mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, duration_ms) into one
    row per sampled frame timestamp (JVM-side sequence) — the shuffle-free
    skeleton a real frame extractor maps over."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, mime:string>"
)


def resize_images(
    df: DataFrame,
    max_side: int = 256,
    codec: str = "fake",
) -> DataFrame:
    """One vectorized mapInPandas pass: shrink every image so its longer
    side is <= ``max_side`` (aspect ratio preserved, never upscaled);
    non-image rows pass through untouched. ``codec='real'`` marks the
    PIL/cv2 call site (NotImplementedError in this container); the fake
    codec updates meta dims exactly as a real resize would and decimates
    the byte payload by the area ratio, so partition sizing, Arrow batch
    shapes, schema evolution and downstream joins are exercised for real.

    Same 100 TB shape as extract_media_features: blobs ride through ONE
    Python stage and the output is written keyed by media_id — never
    re-shuffle a blob column.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_meta = [], []
            for kind, content, meta in zip(pdf["kind"], pdf["content"], pdf["meta"]):
                # a NULL meta struct arrives as None — pass the row through
                # BEFORE touching it (audio/text blobs ingested without dims)
                if meta is None:
                    out_content.append(content)
                    out_meta.append(None)
                    continue
                meta = dict(meta)
                w, h = meta.get("width"), meta.get("height")
                if kind != "image" or not w or not h or max(w, h) <= max_side:
                    out_content.append(content)
                    out_meta.append(meta)
                    continue
                if codec == "real":
                    raise NotImplementedError(
                        "real image resize requires PIL/cv2 — not in this "
                        "container; wire the decoder here (batch shape and "
                        "output schema are already production-ready)"
                    )
                scale = max_side / max(w, h)
                nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                raw = bytes(content)
                n_out = max(1, int(len(raw) * (nw * nh) / (w * h)))
                stride = max(1, len(raw) // n_out)
                out_content.append(raw[::stride][:n_out])
                meta["width"], meta["height"] = nw, nh
                out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "meta": out_meta,
                }
            )

    return df.select("media_id", "kind", "content", "meta").mapInPandas(
        resize, RESIZED_SCHEMA
    )
