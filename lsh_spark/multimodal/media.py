"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema contract, partition-preserving iteration,
batch shape) is real and tested; the actual codec work is stubbed behind
``DECODERS`` because media libraries are not available in this
environment — swap in PIL/ffmpeg decoders by registering a function with
the same ``bytes -> dict`` contract.

Design notes for 100 TB:
  * media bytes never pass through a shuffle — ``mapInPandas`` is a
    narrow transformation; only extracted features (small, typed) flow
    into joins/aggregations downstream;
  * the iterator-of-batches contract keeps peak memory at
    O(arrow_batch_size × avg_media_size) per task, independent of
    partition size;
  * metadata is a fixed struct so Catalyst can prune/push down on it
    without touching the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("content", BinaryType(), True),
    StructField("mime", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("digest", StringType(), True),
    StructField("width", IntegerType(), True),       # image/video
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),    # video/audio samples
])


def _stub_decode(kind: str, content: bytes) -> dict:
    """Deterministic fake decoder: derives plausible metadata from the
    byte content itself so tests are reproducible.  Replace via
    ``DECODERS[kind] = fn``."""
    if content is None:
        return {"width": None, "height": None, "n_frames": None}
    digest = hashlib.sha256(content).digest()
    if kind == "image":
        return {"width": 16 + digest[0] % 64, "height": 16 + digest[1] % 64,
                "n_frames": 1}
    if kind == "video":
        return {"width": 16 + digest[0] % 64, "height": 16 + digest[1] % 64,
                "n_frames": 1 + digest[2]}
    if kind == "audio":
        return {"width": None, "height": None, "n_frames": 1 + digest[3] * 100}
    raise NotImplementedError(f"no decoder for media kind {kind!r}")


DECODERS: dict[str, Callable[[str, bytes], dict]] = {
    "image": _stub_decode,
    "audio": _stub_decode,
    "video": _stub_decode,
}


def extract_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURE_SCHEMA, one Arrow batch at a time."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r["content"]
                decoder = DECODERS.get(r["kind"], _stub_decode)
                meta = decoder(r["kind"], content)
                rows.append({
                    "media_id": r["media_id"],
                    "kind": r["kind"],
                    "n_bytes": len(content) if content is not None else None,
                    "digest": hashlib.sha256(content).hexdigest()
                    if content is not None else None,
                    **meta,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA DataFrame from the documents table (UTF-8 bytes
    as stand-in blobs) — the environment has no real media corpus; this
    exercises identical plumbing."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def media_dedup_by_digest(features: DataFrame) -> DataFrame:
    """Exact media dedup on content digest (the standard first pass before
    perceptual hashing)."""
    return (
        features.groupBy("digest")
        .agg(F.min("media_id").alias("canonical_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("content", BinaryType(), True),
])


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Image resize plumbing (``mapInPandas``, batch-at-a-time).  The pixel
    work is stubbed deterministically (real deployment: PIL/opencv with the
    same ``bytes -> bytes`` contract); schema, batching and
    partition-preservation are the real, tested parts."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "image" or r["content"] is None:
                    continue
                # STUB: a real decoder would decode+resample; the stand-in
                # derives a deterministic fixed-size payload
                digest = hashlib.sha256(r["content"]).digest()
                fake_pixels = (digest * ((width * height) // 32 + 1))[
                    : width * height]
                rows.append({
                    "media_id": r["media_id"],
                    "width": width,
                    "height": height,
                    "content": fake_pixels,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(media: DataFrame, *, every_nth: int = 10,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (fan-out inside ``mapInPandas`` — no explode shuffle; frames stay on
    the partition that held the video bytes)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video" or r["content"] is None:
                    continue
                digest = hashlib.sha256(r["content"]).digest()
                n_frames = 1 + digest[2]  # matches _stub_decode
                taken = 0
                for idx in range(0, n_frames, every_nth):
                    if taken >= max_frames:
                        break
                    # STUB frame payload: deterministic per (video, idx)
                    frame = hashlib.sha256(
                        r["content"] + idx.to_bytes(4, "little")).digest()
                    rows.append({"media_id": r["media_id"],
                                 "frame_idx": idx, "frame": frame})
                    taken += 1
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA])

    return media.mapInPandas(_sample, schema=FRAMES_SCHEMA)
