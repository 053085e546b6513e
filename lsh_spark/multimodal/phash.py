"""Perceptual image hashing over the REAL decode chain: dHash
(difference hash) signatures and Hamming near-dup pairs — the standard
first-pass image dedup for multimodal training corpora (exact-digest
dedup misses re-encoded/resized copies; dHash is robust to both).

dHash recipe (the widely-published difference-hash): decode → grayscale
(channel mean) → nearest-neighbor resample to (hash_size,
hash_size + 1) → one bit per adjacent-column comparison, packed
row-major into ``hash_size²`` bits (64 at the default 8).  Everything
runs inside one Arrow batch per partition; the signature column is a
plain BIGINT, so the pair stage is pure JVM.

Pairing goes through the shared generalized pigeonhole
(``operators.hamming.hamming_block_pairs``): 64 bits split into
``max_hamming + 1`` blocks — any qualifying pair agrees on ≥ 1 block —
equi-join per block, then an exact ``bit_count`` verify.  Scale shape
is identical to ``simhash_near_dup_pairs``: blocking is an equi-join
on (block_idx, block_val), ids + one long each, never pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

DHASH_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("dhash", LongType(), True),
])


def _dhash_pixels(px: np.ndarray, hash_size: int) -> int:
    """dHash of one decoded pixel array ((h, w) or (h, w, c) uint8)."""
    g = px.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    h_src, w_src = g.shape
    ys = (np.arange(hash_size) * h_src) // hash_size
    xs = (np.arange(hash_size + 1) * w_src) // (hash_size + 1)
    small = g[ys[:, None], xs[None, :]]
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.view(np.int64))


def dhash_images(media: DataFrame, *, hash_size: int = 8) -> DataFrame:
    """(media_id, dhash) for every decodable image row (RAWI / PNG /
    JPEG / BMP / GIF via the shared decode chain); undecodable or
    non-image rows yield NULL.  ``hash_size`` must keep
    ``hash_size² ≤ 64`` (the signature packs into one BIGINT)."""
    if hash_size * hash_size > 64:
        raise ValueError("dhash_images: hash_size² must fit in 64 bits")

    from .media import _decode_image

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                val = None
                if r["kind"] == "image" and r["content"] is not None:
                    try:
                        meta = _decode_image(bytes(r["content"]))
                    except ValueError:
                        meta = None
                    if meta is not None:
                        val = _dhash_pixels(meta["_pixels"], hash_size)
                rows.append({"media_id": r["media_id"], "dhash": val})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in DHASH_SCHEMA])

    return media.mapInPandas(_hash, schema=DHASH_SCHEMA)


def image_near_dup_pairs(
    media: DataFrame,
    *,
    max_hamming: int = 3,
    hash_size: int = 8,
) -> DataFrame:
    """Image pairs whose dHash Hamming distance ≤ ``max_hamming``
    (exact for any ``max_hamming`` in [0, 32] — the shared pigeonhole
    splits into ``max_hamming + 1`` blocks).  Returns (id_a, id_b,
    hamming)."""
    from ..operators.hamming import hamming_block_pairs
    from ..plans.cache import track

    sigs = dhash_images(media, hash_size=hash_size).where(
        F.col("dhash").isNotNull()).withColumnRenamed(
        "media_id", "__id").withColumnRenamed("dhash", "__sig")
    track(sigs.persist())
    return hamming_block_pairs(sigs, max_hamming=max_hamming)


def image_dedup_clusters(
    media: DataFrame,
    *,
    max_hamming: int = 2,
    hash_size: int = 8,
    max_iter: int = 12,
) -> DataFrame:
    """Cluster-representative image dedup WITHOUT pair materialization —
    the 100 TB path for images (measured: the pair operator is
    output-bound, a duplicate group of m re-encodes holds m²/2 pairs).
    Single-linkage connected components over dHash block-collision
    edges, run by the shared min-label propagation core
    (``operators.cc.min_label_components`` — the identical iteration the
    MinHash cluster dedup uses, bounded by rows × blocks per round).

    Same semantic trade as ``lsh_dedup_clusters``: edges are BLOCK
    collisions (no exact-Hamming pair verify — verification would
    require the pairs this path exists to avoid); raise ``max_hamming``
    for recall, lower it for precision.  Undecodable / non-image rows
    are excluded (no signature → no cluster row).

    Returns (media_id, cluster_id, is_representative)."""
    from ..operators.cc import min_label_components
    from ..operators.hamming import hamming_blocks
    from ..plans.cache import track

    sigs = dhash_images(media, hash_size=hash_size).where(
        F.col("dhash").isNotNull()).withColumnRenamed(
        "media_id", "__id").withColumnRenamed("dhash", "__sig")
    track(sigs.persist())
    blocks = hamming_blocks(sigs, max_hamming=max_hamming).select(
        "__id",
        F.col("block_idx").alias("band_idx"),
        F.col("block_val").alias("band_hash"),
    )
    labels = min_label_components(blocks, max_iter=max_iter)
    return labels.select(
        F.col("__id").alias("media_id"),
        F.col("__label").alias("cluster_id"),
        (F.col("__id") == F.col("__label")).alias("is_representative"),
    )
