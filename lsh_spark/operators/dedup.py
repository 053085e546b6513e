"""Deduplication operator family for training-data pipelines.

Five strategies, each a distinct cost/recall point (SURVEY's pipeline
requirements; the minhash family lives in ``similarity_join.py``):

  * exact        — identical text (hash group-by)
  * normalized   — identical after whitespace/case canonicalization
  * minhash LSH  — ``lsh_self_dedup_pairs`` / ``lsh_dedup_keep_first``
  * simhash      — 64-bit fingerprints, near-dup iff hamming ≤ r
  * embedding    — cosine ≥ threshold on an embedding column

SimHash uses the same FxHash primitive as the reference's shingles (cited:
``src/minhash/shingleset.rs:37-47``) over whitespace tokens; the bit-vote
accumulation is numpy (popcount-style unpack), one pandas-UDF pass per row
batch.  Hamming blocking uses the standard 4-block trick: duplicates with
hamming ≤ 3 share at least one of 4 16-bit blocks → equi-join per block,
never a cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..functions.vector import cosine, dot, norm
from ..plans.cache import track
from .._core.batch import hash_strings_batch


# ---------------------------------------------------------------------------
# exact / normalized
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical texts: (canonical_id, n_copies)."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("canonical_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


def normalized_text(col) -> Column:
    """Canonical form: lowercase, collapse whitespace, strip."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def normalized_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        df.groupBy(normalized_text(text_col).alias("__norm"))
        .agg(F.min(id_col).alias("canonical_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per identical text (distributed: one
    hash-aggregate, no window over the full table)."""
    keep = df.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[text_col, id_col], how="left_semi")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(col) -> Column:
    """64-bit SimHash over whitespace tokens (FxHash token hashes,
    bit-vote with +1/-1, sign → bit).  Returns int64 (two's complement)."""

    @pandas_udf(LongType())
    def _udf(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.int64)
        mask = s.notna().to_numpy()
        token_lists = [t.split() if ok else [] for t, ok in zip(s, mask)]
        counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                             count=len(token_lists))
        flat = [tok for lst in token_lists for tok in lst]
        if flat:
            # token hash: same FxHash-u32 primitive as the reference's
            # shingle hashing, extended to 64 bits by a second fold
            h32 = hash_strings_batch(flat)
            # spread to 64 bits deterministically (splitmix-style mix)
            h = h32.astype(np.uint64)
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = h ^ (h >> np.uint64(31))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = bits * 2 - 1  # (n_tokens, 64) in {-1, +1}
            offs = np.zeros(len(token_lists) + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            nonempty = counts > 0
            starts = offs[:-1][nonempty]
            sums = np.add.reduceat(votes, starts, axis=0)
            sig_bits = (sums > 0).astype(np.uint64)
            sigs = np.zeros(nonempty.sum(), dtype=np.uint64)
            for b in range(64):
                sigs |= sig_bits[:, b] << np.uint64(b)
            out[nonempty] = sigs.view(np.int64)
        res = pd.Series(out)
        res[~mask] = None
        return res

    return _udf(F.col(col) if isinstance(col, str) else col)


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with simhash hamming distance ≤ ``max_hamming`` (≤ 3 uses the
    4×16-bit block pigeonhole: any such pair agrees on ≥1 block)."""
    from ..sources.io import fanout_scan

    sigs = fanout_scan(df.select(F.col(id_col).alias("__id"),
                                 F.col(text_col).alias("__text"))).select(
        "__id",
        simhash64("__text").alias("__sig"),
    ).where(F.col("__sig").isNotNull())
    track(sigs.persist())

    blocks = None
    for b in range(4):
        part = sigs.select(
            "__id", "__sig",
            F.lit(b).alias("block_idx"),
            F.shiftright("__sig", b * 16).bitwiseAND(F.lit(0xFFFF))
            .alias("block_val"),
        )
        blocks = part if blocks is None else blocks.unionAll(part)

    a = blocks.select(F.col("__id").alias("id_a"), F.col("__sig").alias("__sig_a"),
                      "block_idx", "block_val")
    b_ = blocks.select(F.col("__id").alias("id_b"), F.col("__sig").alias("__sig_b"),
                       "block_idx", "block_val")
    cand = (
        a.join(b_, on=["block_idx", "block_val"], how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sig_a", "__sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("__sig_a").bitwiseXOR(F.col("__sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    sample_max_id: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, id_a < id_b.

    Brute-force within the (optionally bounded) id range — the exact
    oracle-able baseline; for the full-corpus scale path use
    ``euclidean_lsh_topk``-style bucketing instead of the cross join."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    if sample_max_id is not None:
        base = base.where(F.col("__id") < sample_max_id)
    # precompute each vector's norm ONCE (same value/op sequence as the
    # per-pair formula — sqrt(dot(v,v)) — so results stay bit-identical to
    # the oracle, but the n² pair stage only multiplies two scalars)
    base = base.withColumn("__n", norm("__v"))
    a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
                    F.col("__n").alias("__na"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
                    F.col("__n").alias("__nb"))
    cos = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        dot("__va", "__vb") / (F.col("__na") * F.col("__nb")),
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(cos, 6))
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    bucket_width: float = 2.0,
    band_count: int = 8,
    band_size: int = 1,
    seed: int = 123,
) -> DataFrame:
    """Embedding near-dup pairs, SCALE path: candidates are vector pairs
    sharing ≥1 Euclidean-LSH band (the reference's ``lsh_euclidean`` as
    blocking key), verified by exact cosine.  The blocking join ships
    ONLY (id, band_idx, band_hash); vectors re-attach to surviving unique
    pairs by id — so shuffle volume is bounded by rows × band_count, never
    |corpus|², unlike the brute-force ``embedding_dup_pairs`` baseline.

    Returns (id_a, id_b, cosine_sim ≥ threshold), id_a < id_b."""
    from ..functions.lsh import lsh_euclidean_bands_long

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    bands = lsh_euclidean_bands_long(
        F.col("__v"), bucket_width, band_count, band_size, seed)
    blocks = base.select(
        "__id", F.posexplode(bands).alias("band_idx", "band_hash"))
    a = blocks.select(F.col("__id").alias("id_a"), "band_idx", "band_hash")
    b = blocks.select(F.col("__id").alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"], how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    vb = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    return (
        pairs.join(va, on="id_a").join(vb, on="id_b")
        .withColumn("cosine_sim", F.round(cosine("__va", "__vb"), 6))
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def semantic_dedup_cells(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 32,
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-shaped semantic dedup: cluster embeddings with the
    training-free IVF coarse quantizer (the ``n_lists`` lowest-id vectors
    are the centroids — fully deterministic, so a DuckDB oracle reproduces
    cells AND verdicts), then keep, within each cell, only vectors with no
    lower-id cell-mate at cosine ≥ ``threshold``.

    Returns every input row as (``id_col``, cell, is_representative) —
    the assignment plus the retention verdict.

    100 TB shape: cell assignment is a zero-shuffle projection against the
    broadcast centroid array (same kernel as ``ann.ivf_flat_topk``); the
    candidate stage self-joins (id, cell) pairs ONLY — vectors re-attach
    to candidate pairs by id, so shuffle payloads are ids, never the
    embedding column, and pair volume is bounded by within-cell sizes
    instead of |corpus|².  Raising ``n_lists`` is the knob that caps cell
    width as the corpus grows."""
    from .ann import _cells_array, _ivf_dists

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    cents = F.broadcast(_cells_array(df, id_col, vec_col, n_lists))
    assigned = (
        base.crossJoin(cents)
        .withColumn("__cell",
                    F.array_min(_ivf_dists("__v"))["cell"].cast("int"))
        .select("__id", "__v", "__cell")
    )
    ids = assigned.select("__id", "__cell")
    a = ids.select(F.col("__id").alias("id_a"), "__cell")
    b = ids.select(F.col("__id").alias("id_b"), "__cell")
    pairs = (
        a.join(b, on="__cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    va = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    vb = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    dropped = (
        pairs.join(va, on="id_a").join(vb, on="id_b")
        .where(F.round(cosine("__va", "__vb"), 6) >= threshold)
        .select(F.col("id_b").alias("__id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("__dropped", F.lit(True)),
                      on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cell").alias("cell"),
            F.coalesce(~F.col("__dropped"), F.lit(True))
            .alias("is_representative"),
        )
    )
