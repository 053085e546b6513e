"""Generalized Hamming-distance blocking for 64-bit signatures.

The pigeonhole principle: split 64 bits into ``max_hamming + 1``
contiguous blocks — any pair within Hamming distance ``max_hamming``
has at least one block with zero differing bits, so an equi-join on
(block_idx, block_val) finds every qualifying pair; an exact
``bit_count`` filter then removes the false candidates.  This is the
general form of the fixed 4×16-bit split in
``operators.dedup.simhash_near_dup_pairs`` (which predates this helper
and keeps its hard-coded ≤ 3 form for evidence stability; new callers
should use this).

Scale shape: blocking ships ids + one long per row (never payloads),
the join is a plain equi-join on two ints, and the verify is a JVM
``bit_count`` — identical to the simhash pigeonhole's plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming_blocks(
    sigs: DataFrame,
    *,
    max_hamming: int,
    id_col: str = "__id",
    sig_col: str = "__sig",
) -> DataFrame:
    """The pigeonhole block split: one row per (signature row, block)
    with (``block_idx``, ``block_val``) — ``max_hamming + 1`` contiguous
    blocks, widths ``divmod(64, nb)`` distributed high-to-low.  Shared
    by the exact pair join below and the pair-free cluster path
    (``multimodal.phash.image_dedup_clusters``)."""
    if not 0 <= max_hamming <= 32:
        raise ValueError(
            f"hamming blocking: max_hamming={max_hamming} out of "
            "[0, 32] — past 32 the 64-bit pigeonhole blocks are a "
            "single bit wide and blocking degenerates to all-pairs")
    nb = max_hamming + 1
    base, rem = divmod(64, nb)
    blocks = None
    off = 0
    for b in range(nb):
        w = base + (1 if b < rem else 0)
        val = F.shiftright(sig_col, off)
        if off + w < 64:
            val = val.bitwiseAND(F.lit((1 << w) - 1))
        part = sigs.select(
            id_col, sig_col,
            F.lit(b).alias("block_idx"),
            val.alias("block_val"),
        )
        blocks = part if blocks is None else blocks.unionAll(part)
        off += w
    return blocks


def hamming_block_pairs(
    sigs: DataFrame,
    *,
    max_hamming: int,
    id_col: str = "__id",
    sig_col: str = "__sig",
) -> DataFrame:
    """Pairs of ``sigs`` rows whose 64-bit ``sig_col`` values differ in
    at most ``max_hamming`` bits — exact (the pigeonhole guarantees
    recall for ANY ``max_hamming`` in [0, 32], unlike a fixed block
    split, which silently loses pairs past its design distance).
    Returns (id_a, id_b, hamming)."""
    blocks = hamming_blocks(sigs, max_hamming=max_hamming,
                            id_col=id_col, sig_col=sig_col)
    a = blocks.select(F.col(id_col).alias("id_a"),
                      F.col(sig_col).alias("__sig_a"),
                      "block_idx", "block_val")
    b_ = blocks.select(F.col(id_col).alias("id_b"),
                       F.col(sig_col).alias("__sig_b"),
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
