"""LSH similarity join — the reference README's documented usage pattern
(``README.md:133-163``) as a first-class distributed operator.

The reference pattern is:

    SELECT A.ind, B.id FROM A INNER JOIN B
      ON lsh_min(A.col, w, bands, size, seed)[k] = lsh_min(B.col, ...)[k]
      WHERE lsh_jaccard(A.col, B.col, w) > threshold
    UNION ... (seed rotated per block)

Spark-first redesign (SURVEY.md §2.4), shaped by what actually dominates at
scale (measured: shipping texts through the band join was 5-10× the cost of
everything else):

  1. each side's shingle set is materialized ONCE per row
     (``shingle_set_col``) and persisted — every later stage reuses it;
  2. band hashes derive from the sets (no re-shingling) and the blocking
     join shuffles ONLY (id, band_idx, band_hash) rows — 16 bytes of
     payload per band, never the text;
  3. candidate pairs are de-duplicated as bare id pairs, then shingle sets
     are re-attached by two id-equi-joins (size-gated broadcast: the set
     table ships once per executor while its estimated bytes fit the cap,
     and the join falls back to shuffling by pair ids beyond it);
  4. the exact-Jaccard verification runs once per unique pair from the
     materialized sets.

The ``id_a < id_b`` predicate is applied inside the blocking join so mirror
candidates never materialize.  Band-bucket skew (huge near-dup clusters →
hot (band_idx, hash) keys) is handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.lsh import (
    minhash_bands_from_set,
    shingle_set_col,
)
from ..plans.cache import track

# Exact-Jaccard verification (the reference's set ratio,
# ``shingleset.rs:50-57``: 0.0 when either side is empty) runs as ONE
# mapInPandas pass: a vectorized numpy batch-merge (values row-tagged in
# the high 32 bits, one radix-stable merge per Arrow batch — see
# ``_core.batch.sorted_intersect_counts``) that filters and
# projects in the same pass.  Measured on the sf0.1 flagship workload
# (5.2M pairs): the batch merge is 3.6× faster than Catalyst
# ``array_intersect`` (per-row hash-set builds cost ~55 µs/pair), and the
# single pass avoids the double UDF evaluation Catalyst's predicate
# pushdown creates when a filter references a projected UDF column.


def _batch_jaccard(va: list, vb: list) -> "np.ndarray":
    """|A∩B|/|A∪B| for aligned lists of sorted-unique int32 arrays — one
    vectorized merge for the whole batch.  The row-tagged concatenations
    are globally sorted by construction, so the overlap count is one
    radix-stable merge (``sorted_intersect_counts``), not a comparison
    sort."""
    import numpy as np

    from .._core.batch import sorted_intersect_counts

    la = np.fromiter((len(x) for x in va), dtype=np.int64, count=len(va))
    lb = np.fromiter((len(x) for x in vb), dtype=np.int64, count=len(vb))
    rows = np.arange(len(va), dtype=np.int64)
    ka = (np.repeat(rows, la) << 32) | (
        np.concatenate(va).astype(np.int64) & 0xFFFFFFFF
        if la.sum() else np.empty(0, dtype=np.int64))
    kb = (np.repeat(rows, lb) << 32) | (
        np.concatenate(vb).astype(np.int64) & 0xFFFFFFFF
        if lb.sum() else np.empty(0, dtype=np.int64))
    ni = sorted_intersect_counts(ka, kb, len(va))
    union = la + lb - ni
    return np.where(union > 0, ni / np.maximum(union, 1), 0.0)


def _batch_containment(va: list, vb: list):
    """Per-row (|A∩B|/|A|, |A∩B|/|B|) for aligned lists of sorted-unique
    int32 arrays — the same one-merge-per-batch shape as
    ``_batch_jaccard``; raw IEEE divisions (no rounding here: numpy
    rounds half-even, the engines round half-up — rounding happens
    in-plan with ``F.round`` so both engines replay one op order)."""
    import numpy as np

    from .._core.batch import sorted_intersect_counts

    la = np.fromiter((len(x) for x in va), dtype=np.int64, count=len(va))
    lb = np.fromiter((len(x) for x in vb), dtype=np.int64, count=len(vb))
    rows = np.arange(len(va), dtype=np.int64)
    ka = (np.repeat(rows, la) << 32) | (
        np.concatenate(va).astype(np.int64) & 0xFFFFFFFF
        if la.sum() else np.empty(0, dtype=np.int64))
    kb = (np.repeat(rows, lb) << 32) | (
        np.concatenate(vb).astype(np.int64) & 0xFFFFFFFF
        if lb.sum() else np.empty(0, dtype=np.int64))
    ni = sorted_intersect_counts(ka, kb, len(va))
    ca = np.where(la > 0, ni / np.maximum(la, 1), 0.0)
    cb = np.where(lb > 0, ni / np.maximum(lb, 1), 0.0)
    return ca, cb


def _collect_sets_broadcast(sets: DataFrame, id_alias: str, set_alias: str):
    """Flatten the cached (id, sorted-set) table into three numpy arrays —
    (sorted_ids, offsets, flat_values) — and broadcast them to the Python
    workers.  Same driver-side data volume as the JVM broadcast-hash join
    this replaces (that join also collects the build side to the driver),
    but the verify kernel can then gather sets BY ID: candidate pairs
    cross the Arrow boundary as bare (id_a, id_b) rows instead of
    carrying two ~KB set payloads each — on the sf0.1 flagship that cuts
    the UDF input from ~5 GB to ~35 MB."""
    import numpy as np

    pdf = sets.select(id_alias, set_alias).toPandas()
    ids = pdf[id_alias].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    arrs = pdf[set_alias].to_numpy()[order]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                       count=len(arrs))
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = (np.concatenate(arrs).astype(np.int32) if lens.sum()
            else np.empty(0, dtype=np.int32))
    from ..plans.cache import track_broadcast

    return track_broadcast(sets.sparkSession.sparkContext.broadcast(
        (ids[order], offsets, flat)))


def _gather_segments(flat, offsets, idx, lens):
    """Vectorized multi-segment gather: concatenation of
    ``flat[offsets[i]:offsets[i]+lens_by_row[i]]`` for each i in idx."""
    import numpy as np

    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=flat.dtype)
    out_starts = np.cumsum(lens) - lens
    within = np.arange(total, dtype=np.int64) - np.repeat(out_starts, lens)
    return flat[np.repeat(offsets[idx], lens) + within]


# Bitmap fast path for the broadcast verify: when the CORPUS-WIDE value
# universe is small (templated/boilerplate-heavy corpora — the gate
# corpus' 31-word vocabulary yields ~400 distinct char-trigram hashes),
# each set packs into a few uint64 words over one shared value→bit
# mapping and the per-pair intersection count is AND + popcount instead
# of the row-tagged radix merge (measured 35× per 10k-pair batch at
# sf0.1).  Values appearing on only ONE side can never contribute to an
# intersection, so the shared universe is the CROSS-SIDE INTERSECTION of
# value sets; set SIZES still come from the unpacked offsets, so unions
# and both division operands are untouched — counts, and therefore every
# emitted float, are integer-identical to the merge path.  Size-gated:
# past the caps (natural-text universes at 100 TB) the radix merge
# stands.
_USE_BITMAP_VERIFY = True
_BITMAP_MAX_BYTES = 128 << 20  # packed-matrix budget across both sides
# per-pair cost model: popcount touches 8·W LUT bytes/pair, the merge
# sorts ~16·(|A|+|B|) key bytes/pair over more passes — require the
# bitmap row to be comfortably under the mean pair's element count
_BITMAP_WORDS_VS_PAIR = 0.5


def _bitmap_pack(spark, bc_a, bc_b):
    """Build the shared-universe packed bitmaps for a broadcast-verify
    pair of set tables, or None when the fast path does not pay
    (universe too wide, matrices too big, or an empty side).  Returns a
    tracked broadcast of (bm_a, bm_b, n_words); bm_b is None when both
    sides are the same table (the self-join ships one matrix)."""
    import numpy as np

    from ..plans.cache import track_broadcast

    ids_a, off_a, flat_a = bc_a.value
    ids_b, off_b, flat_b = bc_b.value
    if len(ids_a) == 0 or len(ids_b) == 0:
        return None
    # driver-side guard: the unique/searchsorted passes below are one
    # O(n log n) driver scan — skip straight to the distributed merge
    # path when the collected tables are already huge
    if flat_a.shape[0] + flat_b.shape[0] > 64_000_000:
        return None
    uni_a = np.unique(flat_a)
    common = (uni_a if bc_a is bc_b
              else np.intersect1d(uni_a, np.unique(flat_b),
                                  assume_unique=True))
    n_words = (common.shape[0] + 63) // 64
    mean_pair_elems = (flat_a.shape[0] / len(ids_a)
                       + flat_b.shape[0] / len(ids_b))
    if n_words > max(4, mean_pair_elems * _BITMAP_WORDS_VS_PAIR):
        return None
    if (len(ids_a) + len(ids_b)) * n_words * 8 > _BITMAP_MAX_BYTES:
        return None
    bm_a = _bitmap_pack_side(flat_a, off_a, common, n_words)
    bm_b = (None if bc_a is bc_b
            else _bitmap_pack_side(flat_b, off_b, common, n_words))
    return track_broadcast(
        spark.sparkContext.broadcast((bm_a, bm_b, n_words)))


def _bitmap_pack_side(flat, off, common, n_words):
    """Pack one side's sorted-unique int32 sets into (n_docs, n_words)
    uint64 bitmaps over the shared sorted ``common`` value universe;
    values outside it (single-side values — intersection-irrelevant) are
    dropped from the bitmap only, never from the size offsets.

    DEPENDS on each row's values ascending in the SIGNED int32 view
    (the repo-wide set storage contract sorts in the signed view): the
    grouped ``reduceat`` below ASSIGNS one OR-fold per run of equal word
    indices, so an out-of-order row would scatter a word's bits across
    non-adjacent runs and the later assignment would overwrite the
    earlier — silent undercount.  Asserted per call (one vectorized
    pass over the already-built key array, negligible vs the pack)."""
    import numpy as np

    n = off.shape[0] - 1
    if common.shape[0] == 0 or flat.shape[0] == 0:
        return np.zeros((n, n_words), dtype=np.uint64)
    rows = np.repeat(np.arange(n, dtype=np.int64), off[1:] - off[:-1])
    pos = np.searchsorted(common, flat)
    pos = np.minimum(pos, common.shape[0] - 1)
    ok = common[pos] == flat
    rows, pos = rows[ok], pos[ok].astype(np.int64)
    bm = np.zeros((n, n_words), dtype=np.uint64)
    # rows are nondecreasing and each row's codes ascend (sets are
    # sorted; searchsorted over the sorted universe preserves order),
    # so equal word indices are CONTIGUOUS — one bitwise_or.reduceat
    # over group starts replaces the ~20x-slower scattered
    # np.bitwise_or.at
    w = rows * n_words + (pos >> 6)
    bit = np.uint64(1) << (pos & 63).astype(np.uint64)
    if w.shape[0]:
        # the signed-view sort dependency, checked: (row, universe-pos)
        # must strictly ascend, else equal word indices would not be
        # contiguous and the grouped assignment below would undercount
        key = rows * np.int64(common.shape[0]) + pos
        if not bool(np.all(key[1:] > key[:-1])):
            raise AssertionError(
                "_bitmap_pack_side: set rows are not ascending in the "
                "signed int32 view (storage contract violated)")
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        bm.reshape(-1)[w[starts]] = np.bitwise_or.reduceat(bit, starts)
    return bm


def _fanout_pairs(pairs: DataFrame) -> DataFrame:
    """Round-robin the bare-id candidate-pair frame back out to cluster
    parallelism before a CPU-heavy verify: the deduped pair frame is a
    few MB of longs, so AQE coalesces its upstream ENSURE_REQUIREMENTS
    exchange to ONE partition (coalescing is byte-based and blind to
    per-row CPU), and the verify kernel — or a Levenshtein join
    condition — then runs single-task (measured 272 s -> 18 s on the
    edit-distance 5x-replication point).  Must stay ROUND-ROBIN
    ``repartition(N)``: a hash repartition on the pair ids is elided as
    redundant with the dedup's own hashpartitioning, while an explicit
    REPARTITION_BY_NUM survives and is exempt from AQE coalescing."""
    target = pairs.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(target)


def _verify_pairs_from_broadcast(pairs: DataFrame, id_a: str, id_b: str,
                                 bc_a, bc_b, threshold: float,
                                 out_sim: str) -> DataFrame:
    """Exact-Jaccard verification over BARE id pairs: shingle sets come
    from the broadcast flat tables (``_collect_sets_broadcast``), the
    size-ratio prune and the radix-stable merge both run inside the
    kernel.  Bit-identical results to the attach-join path (same merge,
    same prune inequality) with none of its per-pair set shipping —
    including its join semantics: a pair id absent from a broadcast
    table is DROPPED (an inner join would not have produced the row),
    not silently matched to the nearest id."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    from .._core.batch import bitmap_intersect_counts, sorted_intersect_counts

    bc_bm = (_bitmap_pack(pairs.sparkSession, bc_a, bc_b)
             if _USE_BITMAP_VERIFY else None)
    src = _fanout_pairs(pairs.select(id_a, id_b))
    schema = StructType([
        src.schema[id_a], src.schema[id_b],
        StructField(out_sim, DoubleType(), True),
    ])

    def lookup(ids, wanted):
        """searchsorted + membership mask: (index, found) pairs."""
        idx = np.searchsorted(ids, wanted)
        idx = np.minimum(idx, max(len(ids) - 1, 0))
        found = (ids[idx] == wanted) if len(ids) else np.zeros(
            len(wanted), dtype=bool)
        return idx, found

    def verify(batches):
        ids_a, off_a, flat_a = bc_a.value
        ids_b, off_b, flat_b = bc_b.value
        bm_a = bm_b = None
        if bc_bm is not None:
            bm_a, bm_b, _ = bc_bm.value
            if bm_b is None:  # self-join: one shared matrix
                bm_b = bm_a
        for pdf in batches:
            if not len(pdf):
                continue
            ia, fa = lookup(ids_a, pdf[id_a].to_numpy(dtype=np.int64))
            ib, fb = lookup(ids_b, pdf[id_b].to_numpy(dtype=np.int64))
            la = off_a[ia + 1] - off_a[ia]
            lb = off_b[ib + 1] - off_b[ib]
            # exact size-ratio prune: jaccard > t needs
            # min(|A|,|B|) > t*max(|A|,|B|) — zero false negatives;
            # ids missing from the broadcast behave like the join path
            # (the pair simply does not survive)
            ok = (fa & fb
                  & (np.minimum(la, lb) > threshold * np.maximum(la, lb)))
            if not ok.any():
                continue
            ia, ib, la, lb = ia[ok], ib[ok], la[ok], lb[ok]
            n = len(ia)
            if bm_a is not None:
                ni = bitmap_intersect_counts(bm_a, bm_b, ia, ib)
            else:
                rows = np.arange(n, dtype=np.int64)
                ka = (np.repeat(rows, la) << 32) | (
                    _gather_segments(flat_a, off_a, ia, la).astype(np.int64)
                    & 0xFFFFFFFF)
                kb = (np.repeat(rows, lb) << 32) | (
                    _gather_segments(flat_b, off_b, ib, lb).astype(np.int64)
                    & 0xFFFFFFFF)
                ni = sorted_intersect_counts(ka, kb, n)
            union = la + lb - ni
            j = np.where(union > 0, ni / np.maximum(union, 1), 0.0)
            keep = j > threshold
            out = pdf.loc[ok, [id_a, id_b]].iloc[keep].copy()
            out[out_sim] = j[keep]
            yield out

    return src.mapInPandas(verify, schema=schema)


def _verify_pairs(joined: DataFrame, id_a: str, id_b: str, set_a: str,
                  set_b: str, threshold: float, out_sim: str) -> DataFrame:
    """One-pass exact verification: (ids, sets) rows → surviving
    (id_a, id_b, jaccard > threshold) rows."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    src = joined.select(id_a, id_b, set_a, set_b)
    schema = StructType([
        src.schema[id_a], src.schema[id_b],
        StructField(out_sim, DoubleType(), True),
    ])

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            j = _batch_jaccard(list(pdf[set_a]), list(pdf[set_b]))
            keep = j > threshold
            out = pdf.loc[keep, [id_a, id_b]].copy()
            out[out_sim] = j[keep]
            yield out

    return src.mapInPandas(verify, schema=schema)


# verification joins re-attach the ~KB shingle-set payload to every
# surviving candidate pair; broadcasting the (id, set) table keeps the
# pair rows in place and ships each set ONCE per executor instead of once
# per pair (measured at sf0.1: 4.5-6 s vs 6.8-10.7 s shuffle on 5.4M
# pairs).  UDF-derived frames carry no size stats, so pre-AQE Spark can
# never choose this on its own — the gate below estimates the broadcast
# size from the cached sets (one cheap agg that also materializes the
# cache every later stage reuses) and falls back to the shuffle join the
# moment the estimate exceeds the cap, so a billion-doc corpus never
# attempts a full-table broadcast.
_AUTO_BROADCAST_CAP_BYTES = 64 << 20


def _should_broadcast(sets: DataFrame, set_col: str,
                      flag: "bool | None") -> bool:
    """Resolve the size gate ONCE per (cached) sets table.

    ``flag``: True forces broadcast, False forces the shuffle join, None
    (default) estimates bytes as rows × (4·avg|set| + 48) from the cached
    table and broadcasts only under ``_AUTO_BROADCAST_CAP_BYTES``.

    Catalyst's own ``Statistics.sizeInBytes`` is deliberately NOT used
    here: for UDF-derived projections it is propagated from the file-scan
    estimate of the *input* columns (the text), which bears no relation
    to the shingle-set payload actually broadcast — the one cheap agg over
    the already-cached sets is the accurate signal."""
    if flag is not None:
        return flag
    row = sets.agg(F.count(F.lit(1)).alias("n"),
                   F.avg(F.size(set_col)).alias("sz")).first()
    est = row["n"] * (4.0 * (row["sz"] or 0.0) + 48.0)
    return est <= _AUTO_BROADCAST_CAP_BYTES


def _integer_ids(sets: DataFrame, id_alias: str) -> bool:
    """The broadcast-verify kernel gathers sets by id through int64 numpy
    arrays; non-integer id columns (strings, decimals) must take the
    attach-join path, which joins on the Spark type directly."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    return isinstance(sets.schema[id_alias].dataType,
                      (ByteType, ShortType, IntegerType, LongType))


def _maybe_broadcast(sets: DataFrame, set_col: str,
                     flag: "bool | None") -> DataFrame:
    """Broadcast the (id, set) table while it fits the cap; past the cap,
    hint shuffle-hash for the re-attach join — the pairs side is orders of
    magnitude larger than the sets side, so building a hash map on sets
    beats sort-merge's full sort of the pair stream (AQE may still
    override if a partition would not fit)."""
    if _should_broadcast(sets, set_col, flag):
        return F.broadcast(sets)
    return sets.hint("shuffle_hash")


def _with_sets(df: DataFrame, id_col: str, text_col: str, ngram_width: int,
               id_alias: str, set_alias: str,
               shingle: str = "char") -> DataFrame:
    base = df.select(F.col(id_col).alias(id_alias),
                     F.col(text_col).alias("__text"))
    # single-file inputs arrive as one partition; spread the UDF pass over
    # the cluster (no-op direction at real scale: we only ever increase)
    target = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < target:
        base = base.repartition(target)
    if shingle == "word":
        from ..functions.lsh import word_shingle_set_col

        sets = word_shingle_set_col(F.col("__text"), ngram_width)
    elif shingle == "weighted":
        # tf-weighted replication: "word k" occurrence shingles, whose
        # plain Jaccard equals the weighted Jaccard (ngram_width unused)
        from ..functions.lsh import weighted_shingle_set_col

        sets = weighted_shingle_set_col(F.col("__text"))
    elif shingle == "weighted_word":
        # the replication reduction composed with word-n-gram shingles:
        # plain Jaccard equals the weighted n-gram Jaccard
        from ..functions.lsh import weighted_word_shingle_set_col

        sets = weighted_word_shingle_set_col(F.col("__text"), ngram_width)
    elif shingle == "char":
        sets = shingle_set_col(F.col("__text"), ngram_width)
    else:
        # a typo silently falling back to char shingles would return a
        # materially different retention set at the caller's threshold
        raise ValueError(
            f"unknown shingle mode {shingle!r}: expected 'char', 'word', "
            "'weighted' or 'weighted_word'")
    return base.select(id_alias, sets.alias(set_alias))


# measurement flag for the self-join blocks cache (see
# lsh_self_dedup_pairs / lsh_containment_pairs): module-level so an
# interleaved A/B harness can flip it inside one session
_PERSIST_SELF_JOIN_BLOCKS = True


def _band_blocks(sets: DataFrame, id_alias: str, set_alias: str,
                 band_count: int, band_size: int, seed) -> DataFrame:
    """Exploded (id, band_idx, band_hash) blocking keys.

    ``seed`` may be a single int or a sequence of ints — the latter is the
    reference README's seed-rotation recall booster (``README.md:146-148``:
    UNION the band join once per rotated seed).  Rotations are fused into
    the band index (``band_idx + rot*band_count``) instead of a separate
    key column, so the blocking join still shuffles two ints per row and
    combined recall is 1-∏(1-r_i) with zero payload overhead."""
    seeds = (seed,) if isinstance(seed, int) else tuple(seed)
    if len(seeds) == 1:
        bands = minhash_bands_from_set(
            F.col(set_alias), band_count, band_size, seeds[0])
    else:
        # all rotations in ONE Arrow pass; the concatenated layout IS the
        # fused band index (rot * band_count + i), so a single posexplode
        # replaces the per-rotation union
        from ..functions.lsh import minhash_bands_from_set_multi

        bands = minhash_bands_from_set_multi(
            F.col(set_alias), band_count, band_size, seeds)
    # posexplode the UDF EXPRESSION directly, never a withColumn alias:
    # with an attribute child, InferFiltersFromGenerate synthesizes a
    # size(__bands)>0 filter, the alias re-inlines into it, and the band
    # UDF evaluates TWICE per reference (plan-verified: two
    # ArrowEvalPython twins per join side).  A PythonUDF child skips the
    # inference (SPARK-36715), leaving one evaluation — identical rows
    # either way (empty/NULL band arrays generate nothing in both forms).
    return sets.select(
        id_alias, F.posexplode(bands).alias("band_idx", "band_hash"))


def lsh_similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    *,
    left_id: str,
    right_id: str,
    ngram_width: int = 2,
    band_count: int = 4,
    band_size: int = 3,
    seed: int = 123,
    threshold: float = 0.8,
    keep_similarity: bool = True,
    broadcast_sets: "bool | None" = None,
    shingle: str = "char",
) -> DataFrame:
    """Approximate A⨝B similarity join: pairs whose banded MinHash collides
    in ≥1 band AND whose exact Jaccard exceeds ``threshold``.

    ``broadcast_sets=None`` (default) size-gates a broadcast of each
    side's (id, shingle-set) table independently — see ``_maybe_broadcast``.

    ``shingle``: ``"char"`` / ``"word"`` / ``"weighted"`` (same contract
    as ``lsh_self_dedup_pairs`` — with ``"weighted"``, ``threshold`` is
    a weighted Jaccard).

    Returns (left_id, right_id[, jaccard]).
    """
    l_sets = _with_sets(left, left_id, left_text, ngram_width,
                        "__lid", "__lset", shingle=shingle)
    r_sets = _with_sets(right, right_id, right_text, ngram_width,
                        "__rid", "__rset", shingle=shingle)
    track(l_sets.persist(StorageLevel.MEMORY_AND_DISK))
    track(r_sets.persist(StorageLevel.MEMORY_AND_DISK))

    l_blocks = _band_blocks(l_sets, "__lid", "__lset", band_count, band_size, seed)
    r_blocks = _band_blocks(r_sets, "__rid", "__rset", band_count, band_size, seed)

    pairs = (
        l_blocks.join(r_blocks, on=["band_idx", "band_hash"], how="inner")
        .select("__lid", "__rid")
        .dropDuplicates(["__lid", "__rid"])
    )
    if (_integer_ids(l_sets, "__lid") and _integer_ids(r_sets, "__rid")
            and _should_broadcast(l_sets, "__lset", broadcast_sets)
            and _should_broadcast(r_sets, "__rset", broadcast_sets)):
        bc_l = _collect_sets_broadcast(l_sets, "__lid", "__lset")
        bc_r = _collect_sets_broadcast(r_sets, "__rid", "__rset")
        verified = _verify_pairs_from_broadcast(
            pairs, "__lid", "__rid", bc_l, bc_r, threshold, "__jaccard")
    else:
        cand = (
            pairs.join(_maybe_broadcast(l_sets, "__lset", broadcast_sets),
                       on="__lid")
            .join(_maybe_broadcast(r_sets, "__rset", broadcast_sets),
                  on="__rid")
            # exact pruning: jaccard > t requires
            # min(|A|,|B|) > t*max(|A|,|B|) (|A∩B| <= min, |A∪B| >= max) —
            # skips the intersect for pairs the size ratio already rules
            # out, with zero false negatives
            .where(
                F.least(F.size("__lset"), F.size("__rset"))
                > threshold * F.greatest(F.size("__lset"), F.size("__rset")))
        )
        verified = _verify_pairs(cand, "__lid", "__rid", "__lset", "__rset",
                                 threshold, "__jaccard")
    out_l = left_id if left_id != right_id else f"{left_id}_left"
    out_r = right_id if left_id != right_id else f"{right_id}_right"
    cols = [F.col("__lid").alias(out_l), F.col("__rid").alias(out_r)]
    if keep_similarity:
        cols.append(F.col("__jaccard").alias("jaccard"))
    return verified.select(*cols)


def lsh_self_dedup_pairs(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    ngram_width: int = 2,
    band_count: int = 4,
    band_size: int = 3,
    seed: int = 123,
    threshold: float = 0.8,
    broadcast_sets: "bool | None" = None,
    shingle: str = "char",
    return_sets: bool = False,
) -> DataFrame:
    """Near-duplicate pairs within one table (id_a < id_b, no mirrors).

    ``return_sets=True`` returns ``(pairs, sets)`` where ``sets`` is the
    persisted (``__id``, ``__set``) shingle-set frame the miner built —
    lets a caller (the calibration estimator) reuse the cached sets
    instead of re-shingling the same corpus.

    ``broadcast_sets`` controls the verification joins' build side: None
    (default) size-gates a broadcast of the (id, shingle-set) table —
    broadcast only while the estimated payload fits the cap, shuffle by
    pair ids beyond it (the 100 TB path) — see ``_maybe_broadcast``.

    ``shingle``: ``"char"`` (char n-grams), ``"word"`` (word n-grams —
    ``ngram_width`` counts words), or ``"weighted"`` (tf-weighted
    replicated occurrence shingles — ``threshold`` is then a WEIGHTED
    Jaccard Σmin(tf)/Σmax(tf); ``ngram_width`` unused).

    Returns (id_a, id_b, jaccard)."""
    sets = _with_sets(df, id_col, text_col, ngram_width, "__id", "__set",
                      shingle=shingle)
    track(sets.persist(StorageLevel.MEMORY_AND_DISK))
    broadcast_sets = (_integer_ids(sets, "__id")
                      and _should_broadcast(sets, "__set", broadcast_sets))
    blocks = _band_blocks(sets, "__id", "__set", band_count, band_size, seed)
    if _PERSIST_SELF_JOIN_BLOCKS:
        # the self-join references the blocks frame TWICE (sides a and b),
        # so the banding kernel otherwise evaluates once per side; caching
        # the exploded (id, band_idx, band_hash) frame (~20 B/row — the
        # same order as the already-persisted sets) halves the per-seed
        # minima fold, the dominant Python cost of the blocking stage
        track(blocks.persist(StorageLevel.MEMORY_AND_DISK))

    a = blocks.select(F.col("__id").alias("id_a"), "band_idx", "band_hash")
    b = blocks.select(F.col("__id").alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"], how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if broadcast_sets:
        # under the cap: ship the sets ONCE to each worker and verify
        # bare id pairs in the kernel (prune + merge inside) — no attach
        # joins, no per-pair set payload through Arrow
        bc = _collect_sets_broadcast(sets, "__id", "__set")
        verified = _verify_pairs_from_broadcast(
            pairs, "id_a", "id_b", bc, bc, threshold, "jaccard")
        return (verified, sets) if return_sets else verified
    sets_a = sets.select(F.col("__id").alias("id_a"), F.col("__set").alias("__set_a"))
    sets_b = sets.select(F.col("__id").alias("id_b"), F.col("__set").alias("__set_b"))
    # past the broadcast cap: hash-build on the (smaller) sets side
    # instead of sort-merge sorting the much larger pair stream
    sets_a = sets_a.hint("shuffle_hash")
    sets_b = sets_b.hint("shuffle_hash")
    cand = (
        pairs.join(sets_a, on="id_a")
        .join(sets_b, on="id_b")
        # exact size-ratio pruning (see lsh_similarity_join)
        .where(
            F.least(F.size("__set_a"), F.size("__set_b"))
            > threshold * F.greatest(F.size("__set_a"), F.size("__set_b")))
    )
    verified = _verify_pairs(cand, "id_a", "id_b", "__set_a", "__set_b",
                             threshold, "jaccard")
    return (verified, sets) if return_sets else verified


def lsh_containment_pairs(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    ngram_width: int = 3,
    band_count: int = 6,
    band_size: int = 6,
    seed: int = 123,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric shingle-containment pairs — the doc-in-doc signal
    Jaccard misses (a short quote fully inside a long document has high
    containment but low Jaccard): LSH band candidates verified by
    ``cont_a_in_b = |A∩B|/|A|`` and ``cont_b_in_a = |A∩B|/|B|``, keeping
    pairs where ``greatest(cont_a_in_b, cont_b_in_a) > threshold``
    (strict).  Returns (id_a, id_b, cont_a_in_b, cont_b_in_a), 6dp.

    Honest recall caveat, documented for 100 TB use: the minhash bands
    approximate JACCARD, so a tiny doc inside a huge one (high
    containment, low Jaccard) can miss the blocking stage — containment
    recall improves with looser banding, and exhaustive containment
    needs a dedicated (e.g. prefix-hash) index.  No size-ratio prune
    exists for containment (min-side containment can be 1.0 at ANY size
    ratio), so the verify runs on every band candidate — ids only
    through the blocking join, sets re-attach by id (the contract).
    Rounding runs in-plan (``F.round`` = half-up = DuckDB round); the
    kernel emits raw IEEE divisions."""
    sets = _with_sets(df, id_col, text_col, ngram_width, "__id", "__set")
    track(sets.persist(StorageLevel.MEMORY_AND_DISK))
    blocks = _band_blocks(sets, "__id", "__set", band_count, band_size, seed)
    if _PERSIST_SELF_JOIN_BLOCKS:
        # same double-reference as lsh_self_dedup_pairs: cache the blocks
        # frame so the banding kernel runs once, not once per join side
        track(blocks.persist(StorageLevel.MEMORY_AND_DISK))
    a = blocks.select(F.col("__id").alias("id_a"), "band_idx", "band_hash")
    b = blocks.select(F.col("__id").alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"], how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if _integer_ids(sets, "__id") and _should_broadcast(
            sets, "__set", None):
        # under the cap: bare id pairs through Arrow, sets gathered by
        # id inside the kernel from the tracked broadcast (the
        # pair-verification contract; no size prune exists for
        # containment, so every candidate is merged)
        bc = _collect_sets_broadcast(sets, "__id", "__set")
        raw = _containment_from_broadcast(pairs, bc)
    else:
        sets_a = sets.select(F.col("__id").alias("id_a"),
                             F.col("__set").alias("__set_a"))
        sets_b = sets.select(F.col("__id").alias("id_b"),
                             F.col("__set").alias("__set_b"))
        joined = (pairs.join(sets_a.hint("shuffle_hash"), on="id_a")
                  .join(sets_b.hint("shuffle_hash"), on="id_b"))
        raw = _containment_from_attached(joined)
    return (
        raw.select(
            "id_a", "id_b",
            F.round("__ca", 6).alias("cont_a_in_b"),
            F.round("__cb", 6).alias("cont_b_in_a"),
        )
        .where(F.greatest("cont_a_in_b", "cont_b_in_a")
               > F.lit(float(threshold)))
    )


def _containment_schema(src):
    from pyspark.sql.types import DoubleType, StructField, StructType

    return StructType([
        src.schema["id_a"], src.schema["id_b"],
        StructField("__ca", DoubleType(), True),
        StructField("__cb", DoubleType(), True),
    ])


def _containment_from_attached(joined: DataFrame) -> DataFrame:
    """(ids, sets) rows → raw (id_a, id_b, __ca, __cb) — the
    past-the-cap shuffle path."""
    src = joined.select("id_a", "id_b", "__set_a", "__set_b")

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ca, cb = _batch_containment(
                list(pdf["__set_a"]), list(pdf["__set_b"]))
            out = pdf[["id_a", "id_b"]].copy()
            out["__ca"] = ca
            out["__cb"] = cb
            yield out

    return src.mapInPandas(
        verify, schema=_containment_schema(src.select("id_a", "id_b")))


def _containment_from_broadcast(pairs: DataFrame, bc) -> DataFrame:
    """Bare id pairs → raw containments, sets gathered by id from the
    flat broadcast (same storage contract and lookup semantics as
    ``_verify_pairs_from_broadcast``: an id absent from the broadcast
    drops the pair, mirroring the inner attach-join)."""
    import numpy as np

    from .._core.batch import bitmap_intersect_counts, sorted_intersect_counts

    bc_bm = (_bitmap_pack(pairs.sparkSession, bc, bc)
             if _USE_BITMAP_VERIFY else None)
    src = _fanout_pairs(pairs.select("id_a", "id_b"))
    schema = _containment_schema(src)

    def lookup(ids, wanted):
        idx = np.searchsorted(ids, wanted)
        idx = np.minimum(idx, max(len(ids) - 1, 0))
        found = (ids[idx] == wanted) if len(ids) else np.zeros(
            len(wanted), dtype=bool)
        return idx, found

    def verify(batches):
        ids, off, flat = bc.value
        bm = None
        if bc_bm is not None:
            bm, _, _ = bc_bm.value  # self table: one shared matrix
        for pdf in batches:
            if not len(pdf):
                continue
            ia, fa = lookup(ids, pdf["id_a"].to_numpy(dtype=np.int64))
            ib, fb = lookup(ids, pdf["id_b"].to_numpy(dtype=np.int64))
            ok = fa & fb
            if not ok.any():
                continue
            ia, ib = ia[ok], ib[ok]
            la = off[ia + 1] - off[ia]
            lb = off[ib + 1] - off[ib]
            n = len(ia)
            if bm is not None:
                ni = bitmap_intersect_counts(bm, bm, ia, ib)
            else:
                rows = np.arange(n, dtype=np.int64)
                ka = (np.repeat(rows, la) << 32) | (
                    _gather_segments(flat, off, ia, la).astype(np.int64)
                    & 0xFFFFFFFF)
                kb = (np.repeat(rows, lb) << 32) | (
                    _gather_segments(flat, off, ib, lb).astype(np.int64)
                    & 0xFFFFFFFF)
                ni = sorted_intersect_counts(ka, kb, n)
            out = pdf.loc[ok, ["id_a", "id_b"]].copy()
            out["__ca"] = np.where(la > 0, ni / np.maximum(la, 1), 0.0)
            out["__cb"] = np.where(lb > 0, ni / np.maximum(lb, 1), 0.0)
            yield out

    return src.mapInPandas(verify, schema=schema)


def lsh_edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    ngram_width: int = 3,
    band_count: int = 2,
    band_size: int = 14,
    seed: int = 123,
    threshold: float = 0.4,
) -> DataFrame:
    """Edit-distance-verified near-duplicate pairs: LSH band-collision
    candidates (the same char-shingle minhash blocking as the Jaccard
    family, typically parameterized TIGHTER — candidate count bounds the
    O(len_a·len_b) Levenshtein verify), then
    ``edit_sim = round(1 − lev/greatest(len_a, len_b), 6) > threshold``
    (strict).  Returns (id_a, id_b, edit_sim), id_a < id_b.

    100 TB shape: the blocking join ships (band_idx, band_hash, id)
    ints only; texts re-attach BY ID to the deduplicated pair list (the
    ids-only contract), so the quadratic-per-bucket band join never
    carries payloads and the expensive verify runs once per unique
    candidate.  Candidate volume BOUNDS the O(len_a·len_b) DP verify —
    parameterize the banding tighter than the Jaccard family's.  An
    exact length-gap prefilter (lev >= |len_a − len_b|, so sim can't
    reach the threshold when the gap alone exceeds (1−t)·maxlen; 1e-6
    slack covers the 6dp round-up) drops hopeless pairs BEFORE the DP —
    output provably unchanged, so the oracle omits it.  Levenshtein
    itself is JVM whole-stage-codegen (``F.levenshtein``) — no Python
    in the hot path.  The DP is CAPPED per row (round-10 verdict item
    3): Spark >=3.5's three-arg ``levenshtein(a, b, bound)`` runs in
    O(len·bound) instead of O(len_a·len_b) and returns −1 past the
    bound; the output filter ``edit_sim > t`` implies
    lev < (1−t+5e-7)·maxlen (the 5e-7 covers the 6dp half-up round),
    so ``bound = floor((1−t+1e-6)·maxlen)`` over-admits and a −1
    (nullif → NULL sim → filtered) is provably below-threshold — output
    bit-identical, oracle unchanged (it already omits the prefilter by
    the same argument).  The deduped bare-id pair frame explicitly
    re-fans to cluster parallelism before the text joins: AQE coalesces
    the few-MB pair exchange to one partition, which would otherwise
    serialize the whole DP stage into a single task."""
    sets = _with_sets(df, id_col, text_col, ngram_width, "__id", "__set")
    track(sets.persist(StorageLevel.MEMORY_AND_DISK))
    blocks = _band_blocks(sets, "__id", "__set", band_count, band_size, seed)
    if _PERSIST_SELF_JOIN_BLOCKS:
        # double-referenced self-join blocks — cache so the banding
        # kernel runs once (see lsh_self_dedup_pairs)
        track(blocks.persist(StorageLevel.MEMORY_AND_DISK))
    a = blocks.select(F.col("__id").alias("id_a"), "band_idx", "band_hash")
    b = blocks.select(F.col("__id").alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"], how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # fan the bare-id pairs back out before the CPU-heavy DP stage (the
    # broadcast text joins inherit the pair frame's layout — see
    # _fanout_pairs for the AQE-coalescing failure mode this prevents)
    pairs = _fanout_pairs(pairs)
    ta = df.select(F.col(id_col).alias("id_a"),
                   F.col(text_col).alias("__ta"))
    tb = df.select(F.col(id_col).alias("id_b"),
                   F.col(text_col).alias("__tb"))
    joined = pairs.join(ta, on="id_a").join(tb, on="id_b")
    gl = F.greatest(F.length("__ta"), F.length("__tb"))
    gap = gl - F.least(F.length("__ta"), F.length("__tb"))
    joined = joined.where(
        gap.cast("double")
        < F.lit(1.0 - float(threshold) + 1e-6) * gl.cast("double"))
    # gl > 0 whenever a candidate exists (shingling needs ngram_width
    # chars); the guard keeps ANSI mode safe on degenerate inputs — CASE
    # twin in the oracle.  __bound >= gap >= 0 on every prefilter
    # survivor, so the capped DP's threshold arg is always valid.
    joined = joined.withColumn(
        "__bound",
        F.floor(F.lit(1.0 - float(threshold) + 1e-6)
                * gl.cast("double")).cast("int"))
    # nullif keeps the DP referenced ONCE in the expression tree (the
    # filter gets pushed into the broadcast join's condition, where a
    # guard + value double-reference would run the DP twice per pair):
    # -1 (past bound) -> NULL -> NULL sim -> filtered.
    lev = F.nullif(
        F.call_function(
            "levenshtein", F.col("__ta"), F.col("__tb"), F.col("__bound")),
        F.lit(-1))
    sim = F.when(
        gl != 0,
        F.round(
            F.lit(1.0) - lev.cast("double") / gl.cast("double"),
            6,
        ),
    )
    return (
        joined.select("id_a", "id_b", sim.alias("edit_sim"))
        .where(F.col("edit_sim") > F.lit(float(threshold)))
    )


def lsh_dedup_keep_first(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    ngram_width: int = 3,
    band_count: int = 8,
    band_size: int = 2,
    seed: int = 123,
    threshold: float = 0.8,
    broadcast_sets: "bool | None" = None,
    shingle: str = "char",
) -> DataFrame:
    """Near-dedup retention set: drop every row that is a near-duplicate of
    a lower-id row (single-linkage via verified pairs, one iteration —
    the standard MinHash-dedup policy for training corpora).

    ``shingle``: ``"char"`` / ``"word"`` / ``"weighted"`` — passed
    through to the pair stage, so e.g. tf-weighted keep-first dedup is
    ``shingle="weighted"`` with a weighted-Jaccard ``threshold``.

    Returns the surviving rows of ``df``."""
    pairs = lsh_self_dedup_pairs(
        df, text_col, id_col=id_col, ngram_width=ngram_width,
        band_count=band_count, band_size=band_size, seed=seed,
        threshold=threshold, broadcast_sets=broadcast_sets,
        shingle=shingle)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, on=id_col, how="left_anti")


def lsh_dedup_keep_longest(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    ngram_width: int = 3,
    band_count: int = 6,
    band_size: int = 6,
    seed: int = 123,
    max_iter: int = 12,
    shingle: str = "char",
) -> DataFrame:
    """Quality-aware cluster retention: every near-dup component keeps
    its LONGEST document (ties on lowest id) — the policy real pipelines
    prefer over keep-first when duplicates differ in completeness (a
    full article vs its truncated syndication copy).  Built on the
    pair-free cluster path, so it scales like ``lsh_dedup_clusters``:
    the winner per component is one ``max(struct(len, -id))``
    hash-aggregate, never a pair join or a window over an unbounded
    partition.

    Returns the kept rows as (id, cluster_id, n_chars)."""
    clusters = lsh_dedup_clusters(
        df, text_col, id_col=id_col, ngram_width=ngram_width,
        band_count=band_count, band_size=band_size, seed=seed,
        max_iter=max_iter, shingle=shingle)
    lens = df.select(F.col(id_col), F.length(text_col).alias("__len"))
    return (
        clusters.join(lens, on=id_col)
        .groupBy("cluster_id")
        .agg(F.max(F.struct(F.col("__len"),
                            (-F.col(id_col)).alias("__nid"))).alias("w"))
        .select(
            (-F.col("w.__nid")).alias(id_col),
            "cluster_id",
            F.col("w.__len").alias("n_chars"),
        )
    )


def lsh_dedup_clusters(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    ngram_width: int = 3,
    band_count: int = 6,
    band_size: int = 6,
    seed: int = 123,
    max_iter: int = 12,
    shingle: str = "char",
) -> DataFrame:
    """Cluster-representative near-dedup WITHOUT pair materialization — the
    100 TB path.  ``shingle``: ``"char"`` / ``"word"`` / ``"weighted"``
    (same contract as ``lsh_self_dedup_pairs``).

    The verified-pairs operators are output-bound: a cluster of m
    near-identical documents contains m²/2 pairs (measured: replicating
    the corpus 20× stalls on within-cluster pairs).  This operator instead
    runs connected components over the doc↔band-bucket bipartite graph by
    alternating min-label propagation:

        bucket_label = min(label of member docs)
        doc_label    = min(bucket_label of its buckets)

    Every iteration is two hash-aggregations bounded by rows × band_count —
    never a pair join.  Convergence in O(cluster diameter) rounds;
    iteration stops early at the fixed point, and ``max_iter`` is a
    safety cap sized ABOVE any diameter seen in practice (measured at
    sf0.1: residual changes 4162 → 569 → 73 → 9 → 2 → 0, i.e. ~7 rounds —
    a cap that bites returns silently-unconverged labels, which would
    split clusters, so the early exit is the intended terminator).

    Semantics: single-linkage over *band-collision* edges (no exact-Jaccard
    verification) — the standard trade for corpus-scale dedup; tune
    ``band_size`` up for precision (see ``operators.banding.tune_bands``).

    Returns (id, cluster_id, is_representative).
    """
    from .cc import min_label_components

    sets = _with_sets(df, id_col, text_col, ngram_width, "__id", "__set",
                      shingle=shingle)
    # materialize the block list once — everything downstream (ids,
    # bucket sizes, edges, every iteration) reuses it without re-running
    # the hashing UDFs.  The iteration itself is the shared pair-free CC
    # core (``operators.cc.min_label_components``, factored verbatim from
    # here in round 6 so the Hamming-block image path runs the identical
    # propagation); the measured rationale comments live with the code.
    blocks = _band_blocks(sets, "__id", "__set", band_count, band_size, seed)
    blocks = track(blocks.persist(StorageLevel.MEMORY_AND_DISK))
    labels = min_label_components(blocks, max_iter=max_iter)
    return labels.select(
        F.col("__id").alias(id_col),
        F.col("__label").alias("cluster_id"),
        (F.col("__id") == F.col("__label")).alias("is_representative"),
    )


def lsh_index_stats(spark, table_name: str) -> DataFrame:
    """Per-band bucket statistics of a persisted LSH index (LIVE rows —
    merge-on-read tombstones anti-joined exactly as probes do):
    (band_idx, n_buckets, n_rows, max_bucket, n_singletons).  Bucket
    skew is the probe-cost signal; a ballooning max bucket says retune
    banding or compact."""
    m = _meta(spark, table_name)
    bands = spark.table(_phys(table_name, "bands", m))
    if spark.catalog.tableExists(f"{table_name}_deletes"):
        bands = bands.join(
            F.broadcast(spark.table(f"{table_name}_deletes")),
            on="__rid", how="left_anti")
    buckets = bands.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("__sz"))
    return (
        buckets.groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("__sz").alias("n_rows"),
            F.max("__sz").alias("max_bucket"),
            F.sum(F.when(F.col("__sz") == 1, 1).otherwise(0))
            .alias("n_singletons"),
        )
        .select(F.col("band_idx").cast("int").alias("band_idx"),
                "n_buckets", "n_rows", "max_bucket", "n_singletons")
    )


def build_lsh_corpus_index(
    corpus: DataFrame,
    table_name: str,
    *,
    text_col: str,
    id_col: str,
    ngram_width: int = 3,
    band_count: int = 8,
    band_size: int = 2,
    seed: int = 123,
    num_buckets: int = 32,
    shingle: str = "char",
) -> None:
    """Persist a corpus's LSH index for repeated probing — the amortized
    deployment shape for streaming/incremental near-dup: shingle sets and
    band hashes are computed ONCE and written as two bucketed tables
    (``<name>_bands`` bucketed by the blocking key, ``<name>_sets``
    bucketed by id for verification re-attach), plus a ``<name>_meta``
    row pinning the parameters so probes can't drift from the index.

    Every subsequent ``lsh_similarity_join_indexed`` then shuffles only
    the (small) probe side: the band join reads matching buckets of
    ``_bands`` and the set re-attach reads matching buckets of ``_sets``
    with no corpus-side exchange.  (``seed`` is a single int here — build
    one index per rotation for the seed-rotation recall pattern.)"""
    from ..sources.formats import drop_versioned_siblings, write_bucketed_table

    spark = corpus.sparkSession
    # a rebuild starts the generation history over at 0: sweep any
    # compaction generations (<name>_bands_v{N}) the old pointer left
    # behind, or the base-name overwrite below would strand them
    drop_versioned_siblings(spark, f"{table_name}_bands", 0)
    drop_versioned_siblings(spark, f"{table_name}_sets", 0)
    sets = _with_sets(corpus, id_col, text_col, ngram_width,
                      "__rid", "__rset", shingle=shingle)
    track(sets.persist(StorageLevel.MEMORY_AND_DISK))
    blocks = _band_blocks(sets, "__rid", "__rset", band_count, band_size, seed)
    write_bucketed_table(blocks, f"{table_name}_bands",
                         bucket_by=["band_idx", "band_hash"],
                         num_buckets=num_buckets)
    write_bucketed_table(sets, f"{table_name}_sets", bucket_by=["__rid"],
                         num_buckets=num_buckets)
    # literal-projection over range(1), NOT createDataFrame: a
    # python-local relation pays the Python-runner serialization path on
    # every write (measured 5 s per one-row write vs 0.2 s for this form)
    meta = corpus.sparkSession.range(1).select(
        F.lit(text_col).alias("text_col"),
        F.lit(id_col).alias("id_col"),
        F.lit(ngram_width).cast("int").alias("ngram_width"),
        F.lit(band_count).cast("int").alias("band_count"),
        F.lit(band_size).cast("int").alias("band_size"),
        F.lit(seed).cast("int").alias("seed"),
        # the shingle mode is an index-defining parameter like the
        # banding: probes/extends read it from here so a weighted index
        # can never silently be probed with char shingles
        F.lit(shingle).alias("shingle"),
        # the bucket spec rides with the data so attach_lsh_corpus_index
        # can re-register the tables in a later session without guessing
        F.lit(num_buckets).cast("int").alias("num_buckets"),
        # generation pointer (sources/formats.py::versioned_name): a
        # fresh build is generation 0 at the bare table names; each
        # compaction appends a meta row pointing at <name>_*_v{N}
        F.lit(0).cast("int").alias("version"),
    )
    from ..sources.formats import save_table

    save_table(meta, f"{table_name}_meta", single_file=True)
    # a full build physically removes everything previously tombstoned —
    # the merge-on-read contract (see delete_from_lsh_index).  The clear
    # must be FILE-level: a catalog-only DROP leaves the on-disk deletes
    # directory for a later attach to resurrect as stale tombstones.
    from ..sources.formats import drop_table_and_files

    drop_table_and_files(corpus.sparkSession, f"{table_name}_deletes")


def delete_from_lsh_index(ids: DataFrame, table_name: str,
                          id_col: "str | None" = None) -> None:
    """Tombstone deletion for a persisted LSH index — the merge-on-read
    shape: deleted corpus ids append to a tiny ``<name>_deletes`` table
    and every probe anti-joins it (broadcast — deletion sets are small
    next to the corpus), so a delete is O(delta) instead of rewriting
    the bucketed index.  Physical removal happens at the next full
    ``build_lsh_corpus_index``, which clears the tombstones.

    Note: a tombstoned id stays deleted even if later re-appended via
    ``extend_lsh_corpus_index`` — rebuild to resurrect an id.

    ``id_col`` defaults to the indexed corpus id column (meta row)."""
    from ..sources.formats import save_table

    spark = ids.sparkSession
    if id_col is None:
        id_col = _meta(spark, table_name).id_col
    rows = ids.select(F.col(id_col).alias("__rid")).distinct()
    # save_table(mode="append") covers both branches: it creates the
    # table when absent and appends when the catalog knows it.  Fail
    # CLOSED on the in-between: tombstones surviving on disk from an
    # earlier session with no catalog entry would be rmtree'd by the
    # stale-orphan clear — silently resurrecting earlier deletions —
    # so auto-attach them first and the append merges instead
    _adopt_orphan_tombstones(spark, table_name)
    save_table(rows, f"{table_name}_deletes", mode="append",
               single_file=True)


def _adopt_orphan_tombstones(spark, table_name: str) -> None:
    """Register a ``<name>_deletes`` directory that survives in the
    warehouse from an earlier session but has no catalog entry, so an
    append MERGES with the surviving tombstones instead of the
    stale-orphan clear deleting them (silent loss of earlier deletions
    — ADVICE r5).  ``attach_*`` does this too; this covers callers who
    delete without attaching first."""
    import os

    from ..sources.formats import _warehouse_path, attach_table

    name = f"{table_name}_deletes"
    if spark.catalog.tableExists(name):
        return
    loc = os.path.join(_warehouse_path(spark), name.lower())
    if os.path.isdir(loc):
        attach_table(spark, name, loc)


def _meta_shingle(m) -> str:
    """The index's pinned shingle mode; pre-round-5 meta rows lack the
    column and were always char — keep the back-compat fallback in ONE
    place so no index consumer can forget it."""
    return m.shingle if "shingle" in m.__fields__ else "char"


def _meta(spark, table_name: str):
    """Current meta row (generation pointer resolved — see
    ``formats.index_meta``)."""
    from ..sources.formats import index_meta

    return index_meta(spark, f"{table_name}_meta")


def _phys(table_name: str, suffix: str, m) -> str:
    """Physical table name of logical ``<table_name>_<suffix>`` at the
    generation the meta row points to."""
    from ..sources.formats import meta_version, versioned_name

    return versioned_name(f"{table_name}_{suffix}", meta_version(m))


def _without_deleted(spark, table_name: str, pairs: DataFrame,
                     rid: str = "__rid") -> DataFrame:
    """Drop candidate pairs whose corpus id is tombstoned (no-op when
    the index has no deletes table)."""
    if not spark.catalog.tableExists(f"{table_name}_deletes"):
        return pairs
    return pairs.join(
        F.broadcast(spark.table(f"{table_name}_deletes")
                    .withColumnRenamed("__rid", rid)),
        on=rid, how="left_anti")


def compact_lsh_index(spark, table_name: str, *,
                      keep_previous: bool = False) -> None:
    """Maintenance pass after many ``extend_lsh_corpus_index`` appends
    and ``delete_from_lsh_index`` tombstones: rewrite ``_bands``/
    ``_sets`` into one file-set per bucket (each append added one — a
    daily-extended index grows a file per bucket per day and probes pay
    the per-file open cost) with every tombstoned id FOLDED OUT, then
    truncate ``_deletes`` — so a long-lived index's probes stop paying
    a monotonically growing anti-join and deleted payloads are
    physically reclaimed without a full rebuild.  Probe results are
    unchanged; the bucket spec survives.

    The generation swap is probe-safe: the compacted tables are written
    as NEW physical tables (``<name>_bands_v{N+1}`` — never touching
    the generation probes are reading) and published by appending one
    meta row with the bumped ``version`` pointer; a probe resolving the
    index mid-compaction sees either generation, each fully on disk.
    With ``keep_previous=True`` the old generation's files (and the
    folded ``_deletes`` rows, which its readers still need) are LEFT on
    disk for in-flight plans that already resolved them — the next
    compaction sweeps them; the default reclaims them immediately
    (drop-in for single-writer maintenance).

    Works on warehouse-resident indexes whether built this session
    (managed) or re-registered by ``attach_lsh_corpus_index`` (external
    at the warehouse default); an index attached at a CUSTOM
    ``location_root`` is refused — the compacted generation always
    lands in the session warehouse, which would split the index across
    directories."""
    from ..sources.formats import (
        drop_table_and_files,
        drop_versioned_siblings,
        generation_in_warehouse,
        index_meta,
        meta_version,
        save_table,
        versioned_name,
        write_bucketed_table,
    )

    m = index_meta(spark, f"{table_name}_meta")
    cur = meta_version(m)
    nxt = cur + 1
    for suffix in ("bands", "sets"):
        phys = versioned_name(f"{table_name}_{suffix}", cur)
        if not generation_in_warehouse(spark, phys):
            raise ValueError(
                f"refusing to compact {table_name}: {phys} is attached "
                "at a custom location, and the compacted generation "
                "always lands in the session warehouse — the index "
                "would end up split across directories; copy it into "
                "the warehouse (the attach default) or rebuild first")
    deletes = None
    if spark.catalog.tableExists(f"{table_name}_deletes"):
        deletes = spark.table(f"{table_name}_deletes")
    for suffix, bucket_by in (("bands", ["band_idx", "band_hash"]),
                              ("sets", ["__rid"])):
        base = f"{table_name}_{suffix}"
        # sweep crashed-compaction debris: a half-written target or an
        # un-dropped previous generation both differ from the pointer
        drop_versioned_siblings(spark, base, cur)
        src = spark.table(versioned_name(base, cur))
        if deletes is not None:
            src = src.join(F.broadcast(deletes), on="__rid", how="left_anti")
        write_bucketed_table(src, versioned_name(base, nxt),
                             bucket_by=bucket_by,
                             num_buckets=m.num_buckets)
    if "version" not in spark.table(f"{table_name}_meta").columns:
        # pre-versioning index: one-time meta migration (add the pointer
        # column at generation cur) before the append-only flip below
        migrated = spark.table(f"{table_name}_meta").withColumn(
            "version", F.lit(cur).cast("int"))
        save_table(migrated.localCheckpoint(eager=True),
                   f"{table_name}_meta", single_file=True)
    flipped = spark.range(1).select(
        *[F.lit(m[c]).alias(c) for c in spark.table(
            f"{table_name}_meta").columns if c != "version"],
        F.lit(nxt).cast("int").alias("version"))
    save_table(flipped, f"{table_name}_meta", mode="append",
               single_file=True)
    if not keep_previous:
        for suffix in ("bands", "sets"):
            drop_table_and_files(
                spark, versioned_name(f"{table_name}_{suffix}", cur))
        if deletes is not None:
            # folded into generation nxt — stale for its readers; kept
            # under keep_previous because generation cur still needs it
            drop_table_and_files(spark, f"{table_name}_deletes")


def attach_lsh_corpus_index(spark, table_name: str,
                            location_root: str | None = None) -> None:
    """Re-register a ``build_lsh_corpus_index`` written by an EARLIER
    session: the default catalog is in-memory, so the bucketed tables'
    files survive in the warehouse but the new session cannot see them —
    exactly the amortization the index exists for.  Reads the bucket spec
    from the persisted meta row and re-creates all three tables as
    external tables over their existing files (bucket metadata included,
    so probes keep their exchange-free corpus side).

    ``location_root``: directory containing the ``<table_name>_bands`` /
    ``_sets`` / ``_meta`` directories (defaults to the session warehouse).
    No-op for tables the catalog already knows."""
    import os

    from ..sources.formats import (
        attach_bucketed_table,
        attach_table,
        _warehouse_path,
    )

    root = location_root or _warehouse_path(spark)

    def loc(name: str) -> str:
        return os.path.join(root, name.lower())

    attach_table(spark, f"{table_name}_meta", loc(f"{table_name}_meta"))
    m = _meta(spark, table_name)
    bands, sets_ = _phys(table_name, "bands", m), _phys(table_name, "sets", m)
    attach_bucketed_table(spark, bands,
                          bucket_by=["band_idx", "band_hash"],
                          num_buckets=m.num_buckets, location=loc(bands))
    attach_bucketed_table(spark, sets_, bucket_by=["__rid"],
                          num_buckets=m.num_buckets, location=loc(sets_))
    # tombstones ride along when present (see delete_from_lsh_index)
    if os.path.isdir(loc(f"{table_name}_deletes")):
        attach_table(spark, f"{table_name}_deletes",
                     loc(f"{table_name}_deletes"))


def lsh_similarity_join_indexed(
    spark,
    table_name: str,
    probe: DataFrame,
    probe_text: str,
    *,
    probe_id: str,
    threshold: float,
    keep_similarity: bool = True,
    broadcast_probe_sets: "bool | None" = None,
) -> DataFrame:
    """Probe a persisted ``build_lsh_corpus_index`` without touching the
    raw corpus: banding parameters come from the index's meta row, the
    band join and the corpus-set re-attach read bucketed tables (no
    corpus-side exchange), and only the probe's sets/bands are computed
    fresh.  Same semantics and output shape as ``lsh_similarity_join``
    with matching parameters.

    Returns (probe_id, <corpus id_col>[, jaccard])."""
    m = _meta(spark, table_name)
    l_sets = _with_sets(probe, probe_id, probe_text, m.ngram_width,
                        "__lid", "__lset", shingle=_meta_shingle(m))
    track(l_sets.persist(StorageLevel.MEMORY_AND_DISK))
    l_blocks = _band_blocks(l_sets, "__lid", "__lset",
                            m.band_count, m.band_size, m.seed)
    # both bucketed-table joins hint shuffle_hash: the bucketed scan
    # already delivers the corpus side partitioned on the join key (no
    # exchange), and hash-building on it skips sort-merge's sort of BOTH
    # streams — the probe block/pair stream is orders of magnitude larger
    # than any one corpus bucket, and sorting it was pure overhead
    # (measured at sf0.1: 1.17M candidate pairs for a 2.5k-row set table)
    pairs = (
        l_blocks.join(
            spark.table(_phys(table_name, "bands", m)).hint("shuffle_hash"),
            on=["band_idx", "band_hash"], how="inner")
        .select("__lid", "__rid")
        .dropDuplicates(["__lid", "__rid"])
    )
    pairs = _without_deleted(spark, table_name, pairs)
    sets_tbl = spark.table(_phys(table_name, "sets", m))
    # verify under the broadcast cap exactly like the non-indexed joins
    # (the bare-id-pairs contract): ship probe + corpus sets ONCE to the
    # workers and verify (id_a, id_b) rows in the kernel — the attach
    # joins otherwise push two ~KB set payloads per candidate pair
    # through the verify fanout exchange (profiled 297 MB shuffled for a
    # 12 MB pair stream on the sf0.1 A/B gate).  Size-gated per side:
    # past the cap — the 100 TB corpus — the bucketed attach joins below
    # remain the scale path.  broadcast_probe_sets=False forces them
    # (the plan-pin contract).
    if (_integer_ids(l_sets, "__lid")
            and _should_broadcast(l_sets, "__lset", broadcast_probe_sets)
            and _should_broadcast(sets_tbl, "__rset",
                                  broadcast_probe_sets)):
        bc_l = _collect_sets_broadcast(l_sets, "__lid", "__lset")
        bc_r = _collect_sets_broadcast(sets_tbl, "__rid", "__rset")
        verified = _verify_pairs_from_broadcast(
            pairs, "__lid", "__rid", bc_l, bc_r, threshold, "__jaccard")
    else:
        cand = (
            pairs.join(
                _maybe_broadcast(l_sets, "__lset", broadcast_probe_sets),
                on="__lid")
            .join(sets_tbl.hint("shuffle_hash"), on="__rid")
            .where(
                F.least(F.size("__lset"), F.size("__rset"))
                > threshold * F.greatest(F.size("__lset"), F.size("__rset")))
        )
        verified = _verify_pairs(cand, "__lid", "__rid", "__lset",
                                 "__rset", threshold, "__jaccard")
    out_l = probe_id if probe_id != m.id_col else f"{probe_id}_left"
    out_r = m.id_col if probe_id != m.id_col else f"{m.id_col}_right"
    cols = [F.col("__lid").alias(out_l), F.col("__rid").alias(out_r)]
    if keep_similarity:
        cols.append(F.col("__jaccard").alias("jaccard"))
    return verified.select(*cols)


def extend_lsh_corpus_index(
    corpus_delta: DataFrame,
    table_name: str,
) -> None:
    """Incrementally grow a persisted ``build_lsh_corpus_index`` with new
    documents: shingle/band ONLY the delta (using the banding parameters
    pinned in the index's meta row — drift is impossible) and APPEND to
    the bucketed ``_bands``/``_sets`` tables.  Spark honors the existing
    bucket spec on append, so probes keep their exchange-free corpus side
    (pinned by tests).

    This is the daily-ingest shape at scale: the corpus-wide shuffle
    happened once at build time; each increment shuffles only the delta.

    Caller contract: delta ids must be NEW (not already indexed) — id
    dedup against the index is a full ``_sets`` scan, exactly the cost
    this operator exists to avoid; dedup the delta upstream (e.g. with
    ``lsh_dedup_keep_first``) if ids can repeat."""
    from ..sources.formats import write_bucketed_table

    spark = corpus_delta.sparkSession
    m = _meta(spark, table_name)
    sets = _with_sets(corpus_delta, m.id_col, m.text_col, m.ngram_width,
                      "__rid", "__rset", shingle=_meta_shingle(m))
    track(sets.persist(StorageLevel.MEMORY_AND_DISK))
    blocks = _band_blocks(sets, "__rid", "__rset",
                          m.band_count, m.band_size, m.seed)
    write_bucketed_table(blocks, _phys(table_name, "bands", m),
                         bucket_by=["band_idx", "band_hash"],
                         num_buckets=m.num_buckets, mode="append")
    write_bucketed_table(sets, _phys(table_name, "sets", m),
                         bucket_by=["__rid"],
                         num_buckets=m.num_buckets, mode="append")


def dedup_new_against_index(
    spark,
    table_name: str,
    new_docs: DataFrame,
    text_col: str,
    *,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """The incremental-crawl dedup flow: drop every NEW document that is
    a verified near-duplicate of ANYTHING in a persisted
    ``build_lsh_corpus_index`` corpus — the reference corpus is never
    re-shingled, re-banded, or re-shuffled (the
    ``lsh_similarity_join_indexed`` probe contract: new-batch bands
    probe the bucketed index tables, tombstones excluded), and the
    surviving batch keeps its full original columns via one anti-join
    on id.  At 100 TB this is how a refresh lands: probe cost scales
    with the BATCH, not the corpus."""
    matches = lsh_similarity_join_indexed(
        spark, table_name, new_docs, text_col, probe_id=id_col,
        threshold=threshold, keep_similarity=False)
    # the probe join disambiguates a probe id that collides with the
    # index's id_col as <id>_left (its output-naming contract)
    probe_out = id_col if id_col in matches.columns else f"{id_col}_left"
    return new_docs.join(
        matches.select(F.col(probe_out).alias(id_col)).distinct(),
        on=id_col, how="left_anti")


def minhash_estimate_for_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    id_a_col: str = "id_a",
    id_b_col: str = "id_b",
    ngram_width: int = 3,
    band_count: int = 4,
    band_size: int = 3,
    seed: int = 123,
    max_docs: int | None = 1_000_000,
    sample_salt: str = "calib-v1",
    sets: "DataFrame | None" = None,
) -> DataFrame:
    """Append the CLASSIC per-seed MinHash estimate to a verified-pair
    frame: ``est_sim = (#matching per-seed minima) / n_seeds`` — the
    estimator whose expectation is the true Jaccard, measured here
    against the exact value the pair already carries (the
    "measure the sketch" diagnostic behind the banding tuner).

    Kernel contract (the broadcast-verify discipline): the signature
    MATRIX (doc-id-sorted, n_docs × n_seeds int64, the two's-complement
    reinterpretation of the u64 minima) broadcasts once; pairs cross
    the Arrow boundary as (id_a, id_b, jaccard) rows; the kernel emits
    the RAW IEEE division (row-sum of equal positions / n_seeds) and
    rounding happens in-plan (the containment template).  Pairs whose
    id is absent from the matrix are dropped, matching join
    semantics.

    100 TB note — this is a SAMPLED diagnostic by design: the matrix
    broadcast carries n_docs · n_seeds · 8 bytes, fine to ~10⁷ docs
    and deliberately NOT built for the full production corpus.
    Estimator calibration is a statistical measurement — the
    confidence interval shrinks with sampled pairs, not corpus size —
    so ``max_docs`` ENFORCES the contract by default: when ``docs``
    exceeds it, a deterministic md5-bucket sample (the
    ``split_bucket_expr`` machinery — reproducible across runs,
    engines, and partitionings) caps the matrix before anything is
    collected.  Absent ids drop their pairs, so every surviving
    estimate is bit-identical to the full-corpus run (pytest-pinned).
    ``max_docs=None`` is the explicit full-corpus opt-in the exact
    gate oracle uses."""
    import math

    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    from ..functions.lsh import lsh_min_minima_long
    from ..plans.cache import track_broadcast

    if sets is not None and max_docs is not None:
        # the sets frame excludes NULL-text docs, so a count over it
        # would shift the sampling threshold away from the pinned
        # text-path semantics — a caller handing over cached sets owns
        # the corpus framing and must opt out of sampling explicitly
        raise ValueError(
            "minhash_estimate_for_pairs: pass max_docs=None when "
            "supplying a precomputed sets frame")
    if max_docs is not None:
        n_docs = docs.select(id_col).count()
        if n_docs > max_docs:
            from .training_ops import split_bucket_expr

            buckets = 1 << 20
            keep = int(math.ceil(max_docs / n_docs * buckets))
            docs = docs.where(
                split_bucket_expr(F.col(id_col), salt=sample_salt,
                                  buckets=buckets) < keep)

    # spread the signature pass before the (band_count·band_size)-seed
    # minima UDF: a single-file corpus arrives as ONE scan task and the
    # whole matrix otherwise computes serially inside the toPandas
    # collect (profiled 2.5 s single-task at sf0.1).  Values are
    # per-row deterministic and the kernel sorts by id below, so the
    # repartition is bit-neutral.
    from ..sources.io import fanout_scan

    if sets is not None:
        # reuse a miner's cached (__id, __set) frame: per-seed minima
        # over the unique window-hash SET are bit-equal to minima over
        # the text's window multiset (duplicates cannot change a min),
        # so the corpus is never re-shingled — and the cached frame is
        # already fanned out (pytest-pinned bit-equality vs the text
        # path, incl. NULL/empty-text rows)
        from ..functions.lsh import lsh_min_minima_long_from_set

        sigs = sets.select(
            F.col("__id"),
            lsh_min_minima_long_from_set(
                F.col("__set"), band_count, band_size, seed)
            .alias("__sig"))
    else:
        sigs = fanout_scan(
            docs.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col).alias("__id"),
            lsh_min_minima_long(F.col(text_col), ngram_width, band_count,
                                band_size, seed).alias("__sig"))
    pdf = sigs.toPandas()
    pdf = pdf[pdf["__sig"].notna()]  # NULL text → NULL sig → id dropped
    ids = pdf["__id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    mat = (np.stack(pdf["__sig"].to_numpy()[order]).astype(np.int64)
           if len(pdf) else np.empty((0, band_count * band_size),
                                     dtype=np.int64))
    bc = track_broadcast(
        docs.sparkSession.sparkContext.broadcast((ids[order], mat)))

    cols = [f.name for f in pairs.schema.fields]
    missing = [c for c in (id_a_col, id_b_col) if c not in cols]
    if missing:
        raise ValueError(
            f"pairs frame is missing id column(s) {missing}; have {cols} "
            f"— pass id_a_col/id_b_col naming the pair's id columns")
    src = _fanout_pairs(pairs)
    schema = StructType(list(pairs.schema.fields)
                        + [StructField("est_sim", DoubleType(), True)])
    ida, idb = id_a_col, id_b_col

    def gen(batches):
        sids, M = bc.value
        for b in batches:
            if not len(b):
                continue
            wa = b[ida].to_numpy(dtype=np.int64)
            wb = b[idb].to_numpy(dtype=np.int64)
            ia = np.searchsorted(sids, wa)
            ib = np.searchsorted(sids, wb)
            ia = np.minimum(ia, max(len(sids) - 1, 0))
            ib = np.minimum(ib, max(len(sids) - 1, 0))
            ok = ((sids[ia] == wa) & (sids[ib] == wb)) if len(sids) \
                else np.zeros(len(wa), dtype=bool)
            out = b.iloc[ok.nonzero()[0]].copy()
            # row-sum of equal positions / n_seeds: ONE IEEE division
            out["est_sim"] = (M[ia[ok]] == M[ib[ok]]).mean(axis=1)
            yield out

    return src.mapInPandas(gen, schema)
