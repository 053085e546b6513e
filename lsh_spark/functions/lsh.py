"""The five reference LSH functions as Arrow-vectorized pandas UDF factories.

Reference surface (``src/lib.rs:41-52``): ``lsh_min``, ``lsh_min32``,
``lsh_jaccard``, ``lsh_euclidean``, ``lsh_euclidean32``.  Each factory here
closes over the tuning parameters as Python literals — the compile-time
analog of the reference's per-chunk constant-param rule
(``src/lib.rs:29-38``; SURVEY.md §2.3) — and returns a ``Column`` usable in
any DataFrame expression.  ``register_all`` exposes SQL names (see
``register.py``).

Type mapping (SURVEY.md §1.2):
  * u64 hash lists → ``ArrayType(DecimalType(20,0))`` — preserves the
    printed decimal value of the reference's UBIGINT output (u64 values
    exceed int64).
  * u32 hash lists → ``ArrayType(LongType())`` (lossless).
  * For joins, the ``*_bands_long`` variants reinterpret u64 as two's
    complement int64 — cheap, exact, equality-preserving (band joins only
    compare for equality).

NULL semantics: NULL input row → NULL output row, matching
``src/minhash.rs:67-70,127-130,268-274`` / ``src/euclidean_hash.rs:80-83``.
The UDFs are deterministic for fixed params, so Catalyst is free to
collapse/reorder them (SURVEY.md §4).
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    LongType,
)

from .._core.batch import (
    jaccard_pairs_batch,
    minhash_shingles_batch,
    minhash_text_batch,
)
from .._core.euclidean import euclidean_bands_batch

_DEC_ARRAY = ArrayType(DecimalType(20, 0))
_LONG_ARRAY = ArrayType(LongType())


def _u64_rows_to_decimal(mat: np.ndarray, mask: np.ndarray) -> pd.Series:
    """(n, bands) uint64 + validity mask → Series of list[Decimal] / None."""
    out = [
        [Decimal(int(v)) for v in row] if ok else None
        for row, ok in zip(mat, mask)
    ]
    return pd.Series(out, dtype=object)


def _u64_rows_to_long(mat: np.ndarray, mask: np.ndarray, low32: bool) -> pd.Series:
    if low32:
        vals = (mat & np.uint64(0xFFFFFFFF)).astype(np.int64)
    else:
        vals = mat.view(np.int64)  # two's complement reinterpretation
    out = [row.tolist() if ok else None for row, ok in zip(vals, mask)]
    return pd.Series(out, dtype=object)


def _valid_text_mask(s: pd.Series) -> np.ndarray:
    return s.notna().to_numpy()


def _minhash_text_mat(s: pd.Series, width, bc, bs, seed):
    mask = _valid_text_mask(s)
    texts = ["" if not ok else t for t, ok in zip(s, mask)]
    mat = minhash_text_batch(texts, width, bc, bs, seed)
    return mat, mask


def _minhash_shingle_mat(s: pd.Series, bc, bs, seed):
    mask = np.array([v is not None and not (isinstance(v, float)) for v in s],
                    dtype=bool)
    lists = [list(v) if ok else [] for v, ok in zip(s, mask)]
    mat = minhash_shingles_batch(lists, bc, bs, seed)
    return mat, mask


def lsh_min(col, ngram_width: int, band_count: int, band_size: int, seed: int) -> Column:
    """``lsh_min(VARCHAR, ...) -> LIST(UBIGINT)`` (``src/minhash.rs:23-83``)."""

    @pandas_udf(_DEC_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _minhash_text_mat(s, ngram_width, band_count, band_size, seed)
        return _u64_rows_to_decimal(mat, mask)

    return _udf(col)


def lsh_min32(col, ngram_width: int, band_count: int, band_size: int, seed: int) -> Column:
    """``lsh_min32``: exactly the low 32 bits of ``lsh_min`` (``src/lib.rs:23-27``)."""

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _minhash_text_mat(s, ngram_width, band_count, band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=True)

    return _udf(col)


def lsh_min_shingles(col, band_count: int, band_size: int, seed: int) -> Column:
    """``lsh_min(LIST(VARCHAR), ...)`` overload (``src/minhash.rs:85-150``)."""

    @pandas_udf(_DEC_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _minhash_shingle_mat(s, band_count, band_size, seed)
        return _u64_rows_to_decimal(mat, mask)

    return _udf(col)


def lsh_min32_shingles(col, band_count: int, band_size: int, seed: int) -> Column:
    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _minhash_shingle_mat(s, band_count, band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=True)

    return _udf(col)


def lsh_jaccard(col_a, col_b, ngram_width: int) -> Column:
    """Exact Jaccard over hashed char-ngram sets (``src/minhash.rs:236-296``).

    0.0 if either set is empty; NULL if either input is NULL."""

    @pandas_udf(DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        mask = a.notna().to_numpy() & b.notna().to_numpy()
        ta = ["" if not ok else v for v, ok in zip(a, mask)]
        tb = ["" if not ok else v for v, ok in zip(b, mask)]
        vals = jaccard_pairs_batch(ta, tb, ngram_width)
        out = pd.Series(vals)
        out[~mask] = None
        return out

    return _udf(col_a, col_b)


def _euclidean_mat(s: pd.Series, bucket_width, bc, bs, seed):
    mask = np.array([v is not None and not (isinstance(v, float) and np.isnan(v))
                     for v in s], dtype=bool)
    arrays = [np.asarray(v, dtype=np.float64) for v, ok in zip(s, mask) if ok]
    n = len(s)
    if not arrays:
        return np.zeros((n, bc), dtype=np.uint64), mask
    dims = {a.shape[0] for a in arrays}
    if len(dims) != 1:
        # mirrors src/euclidean_hash.rs:41
        raise ValueError("All input arrays must have the same length")
    xs = np.stack(arrays)
    sub = euclidean_bands_batch(xs, bucket_width, bc, bs, seed)
    mat = np.zeros((n, bc), dtype=np.uint64)
    mat[mask] = sub
    return mat, mask


def lsh_euclidean(col, bucket_width: float, band_count: int, band_size: int,
                  seed: int) -> Column:
    """``lsh_euclidean(LIST(DOUBLE), ...)`` (``src/euclidean_hash.rs:20-98``)."""

    @pandas_udf(_DEC_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _euclidean_mat(s, bucket_width, band_count, band_size, seed)
        return _u64_rows_to_decimal(mat, mask)

    return _udf(col)


def lsh_euclidean32(col, bucket_width: float, band_count: int, band_size: int,
                    seed: int) -> Column:
    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _euclidean_mat(s, bucket_width, band_count, band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=True)

    return _udf(col)


# --- join-layer variants: int64 two's-complement bands (equality-exact) ----

def lsh_min_bands_long(col, ngram_width: int, band_count: int, band_size: int,
                       seed: int) -> Column:
    """u64 band hashes reinterpreted as int64 — the cheap representation for
    band-equality blocking joins (no Decimal boxing)."""

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _minhash_text_mat(s, ngram_width, band_count, band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=False)

    return _udf(col)


def lsh_min_shingles_bands_long(col, band_count: int, band_size: int,
                                seed: int) -> Column:
    """LIST(VARCHAR)-overload band hashes as int64 (two's complement) — the
    join/compare representation of ``lsh_min_shingles``."""

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _minhash_shingle_mat(s, band_count, band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=False)

    return _udf(col)


def weighted_minhash_bands_long(col, band_count: int, band_size: int,
                                seed: int) -> Column:
    """tf-WEIGHTED MinHash band hashes (int64) over whitespace word
    tokens — weighted Jaccard for INTEGER weights via the replication
    reduction: occurrence k of a word contributes the shingle string
    ``"word k"`` (words contain no whitespace, so the composition is
    injective), and banded MinHash over the replicated shingles collides
    with the probability the WEIGHTED Jaccard
    ``Σ min(tf_a, tf_b) / Σ max(tf_a, tf_b)`` gives — the standard
    integer-weight reduction of weighted-set similarity to plain set
    MinHash.  Reuses the bit-exact ``from_shingles`` kernel
    (``shingleset.rs:12-22`` semantics), so the DuckDB oracle replays it
    with the existing string-hash + band machinery; the occurrence
    strings are hashed directly by ``weighted_occurrence_hashes`` with
    no composed-string materialization (bit-identical — pinned against
    the ``_replicated_shingles`` string mirror — and measured ~6x on
    the kernel)."""
    from .._core.batch import (
        minhash_from_window_hashes,
        tokenize_words,
        weighted_occurrence_hashes,
    )

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mask = s.notna().to_numpy()
        hashes, offs = weighted_occurrence_hashes(
            tokenize_words(["" if not ok else t for t, ok in zip(s, mask)]))
        mat = minhash_from_window_hashes(hashes, offs, band_count,
                                         band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=False)

    return _udf(col)


def lsh_euclidean_bands_long(col, bucket_width: float, band_count: int,
                             band_size: int, seed: int) -> Column:
    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mat, mask = _euclidean_mat(s, bucket_width, band_count, band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=False)

    return _udf(col)


# --- shingle-set materialization (compute each doc's set once, reuse) ------

def shingle_set_col(col, ngram_width: int) -> Column:
    """Materialize the char-ngram shingle set as a column: sorted unique
    u32 hashes stored as int32 (bit-reinterpreted — halves the bytes that
    flow through pair joins; sorted in the signed view, consistently on
    both producer and consumer).  Lets pair-heavy operators (similarity
    join, dedup) hash each document ONCE instead of once per candidate
    pair."""
    from pyspark.sql.types import IntegerType

    from .._core.batch import (batch_window_hashes, flatten_texts,
                               segment_unique_int32_rows)

    @pandas_udf(ArrayType(IntegerType()))
    def _udf(s: pd.Series) -> pd.Series:
        mask = s.notna().to_numpy()
        texts = ["" if not ok else t for t, ok in zip(s, mask)]
        hashes, offs = batch_window_hashes(*flatten_texts(texts), ngram_width)
        h32 = hashes.astype(np.uint32).view(np.int32)
        return pd.Series(segment_unique_int32_rows(h32, offs, mask),
                         dtype=object)

    return _udf(col)


def word_shingle_set_col(col, width: int = 2) -> Column:
    """Materialize the WORD-ngram shingle set (default bigrams) as sorted
    unique int32 — FxHash-u32 of each ``"w1 w2"`` shingle string, the
    ``from_shingles`` hashing path (``shingleset.rs:12-22``).  Same storage
    contract as :func:`shingle_set_col`, so every downstream pair operator
    (banding, size pruning, batch-Jaccard verify) works unchanged."""
    import re

    from pyspark.sql.types import IntegerType

    from .._core.batch import hash_strings_batch

    # ONE tokenizer contract across all three word-shingle paths (this
    # Python kernel, the JVM ``_with_word_bigrams`` expression, and the
    # DuckDB oracle): tokens are maximal runs of non-whitespace where
    # whitespace is the ASCII class [ \t\n\x0b\f\r] (= Java regex \s =
    # Python re.ASCII \s), empty tokens dropped.  NBSP and other Unicode
    # spaces are NOT separators anywhere, so the three paths agree on any
    # input, not just clean test text (tests/test_edge_cases.py pins
    # leading-tab and NBSP inputs).
    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf(ArrayType(IntegerType()))
    def _udf(s: pd.Series) -> pd.Series:
        mask = s.notna().to_numpy()
        shingle_lists = []
        for t, ok in zip(s, mask):
            toks = [x for x in ws.split(t)] if ok and t else []
            toks = [x for x in toks if x]
            shingle_lists.append(
                [" ".join(toks[i:i + width])
                 for i in range(len(toks) - width + 1)])
        return _rows_to_unique_hash_sets(shingle_lists, mask)

    return _udf(col)


def _replicated_shingles(toks: "list[list[str]]") -> "list[list[str]]":
    """The integer-weight replication reduction as COMPOSED STRINGS:
    occurrence k of a word becomes the shingle string ``"word k"`` —
    injective because words contain no whitespace.  This is the
    readable mirror of what the DuckDB oracle replays in SQL; the hot
    path (``_core.batch.weighted_occurrence_hashes``) hashes the same
    occurrences directly without materializing these strings, and a
    parity test pins the two bit-identical."""
    from collections import Counter

    out = []
    for ws in toks:
        seen: Counter = Counter()
        comp = []
        for w in ws:
            seen[w] += 1
            comp.append(f"{w} {seen[w]}")
        out.append(comp)
    return out


def _rows_to_unique_hash_sets(lists: "list[list[str]]", mask) -> pd.Series:
    """Shared tail of the word/weighted set columns: flat
    ``from_shingles`` string-hash over the whole batch, then per-row
    sorted-unique int32 sets (the repo-wide storage contract); masked
    rows yield None."""
    from .._core.batch import hash_strings_batch, segment_unique_int32_rows

    flat = [g for lst in lists for g in lst]
    hashes = (hash_strings_batch(flat).astype(np.uint32).view(np.int32)
              if flat else np.empty(0, dtype=np.int32))
    lens = np.fromiter((len(lst) for lst in lists), dtype=np.int64,
                       count=len(lists))
    offs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return pd.Series(segment_unique_int32_rows(hashes, offs, mask),
                     dtype=object)


def weighted_shingle_set_col(col) -> Column:
    """Materialize the tf-WEIGHTED replicated shingle set as a column:
    sorted unique u32 string-hashes of ``"word k"`` occurrence strings
    (k = 1..tf per word), stored as int32 — the SAME storage contract as
    ``shingle_set_col``/``word_shingle_set_col``, so the entire pair
    machinery (banding from sets, id-only blocking, broadcast verify)
    composes unchanged, and plain Jaccard over these sets equals the
    weighted Jaccard ``Σ min(tf)/Σ max(tf)``.  Hashes come straight
    from ``weighted_occurrence_hashes`` (no composed strings)."""
    from pyspark.sql.types import IntegerType

    from .._core.batch import (segment_unique_int32_rows, tokenize_words,
                               weighted_occurrence_hashes)

    @pandas_udf(ArrayType(IntegerType()))
    def _udf(s: pd.Series) -> pd.Series:
        mask = s.notna().to_numpy()
        hashes, offs = weighted_occurrence_hashes(
            tokenize_words(["" if not ok else t for t, ok in zip(s, mask)]))
        h32 = hashes.astype(np.uint32).view(np.int32)
        return pd.Series(segment_unique_int32_rows(h32, offs, mask),
                         dtype=object)

    return _udf(col)


def weighted_word_shingle_set_col(col, width: int = 2) -> Column:
    """tf-weighted WORD-``width``-GRAM replicated shingle set: the
    replication reduction composed with n-gram shingling — occurrence k
    of an n-gram string ``"w1 .. wn"`` contributes ``"w1 .. wn k"``
    (injective for fixed ``width``: the count is always the last
    whitespace-delimited token of exactly ``width + 1``), so plain
    Jaccard over these sets equals the WEIGHTED n-gram Jaccard
    ``Σ min(tf)/Σ max(tf)`` over n-gram multisets.  Same
    sorted-unique-int32 storage contract as every other shingle mode;
    hashes come straight from ``weighted_occurrence_hashes`` over the
    composed n-gram strings (no occurrence-string materialization)."""
    from pyspark.sql.types import IntegerType

    from .._core.batch import (segment_unique_int32_rows, tokenize_words,
                               weighted_occurrence_hashes)

    @pandas_udf(ArrayType(IntegerType()))
    def _udf(s: pd.Series) -> pd.Series:
        mask = s.notna().to_numpy()
        toks = tokenize_words(["" if not ok else t
                               for t, ok in zip(s, mask)])
        grams = [[" ".join(ws[i:i + width])
                  for i in range(len(ws) - width + 1)] for ws in toks]
        hashes, offs = weighted_occurrence_hashes(grams)
        h32 = hashes.astype(np.uint32).view(np.int32)
        return pd.Series(segment_unique_int32_rows(h32, offs, mask),
                         dtype=object)

    return _udf(col)


def minhash_bands_from_set(col, band_count: int, band_size: int, seed: int) -> Column:
    """Banded MinHash (int64 band hashes) computed from a materialized
    shingle-set column (output of :func:`shingle_set_col`)."""
    from .._core.batch import minhash_from_window_hashes

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        # same null idiom as _minhash_shingle_mat: some Arrow/pandas
        # versions deliver array nulls as float NaN, not None
        mask = np.array([v is not None and not isinstance(v, float)
                         for v in s], dtype=bool)
        lens = np.array([len(v) if ok else 0 for v, ok in zip(s, mask)],
                        dtype=np.int64)
        offs = np.zeros(len(s) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = (np.concatenate([np.asarray(v, dtype=np.int32) for v, ok
                                in zip(s, mask) if ok and len(v)])
                .view(np.uint32).astype(np.uint64)
                if lens.sum() else np.empty(0, dtype=np.uint64))
        mat = minhash_from_window_hashes(flat, offs, band_count, band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=False)

    return _udf(col)


def lsh_min_minima_long_from_set(col, band_count: int, band_size: int,
                                 seed: int) -> Column:
    """Per-seed minima (the classic pre-band-fold MinHash signature, as
    int64 two's complement) computed from a MATERIALIZED shingle-set
    column — bit-equal to :func:`lsh_min_minima_long` over the set's
    source text: each per-seed minimum ranges over the window-hash
    MULTISET, duplicates cannot change a minimum, and the set column
    stores exactly the sorted-unique u32 window hashes (the repo-wide
    storage contract).  NULL set → NULL row (the NULL-text contract);
    empty set → all-U64MAX row (the empty-text contract).  Lets the
    calibration estimator reuse a miner's cached sets instead of
    re-shingling the corpus."""
    from .._core.batch import seed_minima_from_window_hashes

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        # same null idiom as _minhash_shingle_mat: some Arrow/pandas
        # versions deliver array nulls as float NaN, not None
        mask = np.array([v is not None and not isinstance(v, float)
                         for v in s], dtype=bool)
        lens = np.array([len(v) if ok else 0 for v, ok in zip(s, mask)],
                        dtype=np.int64)
        offs = np.zeros(len(s) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = (np.concatenate([np.asarray(v, dtype=np.int32) for v, ok
                                in zip(s, mask) if ok and len(v)])
                .view(np.uint32).astype(np.uint64)
                if lens.sum() else np.empty(0, dtype=np.uint64))
        mat = seed_minima_from_window_hashes(flat, offs, band_count,
                                             band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=False)

    return _udf(col)


def minhash_bands_from_set_multi(col, band_count: int, band_size: int,
                                 seeds: "tuple[int, ...]") -> Column:
    """Banded MinHash for SEVERAL seeds in ONE Arrow pass: the returned
    array is the per-seed band arrays concatenated in seed order, so
    element ``rot * band_count + i`` is band ``i`` of rotation ``rot`` —
    the exact ``band_idx`` layout the seed-rotation join uses.  Fusing
    the rotations saves one full Arrow round-trip + set-column decode
    per extra seed (the hashing work itself is per-seed regardless)."""
    from .._core.batch import minhash_from_window_hashes

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        # same null idiom as _minhash_shingle_mat: some Arrow/pandas
        # versions deliver array nulls as float NaN, not None
        mask = np.array([v is not None and not isinstance(v, float)
                         for v in s], dtype=bool)
        lens = np.array([len(v) if ok else 0 for v, ok in zip(s, mask)],
                        dtype=np.int64)
        offs = np.zeros(len(s) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = (np.concatenate([np.asarray(v, dtype=np.int32) for v, ok
                                in zip(s, mask) if ok and len(v)])
                .view(np.uint32).astype(np.uint64)
                if lens.sum() else np.empty(0, dtype=np.uint64))
        mats = [
            minhash_from_window_hashes(flat, offs, band_count, band_size, sd)
            for sd in seeds
        ]
        return _u64_rows_to_long(np.hstack(mats), mask, low32=False)

    return _udf(col)


def jaccard_from_sets(col_a, col_b) -> Column:
    """Exact Jaccard between two materialized shingle-set columns."""

    @pandas_udf(DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        # Vectorized batch intersection — no per-row Python/numpy calls:
        # tag every set value with its row index in the high 32 bits, then
        # ONE intersect1d over the whole Arrow batch counts every row's
        # |A∩B| at once.  Measured on the sf0.1 verification workload
        # (5.2M candidate pairs, ~300-element sets): 24 s vs 88 s for
        # Catalyst array_intersect and 69 s for per-row np.intersect1d —
        # the per-row paths pay per-call overhead ~55 µs that the batch
        # merge amortizes away.
        n = len(a)
        out = np.full(n, np.nan)
        va, vb, idx = [], [], []
        for i, (sa, sb) in enumerate(zip(a, b)):
            if sa is None or sb is None:
                continue
            if len(sa) == 0 or len(sb) == 0:
                out[i] = 0.0
                continue
            va.append(np.asarray(sa, dtype=np.int64))
            vb.append(np.asarray(sb, dtype=np.int64))
            idx.append(i)
        if idx:
            la = np.fromiter((x.shape[0] for x in va), dtype=np.int64,
                             count=len(va))
            lb = np.fromiter((x.shape[0] for x in vb), dtype=np.int64,
                             count=len(vb))
            rows = np.arange(len(idx), dtype=np.int64)
            ka = (np.repeat(rows, la) << 32) | (np.concatenate(va) & 0xFFFFFFFF)
            kb = (np.repeat(rows, lb) << 32) | (np.concatenate(vb) & 0xFFFFFFFF)
            inter = np.intersect1d(ka, kb, assume_unique=True)
            ni = np.bincount(inter >> 32, minlength=len(idx))
            union = la + lb - ni
            out[np.asarray(idx)] = np.where(union > 0,
                                            ni / np.maximum(union, 1), 0.0)
        res = pd.Series(out)
        return res.where(pd.notna(res), None)

    return _udf(col_a, col_b)


def lsh_min_minima_long(col, ngram_width: int, band_count: int,
                        band_size: int, seed: int) -> Column:
    """Per-seed minima (the CLASSIC MinHash signature, length
    band_count·band_size, BEFORE the reference's band fold) as int64
    two's complement — equality-exact, used by the estimator-
    calibration diagnostics (``_core/batch.py::
    minhash_text_minima_batch``)."""
    from .._core.batch import minhash_text_minima_batch

    @pandas_udf(_LONG_ARRAY)
    def _udf(s: pd.Series) -> pd.Series:
        mask = _valid_text_mask(s)
        texts = ["" if not ok else t for t, ok in zip(s, mask)]
        mat = minhash_text_minima_batch(texts, ngram_width, band_count,
                                        band_size, seed)
        return _u64_rows_to_long(mat, mask, low32=False)

    return _udf(col)
