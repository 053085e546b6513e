"""Arrow-batch kernels: whole-batch vectorized forms of the core pipelines.

These are what the pandas UDFs call — one invocation per Arrow record batch
(the Spark analog of the reference's per-DataChunk kernel invocation,
``src/minhash.rs:154-161``).  Rather than looping rows in Python, documents
are flattened into one code-point array and every char-ngram window in the
batch is hashed in ``ngram_width`` numpy passes; per-document minima then
come from ``np.minimum.reduceat`` over document segments.

Key semantic points preserved from the reference:
  * min over a *multiset* equals min over the set, so MinHash needs no
    dedup pass (Jaccard does — it keeps set semantics).
  * empty documents (fewer code points than ngram_width) produce an empty
    shingle set → per-seed minima stay u64::MAX (``minhasher.rs:24-36``).
  * NULL inputs yield NULL outputs (handled by the UDF wrapper's mask).
"""

from __future__ import annotations

import numpy as np

from .fxhash import MASK64, fx_add_np
from .minhash import _seed_prefix_states
from .shingles import text_ords

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_MASK32 = np.uint64(0xFFFFFFFF)
_K = 0x517CC1B727220A95


def flatten_texts(texts) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate code points of every (non-null) text.

    Returns (ords, offsets) with offsets of length n+1.
    """
    encoded = [t.encode("utf-32-le") if t else b"" for t in texts]
    lens = np.fromiter((len(e) // 4 for e in encoded), dtype=np.int64,
                       count=len(encoded))
    offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if offsets[-1] == 0:
        return np.empty(0, dtype=np.uint64), offsets
    ords = np.frombuffer(b"".join(encoded), dtype=np.uint32).astype(np.uint64)
    return ords, offsets


def batch_window_hashes(
    ords: np.ndarray, offsets: np.ndarray, width: int
) -> tuple[np.ndarray, np.ndarray]:
    """u32 shingle hashes (as uint64) of every valid window in the batch.

    Returns (hashes, win_offsets): ``hashes`` holds document d's window
    hashes in positions [win_offsets[d], win_offsets[d+1]).
    """
    n_docs = offsets.shape[0] - 1
    doc_lens = offsets[1:] - offsets[:-1]
    win_counts = np.maximum(doc_lens - width + 1, 0)
    win_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(win_counts, out=win_offsets[1:])
    total = int(win_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), win_offsets

    # global index of each window's first code point
    starts = np.repeat(offsets[:-1], win_counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(win_offsets[:-1], win_counts)
    )
    state = np.full(total, (width * _K) & MASK64, dtype=np.uint64)
    for k in range(width):
        state = fx_add_np(state, ords[starts + k])
    return state & _MASK32, win_offsets


def _fold_band_hashes(minima: np.ndarray, band_count: int, band_size: int) -> np.ndarray:
    """minima (n, band_count*band_size) → band hashes (n, band_count)."""
    n = minima.shape[0]
    bands = minima.reshape(n, band_count, band_size)
    state = np.zeros((n, band_count), dtype=np.uint64)
    for j in range(band_size):
        state = fx_add_np(state, bands[:, :, j])
    return state


def minhash_from_window_hashes(
    hashes: np.ndarray,
    win_offsets: np.ndarray,
    band_count: int,
    band_size: int,
    seed: int,
) -> np.ndarray:
    """Banded MinHash for every document segment → (n_docs, band_count)."""
    n_docs = win_offsets.shape[0] - 1
    n_seeds = band_count * band_size
    prefix = _seed_prefix_states(band_count, band_size, seed)
    minima = np.full((n_docs, n_seeds), _U64MAX, dtype=np.uint64)
    nonempty = (win_offsets[1:] - win_offsets[:-1]) > 0
    if hashes.shape[0]:
        # reduceat needs strictly valid starts; run it over non-empty
        # segments only, then scatter back
        starts = win_offsets[:-1][nonempty]
        for s in range(n_seeds):
            h = fx_add_np(np.full(hashes.shape[0], prefix[s], dtype=np.uint64),
                          hashes)
            minima[nonempty, s] = np.minimum.reduceat(h, starts)
    return _fold_band_hashes(minima, band_count, band_size)


def minhash_text_batch(
    texts, ngram_width: int, band_count: int, band_size: int, seed: int
) -> np.ndarray:
    """Full text→bands pipeline for a batch of (non-null) strings."""
    ords, offsets = flatten_texts(texts)
    hashes, win_offsets = batch_window_hashes(ords, offsets, ngram_width)
    return minhash_from_window_hashes(
        hashes, win_offsets, band_count, band_size, seed)


def hash_strings_batch(strings) -> np.ndarray:
    """FxHash-u32 (as uint64) of each whole string's char slice — the
    ``from_shingles`` path (``shingleset.rs:12-22``), vectorized by
    iterating max-length character columns with masking."""
    ords, offsets = flatten_texts(strings)
    n = offsets.shape[0] - 1
    lens = offsets[1:] - offsets[:-1]
    state = (lens.astype(np.uint64) * np.uint64(_K))  # length-prefix step
    max_len = int(lens.max()) if n else 0
    for k in range(max_len):
        live = lens > k
        idx = offsets[:-1][live] + k
        state[live] = fx_add_np(state[live], ords[idx])
    return state & _MASK32


def minhash_shingles_batch(
    shingle_lists, band_count: int, band_size: int, seed: int
) -> np.ndarray:
    """Custom-shingle-list pipeline for a batch of (non-null) lists of
    strings → (n, band_count)."""
    counts = np.fromiter((len(x) for x in shingle_lists), dtype=np.int64,
                         count=len(shingle_lists))
    flat: list[str] = [s for lst in shingle_lists for s in lst]
    hashes = (hash_strings_batch(flat) if flat
              else np.empty(0, dtype=np.uint64))
    offs = np.zeros(len(shingle_lists) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return minhash_from_window_hashes(hashes, offs, band_count, band_size, seed)


def jaccard_pairs_batch(
    texts_a, texts_b, ngram_width: int
) -> np.ndarray:
    """Exact Jaccard for aligned (non-null) string pairs → float64 array.

    Set semantics per side (duplicates collapse), 0.0 when either side is
    empty (``shingleset.rs:50-57``)."""
    ha, oa = batch_window_hashes(*flatten_texts(texts_a), ngram_width)
    hb, ob = batch_window_hashes(*flatten_texts(texts_b), ngram_width)
    n = oa.shape[0] - 1
    # Row-tagged batch merge (same kernel shape as the similarity-join
    # verifier): the pair index in the high 32 bits keeps rows disjoint,
    # so ONE np.unique per side performs every row's set-dedup and ONE
    # intersect1d counts every row's overlap — no Python row loop.
    ua, ca = _rowtag_unique(ha, oa)
    ub, cb = _rowtag_unique(hb, ob)
    ni = sorted_intersect_counts(ua, ub, n)
    union = ca + cb - ni
    return np.where(union > 0, ni / np.maximum(union, 1), 0.0)


def sorted_intersect_counts(ka: np.ndarray, kb: np.ndarray,
                            n_rows: int) -> np.ndarray:
    """Per-row intersection sizes of two SORTED-UNIQUE row-tagged key
    arrays (row index in the high 32 bits).

    Each input is already sorted (np.unique output / concatenation of
    per-row sorted sets under increasing row tags), so the comparison
    sort inside ``np.intersect1d`` is wasted work: a single STABLE sort
    of the concatenation uses numpy's radix path for integers (O(n)
    passes instead of O(n log n) compares — measured 1.67× on the
    10k-pair verify batch), and a key appears at most once per side, so
    every adjacent duplicate in the merged array is exactly one
    cross-side intersection hit."""
    m = np.concatenate([ka, kb])
    if m.shape[0] == 0:
        return np.zeros(n_rows, dtype=np.int64)
    m.sort(kind="stable")
    dup = m[1:] == m[:-1]
    hits = m[1:][dup]
    shift = np.uint64(32) if m.dtype == np.uint64 else 32
    return np.bincount((hits >> shift).astype(np.int64), minlength=n_rows)


def _rowtag_unique(
    hashes: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row set-dedup of u32 hash segments in one pass.

    Returns (tagged_uniques, per_row_set_sizes): each u32 hash is tagged
    with its row index in the high 32 bits, so a single global
    ``np.unique`` collapses duplicates exactly per row."""
    n = offsets.shape[0] - 1
    lens = offsets[1:] - offsets[:-1]
    if hashes.shape[0] == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n, dtype=np.int64)
    rows = np.repeat(np.arange(n, dtype=np.uint64), lens)
    uniq = np.unique((rows << np.uint64(32)) | hashes)
    counts = np.bincount((uniq >> np.uint64(32)).astype(np.int64),
                         minlength=n)
    return uniq, counts
