"""Bit-exact MinHash band pipeline (``src/minhash.rs:64-81``,
``src/minhash/minhasher.rs``).

Per non-NULL row the reference does:

  1. build the char-ngram (or custom) ShingleSet;
  2. ``rng = StdRng::seed_from_u64(seed)`` — reseeded identically for EVERY
     row (``src/minhash.rs:72``), so the hash family is row-invariant;
  3. for each band, draw ``band_size`` u64 seeds from Uniform(0, 20000000)
     (sequential RNG stream: band b owns draws [b*size, (b+1)*size));
  4. per seed: min over shingles of FxHash64(write_u64(seed),
     write_u32(shingle)); empty set → u64::MAX stays;
  5. band hash = FxHash64(write_u64(m) for each of the band's minima).

Because of (2) we hoist the seed table: it is computed once per
(band_count, band_size, seed) and cached — identical results, large speedup
(SURVEY.md §4 calls out the reference's per-row reconstruction as a
de-optimization not to copy).

The per-seed/per-shingle min is vectorized in numpy as an outer product in
wrapping uint64 arithmetic.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .dist import UniformU64
from .fxhash import MASK64, fx_add, fx_add_np
from .rng import StdRng

_K = 0x517CC1B727220A95
_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


@lru_cache(maxsize=256)
def seed_table(band_count: int, band_size: int, seed: int) -> np.ndarray:
    """The hoisted per-row-invariant seed table, shape (band_count*band_size,)
    uint64, in RNG draw order."""
    rng = StdRng(seed)
    dist = UniformU64(0, 20000000)
    seeds = [dist.sample(rng) for _ in range(band_count * band_size)]
    return np.asarray(seeds, dtype=np.uint64)


@lru_cache(maxsize=256)
def _seed_prefix_states(band_count: int, band_size: int, seed: int) -> np.ndarray:
    """FxHasher state after write_u64(seed_i) for each table seed: since the
    hasher starts at 0, this is just seed_i * K (rotl(0,5)=0, 0^s=s)."""
    seeds = seed_table(band_count, band_size, seed)
    return seeds * np.uint64(_K)


def minhash_bands(
    shingles: np.ndarray, band_count: int, band_size: int, seed: int
) -> np.ndarray:
    """Band hashes for one shingle set (sorted-unique u32 values in uint64).

    Returns uint64 array of length ``band_count``.
    """
    n_seeds = band_count * band_size
    if shingles.shape[0] == 0:
        minima = np.full(n_seeds, _U64MAX, dtype=np.uint64)
    else:
        prefix = _seed_prefix_states(band_count, band_size, seed)
        # outer: state (n_seeds, 1) vs shingle words (1, n_shingles).
        # fx_add(prefix, h) = (rotl(prefix,5) ^ h) * K with the rotl
        # hoisted onto the small per-seed vector — bit-exact, one xor +
        # one multiply on the big outer matrix instead of the full
        # four-op FxHasher step (same hoist as the batch minima kernel).
        rot_prefix = (prefix << np.uint64(5)) | (prefix >> np.uint64(59))
        states = (rot_prefix[:, None] ^ shingles[None, :]) * np.uint64(_K)
        minima = states.min(axis=1)
    # fold each band's minima: h = fx_add(...fx_add(0, m0)..., m_{size-1})
    out = np.zeros(band_count, dtype=np.uint64)
    bands = minima.reshape(band_count, band_size)
    state = np.zeros(band_count, dtype=np.uint64)
    for j in range(band_size):
        state = fx_add_np(state, bands[:, j])
    out[:] = state
    return out


def minhash_bands_scalar(
    shingles, band_count: int, band_size: int, seed: int
) -> list[int]:
    """Pure-python reference path (used by tests to cross-check the numpy
    kernel)."""
    seeds = [int(s) for s in seed_table(band_count, band_size, seed)]
    shingle_list = [int(s) for s in shingles]
    out = []
    for b in range(band_count):
        minima = []
        for s in seeds[b * band_size : (b + 1) * band_size]:
            best = MASK64
            for item in shingle_list:
                h = fx_add(fx_add(0, s), item)
                if h < best:
                    best = h
            minima.append(best)
        h = 0
        for m in minima:
            h = fx_add(h, m)
        out.append(h)
    return out
