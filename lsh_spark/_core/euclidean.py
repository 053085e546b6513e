"""Bit-exact Euclidean (p-stable-style) LSH
(``src/euclidean_hash.rs:77-94``, ``src/euclidean_hash/euclidean_hasher.rs``).

Per non-NULL row the reference does:

  1. ``rng = StdRng::seed_from_u64(seed)`` per row (row-invariant → hoisted
     here, cached per (bucket_width, band_count, band_size, dim, seed));
  2. per band: ``A ∈ R^{d×band_size}`` i.i.d. Normal(0,1) filled in
     row-major order (``Array2::random_using``), then ``b ∈ R^{band_size}``
     i.i.d. Uniform(0, r) — the RNG stream is consumed sequentially, so a
     band's A fully precedes its b, and band i precedes band i+1;
  3. ``v = x·A + b`` (ndarray non-BLAS dot: per output j, sum over k in
     index order starting from 0.0, then + b[j]);
  4. ``rounded[j] = ceil(v[j] / r) as u64`` — note CEIL (not Datar et al.'s
     floor), and Rust's f64→u64 ``as`` saturates (negatives → 0, > u64::MAX
     → u64::MAX, NaN → 0);
  5. hash = FxHash64 of the ndarray: shape prefix (write_usize(1),
     write_usize(band_size)) then write_u64 per element
     (ndarray 0.16.1 ``impl Hash``: shape().hash then hash_slice).

All non-NULL input arrays in a batch must share one length
(``src/euclidean_hash.rs:31-45``) — enforced by the UDF wrapper.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .dist import UniformF64
from .dist import standard_normal
from .fxhash import fx_add_np
from .rng import StdRng

_K = np.uint64(0x517CC1B727220A95)
_TWO64 = 18446744073709551616.0  # 2^64 as f64


@lru_cache(maxsize=64)
def euclidean_tables(
    bucket_width: float, band_count: int, band_size: int, dim: int, seed: int
):
    """Hoisted (A, b) per band.  Returns (A_stack, b_stack):
    A_stack shape (band_count, dim, band_size), b_stack (band_count,
    band_size), both float64, drawn in the reference's exact RNG order."""
    rng = StdRng(seed)
    uniform = UniformF64(0.0, bucket_width)
    a_stack = np.empty((band_count, dim, band_size), dtype=np.float64)
    b_stack = np.empty((band_count, band_size), dtype=np.float64)
    for band in range(band_count):
        # Array2::random_using((d, band_size), Normal) fills row-major
        for k in range(dim):
            for j in range(band_size):
                a_stack[band, k, j] = standard_normal(rng)
        for j in range(band_size):
            b_stack[band, j] = uniform.sample(rng)
    return a_stack, b_stack


def _saturating_u64_from_f64(v: np.ndarray) -> np.ndarray:
    """Rust ``as u64`` saturating cast semantics for f64 values."""
    out = np.zeros(v.shape, dtype=np.uint64)
    ok = ~np.isnan(v)
    clipped = np.where(ok, v, 0.0)
    clipped = np.clip(clipped, 0.0, np.nextafter(_TWO64, 0.0))
    # values >= 2^64 clip to the largest f64 below 2^64 (casts to < u64::MAX,
    # so handle the saturation explicitly)
    big = ok & (v >= _TWO64)
    out = clipped.astype(np.uint64)
    out[big] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return out


def euclidean_bands(
    x: np.ndarray,
    bucket_width: float,
    band_count: int,
    band_size: int,
    seed: int,
) -> np.ndarray:
    """Band hashes for one coordinate vector (float64, length d).

    Returns uint64 array of length ``band_count``.
    """
    d = int(x.shape[0])
    a_stack, b_stack = euclidean_tables(
        float(bucket_width), band_count, band_size, d, seed
    )
    out = np.empty(band_count, dtype=np.uint64)
    for band in range(band_count):
        # ndarray dot order: acc_j starts at 0.0, += x[k]*A[k,j] for k in
        # 0..d (sequential), then + b[j].  The k-loop below reproduces that
        # order exactly while staying vectorized over j.
        acc = np.zeros(band_size, dtype=np.float64)
        a = a_stack[band]
        for k in range(d):
            acc = acc + x[k] * a[k]
        v = acc + b_stack[band]
        rounded = _saturating_u64_from_f64(np.ceil(v / bucket_width))
        # ndarray Hash: shape slice ([1, band_size]) then elements
        state = np.zeros(1, dtype=np.uint64)
        state = fx_add_np(state, np.uint64(1))
        state = fx_add_np(state, np.uint64(band_size))
        for j in range(band_size):
            state = fx_add_np(state, rounded[j])
        out[band] = state[0]
    return out


def euclidean_bands_batch(
    xs: np.ndarray,
    bucket_width: float,
    band_count: int,
    band_size: int,
    seed: int,
) -> np.ndarray:
    """Vectorized batch form: ``xs`` shape (n, d) float64 → (n, band_count)
    uint64.  Matches the scalar path bit-for-bit (same accumulation order
    per row; rows are independent)."""
    n, d = xs.shape
    a_stack, b_stack = euclidean_tables(
        float(bucket_width), band_count, band_size, d, seed
    )
    out = np.empty((n, band_count), dtype=np.uint64)
    for band in range(band_count):
        a = a_stack[band]  # (d, band_size)
        acc = np.zeros((n, band_size), dtype=np.float64)
        for k in range(d):
            # broadcast: each row's fold step k, same order as scalar path
            acc = acc + xs[:, k : k + 1] * a[k][None, :]
        v = acc + b_stack[band][None, :]
        rounded = _saturating_u64_from_f64(np.ceil(v / bucket_width))
        state = np.full(n, 0, dtype=np.uint64)
        state = fx_add_np(state, np.uint64(1))
        state = fx_add_np(state, np.uint64(band_size))
        for j in range(band_size):
            state = fx_add_np(state, rounded[:, j])
        out[:, band] = state
    return out
