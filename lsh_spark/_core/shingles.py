"""Shingle sets: char-ngram / custom-shingle sets of u32 FxHash values.

Reimplements the reference's only domain data structure
(``src/minhash/shingleset.rs``):

  * ``shingle_set_from_text(text, ngram_width)``: split into Unicode scalar
    values (Rust ``text.chars()``, ``shingleset.rs:27`` — python ``str``
    iteration is identical), take every contiguous window of ``ngram_width``
    chars (``shingleset.rs:29``; zero windows if the text is shorter), hash
    each window with FxHash64 (usize length prefix + u32 per char), keep the
    LOW 32 BITS (``finish() as u32``, ``shingleset.rs:46``), deduplicate.
  * ``shingle_set_from_shingles(strings)``: hash each provided string's char
    sequence the same way (``shingleset.rs:12-22``).
  * Jaccard: |A∩B| / |A∪B| over the u32 hash sets; 0.0 if either set is
    empty (``shingleset.rs:50-57``).  NOTE: similarity is over *hashed*
    shingles, so u32 collisions are part of the spec — do not compare raw
    ngrams.

The salt parameter of the reference is ``None`` at every call site
(``src/minhash.rs:71,136,276-277``) and is not reproduced here.

Returns sorted numpy uint64 arrays (values < 2**32) — sorted-unique form is
what the vectorized minhash kernel wants.
"""

from __future__ import annotations

import numpy as np

from .fxhash import MASK64, fx_add_np

_MASK32 = np.uint64(0xFFFFFFFF)
_K = np.uint64(0x517CC1B727220A95)


def _hash_char_windows(ords: np.ndarray, width: int) -> np.ndarray:
    """FxHash (low 32 bits) of every contiguous window of ``width`` code
    points.  ``ords``: uint64 array of Unicode scalar values.  Vectorized
    over windows: state starts at fx_add(0, width) (the usize length
    prefix), then folds each of the ``width`` char columns."""
    n = int(ords.shape[0])
    n_win = n - width + 1
    if n_win <= 0:
        return np.empty(0, dtype=np.uint64)
    # length-prefix step: rotl(0,5)^len = len, then * K
    state = np.full(n_win, (width * 0x517CC1B727220A95) & MASK64, dtype=np.uint64)
    for k in range(width):
        state = fx_add_np(state, ords[k : k + n_win])
    return state & _MASK32


def text_ords(text: str) -> np.ndarray:
    """Unicode scalar values of ``text`` as uint64."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def shingle_set_from_text(text: str, ngram_width: int) -> np.ndarray:
    """Sorted unique u32 shingle hashes (as uint64) of char ngrams."""
    if ngram_width <= 0:
        # Rust windows(0) panics; the reference never passes 0.  Mirror a
        # loud failure rather than silent behavior.
        raise ValueError("ngram_width must be >= 1")
    hashes = _hash_char_windows(text_ords(text), ngram_width)
    return np.unique(hashes)


def shingle_set_from_shingles(shingles) -> np.ndarray:
    """Sorted unique u32 hashes of caller-supplied shingle strings."""
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        ords = text_ords(s)
        state = np.full(1, (len(ords) * 0x517CC1B727220A95) & MASK64, dtype=np.uint64)
        for k in range(int(ords.shape[0])):
            state = fx_add_np(state, ords[k])
        out[i] = state[0] & _MASK32
    return np.unique(out)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique u32 hash sets; 0.0 if either is
    empty (``shingleset.rs:50-57``)."""
    if a.shape[0] == 0 or b.shape[0] == 0:
        return 0.0
    n_inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    n_union = a.shape[0] + b.shape[0] - n_inter
    return float(n_inter) / float(n_union)
