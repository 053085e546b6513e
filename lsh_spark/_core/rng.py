"""Bit-exact reimplementation of Rust ``StdRng`` (rand 0.8.5) as used by the
reference: ``StdRng::seed_from_u64(seed)`` (``src/minhash.rs:72,138``,
``src/euclidean_hash.rs:86``).

Pipeline (all public, versions pinned by the reference's Cargo.lock):

  1. ``seed_from_u64`` (rand_core 0.6.4): PCG32 expands the u64 into a
     32-byte ChaCha key — 8 rounds of
     ``state = state * 6364136223846793005 + 11634580027462260723``;
     output word = rotr32((((state >> 18) ^ state) >> 27) as u32, state >> 59).
  2. ``StdRng`` = ``ChaCha12Rng`` (rand_chacha 0.3.1): ChaCha with 12
     rounds, 64-bit block counter in state words 12-13, 64-bit stream id
     (zero) in words 14-15.  The block RNG generates 4 blocks (64 u32
     words) per refill; the counter advances by 4.
  3. ``BlockRng`` (rand_core 0.6.4) word dispenser: ``next_u64`` reads two
     consecutive u32s (lo, hi); when one word remains it straddles the
     refill boundary (last word = lo half, first word of next buffer = hi).

Only python-int arithmetic — this runs once per (params, seed) pair to build
the hasher tables (the reference reseeds per *row*, which makes the hash
family row-invariant, so hoisting is result-identical; SURVEY.md §2.2).
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF

_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def seed_from_u64(state: int) -> list[int]:
    """rand_core 0.6.4 ``SeedableRng::seed_from_u64`` → 8 little-endian u32
    key words (= the 32-byte seed)."""
    mul = 6364136223846793005
    inc = 11634580027462260723
    words = []
    for _ in range(8):
        state = (state * mul + inc) & MASK64
        xorshifted = (((state >> 18) ^ state) >> 27) & MASK32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & MASK32
        words.append(x)
    return words


def _quarter_round(x: list[int], a: int, b: int, c: int, d: int) -> None:
    x[a] = (x[a] + x[b]) & MASK32
    x[d] ^= x[a]
    x[d] = ((x[d] << 16) | (x[d] >> 16)) & MASK32
    x[c] = (x[c] + x[d]) & MASK32
    x[b] ^= x[c]
    x[b] = ((x[b] << 12) | (x[b] >> 20)) & MASK32
    x[a] = (x[a] + x[b]) & MASK32
    x[d] ^= x[a]
    x[d] = ((x[d] << 8) | (x[d] >> 24)) & MASK32
    x[c] = (x[c] + x[d]) & MASK32
    x[b] ^= x[c]
    x[b] = ((x[b] << 7) | (x[b] >> 25)) & MASK32


def _chacha12_block(key: list[int], counter: int) -> list[int]:
    """One 16-word ChaCha12 block with 64-bit counter, zero stream id."""
    init = [
        *_CONSTANTS,
        *key,
        counter & MASK32,
        (counter >> 32) & MASK32,
        0,
        0,
    ]
    x = list(init)
    for _ in range(6):  # 12 rounds = 6 double-rounds
        _quarter_round(x, 0, 4, 8, 12)
        _quarter_round(x, 1, 5, 9, 13)
        _quarter_round(x, 2, 6, 10, 14)
        _quarter_round(x, 3, 7, 11, 15)
        _quarter_round(x, 0, 5, 10, 15)
        _quarter_round(x, 1, 6, 11, 12)
        _quarter_round(x, 2, 7, 8, 13)
        _quarter_round(x, 3, 4, 9, 14)
    return [(xi + ii) & MASK32 for xi, ii in zip(x, init)]


class StdRng:
    """``StdRng::seed_from_u64`` equivalent: ChaCha12 behind a BlockRng
    word dispenser (rand_core 0.6.4 semantics, including the u64 straddle
    across refills)."""

    __slots__ = ("_key", "_counter", "_buf", "_index")

    def __init__(self, seed: int):
        self._key = seed_from_u64(seed & MASK64)
        self._counter = 0
        self._buf: list[int] = []
        self._index = 64  # force refill on first use

    def _refill(self) -> None:
        buf = []
        for i in range(4):
            buf.extend(_chacha12_block(self._key, self._counter + i))
        self._counter += 4
        self._buf = buf
        self._index = 0

    def next_u32(self) -> int:
        if self._index >= 64:
            self._refill()
        v = self._buf[self._index]
        self._index += 1
        return v

    def next_u64(self) -> int:
        i = self._index
        if i < 63:
            lo, hi = self._buf[i], self._buf[i + 1]
            self._index = i + 2
            return (hi << 32) | lo
        if i >= 64:
            self._refill()
            self._index = 2
            return (self._buf[1] << 32) | self._buf[0]
        # exactly one word left: straddle the refill (rand_core BlockRng)
        lo = self._buf[63]
        self._refill()
        self._index = 1
        return (self._buf[0] << 32) | lo

    # -- float helpers (rand 0.8.5 Standard / Open01 for f64) --------------

    def gen_f64_standard(self) -> float:
        """``rng.gen::<f64>()``: 53 random bits / 2^53 → [0, 1)."""
        return (self.next_u64() >> 11) * (2.0**-53)

    def gen_f64_open01(self) -> float:
        """``Open01``: (0, 1] ... strictly (0,1): fraction/2^52 + 2^-53."""
        return (self.next_u64() >> 12) * (2.0**-52) + 2.0**-53
