"""Bit-exact reimplementation of the rand 0.8.5 / rand_distr 0.4.3
distributions the reference draws from:

  * ``Uniform::<u64>::new(0, 20000000)`` — minhash seed table
    (``src/minhash/minhasher.rs:16-20``): widening-multiply rejection
    sampler (rand 0.8.5 ``UniformInt``).
  * ``Normal::new(0.0, 1.0)`` — Euclidean projection matrix
    (``src/euclidean_hash/euclidean_hasher.rs:19-22``): ziggurat
    (rand_distr 0.4.3 ``StandardNormal``), 256-layer tables.
  * ``Uniform::new(0.0, r)`` — Euclidean offsets
    (``euclidean_hasher.rs:23``): rand 0.8.5 ``UniformFloat<f64>``.

The ziggurat tables are regenerated with the same recurrence and constants
as rand's published ``ziggurat_tables.py`` generator (R, V from Marsaglia &
Tsang / Doornik for 256 layers); correctness is pinned by the reference's
golden vectors in ``tests/test_core_golden.py``.
"""

from __future__ import annotations

import math

from .rng import StdRng

MASK64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Uniform<u64> (rand 0.8.5 UniformInt, low inclusive / high exclusive)
# ---------------------------------------------------------------------------

class UniformU64:
    def __init__(self, low: int, high: int):
        if not high > low:
            raise ValueError("Uniform::new called with `low >= high`")
        self.low = low
        self.range = high - low
        # unsigned_max - range + 1 ≡ (2^64 - range) mod 2^64
        ints_to_reject = ((1 << 64) - self.range) % self.range
        self.zone = MASK64 - ints_to_reject

    def sample(self, rng: StdRng) -> int:
        while True:
            v = rng.next_u64()
            m = v * self.range
            hi, lo = m >> 64, m & MASK64
            if lo <= self.zone:
                return self.low + hi


# ---------------------------------------------------------------------------
# Uniform<f64> (rand 0.8.5 UniformFloat, low inclusive / high exclusive)
# ---------------------------------------------------------------------------

class UniformF64:
    def __init__(self, low: float, high: float):
        max_rand = 1.0 - 2.0**-53  # 1 - EPSILON/2
        scale = high - low
        while True:
            mask = (scale * max_rand + low) >= high
            if not mask:
                break
            # decrease_masked: next representable f64 toward zero
            scale = math.nextafter(scale, 0.0)
        self.low = low
        self.scale = scale

    def sample(self, rng: StdRng) -> float:
        # value1_2 = 1.[52 random bits], exact; minus 1.0 is exact
        value0_1 = (rng.next_u64() >> 12) * (2.0**-52)
        return value0_1 * self.scale + self.low


# ---------------------------------------------------------------------------
# StandardNormal (rand_distr 0.4.3 ziggurat, 256 layers)
# ---------------------------------------------------------------------------

_ZIG_NORM_R = 3.654152885361008772
_ZIG_NORM_V = 0.00492867323399


def _make_norm_tables():
    """Regenerate rand's ZIG_NORM_X / ZIG_NORM_F (257 entries each) with the
    published generator's recurrence:
        x[0] = V / f(R);  x[1] = R
        x[i] = f_inv(V / x[i-1] + f(x[i-1]))   for 2 <= i < 256
        x[256] = 0;       f_tab[i] = f(x[i])
    where f(x) = exp(-x^2/2), f_inv(y) = sqrt(-2 ln y).
    """
    f = lambda x: math.exp(-x * x / 2.0)
    f_inv = lambda y: math.sqrt(-2.0 * math.log(y))
    num = 256
    xs = [0.0] * (num + 1)
    xs[0] = _ZIG_NORM_V / f(_ZIG_NORM_R)
    xs[1] = _ZIG_NORM_R
    for i in range(2, num):
        last = xs[i - 1]
        xs[i] = f_inv(_ZIG_NORM_V / last + f(last))
    xs[num] = 0.0
    fs = [f(x) for x in xs]
    return xs, fs


_ZIG_NORM_X, _ZIG_NORM_F = _make_norm_tables()


def _norm_pdf(x: float) -> float:
    return math.exp(-x * x / 2.0)


def _norm_zero_case(rng: StdRng, u: float) -> float:
    """Tail sampling (rand_distr 0.4.3 StandardNormal zero_case)."""
    x = 1.0
    y = 0.0
    while -2.0 * y < x * x:
        x_ = rng.gen_f64_open01()
        y_ = rng.gen_f64_open01()
        x = math.log(x_) / _ZIG_NORM_R
        y = math.log(y_)
    return x - _ZIG_NORM_R if u < 0.0 else _ZIG_NORM_R - x


def standard_normal(rng: StdRng) -> float:
    """One StandardNormal draw (rand_distr 0.4.3 ziggurat)."""
    while True:
        bits = rng.next_u64()
        i = bits & 0xFF
        f = (bits >> 11) * (2.0**-53)
        u = 2.0 * f - 1.0  # symmetric
        x = u * _ZIG_NORM_X[i]
        if abs(x) < _ZIG_NORM_X[i + 1]:
            return x
        if i == 0:
            return _norm_zero_case(rng, u)
        if (
            _ZIG_NORM_F[i + 1]
            + (_ZIG_NORM_F[i] - _ZIG_NORM_F[i + 1]) * rng.gen_f64_standard()
            < _norm_pdf(x)
        ):
            return x
