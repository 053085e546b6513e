"""Tests for the pure-stdlib baseline JPEG codec
(``lsh_spark.multimodal.jpeg``) and its wiring into the media pipeline:
a hand-built golden bitstream (decoder checked against spec math, not
against our own encoder), encode/decode round-trip bounds, subsampling,
restart intervals, corruption handling, and the Spark-side
decode/resize paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lsh_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _rand_px(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((h, w, 3), np.uint8)
    out[:, :, 0] = (xx * 4) % 256
    out[:, :, 1] = (yy * 5) % 256
    out[:, :, 2] = 128
    return out


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(
        ">H", len(payload) + 2) + payload


def test_hand_built_dc_only_golden():
    """A single-block grayscale JPEG built BYTE BY BYTE from the spec
    (manual quant table, manual canonical Huffman tables, manual
    entropy bits) — pins the decoder against the standard's own math,
    independent of our encoder: DC coefficient d with quant q yields
    the constant plane round(d*q/8) + 128."""
    q = 16
    quant = bytes([q] * 64)
    # DC table: one symbol (size=4) with a 1-bit code "0"
    dc_dht = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([4])
    # AC table: one symbol (EOB=0x00) with a 1-bit code "0"
    ac_dht = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: DC code "0", 4 magnitude bits 1000 (=> diff 8), EOB "0";
    # that is 0 1000 0 -> 010000 + 1-fill padding -> 0b01000011
    entropy = bytes([0b01000011])
    blob = (b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + quant)
            + _seg(0xC0, sof) + _seg(0xC4, dc_dht) + _seg(0xC4, ac_dht)
            + _seg(0xDA, sos) + entropy + b"\xff\xd9")
    meta = decode_jpeg(blob)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 8, 1)
    want = round(8 * q / 8) + 128                # = 144
    assert np.array_equal(meta["_pixels"],
                          np.full((8, 8, 1), want, np.uint8))


@pytest.mark.parametrize("shape", [(16, 16), (17, 24), (19, 23), (1, 1),
                                   (8, 9)])
def test_gray_round_trip_tight(shape):
    px = _rand_px(*shape, 1, seed=shape[0])
    meta = decode_jpeg(encode_jpeg(px))
    assert (meta["width"], meta["height"]) == (shape[1], shape[0])
    err = np.abs(meta["_pixels"].astype(int) - px.astype(int)).max()
    # all-ones quant: the only loss is the float FDCT/IDCT pair
    assert err <= 1


@pytest.mark.parametrize("sub,tol", [("444", 2), ("422", 4), ("420", 5)])
def test_rgb_subsampling_round_trip(sub, tol):
    px = _smooth_rgb(24, 32)
    meta = decode_jpeg(encode_jpeg(px, subsampling=sub))
    assert (meta["width"], meta["height"]) == (32, 24)
    err = np.abs(meta["_pixels"].astype(int) - px.astype(int)).max()
    assert err <= tol, f"{sub}: {err}"


def test_restart_intervals_and_odd_dims():
    px = _rand_px(21, 26, 3, seed=7)
    meta = decode_jpeg(encode_jpeg(px, restart_interval=2))
    assert (meta["width"], meta["height"]) == (26, 21)
    # noisy RGB through the color transform: bounded, not exact
    err = np.abs(meta["_pixels"].astype(int) - px.astype(int)).max()
    assert err <= 3


def test_coarse_quant_still_decodes():
    quant = np.minimum(np.arange(1, 65) * 2, 255)
    px = _smooth_rgb(16, 16)
    meta = decode_jpeg(encode_jpeg(px, quant=quant))
    assert (meta["width"], meta["height"]) == (16, 16)
    # lossy by design; just bound the wreckage
    err = np.abs(meta["_pixels"].astype(int) - px.astype(int)).max()
    assert err < 128


def test_foreign_none_corrupt_and_arithmetic_raise():
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(None) is None
    good = encode_jpeg(_rand_px(8, 8, 1))
    with pytest.raises(ValueError):
        decode_jpeg(good[:24])                   # truncated in header
    # arithmetic-coded SOF9 keeps the refusal contract (digest-stub
    # fallback), even now that SOF2 progressive decodes for real
    sof9 = (b"\xff\xd8"
            + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
            + _seg(0xC9, struct.pack(">BHHB", 8, 8, 8, 1)
                   + bytes([1, 0x11, 0])))
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(sof9)
    # truncated progressive (SOF2 header, no scan) raises, not misdecodes
    sof2 = (b"\xff\xd8"
            + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
            + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1)
                   + bytes([1, 0x11, 0]))
            + b"\xff\xd9")
    with pytest.raises(ValueError, match="no scan data"):
        decode_jpeg(sof2)


def test_extract_features_decodes_jpeg_for_real(spark):
    from lsh_spark.multimodal.media import MEDIA_SCHEMA, extract_features

    px = _rand_px(11, 13, 3, seed=5)
    rows = [(1, "image", bytearray(encode_jpeg(px)), "image/jpeg"),
            (2, "image", bytearray(b"GIF89a opaque bytes"), "image/gif")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert (out[1].width, out[1].height, out[1].n_frames) == (13, 11, 1)
    # foreign compressed bytes keep the deterministic stub contract
    assert out[2].width is not None


def test_resize_images_reencodes_jpeg(spark):
    from lsh_spark.multimodal.media import MEDIA_SCHEMA, resize_images

    px = _smooth_rgb(8, 8)
    media = spark.createDataFrame(
        [(7, "image", bytearray(encode_jpeg(px)), "image/jpeg")],
        MEDIA_SCHEMA)
    r = resize_images(media, width=4, height=4).collect()[0]
    assert (r.width, r.height) == (4, 4)
    meta = decode_jpeg(bytes(r.content))
    assert meta is not None and (meta["width"], meta["height"]) == (4, 4)
    # nearest-neighbor shrink of the (near-lossless) decoded source
    want = px[::2, ::2, :]
    err = np.abs(meta["_pixels"].astype(int) - want.astype(int)).max()
    assert err <= 4


# --- property tests (hypothesis) -------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:          # pragma: no cover - hypothesis is baked in
    _HAVE_HYP = False


if _HAVE_HYP:

    @settings(max_examples=20, deadline=None)
    @given(h=st.integers(1, 20), w=st.integers(1, 20),
           seed=st.integers(0, 2**31 - 1))
    def test_prop_gray_round_trip_any_shape(h, w, seed):
        px = _rand_px(h, w, 1, seed=seed)
        meta = decode_jpeg(encode_jpeg(px))
        assert (meta["width"], meta["height"]) == (w, h)
        assert np.abs(meta["_pixels"].astype(int)
                      - px.astype(int)).max() <= 1

    @settings(max_examples=15, deadline=None)
    @given(h=st.integers(1, 16), w=st.integers(1, 16),
           sub=st.sampled_from(["444", "422", "420"]),
           ri=st.sampled_from([0, 1, 3]),
           seed=st.integers(0, 2**31 - 1))
    def test_prop_rgb_dims_and_bounds(h, w, sub, ri, seed):
        px = _rand_px(h, w, 3, seed=seed)
        meta = decode_jpeg(encode_jpeg(px, subsampling=sub,
                                       restart_interval=ri))
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["_pixels"].shape == (h, w, 3)

    @settings(max_examples=40, deadline=None)
    @given(data=st.binary(min_size=0, max_size=200))
    def test_prop_arbitrary_bytes_never_crash_unexpectedly(data):
        # foreign bytes -> None; SOI-prefixed garbage -> ValueError or a
        # dict; nothing else may escape (the media pipeline catches
        # ValueError only)
        try:
            out = decode_jpeg(b"\xff\xd8" + data)
            assert out is None or isinstance(out, dict)
        except ValueError:
            pass
        assert decode_jpeg(
            data if data[:2] != b"\xff\xd8" else b"x" + data) is None


def test_incomplete_scan_coverage_and_undeclared_component_raise():
    """SOS/SOF component mismatches and files whose scans never cover
    every component must raise ValueError (stub fallback), never decode
    partially — a luma-only sequential file would otherwise return
    zeroed chroma planes silently."""
    good = encode_jpeg(_rand_px(8, 8, 3, seed=1))
    # locate the SOS segment (FFDA) and rewrite its component list
    sos = good.index(b"\xff\xda")
    ln = struct.unpack(">H", good[sos + 2:sos + 4])[0]
    # (a) single-component scan of a 3-component frame, then EOI:
    # decodes as a non-interleaved luma scan but chroma is never
    # covered -> refused at EOI
    one_comp = (good[:sos] + b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, 1, 0x00, 0, 63, 0]) + good[sos + 2 + ln:])
    with pytest.raises(ValueError, match="never scanned"):
        decode_jpeg(one_comp)
    # (b) scan naming a component id SOF never declared
    bad_ids = bytearray(good)
    bad_ids[sos + 5] = 9                 # first scan component id -> 9
    with pytest.raises(ValueError, match="undeclared component"):
        decode_jpeg(bytes(bad_ids))


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------

def test_progressive_equals_baseline_gray():
    """Same pixels through the baseline and progressive encoders must
    decode IDENTICALLY: both streams carry the same quantized
    coefficients, so any difference is a scan-machinery bug."""
    px = _rand_px(19, 23, 1, seed=3)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_jpeg(encode_jpeg(px, progressive=True))
    assert (prog["width"], prog["height"]) == (23, 19)
    assert np.array_equal(base["_pixels"], prog["_pixels"])


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_progressive_equals_baseline_color(sub):
    """Color + subsampling: non-interleaved AC scans walk each
    component's own block grid (smaller than the MCU-padded one for
    subsampled chroma) — visible pixels must still match baseline."""
    px = _smooth_rgb(21, 26)
    base = decode_jpeg(encode_jpeg(px, subsampling=sub))
    prog = decode_jpeg(encode_jpeg(px, subsampling=sub,
                                   progressive=True))
    assert np.array_equal(base["_pixels"], prog["_pixels"])


def test_progressive_restart_intervals():
    """Restart markers inside progressive scans (DC-interleaved MCU
    counting AND per-block counting in non-interleaved AC scans) reset
    predictors and EOB runs."""
    px = _rand_px(17, 18, 3, seed=11)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_jpeg(encode_jpeg(px, progressive=True,
                                   restart_interval=2))
    assert np.array_equal(base["_pixels"], prog["_pixels"])


def test_progressive_coarse_quant_exercises_eob_runs():
    """A coarse quant table zeroes most AC coefficients, so the AC-first
    and AC-refine scans must code multi-block EOB runs (and buffered
    correction bits) — equality with the baseline decode pins them."""
    quant = np.minimum(np.arange(1, 65) * 3, 255)
    px = _smooth_rgb(40, 48)
    base = decode_jpeg(encode_jpeg(px, quant=quant))
    prog = decode_jpeg(encode_jpeg(px, quant=quant, progressive=True))
    assert np.array_equal(base["_pixels"], prog["_pixels"])


def test_hand_built_progressive_golden():
    """A two-block grayscale SOF2 stream built BYTE BY BYTE from T.81
    G.2 (manual tables, manual scan bits: DC-first with point transform
    Al=1, AC-first with a cross-block EOB run, DC refinement bits) —
    pins the progressive decoder against the spec's own arithmetic,
    independent of our encoder."""
    q = 2
    # target coefficients: block0 DC=8, AC(zigzag 1)=3; block1 DC=-4
    quant = bytes([q] * 64)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    # scan 1 — DC first, Al=1: v = dc >> 1 -> 4, -2; diffs 4, -6 (both
    # size 3). DC table: symbol 3 as the 1-bit code "0".
    dc_dht = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([3])
    sos1 = bytes([1, 1, 0x00, 0, 0, 0x01])
    # bits: 0 100 | 0 001  (mag(4)=100, mag(-6)=001) -> 0x41
    scan1 = bytes([0b01000001])
    # scan 2 — AC first, Ss=1 Se=63 Al=0.  Symbols: 0x02 (run 0, size 2)
    # and 0x10 (EOB run of 2 blocks). Canonical table: len-2 codes 00, 01.
    ac_dht = bytes([0x10]) + bytes([0, 2] + [0] * 14) + bytes([0x02, 0x10])
    sos2 = bytes([1, 1, 0x00, 1, 63, 0x00])
    # bits: 00 11 (coef +3) | 01 0 (EOB run=2: (1<<1)+0) -> 0011010 + pad
    scan2 = bytes([0b00110101])
    # scan 3 — DC refine Ah=1 Al=0: bits 0, 0 (8&1, -4&1) + 1-fill pad
    sos3 = bytes([1, 1, 0x00, 0, 0, 0x10])
    scan3 = bytes([0b00111111])
    blob = (b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + quant)
            + _seg(0xC2, sof)
            + _seg(0xC4, dc_dht) + _seg(0xDA, sos1) + scan1
            + _seg(0xC4, ac_dht) + _seg(0xDA, sos2) + scan2
            + _seg(0xDA, sos3) + scan3
            + b"\xff\xd9")
    meta = decode_jpeg(blob)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (16, 8, 1)
    # spec math: spatial = D.T @ C @ D with C from dequantized coefs
    d = np.array([[0.5 * (np.sqrt(0.5) if k == 0 else 1.0)
                   * np.cos((2 * n + 1) * k * np.pi / 16)
                   for n in range(8)] for k in range(8)])
    c0 = np.zeros((8, 8))
    c0[0, 0] = 8 * q
    c0[0, 1] = 3 * q                              # zigzag index 1
    want0 = np.clip(np.round(d.T @ c0 @ d) + 128, 0, 255).astype(np.uint8)
    c1 = np.zeros((8, 8))
    c1[0, 0] = -4 * q
    want1 = np.clip(np.round(d.T @ c1 @ d) + 128, 0, 255).astype(np.uint8)
    got = meta["_pixels"][:, :, 0]
    assert np.array_equal(got[:, :8], want0)
    assert np.array_equal(got[:, 8:], want1)


if _HAVE_HYP:

    @settings(max_examples=10, deadline=None)
    @given(h=st.integers(1, 16), w=st.integers(1, 16),
           sub=st.sampled_from(["444", "422", "420"]),
           ri=st.sampled_from([0, 2]),
           seed=st.integers(0, 2**31 - 1))
    def test_prop_progressive_equals_baseline(h, w, sub, ri, seed):
        px = _rand_px(h, w, 3, seed=seed)
        base = decode_jpeg(encode_jpeg(px, subsampling=sub))
        prog = decode_jpeg(encode_jpeg(px, subsampling=sub,
                                       restart_interval=ri,
                                       progressive=True))
        assert np.array_equal(base["_pixels"], prog["_pixels"])


# ---------------------------------------------------------------------------
# sequential non-interleaved (separate scans per component)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_separate_scans_equals_interleaved(sub):
    """A sequential SOF0 stream with one non-interleaved scan per
    component carries the same coefficients as the interleaved stream,
    so both must decode identically (this layout used to be a
    documented refusal)."""
    px = _smooth_rgb(21, 26)
    inter = decode_jpeg(encode_jpeg(px, subsampling=sub))
    sep = decode_jpeg(encode_jpeg(px, subsampling=sub,
                                  separate_scans=True))
    assert np.array_equal(inter["_pixels"], sep["_pixels"])


def test_separate_scans_restart_and_noise():
    px = _rand_px(19, 23, 3, seed=21)
    inter = decode_jpeg(encode_jpeg(px))
    sep = decode_jpeg(encode_jpeg(px, separate_scans=True,
                                  restart_interval=3))
    assert np.array_equal(inter["_pixels"], sep["_pixels"])


if _HAVE_HYP:

    @settings(max_examples=10, deadline=None)
    @given(h=st.integers(1, 16), w=st.integers(1, 16),
           sub=st.sampled_from(["444", "422", "420"]),
           ri=st.sampled_from([0, 2]),
           seed=st.integers(0, 2**31 - 1))
    def test_prop_separate_scans_equals_interleaved(h, w, sub, ri, seed):
        px = _rand_px(h, w, 3, seed=seed)
        inter = decode_jpeg(encode_jpeg(px, subsampling=sub))
        sep = decode_jpeg(encode_jpeg(px, subsampling=sub,
                                      restart_interval=ri,
                                      separate_scans=True))
        assert np.array_equal(inter["_pixels"], sep["_pixels"])
