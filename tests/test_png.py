"""Tests for the pure-stdlib PNG codec (``lsh_spark.multimodal.png``)
and its wiring into the media pipeline: encode/decode round-trips, all
five scanline filters (hand-filtered fixtures), palette expansion,
corruption handling, and the Spark-side decode/resize paths."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lsh_spark.multimodal.png import _MAGIC, decode_png, encode_png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _rand_px(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_round_trip_all_color_types(c):
    px = _rand_px(7, 5, c, seed=c)
    meta = decode_png(encode_png(px))
    assert (meta["width"], meta["height"], meta["n_frames"]) == (5, 7, 1)
    assert np.array_equal(meta["_pixels"], px)


def test_round_trip_2d_gray_input():
    px = _rand_px(4, 6, 1, seed=9)
    meta = decode_png(encode_png(px[:, :, 0]))   # 2-D accepted
    assert np.array_equal(meta["_pixels"], px)


def _filter_row(ftype: int, row: np.ndarray, prior: np.ndarray,
                bpp: int) -> np.ndarray:
    """Reference implementation of PNG FILTERING (the encoder side) —
    the inverse of the decoder's unfiltering, per the spec."""
    out = np.zeros_like(row)
    for i in range(len(row)):
        a = int(row[i - bpp]) if i >= bpp else 0       # raw left
        b = int(prior[i])
        cc = int(prior[i - bpp]) if i >= bpp else 0
        x = int(row[i])
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[i] = (x - pred) & 0xFF
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_unfilter_each_filter_type(ftype):
    # every scanline carries the same filter; decode must invert the
    # reference filtering exactly
    px = _rand_px(6, 4, 3, seed=ftype + 10)
    h, w, c = px.shape
    flat = px.reshape(h, w * c)
    lines = []
    for y in range(h):
        prior = flat[y - 1] if y else np.zeros(w * c, dtype=np.uint8)
        lines.append(bytes([ftype])
                     + _filter_row(ftype, flat[y], prior, c).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))
    meta = decode_png(blob)
    assert np.array_equal(meta["_pixels"], px), f"filter {ftype}"


def test_mixed_filters_and_split_idat():
    px = _rand_px(5, 3, 4, seed=42)
    h, w, c = px.shape
    flat = px.reshape(h, w * c)
    lines = []
    for y in range(h):
        ftype = y % 5
        prior = flat[y - 1] if y else np.zeros(w * c, dtype=np.uint8)
        lines.append(bytes([ftype])
                     + _filter_row(ftype, flat[y], prior, c).tobytes())
    comp = zlib.compress(b"".join(lines))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    # IDAT split across two chunks must concatenate before inflate
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", comp[:7]) + _chunk(b"IDAT", comp[7:])
            + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(blob)["_pixels"], px)


def test_palette_image_expands_to_rgb():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                       dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", palette.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    meta = decode_png(blob)
    assert np.array_equal(meta["_pixels"], palette[idx])


def test_foreign_bytes_return_none_corrupt_raise():
    assert decode_png(b"not a png at all") is None
    assert decode_png(None) is None
    good = encode_png(_rand_px(3, 3, 3))
    # flip one payload byte -> CRC mismatch
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:30])        # truncated mid-chunk
    # 16-bit depth is unsupported, must raise (caller falls back)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(blob)


def test_malformed_streams_raise_valueerror_not_internal_errors():
    # the media pipeline's total-batch fallback catches ValueError ONLY;
    # zlib.error / IndexError / struct.error leaking out would kill the
    # whole Spark task on one bad blob
    # (a) valid CRCs but an incomplete deflate stream
    px = _rand_px(4, 4, 3)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    comp = zlib.compress(
        b"".join(b"\x00" + px.reshape(4, 12)[y].tobytes() for y in range(4)))
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", comp[:len(comp) // 2])
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(blob)
    # (b) palette index beyond the palette
    idx = np.array([[5]], dtype=np.uint8)       # palette has 1 entry
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", b"\x01\x02\x03")
            + _chunk(b"IDAT", zlib.compress(b"\x00" + idx.tobytes()))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(blob)
    # (c) IHDR shorter than the 13-byte spec
    blob = (_MAGIC + _chunk(b"IHDR", b"\x00\x00\x00\x01")
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(blob)


def test_extract_features_decodes_png_for_real(spark):
    from lsh_spark.multimodal.media import MEDIA_SCHEMA, extract_features

    px = _rand_px(11, 13, 3, seed=5)
    rows = [(1, "image", bytearray(encode_png(px)), "image/png"),
            (2, "image", bytearray(b"JFIF-ish opaque bytes"), "image/jpeg")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(media).collect()}
    # PNG: REAL dimensions from the decoded header/pixels
    assert (out[1].width, out[1].height, out[1].n_frames) == (13, 11, 1)
    # foreign compressed bytes keep the deterministic stub contract
    assert out[2].width is not None


def test_resize_images_resizes_png_and_reencodes_png(spark):
    from lsh_spark.multimodal.media import MEDIA_SCHEMA, resize_images

    px = _rand_px(8, 8, 3, seed=6)
    media = spark.createDataFrame(
        [(7, "image", bytearray(encode_png(px)), "image/png")], MEDIA_SCHEMA)
    r = resize_images(media, width=4, height=4).collect()[0]
    assert (r.width, r.height) == (4, 4)
    meta = decode_png(bytes(r.content))
    assert meta is not None and (meta["width"], meta["height"]) == (4, 4)
    # nearest-neighbor: dst (y,x) pulls src (2y, 2x) for an 8->4 shrink
    want = px[::2, ::2, :]
    assert np.array_equal(meta["_pixels"], want)


# --- property tests (hypothesis) -------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:          # pragma: no cover - hypothesis is baked in
    _HAVE_HYP = False


if _HAVE_HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        c=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**31 - 1),
    )
    def test_prop_round_trip_any_shape(h, w, c, seed):
        px = _rand_px(h, w, c, seed=seed)
        meta = decode_png(encode_png(px))
        assert (meta["width"], meta["height"]) == (w, h)
        assert np.array_equal(meta["_pixels"], px)

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 10), w=st.integers(1, 10),
        c=st.sampled_from([1, 3, 4]),
        filters=st.lists(st.integers(0, 4), min_size=10, max_size=10),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_prop_unfilter_inverts_any_filter_sequence(h, w, c, filters,
                                                       seed):
        # arbitrary per-row filter choices (what real encoders emit) must
        # decode back to the exact pixels
        px = _rand_px(h, w, c, seed=seed)
        flat = px.reshape(h, w * c)
        lines = []
        for y in range(h):
            f = filters[y % len(filters)]
            prior = flat[y - 1] if y else np.zeros(w * c, dtype=np.uint8)
            lines.append(bytes([f])
                         + _filter_row(f, flat[y], prior, c).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8,
                           {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
        blob = (_MAGIC + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + _chunk(b"IEND", b""))
        assert np.array_equal(decode_png(blob)["_pixels"], px)

    @settings(max_examples=30, deadline=None)
    @given(data=st.binary(min_size=0, max_size=200))
    def test_prop_arbitrary_bytes_never_crash_unexpectedly(data):
        # foreign bytes -> None; PNG-magic-prefixed garbage -> ValueError;
        # nothing else may escape (the media pipeline catches ValueError)
        try:
            out = decode_png(_MAGIC + data)
            assert out is None or isinstance(out, dict)
        except ValueError:
            pass
        assert decode_png(data if data[:8] != _MAGIC else b"x" + data) \
            is None
