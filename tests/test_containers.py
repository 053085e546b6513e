"""Tests for the WAV/BMP/GIF container codecs
(``lsh_spark.multimodal.containers``) and their wiring into the media
pipeline: lossless round-trips where the format allows them, a
hand-built GIF with interlacing and transparency, corruption handling,
and the Spark-side feature/resize/frame-sample paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lsh_spark.multimodal.containers import (
    decode_bmp,
    decode_gif,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_gif_rgb,
    encode_wav,
)


def _rand(shape, seed=0, dtype=np.uint8, lo=0, hi=256):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, shape).astype(dtype)


# --- WAV -------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1,), (100,), (77, 2), (33, 6)])
def test_wav_pcm16_round_trip(shape):
    s = _rand(shape, seed=shape[0], dtype=np.int16, lo=-32768, hi=32767)
    m = decode_wav(encode_wav(s, 22_050))
    assert (m["n_frames"], m["_sample_rate"]) == (shape[0], 22_050)
    assert m["_channels"] == (shape[1] if len(shape) > 1 else 1)
    assert np.array_equal(m["_samples"], s)


def test_wav_8_24_32_bit_and_float():
    # 8-bit unsigned: hand-built fmt/data chunks
    def wav(tag, bits, data, ch=1):
        fmt = struct.pack("<HHIIHH", tag, ch, 8000, 8000, 1, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    m = decode_wav(wav(1, 8, bytes([0, 128, 255])))
    assert m["_samples"].tolist() == [-32768, 0, 32512]
    # 24-bit: value 0x010203 little-endian, and a negative one
    m = decode_wav(wav(1, 24, bytes([0x03, 0x02, 0x01, 0xFF, 0xFF, 0xFF])))
    assert m["_samples"].tolist() == [0x010203, -1]
    # 32-bit int and float pass through natively
    m = decode_wav(wav(1, 32, np.array([-7, 9], "<i4").tobytes()))
    assert m["_samples"].tolist() == [-7, 9]
    m = decode_wav(wav(3, 32, np.array([0.5, -1.25], "<f4").tobytes()))
    assert m["_samples"].tolist() == [0.5, -1.25]
    # compressed/extensible forms raise (stub fallback)
    with pytest.raises(ValueError, match="unsupported format"):
        decode_wav(wav(0xFFFE, 16, b"\x00\x00"))
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    assert decode_wav(b"RIFFxxxxAVI chunk") is None
    assert decode_wav(None) is None


# --- BMP -------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(7, 5, 3), (1, 1, 3), (8, 3, 1),
                                   (3, 9, 4)])
def test_bmp_24bit_round_trip(shape):
    px = _rand(shape, seed=shape[1])
    m = decode_bmp(encode_bmp(px))
    want = (px if shape[2] == 3
            else np.repeat(px, 3, 2) if shape[2] == 1 else px[:, :, :3])
    assert (m["width"], m["height"], m["n_frames"]) == (
        shape[1], shape[0], 1)
    assert np.array_equal(m["_pixels"], want)


def test_bmp_8bit_palette_and_top_down():
    # hand-built 8-bit paletted BMP, top-down (negative height)
    pal = bytes([255, 0, 0, 0,    # idx 0: BGR0 = blue 255 -> RGB (0,0,255)
                 0, 255, 0, 0])   # idx 1: green
    idx = np.array([[0, 1, 1], [1, 0, 0]], dtype=np.uint8)
    h, w = idx.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, 0, rows.size,
                      0, 0, 2, 0)
    blob = (b"BM" + struct.pack("<IHHI", 0, 0, 0, 14 + 40 + len(pal))
            + dib + pal + rows.tobytes())
    m = decode_bmp(blob)
    want = np.array([[0, 0, 255], [0, 255, 0]], np.uint8)[idx]
    assert np.array_equal(m["_pixels"], want)
    # palette index past the declared table raises
    bad_rows = rows.copy()
    bad_rows[0, 0] = 7
    bad = (b"BM" + struct.pack("<IHHI", 0, 0, 0, 14 + 40 + len(pal))
           + dib + pal + bad_rows.tobytes())
    with pytest.raises(ValueError, match="palette index"):
        decode_bmp(bad)


def test_bmp_corrupt_and_unsupported_raise():
    good = encode_bmp(_rand((4, 4, 3)))
    with pytest.raises(ValueError):
        decode_bmp(good[:30])
    # RLE compression flag raises
    bad = bytearray(good)
    bad[30] = 1
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(bad))
    assert decode_bmp(b"not a bmp") is None


# --- GIF -------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (6, 9), (31, 17)])
def test_gif_gray_round_trip_lossless(shape):
    g = _rand(shape, seed=shape[0])
    m = decode_gif(encode_gif(g))
    assert (m["width"], m["height"], m["n_frames"]) == (
        shape[1], shape[0], 1)
    assert np.array_equal(m["_pixels"], np.repeat(g[:, :, None], 3, 2))


def test_gif_multiframe_and_dict_growth():
    frames = _rand((4, 40, 50), seed=11)
    m = decode_gif(encode_gif(frames))
    assert m["n_frames"] == 4
    for i in range(4):
        assert np.array_equal(
            m["_frames"][i], np.repeat(frames[i][:, :, None], 3, 2))


def test_gif_interlace_transparency_and_subframe():
    """Hand-built GIF89a: a 4x4 full frame, then an INTERLACED 4x2
    sub-frame at (0, 2) whose transparent pixels keep the canvas —
    exercises deinterlacing, graphic-control transparency, and frame
    composition in one blob."""
    from lsh_spark.multimodal.containers import _lzw_encode

    pal = bytes(v for g in range(4) for v in (g * 80, g * 80, g * 80))
    base = np.zeros((4, 4), np.uint8)
    sub = np.array([[1, 3, 3, 1], [3, 1, 1, 3]], np.uint8)  # rows 0,1
    # interlaced row order for height 2: pass1 row0, pass4 row1 — same
    # order as natural here, but the flag exercises the deinterleave
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)   # 4-entry GCT
    out += pal
    for idx, (fx, fy, fw, fh, fl, gce) in (
            (base, (0, 0, 4, 4, 0, None)),
            (sub, (0, 2, 4, 2, 0x40, 1))):   # interlaced, transparent=1
        if gce is not None:
            out += b"\x21\xf9\x04" + bytes([1, 0, 0, gce]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", fx, fy, fw, fh, fl)
        out += bytes([2])
        data = _lzw_encode(2, idx)
        out += bytes([len(data)]) + data + b"\x00"
    out += b"\x3b"
    m = decode_gif(bytes(out))
    assert m["n_frames"] == 2
    want = np.zeros((4, 4, 3), np.uint8)
    want[2] = [[0] * 3, [240] * 3, [240] * 3, [0] * 3]
    want[3] = [[240] * 3, [0] * 3, [0] * 3, [240] * 3]
    # transparent index 1 keeps the black canvas
    want[2][0] = want[2][3] = [0, 0, 0]
    want[3][1] = want[3][2] = [0, 0, 0]
    assert np.array_equal(m["_frames"][1], want)


def test_gif_rgb_quantizer_bounds():
    px = _rand((9, 7, 3), seed=3)
    m = decode_gif(encode_gif_rgb(px))
    assert (m["width"], m["height"]) == (7, 9)
    # 6/7/6 cube: worst-case per-channel error is half a level step
    err = np.abs(m["_pixels"].astype(int) - px.astype(int)).max()
    assert err <= 26


def test_gif_corrupt_raises_foreign_none():
    good = encode_gif(_rand((5, 5)))
    with pytest.raises(ValueError):
        decode_gif(good[:20])
    trunc = bytearray(good)
    with pytest.raises(ValueError):
        decode_gif(bytes(trunc[:-10]))
    assert decode_gif(b"JIF89a") is None
    assert decode_gif(None) is None


# --- pipeline wiring -------------------------------------------------------


def test_extract_features_decodes_wav_bmp_gif(spark):
    from lsh_spark.multimodal.media import MEDIA_SCHEMA, extract_features

    s = _rand((1234,), dtype=np.int16, lo=-1000, hi=1000)
    bmp_px = _rand((11, 13, 3), seed=5)
    gif_fr = _rand((3, 6, 7), seed=6)
    rows = [
        (1, "audio", bytearray(encode_wav(s)), "audio/wav"),
        (2, "image", bytearray(encode_bmp(bmp_px)), "image/bmp"),
        (3, "video", bytearray(encode_gif(gif_fr)), "image/gif"),
        (4, "audio", bytearray(b"ID3 opaque mp3 bytes"), "audio/mpeg"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert out[1].n_frames == 1234                     # real sample count
    assert (out[2].width, out[2].height) == (13, 11)   # real BMP dims
    assert (out[3].width, out[3].height, out[3].n_frames) == (7, 6, 3)
    assert out[4].n_frames is not None                 # stub fallback


def test_resize_images_reencodes_bmp_and_gif(spark):
    from lsh_spark.multimodal.media import MEDIA_SCHEMA, resize_images

    bmp_px = _rand((8, 8, 3), seed=7)
    gif_g = _rand((8, 8), seed=8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(bmp_px)), "image/bmp"),
         (2, "image", bytearray(encode_gif(gif_g)), "image/gif")],
        MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           resize_images(media, width=4, height=4).collect()}
    m = decode_bmp(bytes(out[1].content))
    assert np.array_equal(m["_pixels"], bmp_px[::2, ::2, :])
    g = decode_gif(bytes(out[2].content))
    assert (g["width"], g["height"]) == (4, 4)
    # gray pixels sit exactly on the 6x7x6 cube only by luck; bound it
    want = np.repeat(gif_g[::2, ::2, None], 3, 2)
    assert np.abs(g["_pixels"].astype(int) - want.astype(int)).max() <= 26


def test_sample_frames_from_animated_gif(spark):
    from lsh_spark.multimodal.media import (
        MEDIA_SCHEMA,
        decode_raw_image,
        sample_frames,
    )

    frames = _rand((5, 6, 7), seed=9)
    media = spark.createDataFrame(
        [(1, "video", bytearray(encode_gif(frames)), "image/gif")],
        MEDIA_SCHEMA)
    out = sorted(sample_frames(media, every_nth=2).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 4]
    got = decode_raw_image(bytes(out[1].frame))
    assert np.array_equal(got["_pixels"],
                          np.repeat(frames[2][:, :, None], 3, 2))


# --- perceptual hashing ----------------------------------------------------


def test_dhash_robust_to_reencode_and_noise(spark):
    """dHash must match EXACTLY across formats for identical pixels
    (PNG vs BMP re-encode), stay within a small Hamming distance under
    mild noise, and separate a different image — the property exact
    digest dedup lacks."""
    from lsh_spark.multimodal.media import MEDIA_SCHEMA
    from lsh_spark.multimodal.phash import dhash_images
    from lsh_spark.multimodal.png import encode_png

    rng = np.random.default_rng(12)
    # smooth gradient: perceptual hashes are about structure, not noise
    yy, xx = np.mgrid[0:32, 0:32]
    base = ((xx * 5 + yy * 2) % 256).astype(np.uint8)[:, :, None]
    base = np.repeat(base, 3, axis=2)
    noisy = base.astype(int) + rng.integers(-6, 7, base.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, base.shape, dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_png(base)), "image/png"),
        (2, "image", bytearray(encode_bmp(base)), "image/bmp"),
        (3, "image", bytearray(encode_bmp(noisy)), "image/bmp"),
        (4, "image", bytearray(encode_bmp(other)), "image/bmp"),
        (5, "image", bytearray(b"undecodable"), "image/webp"),
        (6, "audio", bytearray(encode_wav(np.zeros(10, np.int16))), "a/w"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r.dhash for r in dhash_images(media).collect()}
    assert out[1] == out[2]                      # format-independent
    assert out[1] is not None
    ham = bin((out[1] ^ out[3]) & (2**64 - 1)).count("1")
    assert ham <= 3                              # mild noise: near
    ham_other = bin((out[1] ^ out[4]) & (2**64 - 1)).count("1")
    assert ham_other > 10                        # different image: far
    assert out[5] is None and out[6] is None     # foreign / non-image


def test_image_near_dup_pairs_pigeonhole(spark):
    from lsh_spark.multimodal.media import MEDIA_SCHEMA
    from lsh_spark.multimodal.phash import image_near_dup_pairs

    rng = np.random.default_rng(13)
    yy, xx = np.mgrid[0:24, 0:24]
    base = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    near = np.clip(base.astype(int)
                   + rng.integers(-5, 6, base.shape), 0, 255).astype(
        np.uint8)
    far = rng.integers(0, 256, base.shape, dtype=np.uint8)
    rows = [(i, "image", bytearray(encode_bmp(px[:, :, None])), "image/bmp")
            for i, px in ((1, base), (2, base), (3, near), (4, far))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_near_dup_pairs(media).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_hamming_block_pairs_general_distance(spark):
    """The generalized pigeonhole must be EXACT past distance 3 — the
    case a fixed 4x16 split silently loses: signatures differing by one
    bit in each of 4 sixteen-bit quarters share no quarter, but DO
    share one of the 6 blocks at max_hamming=5."""
    import pytest as _pytest

    from lsh_spark.operators.hamming import hamming_block_pairs

    a = 0
    b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)   # one bit per quarter
    sigs = spark.createDataFrame([(1, a), (2, b), (3, 0x7F)],
                                 "__id long, __sig long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in hamming_block_pairs(sigs, max_hamming=5).collect()}
    assert got[(1, 2)] == 4            # recovered despite 4 spread bits
    assert (1, 3) not in got           # hamming 7 > 5
    # exact-duplicate mode and the out-of-range guard
    dup = spark.createDataFrame([(1, 42), (2, 42), (3, 43)],
                                "__id long, __sig long")
    got0 = {(r.id_a, r.id_b) for r in
            hamming_block_pairs(dup, max_hamming=0).collect()}
    assert got0 == {(1, 2)}
    with _pytest.raises(ValueError, match="out of"):
        hamming_block_pairs(sigs, max_hamming=33)


def test_audio_signal_stats_exact_and_null_contract(spark):
    """audio_signal_stats: exact integer stats for PCM16 WAV, channel-0
    convention for stereo, NULLs for non-audio / undecodable / float
    rows."""
    import numpy as np

    from lsh_spark.multimodal.audio import audio_signal_stats
    from lsh_spark.multimodal.containers import encode_wav

    mono = np.array([3, -4, 0, 5], dtype="<i2")       # 2 sign changes:
    # neg flags = F T F F -> changes at 1->2 and 2? (F,T)(T,F)(F,F) = 2
    stereo = np.array([[-1, 100], [2, -100], [-3, 100]], dtype="<i2")
    rows = [
        (1, "audio", bytearray(encode_wav(mono)), "audio/wav"),
        (2, "audio", bytearray(encode_wav(stereo)), "audio/wav"),
        (3, "audio", bytearray(b"not a wav at all"), "audio/wav"),
        (4, "image", bytearray(encode_wav(mono)), "audio/wav"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string")
    got = {r.media_id: r for r in audio_signal_stats(df).collect()}
    assert (got[1].n_samples, got[1].sum_sq, got[1].n_sign_changes,
            got[1].peak) == (4, 9 + 16 + 0 + 25, 2, 5)
    # stereo: channel 0 = [-1, 2, -3]
    assert (got[2].n_samples, got[2].sum_sq, got[2].n_sign_changes,
            got[2].peak) == (3, 1 + 4 + 9, 2, 3)
    assert got[3].n_samples is None and got[3].sum_sq is None
    assert got[4].n_samples is None


def test_tiff_round_trip_both_orders_and_refusals():
    """TIFF codec: gray/RGB round-trips in both byte orders,
    photometric-0 inversion, multi-strip assembly, and the refusal
    contract (compression, 16-bit, planar, foreign magic)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    rng = np.random.RandomState(7)
    for shape in ((3, 9), (6, 4, 3)):
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for bo in ("<", ">"):
            m = decode_tiff(encode_tiff(px, byteorder=bo))
            assert (m["_pixels"] == px).all()
            assert (m["width"], m["height"]) == (px.shape[1], px.shape[0])

    def patch_entry(blob, tag, payload4):
        b = bytearray(blob)
        bo = "<" if blob[:2] == b"II" else ">"
        (n,) = struct.unpack(bo + "H", blob[8:10])
        for i in range(n):
            off = 10 + 12 * i
            t, = struct.unpack(bo + "H", blob[off:off + 2])
            if t == tag:
                b[off + 8:off + 12] = payload4
                return bytes(b)
        raise AssertionError(f"tag {tag} not found")

    gray = encode_tiff(np.array([[10, 250]], dtype=np.uint8))
    inv = decode_tiff(patch_entry(gray, 262, struct.pack("<H", 0)
                                  .ljust(4, b"\x00")))
    assert inv["_pixels"].tolist() == [[245, 5]]
    # new-style JPEG (7) is supported since r15; old-style (6) refuses
    with _pytest.raises(ValueError, match="compression"):
        decode_tiff(patch_entry(gray, 259, struct.pack("<H", 6)
                                .ljust(4, b"\x00")))  # old-style JPEG
    # 16-bit gray is supported since r15 — an unsupported DEPTH now
    # means e.g. 12-bit (and 16-bit-patched-8-bit data trips the
    # truncation check instead, exercised in the 16-bit tests)
    with _pytest.raises(ValueError, match="8-bit"):
        decode_tiff(patch_entry(gray, 258, struct.pack("<H", 12)
                                .ljust(4, b"\x00")))
    assert decode_tiff(b"not a tiff at all") is None

    # multi-strip: split the 1-strip gray file into two strips by
    # rewriting 273/279 as 2-element arrays appended to the blob
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = encode_tiff(px)
    data_off = blob.index(px.tobytes())
    ext = len(blob)
    offs = struct.pack("<II", data_off, data_off + 4)
    cnts = struct.pack("<II", 4, 8)
    blob2 = blob + offs + cnts
    blob2 = patch_entry(blob2, 273, struct.pack("<I", ext))
    b = bytearray(blob2)
    # fix count fields of 273/279 to 2 and point them at the arrays
    for tag, payload_off in ((273, ext), (279, ext + 8)):
        for i in range(9):
            off = 10 + 12 * i
            t, = struct.unpack("<H", bytes(b[off:off + 2]))
            if t == tag:
                b[off + 4:off + 8] = struct.pack("<I", 2)
                b[off + 8:off + 12] = struct.pack("<I", payload_off)
    m = decode_tiff(bytes(b))
    assert (m["_pixels"] == px).all()


def test_image_pixel_stats_null_and_passthrough(spark):
    """image_pixel_stats: undecodable payloads and NULL content yield
    NULL stats; id-column passthrough preserves extra id columns."""
    import numpy as np

    from lsh_spark.multimodal.containers import encode_bmp
    from lsh_spark.multimodal.media import image_pixel_stats

    px = np.full((2, 2, 3), 7, dtype=np.uint8)
    rows = [
        (1, 0, bytearray(encode_bmp(px))),
        (2, 1, bytearray(b"garbage bytes, no codec magic")),
        (3, 2, None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, frame binary")
    got = {r.media_id: r for r in image_pixel_stats(
        df, content_col="frame",
        id_cols=("media_id", "frame_idx")).collect()}
    assert (got[1].px_sum, got[1].px_min, got[1].px_max,
            got[1].frame_idx) == (84, 7, 7, 0)
    assert got[2].px_sum is None and got[2].frame_idx == 1
    assert got[3].px_sum is None and got[3].frame_idx == 2


# ---------------------------------------------------------------------------
# MP3 header walk
# ---------------------------------------------------------------------------


def test_mp3_round_trip_v1():
    from lsh_spark.multimodal.containers import decode_mp3, encode_mp3_frames

    c = encode_mp3_frames(version=1, sr_idx=0, mono=True,
                          bitrate_indices=[1, 5, 14], paddings=[0, 1, 0],
                          id3_len=7)
    # hand-computed: frames 144000*{32,64,320}//44100 = {104,208,1044}
    # (+1 pad on the middle one) + 17-byte ID3 = 1374
    assert len(c) == 17 + 104 + 209 + 1044
    m = decode_mp3(c)
    assert m["_mpeg_version"] == 1 and m["_layer"] == 3
    assert m["_sample_rate"] == 44100 and m["_channels"] == 1
    assert m["_mpeg_frames"] == 3 and m["n_frames"] == 3 * 1152
    assert m["_bitrate_sum_kbps"] == 32 + 64 + 320


def test_mp3_round_trip_v2_stereo_no_id3():
    from lsh_spark.multimodal.containers import decode_mp3, encode_mp3_frames

    c = decode_mp3(encode_mp3_frames(version=2, sr_idx=2, mono=False,
                                     bitrate_indices=[3, 3],
                                     paddings=[1, 1]))
    assert c["_sample_rate"] == 16000 and c["_channels"] == 2
    assert c["n_frames"] == 2 * 576          # MPEG-2 Layer III spf
    assert c["_bitrate_sum_kbps"] == 48


def test_mp3_layer1_slot_padding():
    """Layer I pads in 4-byte slots: frame = (12000*kbps//rate + pad)*4."""
    from lsh_spark.multimodal.containers import decode_mp3, encode_mp3_frames

    c = encode_mp3_frames(version=1, layer=1, sr_idx=1, mono=True,
                          bitrate_indices=[4], paddings=[1])
    # V1 L1 index 4 -> 128 kbps @ 48000: (12000*128//48000 + 1)*4 = 132
    assert len(c) == 132
    m = decode_mp3(c)
    assert m["_layer"] == 1 and m["n_frames"] == 384


def test_mp3_foreign_and_corrupt():
    import pytest

    from lsh_spark.multimodal.containers import decode_mp3, encode_mp3_frames

    assert decode_mp3(b"not audio at all") is None
    assert decode_mp3(b"RIFF\x00\x00\x00\x00WAVE") is None
    good = encode_mp3_frames(version=1, sr_idx=0, mono=True,
                             bitrate_indices=[2, 2], paddings=[0, 0])
    with pytest.raises(ValueError, match="truncated frame"):
        decode_mp3(good[:-5])
    with pytest.raises(ValueError, match="lost frame sync"):
        decode_mp3(good + b"junk")
    # free bitrate (index 0) rejected
    bad = bytearray(good)
    bad[2] = bad[2] & 0x0F
    with pytest.raises(ValueError, match="free/bad bitrate"):
        decode_mp3(bytes(bad))
    # reserved samplerate index rejected
    bad = bytearray(good)
    bad[2] = bad[2] | 0x0C
    with pytest.raises(ValueError, match="reserved samplerate"):
        decode_mp3(bytes(bad))
    # mid-stream parameter change rejected (flip 2nd frame to stereo)
    two = encode_mp3_frames(version=1, sr_idx=0, mono=True,
                            bitrate_indices=[2, 2], paddings=[0, 0])
    flen = len(two) // 2
    bad = bytearray(two)
    bad[flen + 3] = 0x00
    with pytest.raises(ValueError, match="changed mid-stream"):
        decode_mp3(bytes(bad))


def test_mp3_id3_garbage_after_tag():
    import pytest

    from lsh_spark.multimodal.containers import decode_mp3

    # valid ID3 header but no frame sync after it: corrupt, not foreign
    tag = b"ID3" + bytes((4, 0, 0, 0, 0, 0, 2)) + b"\x00\x00" + b"XXXX"
    with pytest.raises(ValueError, match="no frame sync after ID3"):
        decode_mp3(tag)


# ---------------------------------------------------------------------------
# MP4 box walk
# ---------------------------------------------------------------------------


def test_mp4_round_trip_multitrack():
    from lsh_spark.multimodal.containers import decode_mp4, encode_mp4

    c = encode_mp4(major_brand="mp42", compat_brands=("mp41", "iso2"),
                   timescale=1000, duration=12345,
                   tracks=(("vide", 320, 240, 90000),
                           ("soun", 0, 0, 44100),
                           ("soun", 0, 0, 8000)))
    # closed-form box sizes: ftyp 16+4*2, moov hdr 8, mvhd 108, trak 185
    assert len(c) == 24 + 8 + 108 + 3 * 185
    m = decode_mp4(c)
    assert m["_major_brand"] == "mp42"
    assert (m["_timescale"], m["_duration"]) == (1000, 12345)
    assert (m["width"], m["height"]) == (320, 240)
    assert (m["_n_tracks"], m["_n_video_tracks"],
            m["_n_audio_tracks"]) == (3, 1, 2)
    assert m["n_frames"] is None  # sample tables out of scope


def test_mp4_audio_only_and_unknown_handler():
    from lsh_spark.multimodal.containers import decode_mp4, encode_mp4

    m = decode_mp4(encode_mp4(tracks=(("soun", 0, 0, 8000),
                                      ("meta", 0, 0, 90000))))
    assert m["width"] is None and m["height"] is None
    assert (m["_n_tracks"], m["_n_video_tracks"],
            m["_n_audio_tracks"]) == (2, 0, 1)


def test_mp4_largesize_and_size0_boxes():
    """size==1 (64-bit largesize) and size==0 (to-EOF, last top-level
    box) both walk; a size-0 box below top level raises."""
    import struct

    from lsh_spark.multimodal.containers import decode_mp4, encode_mp4

    c = encode_mp4()
    # split at the moov boundary: ftyp is 16+4 = 20 bytes
    ftyp, moov = c[:20], c[20:]
    # rewrite moov as a largesize box: size=1 + 64-bit size (8 extra)
    large = (struct.pack(">I", 1) + b"moov"
             + struct.pack(">Q", len(moov) + 8) + moov[8:])
    m = decode_mp4(ftyp + large)
    assert m["_n_tracks"] == 1 and m["_timescale"] == 600
    # size-0 moov (extends to EOF) at top level is legal
    zero = struct.pack(">I", 0) + b"moov" + moov[8:]
    assert decode_mp4(ftyp + zero)["_n_tracks"] == 1
    # size-0 below top level is not
    mvhd_start = 8
    bad = bytearray(moov)
    bad[mvhd_start:mvhd_start + 4] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="size-0 box below top level"):
        decode_mp4(ftyp + bytes(bad))


def test_mp4_foreign_and_corrupt():
    from lsh_spark.multimodal.containers import decode_mp4, encode_mp4

    assert decode_mp4(b"not a video") is None
    assert decode_mp4(b"\x89PNG\r\n\x1a\n") is None
    good = encode_mp4(tracks=(("vide", 64, 48, 90000),))
    with pytest.raises(ValueError, match="overruns buffer"):
        decode_mp4(good[:-5])
    with pytest.raises(ValueError, match="no moov"):
        decode_mp4(good.replace(b"moov", b"mooX"))
    with pytest.raises(ValueError, match="missing tkhd/mdhd/hdlr"):
        decode_mp4(good.replace(b"hdlr", b"hdlX"))
    with pytest.raises(ValueError, match="duplicate moov"):
        decode_mp4(good + good[20:])
    # box sizes must tile their parent exactly: a shrunken trak makes
    # its inner mdia overrun the (now too-small) parent span
    bad = bytearray(good)
    trak_at = good.index(b"trak") - 4
    bad[trak_at:trak_at + 4] = struct.pack(
        ">I", int.from_bytes(good[trak_at:trak_at + 4], "big") - 4)
    with pytest.raises(ValueError, match="overruns buffer"):
        decode_mp4(bytes(bad))


# ---------------------------------------------------------------------------
# codec round-trip properties
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    version=st.sampled_from([1, 2, 25]),
    layer=st.sampled_from([1, 2, 3]),
    sr_idx=st.integers(0, 2),
    mono=st.booleans(),
    frames=st.lists(st.tuples(st.integers(1, 14), st.integers(0, 1)),
                    min_size=1, max_size=8),
    id3_len=st.one_of(st.none(), st.integers(0, 64)),
)
def test_mp3_roundtrip_property(version, layer, sr_idx, mono, frames,
                                id3_len):
    """encode_mp3_frames -> decode_mp3 is the identity on every stream
    parameter the header walk reads, across all version/layer grids."""
    from lsh_spark.multimodal.containers import (
        _MP3_BITRATES,
        _mp3_spf,
        decode_mp3,
        encode_mp3_frames,
    )

    bis, pads = [f[0] for f in frames], [f[1] for f in frames]
    c = encode_mp3_frames(version=version, layer=layer, sr_idx=sr_idx,
                          mono=mono, bitrate_indices=bis, paddings=pads,
                          id3_len=id3_len)
    m = decode_mp3(c)
    assert m["_mpeg_version"] == version and m["_layer"] == layer
    assert m["_channels"] == (1 if mono else 2)
    assert m["_mpeg_frames"] == len(frames)
    assert m["n_frames"] == len(frames) * _mp3_spf(version, layer)
    grp = 1 if version == 1 else 2
    assert m["_bitrate_sum_kbps"] == sum(
        _MP3_BITRATES[grp, layer][b - 1] for b in bis)


@settings(max_examples=60, deadline=None)
@given(
    brand=st.sampled_from(["isom", "mp42", "avc1"]),
    n_compat=st.integers(1, 4),
    timescale=st.integers(1, 1_000_000),
    duration=st.integers(0, 2**31 - 1),
    tracks=st.lists(
        st.tuples(st.sampled_from(["vide", "soun", "meta"]),
                  st.integers(0, 4096), st.integers(0, 4096),
                  st.integers(1, 96000)),
        min_size=0, max_size=5),
)
def test_mp4_roundtrip_property(brand, n_compat, timescale, duration,
                                tracks):
    """encode_mp4 -> decode_mp4 is the identity on brand, movie
    header, track-kind counts, first-video dimensions, and the
    closed-form byte length."""
    from lsh_spark.multimodal.containers import decode_mp4, encode_mp4

    c = encode_mp4(major_brand=brand, compat_brands=("mp41",) * n_compat,
                   timescale=timescale, duration=duration, tracks=tracks)
    assert len(c) == 16 + 4 * n_compat + 8 + 108 + 185 * len(tracks)
    m = decode_mp4(c)
    assert m["_major_brand"] == brand
    assert m["_timescale"] == timescale and m["_duration"] == duration
    assert m["_n_tracks"] == len(tracks)
    assert m["_n_video_tracks"] == sum(1 for t in tracks if t[0] == "vide")
    assert m["_n_audio_tracks"] == sum(1 for t in tracks if t[0] == "soun")
    vids = [t for t in tracks if t[0] == "vide"]
    if vids:
        assert (m["width"], m["height"]) == (vids[0][1], vids[0][2])
    else:
        assert m["width"] is None and m["height"] is None


# ---------------------------------------------------------------------------
# PackBits-compressed TIFF (compression 32773)
# ---------------------------------------------------------------------------

def test_packbits_spec_golden():
    """The classic Apple PackBits worked example, byte for byte — pins
    the decoder against the published spec rather than our encoder."""
    from lsh_spark.multimodal.containers import (_packbits_decode,
                                                 _packbits_encode)

    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    want = (b"\xAA\xAA\xAA\x80\x00\x2A\xAA\xAA\xAA\xAA\x80\x00\x2A\x22"
            + b"\xAA" * 10)
    assert _packbits_decode(enc) == want
    # our encoder round-trips the same payload (not necessarily the
    # same bytes — the spec allows many encodings)
    assert _packbits_decode(_packbits_encode(want)) == want
    # -128 is a spec no-op
    assert _packbits_decode(bytes([0x80, 0x00, 0x41])) == b"A"


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("rps", [None, 3])
def test_tiff_packbits_round_trip(bo, rps):
    """PackBits and multi-strip layouts decode to the identical pixels
    as the single-strip uncompressed form, both byte orders."""
    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    rng = np.random.default_rng(7)
    for shape in [(7, 9), (10, 6, 3)]:
        px = rng.integers(0, 5, size=shape, dtype=np.uint8) * 50
        base = decode_tiff(encode_tiff(px, byteorder=bo))["_pixels"]
        pb = decode_tiff(encode_tiff(
            px, byteorder=bo, compression="packbits",
            rows_per_strip=rps))["_pixels"]
        assert np.array_equal(base, pb)


def test_tiff_unsupported_compressions_still_refused():
    """Compressions beyond none/PackBits/LZW/new-style-JPEG keep the
    refusal contract (stub fallback) — old-style JPEG (6) and Deflate
    (8) as representatives; a compression-7 file whose strips are NOT
    JPEG streams raises rather than yielding garbage."""
    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    base = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
    # compression tag (259) short value sits in the IFD; patch 1 -> n
    idx = base.index(bytes.fromhex("03010300"))  # tag 259, type 3, ...
    for code in (6, 8):
        blob = bytearray(base)
        blob[idx + 8] = code
        with pytest.raises(ValueError, match="compression"):
            decode_tiff(bytes(blob))
    blob = bytearray(base)
    blob[idx + 8] = 7  # comp 7 but raw (non-JPEG) strip bytes
    with pytest.raises(ValueError, match="not a JPEG stream"):
        decode_tiff(bytes(blob))


def test_tiff_lzw_spec_vector():
    """Bit-exact TIFF6 LZW pin (hand-computed, NOT a round-trip — a
    self-consistent wrong variant would round-trip fine): input
    07 07 07 08 08 07 encodes to codes (256, 7, 258, 8, 8, 7, 257) at
    width 9, MSB-first → 80 01 E0 40 80 40 1E 02."""
    from lsh_spark.multimodal.containers import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    data = bytes([7, 7, 7, 8, 8, 7])
    want = bytes([0x80, 0x01, 0xE0, 0x40, 0x80, 0x40, 0x1E, 0x02])
    assert _tiff_lzw_encode(data) == want
    assert _tiff_lzw_decode(want) == data


def test_tiff_lzw_early_change_boundaries():
    """Round-trips across every width transition (9→10→11→12 at the
    decoder's 510/1022/2046 vs the encoder's 511/1023/2047 — the
    documented early-change asymmetry) and across a table-full
    re-clear at 4094."""
    import random

    from lsh_spark.multimodal.containers import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = random.Random(14)
    for size in (500, 1500, 4000, 80000):  # 80k crosses several clears
        d = bytes(rng.randrange(256) for _ in range(size))
        assert _tiff_lzw_decode(_tiff_lzw_encode(d)) == d
    for d in (b"", b"\x00", b"abcabcabd" * 5000, bytes(256) * 100):
        assert _tiff_lzw_decode(_tiff_lzw_encode(d)) == d


def _de_bruijn_pair_prefix(n: int) -> bytes:
    """Prefix of the lexicographic de Bruijn sequence B(256, 2): the
    first n−1 adjacent byte pairs are all distinct, so the encoder
    emits one new table entry per byte and the phantom post-encode
    next_code lands exactly at 258 + n."""
    k = 256
    seq: list[int] = []
    a = [0] * (k * 2)

    def db(t: int, p: int) -> None:
        if len(seq) > n + 4:
            return
        if t > 2:
            if 2 % p == 0:
                seq.extend(a[1 : p + 1])
        else:
            a[t] = a[t - p]
            db(t + 1, p)
            for j in range(a[t - p] + 1, k):
                a[t] = j
                db(t + 1, t)

    db(1, 1)
    return bytes(seq[:n])


def test_tiff_jpeg_in_tiff_round_trip():
    """Compression-7 (new-style JPEG) strips, encoded with the real
    baseline JPEG encoder (all-ones quant): 8×8-block-constant inputs
    are DC-only so grayscale round-trips EXACTLY; RGB pays only the
    YCbCr↔RGB integer rounding (±1/channel).  Single- and multi-strip
    layouts; photometric 6 for RGB, 1 for gray."""
    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    rng = np.random.RandomState(22)

    def blocky(h, w, c=None):
        bh, bw = (h + 7) // 8, (w + 7) // 8
        if c is None:
            base = rng.randint(0, 256, size=(bh, bw)).astype(np.uint8)
            return np.kron(base, np.ones((8, 8), dtype=np.uint8))[:h, :w]
        base = rng.randint(0, 256, size=(bh, bw, c)).astype(np.uint8)
        return np.kron(base, np.ones((8, 8, 1), dtype=np.uint8))[:h, :w, :]

    for shape in ((24, 16), (19, 13)):
        px = blocky(*shape)
        for rps in (None, 8):
            m = decode_tiff(encode_tiff(px, compression="jpeg",
                                        rows_per_strip=rps))
            assert np.array_equal(m["_pixels"], px)
    for shape in ((24, 16, 3), (19, 13, 3)):
        px = blocky(*shape)
        for rps in (None, 8):
            m = decode_tiff(encode_tiff(px, compression="jpeg",
                                        rows_per_strip=rps))
            d = np.abs(m["_pixels"].astype(int) - px.astype(int))
            assert d.max() <= 1
    with pytest.raises(ValueError, match="JPEG strips are 8-bit"):
        encode_tiff(np.zeros((8, 8), dtype=np.uint16), compression="jpeg")
    with pytest.raises(ValueError, match="predictor does not apply"):
        encode_tiff(np.zeros((8, 8), dtype=np.uint8), compression="jpeg",
                    predictor=2)


def test_tiff_jpeg_tables_splice():
    """Tag-347 JPEGTables layout: DQT/DHT segments move into a shared
    abbreviated stream (SOI <tables> EOI) and the strips keep only
    SOF/SOS — the decoder splices tables after each strip's SOI, and
    the result matches the self-contained file pixel-for-pixel."""
    import struct

    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff
    from lsh_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.RandomState(5)
    base = rng.randint(0, 256, size=(3, 2)).astype(np.uint8)
    px = np.kron(base, np.ones((8, 8), dtype=np.uint8))  # (24, 16) gray
    want = decode_tiff(encode_tiff(px, compression="jpeg"))["_pixels"]

    jb = encode_jpeg(px)
    # marker walk: split table segments (DQT 0xDB / DHT 0xC4) from the rest
    tables = bytearray()
    rest = bytearray(jb[:2])
    pos = 2
    while True:
        assert jb[pos] == 0xFF
        mk = jb[pos + 1]
        if mk == 0xDA:          # SOS + entropy through (excl.) EOI
            rest += jb[pos:len(jb) - 2]
            break
        ln = struct.unpack(">H", jb[pos + 2:pos + 4])[0]
        seg = jb[pos:pos + 2 + ln]
        (tables if mk in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + ln
    strip = bytes(rest) + b"\xff\xd9"
    tbl_stream = b"\xff\xd8" + bytes(tables) + b"\xff\xd9"
    assert len(strip) < len(jb)  # tables really moved out

    # minimal little-endian TIFF: 10 tags incl. 347
    def short(v):
        return struct.pack("<H", v).ljust(4, b"\x00")

    def entry(tag, typ, cnt, payload):
        return struct.pack("<HHI", tag, typ, cnt) + payload

    n_tags = 10
    ifd_size = 2 + n_tags * 12 + 4
    tbl_off = 8 + ifd_size
    strip_off = tbl_off + len(tbl_stream)
    entries = [
        entry(256, 4, 1, struct.pack("<I", 16)),
        entry(257, 4, 1, struct.pack("<I", 24)),
        entry(258, 3, 1, short(8)),
        entry(259, 3, 1, short(7)),
        entry(262, 3, 1, short(1)),
        entry(273, 4, 1, struct.pack("<I", strip_off)),
        entry(277, 3, 1, short(1)),
        entry(278, 4, 1, struct.pack("<I", 24)),
        entry(279, 4, 1, struct.pack("<I", len(strip))),
        entry(347, 7, len(tbl_stream), struct.pack("<I", tbl_off)),
    ]
    blob = (b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", n_tags) + b"".join(entries)
            + struct.pack("<I", 0) + tbl_stream + strip)
    m = decode_tiff(blob)
    assert np.array_equal(m["_pixels"], want)
    assert np.array_equal(m["_pixels"], px)


def test_tiff_16bit_gray_round_trip():
    """16-bit unsigned grayscale (the common scientific-TIFF case):
    native-dtype pixel model — ``_pixels`` comes back uint16 with
    ``bit_depth: 16`` — across both byte orders, all three
    compressions, predictor 1/2 (per-SAMPLE differencing mod 65536)
    and multi-strip layouts."""
    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    rng = np.random.default_rng(15)
    px = rng.integers(0, 65536, size=(11, 7), dtype=np.uint16)
    for bo in ("<", ">"):
        for comp in ("none", "packbits", "lzw"):
            for pred in (1, 2):
                for rps in (None, 3):
                    m = decode_tiff(encode_tiff(
                        px, byteorder=bo, compression=comp,
                        predictor=pred, rows_per_strip=rps))
                    assert m["bit_depth"] == 16
                    assert m["_pixels"].dtype == np.uint16
                    assert np.array_equal(m["_pixels"], px)


def test_tiff_16bit_white_is_zero_and_refusals():
    """Photometric 0 inverts at the 16-bit scale (65535 − v); signed
    SampleFormat and 16-bit RGB raise; an 8-bit dict carries no
    bit_depth key (absent = 8)."""
    import struct

    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    px = (np.arange(24, dtype=np.uint16) * 2749).reshape(4, 6)
    blob = bytearray(encode_tiff(px, byteorder="<"))
    i = blob.find(struct.pack("<HHI", 262, 3, 1))
    blob[i + 8] = 0  # photometric 1 → 0 (white-is-zero)
    m = decode_tiff(bytes(blob))
    assert np.array_equal(m["_pixels"],
                          (65535 - px.astype(np.int32)).astype(np.uint16))
    with pytest.raises(ValueError, match="16-bit input must be grayscale"):
        encode_tiff(np.zeros((2, 2, 3), dtype=np.uint16))
    assert "bit_depth" not in decode_tiff(
        encode_tiff(np.zeros((2, 2), dtype=np.uint8)))


def test_tiff_lzw_post_encode_phantom_boundaries():
    """The final data code grows the DECODER's table by one entry; when
    that lands exactly on an early-change boundary (510/1022/2046) the
    decoder widens before reading EOI, so the encoder must apply the
    same phantom next_code bump (libtiff LZWPostEncode) — and at 4094
    the phantom re-clear.  Exact-length all-distinct-pair inputs land
    the phantom next_code on 511/1023/2047/4094 (pre-fix, 253 raised
    'LZW code out of range' on the encoder's own output)."""
    from lsh_spark.multimodal.containers import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    for n in (253, 765, 1789, 3836):
        d = _de_bruijn_pair_prefix(n)
        assert len(set(zip(d, d[1:]))) == n - 1
        assert _tiff_lzw_decode(_tiff_lzw_encode(d)) == d
        # one byte either side of the boundary stays green too
        for m in (n - 1, n + 1):
            dm = _de_bruijn_pair_prefix(m)
            assert _tiff_lzw_decode(_tiff_lzw_encode(dm)) == dm


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("rps", [None, 3])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_lzw_round_trip(bo, rps, pred):
    """LZW strips (with and without the horizontal-differencing
    predictor) decode to the identical pixels as the uncompressed
    form, both byte orders, single- and multi-strip; predictor 1
    writes no 317 tag so the default layout stays byte-identical."""
    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    rng = np.random.default_rng(7)
    for shape in [(7, 9), (10, 6, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_tiff(encode_tiff(px, byteorder=bo))["_pixels"]
        lz = decode_tiff(encode_tiff(
            px, byteorder=bo, compression="lzw",
            rows_per_strip=rps, predictor=pred))["_pixels"]
        assert np.array_equal(base, lz)
    assert b"\x3d\x01" not in encode_tiff(
        np.zeros((4, 4), np.uint8))[:80]  # no 317 tag on default path


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
def test_tiff_planar_round_trip(comp):
    """Planar configuration 2 (separate component planes, plane-major
    strips, tag 284) decodes to the identical pixels as the chunky
    form across every compression, with and without the predictor and
    multi-strip planes; gray input ignores the flag (one plane IS
    chunky).  The default chunky path writes no 284 tag."""
    import numpy as np

    from lsh_spark.multimodal.containers import decode_tiff, encode_tiff

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    base = decode_tiff(encode_tiff(px))["_pixels"]
    for bo in ("<", ">"):
        for pred in (1, 2):
            for rps in (None, 4):
                pl = decode_tiff(encode_tiff(
                    px, byteorder=bo, compression=comp, planar=True,
                    predictor=pred, rows_per_strip=rps))["_pixels"]
                assert np.array_equal(base, pl)
    gray = rng.integers(0, 256, size=(5, 5), dtype=np.uint8)
    g = decode_tiff(encode_tiff(gray, compression=comp,
                                planar=True))["_pixels"]
    assert np.array_equal(gray, g)
