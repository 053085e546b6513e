"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema contract, partition-preserving iteration,
batch shape) is real and tested.  Codec work is two-tier:

  * GENUINELY decoded, pure-stdlib/numpy (no external codec library):
    the RAW formats (RAWI/RAWA/RAWV — header specs below) plus PNG
    (``multimodal.png``), baseline JPEG (``multimodal.jpeg``), BMP, GIF
    (incl. animated multi-frame composition), uncompressed TIFF and
    RIFF/WAVE PCM (``multimodal.containers``) — full pixel/sample
    access, so resize (nearest-neighbor) and frame-sampling are real
    numpy math; MP3 (frame-header walk) and MP4 (ISO-BMFF box walk)
    decode METADATA (duration/rate/tracks/dimensions) without DSP.
    Wiring: ``_decode_image/_decode_audio/_decode_video`` below.
  * documented refusals: progressive JPEG, RLE-compressed BMP and
    compressed TIFF return None (foreign bytes) rather than guessing —
    swap in PIL/ffmpeg by registering a function with the same
    ``bytes -> dict`` contract in ``DECODERS``.

No media kind falls back to a digest stub anymore (rounds 6-7 replaced
the last of them); ``_decode`` keeps the digest-derived shape ONLY for
bytes no real decoder accepts, so foreign blobs still flow through the
pipeline deterministically instead of erroring mid-batch.

Design notes for 100 TB:
  * media bytes never pass through a shuffle — ``mapInPandas`` is a
    narrow transformation; only extracted features (small, typed) flow
    into joins/aggregations downstream;
  * the iterator-of-batches contract keeps peak memory at
    O(arrow_batch_size × avg_media_size) per task, independent of
    partition size;
  * metadata is a fixed struct so Catalyst can prune/push down on it
    without touching the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("content", BinaryType(), True),
    StructField("mime", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("digest", StringType(), True),
    StructField("width", IntegerType(), True),       # image/video
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),    # video/audio samples
])


# ---------------------------------------------------------------------------
# real decoders for documented uncompressed formats
#
# The container has no media libraries; the pure-stdlib codecs in
# ``multimodal.png`` / ``.jpeg`` / ``.containers`` genuinely decode
# PNG, baseline JPEG, BMP, GIF, RIFF/WAVE, TIFF, MPEG-audio (MP3)
# frame headers and ISO-BMFF (MP4) box trees (metadata, no DSP) — no
# common container remains stubbed.  These three RAW formats are the
# simplest
# genuinely-decoded layer — header parse, length validation, real
# pixel/sample math in numpy — so the full pipeline (decode → feature
# → resize → frame-sample) runs on real bytes end-to-end:
#
#   RAWI (image): b"RAWI" | width u16 LE | height u16 LE | channels u8
#                 | width*height*channels uint8 pixels (row-major, HWC)
#   RAWA (audio): b"RAWA" | sample_rate u32 LE | n_samples u32 LE
#                 | n_samples int16 LE PCM
#   RAWV (video): b"RAWV" | width u16 LE | height u16 LE | n_frames u16 LE
#                 | n_frames grayscale uint8 frames (row-major)
# ---------------------------------------------------------------------------

_RAWI_HDR = 9
_RAWA_HDR = 12
_RAWV_HDR = 10


def decode_raw_image(content: bytes) -> dict | None:
    """Parse a RAWI blob; None when the magic doesn't match (caller falls
    back), ValueError on a truncated payload (corrupt, not foreign)."""
    import numpy as np

    if content is None or content[:4] != b"RAWI":
        return None
    w = int.from_bytes(content[4:6], "little")
    h = int.from_bytes(content[6:8], "little")
    c = content[8]
    pixels = np.frombuffer(content, dtype=np.uint8, offset=_RAWI_HDR)
    if pixels.size != w * h * c:
        raise ValueError(
            f"RAWI payload {pixels.size} B != {w}x{h}x{c}")
    return {"width": w, "height": h, "n_frames": 1,
            "_pixels": pixels.reshape(h, w, c)}


def decode_raw_audio(content: bytes) -> dict | None:
    import numpy as np

    if content is None or content[:4] != b"RAWA":
        return None
    n = int.from_bytes(content[8:12], "little")
    samples = np.frombuffer(content, dtype="<i2", offset=_RAWA_HDR)
    if samples.size != n:
        raise ValueError(f"RAWA payload {samples.size} samples != {n}")
    return {"width": None, "height": None, "n_frames": n,
            "_samples": samples,
            "_sample_rate": int.from_bytes(content[4:8], "little")}


def decode_raw_video(content: bytes) -> dict | None:
    import numpy as np

    if content is None or content[:4] != b"RAWV":
        return None
    w = int.from_bytes(content[4:6], "little")
    h = int.from_bytes(content[6:8], "little")
    n = int.from_bytes(content[8:10], "little")
    frames = np.frombuffer(content, dtype=np.uint8, offset=_RAWV_HDR)
    if frames.size != w * h * n:
        raise ValueError(f"RAWV payload {frames.size} B != {w}x{h}x{n}")
    return {"width": w, "height": h, "n_frames": n,
            "_frames": frames.reshape(n, h, w)}


def _decode_image(content: bytes) -> dict | None:
    """Image decode chain: RAWI, then the REAL pure-stdlib codecs —
    PNG (``multimodal.png``), baseline JPEG (``multimodal.jpeg``), BMP
    and GIF (``multimodal.containers``).  None → foreign bytes."""
    meta = decode_raw_image(content)
    if meta is not None:
        return meta
    from .containers import decode_bmp, decode_gif, decode_tiff
    from .jpeg import decode_jpeg
    from .png import decode_png

    for dec in (decode_png, decode_jpeg, decode_bmp, decode_gif,
                decode_tiff):
        meta = dec(content)
        if meta is not None:
            return meta
    return None


def _decode_audio(content: bytes) -> dict | None:
    """Audio decode chain: RAWA, then REAL RIFF/WAVE PCM, then the
    MPEG audio (MP3) header walk — metadata only, no DSP
    (``multimodal.containers.decode_wav`` / ``decode_mp3``)."""
    meta = decode_raw_audio(content)
    if meta is not None:
        return meta
    from .containers import decode_mp3, decode_wav

    meta = decode_wav(content)
    if meta is not None:
        return meta
    return decode_mp3(content)


def _decode_video(content: bytes) -> dict | None:
    """Video decode chain: RAWV, then animated GIF (real multi-frame
    composition — ``n_frames``/``_frames`` come from actual image
    blocks), then the ISO-BMFF (MP4) box walk — metadata only
    (``multimodal.containers.decode_mp4``)."""
    meta = decode_raw_video(content)
    if meta is not None:
        return meta
    from .containers import decode_gif, decode_mp4

    meta = decode_gif(content)
    if meta is not None:
        return meta
    return decode_mp4(content)


_RAW_DECODERS = {
    "image": _decode_image,
    "audio": _decode_audio,
    "video": _decode_video,
}


def _decode(kind: str, content: bytes) -> dict:
    """RAW formats, PNG / baseline-JPEG / BMP / GIF images, WAV/MP3
    audio and GIF/MP4 video decode for real; anything else falls back
    to the deterministic stub (full MP3 PCM and MP4 sample decode need
    external libs).  Bytes that merely *start* with a known magic but
    fail validation are treated as foreign (stub fallback) — the batch
    pipeline must stay total; strict deployments call the ``decode_*``
    functions directly."""
    raw = _RAW_DECODERS.get(kind)
    try:
        meta = raw(content) if raw else None
    except ValueError:
        meta = None
    if meta is not None:
        return {k: v for k, v in meta.items() if not k.startswith("_")}
    return _stub_decode(kind, content)


def _stub_decode(kind: str, content: bytes) -> dict:
    """Deterministic fake decoder: derives plausible metadata from the
    byte content itself so tests are reproducible.  Replace via
    ``DECODERS[kind] = fn``."""
    if content is None:
        return {"width": None, "height": None, "n_frames": None}
    digest = hashlib.sha256(content).digest()
    if kind == "image":
        return {"width": 16 + digest[0] % 64, "height": 16 + digest[1] % 64,
                "n_frames": 1}
    if kind == "video":
        return {"width": 16 + digest[0] % 64, "height": 16 + digest[1] % 64,
                "n_frames": 1 + digest[2]}
    if kind == "audio":
        return {"width": None, "height": None, "n_frames": 1 + digest[3] * 100}
    raise NotImplementedError(f"no decoder for media kind {kind!r}")


DECODERS: dict[str, Callable[[str, bytes], dict]] = {
    "image": _decode,
    "audio": _decode,
    "video": _decode,
}


def extract_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURE_SCHEMA, one Arrow batch at a time."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r["content"]
                decoder = DECODERS.get(r["kind"], _stub_decode)
                meta = decoder(r["kind"], content)
                rows.append({
                    "media_id": r["media_id"],
                    "kind": r["kind"],
                    "n_bytes": len(content) if content is not None else None,
                    "digest": hashlib.sha256(content).hexdigest()
                    if content is not None else None,
                    **meta,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA DataFrame from the documents table (UTF-8 bytes
    as stand-in blobs) — the environment has no real media corpus; this
    exercises identical plumbing."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def synthesize_raw_media_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame whose blobs are REAL RAWI/RAWA/RAWV payloads
    (dimensions derived from doc_id, pixels/samples cycled from the UTF-8
    text bytes) — end-to-end decodable by the raw decoders, no stub path
    touched."""
    import numpy as np

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                doc_id = int(r["doc_id"])
                src = np.frombuffer(
                    r["text"].encode("utf-8") or b"\x00", dtype=np.uint8)
                kind = ("image", "audio", "video")[doc_id % 3]
                if kind == "image":
                    w, h, c = 8 + doc_id % 9, 8 + (doc_id * 3) % 7, 3
                    px = np.resize(src, w * h * c).reshape(h, w, c)
                    content = encode_raw_image(px)
                elif kind == "audio":
                    n = 100 + (doc_id * 7) % 500
                    samples = np.resize(src.astype("<i2") * 128, n)
                    content = (b"RAWA" + (16000).to_bytes(4, "little")
                               + n.to_bytes(4, "little") + samples.tobytes())
                else:
                    w, h, n = 6 + doc_id % 5, 4 + doc_id % 4, 2 + doc_id % 5
                    frames = np.resize(src, w * h * n)
                    content = (b"RAWV" + w.to_bytes(2, "little")
                               + h.to_bytes(2, "little")
                               + n.to_bytes(2, "little") + frames.tobytes())
                rows.append({"media_id": doc_id, "kind": kind,
                             "content": content,
                             "mime": f"application/x-raw-{kind}"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id", "text").mapInPandas(
        _synth, schema=MEDIA_SCHEMA)


def synthesize_container_media_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame whose blobs are REAL container-format payloads
    — 24-bit BMP images, PCM16 WAV audio, multi-frame grayscale GIF
    video (dimensions derived from doc_id, pixels/samples cycled from
    the UTF-8 text bytes) — end-to-end decodable by the pure-stdlib
    codecs in ``multimodal.containers``, no stub path touched.  The
    dimension arithmetic is doc_id-only, so a SQL oracle predicts every
    decoded metadata column without decoding anything."""
    import numpy as np

    from .containers import encode_bmp, encode_gif, encode_wav

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                doc_id = int(r["doc_id"])
                src = np.frombuffer(
                    r["text"].encode("utf-8") or b"\x00", dtype=np.uint8)
                kind = ("image", "audio", "video")[doc_id % 3]
                if kind == "image":
                    w, h = 5 + doc_id % 9, 4 + (doc_id * 3) % 7
                    px = np.resize(src, w * h * 3).reshape(h, w, 3)
                    content, mime = encode_bmp(px), "image/bmp"
                elif kind == "audio":
                    n = 50 + (doc_id * 7) % 300
                    samples = np.resize(src.astype("<i2") * 64, n)
                    content, mime = encode_wav(samples), "audio/wav"
                else:
                    w, h = 4 + doc_id % 5, 3 + doc_id % 4
                    n = 1 + doc_id % 4
                    frames = np.resize(src, n * h * w).reshape(n, h, w)
                    content, mime = encode_gif(frames), "image/gif"
                rows.append({"media_id": doc_id, "kind": kind,
                             "content": content, "mime": mime})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id", "text").mapInPandas(
        _synth, schema=MEDIA_SCHEMA)


def synthesize_gradient_images_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of REAL 24-bit BMP images whose pixels are PURE
    doc_id arithmetic — gray value at (x, y) is
    ``(doc_id*7 + 13*x + 31*y) % 256`` in all three channels, dimensions
    ``w = 9 + doc_id % 7``, ``h = 8 + (doc_id*3) % 5`` (≥ the 9×8 dHash
    sample grid).  Because the dHash resample is nearest-neighbor on an
    integer grid (``phash._dhash_pixels``), the full 64-bit signature of
    every image is a closed-form function of doc_id that a SQL oracle
    reproduces exactly — this is the gate corpus for the perceptual-hash
    queries."""
    import numpy as np

    from .containers import encode_bmp

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 9 + d % 7, 8 + (d * 3) % 5
                xs = np.arange(w, dtype=np.int64)
                ys = np.arange(h, dtype=np.int64)
                gray = ((d * 7 + 13 * xs[None, :] + 31 * ys[:, None])
                        % 256).astype(np.uint8)
                px = np.repeat(gray[:, :, None], 3, axis=2)
                rows.append({"media_id": d, "kind": "image",
                             "content": encode_bmp(px),
                             "mime": "image/bmp"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_image_groups_from_documents(
    docs: DataFrame, *, groups: int = 25,
) -> DataFrame:
    """MEDIA_SCHEMA frame of REAL 24-bit BMPs planted in duplicate
    GROUPS: every doc in a ``doc_id % groups`` class carries an
    identical image with gray value
    ``(g*53 + 13*x + 31*y + 7*x*y) % 256`` (``g`` the class), dimensions
    ``w = 9 + g % 7``, ``h = 8 + (g*3) % 5``.  The nonlinear ``x·y``
    term makes dHash signatures well-separated across classes (the pure
    gradient corpus's structured bits chain everything together under
    single-linkage), so this is the gate corpus for the pair-free
    cluster-dedup path."""
    import numpy as np

    from .containers import encode_bmp

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d % groups
                w, h = 9 + g % 7, 8 + (g * 3) % 5
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                gray = ((g * 53 + 13 * xs + 31 * ys + 7 * xs * ys)
                        % 256).astype(np.uint8)
                px = np.repeat(gray[:, :, None], 3, axis=2)
                rows.append({"media_id": d, "kind": "image",
                             "content": encode_bmp(px),
                             "mime": "image/bmp"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_progressive_jpegs_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of REAL progressive (SOF2) JPEGs whose pixels
    are PURE doc_id arithmetic: the image of doc ``d`` is a grid of
    8×8-CONSTANT blocks — block (col i, row j) carries gray value
    ``(d*11 + 29*i + 47*j) % 256`` in all three channels, over
    ``bw = 2 + d % 3`` block columns and ``bh = 1 + (d // 3) % 3`` rows
    (so w = 8·bw, h = 8·bh; ``bh`` varies with ``d // 3`` so it is
    decorrelated from ``bw`` and the corpus genuinely exercises
    multi-block-ROW progressive decode — the r12 formula
    ``1 + (d*3) % 3`` was identically 1).  Block-constant pixels with the all-ones
    quant table make the DCT round-trip EXACT (each block is DC-only:
    Y−128 is block-constant, so the quantized coefficient set is
    {DC = 8·(v−128)} and IDCT + rounding returns v bit-for-bit, with
    Cb/Cr exactly zero for gray input) — every decoded pixel is a
    closed-form function of doc_id a SQL oracle reproduces WITHOUT
    decoding.  This is the gate corpus pinning the full progressive
    pipeline (successive-approximation encoder → SOF2 multi-scan
    decoder) cross-engine."""
    import numpy as np

    from .jpeg import encode_jpeg

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                bw, bh = 2 + d % 3, 1 + (d // 3) % 3
                i = np.arange(bw, dtype=np.int64)[None, :]
                j = np.arange(bh, dtype=np.int64)[:, None]
                blocks = ((d * 11 + 29 * i + 47 * j) % 256).astype(np.uint8)
                gray = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                px = np.repeat(gray[:, :, None], 3, axis=2)
                rows.append({"media_id": d, "kind": "image",
                             "content": encode_jpeg(px, progressive=True),
                             "mime": "image/jpeg"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


DECODED_STATS_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("px_min", IntegerType(), True),
    StructField("px_max", IntegerType(), True),
    StructField("px_sum", LongType(), True),
    StructField("n_px", LongType(), True),
])


def decoded_image_stats(media: DataFrame) -> DataFrame:
    """Integer pixel statistics + dimensions from a REAL image decode,
    STRICT form (an undecodable blob raises rather than falling back —
    unlike the tolerant ``image_pixel_stats`` quality gate below):
    ``(media_id, width, height, px_min, px_max, px_sum, n_px)`` over
    every channel value.  All columns are exact integers; ratios (mean
    pixel etc.) belong in-plan as ONE double division of exact
    operands, the repo-wide idiom."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                meta = _decode_image(bytes(content))
                if meta is None or "_pixels" not in meta:
                    raise ValueError(
                        f"decoded_image_stats: undecodable image "
                        f"media_id={int(media_id)}")
                px = meta["_pixels"].astype(np.int64)
                rows.append({
                    "media_id": int(media_id),
                    "width": int(meta["width"]),
                    "height": int(meta["height"]),
                    "px_min": int(px.min()),
                    "px_max": int(px.max()),
                    "px_sum": int(px.sum()),
                    "n_px": int(px.size),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_STATS_SCHEMA])

    return media.mapInPandas(_stats, schema=DECODED_STATS_SCHEMA)


def synthesize_tone_audio_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of REAL PCM16 WAV clips whose samples are PURE
    doc_id arithmetic — sample ``i`` of doc ``d`` is
    ``((d*31 + i*97) % 4001) - 2000`` over ``n = 50 + (d*7) % 300``
    samples.  Every downstream integer signal statistic (energy,
    zero-crossings, peak) is a closed-form function of doc_id a SQL
    oracle evaluates without decoding — the gate corpus for
    ``multimodal.audio.audio_signal_stats``."""
    import numpy as np

    from .containers import encode_wav

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 50 + (d * 7) % 300
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 97) % 4001 - 2000).astype("<i2")
                rows.append({"media_id": d, "kind": "audio",
                             "content": encode_wav(samples),
                             "mime": "audio/wav"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_mp3_audio_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of spec-valid MPEG-audio (MP3) frame streams
    from PURE doc_id arithmetic: even docs are MPEG-1 Layer III, odd
    docs MPEG-2; samplerate index ``d % 3``; mono when ``d % 3 == 0``;
    ``3 + d % 6`` frames whose per-frame VBR bitrate index is
    ``1 + (d*7 + j*3) % 14`` with padding bit ``(d + j) % 2``; docs
    with ``d % 4 == 0`` carry a leading ID3v2 tag of body length
    ``d % 17``.  Every header-walk output (frame count, sample count,
    bitrate sum, byte length incl. the exact padded frame sizes) is a
    closed-form function of doc_id a SQL oracle evaluates without
    parsing — the gate corpus for ``multimodal.audio.
    mp3_stream_features``."""
    from .containers import encode_mp3_frames

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 3 + d % 6
                content = encode_mp3_frames(
                    version=1 if d % 2 == 0 else 2,
                    sr_idx=d % 3,
                    mono=d % 3 == 0,
                    bitrate_indices=[1 + (d * 7 + j * 3) % 14
                                     for j in range(nf)],
                    paddings=[(d + j) % 2 for j in range(nf)],
                    id3_len=d % 17 if d % 4 == 0 else None,
                )
                rows.append({"media_id": d, "kind": "audio",
                             "content": content, "mime": "audio/mpeg"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_mp4_video_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of spec-valid ISO-BMFF (MP4) metadata files
    from PURE doc_id arithmetic: major brand alternates isom/mp42 by
    parity; ``1 + d % 3`` compatible brands; movie timescale
    ``(600, 1000, 90000, 48000)[d % 4]`` with duration
    ``ts·(1 + d % 7) + d % 13``; one video track of
    ``16·(4 + d % 9) × 16·(3 + d % 5)`` plus ``d % 3`` audio tracks.
    Box sizes are closed-form (ftyp 16 + 4·brands, mvhd 108, trak 185),
    so every walk output INCLUDING the byte length is doc_id arithmetic
    a SQL oracle replays — the gate corpus for ``mp4_box_features``."""
    from .containers import encode_mp4

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ts = (600, 1000, 90000, 48000)[d % 4]
                tracks = [("vide", 16 * (4 + d % 9), 16 * (3 + d % 5),
                           90000)]
                tracks += [("soun", 0, 0, (8000, 16000, 44100)[(d + j) % 3])
                           for j in range(d % 3)]
                content = encode_mp4(
                    major_brand="isom" if d % 2 == 0 else "mp42",
                    compat_brands=("mp41", "iso2", "avc1")[:1 + d % 3],
                    timescale=ts,
                    duration=ts * (1 + d % 7) + d % 13,
                    tracks=tracks,
                )
                rows.append({"media_id": d, "kind": "video",
                             "content": content, "mime": "video/mp4"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


MP4_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("major_brand", StringType(), True),
    StructField("timescale", IntegerType(), True),
    StructField("duration_ms", LongType(), True),   # 1000·duration // ts
    StructField("n_tracks", IntegerType(), True),
    StructField("n_video_tracks", IntegerType(), True),
    StructField("n_audio_tracks", IntegerType(), True),
    StructField("width", IntegerType(), True),      # first video track
    StructField("height", IntegerType(), True),
    StructField("n_bytes", LongType(), True),
])


def mp4_box_features(media: DataFrame) -> DataFrame:
    """(media_id, major_brand, timescale, duration_ms, n_tracks,
    n_video_tracks, n_audio_tracks, width, height, n_bytes) for every
    video row the ISO-BMFF box walk accepts (``containers.decode_mp4``
    — metadata only); non-MP4 or corrupt rows yield NULLs.  Integer
    arithmetic throughout (duration is floor-division milliseconds).
    Narrow shuffle-free map; video bytes never cross a shuffle."""
    from .containers import decode_mp4

    cols = [f.name for f in MP4_FEATURES_SCHEMA]

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                out = {c: None for c in cols}
                out["media_id"] = r["media_id"]
                if r["kind"] == "video" and r["content"] is not None:
                    content = bytes(r["content"])
                    try:
                        meta = decode_mp4(content)
                    except ValueError:
                        meta = None
                    if meta is not None:
                        ts = meta["_timescale"]
                        out.update(
                            major_brand=meta["_major_brand"],
                            timescale=ts,
                            duration_ms=1000 * meta["_duration"] // ts,
                            n_tracks=meta["_n_tracks"],
                            n_video_tracks=meta["_n_video_tracks"],
                            n_audio_tracks=meta["_n_audio_tracks"],
                            width=meta["width"],
                            height=meta["height"],
                            n_bytes=len(content),
                        )
                rows.append(out)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(_feat, schema=MP4_FEATURES_SCHEMA)


def synthesize_tiff_images_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of REAL uncompressed TIFFs from pure doc_id
    arithmetic: even docs are little-endian GRAYSCALE
    (``v = (d*13 + 7x + 19y) % 256``), odd docs are big-endian RGB
    (channel ``c`` value ``(d*13 + 7x + 19y + 41c) % 256``), dimensions
    ``w = 6 + d % 9``, ``h = 5 + d % 7`` — both byte orders and both
    photometric layouts exercised, every byte SQL-predictable."""
    import numpy as np

    from .containers import encode_tiff

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 6 + d % 9, 5 + d % 7
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                base = d * 13 + 7 * x + 19 * y
                if d % 2 == 0:
                    px = (base % 256).astype(np.uint8)
                    blob = encode_tiff(px, byteorder="<")
                else:
                    c = np.arange(3, dtype=np.int64)[None, None, :]
                    px = ((base[:, :, None] + 41 * c) % 256).astype(
                        np.uint8)
                    blob = encode_tiff(px, byteorder=">")
                rows.append({"media_id": d, "kind": "image",
                             "content": blob, "mime": "image/tiff"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


def synthesize_gradient_videos_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of REAL RAWV grayscale videos whose every
    frame byte is PURE doc_id arithmetic — frame ``f`` pixel ``(y, x)``
    is ``(d*11 + f*17 + y*23 + x*29) % 256`` over ``n = 3 + d % 6``
    frames of ``(5 + d % 4) × (4 + d % 3)`` — the gate corpus for the
    frame-sampling path (sampled-frame pixel statistics are closed-form
    in SQL)."""
    import numpy as np

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, n = 5 + d % 4, 4 + d % 3, 3 + d % 6
                f = np.arange(n, dtype=np.int64)[:, None, None]
                y = np.arange(h, dtype=np.int64)[None, :, None]
                x = np.arange(w, dtype=np.int64)[None, None, :]
                frames = ((d * 11 + f * 17 + y * 23 + x * 29)
                          % 256).astype(np.uint8)
                content = (b"RAWV" + w.to_bytes(2, "little")
                           + h.to_bytes(2, "little")
                           + n.to_bytes(2, "little") + frames.tobytes())
                rows.append({"media_id": d, "kind": "video",
                             "content": content,
                             "mime": "application/x-raw-video"})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


def media_dedup_by_digest(features: DataFrame) -> DataFrame:
    """Exact media dedup on content digest (the standard first pass before
    perceptual hashing)."""
    return (
        features.groupBy("digest")
        .agg(F.min("media_id").alias("canonical_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("content", BinaryType(), True),
])


def encode_raw_image(pixels) -> bytes:
    """(h, w, c) uint8 array → RAWI blob (the inverse of
    ``decode_raw_image``)."""
    h, w, c = pixels.shape
    return (b"RAWI" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([c]) + pixels.tobytes())


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Image resize (``mapInPandas``, batch-at-a-time).  RAWI, PNG,
    baseline-JPEG, BMP and GIF payloads are REALLY resized —
    nearest-neighbor resample over the decoded pixel array, re-encoded
    in the source's own format (RAWI → RAWI, PNG → PNG, JPEG → JPEG,
    BMP → BMP, GIF → GIF via the fixed 6×7×6 quantizer; an animated
    GIF resizes its first composed frame) — so downstream stages keep
    operating on decodable images.  Foreign payloads (remaining
    compressed formats, no codec in this environment) fall back to a
    deterministic digest-derived stand-in with the same ``bytes ->
    bytes`` contract a PIL/opencv decoder would implement."""
    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .containers import (
            decode_bmp,
            decode_gif,
            encode_bmp,
            encode_gif_rgb,
        )
        from .jpeg import decode_jpeg, encode_jpeg
        from .png import decode_png, encode_png

        chain = ((decode_png, encode_png), (decode_jpeg, encode_jpeg),
                 (decode_bmp, encode_bmp), (decode_gif, encode_gif_rgb))

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "image" or r["content"] is None:
                    continue
                content = bytes(r["content"])
                encode = encode_raw_image
                try:
                    meta = decode_raw_image(content)
                    for dec, enc in chain:
                        if meta is not None:
                            break
                        meta = dec(content)
                        encode = enc
                except ValueError:
                    meta = None
                if meta is not None:
                    px = meta["_pixels"]
                    h_src, w_src = px.shape[:2]
                    # nearest-neighbor: src index = floor(dst * src / dst_n)
                    ys = (np.arange(height) * h_src) // height
                    xs = (np.arange(width) * w_src) // width
                    out = np.ascontiguousarray(px[ys[:, None], xs[None, :], :])
                    payload = encode(out)
                else:
                    digest = hashlib.sha256(content).digest()
                    payload = (digest * ((width * height) // 32 + 1))[
                        : width * height]
                rows.append({
                    "media_id": r["media_id"],
                    "width": width,
                    "height": height,
                    "content": payload,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def image_pixel_stats(df: DataFrame, *, content_col: str = "content",
                      id_cols: tuple = ("media_id",)) -> DataFrame:
    """(*id_cols, px_sum, px_min, px_max) over every decodable image
    payload in ``content_col`` — integer brightness/range statistics
    (the standard black-frame / blown-out-exposure quality gate), summed
    over ALL channels in int64.  Accepts any frame carrying the id
    columns + a binary payload — including ``resize_images`` /
    ``sample_frames`` output — so post-transform payloads are verifiable
    end-to-end.  Undecodable rows yield NULLs.  Narrow ``mapInPandas``;
    bytes never shuffle."""
    import numpy as np

    schema = StructType(
        [df.schema[c] for c in id_cols]
        + [StructField("px_sum", LongType(), True),
           StructField("px_min", IntegerType(), True),
           StructField("px_max", IntegerType(), True)])

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                vals = (None, None, None)
                if r[content_col] is not None:
                    try:
                        meta = _decode_image(bytes(r[content_col]))
                    except ValueError:
                        meta = None
                    if meta is not None:
                        px = meta["_pixels"].astype(np.int64)
                        vals = (int(px.sum()), int(px.min()),
                                int(px.max()))
                row = {c: r[c] for c in id_cols}
                row.update({"px_sum": vals[0], "px_min": vals[1],
                            "px_max": vals[2]})
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema])

    return df.mapInPandas(_stats, schema=schema)


FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(media: DataFrame, *, every_nth: int = 10,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (fan-out inside ``mapInPandas`` — no explode shuffle; frames stay on
    the partition that held the video bytes)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video" or r["content"] is None:
                    continue
                content = bytes(r["content"])
                try:
                    meta = _decode_video(content)
                except ValueError:
                    meta = None
                if meta is not None:
                    # REAL sampling: slice the decoded frame array; each
                    # frame re-encodes as RAWI (1-channel for RAWV's
                    # grayscale planes, 3-channel for GIF's RGB) so the
                    # output composes with resize_images /
                    # extract_features
                    frames = meta["_frames"]
                    taken = 0
                    for idx in range(0, meta["n_frames"], every_nth):
                        if taken >= max_frames:
                            break
                        fr = frames[idx]
                        if fr.ndim == 2:
                            fr = fr[..., None]
                        rows.append({
                            "media_id": r["media_id"], "frame_idx": idx,
                            "frame": encode_raw_image(fr),
                        })
                        taken += 1
                    continue
                digest = hashlib.sha256(content).digest()
                n_frames = 1 + digest[2]  # matches _stub_decode
                taken = 0
                for idx in range(0, n_frames, every_nth):
                    if taken >= max_frames:
                        break
                    # STUB frame payload: deterministic per (video, idx)
                    frame = hashlib.sha256(
                        content + idx.to_bytes(4, "little")).digest()
                    rows.append({"media_id": r["media_id"],
                                 "frame_idx": idx, "frame": frame})
                    taken += 1
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA])

    return media.mapInPandas(_sample, schema=FRAMES_SCHEMA)
