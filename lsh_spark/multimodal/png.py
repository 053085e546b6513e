"""Pure-stdlib PNG codec: REAL decode (and a filter-0 encoder) built on
``zlib`` + numpy — no external media libraries required, which upgrades
PNG from the deterministic digest stub to a genuinely decoded compressed
format in this environment.

Supported (the overwhelmingly common baseline): 8-bit depth, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced,
all five scanline filters (None/Sub/Up/Average/Paeth).  Interlaced or
16-bit images raise ``ValueError`` (callers treat that as a foreign blob
and fall back, same contract as the RAW decoders in ``media.py``).

Decode cost model: chunk parse + one ``zlib.decompress`` + unfiltering.
None/Sub/Up rows unfilter fully vectorized (Sub is a per-lane cumulative
sum mod 256 — byte addition is associative mod 256, so the sequential
recurrence collapses to ``np.cumsum``); Average/Paeth rows carry a true
sequential data dependence (nonlinear predictor) and fall back to a
per-byte loop on just those rows.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(content: bytes) -> dict | None:
    """Parse a PNG blob into ``{"width", "height", "n_frames",
    "_pixels"}`` (same shape as ``media.decode_raw_image``; palette
    images come back expanded to RGB).  Returns None when the magic
    doesn't match (foreign bytes — caller falls back), raises
    ``ValueError`` on a corrupt or unsupported PNG."""
    if content is None or content[:8] != _MAGIC:
        return None
    # Everything after the magic is untrusted: stdlib/numpy raise
    # zlib.error / struct.error / IndexError on malformed streams, but
    # the media pipeline's total-batch contract catches ValueError only
    # — normalize so corrupt PNGs fall back instead of killing the task.
    try:
        return _decode_png_body(content)
    except (zlib.error, struct.error, IndexError) as e:
        raise ValueError(f"PNG: malformed stream ({e})") from e


def _decode_png_body(content: bytes) -> dict:
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat: list[bytes] = []
    plte = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(content):
            raise ValueError("PNG: truncated chunk")
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise ValueError(
            f"PNG: unsupported form (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})")
    if not idat:
        raise ValueError("PNG: missing IDAT")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG: payload {len(raw)} B != {(stride + 1) * height}")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    zeros = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(arr[y, 0])
        row = arr[y, 1:]
        prior = out[y - 1] if y else zeros
        if f == 0:
            out[y] = row
        elif f == 1:    # Sub: per-lane cumulative sum mod 256
            out[y] = (np.cumsum(row.reshape(width, bpp), axis=0,
                                dtype=np.uint64) % 256
                      ).astype(np.uint8).reshape(stride)
        elif f == 2:    # Up (uint8 addition wraps mod 256)
            out[y] = row + prior
        elif f == 3:    # Average — true sequential dependence
            o = out[y]
            for i in range(stride):
                left = int(o[i - bpp]) if i >= bpp else 0
                o[i] = (int(row[i]) + ((left + int(prior[i])) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            o = out[y]
            for i in range(stride):
                a = int(o[i - bpp]) if i >= bpp else 0
                b = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                o[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter type {f}")
    pixels = out.reshape(height, width, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        pixels = plte[pixels[:, :, 0]]
    return {"width": width, "height": height, "n_frames": 1,
            "_pixels": pixels}


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 array → PNG bytes (8-bit, filter 0, one zlib
    stream).  c ∈ {1, 2, 3, 4} → gray / gray+alpha / RGB / RGBA."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scanlines = np.zeros((h, w * c + 1), dtype=np.uint8)
    scanlines[:, 1:] = px.reshape(h, w * c)
    idat = zlib.compress(scanlines.tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
