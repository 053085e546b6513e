"""Pure-stdlib codecs for three more real-world container formats —
WAV (RIFF PCM audio), BMP (uncompressed DIB images), and GIF (LZW
images/animations) — continuing the PNG/JPEG upgrade path: each format
moves from the deterministic digest stub to a genuinely decoded one,
with no external media libraries.

Same contract as ``png.decode_png`` / ``jpeg.decode_jpeg`` throughout:
``None`` for foreign magic (caller falls back), ``ValueError`` for
corrupt or unsupported variants (the batch pipeline catches ValueError
only), and a metadata dict whose underscore keys carry the decoded
payload (``_pixels`` / ``_frames`` / ``_samples``).

Supported baselines:
  * WAV — RIFF/WAVE with a PCM ``fmt `` chunk: integer PCM at
    8/16/24/32 bits and IEEE float32, any channel count; extensible
    (0xFFFE) and compressed codecs raise.
  * BMP — BITMAPINFOHEADER-family DIBs, BI_RGB only: 8-bit paletted,
    24-bit BGR, 32-bit BGRA; bottom-up and top-down rows; RLE raises.
  * GIF — GIF87a/89a: full LZW decode (variable code width to 12 bits),
    local/global palettes, interlacing, multi-frame animations with
    frame composition (draw-over disposal, transparency holes keep the
    underlying pixel).

The encoders exist for the round-trip tests (and ``resize_images``
re-encoding): PCM16 WAV, 24-bit BMP, and a real LZW GIF encoder whose
output exercises the decoder's variable-width code path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(content: bytes) -> dict | None:
    """RIFF/WAVE PCM parse → ``{"width": None, "height": None,
    "n_frames": <samples per channel>, "_samples", "_sample_rate",
    "_channels"}``.  ``_samples`` keeps native precision: int16 for
    8/16-bit PCM (8-bit is center-shifted), int32 for 24/32-bit,
    float32 for IEEE float; shape (n,) mono or (n, ch)."""
    if content is None or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    try:
        return _decode_wav_body(content)
    except (struct.error, IndexError) as e:
        raise ValueError(f"WAV: malformed stream ({e})") from e


def _decode_wav_body(content: bytes) -> dict:
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4:pos + 8])
        body = content[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("WAV: truncated chunk")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    tag, ch, rate, _br, _ba, bits = fmt
    if ch < 1:
        raise ValueError("WAV: zero channels")
    if tag == 1 and bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.int16)
             - 128) << 8
    elif tag == 1 and bits == 16:
        s = np.frombuffer(data, dtype="<i2")
    elif tag == 1 and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
        s = (raw[:, 0].astype(np.int32)
             | raw[:, 1].astype(np.int32) << 8
             | raw[:, 2].astype(np.int32) << 16)
        s = (s << 8) >> 8                     # sign-extend 24 → 32
    elif tag == 1 and bits == 32:
        s = np.frombuffer(data, dtype="<i4")
    elif tag == 3 and bits == 32:
        s = np.frombuffer(data, dtype="<f4")
    else:
        raise ValueError(
            f"WAV: unsupported format (tag={tag}, bits={bits})")
    n = s.shape[0] // ch
    samples = s[:n * ch].reshape(n, ch) if ch > 1 else s[:n]
    return {"width": None, "height": None, "n_frames": int(n),
            "_samples": samples, "_sample_rate": int(rate),
            "_channels": int(ch)}


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) or (n, ch) int16 array → PCM16 RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(content: bytes) -> dict | None:
    """BI_RGB DIB parse → the image dict shape (24-bit → RGB, 32-bit →
    RGBA, 8-bit palette → RGB)."""
    if content is None or content[:2] != b"BM":
        return None
    try:
        return _decode_bmp_body(content)
    except (struct.error, IndexError) as e:
        raise ValueError(f"BMP: malformed stream ({e})") from e


def _decode_bmp_body(content: bytes) -> dict:
    if len(content) < 54:
        raise ValueError("BMP: truncated header")
    (pix_off,) = struct.unpack("<I", content[10:14])
    (dib,) = struct.unpack("<I", content[14:18])
    if dib < 40:
        raise ValueError(f"BMP: unsupported DIB header size {dib}")
    w, h_signed = struct.unpack("<ii", content[18:26])
    bpp, comp = struct.unpack("<HI", content[28:34])
    if comp != 0:
        raise ValueError(f"BMP: unsupported compression {comp}")
    if w <= 0 or h_signed == 0:
        raise ValueError("BMP: empty dimensions")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * bpp // 8 + 3) & ~3
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * h,
                        offset=pix_off) if pix_off + stride * h <= \
        len(content) else None
    if raw is None:
        raise ValueError("BMP: truncated pixel data")
    rows = raw.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]        # BGR→RGB
    elif bpp == 32:
        bgra = rows[:, :w * 4].reshape(h, w, 4)
        px = bgra[:, :, [2, 1, 0, 3]]                            # →RGBA
    elif bpp == 8:
        n_pal = struct.unpack("<I", content[46:50])[0] or 256
        pal = np.frombuffer(content, dtype=np.uint8, count=n_pal * 4,
                            offset=14 + dib).reshape(n_pal, 4)
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP: palette index out of range")
        px = pal[idx][:, :, [2, 1, 0]]                           # BGRX→RGB
    else:
        raise ValueError(f"BMP: unsupported bit depth {bpp}")
    return {"width": int(w), "height": int(h), "n_frames": 1,
            "_pixels": np.ascontiguousarray(px)}


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 → 24-bit BI_RGB bottom-up BMP (gray and RGBA
    inputs are expanded/flattened to RGB)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    px = px[:, :, :3]
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)        # RGB→BGR
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54))
    return header + dib + data


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def decode_gif(content: bytes) -> dict | None:
    """GIF87a/89a parse → the image dict shape with REAL frame count:
    ``_pixels`` is the first composed frame (RGB), ``_frames`` the full
    (n, h, w, 3) composition for animations (draw-over disposal;
    transparent pixels keep the underlying canvas)."""
    if content is None or content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        return _decode_gif_body(content)
    except (struct.error, IndexError) as e:
        raise ValueError(f"GIF: malformed stream ({e})") from e


def _lzw_decode(mcs: int, data: bytes, expect: int) -> np.ndarray:
    """GIF LZW: variable code width from ``mcs+1`` to 12 bits, clear /
    end codes, dictionary rebuilt on clear."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"GIF: bad LZW min code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    out = np.empty(expect, dtype=np.uint8)
    n_out = 0
    # bit cursor over the concatenated sub-block data (LSB-first)
    acc = 0
    nbits = 0
    pos = 0
    width = mcs + 1
    dict_entries: list[bytes] = [bytes([i]) for i in range(clear)] + \
        [b"", b""]
    prev: "bytes | None" = None

    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream ran out")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_entries = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(dict_entries):
                raise ValueError("GIF: bad first LZW code")
            entry = dict_entries[code]
        elif code < len(dict_entries):
            entry = dict_entries[code]
            dict_entries.append(prev + entry[:1])
        elif code == len(dict_entries):
            entry = prev + prev[:1]
            dict_entries.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        if n_out + len(entry) > expect:
            raise ValueError("GIF: LZW output overflow")
        out[n_out:n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
        if len(dict_entries) == (1 << width) and width < 12:
            width += 1
        if n_out == expect:
            break
    if n_out != expect:
        raise ValueError(f"GIF: LZW yielded {n_out} of {expect} pixels")
    return out


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif_body(content: bytes) -> dict:
    w, h, flags, bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    if not w or not h:
        raise ValueError("GIF: empty logical screen")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames = []
    transparent: "int | None" = None
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:                     # trailer
            break
        if block == 0x21:                     # extension
            label = content[pos]
            pos += 1
            while True:
                sz = content[pos]
                pos += 1
                if sz == 0:
                    break
                if label == 0xF9 and sz >= 4:     # graphic control
                    gc_flags = content[pos]
                    transparent = (content[pos + 3]
                                   if gc_flags & 1 else None)
                pos += sz
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02X}")
        fx, fy, fw, fh, fflags = struct.unpack("<HHHHB",
                                               content[pos:pos + 9])
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF: frame outside logical screen")
        pal = gct
        if fflags & 0x80:
            n = 2 << (fflags & 7)
            pal = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF: no palette for frame")
        mcs = content[pos]
        pos += 1
        chunks = []
        while True:
            sz = content[pos]
            pos += 1
            if sz == 0:
                break
            chunks.append(content[pos:pos + sz])
            if len(chunks[-1]) != sz:
                raise ValueError("GIF: truncated sub-block")
            pos += sz
        idx = _lzw_decode(mcs, b"".join(chunks), fw * fh).reshape(fh, fw)
        if fflags & 0x40:                     # interlaced
            de = np.empty_like(idx)
            src = 0
            for start, step in _DEINTERLACE:
                rows = range(start, fh, step)
                de[list(rows)] = idx[src:src + len(rows)]
                src += len(rows)
            idx = de
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF: palette index out of range")
        # draw-over composition; transparency keeps the canvas pixel
        region = canvas[fy:fy + fh, fx:fx + fw]
        drawn = pal[idx]
        if transparent is not None:
            mask = (idx == transparent)[:, :, None]
            drawn = np.where(mask, region, drawn)
        canvas[fy:fy + fh, fx:fx + fw] = drawn
        frames.append(canvas.copy())
        transparent = None
    if not frames:
        raise ValueError("GIF: no image data")
    return {"width": int(w), "height": int(h), "n_frames": len(frames),
            "_pixels": frames[0],
            "_frames": np.stack(frames)}


def _lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    """Real GIF LZW encoder (dictionary to 4096, clear on overflow) —
    exercises the decoder's growing-width path."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    prev = b""
    for v in indices.ravel().tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        prev = bytes([v])
    if prev:
        emit(table[prev], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _write_gif(idx_frames: np.ndarray, palette: np.ndarray) -> bytes:
    """(n, h, w) uint8 palette indices + (256, 3) palette → GIF89a
    bytes (one image block per frame)."""
    n, h, w = idx_frames.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)   # 256-entry GCT
    out += palette.astype(np.uint8).tobytes()
    for f in range(n):
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([8])                      # LZW min code size
        data = _lzw_encode(8, idx_frames[f])
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode_gif(frames: np.ndarray) -> bytes:
    """(h, w) or (n, h, w) uint8 GRAYSCALE frames → GIF89a with a
    256-gray global palette — LOSSLESS for gray inputs."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim == 2:
        fr = fr[None]
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    return _write_gif(fr, pal)


def encode_gif_rgb(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF quantized onto a fixed
    6×7×6 RGB cube (252 colors) — the deterministic palette path used
    when ``resize_images`` re-encodes a decoded (RGB) GIF frame."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        return encode_gif(px)
    if px.shape[2] == 1:
        return encode_gif(px[:, :, 0])
    # nearest-level quantization: worst per-channel error is half a
    # level step (≤ 26 at 6 levels), vs a full step for floor binning
    r = np.round(px[:, :, 0].astype(np.float64) * 5 / 255).astype(np.int32)
    g = np.round(px[:, :, 1].astype(np.float64) * 6 / 255).astype(np.int32)
    b = np.round(px[:, :, 2].astype(np.float64) * 5 / 255).astype(np.int32)
    idx = ((r * 7 + g) * 6 + b).astype(np.uint8)
    pal = np.zeros((256, 3), dtype=np.uint8)
    levels = lambda k: np.round(np.arange(k) * 255 / (k - 1)).astype(
        np.uint8)
    rr, gg, bb = np.meshgrid(levels(6), levels(7), levels(6),
                             indexing="ij")
    pal[:252] = np.stack([rr, gg, bb], axis=-1).reshape(252, 3)
    return _write_gif(idx[None], pal)


# ---------------------------------------------------------------------------
# TIFF (uncompressed baseline)
# ---------------------------------------------------------------------------


def decode_tiff(content: bytes) -> dict | None:
    """Baseline TIFF parse → the image dict shape: real IFD walk, both
    byte orders (II/MM), uncompressed, PackBits-compressed (32773,
    per-strip RLE) AND LZW-compressed (5, per-strip, early-change
    variant, predictor 1/2) 8-bit chunky samples PLUS 16-bit unsigned
    grayscale (native-dtype pixel model: ``_pixels`` is uint16 and the
    dict carries ``bit_depth: 16``; absent = 8), grayscale
    (photometric 0 — white-is-zero — is inverted to black-is-zero —
    and 1) and RGB, multi-strip assembly, chunky AND planar (284=2,
    plane-major strips) layouts.  JPEG-in-TIFF, other sample depths,
    signed/float SampleFormat and extra samples raise (digest-stub
    fallback upstream, same contract as the other codecs)."""
    if content is None or content[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    try:
        return _decode_tiff_body(content)
    except (struct.error, IndexError) as e:
        raise ValueError(f"TIFF: malformed stream ({e})") from e


def _decode_tiff_body(content: bytes) -> dict:
    bo = "<" if content[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", content[4:8])
    (n_tags,) = struct.unpack(bo + "H", content[ifd_off:ifd_off + 2])
    tags: dict[int, tuple] = {}
    for i in range(n_tags):
        e = content[ifd_off + 2 + 12 * i: ifd_off + 14 + 12 * i]
        if len(e) != 12:
            raise ValueError("TIFF: truncated IFD")
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = (typ, cnt, e[8:12])

    def val(tag: int, default=None):
        if tag not in tags:
            return default
        typ, cnt, raw = tags[tag]
        size = {1: 1, 3: 2, 4: 4, 7: 1}.get(typ)
        if size is None:
            raise ValueError(f"TIFF: unsupported tag type {typ}")
        total = size * cnt
        if total <= 4:
            data = raw[:total]
        else:
            (off,) = struct.unpack(bo + "I", raw)
            data = content[off:off + total]
            if len(data) != total:
                raise ValueError("TIFF: truncated tag data")
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
        return list(struct.unpack(bo + fmt * cnt, data))

    wv, hv = val(256), val(257)
    if wv is None or hv is None:
        raise ValueError("TIFF: missing dimensions")
    w, h = int(wv[0]), int(hv[0])
    comp = val(259, [1])[0]
    if comp == 7:
        # new-style JPEG-in-TIFF (TIFF TechNote 2): each strip is its
        # own JPEG stream, optionally sharing tables via tag 347
        return _jpeg_in_tiff_decode(content, val, w, h)
    if comp not in (1, 5, 32773):
        raise ValueError(f"TIFF: unsupported compression {comp}")
    phot = val(262, [1])[0]
    spp = int(val(277, [1])[0])
    if phot not in (0, 1, 2):
        raise ValueError(f"TIFF: unsupported photometric {phot}")
    if (phot == 2) != (spp == 3):
        raise ValueError(f"TIFF: photometric {phot} with {spp} samples")
    if spp not in (1, 3):
        raise ValueError(f"TIFF: unsupported samples/pixel {spp}")
    bps = val(258, [8] * spp)
    if all(b == 8 for b in bps):
        depth = 8
    elif spp == 1 and bps == [16]:
        # 16-bit grayscale (the common scientific-TIFF case): samples
        # ride the file byte order; pixel dtype model is NATIVE —
        # ``_pixels`` is uint16 and the dict carries ``bit_depth: 16``
        # (absent = 8).  Downstream stats already cast to int64, so
        # px_min/px_max/px_sum are exact; dHash compares magnitudes
        # dtype-agnostically.  Only unsigned samples (SampleFormat
        # absent or 1) are supported.
        depth = 16
        if val(339, [1]) != [1]:
            raise ValueError("TIFF: only unsigned 16-bit samples supported")
    else:
        raise ValueError("TIFF: only 8-bit (or 16-bit gray) samples "
                         "supported")
    planar = val(284, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"TIFF: unsupported planar configuration {planar}")
    offs, counts = val(273), val(279)
    if offs is None or counts is None:
        raise ValueError("TIFF: missing strip layout")
    pred = val(317, [1])[0]
    if pred not in (1, 2):
        raise ValueError(f"TIFF: unsupported predictor {pred}")
    strips = [content[o:o + c] for o, c in zip(offs, counts)]
    if comp == 32773:
        # PackBits: each strip is an independent RLE stream
        data = b"".join(_packbits_decode(s) for s in strips)
    elif comp == 5:
        # LZW: each strip is an independent code stream
        data = b"".join(_tiff_lzw_decode(s) for s in strips)
    else:
        data = b"".join(strips)
    need = w * h * spp * (depth // 8)
    if len(data) < need:
        raise ValueError("TIFF: truncated pixel data")
    if depth == 16:
        # byte-level codecs (PackBits/LZW) already ran; reinterpret the
        # assembled bytes as u16 in the FILE byte order, then normalize
        # to native
        px = np.frombuffer(data[:need], dtype=np.dtype(bo + "u2")).astype(
            np.uint16).reshape(h, w, 1)
    elif planar == 2 and spp > 1:
        # separate component planes (TIFF6 §: all of plane 0's strips
        # first, then plane 1, ...): each plane is h*w bytes after
        # decompression — interleave back to chunky
        plane = w * h
        px = np.stack(
            [np.frombuffer(data[i * plane:(i + 1) * plane],
                           dtype=np.uint8).reshape(h, w)
             for i in range(spp)], axis=2)
    else:
        px = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, spp)
    if pred == 2:
        # horizontal differencing stores per-row per-channel deltas;
        # undo BEFORE any photometric handling (it acts on raw SAMPLES —
        # mod 2^16 for 16-bit, mod 2^8 for 8-bit, per TIFF6 §14)
        px = _predictor2_decode(px, depth=depth)
    maxv = (1 << depth) - 1
    if phot == 0:
        px = (maxv - px.astype(np.int32)).astype(px.dtype)
    if spp == 1:
        px = px[:, :, 0]
    meta = {"width": w, "height": h, "n_frames": 1,
            "_pixels": np.ascontiguousarray(px)}
    if depth != 8:
        meta["bit_depth"] = depth
    return meta


def _abbrev_jpeg_splice(tables: bytes, strip: bytes) -> bytes:
    """Merge a tag-347 JPEGTables stream (SOI <DQT/DHT...> EOI) into a
    per-strip JPEG: the tables body is spliced right after the strip's
    SOI, so strip-local table segments — which install later — override
    shared ones, per T.81 install-on-receipt semantics."""
    if len(tables) >= 4 and tables[:2] == b"\xff\xd8":
        body = tables[2:]
        if body[-2:] == b"\xff\xd9":
            body = body[:-2]
        return strip[:2] + body + strip[2:]
    return strip


def _jpeg_in_tiff_decode(content: bytes, val, w: int, h: int) -> dict:
    """Compression-7 (new-style JPEG) strips: decode each strip with
    the real baseline/progressive JPEG decoder (``jpeg.decode_jpeg``)
    after splicing in the shared tag-347 tables, then stack strip rows.
    Photometric 6 (YCbCr) is the canonical layout — the JPEG decoder
    already emits RGB; predictor and planar configuration do not apply
    to JPEG strips and raise."""
    from .jpeg import decode_jpeg

    phot = val(262, [6])[0]
    if phot not in (0, 1, 2, 6):
        raise ValueError(f"TIFF: unsupported photometric {phot}")
    spp = int(val(277, [1])[0])
    if spp not in (1, 3):
        raise ValueError(f"TIFF: unsupported samples/pixel {spp}")
    bps = val(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise ValueError("TIFF: JPEG strips carry 8-bit samples only")
    if val(284, [1])[0] != 1:
        raise ValueError("TIFF: planar JPEG-in-TIFF unsupported")
    if val(317, [1])[0] != 1:
        raise ValueError("TIFF: predictor does not apply to JPEG strips")
    offs, counts = val(273), val(279)
    if offs is None or counts is None:
        raise ValueError("TIFF: missing strip layout")
    rps = int(val(278, [h])[0])
    tbl = val(347)
    tables = bytes(tbl) if tbl else b""
    parts = []
    for i, (o, c) in enumerate(zip(offs, counts)):
        stream = _abbrev_jpeg_splice(tables, content[o:o + c])
        m = decode_jpeg(stream)
        if m is None:
            raise ValueError("TIFF: strip is not a JPEG stream")
        px = m["_pixels"]
        exp_h = min(rps, h - i * rps)
        if m["width"] != w or m["height"] != exp_h:
            raise ValueError("TIFF: JPEG strip dimensions mismatch")
        if px.shape[2] != spp:
            raise ValueError("TIFF: JPEG strip channel count mismatch")
        parts.append(px)
    px = np.vstack(parts)
    if px.shape[0] != h:
        raise ValueError("TIFF: JPEG strips do not cover the image")
    if phot == 0:
        px = (255 - px.astype(np.int16)).astype(np.uint8)
    if spp == 1:
        px = px[:, :, 0]
    return {"width": w, "height": h, "n_frames": 1,
            "_pixels": np.ascontiguousarray(px)}


def _tiff_lzw_decode(stream: bytes) -> bytes:
    """TIFF-variant LZW (compression 5, TIFF6 §13): MSB-first bit
    packing, initial code width 9, ClearCode 256 / EOI 257, table
    codes from 258, EARLY CHANGE (the width bumps when the table
    reaches 2^width − 1, one code earlier than GIF's LSB-first
    variant).  Pure python like the other codec tiers — the gate
    corpora stay on none/packbits; this closes the documented LZW
    refusal."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: "bytes | None" = None
    acc = 0
    nbits = 0
    i = 0
    n_in = len(stream)
    while True:
        while nbits < width:
            if i >= n_in:
                # a stream may legally end without an explicit EOI
                # once the remaining bits cannot hold a code
                return bytes(out)
            acc = (acc << 8) | stream[i]
            i += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == 256:
            table = [bytes([b]) for b in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:
            return bytes(out)
        if prev is None:
            if not table or code > 255:
                raise ValueError("TIFF: LZW code before clear")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("TIFF: LZW code out of range")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # decoder early change is one code EARLIER than the encoder's
        # (the decoder's table is one entry behind at equal stream
        # positions): bump at 510/1022/2046 vs the encoder's 511/1023/
        # 2047 — the documented TIFF6 asymmetry
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (the exact inverse of
    ``_tiff_lzw_decode``): leads with ClearCode, re-clears when the
    table reaches 4094 (12-bit ceiling with early change), ends with
    EOI; width bumps when the NEXT code to be assigned is 2^width − 1
    so the decoder's one-entry-behind table tracks in lockstep."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for byte in data:
        wb = w + bytes([byte])
        if wb in table:
            w = wb
            continue
        emit(table[w], width)
        table[wb] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:
            emit(256, width)
            table = {bytes([b]): b for b in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
        # phantom post-encode bump (libtiff LZWPostEncode): the decoder
        # appends one table entry while processing this final code, so
        # when the table lands exactly on an early-change boundary the
        # decoder has already widened — mirror with a phantom next_code
        # increment plus the same bump/re-clear checks before EOI
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:
            emit(256, width)
            width = 9
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _predictor2_decode(px: np.ndarray, *, depth: int = 8) -> np.ndarray:
    """TIFF predictor 2 (horizontal differencing) inverse: per-row
    per-channel cumulative sum over stored deltas, mod 2^depth (the
    differencing acts on SAMPLES, so 16-bit wraps at 65536)."""
    dt = np.uint8 if depth == 8 else np.uint16
    return (np.cumsum(px.astype(np.int64), axis=1)
            % (1 << depth)).astype(dt)


def _predictor2_encode(px: np.ndarray, *, depth: int = 8) -> np.ndarray:
    """TIFF predictor 2: per-row per-channel horizontal deltas mod
    2^depth (the first column is stored verbatim)."""
    dt = np.uint8 if depth == 8 else np.uint16
    d = px.astype(np.int64)
    d[:, 1:, :] = d[:, 1:, :] - px.astype(np.int64)[:, :-1, :]
    return (d % (1 << depth)).astype(dt)


def _packbits_decode(stream: bytes) -> bytes:
    """Apple PackBits RLE (the TIFF 32773 per-strip codec): control
    byte n ∈ 0..127 copies n+1 literals; n ∈ -127..-1 repeats the next
    byte 1−n times; −128 is a no-op."""
    out = bytearray()
    i = 0
    n_in = len(stream)
    while i < n_in:
        n = stream[i]
        i += 1
        if n < 128:                               # literal run
            j = i + n + 1
            if j > n_in:
                raise ValueError("TIFF: truncated PackBits literal")
            out += stream[i:j]
            i = j
        elif n > 128:                             # replicate run
            if i >= n_in:
                raise ValueError("TIFF: truncated PackBits repeat")
            out += bytes([stream[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (repeat packets for runs ≥ 3, literal packets
    otherwise, 128-byte packet cap) — the inverse of
    ``_packbits_decode`` for the round-trip tests and the compressed
    ``encode_tiff`` path."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch: until the next ≥3 run or the 128 cap
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def encode_tiff(pixels: np.ndarray, *, byteorder: str = "<",
                compression: str = "none",
                rows_per_strip: "int | None" = None,
                predictor: int = 1,
                planar: bool = False) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 — or (h, w) uint16 gray
    (16-bit samples, tag 258 = 16) — → TIFF (black-is-zero / RGB,
    chunky), either byte order — the inverse of ``decode_tiff`` for the
    round-trip tests.  ``compression``: "none", "packbits" (per-strip
    RLE) or "lzw" (per-strip, TIFF early-change variant);
    ``predictor`` 2 stores horizontal deltas (tag 317, the usual LZW
    companion); ``planar`` stores separate component planes (tag 284
    value 2, plane-major strips); ``rows_per_strip`` splits the image
    (or each plane) into multiple strips (default: one strip).  The
    default-parameter layout is byte-identical to the historical
    single-strip encoder (the media gate corpus depends on it) —
    predictor 1 / chunky write no 317 / 284 tags."""
    bo = byteorder
    if bo not in ("<", ">"):
        raise ValueError("encode_tiff: byteorder must be '<' or '>'")
    if compression not in ("none", "packbits", "lzw", "jpeg"):
        raise ValueError(f"encode_tiff: unknown compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"encode_tiff: unknown predictor {predictor!r}")
    px_in = np.asarray(pixels)
    if px_in.dtype == np.uint16:
        # 16-bit grayscale (bit_depth data model: native-dtype pixels);
        # the uint8 default path below is byte-identical to the
        # historical encoder — only the dtype branches
        depth = 16
        px = px_in
    else:
        depth = 8
        px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    spp = px.shape[2]
    if spp not in (1, 3):
        raise ValueError("encode_tiff: gray or RGB input only")
    if depth == 16 and spp != 1:
        raise ValueError("encode_tiff: 16-bit input must be grayscale")
    h, w, _ = px.shape
    if compression == "jpeg":
        # new-style JPEG strips (tag 259 = 7): each strip is a
        # self-contained JPEG stream (tag 347 optional per TechNote 2 —
        # the decoder handles both); predictor/planar/16-bit don't
        # apply to JPEG strips
        if depth != 8:
            raise ValueError("encode_tiff: JPEG strips are 8-bit only")
        if predictor == 2:
            raise ValueError(
                "encode_tiff: predictor does not apply to JPEG strips")
        if planar:
            raise ValueError("encode_tiff: planar JPEG-in-TIFF unsupported")
        from .jpeg import encode_jpeg

        rps = int(rows_per_strip) if rows_per_strip else h
        payloads = [encode_jpeg(px[y:y + rps])
                    for y in range(0, h, rps)] or [b""]
        comp_tag = 7
        planar = False
    else:
        if predictor == 2:
            px = _predictor2_encode(px, depth=depth)
        planar = bool(planar) and spp > 1
        rps = int(rows_per_strip) if rows_per_strip else h
        # samples serialize in the FILE byte order (predictor ran on
        # native sample values first, per TIFF6 §14)
        ser = px.astype(np.dtype(bo + "u2")) if depth == 16 else px
        if planar:
            raw_strips = [ser[y:y + rps, :, ch].tobytes()
                          for ch in range(spp) for y in range(0, h, rps)] \
                or [b""]
        else:
            raw_strips = [ser[y:y + rps].tobytes()
                          for y in range(0, h, rps)] or [b""]
        if compression == "packbits":
            payloads = [_packbits_encode(s) for s in raw_strips]
            comp_tag = 32773
        elif compression == "lzw":
            payloads = [_tiff_lzw_encode(s) for s in raw_strips]
            comp_tag = 5
        else:
            payloads = raw_strips
            comp_tag = 1
    n_strips = len(payloads)
    n_tags = 9 + (1 if predictor == 2 else 0) + (1 if planar else 0)
    ifd_size = 2 + n_tags * 12 + 4
    bps_extra = 6 if spp == 3 else 0
    bps_off = 8 + ifd_size
    arrays_off = bps_off + bps_extra
    arrays_extra = 8 * n_strips if n_strips > 1 else 0
    data_off = arrays_off + arrays_extra
    offs = []
    pos = data_off
    for p in payloads:
        offs.append(pos)
        pos += len(p)

    def short(v: int) -> bytes:
        return struct.pack(bo + "H", v).ljust(4, b"\x00")

    def entry(tag: int, typ: int, cnt: int, payload: bytes) -> bytes:
        return struct.pack(bo + "HHI", tag, typ, cnt) + payload

    if n_strips == 1:
        e273 = entry(273, 4, 1, struct.pack(bo + "I", offs[0]))
        e279 = entry(279, 4, 1, struct.pack(bo + "I", len(payloads[0])))
        arrays_block = b""
    else:
        e273 = entry(273, 4, n_strips, struct.pack(bo + "I", arrays_off))
        e279 = entry(279, 4, n_strips,
                     struct.pack(bo + "I", arrays_off + 4 * n_strips))
        arrays_block = (
            struct.pack(bo + "I" * n_strips, *offs)
            + struct.pack(bo + "I" * n_strips,
                          *[len(p) for p in payloads]))
    entries = [
        entry(256, 4, 1, struct.pack(bo + "I", w)),
        entry(257, 4, 1, struct.pack(bo + "I", h)),
        entry(258, 3, spp,
              short(depth) if spp == 1 else struct.pack(bo + "I", bps_off)),
        entry(259, 3, 1, short(comp_tag)),
        # JPEG RGB strips are YCbCr-coded (photometric 6); everything
        # else keeps the historical black-is-zero / RGB values
        entry(262, 3, 1, short(1 if spp == 1 else
                               (6 if comp_tag == 7 else 2))),
        e273,
        entry(277, 3, 1, short(spp)),
        entry(278, 4, 1, struct.pack(bo + "I", rps)),
        e279,
    ]
    if planar:
        entries.append(entry(284, 3, 1, short(2)))
    if predictor == 2:
        entries.append(entry(317, 3, 1, short(2)))
    header = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(
        bo + "I", 8)
    ifd = (struct.pack(bo + "H", n_tags) + b"".join(entries)
           + struct.pack(bo + "I", 0))
    bps_block = struct.pack(bo + "HHH", 8, 8, 8) if spp == 3 else b""
    return header + ifd + bps_block + arrays_block + b"".join(payloads)


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio) — frame-header walk, metadata only, no DSP
# ---------------------------------------------------------------------------
#
# Everything below is the public MPEG audio frame-header layout
# (ISO/IEC 11172-3 / 13818-3): 11 sync bits, 2 version bits, 2 layer
# bits, protection bit, 4 bitrate-index bits, 2 samplerate-index bits,
# padding bit, then channel mode.  Frame payloads are opaque — the walk
# yields frame count, per-frame bitrate (VBR-aware), sample rate,
# channel count, and exact sample count (frames x samples-per-frame),
# which is all the metadata an LLM multimodal pipeline filters on.
# Full PCM decode needs the subband/MDCT DSP (external libs) and stays
# out of scope; this closes the container family the same way GIF
# closed video.

# version bits → version code (1, 2, or 25 for MPEG-2.5); 1 is reserved
_MP3_VERSION = {3: 1, 2: 2, 0: 25}
# layer bits → layer number; 0 is reserved
_MP3_LAYER = {3: 1, 2: 2, 1: 3}
_MP3_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              25: (11025, 12000, 8000)}
# (version_group, layer) → kbps at bitrate index 1..14 (0 = free, 15 = bad);
# version group 2 covers MPEG-2 and MPEG-2.5
_MP3_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
             384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
             256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}


def _mp3_spf(version: int, layer: int) -> int:
    """Samples per frame: Layer I 384, Layer II 1152, Layer III 1152
    for MPEG-1 and 576 for MPEG-2/2.5."""
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == 1 else 576


def _mp3_frame_len(version: int, layer: int, kbps: int, rate: int,
                   pad: int) -> int:
    """Exact frame byte length; Layer I pads in 4-byte slots."""
    if layer == 1:
        return (12_000 * kbps // rate + pad) * 4
    coeff = 144_000 if (layer == 2 or version == 1) else 72_000
    return coeff * kbps // rate + pad


def decode_mp3(content: bytes) -> dict | None:
    """MPEG audio header walk → ``{"width": None, "height": None,
    "n_frames": <total samples per channel>, "_sample_rate",
    "_channels", "_mpeg_version" (1 | 2 | 25), "_layer" (1-3),
    "_mpeg_frames", "_bitrate_sum_kbps"}``.

    Accepts an optional leading ID3v2 tag (syncsafe-length skip).
    ``None`` for foreign bytes (no ID3 magic and no frame sync at the
    start); ``ValueError`` for corrupt streams — truncated frames,
    free/bad bitrate or samplerate indices, reserved version/layer
    bits, mid-stream parameter changes, or trailing garbage."""
    if content is None:
        return None
    start = 0
    if content[:3] == b"ID3":
        if len(content) < 10:
            return None
        size = ((content[6] & 0x7F) << 21 | (content[7] & 0x7F) << 14
                | (content[8] & 0x7F) << 7 | (content[9] & 0x7F))
        start = 10 + size
    if not (len(content) >= start + 4 and content[start] == 0xFF
            and content[start + 1] & 0xE0 == 0xE0):
        return None if start == 0 else _mp3_err("no frame sync after ID3")
    version = layer = rate = channels = None
    n_frames = 0
    kbps_sum = 0
    pos = start
    while pos < len(content):
        if pos + 4 > len(content) or content[pos] != 0xFF \
                or content[pos + 1] & 0xE0 != 0xE0:
            _mp3_err(f"lost frame sync at byte {pos}")
        b1, b2, b3 = content[pos + 1], content[pos + 2], content[pos + 3]
        ver = _MP3_VERSION.get(b1 >> 3 & 3)
        lay = _MP3_LAYER.get(b1 >> 1 & 3)
        if ver is None or lay is None:
            _mp3_err("reserved version/layer bits")
        bi, sri, pad = b2 >> 4, b2 >> 2 & 3, b2 >> 1 & 1
        if bi in (0, 15):
            _mp3_err(f"free/bad bitrate index {bi}")
        if sri == 3:
            _mp3_err("reserved samplerate index")
        ch = 1 if b3 >> 6 == 3 else 2
        sr = _MP3_RATES[ver][sri]
        if version is None:
            version, layer, rate, channels = ver, lay, sr, ch
        elif (ver, lay, sr, ch) != (version, layer, rate, channels):
            _mp3_err("stream parameters changed mid-stream")
        kbps = _MP3_BITRATES[1 if ver == 1 else 2, lay][bi - 1]
        flen = _mp3_frame_len(ver, lay, kbps, sr, pad)
        if pos + flen > len(content):
            _mp3_err(f"truncated frame at byte {pos}")
        n_frames += 1
        kbps_sum += kbps
        pos += flen
    spf = _mp3_spf(version, layer)
    return {"width": None, "height": None,
            "n_frames": n_frames * spf,
            "_sample_rate": rate, "_channels": channels,
            "_mpeg_version": version, "_layer": layer,
            "_mpeg_frames": n_frames, "_bitrate_sum_kbps": kbps_sum}


def _mp3_err(msg: str):
    raise ValueError(f"MP3: {msg}")


def encode_mp3_frames(
    *,
    version: int = 1,
    layer: int = 3,
    sr_idx: int = 0,
    mono: bool = True,
    bitrate_indices,
    paddings,
    id3_len: int | None = None,
) -> bytes:
    """Spec-valid MPEG audio frame stream (correct headers + exact
    frame lengths; zero payload bytes — the header walk never reads
    them) — the inverse of ``decode_mp3`` for round-trip tests and the
    arithmetic gate corpus.  ``bitrate_indices`` / ``paddings`` give
    one (index 1-14, pad 0/1) per frame; ``id3_len`` prepends an ID3v2
    tag with that body length."""
    vb = {1: 3, 2: 2, 25: 0}[version]
    lb = {1: 3, 2: 2, 3: 1}[layer]
    rate = _MP3_RATES[version][sr_idx]
    out = []
    if id3_len is not None:
        out.append(b"ID3" + bytes((4, 0, 0))
                   + bytes((id3_len >> 21 & 0x7F, id3_len >> 14 & 0x7F,
                            id3_len >> 7 & 0x7F, id3_len & 0x7F))
                   + b"\x00" * id3_len)
    for bi, pad in zip(bitrate_indices, paddings):
        kbps = _MP3_BITRATES[1 if version == 1 else 2, layer][bi - 1]
        flen = _mp3_frame_len(version, layer, kbps, rate, pad)
        hdr = bytes((0xFF, 0xE0 | vb << 3 | lb << 1 | 1,
                     bi << 4 | sr_idx << 2 | pad << 1,
                     0xC0 if mono else 0x00))
        out.append(hdr + b"\x00" * (flen - 4))
    return b"".join(out)


# ---------------------------------------------------------------------------
# MP4 (ISO base media file format) — box-tree walk, metadata only
# ---------------------------------------------------------------------------
#
# Public ISO/IEC 14496-12 box layout: every box is a 32-bit big-endian
# size + 4-char type (size 1 → 64-bit largesize follows; size 0 → box
# extends to EOF, last top-level box only).  The walk validates the box
# tree and reads the metadata an LLM pipeline filters on — brand,
# movie timescale/duration, per-track handler kinds (vide/soun) and the
# first video track's presentation dimensions — without touching sample
# data (mdat stays opaque; codec payload decode needs external libs,
# exactly like MP3's DSP).  Reference parity: the reference engine has
# no media surface at all (/root/reference/src — LSH functions only);
# this is part of the brief's multimodal-column layer.


def _mp4_err(msg: str):
    raise ValueError(f"MP4: {msg}")


def _mp4_boxes(buf: bytes, start: int, end: int, top: bool = False):
    """Yield (box_type, payload_start, payload_end) walking buf[start:end);
    validates sizes cover the range exactly."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            _mp4_err(f"truncated box header at byte {pos}")
        size = int.from_bytes(buf[pos:pos + 4], "big")
        btype = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                _mp4_err(f"truncated largesize at byte {pos}")
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            if size < 16:
                _mp4_err(f"bad largesize {size}")
            body = pos + 16
        elif size == 0:  # to end of enclosing scope (top level only)
            if not top:
                _mp4_err("size-0 box below top level")
            size = end - pos
        elif size < 8:
            _mp4_err(f"bad box size {size} at byte {pos}")
        if pos + size > end:
            _mp4_err(f"box {btype!r} overruns buffer at byte {pos}")
        yield btype, body, pos + size
        pos += size
    if pos != end:
        _mp4_err("box sizes do not tile the buffer")


def _mp4_fullbox(buf: bytes, start: int, what: bytes) -> tuple[int, int]:
    version = buf[start]
    if version > 1:
        _mp4_err(f"unsupported {what.decode()} version {version}")
    return version, start + 4


def decode_mp4(content: bytes) -> dict | None:
    """ISO-BMFF box walk → ``{"width", "height", "n_frames": None,
    "_major_brand", "_timescale", "_duration", "_n_tracks",
    "_n_video_tracks", "_n_audio_tracks"}``.

    width/height are the FIRST video track's tkhd presentation size
    (16.16 fixed point, integral values expected); n_frames stays None
    — frame counts live in stbl sample tables whose decode is out of
    scope.  ``None`` for foreign bytes (no ftyp first box);
    ``ValueError`` for corrupt trees — overrunning or non-tiling box
    sizes, missing/duplicate moov or mvhd, trak without tkhd/mdhd/hdlr,
    or v>1 fullboxes."""
    if content is None or len(content) < 8 or content[4:8] != b"ftyp":
        return None
    major_brand = content[8:12].decode("latin-1")
    moov_span = None
    for btype, body, bend in _mp4_boxes(content, 0, len(content), top=True):
        if btype == b"moov":
            if moov_span is not None:
                _mp4_err("duplicate moov")
            moov_span = (body, bend)
    if moov_span is None:
        _mp4_err("no moov box")

    timescale = duration = None
    n_video = n_audio = n_tracks = 0
    width = height = None
    for btype, body, bend in _mp4_boxes(content, *moov_span):
        if btype == b"mvhd":
            if timescale is not None:
                _mp4_err("duplicate mvhd")
            ver, p = _mp4_fullbox(content, body, b"mvhd")
            if ver == 1:
                timescale = int.from_bytes(content[p + 16:p + 20], "big")
                duration = int.from_bytes(content[p + 20:p + 28], "big")
            else:
                timescale = int.from_bytes(content[p + 8:p + 12], "big")
                duration = int.from_bytes(content[p + 12:p + 16], "big")
            if timescale == 0:
                _mp4_err("mvhd timescale 0")
        elif btype == b"trak":
            n_tracks += 1
            tw = th = handler = None
            saw_tkhd = saw_mdhd = False
            for t, tb, te in _mp4_boxes(content, body, bend):
                if t == b"tkhd":
                    ver, p = _mp4_fullbox(content, tb, b"tkhd")
                    # ver0: creation/modification/id/reserved/duration =
                    # 5*4 bytes; ver1 widens times+duration to 64-bit
                    p += 32 if ver else 20
                    p += 8 + 2 + 2 + 2 + 2 + 36  # reserved..matrix
                    tw = int.from_bytes(content[p:p + 4], "big") >> 16
                    th = int.from_bytes(content[p + 4:p + 8], "big") >> 16
                    saw_tkhd = True
                elif t == b"mdia":
                    for m, mb, me in _mp4_boxes(content, tb, te):
                        if m == b"mdhd":
                            _mp4_fullbox(content, mb, b"mdhd")
                            saw_mdhd = True
                        elif m == b"hdlr":
                            handler = content[mb + 8:mb + 12]
            if not (saw_tkhd and saw_mdhd and handler is not None):
                _mp4_err("trak missing tkhd/mdhd/hdlr")
            if handler == b"vide":
                n_video += 1
                if width is None:
                    width, height = tw, th
            elif handler == b"soun":
                n_audio += 1
    if timescale is None:
        _mp4_err("no mvhd box")
    return {"width": width, "height": height, "n_frames": None,
            "_major_brand": major_brand, "_timescale": timescale,
            "_duration": duration, "_n_tracks": n_tracks,
            "_n_video_tracks": n_video, "_n_audio_tracks": n_audio}


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4_fullbox_payload(version: int, body: bytes) -> bytes:
    return bytes((version, 0, 0, 0)) + body


def encode_mp4(
    *,
    major_brand: str = "isom",
    compat_brands=("mp41",),
    timescale: int = 600,
    duration: int = 600,
    tracks=(("vide", 640, 480, 600),),
) -> bytes:
    """Minimal spec-valid ISO-BMFF metadata file (ftyp + moov; no mdat
    — the walk never reads sample data) — the inverse of ``decode_mp4``
    for round-trip tests and the arithmetic gate corpus.  ``tracks`` is
    a sequence of (handler, width, height, media_timescale); box sizes
    are fully determined by the track count and compat-brand count:
    ftyp = 16 + 4·len(compat_brands), mvhd = 108, each trak = 185."""
    ftyp = _mp4_box(b"ftyp", major_brand.encode()[:4].ljust(4)
                    + struct.pack(">I", 0)
                    + b"".join(b.encode()[:4].ljust(4)
                               for b in compat_brands))
    mvhd = _mp4_box(b"mvhd", _mp4_fullbox_payload(0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x0001_0000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x0001_0000, 0, 0, 0, 0x0001_0000, 0, 0, 0,
                      0x4000_0000)
        + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1)))
    traks = []
    for i, (handler, w, h, mts) in enumerate(tracks):
        tkhd = _mp4_box(b"tkhd", _mp4_fullbox_payload(0,
            struct.pack(">IIIII", 0, 0, i + 1, 0, duration)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x0001_0000, 0, 0, 0, 0x0001_0000, 0, 0,
                          0, 0x4000_0000)
            + struct.pack(">II", (w or 0) << 16, (h or 0) << 16)))
        mdhd = _mp4_box(b"mdhd", _mp4_fullbox_payload(0,
            struct.pack(">IIII", 0, 0, mts, duration)
            + struct.pack(">HH", 0x55C4, 0)))  # language 'und'
        name = (b"VideoHandler" if handler == "vide" else
                b"SoundHandler" if handler == "soun" else b"MetaHandler.")
        hdlr = _mp4_box(b"hdlr", _mp4_fullbox_payload(0,
            struct.pack(">I", 0) + handler.encode()[:4].ljust(4)
            + b"\x00" * 12 + name + b"\x00"))
        traks.append(_mp4_box(b"trak", tkhd + _mp4_box(b"mdia", mdhd + hdlr)))
    return ftyp + _mp4_box(b"moov", mvhd + b"".join(traks))
