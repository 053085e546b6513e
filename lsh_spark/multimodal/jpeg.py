"""Pure-stdlib baseline JPEG codec: REAL decode (and a matching encoder
used by the round-trip tests) built on ``struct`` + numpy — no external
media libraries, which upgrades the most common compressed image format
from the deterministic digest stub to a genuinely decoded one in this
environment (the same step ``multimodal.png`` took for PNG).

Supported (the sequential + progressive Huffman core that covers the
vast majority of JPEGs in the wild): SOF0/SOF1 sequential DCT and SOF2
progressive DCT (spectral selection AND successive approximation — DC
first/refine, AC first/refine with EOB-run coding), 8-bit samples,
grayscale and 3-component YCbCr with any h/v sampling factors ≤ 2
(4:4:4, 4:2:2, 4:2:0, ...), restart intervals in every scan shape,
non-interleaved progressive scans, multiple DQT/DHT segments, 16-bit
quant tables.  Arithmetic coding, 12-bit, lossless, and hierarchical
forms raise ``ValueError`` — callers treat that as a foreign blob and
fall back to the digest stub, the same contract as ``decode_png``.

Decode cost model: marker parse, then a sequential Huffman walk over the
entropy stream (per-bit in Python — inherently serial, this is the
honest baseline), with everything after coefficients vectorized: one
batched dequant + dezigzag + 8x8 IDCT (``D.T @ F @ D`` over all blocks
at once), numpy plane assembly, ``np.repeat`` chroma upsampling, and a
vectorized YCbCr→RGB.  The encoder exists for the tests: it builds its
own canonical Huffman tables from the actual symbol histogram (writing
them into DHT, so the decoder exercises real table parsing rather than
memorized Annex-K constants) and uses all-ones quant tables by default
so round-trips are tight enough to bound (|err| ≤ 1 from the float DCT
pair plus clipping).
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8-point DCT-II matrix: spatial = D.T @ coeff @ D
_D = np.array([[0.5 * (np.sqrt(0.5) if k == 0 else 1.0)
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


def decode_jpeg(content: bytes) -> dict | None:
    """Parse a JPEG blob into ``{"width", "height", "n_frames",
    "_pixels"}`` (same shape as ``decode_png``; grayscale → (h, w, 1),
    color → RGB (h, w, 3)).  Returns None when the SOI magic doesn't
    match (foreign bytes — caller falls back), raises ``ValueError`` on
    a corrupt or unsupported JPEG."""
    if content is None or content[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_body(content)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"JPEG: malformed stream ({e})") from e


class _Huff:
    """Canonical Huffman table as MSB-first (code, length) → symbol."""

    def __init__(self, bits: bytes, vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, stops at markers
    (restarts are consumed by the caller via ``sync_restart``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        p = self.pos
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1]
            if nxt != 0x00:
                raise ValueError("JPEG: hit marker inside entropy data")
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if byte == 0xFF else 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Skip to and consume the RSTn marker at a restart boundary."""
        if self.bit:
            self.bit = 0
            self.pos += 2 if self.data[self.pos] == 0xFF else 1
        if self.data[self.pos] != 0xFF or \
                self.data[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("JPEG: missing restart marker")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude decode: ``size``-bit value → signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_body(content: bytes) -> dict:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart = 0
    frame = None
    store: dict[int, np.ndarray] | None = None   # multi-scan coef grids
    scanned = False
    covered: set = set()                         # comp ids (DC-)scanned
    while True:
        if content[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        while content[pos + 1] == 0xFF:          # spec-legal fill bytes
            pos += 1
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:                       # EOI
            if scanned and frame is not None and store is not None:
                # multi-scan (progressive OR sequential non-interleaved):
                # all scans accumulated — reconstruct once.  Every
                # component must have been scanned (DC-scanned, for
                # progressive): a file whose scans never cover a
                # component is truncated/corrupt, and assembling it
                # would silently return zeroed planes.
                missing = [c["id"] for c in frame["comps"]
                           if c["id"] not in covered]
                if missing:
                    raise ValueError(
                        f"JPEG: component(s) {missing} never scanned")
                return _assemble(frame, qt, store)
            raise ValueError("JPEG: no scan data")
        (seglen,) = struct.unpack(">H", content[pos:pos + 2])
        seg = content[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG: truncated segment")
        data_start = pos + seglen
        pos = data_start
        if marker == 0xDB:                       # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq:
                    tbl = np.frombuffer(seg[o:o + 128],
                                        dtype=">u2").astype(np.int64)
                    o += 128
                else:
                    tbl = np.frombuffer(seg[o:o + 64],
                                        dtype=np.uint8).astype(np.int64)
                    o += 64
                if tbl.size != 64 or not tbl.all():
                    raise ValueError("JPEG: bad quant table")
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 seq, SOF2 prog
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("JPEG: unsupported precision")
            if ncomp not in (1, 3):
                raise ValueError("JPEG: unsupported component count")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError("JPEG: unsupported sampling factor")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: unsupported SOF marker 0xFF{marker:02X} "
                "(lossless/arithmetic/hierarchical)")
        elif marker == 0xC4:                     # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = seg[o + 1:o + 17]
                n = sum(bits)
                vals = seg[o + 17:o + 17 + n]
                o += 17 + n
                (huff_ac if tc else huff_dc)[th] = _Huff(bits, vals)
        elif marker == 0xDD:                     # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = by_id.get(cs)
                if comp is None:
                    raise ValueError(
                        f"JPEG: SOS names undeclared component {cs}")
                scan.append((comp, tds >> 4, tds & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not frame["prog"]:
                if ns == len(frame["comps"]):
                    # the single fully-interleaved scan: decode + finish
                    return _decode_scan(content, data_start, frame, scan,
                                        qt, huff_dc, huff_ac, restart)
                # sequential NON-INTERLEAVED layout: components split
                # across several scans — accumulate like progressive and
                # reconstruct at EOI
                if store is None:
                    store = _alloc_store(frame)
                pos = _decode_seq_scan(content, data_start, frame, scan,
                                       store, huff_dc, huff_ac, restart)
                covered.update(c["id"] for c, _t, _a in scan)
            else:
                if store is None:
                    store = _alloc_store(frame)
                pos = _decode_prog_scan(content, data_start, frame, scan,
                                        store, huff_dc, huff_ac, restart,
                                        ss, se, ah, al)
                if ss == 0:
                    covered.update(c["id"] for c, _t, _a in scan)
            scanned = True
        # APPn / COM / others: skipped via their length


def _mcu_geometry(frame) -> tuple[int, int, int, int]:
    w, h = frame["w"], frame["h"]
    if not w or not h:
        raise ValueError("JPEG: empty frame")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _alloc_store(frame) -> dict[int, np.ndarray]:
    """Per-component zigzag-coefficient grids, MCU-padded: (block_rows,
    block_cols, 64) int64 — scans (sequential or progressive, any scan
    script) accumulate here, assembly reads it once at the end."""
    _hmax, _vmax, mcux, mcuy = _mcu_geometry(frame)
    return {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int64)
            for c in frame["comps"]}


def _decode_scan(content, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart) -> dict:
    """Sequential-baseline entropy scan (single interleaved scan covers
    every component 0..63) → decoded image dict."""
    _hmax, _vmax, mcux, mcuy = _mcu_geometry(frame)
    store = _alloc_store(frame)
    reader = _BitReader(content, pos)
    pred = {c["id"]: 0 for c, _t, _a in scan}
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) & 7
                for k in pred:
                    pred[k] = 0
            for comp, tdc, tac in scan:
                grid = store[comp["id"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        grid[my * comp["v"] + by, mx * comp["h"] + bx] = \
                            _read_block_seq(reader, huff_dc[tdc],
                                            huff_ac[tac], pred,
                                            comp["id"])
            n_mcu += 1
    return _assemble(frame, qt, store)


def _read_block_seq(reader, hdc, hac, pred, cid) -> np.ndarray:
    """One sequential-DCT block: DC diff + AC run/size walk → zigzag
    coefficient vector (shared by the interleaved fast path and the
    non-interleaved multi-scan path)."""
    zz = np.zeros(64, dtype=np.int64)
    t = reader.decode(hdc)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode(hac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break                                # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC index overflow")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz


def _decode_seq_scan(content, pos, frame, scan, store, huff_dc, huff_ac,
                     restart) -> int:
    """One sequential scan covering a SUBSET of the frame's components
    (T.81 A.2: ns > 1 interleaves the scan's own components over the
    frame MCU grid; ns == 1 walks the component's own block raster).
    Full DC+AC per block, accumulated into the coefficient grids;
    returns the position of the marker after the entropy data."""
    reader = _BitReader(content, pos)
    pred = {c["id"]: 0 for c, _t, _a in scan}
    _hmax, _vmax, mcux, mcuy = _mcu_geometry(frame)
    if len(scan) > 1:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for comp, tdc, tac in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            unit.append((comp, tdc, tac,
                                         my * comp["v"] + by,
                                         mx * comp["h"] + bx))
                units.append(unit)
    else:
        comp, tdc, tac = scan[0]
        bh, bw = _comp_block_dims(frame, comp)
        units = [[(comp, tdc, tac, y, x)]
                 for y in range(bh) for x in range(bw)]
    rst = 0
    for n, unit in enumerate(units):
        if restart and n and n % restart == 0:
            reader.sync_restart(rst)
            rst = (rst + 1) & 7
            for k in pred:
                pred[k] = 0
        for comp, tdc, tac, y, x in unit:
            store[comp["id"]][y, x] = _read_block_seq(
                reader, huff_dc[tdc], huff_ac[tac], pred, comp["id"])
    return _next_marker(content, reader)


def _assemble(frame, qt, store) -> dict:
    """Dequantize + IDCT + plane assembly from the coefficient grids —
    shared by the sequential one-scan path and the progressive
    accumulate-then-reconstruct path."""
    w, h = frame["w"], frame["h"]
    hmax, vmax, _mcux, _mcuy = _mcu_geometry(frame)
    planes = {}
    for comp in frame["comps"]:
        q = qt[comp["tq"]]
        grid = store[comp["id"]]                      # (bh, bw, 64)
        bh, bw = grid.shape[0], grid.shape[1]
        zz = grid.reshape(-1, 64)
        blocks = (zz * q[None, :])[:, _UNZIGZAG].reshape(-1, 8, 8)
        spatial = np.einsum("kn,bkl,lm->bnm", _D,
                            blocks.astype(np.float64), _D)
        px = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = (px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, hmax // comp["h"], axis=1),
                          vmax // comp["v"], axis=0)
        planes[comp["id"]] = plane[:h, :w]

    comps = frame["comps"]
    if len(comps) == 1:
        pixels = planes[comps[0]["id"]][:, :, None]
    else:
        y = planes[comps[0]["id"]].astype(np.float64)
        cb = planes[comps[1]["id"]].astype(np.float64) - 128.0
        cr = planes[comps[2]["id"]].astype(np.float64) - 128.0
        rgb = np.stack([y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb], axis=-1)
        pixels = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "n_frames": 1, "_pixels": pixels}


def _next_marker(data: bytes, reader: _BitReader) -> int:
    """Position of the next non-RST marker after a completed entropy
    scan (skips the reader's partial byte, stuffing and stray fill)."""
    pos = reader.pos
    if reader.bit:
        pos += 2 if data[pos] == 0xFF else 1
    while True:
        if data[pos] == 0xFF and data[pos + 1] != 0x00 \
                and not (0xD0 <= data[pos + 1] <= 0xD7):
            return pos
        pos += 1


def _comp_block_dims(frame, comp) -> tuple[int, int]:
    """Block-grid dimensions of ONE component in a non-interleaved scan
    (T.81 A.2.2: ceil over the component's own sample dimensions, NOT
    the MCU-padded grid)."""
    hmax, vmax, _mcux, _mcuy = _mcu_geometry(frame)
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(content, pos, frame, scan, store, huff_dc, huff_ac,
                      restart, ss, se, ah, al) -> int:
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    single-component) or AC first/refine (single-component, EOB-run
    coded), accumulating into the coefficient grids.  Returns the
    position of the marker following the entropy data."""
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG: progressive DC scan with Se != 0")
    else:
        if len(scan) != 1:
            raise ValueError("JPEG: interleaved progressive AC scan")
        if not (ss <= se <= 63):
            raise ValueError("JPEG: bad spectral band")
    reader = _BitReader(content, pos)
    _hmax, _vmax, mcux, mcuy = _mcu_geometry(frame)

    if ss == 0:                                   # DC scan
        pred = {c["id"]: 0 for c, _t, _a in scan}
        if len(scan) > 1:
            units = []                            # interleaved MCU walk
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for comp, tdc, _tac in scan:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                mcu.append((comp, tdc,
                                            my * comp["v"] + by,
                                            mx * comp["h"] + bx))
                    units.append(mcu)
        else:
            comp, tdc, _tac = scan[0]
            bh, bw = _comp_block_dims(frame, comp)
            units = [[(comp, tdc, y, x)]
                     for y in range(bh) for x in range(bw)]
        rst = 0
        for n, unit in enumerate(units):
            if restart and n and n % restart == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) & 7
                for k in pred:
                    pred[k] = 0
            for comp, tdc, y, x in unit:
                grid = store[comp["id"]]
                if ah == 0:                       # first DC scan
                    t = reader.decode(huff_dc[tdc])
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    pred[comp["id"]] += diff
                    grid[y, x, 0] = pred[comp["id"]] << al
                else:                             # DC refinement bit
                    if reader.read_bit():
                        grid[y, x, 0] |= 1 << al
        return _next_marker(content, reader)

    # AC scan — single component, band [ss, se]
    comp, _tdc, tac = scan[0]
    grid = store[comp["id"]]
    bh, bw = _comp_block_dims(frame, comp)
    table = huff_ac[tac]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    rst = 0
    n = 0
    for y in range(bh):
        for x in range(bw):
            if restart and n and n % restart == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) & 7
                eobrun = 0
            n += 1
            coef = grid[y, x]
            if ah == 0:                           # AC first scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode(table)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:               # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break                     # EOB
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC index overflow")
                    coef[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
            else:                                 # AC refinement scan
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode(table)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:           # EOB run
                                eobrun = (1 << r)
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "JPEG: bad refinement size")
                            newval = p1 if reader.read_bit() else m1
                        # advance over r zero-history positions, reading
                        # correction bits for nonzero-history coefs
                        while k <= se:
                            c = int(coef[k])
                            if c != 0:
                                if reader.read_bit() and (c & p1) == 0:
                                    coef[k] = c + (p1 if c >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError(
                                    "JPEG: AC index overflow")
                            coef[k] = newval
                        k += 1
                if eobrun > 0:
                    # end-of-band: refine remaining nonzero coefficients
                    while k <= se:
                        c = int(coef[k])
                        if c != 0 and reader.read_bit() and (c & p1) == 0:
                            coef[k] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1
    return _next_marker(content, reader)


# ---------------------------------------------------------------------------
# encoder (test harness: exercises the decoder's DHT/DQT/DRI/SOS parsing
# with real generated tables; all-ones quant by default for tight bounds)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)        # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= (8 - self.nbits)
            self.acc |= (1 << (8 - self.nbits)) - 1   # 1-fill padding
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _canonical_table(symbols: set) -> tuple[bytes, bytes, dict]:
    """Fixed-length canonical Huffman over the symbols actually used
    (one spare slot keeps the all-ones code unused, as the spec
    recommends).  Returns (bits, vals, symbol → (code, length))."""
    syms = sorted(symbols) or [0]
    length = max(1, (len(syms) + 1).bit_length())
    bits = bytearray(16)
    bits[length - 1] = len(syms)
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return bytes(bits), bytes(syms), enc


def _mag(v: int) -> tuple[int, int]:
    """Signed coefficient → (size, size-bit magnitude code)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def encode_jpeg(pixels: np.ndarray, *, subsampling: str = "444",
                quant: "np.ndarray | None" = None,
                restart_interval: int = 0,
                progressive: bool = False,
                separate_scans: bool = False) -> bytes:
    """(h, w[, c]) uint8 → JPEG bytes.  c=1 grayscale, c=3 RGB
    (encoded as YCbCr; ``subsampling`` ∈ {"444", "422", "420"}).
    ``quant``: 64 zigzag-order values shared by both tables (default
    all-ones — near-lossless, for round-trip bounds).
    ``progressive=True`` emits an SOF2 stream with the classic
    successive-approximation script (DC first Al=1 + DC refine, per-band
    AC first Al=1 + AC refine with EOB-run coding) — identical
    coefficients to the baseline stream, so both decode identically.
    ``separate_scans=True`` emits a sequential SOF0 stream with one
    NON-INTERLEAVED scan per component (T.81 A.2 single-component block
    raster) — again coefficient-identical to the interleaved stream."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    q = (np.ones(64, dtype=np.int64) if quant is None
         else np.asarray(quant, dtype=np.int64))
    sub = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    if c == 1:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
        planes = [px[:, :, 0].astype(np.float64)]
    else:
        rgb = px.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        comps = [{"id": 1, "h": sub[0], "v": sub[1], "tq": 0},
                 {"id": 2, "h": 1, "v": 1, "tq": 0},
                 {"id": 3, "h": 1, "v": 1, "tq": 0}]
        planes = [y, cb, cr]
    hmax = max(cc["h"] for cc in comps)
    vmax = max(cc["v"] for cc in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component plane at its own resolution (box-filter downsample),
    # edge-padded to whole MCUs
    comp_blocks = []
    for cc, plane in zip(comps, planes):
        fx, fy = hmax // cc["h"], vmax // cc["v"]
        if fx > 1 or fy > 1:
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            p = np.pad(plane, ((0, ph - plane.shape[0]),
                               (0, pw - plane.shape[1])), mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        tw, th = mcux * cc["h"] * 8, mcuy * cc["v"] * 8
        p = np.pad(plane, ((0, th - plane.shape[0]),
                           (0, tw - plane.shape[1])), mode="edge")
        # FDCT + quantize all blocks, then zigzag
        blk = (p - 128.0).reshape(th // 8, 8, tw // 8, 8) \
            .transpose(0, 2, 1, 3)
        coef = np.einsum("kn,yxnm,lm->yxkl", _D, blk, _D)
        zz = np.round(coef.reshape(th // 8, tw // 8, 64)[:, :, _ZIGZAG]
                      / q[None, None, :]).astype(np.int64)
        comp_blocks.append(zz)

    if progressive:
        return _encode_progressive(w, h, comps, comp_blocks, q,
                                   mcux, mcuy, restart_interval)
    if separate_scans:
        return _encode_separate_scans(w, h, comps, comp_blocks, q,
                                      restart_interval)

    # serialize MCU-major, collecting symbol histograms first
    def mcu_stream():
        pred = {cc["id"]: 0 for cc in comps}
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n and n % restart_interval == 0:
                    yield ("RST", None, None)
                    for k in pred:
                        pred[k] = 0
                for ci, cc in enumerate(comps):
                    for by in range(cc["v"]):
                        for bx in range(cc["h"]):
                            zz = comp_blocks[ci][my * cc["v"] + by,
                                                 mx * cc["h"] + bx]
                            diff = int(zz[0]) - pred[cc["id"]]
                            pred[cc["id"]] = int(zz[0])
                            yield ("BLK", ci, (diff, zz))
                n += 1

    dc_syms: set = set()
    ac_syms: set = set()
    for kind, _ci, payload in mcu_stream():
        if kind != "BLK":
            continue
        diff, zz = payload
        dc_syms.add(_mag(diff)[0])
        run = 0
        for v in zz[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                run -= 16
            ac_syms.add((run << 4) | _mag(int(v))[0])
            run = 0
        if run:
            ac_syms.add(0x00)
    ac_syms.add(0x00)
    dc_bits, dc_vals, dc_enc = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _canonical_table(ac_syms)

    bw = _BitWriter()
    rst = 0
    for kind, _ci, payload in mcu_stream():
        if kind == "RST":
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            continue
        diff, zz = payload
        size, mag = _mag(diff)
        code, length = dc_enc[size]
        bw.write(code, length)
        if size:
            bw.write(mag, size)
        run = 0
        last = 0
        for i in range(1, 64):
            if zz[i] != 0:
                last = i
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_enc[0xF0]
                bw.write(code, length)
                run -= 16
            size, mag = _mag(v)
            code, length = ac_enc[(run << 4) | size]
            bw.write(code, length)
            bw.write(mag, size)
            run = 0
        if last < 63:
            code, length = ac_enc[0x00]
            bw.write(code, length)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cc in comps:
        sof += bytes([cc["id"], (cc["h"] << 4) | cc["v"], cc["tq"]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
    out += seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cc in comps:
        sos += bytes([cc["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 G.1: spectral selection + successive
# approximation with EOB-run coding — the scan shapes real encoders
# emit, so the progressive decoder is exercised on genuine streams)
# ---------------------------------------------------------------------------


class _SymCollect:
    """Pass-1 emitter: records which Huffman symbols a scan uses."""

    def __init__(self):
        self.syms: set = set()

    def sym(self, s, _enc=None):
        self.syms.add(s)

    def bits(self, _v, _n):
        pass

    def rst(self, _n):
        pass


class _SymWrite:
    """Pass-2 emitter: canonical-coded symbols + raw bits + restarts."""

    def __init__(self, enc):
        self.bw = _BitWriter()
        self.enc = enc

    def sym(self, s, _enc=None):
        code, length = self.enc[s]
        self.bw.write(code, length)

    def bits(self, v, n):
        if n:
            self.bw.write(v, n)

    def rst(self, n):
        self.bw.flush()
        self.bw.out += bytes([0xFF, 0xD0 + (n & 7)])


def _prog_scan_units(scandef, comps, mcux, mcuy, w, h):
    """Data-unit walk for one scan: interleaved MCU order for a
    multi-component DC scan, the component's own block raster
    otherwise.  Yields lists of (ci, by, bx) per restart-countable
    unit."""
    idxs = scandef["comps"]
    if len(idxs) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci in idxs:
                    cc = comps[ci]
                    for by in range(cc["v"]):
                        for bx in range(cc["h"]):
                            unit.append((ci, my * cc["v"] + by,
                                         mx * cc["h"] + bx))
                yield unit
    else:
        ci = idxs[0]
        cc = comps[ci]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        bh = -(-(-(-h * cc["v"] // vmax)) // 8)
        bw = -(-(-(-w * cc["h"] // hmax)) // 8)
        for y in range(bh):
            for x in range(bw):
                yield [(ci, y, x)]


def _run_prog_scan(emit, scandef, comps, comp_blocks, mcux, mcuy,
                   w, h, restart):
    """Drive one progressive scan through an emitter (two-pass: symbol
    collection, then writing)."""
    ss, se = scandef["ss"], scandef["se"]
    ah, al = scandef["ah"], scandef["al"]
    pred = {ci: 0 for ci in scandef["comps"]}
    eobrun = 0
    pending: list = []                            # buffered correction bits

    def flush_eob():
        nonlocal eobrun, pending
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            n = min(eobrun, (1 << (r + 1)) - 1)
            emit.sym(r << 4)
            emit.bits(n - (1 << r), r)
            eobrun -= n
        for b in pending:
            emit.bits(b, 1)
        pending = []

    rstn = 0
    for n, unit in enumerate(_prog_scan_units(scandef, comps, mcux,
                                              mcuy, w, h)):
        if restart and n and n % restart == 0:
            flush_eob()
            emit.rst(rstn)
            rstn = (rstn + 1) & 7
            for k in pred:
                pred[k] = 0
            eobrun = 0
        for ci, y, x in unit:
            coef = comp_blocks[ci][y, x]
            if ss == 0 and ah == 0:               # DC first
                v = int(coef[0]) >> al
                diff = v - pred[ci]
                pred[ci] = v
                size, mag = _mag(diff)
                emit.sym(size)
                emit.bits(mag, size)
            elif ss == 0:                         # DC refine
                emit.bits((int(coef[0]) >> al) & 1, 1)
            elif ah == 0:                         # AC first
                r = 0
                wrote = False
                for k in range(ss, se + 1):
                    c = int(coef[k])
                    va = (abs(c) >> al) * (1 if c >= 0 else -1)
                    if va == 0:
                        r += 1
                        continue
                    flush_eob()
                    while r > 15:
                        emit.sym(0xF0)
                        r -= 16
                    size, mag = _mag(va)
                    emit.sym((r << 4) | size)
                    emit.bits(mag, size)
                    r = 0
                    wrote = True
                if r > 0 or not wrote:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
            else:                                 # AC refine
                vas = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
                eob_k = 0
                for i, t in enumerate(vas):
                    if t == 1:
                        eob_k = ss + i
                r = 0
                br: list = []
                for k in range(ss, se + 1):
                    t = vas[k - ss]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_k:
                        flush_eob()
                        emit.sym(0xF0)
                        r -= 16
                        for b in br:
                            emit.bits(b, 1)
                        br = []
                    if t > 1:                     # history coefficient
                        br.append(t & 1)
                        continue
                    flush_eob()                   # newly nonzero (|v|=1)
                    emit.sym((r << 4) | 1)
                    emit.bits(1 if int(coef[k]) > 0 else 0, 1)
                    for b in br:
                        emit.bits(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pending.extend(br)
                    if eobrun == 32767:
                        flush_eob()
    flush_eob()


def _encode_progressive(w, h, comps, comp_blocks, q, mcux, mcuy,
                        restart_interval) -> bytes:
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cc in comps:
        sof += bytes([cc["id"], (cc["h"] << 4) | cc["v"], cc["tq"]])
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    allc = list(range(len(comps)))
    script = [dict(comps=allc, ss=0, se=0, ah=0, al=1)]
    for ci in allc:
        script += [dict(comps=[ci], ss=1, se=5, ah=0, al=1),
                   dict(comps=[ci], ss=6, se=63, ah=0, al=1)]
    for ci in allc:
        script += [dict(comps=[ci], ss=1, se=5, ah=1, al=0),
                   dict(comps=[ci], ss=6, se=63, ah=1, al=0)]
    script.append(dict(comps=allc, ss=0, se=0, ah=1, al=0))

    for sd in script:
        dc_scan = sd["ss"] == 0
        needs_table = not (dc_scan and sd["ah"])  # DC refine: raw bits
        if needs_table:
            col = _SymCollect()
            _run_prog_scan(col, sd, comps, comp_blocks, mcux, mcuy,
                           w, h, restart_interval)
            bits, vals, enc = _canonical_table(col.syms)
            tc = 0x00 if dc_scan else 0x10        # table class, slot 0
            out += seg(0xC4, bytes([tc]) + bits + vals)
        else:
            enc = {}
        wr = _SymWrite(enc)
        _run_prog_scan(wr, sd, comps, comp_blocks, mcux, mcuy,
                       w, h, restart_interval)
        wr.bw.flush()
        sos = bytes([len(sd["comps"])])
        for ci in sd["comps"]:
            sos += bytes([comps[ci]["id"], 0x00])
        sos += bytes([sd["ss"], sd["se"], (sd["ah"] << 4) | sd["al"]])
        out += seg(0xDA, sos)
        out += wr.bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# sequential separate-scans encoder (one non-interleaved scan per
# component — the T.81 A.2 layout some encoders emit for 4:4:4 color;
# exercises the decoder's multi-scan sequential path on real streams)
# ---------------------------------------------------------------------------


def _seq_block_ops(diff: int, zz) -> "list[tuple]":
    """(kind, symbol, magnitude, nbits) ops for one sequential block —
    DC size/diff then AC run/size pairs with ZRL and EOB."""
    ops = []
    size, mag = _mag(int(diff))
    ops.append(("dc", size, mag, size))
    run = 0
    last = 0
    for i in range(1, 64):
        if zz[i] != 0:
            last = i
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ops.append(("ac", 0xF0, 0, 0))
            run -= 16
        s, m = _mag(v)
        ops.append(("ac", (run << 4) | s, m, s))
        run = 0
    if last < 63:
        ops.append(("ac", 0x00, 0, 0))
    return ops


def _encode_separate_scans(w, h, comps, comp_blocks, q,
                           restart_interval) -> bytes:
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    hmax = max(cc["h"] for cc in comps)
    vmax = max(cc["v"] for cc in comps)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cc in comps:
        sof += bytes([cc["id"], (cc["h"] << 4) | cc["v"], cc["tq"]])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    for ci, cc in enumerate(comps):
        cw = -(-w * cc["h"] // hmax)
        chh = -(-h * cc["v"] // vmax)
        bh, bwn = -(-chh // 8), -(-cw // 8)

        def stream():
            pred = 0
            n = 0
            for y in range(bh):
                for x in range(bwn):
                    if restart_interval and n and \
                            n % restart_interval == 0:
                        yield ("RST", None, None)
                        pred = 0
                    zz = comp_blocks[ci][y, x]
                    d = int(zz[0]) - pred
                    pred = int(zz[0])
                    yield ("BLK", d, zz)
                    n += 1

        dc_syms: set = set()
        ac_syms: set = set()
        for kind, d, zz in stream():
            if kind != "BLK":
                continue
            for k2, sym, _m, _s in _seq_block_ops(d, zz):
                (dc_syms if k2 == "dc" else ac_syms).add(sym)
        dc_bits, dc_vals, dc_enc = _canonical_table(dc_syms)
        ac_bits, ac_vals, ac_enc = _canonical_table(ac_syms)
        bwr = _BitWriter()
        rst = 0
        for kind, d, zz in stream():
            if kind == "RST":
                bwr.flush()
                bwr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                continue
            for k2, sym, m, s in _seq_block_ops(d, zz):
                code, length = (dc_enc if k2 == "dc" else ac_enc)[sym]
                bwr.write(code, length)
                if s:
                    bwr.write(m, s)
        bwr.flush()
        out += seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
        out += seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
        out += seg(0xDA, bytes([1, cc["id"], 0x00, 0, 63, 0]))
        out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)
