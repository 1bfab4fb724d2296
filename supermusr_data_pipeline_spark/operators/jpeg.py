"""JPEG codec — pure numpy + stdlib, written from the public ITU-T T.81
spec (the reference pipeline treats compressed media as opaque payloads;
this closes the "most common real-world image format" gap without external
codec libraries).

Decoder: baseline sequential (SOF0/1) AND progressive (SOF2) DCT, 8-bit
precision, generic DHT/DQT parsing (tables come from the stream, so any
conforming JPEG decodes — not just this encoder's output), arbitrary
sampling factors incl. 4:2:0, restart intervals, byte-stuffing.  One
architecture for both modes: every scan accumulates into a coefficient
store (spectral selection + successive approximation per T.81 Annex G,
incl. general EOB runs and refinement correction bits); IDCT runs once at
EOI.  LOSSLESS mode (SOF3, Annex H) decodes too — all seven predictors,
2..16-bit precision, restart intervals, sample-interleaved components
(``decode_lossless_jpeg`` for raw samples; ``decode_jpeg`` maps the 8-bit
case onto the RGB contract).  Arithmetic coding and hierarchical modes
raise ``NotImplementedError``.

Encoder: baseline 4:4:4 or 4:2:0, standard Annex-K quantization tables
scaled by the libjpeg quality formula, per-image canonical Huffman tables
(fixed-length, spec-conformant — written into DHT like any other table);
plus a progressive encoder (``encode_progressive_jpeg``) with a DC + two
spectral bands + refinement scan script over the SAME quantized
coefficients, so progressive and baseline decode pixel-identically; EOB
runs accumulate across blocks (EOBn with appended correction bits) on
both the encode and decode side.

Everything is 8x8-block numpy: the DCT/IDCT are orthonormal matrix
products, so the only loss is quantization + uint8 clipping.
"""

from __future__ import annotations

import struct
from math import ceil, cos, log2, pi

import numpy as np

# --------------------------------------------------------------------------
# constants: zigzag order, DCT basis, Annex-K quantization tables
# --------------------------------------------------------------------------


def _zigzag_order() -> list[tuple[int, int]]:
    out = []
    for d in range(15):
        rows = list(range(max(0, d - 7), min(d, 7) + 1))
        if d % 2 == 0:
            rows.reverse()
        out.extend((r, d - r) for r in rows)
    return out


_ZZ = _zigzag_order()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

_DCT_C = np.array(
    [
        [(1 / 8) ** 0.5 if k == 0 else 0.5 * cos((2 * n + 1) * k * pi / 16) for n in range(8)]
        for k in range(8)
    ]
)

_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ]
)

_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ]
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# bit I/O with JPEG byte stuffing
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)

    def write_marker(self, marker: int) -> None:
        """Byte-align (1-padded) and emit a raw, unstuffed marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, marker])


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed FF
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> int:
        """Byte-align and consume one RSTn marker; return its index."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1  # skip pad bits/bytes before the marker
        marker = self.data[self.pos + 1]
        if not 0xD0 <= marker <= 0xD7:
            raise ValueError(f"expected RST marker, got FF{marker:02X}")
        self.pos += 2
        return marker - 0xD0


class _MarkerHit(Exception):
    """Raised when the entropy stream runs into a real (non-RST) marker."""

    def __init__(self, marker: int) -> None:
        self.marker = marker


# --------------------------------------------------------------------------
# Huffman tables
# --------------------------------------------------------------------------


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(BITS, HUFFVAL) → {(code_length, code): symbol} (canonical codes)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _fixed_huff_table(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Canonical fixed-length table over the symbols actually used: valid
    (prefix-free, all-ones code unused), tiny to emit, trivial to build."""
    vals = sorted(symbols)
    length = max(1, ceil(log2(len(vals) + 1)))
    bits = [0] * 16
    bits[length - 1] = len(vals)
    enc = {sym: (length, i) for i, sym in enumerate(vals)}
    return bits, vals, enc


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _extend(r: int, s: int) -> int:
    return r if s == 0 or r >= (1 << (s - 1)) else r - (1 << s) + 1


# --------------------------------------------------------------------------
# color transforms
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[:, :, i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge-replicate) and split into 8x8 blocks:
    returns (rows, cols, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = p.shape
    return p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _encode_component_blocks(blocks_zz: np.ndarray) -> tuple[list, set, set]:
    """Quantized zigzag blocks (n, 64) → symbol stream [(kind, sym, val, s)],
    plus the AC symbol alphabet.  DC entries carry the RAW coefficient —
    differencing happens at write time so restart markers can reset the
    predictor; the DC alphabet is the full category range 0..11 (12 symbols,
    still a tiny table)."""
    stream = []
    dc_syms: set[int] = set(range(12))
    ac_syms: set[int] = set()
    for blk in blocks_zz:
        stream.append(("dc", 0, int(blk[0]), 0))
        nz = np.nonzero(blk[1:])[0]
        run = 0
        prev = -1
        for idx in nz:
            run = idx - prev - 1
            prev = idx
            while run > 15:
                ac_syms.add(0xF0)
                stream.append(("ac", 0xF0, 0, 0))
                run -= 16
            v = int(blk[1 + idx])
            s = _category(v)
            sym = (run << 4) | s
            ac_syms.add(sym)
            stream.append(("ac", sym, v, s))
        if prev != 62:  # not all trailing coefficients emitted
            ac_syms.add(0x00)
            stream.append(("ac", 0x00, 0, 0))
    return stream, dc_syms, ac_syms


def _prepare_components(
    pixels: np.ndarray, quality: int, subsample: bool
) -> tuple:
    """RGB pixels → (qt, samp, comp_zz, mcu_rows, mcu_cols): per-component
    quantized zigzag block grids, shared by the baseline and progressive
    encoders (same coefficients — progressive is a reorganization of the
    entropy coding, not of the data)."""
    h, w = pixels.shape[:2]
    ycc = _rgb_to_ycbcr(np.asarray(pixels, dtype=np.uint8))
    qt = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]

    planes = [ycc[:, :, 0]]
    if subsample:
        ph, pw = -h % 2, -w % 2
        p = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
        for c in (1, 2):  # 2x2 mean pool
            cc = p[:, :, c]
            planes.append(cc.reshape(cc.shape[0] // 2, 2, cc.shape[1] // 2, 2).mean(axis=(1, 3)))
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes += [ycc[:, :, 1], ycc[:, :, 2]]
        samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_cols = ceil(w / (8 * hmax))
    mcu_rows = ceil(h / (8 * vmax))

    comp_zz = []
    for ci, plane in enumerate(planes):
        sh, sv = samp[ci]
        # pad the plane so it covers mcu_cols/mcu_rows fully
        need_h, need_w = mcu_rows * 8 * sv, mcu_cols * 8 * sh
        p = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        blocks = _plane_blocks(p)  # (rows, cols, 8, 8)
        coef = np.einsum("km,rcmn,ln->rckl", _DCT_C, blocks - 128.0, _DCT_C)
        q = np.rint(coef / qt[0 if ci == 0 else 1]).astype(np.int32)
        comp_zz.append(q[:, :, _ZZ_ROWS, _ZZ_COLS])  # (rows, cols, 64)
    return qt, samp, comp_zz, mcu_rows, mcu_cols


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB → baseline JPEG bytes (4:2:0 when ``subsample``;
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs)."""
    h, w = pixels.shape[:2]
    qt, samp, comp_zz, mcu_rows, mcu_cols = _prepare_components(
        pixels, quality, subsample
    )

    # interleave blocks in MCU order, gather symbol stats per table class
    interleaved: list[list[np.ndarray]] = [[] for _ in comp_zz]
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        interleaved[ci].append(comp_zz[ci][my * sv + by, mx * sh + bx])
    streams, dc_sets, ac_sets = [], [set(), set()], [set(), set()]
    for ci in range(len(comp_zz)):
        st, dcs, acs = _encode_component_blocks(np.array(interleaved[ci]))
        streams.append(st)
        t = 0 if ci == 0 else 1
        dc_sets[t] |= dcs
        ac_sets[t] |= acs
    dc_tables = [_fixed_huff_table(s) for s in dc_sets]
    ac_tables = [_fixed_huff_table(s) for s in ac_sets]

    # entropy-code: walk the MCU interleave again, pulling from each stream
    writer = _BitWriter()
    iters = [iter(s) for s in streams]
    n_blocks = [len(interleaved[ci]) for ci in range(len(comp_zz))]
    done = [0] * len(comp_zz)
    preds = [0] * len(comp_zz)
    mcu_idx = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.write_marker(0xD0 + (mcu_idx // restart_interval - 1) % 8)
                preds = [0] * len(comp_zz)
            mcu_idx += 1
            for ci, (sh, sv) in enumerate(samp):
                t = 0 if ci == 0 else 1
                for _ in range(sh * sv):
                    # one block = one dc symbol + ac symbols until EOB/end
                    kind, _, val, _ = next(iters[ci])
                    assert kind == "dc"
                    diff = val - preds[ci]
                    preds[ci] = val
                    s = _category(diff)
                    ln, code = dc_tables[t][2][s]
                    writer.write(code, ln)
                    if s:
                        writer.write(_value_bits(diff, s), s)
                    done[ci] += 1
                    # emit AC until this block's coefficients are done
                    count = 0
                    while count < 63:
                        kind, sym, val, s = next(iters[ci])
                        ln, code = ac_tables[t][2][sym]
                        writer.write(code, ln)
                        if sym == 0x00:
                            break
                        if sym == 0xF0:
                            count += 16
                            continue
                        count += (sym >> 4) + 1
                        writer.write(_value_bits(val, s), s)
    assert done == n_blocks
    scan = writer.flush()

    # assemble segments
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for tq, table in enumerate(qt):
        zz = table[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
        out.append(seg(0xFFDB, bytes([tq]) + zz.tobytes()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out.append(seg(0xFFC0, sof))
    if restart_interval:
        out.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    for cls, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (bits, vals, _) in enumerate(tables):
            out.append(seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)))
    sos = bytes([3])
    for ci in range(3):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out.append(seg(0xFFDA, sos))
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# --------------------------------------------------------------------------
# progressive encoder
# --------------------------------------------------------------------------


class _SymCollector:
    """First pass over a scan body: records which Huffman symbols each
    (class, table) needs; ignores raw bits."""

    def __init__(self) -> None:
        self.tables: dict[tuple[int, int], set[int]] = {}

    def sym(self, cls: int, tid: int, s: int) -> None:
        self.tables.setdefault((cls, tid), set()).add(s)

    def bits(self, v: int, n: int) -> None:
        pass


class _ScanWriter:
    """Second pass: same body, real entropy output."""

    def __init__(self, writer: _BitWriter, enc: dict) -> None:
        self.writer = writer
        self.enc = enc

    def sym(self, cls: int, tid: int, s: int) -> None:
        ln, code = self.enc[(cls, tid)][s]
        self.writer.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.writer.write(v, n)


def _mag_shift(v: int, al: int) -> int:
    """AC point transform: sign-preserving magnitude shift (T.81)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def encode_progressive_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """HxWx3 uint8 RGB → progressive JPEG (SOF2) bytes.

    Scan script (exercises every progressive mechanism): interleaved DC
    first pass at Al=1, DC refinement bit, per-component AC first passes
    split into two spectral bands (1-5, 6-63) at Al=1, then the matching
    AC refinement scans at Al=0.  The quantized coefficients are identical
    to ``encode_jpeg``'s — progressive is a lossless reorganization of the
    entropy coding, so decode(progressive) == decode(baseline) pixel-exact
    at equal quality (pinned by tests/test_jpeg.py).  EOB runs accumulate
    across blocks (EOBn symbols with refinement correction bits appended
    after the run length), per T.81 G.1.2.2-3."""
    h, w = pixels.shape[:2]
    qt, samp, comp_zz, mcu_rows, mcu_cols = _prepare_components(
        pixels, quality, subsample
    )
    hmax = max(s0 for s0, _ in samp)
    vmax = max(s1 for _, s1 in samp)
    tgrid = []
    for sh, sv in samp:
        cw, chh = ceil(w * sh / hmax), ceil(h * sv / vmax)
        tgrid.append((ceil(chh / 8), ceil(cw / 8)))

    def dc_first_body(emit, al):
        preds = [0] * len(comp_zz)
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                for ci, (sh, sv) in enumerate(samp):
                    t = 0 if ci == 0 else 1
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(comp_zz[ci][my * sv + by, mx * sh + bx, 0]) >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            s = _category(diff)
                            emit.sym(0, t, s)
                            if s:
                                emit.bits(_value_bits(diff, s), s)

    def dc_refine_body(emit, al):
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(comp_zz[ci][my * sv + by, mx * sh + bx, 0])
                            emit.bits((v >> al) & 1, 1)

    def _flush_eob(emit, t, eobrun, ebits):
        """Emit an accumulated EOBn (2^r <= run < 2^(r+1); r extra bits),
        followed by any buffered refinement correction bits."""
        r = eobrun.bit_length() - 1
        emit.sym(1, t, r << 4)
        emit.bits(eobrun - (1 << r), r)
        for b in ebits:
            emit.bits(b, 1)

    def ac_first_body(emit, ci, ss, se, al):
        t = 0 if ci == 0 else 1
        tbr, tbc = tgrid[ci]
        eobrun = 0
        for by in range(tbr):
            for bx in range(tbc):
                blk = comp_zz[ci][by, bx]
                vals = [_mag_shift(int(blk[k]), al) for k in range(ss, se + 1)]
                if not any(vals):  # whole band zero: extend the EOB run
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        _flush_eob(emit, t, eobrun, [])
                        eobrun = 0
                    continue
                if eobrun:
                    _flush_eob(emit, t, eobrun, [])
                    eobrun = 0
                run = 0
                for v in vals:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        emit.sym(1, t, 0xF0)
                        run -= 16
                    s = _category(v)
                    emit.sym(1, t, (run << 4) | s)
                    emit.bits(_value_bits(v, s), s)
                    run = 0
                if run > 0:  # trailing zeros start a new EOB run
                    eobrun += 1
        if eobrun:
            _flush_eob(emit, t, eobrun, [])

    def ac_refine_body(emit, ci, ss, se, al):
        t = 0 if ci == 0 else 1
        tbr, tbc = tgrid[ci]
        eobrun = 0
        ebits: list[int] = []  # correction bits owed after the EOBn symbol
        for by in range(tbr):
            for bx in range(tbc):
                blk = comp_zz[ci][by, bx]
                absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                eob = -1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob = i
                if eob < 0:  # no new significances: whole band joins the run
                    eobrun += 1
                    ebits += [a & 1 for a in absv if a > 1]
                    if eobrun == 0x7FFF:
                        _flush_eob(emit, t, eobrun, ebits)
                        eobrun, ebits = 0, []
                    continue
                if eobrun:
                    _flush_eob(emit, t, eobrun, ebits)
                    eobrun, ebits = 0, []
                run = 0
                pend: list[int] = []
                for i, a in enumerate(absv):
                    if a == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob:
                        emit.sym(1, t, 0xF0)
                        for b in pend:
                            emit.bits(b, 1)
                        pend = []
                        run -= 16
                    if a > 1:  # history-nonzero: correction bit, not in run
                        pend.append(a & 1)
                        continue
                    emit.sym(1, t, (run << 4) | 1)  # newly significant
                    emit.bits(1 if int(blk[ss + i]) >= 0 else 0, 1)
                    for b in pend:
                        emit.bits(b, 1)
                    pend = []
                    run = 0
                if run > 0 or pend:  # band tail starts a new EOB run
                    eobrun += 1
                    ebits += pend
        if eobrun:
            _flush_eob(emit, t, eobrun, ebits)

    # scan script: (body, scan_component_ids or None for interleaved,
    #               ss, se, ah, al, needs_tables)
    scans = [
        (lambda e: dc_first_body(e, 1), None, 0, 0, 0, 1, True),
        (lambda e: dc_refine_body(e, 0), None, 0, 0, 1, 0, False),
    ]
    for ci in range(3):
        for ss, se in ((1, 5), (6, 63)):
            scans.append(
                (lambda e, ci=ci, ss=ss, se=se: ac_first_body(e, ci, ss, se, 1),
                 ci, ss, se, 0, 1, True)
            )
    for ci in range(3):
        for ss, se in ((1, 5), (6, 63)):
            scans.append(
                (lambda e, ci=ci, ss=ss, se=se: ac_refine_body(e, ci, ss, se, 0),
                 ci, ss, se, 1, 0, True)
            )

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = [b"\xff\xd8"]
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for tq, table in enumerate(qt):
        zz = table[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
        out.append(seg(0xFFDB, bytes([tq]) + zz.tobytes()))
    sofb = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sofb += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out.append(seg(0xFFC2, sofb))  # SOF2: progressive DCT

    for body_fn, ci, ss, se, ah, al, needs_tables in scans:
        enc_tables: dict = {}
        if needs_tables:
            coll = _SymCollector()
            body_fn(coll)
            for (cls, tid), syms in sorted(coll.tables.items()):
                bits, vals, enc = _fixed_huff_table(syms)
                out.append(
                    seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
                )
                enc_tables[(cls, tid)] = enc
        if ci is None:  # interleaved DC scan over all three components
            sos = bytes([3])
            for c in range(3):
                t = 0 if c == 0 else 1
                sos += bytes([c + 1, (t << 4) | t])
        else:
            t = 0 if ci == 0 else 1
            sos = bytes([1, ci + 1, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        out.append(seg(0xFFDA, sos))
        writer = _BitWriter()
        body_fn(_ScanWriter(writer, enc_tables))
        out.append(writer.flush())
    out.append(b"\xff\xd9")
    return b"".join(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _block_dc_first(reader, blk, dc_table, pred: int, al: int) -> int:
    s = _huff_read(reader, dc_table)
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred += diff
    blk[0] = pred << al
    return pred


def _block_ac_first(reader, blk, ss, se, al, ac_table, eobrun: int) -> int:
    """First-pass AC band decode (also the baseline AC path with ss=1,
    se=63, al=0 — baseline EOB is the degenerate EOB-run of one block)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_read(reader, ac_table)
        r, sz = sym >> 4, sym & 0xF
        if sz == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.read_bits(sz), sz) << al
        k += 1
    return eobrun


def _refine_nonzero(reader, blk, k: int, p1: int, m1: int) -> None:
    if reader.read_bit():
        if (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1


def _block_ac_refine(reader, blk, ss, se, al, ac_table, eobrun: int) -> int:
    """Successive-approximation AC refinement (T.81 G.1.2.3): runs count
    only zero-history coefficients; already-nonzero coefficients crossed by
    a run contribute one correction bit each, appended after the symbol's
    sign bit; EOB-run blocks still carry correction bits for every nonzero
    coefficient left in the band."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_read(reader, ac_table)
            r, sz = sym >> 4, sym & 0xF
            if sz:
                if sz != 1:
                    raise ValueError("bad refinement-scan symbol")
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                newval = 0  # ZRL: 16 zero-history positions, nothing placed
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(reader, blk, k, p1, m1)
                else:
                    if r == 0:
                        blk[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                _refine_nonzero(reader, blk, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    reader, scan_comps, ss, se, ah, al, huff, coef, geom, restart_interval
) -> None:
    """Decode one entropy-coded scan into the coefficient store.  Baseline
    is the ss=0..se=63, ah=al=0 interleaved case of the same machinery."""
    preds = {c["id"]: 0 for c, _, _ in scan_comps}
    eobrun = 0
    unit = 0

    def maybe_restart():
        nonlocal preds, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            reader.restart()
            preds = {c["id"]: 0 for c, _, _ in scan_comps}
            eobrun = 0

    if len(scan_comps) > 1:  # interleaved (MCU order over the padded grid)
        if ss != 0:
            raise ValueError("progressive AC scans must be single-component")
        g0 = geom[scan_comps[0][0]["id"]]
        for my in range(g0["mcu_rows"]):
            for mx in range(g0["mcu_cols"]):
                maybe_restart()
                unit += 1
                for comp, tdc, tac in scan_comps:
                    g = geom[comp["id"]]
                    store = coef[comp["id"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = store[my * comp["v"] + by, mx * comp["h"] + bx]
                            if ah == 0:
                                preds[comp["id"]] = _block_dc_first(
                                    reader, blk, huff[(0, tdc)], preds[comp["id"]], al
                                )
                                if se > 0:
                                    eobrun = _block_ac_first(
                                        reader, blk, 1, se, al, huff[(1, tac)], eobrun
                                    )
                            else:
                                blk[0] += reader.read_bit() << al
    else:  # non-interleaved: raster order over the TRUE block grid
        comp, tdc, tac = scan_comps[0]
        g = geom[comp["id"]]
        store = coef[comp["id"]]
        for by in range(g["tbrows"]):
            for bx in range(g["tbcols"]):
                maybe_restart()
                unit += 1
                blk = store[by, bx]
                if ss == 0:
                    if ah == 0:
                        preds[comp["id"]] = _block_dc_first(
                            reader, blk, huff[(0, tdc)], preds[comp["id"]], al
                        )
                        if se > 0:  # baseline-style single-component scan
                            eobrun = _block_ac_first(
                                reader, blk, 1, se, al, huff[(1, tac)], eobrun
                            )
                    else:
                        blk[0] += reader.read_bit() << al
                elif ah == 0:
                    eobrun = _block_ac_first(
                        reader, blk, ss, se, al, huff[(1, tac)], eobrun
                    )
                else:
                    eobrun = _block_ac_refine(
                        reader, blk, ss, se, al, huff[(1, tac)], eobrun
                    )


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG bytes → HxWx3 uint8 RGB
    (grayscale expands).  One architecture for both modes: every scan
    accumulates into a per-component coefficient store (progressive scans
    refine it across spectral bands / approximation bits); dequantization,
    IDCT, upsampling, and color conversion run once at EOI."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    coef: dict[int, np.ndarray] = {}
    geom: dict[int, dict] = {}
    saw_scan = False
    while True:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        while payload[pos + 1] == 0xFF:  # legal fill bytes before a marker
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if not saw_scan:
                raise ValueError("JPEG has no scan data")
            break
        (ln,) = struct.unpack_from(">H", payload, pos)
        if ln < 2:
            raise ValueError(f"bad JPEG segment length {ln} for marker FF{marker:02X}")
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (may hold several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(body, dtype=np.uint8, count=64, offset=b)
                t = np.zeros((8, 8), dtype=np.int32)
                t[_ZZ_ROWS, _ZZ_COLS] = zz
                qts[tq] = t
                b += 64
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                huff[(cls, tid)] = _huff_decode_map(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, sampb, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": sampb >> 4, "v": sampb & 0xF, "tq": tq})
            sof = (ih, iw, comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcu_cols = ceil(iw / (8 * hmax))
            mcu_rows = ceil(ih / (8 * vmax))
            for c in comps:
                cw = ceil(iw * c["h"] / hmax)
                ch = ceil(ih * c["v"] / vmax)
                geom[c["id"]] = {
                    "mcu_rows": mcu_rows,
                    "mcu_cols": mcu_cols,
                    "tbrows": ceil(ch / 8),
                    "tbcols": ceil(cw / 8),
                }
                coef[c["id"]] = np.zeros(
                    (mcu_rows * c["v"], mcu_cols * c["h"], 64), dtype=np.int32
                )
        elif marker == 0xC3:  # lossless (Annex H): delegate to the
            # predictive decoder; it re-parses the payload from scratch
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(
                    "lossless JPEG precision > 8 does not fit the uint8 RGB "
                    "contract — call decode_lossless_jpeg for raw samples"
                )
            s = decode_lossless_jpeg(payload)
            if s.shape[2] == 1:
                g = np.clip(s[:, :, 0], 0, 255).astype(np.uint8)
                return np.repeat(g[:, :, None], 3, axis=2)
            if s.shape[2] == 3:
                # lossless stores RGB directly (no color transform)
                return np.clip(s, 0, 255).astype(np.uint8)
            raise NotImplementedError("lossless JPEG with >3 components")
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/progressive DCT (SOF0/1/2) and lossless (SOF3)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tb = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in sof[2] if c["id"] == cid)
                scan_comps.append((comp, tb >> 4, tb & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            reader = _BitReader(payload, pos)
            _decode_scan(
                reader, scan_comps, ss, se, ahal >> 4, ahal & 0xF,
                huff, coef, geom, restart_interval,
            )
            saw_scan = True
            # skip entropy padding up to the next true marker
            pos = reader.pos
            while not (payload[pos] == 0xFF and payload[pos + 1] != 0x00):
                pos += 1
        # else: APPn/COM/etc — skipped

    ih, iw, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        zz = coef[c["id"]]  # (brows, bcols, 64)
        qt = qts[c["tq"]]
        blocks = np.zeros(zz.shape[:2] + (8, 8), dtype=np.float64)
        blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = zz * qt[_ZZ_ROWS, _ZZ_COLS]
        px = np.einsum("mk,rcmn,nl->rckl", _DCT_C, blocks, _DCT_C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(px.shape[0] * 8, px.shape[1] * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:ih, :iw])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(full[:3], axis=2))


# --------------------------------------------------------------------------
# lossless JPEG (SOF3, ITU-T T.81 Annex H): predictive coding, Huffman
# entropy — the archival/medical mode.  Samples are 2..16-bit; prediction
# uses the left (Ra), above (Rb), above-left (Rc) neighbors with the
# standard seven predictors; differences are coded exactly like DC
# coefficients (SSSS category + value bits, SSSS=16 meaning 32768 with no
# extra bits) in modulo-2^16 arithmetic.  Multi-component images are
# sample-interleaved (h=v=1) and stored WITHOUT a color transform — the
# mode is lossless, so RGB stays RGB.
# --------------------------------------------------------------------------


def _predict_at(
    plane: np.ndarray,
    row: int,
    col: int,
    seg_row: int,
    seg_col: int,
    predictor: int,
    default: int,
) -> int:
    """Px for plane[row, col] under the H.1.2.2 rules with restart
    intervals counted in MCUs (= sample positions in a lossless scan).
    (seg_row, seg_col) is the first MCU of the current restart interval:
    that sample predicts ``default``; the rest of ITS line uses the 1-D
    predictor Ra; every later line uses Rb at column 0 and the selected
    predictor elsewhere, against the fully reconstructed neighbors (a
    restart resets entropy coding and the prediction origin, not the
    image geometry)."""
    if row == seg_row:
        return default if col == seg_col else int(plane[row, col - 1])
    if col == 0:
        return int(plane[row - 1, 0])
    ra = int(plane[row, col - 1])
    rb = int(plane[row - 1, col])
    rc = int(plane[row - 1, col - 1])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    if predictor == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {predictor}")


def encode_lossless_jpeg(
    samples: np.ndarray,
    precision: int = 8,
    predictor: int = 1,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, C) integer samples → lossless JPEG (SOF3) bytes.
    Exact roundtrip with :func:`decode_lossless_jpeg` when
    ``point_transform`` is 0 (a nonzero point transform drops the low Pt
    bits by definition — T.81 H.1).  ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs — for a lossless scan an MCU is ONE
    interleaved sample position (all components at one (row, col)),
    B.2.4.4/H.1 — so restarts may fall mid-row.  Prediction after a
    restart follows H.1.2.2 exactly as at the start of the scan: the
    first sample of the interval predicts 2^(P-Pt-1), the remainder of
    that sample LINE uses the 1-D predictor Ra, and subsequent lines
    resume the selected predictor (Rb at line starts) against the
    reconstructed neighbors."""
    arr = np.asarray(samples)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if not 2 <= precision <= 16:
        raise ValueError("lossless JPEG precision must be 2..16")
    if arr.min() < 0 or arr.max() >= (1 << precision):
        raise ValueError("samples out of range for precision")
    arr = (arr.astype(np.int64) >> point_transform).astype(np.int64)
    default = 1 << (precision - point_transform - 1)

    # pass 1: diffs per sample in interleave order, with restart resets
    diffs: list[int] = []

    def _emit_diffs() -> None:
        recon = [np.zeros((h, w), dtype=np.int64) for _ in range(nc)]
        since_restart = 0          # MCUs coded since the last RST
        seg_row, seg_col = 0, 0    # coords of the segment's first MCU
        for row in range(h):
            for col in range(w):
                if restart_interval and since_restart >= restart_interval:
                    diffs.append(("rst",))
                    since_restart = 0
                    seg_row, seg_col = row, col
                for c in range(nc):
                    plane = recon[c]
                    px = _predict_at(
                        plane, row, col, seg_row, seg_col, predictor, default
                    )
                    x = int(arr[row, col, c])
                    d = ((x - px + 32768) % 65536) - 32768
                    diffs.append((d,))
                    plane[row, col] = x
                since_restart += 1

    _emit_diffs()

    cats = set()
    for d in diffs:
        if d[0] != "rst":
            v = d[0]
            cats.add(16 if v == -32768 else _category(v))
    bits, vals, enc = _fixed_huff_table(cats or {0})

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    sofb = struct.pack(">BHHB", precision, h, w, nc)
    for c in range(nc):
        sofb += bytes([c + 1, 0x11, 0])
    out += seg(0xFFC3, sofb)
    out += seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sosb = bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
    sosb += bytes([predictor, 0, point_transform])
    out += seg(0xFFDA, sosb)

    bw = _BitWriter()
    rst = 0
    for d in diffs:
        if d[0] == "rst":
            bw.write_marker(0xD0 + (rst % 8))
            rst += 1
            continue
        v = d[0]
        s = 16 if v == -32768 else _category(v)
        ln, code = enc[s]
        bw.write(code, ln)
        if 0 < s < 16:
            bw.write(_value_bits(v, s), s)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_lossless_jpeg(payload: bytes) -> np.ndarray:
    """Lossless JPEG (SOF3) bytes → (H, W, C) int64 samples (exact)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    huff: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    result = None
    while True:
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xC4:
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                tbits = list(body[b + 1 : b + 17])
                n = sum(tbits)
                huff[tid] = _huff_decode_map(tbits, list(body[b + 17 : b + 17 + n]))
                b += 17 + n
        elif marker == 0xC3:
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = [body[6 + 3 * i] for i in range(nc)]
            sof = (prec, ih, iw, nc)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("lossless SOS before SOF3")
            prec, ih, iw, nc = sof
            ns = body[0]
            tables = [huff[body[2 + 2 * i] >> 4] for i in range(ns)]
            predictor = body[1 + 2 * ns]
            pt = body[3 + 2 * ns] & 0xF
            default = 1 << (prec - pt - 1)
            planes = [np.zeros((ih, iw), dtype=np.int64) for _ in range(nc)]
            reader = _BitReader(payload, pos)
            # Ri counts MCUs = sample positions (B.2.4.4/H.1), so a
            # conformant stream may restart MID-ROW; prediction resets per
            # H.1.2.2 at the interval's first sample (see _predict_at)
            since_restart = 0
            seg_row, seg_col = 0, 0
            for row in range(ih):
                for col in range(iw):
                    if restart_interval and since_restart >= restart_interval:
                        reader.restart()
                        since_restart = 0
                        seg_row, seg_col = row, col
                    for c in range(nc):
                        s = _huff_read(reader, tables[c])
                        if s == 16:
                            d = 32768
                        elif s == 0:
                            d = 0
                        else:
                            d = _extend(reader.read_bits(s), s)
                        plane = planes[c]
                        px = _predict_at(
                            plane, row, col, seg_row, seg_col, predictor, default
                        )
                        plane[row, col] = (px + d) % 65536
                    since_restart += 1
            result = np.stack(planes, axis=2) << pt
            pos = reader.pos
            while not (payload[pos] == 0xFF and payload[pos + 1] != 0x00):
                pos += 1
    if result is None:
        raise ValueError("lossless JPEG has no scan data")
    return result
