"""Baseline JPEG codec — pure numpy + stdlib, written from the public
ITU-T T.81 spec (the reference pipeline treats compressed media as opaque
payloads; this closes the "most common real-world image format" gap without
external codec libraries).

Decoder: baseline sequential DCT (SOF0), 8-bit precision, generic DHT/DQT
parsing (tables come from the stream, so any baseline JPEG decodes — not
just this encoder's output), arbitrary sampling factors incl. 4:2:0,
restart intervals, byte-stuffing.  Progressive (SOF2) and arithmetic coding
raise ``NotImplementedError``.

Encoder: baseline 4:4:4 or 4:2:0, standard Annex-K quantization tables
scaled by the libjpeg quality formula, per-image canonical Huffman tables
(fixed-length, spec-conformant — written into DHT like any other table).

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


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB → baseline JPEG bytes (4:2:0 when ``subsample``;
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs)."""
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

    # per-component quantized zigzag blocks in MCU-interleaved order
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

    # interleave blocks in MCU order, gather symbol stats per table class
    interleaved: list[list[np.ndarray]] = [[] for _ in planes]
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        interleaved[ci].append(comp_zz[ci][my * sv + by, mx * sh + bx])
    streams, dc_sets, ac_sets = [], [set(), set()], [set(), set()]
    for ci in range(len(planes)):
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
    n_blocks = [len(interleaved[ci]) for ci in range(len(planes))]
    done = [0] * len(planes)
    preds = [0] * len(planes)
    mcu_idx = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.write_marker(0xD0 + (mcu_idx // restart_interval - 1) % 8)
                preds = [0] * len(planes)
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
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → HxWx3 uint8 RGB (grayscale expands)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while True:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        while payload[pos + 1] == 0xFF:  # legal fill bytes before a marker
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no scan data")
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
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended seq
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, sampb, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": sampb >> 4, "v": sampb & 0xF, "tq": tq})
            sof = (ih, iw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG (SOF0/1)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tb = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in sof[2] if c["id"] == cid)
                scan_comps.append((comp, tb >> 4, tb & 0xF))
            break
        # else: APPn/COM/etc — skipped
    ih, iw, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_cols = ceil(iw / (8 * hmax))
    mcu_rows = ceil(ih / (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcu_rows * 8 * c["v"], mcu_cols * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }
    reader = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for comp, tdc, tac in scan_comps:
                qt = qts[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _huff_read(reader, huff[(0, tdc)])
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[comp["id"]] += diff
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_read(reader, huff[(1, tac)])
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            sz = sym & 0xF
                            zz[k] = _extend(reader.read_bits(sz), sz)
                            k += 1
                        blk = np.zeros((8, 8), dtype=np.float64)
                        blk[_ZZ_ROWS, _ZZ_COLS] = zz * qt[_ZZ_ROWS, _ZZ_COLS]
                        px = _DCT_C.T @ blk @ _DCT_C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:ih, :iw])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(full[:3], axis=2))
