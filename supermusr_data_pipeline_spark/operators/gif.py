"""GIF87a/89a codec — from-spec LZW, palettes, interlace, animation.

Completes the multimodal container set (BMP/PGM/PNG/JPEG/WAV + the frame
container): GIF is the remaining format a scraped-web corpus actually
contains in volume.  Implemented from the public specification (GIF89a,
CompuServe 1990; LZW per the spec's variable-code-width variant with
CLEAR/END codes and 12-bit dictionary cap) — no codec library.

Decoder features: global and local color tables, the 4-pass interlace,
multi-frame animations with graphic-control extensions (transparency
index honored, frames composited onto the running canvas — all four
disposal methods: 0/1 leave the canvas, 2 restores the frame rect to the
global-table background color, 3 restores the pre-draw rect).  Encoder:
single- or multi-frame, optional interlace, palette built from the image
(>256 distinct colors raises — quantization is a separate concern).

Like the JPEG/PNG codecs, this runs inside Arrow batches on executors
(operators/multimodal.py's mapInPandas pipeline) — per-payload decode is
sequential by nature; parallelism comes from the corpus partitioning.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, CLEAR/END, 12-bit cap)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[int] = []  # (value, width) pairs flattened below

    def emit(code: int, width: int) -> None:
        out_bits.append((code, width))

    dict_: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for sym in indices.astype(np.uint8).tobytes():
        trial = prefix + bytes([sym])
        if trial in dict_:
            prefix = trial
            continue
        emit(dict_[prefix], width)
        dict_[trial] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            emit(clear, width)
            dict_ = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([sym])
    if prefix:
        emit(dict_[prefix], width)
    emit(end, width)

    # pack LSB-first
    acc = n = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = n = pos = 0
    prev: bytes | None = None
    while True:
        while n < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: emit what we have
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, dict]:
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise NotImplementedError(
            f"{len(colors)} distinct colors; GIF needs a <=256 palette "
            "(quantize first)"
        )
    lut = {tuple(c): i for i, c in enumerate(colors)}
    return colors, lut


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_order(h: int) -> np.ndarray:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return np.array(order)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """Encode one HxWx3 uint8 image (or a list of equal-size frames) as
    GIF89a with a global palette; multi-frame inputs become an animation
    with per-frame graphic-control extensions."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w, _ = frames[0].shape
    palette, lut = _build_palette(frames)
    gct_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    gct_size = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1), 0, 0])
    out += palette.astype(np.uint8).tobytes()
    out += b"\x00" * (3 * (gct_size - len(palette)))
    min_code = max(2, gct_bits)
    for f in frames:
        if len(frames) > 1:
            out += bytes([0x21, 0xF9, 4, 0x04, delay_cs & 0xFF, delay_cs >> 8, 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3)], dtype=np.uint8
        ).reshape(h, w)
        if interlace:
            idx = idx[_interlace_order(h)]
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(idx.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame to HxWx3 uint8, composited per the disposal
    rules (see module docstring)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed, bg_index, _ar = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        # clamp: a foreign/corrupt GIF may declare bg_index past the table
        canvas[:] = gct[bg_index]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gc = payload[pos + 1 : pos + 1 + size]
                disposal = (gc[0] >> 2) & 0x07
                transparent = gc[3] if gc[0] & 0x01 else None
                pos += 1 + size
                pos += 1  # terminator
            else:  # skip any other extension's sub-blocks
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        ipacked = payload[pos]
        pos += 1
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(data), min_code), np.uint8)[
            : fw * fh
        ].reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: undo the pass permutation
            deinter = np.empty_like(idx)
            deinter[_interlace_order(fh)] = idx
            idx = deinter

        prev_rect = canvas[top : top + fh, left : left + fw].copy()
        rgb = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region = canvas[top : top + fh, left : left + fw]
            canvas[top : top + fh, left : left + fw] = np.where(mask, rgb, region)
        else:
            canvas[top : top + fh, left : left + fw] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore rect to background
            # spec: the background color indexes the GLOBAL table (the
            # logical-screen descriptor's bg field), not the frame's local
            # table; black when there is no global table or the index is
            # out of range
            bg = gct[bg_index] if gct is not None and bg_index < len(gct) else 0
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3:  # restore previous: the rect as it was pre-draw
            canvas[top : top + fh, left : left + fw] = prev_rect
        # disposal 0/1: leave the canvas as drawn
        transparent = None
        disposal = 0
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame (the still-image contract used by decode_image)."""
    frames = decode_gif_frames(payload)
    if not frames:
        raise ValueError("GIF contained no image data")
    return frames[0]
