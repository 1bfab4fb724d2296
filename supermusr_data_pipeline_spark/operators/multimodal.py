"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct — the same pattern as the reference's opaque
FlatBuffers payloads routed by identifier (nexus-writer/src/main.rs:284-323).
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so payload
bytes move JVM→Python once per batch, never per row.

Codecs are REAL for container formats decodable without external libraries:

- **WAV** (RIFF PCM) via the stdlib ``wave`` module — true audio decode;
- **BMP** (24-bit uncompressed) and **PGM** (binary P5) via struct+numpy —
  true image decode;
- **PNG** (8-bit gray/RGB/palette/alpha, non-interlaced) via stdlib
  ``zlib`` + numpy defiltering — a from-spec (RFC 2083) decoder covering
  all five scanline filters;
- **baseline JPEG** via :mod:`.jpeg` — a from-spec (ITU-T T.81) sequential
  DCT decoder (generic Huffman/quant tables, 4:2:0, restart markers) and
  matching encoder;
- **video**: a simple documented container (``VID0`` + length-prefixed BMP
  frames) with real frame-sampling plumbing.

Progressive JPEG (T.81 Annex G) and lossless JPEG (Annex H, all seven
predictors) are decoded from spec by :mod:`.jpeg` as well.  Codecs that
genuinely need external libraries absent from this environment (MP3/H.264,
and JPEG's arithmetic/hierarchical modes) raise ``NotImplementedError``
with a clear message — the Spark-side plumbing (schema, batching, UDF
signature) is identical once a real codec is dropped in.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from . import gif, jpeg

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# image codecs: BMP (24-bit uncompressed) and PGM (P5), both real
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (3 * w + 3) & ~3
    data_size = row_size * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        54 + data_size,
        0,
        0,
        54,  # pixel data offset
        40,  # BITMAPINFOHEADER
        w,
        h,
        1,
        24,
        0,  # BI_RGB, uncompressed
        data_size,
        2835,
        2835,
        0,
        0,
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # BMP stores bottom-up BGR
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → HxWx3 uint8 (RGB)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got {bpp}bpp)")
    flip = h > 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_off)
    img = rows.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


def encode_pgm(pixels: np.ndarray) -> bytes:
    """HxW uint8 grayscale → binary PGM (P5)."""
    h, w = pixels.shape
    return f"P5\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_pgm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    return np.frombuffer(parts[3], dtype=np.uint8, count=w * h).reshape(h, w)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8.  All four container formats
    decode natively: BMP/PGM (struct+numpy), PNG (zlib+numpy defilter), and
    baseline JPEG (from-spec Huffman+IDCT, :mod:`.jpeg`)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P5":
        g = decode_pgm(payload)
        return np.repeat(g[:, :, None], 3, axis=2)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    raise ValueError("unrecognized image payload")


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy index mapping)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


# ---------------------------------------------------------------------------
# PNG codec: stdlib zlib + numpy defiltering, written from RFC 2083
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass (RFC 2083 §2.6)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_scanlines(rows: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """(n, stride) uint8 byte rows → filter-type-prefixed scanline stream.
    Filters operate on BYTES at offset ``bpp`` (RFC 2083 §6.2) — the same
    arithmetic for 8- and 16-bit samples."""
    n, stride = rows.shape
    flat = rows.astype(np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    raw = bytearray()
    for y in range(n):
        row = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - (left + prev) // 2
        elif filter_type == 4:
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad PNG filter {filter_type}")
        raw.append(filter_type)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = row
    return bytes(raw)


def encode_png(
    pixels: np.ndarray,
    filter_type: int = 0,
    interlace: int = 0,
    depth: int | None = None,
) -> bytes:
    """HxW (gray) or HxWx3 (RGB) → PNG bytes.  uint8 input writes depth 8,
    uint16 writes depth 16 (big-endian samples); ``depth`` of 1/2/4 packs a
    gray image at sub-byte depth (values must fit, scanlines bit-packed
    big-endian and padded to a byte boundary per RFC 2083 §2.3).
    ``filter_type`` selects the scanline filter applied to EVERY row
    (0..4); ``interlace=1`` writes Adam7 (each pass filtered
    independently) — exposed so tests can drive each decoder path with
    real spec-conformant streams."""
    px = np.asarray(pixels)
    if depth is None:
        depth = 16 if px.dtype == np.uint16 else 8
    px = np.ascontiguousarray(px, dtype=np.uint16 if depth == 16 else np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if depth < 8 and (ch != 1 or int(px.max(initial=0)) >= (1 << depth)):
        raise ValueError(f"depth {depth} requires gray samples < {1 << depth}")
    color_type = 0 if ch == 1 else 2
    bpp = max(1, ch * depth // 8)  # filters act on bytes; ≥1 byte per spec

    def byte_rows(sub: np.ndarray) -> np.ndarray:
        if depth == 16:
            b = np.frombuffer(sub.astype(">u2").tobytes(), dtype=np.uint8)
            return b.reshape(sub.shape[0], -1)
        if depth < 8:
            n, sw = sub.shape[0], sub.shape[1]
            shifts = np.arange(depth - 1, -1, -1)
            bits = ((sub[:, :, 0, None] >> shifts) & 1).reshape(n, sw * depth)
            return np.packbits(bits, axis=1)  # zero-pads to the byte boundary
        return sub.reshape(sub.shape[0], -1)

    raw = bytearray()
    if interlace == 0:
        raw += _filter_scanlines(byte_rows(px), bpp, filter_type)
    else:
        for xs, ys, xst, yst in _ADAM7:
            sub = px[ys::yst, xs::xst]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass contributes no scanlines
            raw += _filter_scanlines(byte_rows(sub), bpp, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _defilter(data: np.ndarray, n_rows: int, stride: int, bpp: int) -> np.ndarray:
    """Filter-prefixed scanlines → (n_rows, stride) reconstructed bytes.
    One image or one Adam7 pass; all five filters."""
    if len(data) != n_rows * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    raw = data.reshape(n_rows, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)
    out = np.zeros((n_rows, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(n_rows):
        row, ft = rows[y], filters[y]
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: recon = raw + left ⇒ prefix sum per byte lane
            rec = (
                np.cumsum(row.reshape(-1, bpp).astype(np.int64), axis=0) & 0xFF
            ).reshape(stride).astype(np.int16)
        elif ft == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ft in (3, 4):  # Average / Paeth: sequential in the pixel dim
            rec = np.zeros(stride, dtype=np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                pred = (
                    (left + up) // 2 if ft == 3 else _paeth(left, up, upleft)
                )
                left = (row[x : x + bpp] + pred) & 0xFF
                rec[x : x + bpp] = left
                upleft = up
        else:
            raise ValueError(f"bad PNG scanline filter {ft}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def _unpack_subbyte(rows: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(n, stride) bit-packed rows → (n, width) uint8 samples.  Samples are
    ``depth`` bits each, big-endian within bytes, rows padded to a byte
    boundary (RFC 2083 §2.3) — the padding bits fall off the ``width``
    truncation."""
    bits = np.unpackbits(rows, axis=1)
    n = rows.shape[0]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = bits.reshape(n, -1, depth) @ weights
    return vals[:, :width].astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 (RGB).  From-spec decoder: depths 1/2/4
    (gray + palette, bit-packed scanlines), 8 and 16; color types 0/2/3/4/6;
    all five scanline filters; non-interlaced AND Adam7.  Alpha is dropped;
    palette is applied; gray expands (sub-byte gray scales by the exact
    255/(2^d−1) bit-replication factor).  16-bit samples downscale by high
    byte (exact inverse of the canonical v*257 8→16 expansion)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = []
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type}")
    valid = (1, 2, 4, 8) if color_type in (0, 3) else (8, 16)
    if color_type == 0:
        valid = (1, 2, 4, 8, 16)
    if depth not in valid:
        raise NotImplementedError(f"PNG depth {depth} color type {color_type}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    ch = _PNG_CHANNELS[color_type]
    bpp = max(1, ch * depth // 8)  # filter unit: whole bytes, min 1

    def to_samples(rows: np.ndarray, width: int) -> np.ndarray:
        """Defiltered byte rows → (n, width, ch) uint8 samples (16-bit by
        high byte — exact inverse of the canonical v*257 expansion)."""
        if depth < 8:
            return _unpack_subbyte(rows, width, depth)[:, :, None]
        return rows.reshape(rows.shape[0], width, ch, depth // 8)[:, :, :, 0]

    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace == 0:
        stride = (w * ch * depth + 7) // 8
        px = to_samples(_defilter(data, h, stride, bpp), w)
    else:
        px = np.zeros((h, w, ch), dtype=np.uint8)
        pos = 0
        for xs, ys, xst, yst in _ADAM7:
            pw = len(range(xs, w, xst))
            ph = len(range(ys, h, yst))
            if pw == 0 or ph == 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            n = ph * (stride + 1)
            px[ys::yst, xs::xst] = to_samples(
                _defilter(data[pos : pos + n], ph, stride, bpp), pw
            )
            pos += n
        if pos != len(data):
            raise ValueError("PNG Adam7 pass data size mismatch")
    if color_type == 2:
        return px
    if color_type == 6:
        return px[:, :, :3]
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if depth < 8:  # gray bit replication: 255/(2^d−1) is exact for d=1/2/4
        px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return np.repeat(px, 3, axis=2)  # color type 0


# ---------------------------------------------------------------------------
# audio codec: RIFF/WAV PCM via the stdlib wave module — real decode
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → WAV bytes."""
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return bio.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples [n, channels], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n = wf.getnframes()
        sr = wf.getframerate()
        ch = wf.getnchannels()
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        data = np.frombuffer(wf.readframes(n), dtype="<i2").reshape(n, ch)
    return data, sr


# ---------------------------------------------------------------------------
# video: documented container "VID0" + u32 frame count + length-prefixed BMPs
# ---------------------------------------------------------------------------


def encode_video(frames: list[np.ndarray]) -> bytes:
    out = [b"VID0", struct.pack("<I", len(frames))]
    for f in frames:
        b = encode_bmp(f)
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def decode_video_frames(payload: bytes, every_k: int = 1) -> list[np.ndarray]:
    """Frame-sample a frame container: decode every k-th frame.  VID0
    skips unsampled frames WITHOUT decoding them (the point of length
    prefixes); animated GIF must decode sequentially for compositing, so
    sampling there saves output volume, not decode work — the honest
    difference between a seekable container and an LZW stream."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif_frames

        return decode_gif_frames(payload)[::every_k]
    if payload[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    pos = 8
    frames = []
    for i in range(n):
        (sz,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if i % every_k == 0:
            frames.append(decode_bmp(payload[pos : pos + sz]))
        pos += sz
    return frames


# ---------------------------------------------------------------------------
# feature extraction over media tables (mapInPandas; narrow, Arrow-batched)
# ---------------------------------------------------------------------------


def _image_feature(img: np.ndarray) -> list[float]:
    flat = img.astype(np.float64)
    return [
        float(x)
        for c in range(3)
        for x in (
            flat[:, :, c].mean(),
            flat[:, :, c].std(),
            flat[:, :, c].min(),
            flat[:, :, c].max(),
        )
    ]


def _audio_feature(samples: np.ndarray, sr: int) -> list[float]:
    x = samples[:, 0].astype(np.float64)
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
    return [float(len(x)), float(sr), rms, zc, float(x.min(initial=0)), float(x.max(initial=0))]


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Narrow operator: runs in the scan stage, one Arrow batch at a time; at
    100 TB the payload bytes stream through Python workers without any
    shuffle or driver involvement.  Per-kind decode: image → per-channel
    stats over a nearest-neighbour 8x8 resize; audio → length/rate/RMS/
    zero-crossings; video → frame-sampled (every 2nd) mean image stats."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                base = {
                    "media_id": row.media_id,
                    "kind": row.kind,
                    "n_bytes": len(payload),
                    "digest": hashlib.sha256(payload).hexdigest(),
                }
                # salvage mode: a corrupt payload yields a FLAGGED row, not
                # a dead task — at 100 TB one bad scrape must never kill a
                # partition's worth of work (4 task retries would each hit
                # the same deterministic byte string and fail the job)
                try:
                    if row.kind == "image":
                        img = resize_image(decode_image(payload), 8, 8)
                        flat = img.astype(np.float64)
                        feat = _image_feature(img)
                    elif row.kind == "audio":
                        samples, sr = decode_wav(payload)
                        flat = samples.astype(np.float64)
                        feat = _audio_feature(samples, sr)
                    else:  # video
                        frames = decode_video_frames(payload, every_k=2)
                        flat = np.stack(frames).astype(np.float64)
                        feat = _image_feature(flat.mean(axis=0).astype(np.float64)) + [
                            float(len(frames))
                        ]
                except Exception as ex:  # noqa: BLE001 — any decode defect
                    out.append(
                        {
                            **base,
                            "mean_intensity": None,
                            "std_intensity": None,
                            "feature": None,
                            "decode_ok": False,
                            "decode_error": f"{type(ex).__name__}: {ex}"[:200],
                        }
                    )
                    continue
                out.append(
                    {
                        **base,
                        "mean_intensity": float(flat.mean()),
                        "std_intensity": float(flat.std()),
                        "feature": feat,
                        "decode_ok": True,
                        "decode_error": None,
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in FEATURE_SCHEMA}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(proc, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic media synthesis from the documents table (real payloads)
# ---------------------------------------------------------------------------

_MEDIA_GEN_SCHEMA = MEDIA_SCHEMA


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic synthetic media table from the documents
    table: REAL WAV/BMP/VID0 payloads seeded by each doc's text digest, so
    the decode path exercises true codecs in every environment."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                doc_id = int(row.doc_id)
                digest = hashlib.sha256(str(row.text).encode()).digest()
                rng = np.random.default_rng(np.frombuffer(digest[:8], dtype=np.uint64))
                kind = ("image", "audio", "video")[doc_id % 3]
                if kind == "image":
                    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
                    # cycle containers (and PNG filter / JPEG subsampling
                    # variants) so the contract query exercises every real
                    # decode path, including lossy JPEG
                    variant = (doc_id // 3) % 4
                    if variant == 0:
                        payload = encode_bmp(px)
                        meta = (16, 16, None, 1, "bmp24")
                    elif variant == 1:
                        payload = encode_png(px, filter_type=(doc_id // 9) % 5)
                        meta = (16, 16, None, 1, "png8")
                    elif variant == 2:
                        # sub-cycle the three implemented JPEG modes so the
                        # contract query decodes every one of them
                        mode = (doc_id // 12) % 3
                        if mode == 0:
                            payload = jpeg.encode_jpeg(
                                px, quality=95, subsample=(doc_id // 9) % 2 == 1
                            )
                            meta = (16, 16, None, 1, "jpeg-baseline")
                        elif mode == 1:
                            payload = jpeg.encode_progressive_jpeg(px, quality=95)
                            meta = (16, 16, None, 1, "jpeg-progressive")
                        else:
                            payload = jpeg.encode_lossless_jpeg(
                                px.astype(np.int64), 8,
                                predictor=1 + (doc_id // 12) % 7,
                            )
                            meta = (16, 16, None, 1, "jpeg-lossless")
                    else:
                        # GIF needs a <=256-color palette: index a small
                        # deterministic palette instead of raw noise
                        pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
                        px = pal[rng.integers(0, 32, size=(16, 16))]
                        payload = gif.encode_gif(px, interlace=(doc_id // 12) % 2 == 1)
                        meta = (16, 16, None, 1, "gif89a")
                elif kind == "audio":
                    samples = rng.integers(-3000, 3000, size=256, dtype=np.int16)
                    payload = encode_wav(samples, 16_000)
                    meta = (None, None, 16_000, None, "pcm16")
                else:
                    frames = [
                        rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                        for _ in range(4)
                    ]
                    payload = encode_video(frames)
                    meta = (8, 8, None, 4, "vid0-bmp24")
                out.append(
                    {
                        "media_id": doc_id,
                        "kind": kind,
                        "payload": payload,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return docs.select("doc_id", "text").mapInPandas(gen, _MEDIA_GEN_SCHEMA)
