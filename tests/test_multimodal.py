"""Multimodal operators: REAL codec roundtrips (WAV via stdlib wave, BMP/PGM
via struct+numpy, VID0 frame container), resize/frame-sample plumbing, and
the Arrow-batched feature-extraction pipeline over the documents table."""

import numpy as np
import pytest

from supermusr_data_pipeline_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_pgm,
    decode_png,
    decode_video_frames,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_pgm,
    encode_video,
    encode_wav,
    extract_features,
    media_from_documents,
    resize_image,
)
from supermusr_data_pipeline_spark.sources.testdata import load_table


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(3)
    for h, w in ((8, 8), (5, 7), (1, 1), (16, 3)):  # odd widths hit row padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)


def test_pgm_roundtrip_and_gray_promotion():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    np.testing.assert_array_equal(decode_pgm(encode_pgm(g)), g)
    img = decode_image(encode_pgm(g))
    assert img.shape == (4, 6, 3)
    np.testing.assert_array_equal(img[:, :, 0], g)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(4)
    samples = rng.integers(-32768, 32767, size=500, dtype=np.int16)
    data, sr = decode_wav(encode_wav(samples, 22_050))
    assert sr == 22_050 and data.shape == (500, 1)
    np.testing.assert_array_equal(data[:, 0], samples)


def test_video_frame_sampling_skips_undecode():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(6)]
    payload = encode_video(frames)
    sampled = decode_video_frames(payload, every_k=3)
    assert len(sampled) == 2
    np.testing.assert_array_equal(sampled[0], frames[0])
    np.testing.assert_array_equal(sampled[1], frames[3])


def test_resize_nearest_neighbour():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)[:, :, None].repeat(3, axis=2)
    up = resize_image(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert up[0, 0, 0] == img[0, 0, 0] and up[7, 7, 0] == img[3, 3, 0]
    down = resize_image(img, 2, 2)
    np.testing.assert_array_equal(down[:, :, 0], [[0, 2], [8, 10]])


def test_truncated_magics_raise():
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff" + b"\x00" * 32)  # JPEG sig, bad segment
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)  # PNG sig, no IHDR
    with pytest.raises(ValueError):
        decode_image(b"garbage")


def test_jpeg_payload_via_decode_image():
    from supermusr_data_pipeline_spark.operators.jpeg import encode_jpeg

    px = np.full((16, 16, 3), 90, dtype=np.uint8)
    out = decode_image(encode_jpeg(px, quality=95))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - 90).max() <= 2


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    """Every scanline filter (None/Sub/Up/Average/Paeth) reconstructs the
    exact pixels — gradient data makes each filter's prediction non-trivial."""
    y, x = np.mgrid[0:13, 0:7]
    px = np.stack([(y * 20 + x) % 256, (x * 37) % 256, (y * 3 + x * 11) % 256], axis=2)
    px = px.astype(np.uint8)
    buf = encode_png(px, filter_type=filter_type)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(decode_png(buf), px)


def test_png_gray_and_via_decode_image():
    g = (np.arange(64, dtype=np.uint8) * 4).reshape(8, 8)
    buf = encode_png(g, filter_type=1)
    out = decode_image(buf)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[:, :, 0], g)
    np.testing.assert_array_equal(out[:, :, 1], g)


def test_png_palette_and_alpha_color_types():
    """Hand-built color-type 3 (palette) and 6 (RGBA) streams decode: the
    encoder only writes types 0/2, so these pin the decoder's other
    branches against the spec."""
    import struct
    import zlib

    from supermusr_data_pipeline_spark.operators.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    # palette: 2x2, indices [[0,1],[2,0]], 3-entry palette
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 0])  # filter0 rows
    buf = sig + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", plte)
    buf += _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    out = decode_png(buf)
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(out[1, 0], [0, 0, 255])
    # RGBA: 1x2, alpha dropped
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
    raw = bytes([0, 10, 20, 30, 99, 40, 50, 60, 7])
    buf = sig + _png_chunk(b"IHDR", ihdr)
    buf += _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    out = decode_png(buf)
    np.testing.assert_array_equal(out[0], [[10, 20, 30], [40, 50, 60]])


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_adam7_roundtrip_all_filters(filter_type):
    """Adam7 interlace: 7 independently-filtered passes reassemble to the
    exact pixels under every scanline filter; odd dimensions exercise the
    ragged pass extents."""
    y, x = np.mgrid[0:13, 0:7]
    px = np.stack([(y * 20 + x) % 256, (x * 37) % 256, (y * 3 + x * 11) % 256], axis=2)
    px = px.astype(np.uint8)
    buf = encode_png(px, filter_type=filter_type, interlace=1)
    np.testing.assert_array_equal(decode_png(buf), px)


def test_png_adam7_tiny_images():
    """Images smaller than the 8x8 pass grid leave some passes empty."""
    for h, w in [(1, 1), (1, 5), (2, 3), (3, 2), (5, 1), (8, 8), (9, 9)]:
        px = (np.arange(h * w * 3, dtype=np.uint32) * 17 % 256).astype(
            np.uint8
        ).reshape(h, w, 3)
        buf = encode_png(px, filter_type=1, interlace=1)
        np.testing.assert_array_equal(decode_png(buf), px)


def test_png_16bit_roundtrip():
    """Depth-16 samples: the high-byte downscale inverts the canonical
    v*257 8->16 expansion exactly."""
    y, x = np.mgrid[0:9, 0:5]
    px8 = np.stack([(y * 31 + x) % 256, (x * 53) % 256, (y * 7 + x * 13) % 256], axis=2)
    px8 = px8.astype(np.uint8)
    px16 = px8.astype(np.uint16) * 257
    buf = encode_png(px16, filter_type=4)
    assert buf[24] == 16  # IHDR bit depth byte
    np.testing.assert_array_equal(decode_png(buf), px8)


def test_png_16bit_adam7_gray():
    g8 = (np.arange(77, dtype=np.uint32) * 13 % 256).astype(np.uint8).reshape(7, 11)
    buf = encode_png(g8.astype(np.uint16) * 257, filter_type=2, interlace=1)
    out = decode_png(buf)
    assert out.shape == (7, 11, 3)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], g8)


def test_png_sub_byte_minimal_stream_decodes():
    """The 1x1 4-bit gray stream that used to raise now decodes (sub-byte
    support landed); a single zero nibble is black."""
    import struct
    import zlib

    from supermusr_data_pipeline_spark.operators.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)  # 4-bit gray
    buf = sig + _png_chunk(b"IHDR", ihdr)
    buf += _png_chunk(b"IDAT", zlib.compress(b"\x00\x00")) + _png_chunk(b"IEND", b"")
    np.testing.assert_array_equal(decode_png(buf), [[[0, 0, 0]]])



def test_feature_extraction_pipeline(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = media_from_documents(docs)
    feats = extract_features(media).cache()
    n_docs = docs.count()
    assert feats.count() == n_docs
    rows = {r.kind: r for r in feats.collect()}
    assert set(rows) == {"image", "audio", "video"}
    assert len(rows["image"].feature) == 12  # per-channel mean/std/min/max
    assert len(rows["audio"].feature) == 6  # len/sr/rms/zcr/min/max
    assert len(rows["video"].feature) == 13  # image stats of mean frame + n
    assert rows["audio"].feature[1] == 16_000.0
    assert rows["video"].feature[-1] == 2.0  # 4 frames sampled every 2nd
    assert 0 <= rows["image"].mean_intensity <= 255
    # digest ties features to payload bytes deterministically
    again = extract_features(media_from_documents(docs))
    assert (
        feats.select("media_id", "digest").subtract(again.select("media_id", "digest")).count()
        == 0
    )


def test_media_payloads_decode_with_real_codecs(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(9)
    for r in media_from_documents(docs).collect():
        payload = bytes(r.payload)
        if r.kind == "image":
            assert decode_image(payload).shape == (16, 16, 3)
        elif r.kind == "audio":
            data, sr = decode_wav(payload)
            assert sr == 16_000 and len(data) == 256
        else:
            assert len(decode_video_frames(payload)) == 4


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_subbyte_gray_roundtrip(depth, filter_type):
    """Depths 1/2/4 bit-pack scanlines; width 13 forces padding bits in
    every row, and each of the five filters runs over the PACKED bytes
    (bpp=1) exactly as RFC 2083 §6.2 specifies."""
    rng = np.random.default_rng(depth * 10 + filter_type)
    g = rng.integers(0, 1 << depth, size=(7, 13), dtype=np.uint8)
    buf = encode_png(g, filter_type=filter_type, depth=depth)
    out = decode_png(buf)
    expect = (g * (255 // ((1 << depth) - 1))).astype(np.uint8)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], expect)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_adam7(depth):
    """Adam7 sub-byte: every pass re-packs at its own width (a 9x9 image
    produces passes of width 1, 2, 4 — each with its own padding)."""
    rng = np.random.default_rng(depth)
    g = rng.integers(0, 1 << depth, size=(9, 9), dtype=np.uint8)
    buf = encode_png(g, filter_type=1, depth=depth, interlace=1)
    out = decode_png(buf)
    expect = (g * (255 // ((1 << depth) - 1))).astype(np.uint8)
    np.testing.assert_array_equal(out[:, :, 0], expect)


def test_png_4bit_palette():
    """Hand-built depth-4 color-type-3 stream: two indices per byte,
    high nibble first, odd width pads the low nibble."""
    import struct
    import zlib

    from supermusr_data_pipeline_spark.operators.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 3, 2, 4, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    # indices [[0,1,2],[2,1,0]] → rows 0x01 0x20 / 0x21 0x00, filter 0
    raw = bytes([0, 0x01, 0x20, 0, 0x21, 0x00])
    buf = sig + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", plte)
    buf += _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    out = decode_png(buf)
    np.testing.assert_array_equal(
        out,
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
            [[0, 0, 255], [0, 255, 0], [255, 0, 0]],
        ],
    )


def test_png_1bit_palette():
    """Depth-1 palette: eight indices per byte, big-endian bit order."""
    import struct
    import zlib

    from supermusr_data_pipeline_spark.operators.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 5, 1, 1, 3, 0, 0, 0)
    plte = bytes([9, 9, 9, 200, 100, 50])
    raw = bytes([0, 0b10110_000])  # indices 1,0,1,1,0 then padding
    buf = sig + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", plte)
    buf += _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    out = decode_png(buf)
    np.testing.assert_array_equal(out[0, :, 0], [200, 9, 200, 200, 9])


def test_png_16bit_palette_still_raises():
    """Depth 16 + palette is invalid per spec — keep the honest raise."""
    import struct

    from supermusr_data_pipeline_spark.operators.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    buf = sig + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", b"x") + _png_chunk(b"IEND", b"")
    with pytest.raises((NotImplementedError, ValueError)):
        decode_png(buf)


def test_corrupt_payload_is_salvaged_not_fatal(spark):
    """One corrupt payload in a batch must yield a flagged row while every
    other row decodes normally — a dead task at 100 TB is a dead job."""
    import hashlib

    from supermusr_data_pipeline_spark.operators.multimodal import (
        encode_bmp,
        extract_features,
    )

    good = encode_bmp(np.full((4, 4, 3), 7, np.uint8))
    rows = [
        (1, "image", bytearray(good)),
        (2, "image", bytearray(b"\x00\x01GARBAGE-not-an-image")),
        (3, "image", bytearray(good[:10])),  # truncated header
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in extract_features(df).collect()}
    assert len(out) == 3
    assert out[1].decode_ok and out[1].mean_intensity == 7.0
    assert not out[2].decode_ok and "unrecognized" in out[2].decode_error
    assert not out[3].decode_ok and out[3].feature is None
    # provenance survives salvage: digest still identifies the bad bytes
    assert out[2].digest == hashlib.sha256(bytes(rows[1][2])).hexdigest()
