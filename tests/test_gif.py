"""GIF codec gates: LZW encode/decode roundtrip (incl. the 12-bit
dictionary reset), pixel-exact image roundtrips (plain, interlaced,
local-palette animation with transparency and disposal), decode_image
dispatch, and honest raises for unsupported shapes."""

import numpy as np
import pytest

from supermusr_data_pipeline_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from supermusr_data_pipeline_spark.operators.multimodal import decode_image


def _img(h, w, ncolors=7, seed=3):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return palette[rng.integers(0, ncolors, (h, w))]


def test_lzw_roundtrip_small_and_dictionary_reset():
    rng = np.random.default_rng(1)
    # long low-entropy stream forces the dictionary past 4096 -> CLEAR path
    data = rng.integers(0, 4, 40_000, dtype=np.uint8)
    enc = _lzw_encode(data, 2)
    dec = np.frombuffer(_lzw_decode(enc, 2), np.uint8)
    assert np.array_equal(dec[: len(data)], data)


def test_single_frame_roundtrip_pixel_exact():
    img = _img(33, 41)
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_interlaced_roundtrip_pixel_exact():
    img = _img(29, 17, ncolors=12, seed=5)
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out, img)


def test_animation_frames_composite():
    f1 = _img(16, 16, ncolors=5, seed=7)
    f2 = _img(16, 16, ncolors=5, seed=8)
    frames = decode_gif_frames(encode_gif([f1, f2]))
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f2)


def test_decode_image_dispatches_gif():
    img = _img(8, 8)
    assert np.array_equal(decode_image(encode_gif(img)), img)


def test_too_many_colors_raises():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # ~4k colors
    with pytest.raises(NotImplementedError, match="palette"):
        encode_gif(img)


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" * 4)


def test_animated_gif_frame_sampling():
    from supermusr_data_pipeline_spark.operators.multimodal import (
        decode_video_frames,
    )

    frames = [_img(8, 8, ncolors=4, seed=s) for s in range(4)]
    payload = encode_gif(frames)
    sampled = decode_video_frames(payload, every_k=2)
    assert len(sampled) == 2
    assert np.array_equal(sampled[0], frames[0])
    assert np.array_equal(sampled[1], frames[2])


# ---------------------------------------------------------------------------
# disposal semantics + corrupt-header robustness (hand-built GIF streams)
# ---------------------------------------------------------------------------

import struct

from supermusr_data_pipeline_spark.operators.gif import (
    _lzw_encode,
    _sub_blocks,
    decode_gif_frames,
)

RED, GREEN, BLUE, BLACK = (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 0, 0)
PURPLE = (128, 0, 128)


def _gif_header(w, h, palette, bg_index):
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x81, bg_index, 0])  # GCT present, 4 entries
    for c in palette:
        out += bytes(c)
    return out


def _gce(disposal):
    return bytes([0x21, 0xF9, 4, (disposal & 7) << 2, 1, 0, 0, 0])


def _frame_block(left, top, fw, fh, indices, local_palette=None):
    out = bytearray(b"\x2c") + struct.pack("<HHHH", left, top, fw, fh)
    if local_palette is not None:
        out += bytes([0x81])  # local table, 4 entries
        for c in local_palette:
            out += bytes(c)
    else:
        out += b"\x00"
    idx = np.asarray(indices, dtype=np.uint8).reshape(-1)
    out += bytes([2]) + _sub_blocks(_lzw_encode(idx, 2))
    return out


def test_disposal_2_restores_to_GLOBAL_background_and_3_restores_previous():
    """Disposal 2's background color is defined against the GLOBAL table
    even when the frame carried a local one (spec: logical-screen bg
    field); disposal 3 restores the pre-draw rect."""
    gct = [RED, GREEN, BLUE, BLACK]
    lct = [RED, PURPLE, BLUE, BLACK]  # index 1 differs: purple, not green
    payload = _gif_header(4, 4, gct, bg_index=1)
    # frame 1: full 4x4 of local index 0 (red), disposal 2 afterwards
    payload += _gce(2) + _frame_block(0, 0, 4, 4, [0] * 16, local_palette=lct)
    # frame 2: 1x1 blue at (0,0), disposal 3 afterwards
    payload += _gce(3) + _frame_block(0, 0, 1, 1, [2])
    # frame 3: 1x1 blue at (1,1)
    payload += _gce(0) + _frame_block(1, 1, 1, 1, [2])
    payload += b"\x3b"

    f = decode_gif_frames(bytes(payload))
    assert len(f) == 3
    assert np.array_equal(f[0], np.tile(np.array(RED, np.uint8), (4, 4, 1)))
    # disposal 2 painted the GLOBAL green, not the local purple
    assert tuple(f[1][3, 3]) == GREEN
    assert tuple(f[1][0, 0]) == BLUE
    # disposal 3 restored (0,0) to its pre-draw green before frame 3
    assert tuple(f[2][0, 0]) == GREEN
    assert tuple(f[2][1, 1]) == BLUE
    assert tuple(f[2][3, 3]) == GREEN


def test_out_of_range_background_index_is_clamped():
    """A corrupt/foreign GIF declaring bg_index past the table must not
    raise; the initial canvas (and disposal-2 restores) fall back to 0."""
    gct = [RED, GREEN, BLUE, BLACK]
    payload = _gif_header(2, 2, gct, bg_index=250)
    payload += _gce(2) + _frame_block(0, 0, 1, 1, [2])  # tiny frame, disposal 2
    payload += _gce(0) + _frame_block(1, 1, 1, 1, [0])
    payload += b"\x3b"
    f = decode_gif_frames(bytes(payload))
    assert len(f) == 2
    assert tuple(f[0][0, 0]) == BLUE
    assert tuple(f[0][1, 1]) == BLACK  # un-drawn canvas: clamped bg -> zeros
    assert tuple(f[1][0, 0]) == BLACK  # disposal-2 with bad index -> zeros
