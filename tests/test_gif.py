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
