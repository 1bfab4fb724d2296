"""Baseline JPEG codec: roundtrip fidelity across quality/subsampling/
restart-interval variants, spec-conformance details (byte stuffing, fill
bytes, grayscale scans), and honest failures for unsupported modes.  The
decoder reads DHT/DQT generically from the stream, so it decodes any
baseline JPEG — these tests drive it with real spec-conformant streams
from the matching encoder plus hand-built edge cases."""

import struct

import numpy as np
import pytest

from supermusr_data_pipeline_spark.operators.jpeg import (
    _DCT_C,
    _ZZ_COLS,
    _ZZ_ROWS,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(h=24, w=17):
    y, x = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                128 + 60 * np.sin(x / 6) + 40 * np.cos(y / 5),
                128 + 50 * np.cos(x / 7),
                128 + 30 * np.sin((x + y) / 8),
            ],
            axis=2,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def test_dct_matrix_orthonormal():
    np.testing.assert_allclose(_DCT_C @ _DCT_C.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation_with_known_prefix():
    flat = _ZZ_ROWS * 8 + _ZZ_COLS
    assert sorted(flat) == list(range(64))
    # the spec's first eight entries (row, col)
    assert list(zip(_ZZ_ROWS[:8], _ZZ_COLS[:8])) == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    ]


def test_roundtrip_smooth_image_high_quality():
    px = _smooth()
    out = decode_jpeg(encode_jpeg(px, quality=95))
    err = np.abs(out.astype(int) - px.astype(int))
    assert out.shape == px.shape and err.max() <= 4


def test_roundtrip_noise_near_lossless_at_q100():
    """With quality=100 most quant steps are 1: the only loss is DCT
    rounding + clipping, so even white noise survives within ±3."""
    px = np.random.default_rng(1).integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_roundtrip_420_subsampling():
    px = _smooth()
    out = decode_jpeg(encode_jpeg(px, quality=95, subsample=True))
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() < 4  # chroma halved, luma tight


def test_roundtrip_with_restart_markers():
    """DRI/RSTn: same pixels with and without restart intervals — the
    decoder must byte-align and reset DC predictors at each marker."""
    px = _smooth()
    plain = decode_jpeg(encode_jpeg(px, quality=90))
    for ri in (1, 2, 3):
        rst = decode_jpeg(encode_jpeg(px, quality=90, restart_interval=ri))
        np.testing.assert_array_equal(rst, plain)


def test_roundtrip_non_multiple_of_8_and_tiny():
    for h, w in ((1, 1), (7, 9), (8, 8), (17, 16)):
        px = np.full((h, w, 3), 77, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=95))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - 77).max() <= 2


def test_byte_stuffing_survives():
    """A flat white image produces long runs of 1-bits in the entropy
    stream (0xFF bytes), which must be stuffed and unstuffed exactly."""
    px = np.full((16, 16, 3), 255, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=50))
    assert np.abs(out.astype(int) - 255).max() <= 2


def test_fill_bytes_before_marker_are_skipped():
    buf = encode_jpeg(_smooth(8, 8), quality=90)
    # inject legal FF fill bytes before the DQT segment (after SOI+APP0)
    app0_end = 2 + 2 + struct.unpack_from(">H", buf, 4)[0]
    padded = buf[:app0_end] + b"\xff\xff" + buf[app0_end:]
    np.testing.assert_array_equal(decode_jpeg(padded), decode_jpeg(buf))


def test_unsupported_modes_and_garbage_raise():
    buf = bytearray(encode_jpeg(_smooth(8, 8)))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC5  # pretend SOF5 differential sequential (unsupported;
    # SOF3 lossless is implemented now — see the lossless tests below)
    with pytest.raises(NotImplementedError, match="SOF0/1/2"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\x00\x00\x00")  # zero-length segment


def test_grayscale_single_component_scan():
    """Hand-build a 1-component scan by re-encoding only the Y plane:
    encode an RGB gray image, then decode — gray in, gray out, and the
    three output channels agree closely (chroma is constant 128)."""
    g = np.repeat(np.repeat((np.arange(8, dtype=np.uint8) * 30)[None, :], 8, 0)[:, :, None], 3, 2)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4
    assert np.abs(out[:, :, 0].astype(int) - out[:, :, 1].astype(int)).max() <= 2


def _noise(h=24, w=17, seed=3):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_progressive_decodes_pixel_identical_to_baseline():
    """Progressive is a lossless reorganization of the same quantized
    coefficients: decode(progressive) must equal decode(baseline) exactly,
    across subsampling (incl. padded-vs-true block grids), quality, and
    smooth/noise content (noise stresses ZRL + refinement runs)."""
    from supermusr_data_pipeline_spark.operators.jpeg import encode_progressive_jpeg

    for img in (_smooth(24, 17), _noise(24, 17), _noise(20, 20, seed=5)):
        for sub in (False, True):
            for q in (50, 90, 100):
                b = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
                p = decode_jpeg(
                    encode_progressive_jpeg(img, quality=q, subsample=sub)
                )
                assert np.array_equal(b, p), (img.shape, sub, q)


def test_progressive_stream_is_sof2_multiscan():
    from supermusr_data_pipeline_spark.operators.jpeg import encode_progressive_jpeg

    buf = encode_progressive_jpeg(_smooth(16, 16))
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    # DC first + DC refine + 6 AC first + 6 AC refine = 14 SOS markers
    assert buf.count(b"\xff\xda") == 14


def test_progressive_uniform_image_exercises_eob_only_bands():
    """A flat image quantizes every AC coefficient to zero: every AC scan
    is pure EOB runs, every refinement scan pure EOB runs with no
    correction bits — the degenerate paths must still roundtrip."""
    from supermusr_data_pipeline_spark.operators.jpeg import encode_progressive_jpeg

    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    b = decode_jpeg(encode_jpeg(img, quality=90))
    p = decode_jpeg(encode_progressive_jpeg(img, quality=90))
    assert np.array_equal(b, p)


# --------------------------------------------------------------------------
# lossless JPEG (SOF3, Annex H)
# --------------------------------------------------------------------------


def _rng(seed=5):
    return np.random.default_rng(seed)


def test_lossless_roundtrip_all_predictors_gray():
    from supermusr_data_pipeline_spark.operators.jpeg import (
        decode_lossless_jpeg,
        encode_lossless_jpeg,
    )

    img = _rng().integers(0, 256, size=(23, 17), dtype=np.int64)
    for pred in range(1, 8):
        out = decode_lossless_jpeg(encode_lossless_jpeg(img, 8, predictor=pred))
        assert out.shape == (23, 17, 1)
        assert (out[:, :, 0] == img).all(), f"predictor {pred} not lossless"


def test_lossless_roundtrip_rgb_and_12bit_and_restarts():
    from supermusr_data_pipeline_spark.operators.jpeg import (
        decode_lossless_jpeg,
        encode_lossless_jpeg,
    )

    rgb = _rng(7).integers(0, 256, size=(9, 11, 3), dtype=np.int64)
    assert (decode_lossless_jpeg(encode_lossless_jpeg(rgb, 8, 4)) == rgb).all()
    x12 = _rng(9).integers(0, 4096, size=(15, 7), dtype=np.int64)
    assert (
        decode_lossless_jpeg(encode_lossless_jpeg(x12, 12, 7))[:, :, 0] == x12
    ).all()
    img = _rng(11).integers(0, 256, size=(10, 6), dtype=np.int64)
    b = encode_lossless_jpeg(img, 8, 2, restart_interval=3)
    assert b"\xff\xdd" in b and b"\xff\xd0" in b
    assert (decode_lossless_jpeg(b)[:, :, 0] == img).all()


def test_lossless_restart_interval_counted_in_mcus():
    """T.81 Annex H conformance (ADVICE r7): DRI's Ri counts MCUs, and a
    lossless-scan MCU is ONE sample position — so Ri not divisible by the
    row width places RSTn markers MID-ROW.  The marker count must be
    floor((H*W*1 - 1)/Ri) ... exactly every Ri MCUs, and the roundtrip
    exact, for every predictor."""
    import re

    from supermusr_data_pipeline_spark.operators.jpeg import (
        decode_lossless_jpeg,
        encode_lossless_jpeg,
    )

    h, w = 7, 5  # 35 MCUs; Ri=4 -> restarts at MCU 4,8,...,32 (8 markers)
    img = _rng(21).integers(0, 256, size=(h, w), dtype=np.int64)
    for pred in range(1, 8):
        b = encode_lossless_jpeg(img, 8, pred, restart_interval=4)
        # count RST0-7 markers in the entropy stream (0xFFD0-0xFFD7)
        n_rst = len(re.findall(b"\xff[\xd0-\xd7]", b))
        assert n_rst == (h * w - 1) // 4, (
            f"predictor {pred}: {n_rst} RST markers for 35 MCUs at Ri=4"
        )
        out = decode_lossless_jpeg(b)
        assert (out[:, :, 0] == img).all(), f"predictor {pred} not lossless"

    # interleaved RGB: an MCU is one sample from EACH component, so the
    # marker cadence is per sample position, not per component sample
    rgb = _rng(23).integers(0, 256, size=(4, 6, 3), dtype=np.int64)
    b = encode_lossless_jpeg(rgb, 8, 4, restart_interval=5)
    n_rst = len(re.findall(b"\xff[\xd0-\xd7]", b))
    assert n_rst == (4 * 6 - 1) // 5
    assert (decode_lossless_jpeg(b) == rgb).all()


def test_lossless_extreme_diffs_hit_category_16():
    """Alternating 0/255 columns with predictor 1 produce +-255 diffs;
    a 16-bit corpus with a full-range step exercises the SSSS=16 /
    diff=32768 special case (no extra bits, modulo-2^16 reconstruction)."""
    from supermusr_data_pipeline_spark.operators.jpeg import (
        decode_lossless_jpeg,
        encode_lossless_jpeg,
    )

    img = np.zeros((4, 8), dtype=np.int64)
    img[:, 1::2] = 255
    assert (decode_lossless_jpeg(encode_lossless_jpeg(img, 8, 1))[:, :, 0] == img).all()
    wide = np.zeros((2, 4), dtype=np.int64)
    wide[:, 1::2] = 65535  # diff -65535 ≡ +1... and +32768 steps via default
    wide[1, 0] = 32768     # first-column Rb prediction sees a 32768 step
    assert (
        decode_lossless_jpeg(encode_lossless_jpeg(wide, 16, 1))[:, :, 0] == wide
    ).all()


def test_decode_jpeg_handles_sof3_8bit():
    """decode_jpeg maps 8-bit lossless onto its uint8 RGB contract: gray
    replicates, RGB passes through untransformed and EXACT (lossless)."""
    from supermusr_data_pipeline_spark.operators.jpeg import encode_lossless_jpeg

    gray = _rng(13).integers(0, 256, size=(8, 5), dtype=np.int64)
    out = decode_jpeg(encode_lossless_jpeg(gray, 8, 1))
    assert out.shape == (8, 5, 3)
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()

    rgb = _rng(17).integers(0, 256, size=(6, 7, 3), dtype=np.int64)
    out = decode_jpeg(encode_lossless_jpeg(rgb, 8, 4))
    assert (out == rgb).all()

    with pytest.raises(NotImplementedError):
        decode_jpeg(encode_lossless_jpeg(gray, 12, 1))
