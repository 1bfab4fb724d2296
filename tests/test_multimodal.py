"""Multimodal operators: REAL codec roundtrips (WAV via stdlib wave, BMP/PGM
via struct+numpy, VID0 frame container), resize/frame-sample plumbing, and
the Arrow-batched feature-extraction pipeline over the documents table."""

import numpy as np
import pytest

from supermusr_data_pipeline_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_pgm,
    decode_video_frames,
    decode_wav,
    encode_bmp,
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


def test_compressed_magics_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_image(b"garbage")


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
            assert decode_bmp(payload).shape == (16, 16, 3)
        elif r.kind == "audio":
            data, sr = decode_wav(payload)
            assert sr == 16_000 and len(data) == 256
        else:
            assert len(decode_video_frames(payload)) == 4
