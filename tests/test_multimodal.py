import numpy as np
import pytest

from supermusr_data_pipeline_spark.operators.multimodal import (
    decode_image,
    extract_features,
    media_from_documents,
)
from supermusr_data_pipeline_spark.sources.testdata import load_table


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")


def test_decode_fake_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    c = decode_image(b"other", fake=True)
    assert a.shape == (8, 8, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_feature_extraction_pipeline(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = media_from_documents(docs)
    feats = extract_features(media).cache()
    n_docs = docs.count()
    assert feats.count() == n_docs
    row = feats.first()
    assert len(row.feature) == 12
    assert 0 <= row.mean_intensity <= 255
    # digest ties features to payload bytes deterministically
    again = extract_features(media_from_documents(docs))
    assert (
        feats.select("media_id", "digest").subtract(again.select("media_id", "digest")).count()
        == 0
    )
