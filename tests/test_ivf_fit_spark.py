"""The distributed codebook fit must reproduce the snapshot literals
byte-for-byte: `plans/ivf_fit.py` is the 100 TB producer of the same
artifact `tools/fit_ivf_centroids.py` snapshots at sf0.01, so the Spark
job and the driver tool have to agree exactly (same seed rows, same
iteration arithmetic, same ties, same rounding).  If this test fails, the
scale path and the oracle-checked literals have silently diverged."""

import numpy as np

from supermusr_data_pipeline_spark.plans.ivf_fit import fit_ivf_centroids_spark
from supermusr_data_pipeline_spark.plans.text_dedup import _CENTROIDS

from conftest import SF_DIR_T2


def test_spark_fit_reproduces_snapshot(spark):
    got = fit_ivf_centroids_spark(spark, SF_DIR_T2)
    want = np.array(_CENTROIDS, dtype=np.float64)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_spark_fit_reproduces_sf0_1_snapshot(spark):
    """The per-corpus sf0.1 codebook (K=24) is likewise a Spark-fit
    artifact — same provenance pin as the sf0.01 snapshot."""
    from supermusr_data_pipeline_spark.plans.text_dedup import _CENTROIDS_SF0_1

    got = fit_ivf_centroids_spark(spark, "/root/testdata/sf0.1", k=24)
    want = np.array(_CENTROIDS_SF0_1, dtype=np.float64)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_spark_fit_releases_checkpoint(spark):
    """The normalized matrix is materialized once per fit and released on
    exit — a fit must not leak persisted RDDs (the min_label_components
    hygiene rule applies here too)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    fit_ivf_centroids_spark(spark, SF_DIR_T2, iters=2)
    assert jsc.getPersistentRDDs().size() <= before


def test_stride_sample_fit_is_deterministic(spark):
    """The max_sample path (the knob that makes the fit tractable at
    100 TB) is reproducible run-over-run and returns unit-norm centroids."""
    a = fit_ivf_centroids_spark(spark, SF_DIR_T2, iters=5, max_sample=200)
    b = fit_ivf_centroids_spark(spark, SF_DIR_T2, iters=5, max_sample=200)
    np.testing.assert_array_equal(a, b)
    norms = np.linalg.norm(a, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
