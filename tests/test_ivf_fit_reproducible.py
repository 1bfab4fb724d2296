"""Provenance gate for the IVF codebook: the `_CENTROIDS` literals in
plans/text_dedup.py must be exactly reproducible by the deterministic fit
tool they claim to come from — if either side drifts (tool edited, literals
hand-tweaked, generator data regenerated), this fails and forces an
explicit re-snapshot."""

import numpy as np

from supermusr_data_pipeline_spark.plans.text_dedup import _CENTROIDS, _N_CELLS
from tools.fit_ivf_centroids import K, fit


def test_centroid_literals_match_fit():
    assert _N_CELLS == K == len(_CENTROIDS)
    fitted = fit("/root/testdata/sf0.01/embeddings.parquet")
    np.testing.assert_array_equal(fitted, np.array(_CENTROIDS))
