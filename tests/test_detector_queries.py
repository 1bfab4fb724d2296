"""Structural checks for the detector-mode queries (q30/q31) — the oracle
parity suite covers the hash compare for q30/q32/q33; here we assert the
rows-only q31 output is internally consistent (pulse ordering invariants
from advanced_muon_detector.rs:246-309)."""

from supermusr_data_pipeline_spark.plans import detectors  # noqa: F401
from supermusr_data_pipeline_spark.plans.relational import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_advanced_muon_pulse_invariants(spark):
    df = QUERIES["q31_advanced_muon"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        # detector emits onset -> peak -> end in time order
        assert r.start_time <= r.peak_time <= r.end_time
        # rise superlative is a rise, fall superlative a fall
        assert r.steepest_rise_deriv >= 0
        assert r.sharpest_fall_deriv <= 0


def test_differential_detect_nonempty(spark):
    df = QUERIES["q30_differential_detect"](spark, SF_DIR)
    assert df.count() > 0
