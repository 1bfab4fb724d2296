"""G2/G5/P2 extensions: distribution specs (incl. exponential + per-frame
affine params), weighted pulse template mix, and the standalone affine
transform operators."""

import numpy as np

from supermusr_data_pipeline_spark.generator.distributions import (
    sample,
    sample_int,
    weighted_kind,
)
from supermusr_data_pipeline_spark.generator.simulator import _synth_channel
from supermusr_data_pipeline_spark.operators.transforms import (
    apply_affine,
    apply_affine_array,
    normalize_polarity,
)


def test_distribution_kinds():
    rng = np.random.default_rng(1)
    assert list(sample(rng, {"kind": "constant", "value": 5}, 3)) == [5.0, 5.0, 5.0]
    u = sample(rng, {"kind": "uniform", "min": 2, "max": 4}, 1000)
    assert 2 <= u.min() and u.max() <= 4 and abs(u.mean() - 3) < 0.1
    n = sample(rng, {"kind": "normal", "mean": 10, "sd": 2}, 4000)
    assert abs(n.mean() - 10) < 0.15 and abs(n.std() - 2) < 0.15
    e = sample(rng, {"kind": "exponential", "lifetime": 8}, 8000)
    assert abs(e.mean() - 8) < 0.4 and e.min() >= 0
    i = sample_int(rng, {"kind": "uniform", "min": 0, "max": 3}, 1000)
    assert set(i.tolist()) == {0, 1, 2, 3}


def test_per_frame_affine_params():
    rng = np.random.default_rng(2)
    spec = {"kind": "constant", "value": {"base": 10, "per_frame": 0.5}}
    assert sample(rng, spec, 1, frame=0)[0] == 10.0
    assert sample(rng, spec, 1, frame=8)[0] == 14.0
    spec_u = {"kind": "uniform", "min": {"base": 0, "per_frame": 1}, "max": {"base": 100, "per_frame": 1}}
    v = sample(rng, spec_u, 500, frame=50)
    assert 50 <= v.min() and v.max() <= 150


def test_weighted_template_mix():
    rng = np.random.default_rng(3)
    kinds = weighted_kind(rng, [0.0, 0.0, 1.0, 0.0], 50)
    assert set(kinds.tolist()) == {2}
    kinds = weighted_kind(np.random.default_rng(4), [8, 1, 1, 0], 4000)
    frac0 = np.mean(kinds == 0)
    assert 0.75 < frac0 < 0.85 and 3 not in set(kinds.tolist())


def test_synth_channel_defaults_unchanged():
    """Omitting the new specs must preserve the original RNG stream."""
    key = np.array([42, 0, 0, 0], dtype=np.uint64)
    v0, s0, h0 = _synth_channel(key, 200, 3, 50.0, 4.0)
    v1, s1, h1 = _synth_channel(key, 200, 3, 50.0, 4.0, height_spec=None, pulse_weights=None)
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(h0, h1)


def test_synth_channel_with_specs():
    key = np.array([42, 5, 0, 0], dtype=np.uint64)
    v, s, h = _synth_channel(
        key, 300, 4, 50.0, 0.0,
        height_spec={"kind": "constant", "value": {"base": 500, "per_frame": 10}},
        pulse_weights=[1, 0, 0, 0],  # all flat pulses
        frame=5,
    )
    assert np.allclose(h, 550.0)  # 500 + 10*frame
    # flat pulses of height 550 on baseline 50, no noise: plateau = 600
    assert v.max() <= 50 + 4 * 550 and v.max() >= 599


def test_affine_operators_jvm_side(spark):
    df = spark.createDataFrame([(1, 10.0, [1, 2, 3])], "id int, v double, arr array<int>")
    out = apply_affine(df, "v", 2.0, 5.0, out="v2").collect()[0]
    assert out.v2 == 25.0
    out = apply_affine_array(df, "arr", 3.0, 1.0, out="a2").collect()[0]
    assert out.a2 == [4.0, 7.0, 10.0]
    out = normalize_polarity(df, "arr", -1, 2.0, out="n").collect()[0]
    assert out.n == [1.0, 0.0, -1.0]
    # stays in codegen: no python stages in the plan
    plan = apply_affine_array(df, "arr", 3.0, 1.0)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
