"""G2: random-distribution specs for the trace generator.

The reference simulator draws pulse/noise parameters from
Constant/Uniform/Normal/Exponential distributions whose parameters may
themselves vary per frame as affine functions
(simulator/src/integrated/simulation_elements/utils.rs:112-265).  A spec is
a plain dict (JSON-friendly — the schedule DSL consumes these):

    {"kind": "constant", "value": 5}
    {"kind": "uniform", "min": 0, "max": 10}
    {"kind": "normal", "mean": 50, "sd": 4}
    {"kind": "exponential", "lifetime": 8}
    {"kind": "uniform", "min": {"base": 10, "per_frame": 0.5}, "max": 20}

Scalar parameters may be either a number or ``{"base": b, "per_frame": m}``,
resolved as ``b + m * frame`` — the per-frame affine form.  Draws use the
caller's seeded ``numpy`` Generator, keeping synthesis deterministic and
distributed (each Spark task seeds its own RNG from the row key).
"""

from __future__ import annotations

import numpy as np


def _param(p, frame: int) -> float:
    if isinstance(p, dict):
        return float(p.get("base", 0.0)) + float(p.get("per_frame", 0.0)) * frame
    return float(p)


def sample(rng: np.random.Generator, spec: dict, size: int, frame: int = 0) -> np.ndarray:
    """Draw ``size`` values from a distribution spec (see module doc)."""
    kind = spec["kind"]
    if kind == "constant":
        return np.full(size, _param(spec["value"], frame))
    if kind == "uniform":
        lo, hi = _param(spec["min"], frame), _param(spec["max"], frame)
        return rng.uniform(lo, hi, size=size)
    if kind == "normal":
        return rng.normal(_param(spec["mean"], frame), _param(spec["sd"], frame), size=size)
    if kind == "exponential":
        # parameterized by mean lifetime, as the reference's Exponential
        return rng.exponential(_param(spec["lifetime"], frame), size=size)
    raise ValueError(f"unknown distribution kind: {kind!r}")


def sample_int(rng: np.random.Generator, spec: dict, size: int, frame: int = 0) -> np.ndarray:
    """Integer variant (Constant/Uniform over ints)."""
    kind = spec["kind"]
    if kind == "constant":
        return np.full(size, int(_param(spec["value"], frame)), dtype=np.int64)
    if kind == "uniform":
        lo = int(_param(spec["min"], frame))
        hi = int(_param(spec["max"], frame))
        return rng.integers(lo, hi + 1, size=size)
    raise ValueError(f"unknown integer distribution kind: {kind!r}")


def weighted_kind(rng: np.random.Generator, weights: list[float], size: int) -> np.ndarray:
    """G5: weighted template pick (integrated/simulation.rs:56-79)."""
    w = np.asarray(weights, dtype=np.float64)
    return rng.choice(len(w), size=size, p=w / w.sum())
