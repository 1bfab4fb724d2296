"""Deterministic seeded trace/run synthesis (SURVEY.md §2.9 G1-G5).

The reference's simulator builds dat2 traces as per-time-bin sums of active
analytic pulses plus smoothed noise, then an affine transform
(simulator/src/integrated/simulation_elements/event_list.rs:36-70).  Pulse
shape families: Flat / Triangular / Gaussian / Biexponential
(simulation_elements/pulses.rs:5-61); noise: uniform/gaussian with EWMA
smoothing (noise.rs:8-88).

Spark-first scale design: the generator is itself a distributed dataflow —
``spark.range`` over (frame × digitiser × channel) rows, then ``mapInPandas``
synthesizes voltage arrays with a numpy RNG seeded per row, so any subset of
the table regenerates identically on any cluster size with zero driver-side
data movement.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EPOCH_START = datetime(2024, 1, 1, tzinfo=timezone.utc)
FRAME_PERIOD_MS = 20  # 50 Hz (simulator/src/main.rs:132-135)
CHANNELS_PER_DIGITIZER = 8  # common/src/lib.rs:21


def _pulse_flat(t: np.ndarray, start: float, stop: float, amplitude: float) -> np.ndarray:
    return np.where((t >= start) & (t < stop), amplitude, 0.0)


def _pulse_triangular(
    t: np.ndarray, start: float, peak_time: float, stop: float, amplitude: float
) -> np.ndarray:
    up = np.clip((t - start) / max(peak_time - start, 1e-9), 0, None)
    down = np.clip((stop - t) / max(stop - peak_time, 1e-9), 0, None)
    return amplitude * np.clip(np.minimum(up, down), 0, 1)


def _pulse_gaussian(t: np.ndarray, mean: float, sd: float, peak: float) -> np.ndarray:
    return peak * np.exp(-0.5 * ((t - mean) / sd) ** 2)


def _pulse_biexp(
    t: np.ndarray, start: float, amplitude: float, rise: float, decay: float
) -> np.ndarray:
    dt = t - start
    coef = amplitude / (
        (decay / rise) ** (-rise / (decay - rise)) - (decay / rise) ** (-decay / (decay - rise))
    )
    out = coef * (np.exp(-dt / decay) - np.exp(-dt / rise))
    return np.where(dt >= 0, out, 0.0)


def _synth_channel(
    rng: np.ndarray,
    n_samples: int,
    n_pulses: int,
    baseline: float,
    noise_sd: float,
    height_spec: dict | None = None,
    pulse_weights: list[float] | None = None,
    frame: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (voltage u16 array, pulse start times, pulse peak heights).

    ``height_spec`` is a G2 distribution spec (generator/distributions.py);
    ``pulse_weights`` enables the G5 weighted template mix.  Defaults keep
    the original uniform sampling (and its RNG stream) bit-for-bit."""
    from .distributions import sample, weighted_kind

    rs = np.random.default_rng(rng)
    t = np.arange(n_samples, dtype=np.float64)
    v = np.full(n_samples, baseline, dtype=np.float64)
    # pulse onset window [10, n_samples-50); degenerate for very short
    # traces — keep the bound valid so tiny fixtures still synthesize
    hi = max(n_samples - 50, 11)
    starts = np.sort(rs.uniform(min(10, hi - 1), hi, size=n_pulses))
    if height_spec is None:
        heights = rs.uniform(200, 1200, size=n_pulses)
    else:
        heights = sample(rs, height_spec, n_pulses, frame=frame)
    if pulse_weights is None:
        kinds = rs.integers(0, 4, size=n_pulses)
    else:
        kinds = weighted_kind(rs, pulse_weights, n_pulses)
    for s, h, k in zip(starts, heights, kinds):
        if k == 0:
            v += _pulse_flat(t, s, s + 12, h)
        elif k == 1:
            v += _pulse_triangular(t, s, s + 6, s + 16, h)
        elif k == 2:
            v += _pulse_gaussian(t, s + 8, 3.0, h)
        else:
            v += _pulse_biexp(t, s, h, 2.0, 8.0)
    # EWMA-smoothed gaussian noise (noise.rs:8-88): one-pole filter
    noise = rs.normal(0.0, noise_sd, size=n_samples)
    v += _ewma(noise, alpha=0.3)
    return np.clip(np.round(v), 0, 65535).astype(np.int64), starts, heights


def _ewma(x: np.ndarray, alpha: float, block: int = 256) -> np.ndarray:
    """One-pole EWMA ``y[i] = a*x[i] + (1-a)*y[i-1]``, vectorized.

    Block-wise closed form: within a block starting from accumulator ``acc``,
    ``y[i] = a*d^i*cumsum(x[j]/d^j) + d^(i+1)*acc`` with ``d = 1-a``.  Blocks
    of 256 keep ``d^i`` in a safe float64 range (0.7^256 ≈ 1e-40), so the
    rescaled cumsum never over/underflows; ~6x faster than the scalar loop,
    which dominated daq_full_chain synthesis."""
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    acc = 0.0
    d = 1.0 - alpha
    for s in range(0, n, block):
        xb = x[s : s + block]
        m = len(xb)
        p = d ** np.arange(m + 1)
        c = np.cumsum(xb / p[:m])
        yb = alpha * p[:m] * c + p[1 : m + 1] * acc
        out[s : s + m] = yb
        acc = yb[-1]
    return out


def generate_traces(
    spark: SparkSession,
    n_frames: int = 20,
    n_digitizers: int = 4,
    channels_per_digitizer: int = CHANNELS_PER_DIGITIZER,
    n_samples: int = 1000,
    sample_rate: int = 1_000_000_000,
    pulses_per_channel: int = 6,
    baseline: float = 50.0,
    noise_sd: float = 4.0,
    seed: int = 42,
    height_spec: dict | None = None,
    pulse_weights: list[float] | None = None,
) -> DataFrame:
    """dat2-shaped long trace table (TRACE_SCHEMA), fully deterministic.

    ``height_spec``/``pulse_weights`` expose the G2 distribution specs (incl.
    exponential and per-frame affine parameters) and the G5 weighted pulse
    template mix; omitted, sampling matches the original defaults exactly."""
    n_rows = n_frames * n_digitizers * channels_per_digitizer

    out_schema = T.StructType(
        [
            T.StructField("digitizer_id", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("period_number", T.LongType()),
            T.StructField("protons_per_pulse", T.IntegerType()),
            T.StructField("running", T.BooleanType()),
            T.StructField("frame_number", T.LongType()),
            T.StructField("veto_flags", T.IntegerType()),
            T.StructField("sample_rate", T.LongType()),
            T.StructField("channel", T.IntegerType()),
            T.StructField("voltage", T.ArrayType(T.LongType())),
        ]
    )

    npc = channels_per_digitizer
    nd = n_digitizers
    epoch_us = int(EPOCH_START.timestamp() * 1_000_000)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                frame = int(rid) // (nd * npc)
                did = (int(rid) // npc) % nd
                ch = int(rid) % npc
                v, _, _ = _synth_channel(
                    np.array([seed, frame, did, ch], dtype=np.uint64),
                    n_samples,
                    pulses_per_channel,
                    baseline,
                    noise_sd,
                    height_spec=height_spec,
                    pulse_weights=pulse_weights,
                    frame=frame,
                )
                rows.append(
                    {
                        "digitizer_id": did,
                        "ts": pd.Timestamp(
                            (epoch_us + frame * FRAME_PERIOD_MS * 1000) * 1000
                        ),
                        "period_number": frame // 100,
                        "protons_per_pulse": 1 + (frame % 4),
                        "running": True,
                        "frame_number": frame,
                        # vary per digitiser so OR-aggregation is exercised (P7)
                        "veto_flags": (1 << (did % 8)) if (frame % 5 == 0) else 0,
                        "sample_rate": sample_rate,
                        "channel": ch + did * npc,
                        "voltage": v,
                    }
                )
            yield pd.DataFrame(rows)

    # partition count: derived from the actual per-task work, not the core
    # count.  Measured synthesis+detection cost is ~0.7 µs per sample-row
    # (r14: the whole 128x500 flagship shape is 45 ms of Python), so size
    # tasks at ~128 Ki samples (~0.1 s) each — a task whose compute is far
    # below the Python-worker checkout cost only adds overhead (a 32-way
    # fan-out of this shape measured 340 s of executor wait for 0.8 s of
    # CPU when the worker pool went cold).  Large runs still fan out, and
    # the 4*parallelism cap bounds the task storm on any cluster size.
    dp = spark.sparkContext.defaultParallelism
    work_parts = 1 + (n_rows * n_samples) // 131_072
    n_parts = max(1, min(n_rows, work_parts, 4 * dp))
    return spark.range(0, n_rows, numPartitions=n_parts).mapInPandas(synth, out_schema)


def generate_runs(
    spark: SparkSession,
    n_frames: int = 20,
    frames_per_run: int = 8,
    gap_frames: int = 2,
    open_last: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Run interval table (RUN_SCHEMA): consecutive runs covering the frame
    timeline with inter-run gaps; optionally an open (still-running) last run
    (run_parameters.rs:164-175)."""
    epoch_us = int(EPOCH_START.timestamp() * 1_000_000)
    rows = []
    frame = 0
    i = 0
    while frame < n_frames:
        start_us = epoch_us + frame * FRAME_PERIOD_MS * 1000 - 1000
        end_frame = frame + frames_per_run
        end_us = epoch_us + end_frame * FRAME_PERIOD_MS * 1000 - 1000
        is_last = end_frame + gap_frames >= n_frames
        rows.append(
            {
                "run_name": f"run_{i:04d}",
                "filename": f"run_{i:04d}.nxs",
                "instrument_name": "SUPERMUSR",
                "collect_from": datetime.fromtimestamp(start_us / 1e6, tz=timezone.utc),
                "collect_until": None
                if (is_last and open_last)
                else datetime.fromtimestamp(end_us / 1e6, tz=timezone.utc),
                "n_periods": 1 + i % 4,
            }
        )
        frame = end_frame + gap_frames
        i += 1
    from ..schemas import RUN_SCHEMA

    # Arrow path + one partition: a Python-list createDataFrame becomes
    # pickled slices each executed by a Python-worker task (a 1-task slice
    # measured 15.8 s of executor wait for 3 rows when the worker pool went
    # cold); a pandas input rides the Arrow converter, so executing the
    # scan never touches a Python worker (guide §4/§6).
    pdf = pd.DataFrame(rows, columns=[f.name for f in RUN_SCHEMA.fields])
    return spark.createDataFrame(pdf, RUN_SCHEMA).coalesce(1)


def frames_in_run_count(n_frames: int, frames_per_run: int, gap_frames: int) -> int:
    """Helper for tests: number of frames covered by generated runs."""
    covered = 0
    frame = 0
    while frame < n_frames:
        covered += min(frames_per_run, n_frames - frame)
        frame += frames_per_run + gap_frames
    return covered


