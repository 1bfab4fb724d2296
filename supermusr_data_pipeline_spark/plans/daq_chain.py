"""The flagship end-to-end dataflow: the full DAQ pipeline as one Spark plan.

Mirrors the reference topology (docs/data_pipeline.md:9-71):

    traces (dat2) → event formation (trace-to-events) → frame assembly
    (digitiser-aggregator) → run matching + nexus event table (nexus-writer)

Everything is lazy: Catalyst sees the whole chain and can pipeline the
narrow stages; the only wide dependencies are the frame-assembly groupBy and
the per-run windows in the nexus stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..generator import generate_runs, generate_traces
from ..operators.event_formation import form_events
from ..operators.frame_assembly import assemble_frames_long
from ..operators.nexus_sink import build_nexus_events
from ..operators.run_matching import match_events_to_runs


def daq_chain(
    traces: DataFrame,
    runs: DataFrame,
    expected_digitizers: list[int],
    mode: str = "fixed",
    **detector_params,
) -> DataFrame:
    """traces + runs → nexus event table."""
    events = form_events(traces, mode=mode, **detector_params)
    frames = assemble_frames_long(events, expected_digitizers)
    matched = match_events_to_runs(frames, runs)
    return build_nexus_events(matched)


def synthetic_daq_chain(
    spark: SparkSession,
    n_frames: int = 20,
    n_digitizers: int = 4,
    n_samples: int = 1000,
    threshold: float = 300.0,
    seed: int = 42,
) -> DataFrame:
    """Flagship query on synthetic data (driver smoke check)."""
    traces = generate_traces(
        spark, n_frames=n_frames, n_digitizers=n_digitizers, n_samples=n_samples, seed=seed
    )
    runs = generate_runs(spark, n_frames=n_frames, seed=seed)
    return daq_chain(
        traces,
        runs,
        expected_digitizers=list(range(n_digitizers)),
        mode="fixed",
        threshold=threshold,
        duration=2,
        cool_off=0,
    )
