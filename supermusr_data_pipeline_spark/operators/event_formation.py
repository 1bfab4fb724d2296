"""Event formation: dat2-shaped traces → dev2-shaped event lists.

Spark restatement of `trace-to-events` (SURVEY.md §3.1): the reference
consumes one Kafka trace message per (frame, digitiser), fans channels out
over a rayon pool, runs the detector FSM per channel, and concatenates
results.  Here each long-format trace row (one channel of one frame of one
digitiser) is independent, so the whole operator is a ``mapInPandas`` —
**zero shuffle**: detection happens in the same task that read the parquet
row group, and Arrow moves the voltage arrays to Python in columnar batches.

At 100 TB this scales linearly with input splits: no keys, no skew, no
state.  The only tuning knob is Arrow batch size (set in session.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .pulse_detection import (
    find_advanced_events,
    find_differential_threshold_events,
    find_fixed_threshold_events,
)

# dev2 long-format output: one row per detected event
EVENT_OUTPUT_FIELDS = [
    T.StructField("digitizer_id", T.IntegerType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("period_number", T.LongType()),
    T.StructField("protons_per_pulse", T.IntegerType()),
    T.StructField("running", T.BooleanType()),
    T.StructField("frame_number", T.LongType()),
    T.StructField("veto_flags", T.IntegerType()),
    T.StructField("channel", T.IntegerType()),
    T.StructField("event_time", T.LongType()),
    T.StructField("event_voltage", T.IntegerType()),
]
EVENT_OUTPUT_SCHEMA = T.StructType(EVENT_OUTPUT_FIELDS)

META_COLS = [
    "digitizer_id",
    "ts",
    "period_number",
    "protons_per_pulse",
    "running",
    "frame_number",
    "veto_flags",
    "channel",
]


def _detect(voltage: np.ndarray, sample_time: float, mode: str, params: dict[str, Any]):
    if mode == "fixed":
        return find_fixed_threshold_events(
            voltage,
            sample_time,
            threshold=params["threshold"],
            duration=params.get("duration", 1),
            cool_off=params.get("cool_off", 0),
            polarity=params.get("polarity", 1),
            baseline=params.get("baseline", 0.0),
        )
    if mode == "differential":
        return find_differential_threshold_events(
            voltage,
            sample_time,
            threshold=params["threshold"],
            duration=params.get("duration", 1),
            cool_off=params.get("cool_off", 0),
            constant_multiple=params.get("constant_multiple"),
            polarity=params.get("polarity", 1),
            baseline=params.get("baseline", 0.0),
        )
    if mode == "advanced":
        return find_advanced_events(
            voltage,
            sample_time,
            muon_onset=params["muon_onset"],
            muon_fall=params["muon_fall"],
            muon_termination=params["muon_termination"],
            duration=params.get("duration", 0.0),
            baseline_length=params.get("baseline_length", 0),
            smoothing_window_size=params.get("smoothing_window_size", 1),
            min_amplitude=params.get("min_amplitude"),
            max_amplitude=params.get("max_amplitude"),
            polarity=params.get("polarity", 1),
            baseline=params.get("baseline", 0.0),
        )
    raise ValueError(f"unknown detection mode: {mode}")


def form_events(traces: DataFrame, mode: str = "fixed", **params: Any) -> DataFrame:
    """Run a detection pipeline over a dat2-shaped trace table.

    ``traces`` columns: TRACE_SCHEMA (schemas.py) — long format with a
    ``voltage`` array per (frame, digitizer, channel) row and a per-row
    ``sample_rate``.  sample_time_in_ns = 1e9 / sample_rate
    (trace-to-events/src/processing.rs:24-31).

    Returns a dev2-shaped long event table (one row per detected pulse).
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_meta: dict[str, list] = {c: [] for c in META_COLS}
            out_time: list[np.ndarray] = []
            out_volt: list[np.ndarray] = []
            for row in pdf.itertuples(index=False):
                sample_time = 1e9 / row.sample_rate
                voltage = np.asarray(row.voltage, dtype=np.float64)
                et, eh = _detect(voltage, sample_time, mode, params)
                n = len(et)
                if n == 0:
                    continue
                for c in META_COLS:
                    out_meta[c].append(np.repeat(getattr(row, c), n))
                out_time.append(et)
                out_volt.append(eh)
            if not out_time:
                yield pd.DataFrame(
                    {
                        **{c: pd.Series(dtype=object) for c in META_COLS},
                        "event_time": pd.Series(dtype="int64"),
                        "event_voltage": pd.Series(dtype="int64"),
                    }
                )
                continue
            data = {c: np.concatenate(vs) for c, vs in out_meta.items()}
            data["event_time"] = np.concatenate(out_time)
            data["event_voltage"] = np.concatenate(out_volt)
            yield pd.DataFrame(data)

    cols = META_COLS + ["sample_rate", "voltage"]
    return traces.select(*cols).mapInPandas(process, schema=EVENT_OUTPUT_SCHEMA)


def events_found_counts(events: DataFrame) -> DataFrame:
    """A4: per (digitiser, channel) count of detected pulses
    (trace-to-events/src/processing.rs:58-68)."""
    return events.groupBy("digitizer_id", "channel").count()
