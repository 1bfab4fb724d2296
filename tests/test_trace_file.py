"""Round-trip tests for the .traces binary source (S4/S5) — writer and
reader reimplement trace-reader/src/loader.rs layout (LE header, fixed-size
events, big-endian u16 samples); the reader must recover exactly what the
writer put down, and compose with the detector pipeline."""

import numpy as np
import pytest

from supermusr_data_pipeline_spark.sources.trace_file import (
    parse_trace_file,
    read_trace_files,
    select_trace_events,
    to_dat2,
    write_trace_file,
)


@pytest.fixture(scope="module")
def traces_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 1000, size=(5, 3, 40), dtype=np.uint16)
    # plant a clear pulse in event 2, channel 1
    raw[2, 1, 10:14] = [2000, 9000, 8000, 3000]
    path = tmp_path_factory.mktemp("traces") / "run1.traces"
    write_trace_file(str(path), raw, sample_time=1e-9, trigger_times=np.arange(5.0))
    return str(path), raw


def test_parse_roundtrip_bytes(traces_file):
    path, raw = traces_file
    with open(path, "rb") as f:
        content = f.read()
    rows = list(parse_trace_file(path, content))
    assert len(rows) == 5 * 3
    assert all(r["n_events"] == 5 and r["n_channels"] == 3 and r["n_samples"] == 40 for r in rows)
    for r in rows:
        np.testing.assert_array_equal(
            r["voltage"], raw[r["event_index"], r["channel"]].astype(np.int32)
        )
    assert rows[0]["prog_version"] == "spark-traces-1"
    assert rows[0]["sample_time"] == 1e-9


def test_read_trace_files_distributed(spark, traces_file):
    path, raw = traces_file
    df = read_trace_files(spark, path)
    got = {
        (r.event_index, r.channel): list(r.voltage)
        for r in df.collect()
    }
    assert len(got) == 15
    np.testing.assert_array_equal(got[(2, 1)], raw[2, 1].astype(np.int32))
    # trigger_time round-trips
    trig = {r.event_index: r.trigger_time for r in df.collect()}
    assert trig == {i: float(i) for i in range(5)}


def test_select_sequential(spark, traces_file):
    path, _ = traces_file
    df = read_trace_files(spark, path)
    sel = select_trace_events(df, 2, random_sample=False)
    assert sorted({r.event_index for r in sel.collect()}) == [0, 1]


def test_select_random_with_replacement(spark, traces_file):
    path, _ = traces_file
    df = read_trace_files(spark, path)
    sel = select_trace_events(df, 4, random_sample=True, seed=3)
    rows = sel.collect()
    # 4 draws × 3 channels each
    assert len(rows) == 12
    assert all(0 <= r.event_index < 4 for r in rows)


def test_to_dat2_shape(spark, traces_file):
    path, raw = traces_file
    dat2 = to_dat2(read_trace_files(spark, path), frame_number=9, digitizer_id=4)
    rows = dat2.collect()
    assert len(rows) == 5
    r = rows[0]
    assert r.digitizer_id == 4 and r.frame_number == 9
    assert r.sample_rate == 10**9
    assert [c.channel for c in r.channels] == [0, 1, 2]
    assert len(r.channels[0].voltage) == 40


def test_to_trace_table_and_form_events(spark, traces_file):
    """to_trace_table bridges the file source onto TRACE_SCHEMA; form_events
    finds exactly the planted pulse."""
    from supermusr_data_pipeline_spark.operators.event_formation import form_events
    from supermusr_data_pipeline_spark.sources.trace_file import to_trace_table

    path, _ = traces_file
    table = to_trace_table(read_trace_files(spark, path), digitizer_id=3)
    assert {"digitizer_id", "ts", "frame_number", "sample_rate", "channel", "voltage"} <= set(
        table.columns
    )
    events = form_events(table, mode="fixed", threshold=1500.0, duration=2, cool_off=0).collect()
    assert [(e.frame_number, e.channel) for e in events] == [(2, 1)]
    assert all(e.digitizer_id == 3 for e in events)


def test_trace_file_ingest_query(spark):
    """The registered driver-contract query runs and finds the planted
    lattice pulses: 12 selected events x 8 channels."""
    from supermusr_data_pipeline_spark.plans.daq_chain import trace_file_events

    df = trace_file_events(spark, "")
    rows = df.collect()
    assert len(rows) == 12 * 8
    assert {(r.frame_number, r.channel) for r in rows} == {
        (ev, ch) for ev in range(12) for ch in range(8)
    }


def test_detector_composes(spark, traces_file):
    """The planted pulse in event 2 channel 1 is found by the threshold
    detector run over the long-format voltage arrays."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    import pandas as pd

    from supermusr_data_pipeline_spark.operators.pulse_detection import threshold_detector

    path, _ = traces_file
    df = read_trace_files(spark, path)

    out_t = T.ArrayType(T.LongType())

    @F.pandas_udf(out_t)
    def detect(voltages: pd.Series) -> pd.Series:
        out = []
        for v in voltages:
            a = np.asarray(v, dtype=np.float64)
            et, _ = threshold_detector(np.arange(len(a), dtype=float), a, 1500.0, 1, 0)
            out.append([int(x) for x in et])
        return pd.Series(out)

    hits = (
        df.select("event_index", "channel", detect("voltage").alias("times"))
        .filter(F.size("times") > 0)
        .collect()
    )
    assert [(h.event_index, h.channel) for h in hits] == [(2, 1)]
