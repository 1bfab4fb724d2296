"""Tests for the FlatBuffers wire codec (S3) and envelope dispatch layer.

Mirrors the reference's identifier-check + parse + route front door
(trace-to-events/src/main.rs:199-257, nexus-writer/src/message_handlers.rs:
38-120): roundtrip fidelity per schema, wire-format alignment invariants,
dispatch routing, and the malformed-payload error side (P8).
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from supermusr_data_pipeline_spark.sources import decode as D
from supermusr_data_pipeline_spark.sources import flatbuf as fb
from supermusr_data_pipeline_spark.sources import messages as M

MD = {
    "ts_ns": 1_712_345_678_123_456_789,
    "period_number": 3,
    "protons_per_pulse": 4,
    "running": True,
    "frame_number": 77,
    "veto_flags": 0b101,
}


# ---------------------------------------------------------------------------
# wire-format invariants: scalars sit on size-aligned absolute addresses,
# vectors carry a 4-aligned length prefix and size-aligned elements
# ---------------------------------------------------------------------------


def test_alignment_invariants():
    buf = M.encode_dev2(9, MD, np.arange(5, dtype=np.uint32), [1, 2, 3, 4, 5], [0] * 5)
    t = fb.root_pos(buf)
    assert fb.identifier(buf) == "dev2"
    # metadata table: u64 period_number 8-aligned, u32 frame_number 4-aligned
    mpos = fb.read_offset(buf, t, 1)
    assert fb.field_pos(buf, mpos, 1) % 8 == 0
    assert fb.field_pos(buf, mpos, 4) % 4 == 0
    assert fb.field_pos(buf, mpos, 5) % 2 == 0
    # vectors: length prefix 4-aligned, u32 elements 4-aligned
    for idx, elem in ((2, 4), (3, 2), (4, 4)):
        vp = fb.read_offset(buf, t, idx)
        assert vp % 4 == 0
        assert (vp + 4) % elem == 0
    # i64 scalar in f144 is 8-aligned
    b2 = M.encode_f144("s", 2**60 + 7, 1.0, "double")
    t2 = fb.root_pos(b2)
    assert fb.field_pos(b2, t2, 1) % 8 == 0
    m2 = fb.read_offset(b2, t2, 3)
    assert fb.field_pos(b2, m2, 0) % 8 == 0


def test_absent_fields_fall_back_to_defaults():
    buf = M.encode_run_start(1_700_000_000_000, "r1")  # minimal message
    d = M.decode_run_start(buf)
    assert d["n_periods"] == 1  # schema default, field written explicitly
    assert d["filename"] is None and d["detector_spectrum_map"] is None
    buf = M.encode_al00("s", 1)  # severity default OK
    assert M.decode_al00(buf)["severity"] == "OK"


# ---------------------------------------------------------------------------
# property-based roundtrips (hypothesis)
# ---------------------------------------------------------------------------

_SCALAR_RANGES = {
    "byte": (-(2**7), 2**7 - 1),
    "ubyte": (0, 2**8 - 1),
    "short": (-(2**15), 2**15 - 1),
    "ushort": (0, 2**16 - 1),
    "int": (-(2**31), 2**31 - 1),
    "uint": (0, 2**32 - 1),
    "long": (-(2**63), 2**63 - 1),
    "ulong": (0, 2**64 - 1),
}


@settings(max_examples=25, deadline=None)
@given(
    vt=st.sampled_from(sorted(_SCALAR_RANGES)),
    data=st.data(),
    ts=st.integers(min_value=0, max_value=2**62),
    name=st.text(min_size=0, max_size=40),
)
def test_f144_scalar_roundtrip(vt, data, ts, name):
    lo, hi = _SCALAR_RANGES[vt]
    v = data.draw(st.integers(min_value=lo, max_value=hi))
    d = M.decode_f144(M.encode_f144(name, ts, v, vt))
    assert (d["source_name"], d["timestamp_ns"], d["value_type"], d["value"]) == (
        name,
        ts,
        vt,
        v,
    )


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(st.floats(allow_nan=False, allow_infinity=False, width=64), max_size=64),
    ts=st.integers(min_value=0, max_value=2**62),
)
def test_f144_array_roundtrip(vals, ts):
    d = M.decode_f144(M.encode_f144("pv", ts, vals, "array_double"))
    assert d["value_type"] == "array_double"
    np.testing.assert_array_equal(d["value"], np.array(vals, dtype=np.float64))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31),
    explicit_ts=st.booleans(),
    kind=st.sampled_from(["i8", "u16", "i32", "i64", "f32", "f64"]),
)
def test_se00_roundtrip(n, seed, explicit_ts, kind):
    rng = np.random.default_rng(seed)
    if kind.startswith("f"):
        vals = rng.normal(size=n).astype(kind == "f32" and np.float32 or np.float64)
    else:
        info = np.iinfo(getattr(np, {"i8": "int8", "u16": "uint16", "i32": "int32", "i64": "int64"}[kind]))
        vals = rng.integers(info.min, info.max, size=n, endpoint=True).astype(info.dtype)
    ts = rng.integers(0, 2**62, size=n).tolist() if explicit_ts else None
    d = M.decode_se00(
        M.encode_se00("dev", 12345, vals, kind, channel=7, time_delta_ns=2.5, timestamps=ts)
    )
    np.testing.assert_array_equal(d["values"], vals)
    assert d["values_kind"] == kind and d["channel"] == 7 and d["time_delta_ns"] == 2.5
    if explicit_ts:
        np.testing.assert_array_equal(d["timestamps"], ts)
    else:
        assert d["timestamps"] is None


@settings(max_examples=20, deadline=None)
@given(
    epoch_us=st.integers(
        min_value=int(pd.Timestamp("2000-01-02").value // 1000),
        max_value=int(pd.Timestamp("2200-12-30").value // 1000),
    ),
    extra_ns=st.integers(min_value=0, max_value=999),
)
def test_gps_time_roundtrip(epoch_us, extra_ns):
    ns = epoch_us * 1000 + extra_ns
    assert M.unpack_gps_time(M.pack_gps_time(ns), 0) == ns


def test_gps_time_calendar_edges():
    for iso in ("2024-02-29T12:00:00.000000001", "2023-12-31T23:59:59.999999999",
                "2000-01-01T00:00:00", "2024-01-01T00:00:00.5"):
        ns = int(pd.Timestamp(iso).value)
        assert M.unpack_gps_time(M.pack_gps_time(ns), 0) == ns
    # leap-day day-of-year packs as 31 + 29 = 60
    packed = M.pack_gps_time(int(pd.Timestamp("2024-02-29").value))
    assert packed[2] | (packed[3] << 8) == 60


@settings(max_examples=15, deadline=None)
@given(
    n_events=st.integers(min_value=0, max_value=300),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_dev2_vector_roundtrip(n_events, seed):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 2**32, size=n_events, dtype=np.uint32)
    v = rng.integers(0, 2**16, size=n_events, dtype=np.uint16)
    c = rng.integers(0, 8, size=n_events, dtype=np.uint32)
    d = M.decode_dev2(M.encode_dev2(3, MD, t, v, c))
    np.testing.assert_array_equal(d["time"], t)
    np.testing.assert_array_equal(d["voltage"], v)
    np.testing.assert_array_equal(d["channel"], c)
    assert d["metadata"] == MD


# ---------------------------------------------------------------------------
# Spark dispatch layer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def envelope_df(spark):
    rows = [
        ("traces", M.encode_dat2(1, MD, 10**9, [(0, [1, 2, 3]), (1, [4, 5, 6])])),
        ("digitiser-events", M.encode_dev2(1, MD, [10, 20], [100, 200], [0, 1])),
        ("frame-events", M.encode_aev2(MD, [10], [100], [0], True, [1, 2])),
        ("controls", M.encode_run_start(1_700_000_000_000, "r7", filename="r7.nxs")),
        ("controls", M.encode_run_stop(1_700_000_009_000, "r7")),
        ("runlog", M.encode_f144("pv:a", 42, 2.5, "double")),
        ("selog", M.encode_se00("se:b", 50, [1.0, 2.0], "f64")),
        ("alarms", M.encode_al00("dev", 60, "MINOR", "m")),
        ("det-spec", M.encode_df12([1, 2], [10, 20])),
        ("garbage", b"\x00\x01"),  # too short
        ("garbage", b"\x00\x00\x00\x00XXXX\x00\x00\x00\x00"),  # unknown identifier
    ]
    return spark.createDataFrame(rows, "topic string, value binary")


def test_decode_stream_dispatch(envelope_df):
    streams = D.decode_stream(envelope_df)
    assert streams["dat2"].count() == 2  # one row per channel
    dev2 = streams["dev2"].orderBy("event_time").collect()
    assert [r.event_voltage for r in dev2] == [100, 200]
    assert dev2[0].frame_number == MD["frame_number"]
    aev2 = streams["aev2"].collect()
    assert len(aev2) == 1 and aev2[0].digitizers_present == [1, 2]
    rc = {r.kind: r for r in streams["run_control"].collect()}
    assert rc["start"].run_name == "r7" and rc["start"].filename == "r7.nxs"
    assert rc["stop"].time_ms == 1_700_000_009_000
    assert streams["f144"].collect()[0].value == 2.5
    assert streams["se00"].collect()[0]["values"] == [1.0, 2.0]
    assert streams["al00"].collect()[0].severity == "MINOR"
    df12 = {r.spectrum: r.detector_id for r in streams["df12"].collect()}
    assert df12 == {1: 10, 2: 20}


def test_decode_errors_side_channel(envelope_df):
    errs = D.decode_errors(envelope_df).collect()
    assert len(errs) == 2
    assert {r.topic for r in errs} == {"garbage"}
    # error rows never leak into typed streams
    total_typed = sum(df.count() for df in D.decode_stream(envelope_df).values())
    assert total_typed == 2 + 2 + 1 + 2 + 1 + 1 + 1 + 2  # + df12 map rows


def test_dump_messages_s8(envelope_df):
    """S8: every envelope row (including malformed) gets a readable line."""
    from supermusr_data_pipeline_spark.operators.diagnostics import dump_messages

    rows = dump_messages(envelope_df).collect()
    assert len(rows) == envelope_df.count()
    by_ident = {}
    for r in rows:
        by_ident.setdefault(r.identifier, []).append(r.summary)
    assert any("digitizer 1" in s and "rate 1000000000" in s for s in by_ident["dat2"])
    assert any("2 events" in s for s in by_ident["dev2"])
    assert any("RunStart 'r7'" in s for s in by_ident["pl72"])
    assert any("alarm dev MINOR: m" in s for s in by_ident["al00"])
    assert any(s.startswith("<decode error") for r in rows for s in [r.summary])


def test_failure_counters_p8(spark, envelope_df):
    from supermusr_data_pipeline_spark.operators.diagnostics import (
        failure_counters,
        parse_failure_counters,
    )

    counts = {(r.topic, r.outcome): r.n for r in failure_counters(envelope_df).collect()}
    assert counts[("garbage", "too_short")] == 1
    assert counts[("garbage", "unknown_identifier")] == 1
    assert sum(n for (t, o), n in counts.items() if o == "ok") == 9
    # no Python stage in the shallow counter plan
    plan = failure_counters(envelope_df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan

    # deep variant: corrupt body with a valid identifier counts as parse_error
    bad = spark.createDataFrame(
        [("t", b"\x00\x00\x00\x00dat2\xff\xff\xff\xff")], "topic string, value binary"
    )
    deep = {
        (r.topic, r.outcome): r.n
        for r in parse_failure_counters(envelope_df.union(bad)).collect()
    }
    assert deep[("t", "parse_error")] == 1


def test_dat2_decode_matches_trace_schema_shape(envelope_df):
    row = D.decode_dat2(envelope_df).orderBy("channel").collect()[0]
    assert row.voltage == [1, 2, 3] and row.sample_rate == 10**9
    assert row.ts == pd.Timestamp(MD["ts_ns"], unit="ns").to_pydatetime().replace(tzinfo=None)


def test_f144_value_int_sidecar_above_2p53(spark):
    """i64/u64 fidelity (ecs_f144_logdata.fbs:80-101): integer values above
    2^53 keep exact fidelity in the value_int BIGINT sidecar while the
    DOUBLE widening rounds; a ulong >= 2^63 exceeds BIGINT and leaves the
    sidecar NULL (the double approximation is then the only form)."""
    big = 9_007_199_254_740_993  # 2^53 + 1: first integer a double can't hold
    u64_big = 2**63 + 5
    rows = [
        ("runlog", M.encode_f144("pv:l", 1, big, "long")),
        ("runlog", M.encode_f144("pv:u", 2, u64_big, "ulong")),
        ("runlog", M.encode_f144("pv:d", 3, 2.5, "double")),
    ]
    df = spark.createDataFrame(rows, "topic string, value binary")
    out = {r.source_name: r for r in D.decode_f144(df).collect()}
    assert out["pv:l"].value_int == big
    assert out["pv:l"].value != big  # the double path rounds 2^53+1 -> 2^53
    assert out["pv:u"].value_int is None  # exceeds BIGINT: honest NULL
    assert out["pv:u"].value == float(u64_big)
    assert out["pv:d"].value_int is None and out["pv:d"].value == 2.5


# ---------------------------------------------------------------------------
# vectorized whole-column dev2 decode: _dev2_vectorized must be
# row-identical to the per-message slow path on every input shape —
# uniform layouts (the strided zero-index gather), ragged layouts, junk,
# truncations, nulls, slices, and absent fields
# ---------------------------------------------------------------------------


def _dev2_payload(i: int, n_ev: int) -> bytes:
    md = {
        "ts_ns": 1_700_000_000_123_456_789 + i * 12_345,
        "period_number": i // 7,
        "protons_per_pulse": i % 200,
        "running": bool(i % 2),
        "frame_number": i,
        "veto_flags": i % 65_536,
    }
    ch = [(e * 3 + i) % 4096 for e in range(n_ev)]
    et = [(e * 37 + i) % 20_000_000 for e in range(n_ev)]
    ev = [(e + i) % 4096 for e in range(n_ev)]
    return M.encode_dev2(i % 256, md, et, ev, ch)


def _slow_reference(col):
    # a python list forces dev2_arrow_batch down the per-message path
    return D.dev2_arrow_batch(list(col.to_pylist()))


def test_dev2_vectorized_matches_slow_path_mixed():
    import pyarrow as pa

    payloads = [_dev2_payload(i, (i * 13) % 700) for i in range(120)]
    junk = [b"", b"xxx", b"xxxxdat2" + bytes(50), None, b"xxxxdev2",
            b"xxxxdev2" + bytes(2)]
    junk += [payloads[5][:cut] for cut in (9, 15, 23, 40, 100,
                                           len(payloads[5]) - 1)]
    col = pa.array(payloads[:30] + junk + payloads[30:], pa.binary())
    fast = D._dev2_vectorized(col)
    assert fast.equals(_slow_reference(col))
    assert fast.num_rows == 120  # every junk entry skipped, no real one
    # sliced column (the fetch path hands over offset slices)
    sl = col.slice(17, 90)
    assert D._dev2_vectorized(sl).equals(_slow_reference(sl))
    # large_binary spelling
    colL = pa.array(col.to_pylist(), pa.large_binary())
    assert D._dev2_vectorized(colL).equals(fast)


def test_dev2_vectorized_uniform_and_ragged_paths():
    import pyarrow as pa

    uniform = pa.array([_dev2_payload(i, 500) for i in range(64)], pa.binary())
    assert D._dev2_vectorized(uniform).equals(_slow_reference(uniform))
    ragged = pa.array(
        [_dev2_payload(i, 1 + (i * 37) % 600) for i in range(64)], pa.binary()
    )
    assert D._dev2_vectorized(ragged).equals(_slow_reference(ragged))
    empty = pa.array([], pa.binary())
    assert D._dev2_vectorized(empty).num_rows == 0
    all_junk = pa.array([b"junk", None, b""], pa.binary())
    assert D._dev2_vectorized(all_junk).num_rows == 0


def test_dev2_vectorized_absent_vectors_default_empty():
    """A table written without its vector slots decodes to empty lists —
    the vtable's absent-field default, same as the slow path."""
    import pyarrow as pa

    b = fb.Builder()
    md = M._metadata_table(b, MD)
    b.start_table()
    b.slot_offset(1, md)
    b.slot_scalar(0, "u8", 42)
    bare = b.finish(b.end_table(), "dev2")
    col = pa.array([bare, _dev2_payload(3, 5)], pa.binary())
    fast = D._dev2_vectorized(col)
    assert fast.equals(_slow_reference(col))
    assert fast.num_rows == 2
    assert fast.column("channel")[0].as_py() == []
    assert fast.column("digitizer_id")[0].as_py() == 42


@given(
    st.lists(
        st.one_of(
            st.tuples(st.integers(0, 10_000), st.integers(0, 40)),
            st.binary(max_size=60),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=60, deadline=None)
def test_dev2_vectorized_property_equality(entries):
    import pyarrow as pa

    payloads = [
        _dev2_payload(i, n) if isinstance(e, tuple) else e
        for e in entries
        for i, n in [e if isinstance(e, tuple) else (0, 0)]
    ]
    col = pa.array(payloads, pa.binary())
    assert D._dev2_vectorized(col).equals(_slow_reference(col))


def _aev2_payload(i: int, n_ev: int, n_dig: int = 8) -> bytes:
    md = {
        "ts_ns": 1_700_000_000_123_456_789 + i * 12_345,
        "period_number": i // 7,
        "protons_per_pulse": i % 200,
        "running": bool(i % 2),
        "frame_number": i,
        "veto_flags": i % 65_536,
    }
    ch = [(e * 3 + i) % 4096 for e in range(n_ev)]
    et = [(e * 37 + i) % 20_000_000 for e in range(n_ev)]
    ev = [(e + i) % 4096 for e in range(n_ev)]
    return M.encode_aev2(md, et, ev, ch, bool(i % 3), list(range(n_dig)))


def test_aev2_vectorized_matches_slow_path_mixed():
    import pyarrow as pa

    payloads = [_aev2_payload(i, (i * 13) % 700) for i in range(80)]
    junk = [b"", b"xxx", b"xxxxdev2" + bytes(50), None, b"xxxxaev2",
            b"xxxxaev2" + bytes(2)]
    junk += [payloads[5][:cut] for cut in (9, 15, 23, 40, 100,
                                           len(payloads[5]) - 1)]
    col = pa.array(payloads[:20] + junk + payloads[20:], pa.binary())
    fast = D._aev2_vectorized(col)
    assert fast.equals(D.aev2_arrow_batch(list(col.to_pylist())))
    assert fast.num_rows == 80
    sl = col.slice(11, 60)
    assert D._aev2_vectorized(sl).equals(
        D.aev2_arrow_batch(list(sl.to_pylist()))
    )
    assert fast.column("complete")[0].as_py() == bool(0 % 3)
    assert fast.column("digitizers_present")[0].as_py() == list(range(8))


def test_aev2_arrow_matches_per_message_decoder():
    """The arrow fallback's field mapping against messages.decode_aev2
    directly — one frame, every column value checked."""
    import pyarrow as pa

    buf = _aev2_payload(9, 17, n_dig=3)
    d = M.decode_aev2(buf)
    rb = D.aev2_arrow_batch(pa.array([buf], pa.binary()))
    row = {c: rb.column(c)[0].as_py() for c in rb.schema.names}
    assert row["period_number"] == d["metadata"]["period_number"]
    assert row["frame_number"] == d["metadata"]["frame_number"]
    assert row["veto_flags"] == d["metadata"]["veto_flags"]
    assert row["running"] == bool(d["metadata"]["running"])
    assert row["complete"] == bool(d["complete"])
    assert row["digitizers_present"] == list(d["digitizers_present"])
    assert row["channel"] == list(d["channel"])
    assert row["event_time"] == list(d["time"])
    assert row["event_voltage"] == list(d["voltage"])
    us = d["metadata"]["ts_ns"] // 1000
    assert int(row["ts"].timestamp() * 1e6) in (us, us - 1)  # float round


@given(
    st.lists(
        st.one_of(
            st.tuples(st.integers(0, 10_000), st.integers(0, 40)),
            st.binary(max_size=60),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_aev2_vectorized_property_equality(entries):
    import pyarrow as pa

    payloads = [
        _aev2_payload(i, n) if isinstance(e, tuple) else e
        for e in entries
        for i, n in [e if isinstance(e, tuple) else (0, 0)]
    ]
    col = pa.array(payloads, pa.binary())
    assert D._aev2_vectorized(col).equals(
        D.aev2_arrow_batch(list(col.to_pylist()))
    )
