"""Typed encoders/decoders for the pipeline's FlatBuffers message schemas.

Covers every wire schema the reference routes between services
(docs/data_pipeline.md:9-71): dat2 traces, dev2/aev2 event lists, pl72/6s4t
run control, f144 run logs, se00 sample-environment logs, al00 alarms and
the df12 detector-spectrum map.  Field orders/types re-derived from the
published ``.fbs`` IDL files (schemas/*.fbs in the reference tree); wire
bytes via the minimal codec in :mod:`.flatbuf`.

These double as the G7 "message builder" surface
(simulator/src/integrated/send_messages.rs:114-381 builds the same message
set for fixtures): each ``encode_*`` returns a finished payload whose 4-byte
identifier the dispatch layer (:mod:`.decode`) routes on, mirroring the
identifier checks in trace-to-events/src/main.rs:199-257.

Timestamps cross this layer as integer nanoseconds since the UNIX epoch;
GpsTime (frame_metadata_v2.fbs:62-73) packs to the calendar fields with full
nanosecond fidelity.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone

import numpy as np

from . import flatbuf as fb

# ---------------------------------------------------------------------------
# GpsTime struct: year-since-2000 u8, day-of-year u16, h/m/s u8, ms/us/ns u16
# (14 bytes with interior padding, 2-aligned).
# ---------------------------------------------------------------------------

_GPS = struct.Struct("<BxHBBBxHHH")
_EPOCH_2000 = datetime(2000, 1, 1, tzinfo=timezone.utc).timestamp()


def pack_gps_time(epoch_ns: int) -> bytes:
    sec, in_sec = divmod(int(epoch_ns), 1_000_000_000)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    ms, rem = divmod(in_sec, 1_000_000)
    us, ns = divmod(rem, 1_000)
    return _GPS.pack(
        dt.year - 2000, dt.timetuple().tm_yday, dt.hour, dt.minute, dt.second, ms, us, ns
    )


def unpack_gps_time(buf: bytes, pos: int) -> int:
    year, day, hour, minute, second, ms, us, ns = _GPS.unpack_from(buf, pos)
    base = datetime(2000 + year, 1, 1, tzinfo=timezone.utc) + timedelta(
        days=day - 1, hours=hour, minutes=minute, seconds=second
    )
    return int(base.timestamp()) * 1_000_000_000 + ms * 1_000_000 + us * 1_000 + ns


# ---------------------------------------------------------------------------
# FrameMetadataV2 (frame_metadata_v2.fbs:53-60): slots
# 0 timestamp(GpsTime) 1 period_number(u64) 2 protons_per_pulse(u8)
# 3 running(bool) 4 frame_number(u32) 5 veto_flags(u16)
# ---------------------------------------------------------------------------


def _metadata_table(b: fb.Builder, md: dict) -> int:
    b.start_table()
    b.slot_scalar(5, "u16", md.get("veto_flags", 0))
    b.slot_scalar(4, "u32", md.get("frame_number", 0))
    b.slot_scalar(3, "bool", md.get("running", False))
    b.slot_scalar(2, "u8", md.get("protons_per_pulse", 0))
    b.slot_scalar(1, "u64", md.get("period_number", 0))
    b.slot_struct(0, pack_gps_time(md["ts_ns"]), 2)
    return b.end_table()


def _read_metadata(buf: bytes, mpos: int) -> dict:
    gpos = fb.field_pos(buf, mpos, 0)
    return {
        "ts_ns": unpack_gps_time(buf, gpos) if gpos is not None else 0,
        "period_number": fb.read_scalar(buf, mpos, 1, "u64"),
        "protons_per_pulse": fb.read_scalar(buf, mpos, 2, "u8"),
        "running": bool(fb.read_scalar(buf, mpos, 3, "bool", False)),
        "frame_number": fb.read_scalar(buf, mpos, 4, "u32"),
        "veto_flags": fb.read_scalar(buf, mpos, 5, "u16"),
    }


# ---------------------------------------------------------------------------
# dat2 — DigitizerAnalogTraceMessage
# ---------------------------------------------------------------------------


def encode_dat2(digitizer_id: int, metadata: dict, sample_rate: int, channels) -> bytes:
    """``channels``: iterable of (channel:int, voltage:uint16-array)."""
    b = fb.Builder()
    ch_offsets = []
    for channel, voltage in channels:
        v_off = b.create_vector("u16", voltage)
        b.start_table()
        b.slot_offset(1, v_off)
        b.slot_scalar(0, "u32", channel)
        ch_offsets.append(b.end_table())
    vec = b.create_offset_vector(ch_offsets)
    md = _metadata_table(b, metadata)
    b.start_table()
    b.slot_offset(3, vec)
    b.slot_scalar(2, "u64", sample_rate)
    b.slot_offset(1, md)
    b.slot_scalar(0, "u8", digitizer_id)
    return b.finish(b.end_table(), "dat2")


def decode_dat2(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    channels = []
    for cp in fb.read_offset_vector(buf, t, 3):
        channels.append(
            (fb.read_scalar(buf, cp, 0, "u32"), fb.read_vector(buf, cp, 1, "u16"))
        )
    return {
        "digitizer_id": fb.read_scalar(buf, t, 0, "u8"),
        "metadata": _read_metadata(buf, fb.read_offset(buf, t, 1)),
        "sample_rate": fb.read_scalar(buf, t, 2, "u64"),
        "channels": channels,
    }


# ---------------------------------------------------------------------------
# dev2 — DigitizerEventListMessage (SoA vectors time/voltage/channel)
# ---------------------------------------------------------------------------


def encode_dev2(digitizer_id: int, metadata: dict, time, voltage, channel) -> bytes:
    b = fb.Builder()
    ch = b.create_vector("u32", channel)
    vv = b.create_vector("u16", voltage)
    tt = b.create_vector("u32", time)
    md = _metadata_table(b, metadata)
    b.start_table()
    b.slot_offset(4, ch)
    b.slot_offset(3, vv)
    b.slot_offset(2, tt)
    b.slot_offset(1, md)
    b.slot_scalar(0, "u8", digitizer_id)
    return b.finish(b.end_table(), "dev2")


def decode_dev2(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    return {
        "digitizer_id": fb.read_scalar(buf, t, 0, "u8"),
        "metadata": _read_metadata(buf, fb.read_offset(buf, t, 1)),
        "time": fb.read_vector(buf, t, 2, "u32"),
        "voltage": fb.read_vector(buf, t, 3, "u16"),
        "channel": fb.read_vector(buf, t, 4, "u32"),
    }


# ---------------------------------------------------------------------------
# aev2 — FrameAssembledEventListMessage
# ---------------------------------------------------------------------------


def encode_aev2(
    metadata: dict, time, voltage, channel, complete: bool, digitizers_present
) -> bytes:
    b = fb.Builder()
    dp = b.create_vector("u8", digitizers_present)
    ch = b.create_vector("u32", channel)
    vv = b.create_vector("u16", voltage)
    tt = b.create_vector("u32", time)
    md = _metadata_table(b, metadata)
    b.start_table()
    b.slot_offset(5, dp)
    b.slot_scalar(4, "bool", complete)
    b.slot_offset(3, ch)
    b.slot_offset(2, vv)
    b.slot_offset(1, tt)
    b.slot_offset(0, md)
    return b.finish(b.end_table(), "aev2")


def decode_aev2(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    return {
        "metadata": _read_metadata(buf, fb.read_offset(buf, t, 0)),
        "time": fb.read_vector(buf, t, 1, "u32"),
        "voltage": fb.read_vector(buf, t, 2, "u16"),
        "channel": fb.read_vector(buf, t, 3, "u32"),
        "complete": bool(fb.read_scalar(buf, t, 4, "bool", False)),
        "digitizers_present": fb.read_vector(buf, t, 5, "u8"),
    }


# ---------------------------------------------------------------------------
# df12 — SpectraDetectorMapping; pl72 — RunStart; 6s4t — RunStop
# ---------------------------------------------------------------------------


def _df12_table(b: fb.Builder, m: dict) -> int:
    det = b.create_vector("i32", m["detector_id"])
    spec = b.create_vector("i32", m["spectrum"])
    b.start_table()
    b.slot_scalar(2, "i32", m.get("n_spectra", len(m["spectrum"])))
    b.slot_offset(1, det)
    b.slot_offset(0, spec)
    return b.end_table()


def encode_df12(spectrum, detector_id, n_spectra: int | None = None) -> bytes:
    b = fb.Builder()
    t = _df12_table(
        b,
        {
            "spectrum": spectrum,
            "detector_id": detector_id,
            "n_spectra": len(spectrum) if n_spectra is None else n_spectra,
        },
    )
    return b.finish(t, "df12")


def _read_df12(buf: bytes, p: int) -> dict:
    return {
        "spectrum": fb.read_vector(buf, p, 0, "i32"),
        "detector_id": fb.read_vector(buf, p, 1, "i32"),
        "n_spectra": fb.read_scalar(buf, p, 2, "i32"),
    }


def decode_df12(buf: bytes) -> dict:
    return _read_df12(buf, fb.root_pos(buf))


_PL72_STRINGS = {  # slot -> field name (ecs_pl72_run_start.fbs:14-33)
    2: "run_name",
    3: "instrument_name",
    4: "nexus_structure",
    5: "job_id",
    6: "broker",
    7: "service_id",
    8: "filename",
    11: "metadata",
    12: "control_topic",
}


def encode_run_start(
    start_time_ms: int,
    run_name: str,
    stop_time_ms: int = 0,
    n_periods: int = 1,
    detector_spectrum_map: dict | None = None,
    **strings: str,
) -> bytes:
    b = fb.Builder()
    str_offs = {
        slot: b.create_string(strings[name])
        for slot, name in _PL72_STRINGS.items()
        if name in strings and strings[name] is not None
    }
    if run_name is not None:
        str_offs[2] = b.create_string(run_name)
    dsm = _df12_table(b, detector_spectrum_map) if detector_spectrum_map else None
    b.start_table()
    b.slot_offset(10, dsm)
    b.slot_scalar(9, "u32", n_periods)
    for slot in sorted(str_offs, reverse=True):
        b.slot_offset(slot, str_offs[slot])
    b.slot_scalar(1, "u64", stop_time_ms)
    b.slot_scalar(0, "u64", start_time_ms)
    return b.finish(b.end_table(), "pl72")


def decode_run_start(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    out = {
        "start_time_ms": fb.read_scalar(buf, t, 0, "u64"),
        "stop_time_ms": fb.read_scalar(buf, t, 1, "u64"),
        "n_periods": fb.read_scalar(buf, t, 9, "u32", 1),
    }
    for slot, name in _PL72_STRINGS.items():
        out[name] = fb.read_string(buf, t, slot)
    dsm = fb.read_offset(buf, t, 10)
    out["detector_spectrum_map"] = _read_df12(buf, dsm) if dsm is not None else None
    return out


def encode_run_stop(
    stop_time_ms: int,
    run_name: str,
    job_id: str | None = None,
    service_id: str | None = None,
    command_id: str | None = None,
) -> bytes:
    b = fb.Builder()
    offs = {
        i: b.create_string(s)
        for i, s in ((4, command_id), (3, service_id), (2, job_id), (1, run_name))
        if s is not None
    }
    b.start_table()
    for slot in sorted(offs, reverse=True):
        b.slot_offset(slot, offs[slot])
    b.slot_scalar(0, "u64", stop_time_ms)
    return b.finish(b.end_table(), "6s4t")


def decode_run_stop(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    return {
        "stop_time_ms": fb.read_scalar(buf, t, 0, "u64"),
        "run_name": fb.read_string(buf, t, 1),
        "job_id": fb.read_string(buf, t, 2),
        "service_id": fb.read_string(buf, t, 3),
        "command_id": fb.read_string(buf, t, 4),
    }


# ---------------------------------------------------------------------------
# f144 — LogData with 20-member scalar/array union (ecs_f144_logdata.fbs)
# ---------------------------------------------------------------------------

_F144_SCALAR_KINDS = ["i8", "u8", "i16", "u16", "i32", "u32", "i64", "u64", "f32", "f64"]
_F144_NAMES = ["byte", "ubyte", "short", "ushort", "int", "uint", "long", "ulong", "float", "double"]
# union type id -> (is_array, scalar kind); ids 1..10 scalar, 11..20 array
F144_UNION = {i + 1: (False, k) for i, k in enumerate(_F144_SCALAR_KINDS)}
F144_UNION.update({i + 11: (True, k) for i, k in enumerate(_F144_SCALAR_KINDS)})
F144_TYPE_NAMES = dict(
    list(zip(range(1, 11), _F144_NAMES))
    + list(zip(range(11, 21), (f"array_{n}" for n in _F144_NAMES)))
)
_F144_TYPE_IDS = {v: k for k, v in F144_TYPE_NAMES.items()}


def encode_f144(source_name: str, timestamp_ns: int, value, value_type: str = "double") -> bytes:
    """``value_type``: one of byte..double or array_byte..array_double."""
    b = fb.Builder()
    tid = _F144_TYPE_IDS[value_type]
    is_array, kind = F144_UNION[tid]
    if is_array:
        payload = b.create_vector(kind, value)
        b.start_table()
        b.slot_offset(0, payload)
        member = b.end_table()
    else:
        b.start_table()
        b.slot_scalar(0, kind, value)
        member = b.end_table()
    name = b.create_string(source_name)
    b.start_table()
    b.slot_offset(3, member)
    b.slot_scalar(2, "u8", tid)
    b.slot_scalar(1, "i64", timestamp_ns)
    b.slot_offset(0, name)
    return b.finish(b.end_table(), "f144")


def decode_f144(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    tid = fb.read_scalar(buf, t, 2, "u8")
    mpos = fb.read_offset(buf, t, 3)
    is_array, kind = F144_UNION[tid]
    if is_array:
        vp = fb.read_offset(buf, mpos, 0)
        value = fb.read_vector_at(buf, vp, kind)
    else:
        value = fb.read_scalar(buf, mpos, 0, kind)
    return {
        "source_name": fb.read_string(buf, t, 0),
        "timestamp_ns": fb.read_scalar(buf, t, 1, "i64"),
        "value_type": F144_TYPE_NAMES[tid],
        "value": value,
    }


# ---------------------------------------------------------------------------
# se00 — SampleEnvironmentData (ecs_se00_data.fbs:114-154)
# ---------------------------------------------------------------------------

_SE00_KINDS = ["i8", "u8", "i16", "u16", "i32", "u32", "i64", "u64", "f64", "f32"]
SE00_UNION = {i + 1: k for i, k in enumerate(_SE00_KINDS)}
_SE00_TYPE_IDS = {k: i for i, k in SE00_UNION.items()}
SE00_LOCATIONS = {0: "Unknown", 1: "Start", 2: "Middle", 3: "End"}
_SE00_LOC_IDS = {v: k for k, v in SE00_LOCATIONS.items()}


def encode_se00(
    name: str,
    packet_timestamp_ns: int,
    values,
    values_kind: str = "f64",
    channel: int = -1,
    time_delta_ns: float = 0.0,
    timestamp_location: str = "Unknown",
    timestamps=None,
    message_counter: int = 0,
) -> bytes:
    b = fb.Builder()
    ts_vec = b.create_vector("i64", timestamps) if timestamps is not None else None
    vals_vec = b.create_vector(values_kind, values)
    b.start_table()
    b.slot_offset(0, vals_vec)
    member = b.end_table()  # union member table wrapping the vector
    name_off = b.create_string(name)
    b.start_table()
    b.slot_scalar(8, "i64", message_counter)
    b.slot_offset(7, ts_vec)
    b.slot_offset(6, member)
    b.slot_scalar(5, "u8", _SE00_TYPE_IDS[values_kind])
    b.slot_scalar(4, "i8", _SE00_LOC_IDS[timestamp_location])
    b.slot_scalar(3, "f64", time_delta_ns)
    b.slot_scalar(2, "i64", packet_timestamp_ns)
    b.slot_scalar(1, "i32", channel)
    b.slot_offset(0, name_off)
    return b.finish(b.end_table(), "se00")


def decode_se00(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    tid = fb.read_scalar(buf, t, 5, "u8")
    mpos = fb.read_offset(buf, t, 6)
    vp = fb.read_offset(buf, mpos, 0)
    return {
        "name": fb.read_string(buf, t, 0),
        "channel": fb.read_scalar(buf, t, 1, "i32"),
        "packet_timestamp_ns": fb.read_scalar(buf, t, 2, "i64"),
        "time_delta_ns": fb.read_scalar(buf, t, 3, "f64"),
        "timestamp_location": SE00_LOCATIONS[fb.read_scalar(buf, t, 4, "i8")],
        "values_kind": SE00_UNION[tid],
        "values": fb.read_vector_at(buf, vp, SE00_UNION[tid]),
        "timestamps": fb.read_vector(buf, t, 7, "i64"),
        "message_counter": fb.read_scalar(buf, t, 8, "i64"),
    }


# ---------------------------------------------------------------------------
# al00 — Alarm (ecs_al00_alarm.fbs:159-173); severity enum short, default OK
# ---------------------------------------------------------------------------

AL00_SEVERITIES = {0: "OK", 1: "MINOR", 2: "MAJOR", 3: "INVALID"}
_AL00_SEVERITY_IDS = {v: k for k, v in AL00_SEVERITIES.items()}


def encode_al00(
    source_name: str, timestamp_ns: int, severity: str = "OK", message: str | None = None
) -> bytes:
    b = fb.Builder()
    msg = b.create_string(message) if message is not None else None
    name = b.create_string(source_name)
    b.start_table()
    b.slot_offset(3, msg)
    b.slot_scalar(2, "i16", _AL00_SEVERITY_IDS[severity])
    b.slot_scalar(1, "i64", timestamp_ns)
    b.slot_offset(0, name)
    return b.finish(b.end_table(), "al00")


def decode_al00(buf: bytes) -> dict:
    t = fb.root_pos(buf)
    return {
        "source_name": fb.read_string(buf, t, 0),
        "timestamp_ns": fb.read_scalar(buf, t, 1, "i64"),
        "severity": AL00_SEVERITIES[fb.read_scalar(buf, t, 2, "i16", 0)],
        "message": fb.read_string(buf, t, 3),
    }


# ---------------------------------------------------------------------------
# Identifier-keyed registry — the dispatch layer routes on these, mirroring
# the per-topic identifier checks (nexus-writer/src/message_handlers.rs:38-120).
# ---------------------------------------------------------------------------

DECODERS = {
    "dat2": decode_dat2,
    "dev2": decode_dev2,
    "aev2": decode_aev2,
    "pl72": decode_run_start,
    "6s4t": decode_run_stop,
    "f144": decode_f144,
    "se00": decode_se00,
    "al00": decode_al00,
    "df12": decode_df12,
}


def decode_any(buf: bytes) -> tuple[str, dict]:
    ident = fb.identifier(buf)
    if ident not in DECODERS:
        raise ValueError(f"unknown file identifier {ident!r}")
    return ident, DECODERS[ident](buf)
