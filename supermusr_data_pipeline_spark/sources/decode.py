"""S3: byte-payload decode + identifier dispatch as Spark operators.

The front door of every reference service is: receive a Kafka record, check
the payload's 4-byte FlatBuffers file identifier, parse, and route by
topic/type (trace-to-events/src/main.rs:199-257, nexus-writer/src/
message_handlers.rs:38-120).  This module lifts that into Spark:

- envelope rows are ``(topic string, key binary?, value binary)`` — exactly
  the projection of Spark's Kafka source (works identically for
  ``readStream.format("kafka")`` in production and for in-test DataFrames);
- ``with_identifier`` extracts the identifier JVM-side so the dispatch
  filter prunes before any Python is involved;
- ``decode_*`` run the Python codec inside ``mapInPandas`` — narrow,
  Arrow-batched, scan-stage work with no shuffle: at 100 TB the payload
  bytes stream through executors once and the per-identifier filters mean
  each decoder only ever deserializes its own message family.

Malformed payloads (short buffer / wrong identifier / parse error) are
dropped, mirroring the reference's warn-and-skip policy
(digitiser-aggregator/src/main.rs:331-352); ``decode_errors`` exposes the
error-side channel for the P8 failure counters.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import messages as M

# identifiers handled by the dispatch layer
IDENTIFIERS = tuple(M.DECODERS)


def with_identifier(df: DataFrame) -> DataFrame:
    """Add the FlatBuffers file identifier (bytes 4..8 of value), JVM-side."""
    return df.withColumn("identifier", F.substring(F.col("value"), 5, 4).cast("string"))


def dispatch(df: DataFrame, ident: str) -> DataFrame:
    """Filter an envelope frame to one message family (identifier check).

    Identifier, not topic, is authoritative — the reference warns and skips
    when a topic carries an unexpected identifier."""
    out = df if "identifier" in df.columns else with_identifier(df)
    return out.filter(F.col("identifier") == ident)


def _map_decoded(df: DataFrame, ident: str, schema: T.StructType, row_fn) -> DataFrame:
    """mapInPandas plumbing shared by all decoders: filter to ``ident``,
    decode each payload, fan out via ``row_fn(decoded) -> list[dict]``.

    Integer columns are materialized as pandas NULLABLE Int64/Int32 arrays:
    a plain ``pd.DataFrame(rows)`` silently coerces an int column containing
    a ``None`` to float64, which rounds i64 values above 2^53 before Arrow
    ever sees them (the f144 value_int sidecar exists precisely to avoid
    that rounding)."""
    cols = [f.name for f in schema.fields]
    int_dtype = {
        f.name: "Int64" if isinstance(f.dataType, T.LongType) else "Int32"
        for f in schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType))
    }

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for payload in pdf["value"]:
                buf = bytes(payload)
                try:
                    decoded = M.DECODERS[ident](buf)
                except Exception:
                    continue  # malformed: warn-and-skip channel (P8)
                out.extend(row_fn(decoded))
            if out:
                yield pd.DataFrame(
                    {
                        c: pd.array([r[c] for r in out], dtype=int_dtype[c])
                        if c in int_dtype
                        else pd.Series([r[c] for r in out])
                        for c in cols
                    },
                    columns=cols,
                )
            else:
                yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    return dispatch(df, ident).select("value").mapInPandas(proc, schema)


def _map_decoded_cols(df: DataFrame, ident: str, schema: T.StructType, cols_fn) -> DataFrame:
    """Columnar variant of ``_map_decoded``: ``cols_fn(decoded) ->
    dict[str, np.ndarray]`` returns the already-expanded column vectors for
    ONE message; per Arrow batch the vectors are concatenated column-wise
    and handed to pandas once.  This avoids materializing one Python dict
    per OUTPUT ROW (a 10k-event dev2 message used to allocate 10k dicts
    before pandas re-columnarized them) — the decoder already holds SoA
    numpy vectors, so the batch is built with np.repeat/np.concatenate at
    C speed.  Throughput-critical at the reference's 800k events/s wire
    rate."""
    cols = [f.name for f in schema.fields]

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts: list[dict] = []
            for payload in pdf["value"]:
                buf = bytes(payload)
                try:
                    decoded = M.DECODERS[ident](buf)
                except Exception:
                    continue  # malformed: warn-and-skip channel (P8)
                part = cols_fn(decoded)
                if part is not None:
                    parts.append(part)
            if parts:
                yield pd.DataFrame(
                    {c: np.concatenate([p[c] for p in parts]) for c in cols},
                    columns=cols,
                )
            else:
                yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    return dispatch(df, ident).select("value").mapInPandas(proc, schema)


def _ts_us(ns: int) -> pd.Timestamp:
    """Spark's TimestampType is microsecond; truncate explicitly (ns
    fidelity only matters for the relative event_time_offset, SURVEY §1.2).
    The python-level codec (messages.py) keeps exact nanoseconds."""
    return pd.Timestamp(int(ns) - int(ns) % 1000, unit="ns")


def _md_cols(md: dict) -> dict:
    return {
        "ts": _ts_us(md["ts_ns"]),
        "period_number": md["period_number"],
        "protons_per_pulse": md["protons_per_pulse"],
        "running": md["running"],
        "frame_number": md["frame_number"],
        "veto_flags": md["veto_flags"],
    }


def _md_vecs(md: dict, n: int) -> dict:
    """Metadata as n-repeated column vectors (columnar twin of _md_cols)."""
    return {
        "ts": np.full(n, _ts_us(md["ts_ns"]).to_datetime64(), dtype="datetime64[ns]"),
        "period_number": np.full(n, md["period_number"], dtype="int64"),
        "protons_per_pulse": np.full(n, md["protons_per_pulse"], dtype="int32"),
        "running": np.full(n, bool(md["running"]), dtype=bool),
        "frame_number": np.full(n, md["frame_number"], dtype="int64"),
        "veto_flags": np.full(n, md["veto_flags"], dtype="int32"),
    }


_MD_FIELDS = [
    T.StructField("ts", T.TimestampType()),
    T.StructField("period_number", T.LongType()),
    T.StructField("protons_per_pulse", T.IntegerType()),
    T.StructField("running", T.BooleanType()),
    T.StructField("frame_number", T.LongType()),
    T.StructField("veto_flags", T.IntegerType()),
]

DAT2_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("digitizer_id", T.IntegerType()),
        *_MD_FIELDS,
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("voltage", T.ArrayType(T.IntegerType())),
    ]
)

DEV2_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("digitizer_id", T.IntegerType()),
        *_MD_FIELDS,
        T.StructField("channel", T.IntegerType()),
        T.StructField("event_time", T.LongType()),
        T.StructField("event_voltage", T.IntegerType()),
    ]
)

AEV2_DECODED_SCHEMA = T.StructType(
    [
        *_MD_FIELDS,
        T.StructField("complete", T.BooleanType()),
        T.StructField("digitizers_present", T.ArrayType(T.IntegerType())),
        T.StructField("channel", T.ArrayType(T.IntegerType())),
        T.StructField("event_time", T.ArrayType(T.LongType())),
        T.StructField("event_voltage", T.ArrayType(T.IntegerType())),
    ]
)

RUN_CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # start | stop
        T.StructField("run_name", T.StringType()),
        T.StructField("time_ms", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("instrument_name", T.StringType()),
        T.StructField("n_periods", T.IntegerType()),
        T.StructField("job_id", T.StringType()),
    ]
)

F144_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_int", T.LongType()),
        T.StructField("value_type", T.StringType()),
        T.StructField("value_array", T.ArrayType(T.DoubleType())),
    ]
)

SE00_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("packet_ts", T.TimestampType()),
        T.StructField("time_delta", T.DoubleType()),
        T.StructField("timestamp_location", T.StringType()),
        T.StructField("values", T.ArrayType(T.DoubleType())),
        T.StructField("timestamps", T.ArrayType(T.LongType())),
        T.StructField("message_counter", T.LongType()),
    ]
)

AL00_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("severity", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)


def decode_dat2(df: DataFrame) -> DataFrame:
    """dat2 payloads → long trace rows (one per channel), matching
    ``schemas.TRACE_SCHEMA``.  Built columnarly from the decoder's SoA
    vectors — no per-row Python dicts."""

    def cols(d: dict):
        chans = d["channels"]
        n = len(chans)
        if n == 0:
            return None
        voltage = np.empty(n, dtype=object)
        for i, (_, v) in enumerate(chans):
            voltage[i] = np.asarray(v).astype("int32").tolist()
        return {
            "digitizer_id": np.full(n, d["digitizer_id"], dtype="int32"),
            **_md_vecs(d["metadata"], n),
            "sample_rate": np.full(n, d["sample_rate"], dtype="int64"),
            "channel": np.asarray([ch for ch, _ in chans], dtype="int32"),
            "voltage": voltage,
        }

    return _map_decoded_cols(df, "dat2", DAT2_DECODED_SCHEMA, cols)


def decode_dev2(df: DataFrame) -> DataFrame:
    """dev2 payloads → long event rows (one per detected event).  Built
    columnarly: a 10k-event message becomes 9 np.repeat/asarray column
    vectors, not 10k row dicts — several times cheaper at wire rates."""

    def cols(d: dict):
        t = d["time"]
        n = 0 if t is None else len(t)
        if n == 0:
            return None
        return {
            "digitizer_id": np.full(n, d["digitizer_id"], dtype="int32"),
            **_md_vecs(d["metadata"], n),
            "channel": np.asarray(d["channel"], dtype="int32"),
            "event_time": np.asarray(t, dtype="int64"),
            "event_voltage": np.asarray(d["voltage"]).astype("int32"),
        }

    return _map_decoded_cols(df, "dev2", DEV2_DECODED_SCHEMA, cols)


def _dev2_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("digitizer_id", pa.int32()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("period_number", pa.int64()),
            ("protons_per_pulse", pa.int32()),
            ("running", pa.bool_()),
            ("frame_number", pa.int64()),
            ("veto_flags", pa.int32()),
            ("channel", pa.list_(pa.int32())),
            ("event_time", pa.list_(pa.int64())),
            ("event_voltage", pa.list_(pa.float64())),
        ]
    )


def dev2_arrow_batch(values):
    """Decode an iterable of raw dev2 payloads (bytes / None / Arrow
    binary scalars) into ONE Arrow RecordBatch of the
    DIGITISER_MESSAGE_SCHEMA shape.  Identifier-checked per payload:
    non-dev2 or malformed entries are warn-and-skipped (P8).  All event
    vectors concatenate into one values buffer per column
    (``pa.ListArray.from_arrays``) — no per-event Python objects.

    Shared by the ``mapInArrow`` decoder stage
    (``decode_dev2_messages``) and the kafka-wire source's FUSED
    ``valueDecode=dev2`` path (kafka/spark_source.py), where decoding
    inside the source task removes a whole JVM<->Python round trip of
    the raw payload bytes per micro-batch."""
    import pyarrow as pa

    out_schema = _dev2_arrow_schema()
    decoder = M.DECODERS["dev2"]
    dec = []
    for v in values:
        b = v if isinstance(v, (bytes, bytearray)) or v is None else v.as_py()
        if b is None or len(b) < 8 or bytes(b[4:8]) != b"dev2":
            continue  # wrong family on the topic: warn-and-skip
        try:
            dec.append(decoder(b))
        except Exception:
            continue  # malformed: warn-and-skip channel (P8)
    n = len(dec)
    if n == 0:
        return pa.RecordBatch.from_arrays(
            [pa.array([], type=f.type) for f in out_schema],
            schema=out_schema,
        )

    def _list_col(vecs: list, np_type, pa_value_type):
        lens = np.fromiter((len(v) for v in vecs), np.int32, len(vecs))
        offs = np.zeros(len(vecs) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        values_buf = (
            np.concatenate([np.asarray(v, dtype=np_type) for v in vecs])
            if int(offs[-1])
            else np.empty(0, dtype=np_type)
        )
        return pa.ListArray.from_arrays(
            pa.array(offs), pa.array(values_buf, type=pa_value_type)
        )

    md = [d["metadata"] for d in dec]
    ts_us = np.fromiter((m["ts_ns"] // 1000 for m in md), np.int64, n)
    arrays = [
        pa.array(np.fromiter((d["digitizer_id"] for d in dec), np.int32, n)),
        pa.array(ts_us).view(pa.timestamp("us", tz="UTC")),
        pa.array(np.fromiter((m["period_number"] for m in md), np.int64, n)),
        pa.array(
            np.fromiter((m["protons_per_pulse"] for m in md), np.int32, n)
        ),
        pa.array(np.fromiter((bool(m["running"]) for m in md), bool, n)),
        pa.array(np.fromiter((m["frame_number"] for m in md), np.int64, n)),
        pa.array(np.fromiter((m["veto_flags"] for m in md), np.int32, n)),
        _list_col(
            [d["channel"] if d["channel"] is not None else () for d in dec],
            np.int32, pa.int32(),
        ),
        _list_col(
            [d["time"] if d["time"] is not None else () for d in dec],
            np.int64, pa.int64(),
        ),
        _list_col(
            [d["voltage"] if d["voltage"] is not None else () for d in dec],
            np.float64, pa.float64(),
        ),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def decode_dev2_messages(df: DataFrame) -> DataFrame:
    """dev2 payloads → one row per MESSAGE with SoA arrays — exactly the
    DIGITISER_MESSAGE_SCHEMA shape streaming frame assembly consumes, so a
    Kafka-envelope stream plugs straight into assemble_frames_stream.

    Arrow-native (``mapInArrow`` over ``dev2_arrow_batch``): per batch,
    the event vectors of all messages concatenate into ONE values buffer
    per column and the list columns are built with
    ``pa.ListArray.from_arrays`` — no per-event Python objects anywhere.
    The previous pandas build boxed every event through ``.tolist()``
    (~3 PyObjects/event), which dominated the kafka-wire front door's
    decode cost at the 32x500 shape (VERDICT r9 #3).  Timestamps are
    emitted as timestamp[us, UTC] (sessions here pin
    spark.sql.session.timeZone=UTC)."""
    from ..streaming.frame_assembly_stream import DIGITISER_MESSAGE_SCHEMA

    def proc(batches):
        for rb in batches:
            yield dev2_arrow_batch(rb.column(0))

    return dispatch(df, "dev2").select("value").mapInArrow(
        proc, DIGITISER_MESSAGE_SCHEMA
    )


def decode_aev2(df: DataFrame) -> DataFrame:
    """aev2 payloads → one grouped row per assembled frame."""

    def _ints(x) -> list:
        return [] if x is None else np.asarray(x).astype("int64").tolist()

    def rows(d: dict) -> list[dict]:
        return [
            {
                **_md_cols(d["metadata"]),
                "complete": d["complete"],
                "digitizers_present": _ints(d["digitizers_present"]),
                "channel": _ints(d["channel"]),
                "event_time": _ints(d["time"]),
                "event_voltage": _ints(d["voltage"]),
            }
        ]

    return _map_decoded(df, "aev2", AEV2_DECODED_SCHEMA, rows)


def decode_run_control(df: DataFrame) -> DataFrame:
    """pl72 + 6s4t payloads → a unified run-control stream (T4 input)."""

    def start_rows(d: dict) -> list[dict]:
        return [
            {
                "kind": "start",
                "run_name": d["run_name"],
                "time_ms": d["start_time_ms"],
                "filename": d["filename"],
                "instrument_name": d["instrument_name"],
                "n_periods": d["n_periods"],
                "job_id": d["job_id"],
            }
        ]

    def stop_rows(d: dict) -> list[dict]:
        return [
            {
                "kind": "stop",
                "run_name": d["run_name"],
                "time_ms": d["stop_time_ms"],
                "filename": None,
                "instrument_name": None,
                "n_periods": None,
                "job_id": d["job_id"],
            }
        ]

    starts = _map_decoded(df, "pl72", RUN_CONTROL_SCHEMA, start_rows)
    stops = _map_decoded(df, "6s4t", RUN_CONTROL_SCHEMA, stop_rows)
    return starts.unionByName(stops)


def run_control_events(df: DataFrame) -> DataFrame:
    """Decoded pl72/6s4t envelope rows → the CONTROL_SCHEMA shape the run
    lifecycle FSM consumes (streaming/run_lifecycle.py): kind, run_name,
    ts (epoch-ms widened to timestamp), instrument."""
    return decode_run_control(df).select(
        "kind",
        "run_name",
        F.timestamp_millis(F.col("time_ms")).alias("ts"),
        F.col("instrument_name").alias("instrument"),
    )


# f144 scalar families whose exact value survives in the value_int sidecar
_F144_INT_KINDS = frozenset(
    ["byte", "ubyte", "short", "ushort", "int", "uint", "long", "ulong"]
)


def decode_f144(df: DataFrame) -> DataFrame:
    """f144 payloads → RUNLOG_SCHEMA shape: union widened to DOUBLE + tag
    column (SURVEY §1.1 'widest type + tag'), plus a ``value_int`` BIGINT
    sidecar for the integer families so i64/u64 log values above 2^53 keep
    exact integer fidelity (schemas/ecs_f144_logdata.fbs:80-101 allows the
    full u64 range; the DOUBLE widening alone would silently round).  A
    ulong value >= 2^63 exceeds BIGINT and leaves the sidecar NULL — the
    DOUBLE approximation is then the only representation, as in the
    reference's f64 read path."""

    def rows(d: dict) -> list[dict]:
        vt = d["value_type"]
        is_array = vt.startswith("array")
        value_int = None
        if not is_array and vt in _F144_INT_KINDS:
            iv = int(d["value"])
            if -(2**63) <= iv < 2**63:
                value_int = iv
        return [
            {
                "source_name": d["source_name"],
                "ts": _ts_us(d["timestamp_ns"]),
                "value": None if is_array else float(d["value"]),
                "value_int": value_int,
                "value_type": vt,
                "value_array": [float(x) for x in d["value"]] if is_array else None,
            }
        ]

    return _map_decoded(df, "f144", F144_DECODED_SCHEMA, rows)


def decode_se00(df: DataFrame) -> DataFrame:
    def rows(d: dict) -> list[dict]:
        return [
            {
                "name": d["name"],
                "channel": d["channel"],
                "packet_ts": _ts_us(d["packet_timestamp_ns"]),
                "time_delta": d["time_delta_ns"],
                "timestamp_location": d["timestamp_location"],
                "values": [float(x) for x in d["values"]],
                "timestamps": None
                if d["timestamps"] is None
                else [int(x) for x in d["timestamps"]],
                "message_counter": d["message_counter"],
            }
        ]

    return _map_decoded(df, "se00", SE00_DECODED_SCHEMA, rows)


DF12_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("spectrum", T.IntegerType()),
        T.StructField("detector_id", T.IntegerType()),
        T.StructField("n_spectra", T.IntegerType()),
    ]
)


def decode_df12(df: DataFrame) -> DataFrame:
    """df12 detector-spectrum map payloads → long (spectrum, detector_id)
    rows (J4's broadcast lookup side; schemas/ecs_df12_det_spec_map.fbs)."""

    def rows(d: dict) -> list[dict]:
        n = int(d["n_spectra"])
        return [
            {"spectrum": int(s), "detector_id": int(det), "n_spectra": n}
            for s, det in zip(d["spectrum"], d["detector_id"])
        ]

    return _map_decoded(df, "df12", DF12_DECODED_SCHEMA, rows)


def decode_al00(df: DataFrame) -> DataFrame:
    def rows(d: dict) -> list[dict]:
        return [
            {
                "source_name": d["source_name"],
                "ts": _ts_us(d["timestamp_ns"]),
                "severity": d["severity"],
                "message": d["message"],
            }
        ]

    return _map_decoded(df, "al00", AL00_DECODED_SCHEMA, rows)


def decode_stream(df: DataFrame) -> dict[str, DataFrame]:
    """Route an envelope frame into every typed stream the pipeline consumes
    — the Spark restatement of per-topic handler dispatch
    (nexus-writer/src/main.rs:284-323).  Works on batch and streaming
    DataFrames alike (all operators here are stateless/narrow)."""
    env = with_identifier(df)
    return {
        "dat2": decode_dat2(env),
        "dev2": decode_dev2(env),
        "aev2": decode_aev2(env),
        "run_control": decode_run_control(env),
        "f144": decode_f144(env),
        "se00": decode_se00(env),
        "al00": decode_al00(env),
        "df12": decode_df12(env),
    }


def decode_errors(df: DataFrame) -> DataFrame:
    """Error-side output: envelope rows whose payload has no known
    identifier (P8 failure counters feed off this).

    SCOPE: this is the shallow (JVM-only) check — short buffers and unknown
    identifiers.  A payload with a KNOWN identifier but a corrupt body is
    dropped inside the decoders' warn-and-skip branch and does NOT appear
    here; use :func:`..operators.diagnostics.parse_failure_counters` (the
    deep variant that attempts the parse) to count those as
    ``parse_error``."""
    return with_identifier(df).filter(
        (F.length("value") < 8) | ~F.col("identifier").isin(*IDENTIFIERS)
    )
