"""S4/S5 — the proprietary ``.traces`` binary file source.

Format (re-derived from trace-reader/src/loader.rs:10-296, reimplemented
from scratch): a little-endian header —

    prog_version: i32-length-prefixed utf8, run_descript: same,
    resolution: i32, number_of_channels: i32,
    channel_enabled: bool[nch], volts_scale_factor: f64[nch],
    channel_offset_volts: f64[nch], sample_time: f64,
    number_of_samples: i32, trigger_enabled: bool[nch],
    ex_trigger_enabled: bool, trigger_level: f64[nch],
    ex_trigger_level: f64, trigger_slope: i32[nch], ex_trigger_slope: i32

— followed by fixed-size trace events (count = (filesize − header) / event
size, loader.rs:192-213):

    cur_trace_event: i32, trace_event_runtime: f64,
    number_saved_traces: i32, saved_channels: bool[nch],
    trigger_time: f64, raw_trace: u16[nch][nsamples]  **big-endian**

Spark-first reading strategy: ``spark.read.format("binaryFile")`` ships each
file's bytes to an executor; a ``mapInPandas`` stage parses header + events
with ``np.frombuffer`` (vectorized, one memcpy per channel) and emits one
row per (event, channel) with the voltage vector as an array column — the
same long format the dat2 decode produces, so the detector pipeline
(operators.event_formation) composes directly.  Parsing is fully
distributed: N files → N input splits, no driver-side I/O.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRACE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("prog_version", T.StringType()),
        T.StructField("run_descript", T.StringType()),
        T.StructField("sample_time", T.DoubleType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("event_index", T.IntegerType()),
        T.StructField("cur_trace_event", T.IntegerType()),
        T.StructField("trace_event_runtime", T.DoubleType()),
        T.StructField("number_saved_traces", T.IntegerType()),
        T.StructField("trigger_time", T.DoubleType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("saved", T.BooleanType()),
        T.StructField("voltage", T.ArrayType(T.IntegerType())),
    ]
)


def write_trace_file(
    path: str,
    raw_traces: np.ndarray,
    sample_time: float = 1e-9,
    prog_version: str = "spark-traces-1",
    run_descript: str = "synthetic",
    trigger_times: np.ndarray | None = None,
) -> None:
    """Fixture writer: ``raw_traces`` is (n_events, n_channels, n_samples)
    uint16.  Produces a file byte-compatible with the reference layout."""
    ev, nch, ns = raw_traces.shape
    if trigger_times is None:
        trigger_times = np.zeros(ev, dtype=np.float64)
    with open(path, "wb") as f:
        for s in (prog_version, run_descript):
            b = s.encode("utf-8")
            f.write(struct.pack("<i", len(b)) + b)
        f.write(struct.pack("<ii", 16, nch))  # resolution, number_of_channels
        f.write(np.ones(nch, dtype=np.uint8).tobytes())  # channel_enabled
        f.write(np.ones(nch, dtype="<f8").tobytes())  # volts_scale_factor
        f.write(np.zeros(nch, dtype="<f8").tobytes())  # channel_offset_volts
        f.write(struct.pack("<d", sample_time))
        f.write(struct.pack("<i", ns))
        f.write(np.zeros(nch, dtype=np.uint8).tobytes())  # trigger_enabled
        f.write(struct.pack("<B", 0))  # ex_trigger_enabled
        f.write(np.zeros(nch, dtype="<f8").tobytes())  # trigger_level
        f.write(struct.pack("<d", 0.0))
        f.write(np.zeros(nch, dtype="<i4").tobytes())  # trigger_slope
        f.write(struct.pack("<i", 0))
        for i in range(ev):
            f.write(struct.pack("<i", i))  # cur_trace_event
            f.write(struct.pack("<d", float(i)))  # trace_event_runtime
            f.write(struct.pack("<i", nch))  # number_saved_traces
            f.write(np.ones(nch, dtype=np.uint8).tobytes())  # saved_channels
            f.write(struct.pack("<d", float(trigger_times[i])))
            f.write(raw_traces[i].astype(">u2").tobytes())  # big-endian!


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.off : self.off + n]
        if len(b) != n:
            raise ValueError(f"truncated .traces file at offset {self.off}")
        self.off += n
        return b

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.take(8))[0]

    def string(self) -> str:
        return self.take(self.i32()).decode("utf-8")


def parse_trace_file(path: str, content: bytes) -> Iterator[dict]:
    """Yield one dict per (event, channel).  Header scalars are attached to
    every row (they are tiny next to the voltage vector)."""
    c = _Cursor(content)
    prog_version = c.string()
    run_descript = c.string()
    c.i32()  # resolution
    nch = c.i32()
    c.take(nch)  # channel_enabled
    c.take(8 * nch)  # volts_scale_factor
    c.take(8 * nch)  # channel_offset_volts
    sample_time = c.f64()
    ns = c.i32()
    c.take(nch)  # trigger_enabled
    c.take(1)  # ex_trigger_enabled
    c.take(8 * nch)  # trigger_level
    c.take(8)  # ex_trigger_level
    c.take(4 * nch)  # trigger_slope
    c.take(4)  # ex_trigger_slope

    event_size = 4 + 8 + 4 + nch + 8 + 2 * nch * ns
    remaining = len(content) - c.off
    if remaining % event_size != 0:
        raise ValueError(
            f"{path}: {remaining} trailing bytes not a multiple of event size {event_size}"
        )
    n_events = remaining // event_size

    for idx in range(n_events):
        cur = c.i32()
        runtime = c.f64()
        n_saved = c.i32()
        saved = np.frombuffer(c.take(nch), dtype=np.uint8) != 0
        trig = c.f64()
        raw = np.frombuffer(c.take(2 * nch * ns), dtype=">u2").reshape(nch, ns)
        for ch in range(nch):
            yield {
                "path": path,
                "prog_version": prog_version,
                "run_descript": run_descript,
                "sample_time": sample_time,
                "n_channels": nch,
                "n_samples": ns,
                "n_events": n_events,
                "event_index": idx,
                "cur_trace_event": cur,
                "trace_event_runtime": runtime,
                "number_saved_traces": n_saved,
                "trigger_time": trig,
                "channel": ch,
                "saved": bool(saved[ch]),
                "voltage": raw[ch].astype(np.int32),
            }


def read_trace_files(spark: SparkSession, path: str) -> DataFrame:
    """Distributed ``.traces`` reader: binaryFile source + Arrow-batched
    parse.  One output row per (file, trace event, channel)."""
    binary = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_trace_file(p, bytes(content)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in TRACE_EVENT_SCHEMA.fields]
            )

    return binary.select("path", "content").mapInPandas(parse, TRACE_EVENT_SCHEMA)


def to_trace_table(
    traces: DataFrame,
    digitizer_id: int = 0,
    base_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Map parsed ``.traces`` rows onto the dat2 TRACE_SCHEMA long format so
    the detector pipeline (operators.event_formation.form_events) composes
    directly — the same wrapping trace-reader does when it dispatches file
    events as dat2 messages (trace-reader/src/processing.rs:24-54).  Frame
    metadata is synthesized deterministically: frame_number = event index,
    ts = base + trace_event_runtime."""
    return traces.select(
        F.lit(digitizer_id).cast("int").alias("digitizer_id"),
        (
            F.to_timestamp(F.lit(base_ts))
            + F.make_interval(secs=F.col("trace_event_runtime"))
        ).alias("ts"),
        F.lit(0).cast("bigint").alias("period_number"),
        F.lit(1).cast("int").alias("protons_per_pulse"),
        F.lit(True).alias("running"),
        F.col("event_index").cast("bigint").alias("frame_number"),
        F.lit(0).cast("int").alias("veto_flags"),
        F.round(F.lit(1.0) / F.col("sample_time")).cast("bigint").alias("sample_rate"),
        F.col("channel").cast("int").alias("channel"),
        "voltage",
    )


def select_trace_events(
    traces: DataFrame,
    num_trace_events: int,
    random_sample: bool = False,
    seed: int = 0,
) -> DataFrame:
    """S5 dispatch sampling (trace-reader/src/main.rs:72-85): either the
    first N event indices in order, or N uniform draws **with replacement**.

    With replacement is expressed as ``range(N)`` of draws equi-joined to
    the events on the drawn index — the draws side is tiny and broadcast,
    so the big traces relation never shuffles."""
    spark = traces.sparkSession
    if not random_sample:
        return traces.filter(F.col("event_index") < num_trace_events)
    draws = (
        spark.range(num_trace_events)
        .withColumnRenamed("id", "draw")
        .withColumn(
            "event_index",
            F.floor(F.rand(seed) * num_trace_events).cast("int"),
        )
        .select("draw", "event_index")
    )
    return traces.join(F.broadcast(draws), "event_index")


def to_dat2(
    traces: DataFrame, frame_number: int = 0, digitizer_id: int = 0
) -> DataFrame:
    """Wrap selected trace events as dat2-shaped rows
    (trace-reader/src/processing.rs:24-54): digitizer id + frame number +
    sample_rate = 1/sample_time, channels grouped back into an array of
    (channel, voltage) structs."""
    return (
        traces.groupBy("path", "event_index")
        .agg(
            F.first("sample_time").alias("sample_time"),
            F.sort_array(
                F.collect_list(F.struct("channel", "voltage"))
            ).alias("channels"),
        )
        .select(
            F.lit(digitizer_id).cast("smallint").alias("digitizer_id"),
            F.lit(frame_number).cast("bigint").alias("frame_number"),
            F.round(F.lit(1.0) / F.col("sample_time")).cast("bigint").alias("sample_rate"),
            "path",
            "event_index",
            "channels",
        )
    )
