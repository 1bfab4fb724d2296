"""Static schemas for the pipeline's message/table shapes.

The reference uses compiled FlatBuffers schemas — no inference anywhere
(SURVEY.md §1.2).  We mirror that with fixed StructTypes.  Unsigned ints
widen one step (u8→INT, u16→INT, u32→BIGINT, u64→BIGINT); GpsTime →
TimestampType; vectors → ArrayType.

Reference citations:
- dat2 trace:      schemas/dat2_digitizer_analog_trace_v2.fbs:5-19
- dev2 event list: schemas/dev2_digitizer_event_v2.fbs:24-34
- aev2 frame:      schemas/aev2_frame_assembled_event_v2.fbs:39-50
- frame metadata:  schemas/frame_metadata_v2.fbs:53-73
- run start/stop:  schemas/ecs_pl72_run_start.fbs:14-33, ecs_6s4t_run_stop.fbs:45-53
- f144/se00/al00:  schemas/ecs_f144_logdata.fbs, ecs_se00_data.fbs, ecs_al00_alarm.fbs
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Frame metadata (the grouping key for frame assembly).
# Equality for grouping IGNORES veto_flags (streaming-types/src/frame_metadata.rs:57-73);
# veto_flags is instead OR-aggregated (digitiser-aggregator/src/frame/partial.rs:80-82).
# ---------------------------------------------------------------------------

FRAME_METADATA_FIELDS = [
    T.StructField("ts", T.TimestampType(), False),  # GpsTime → UTC
    T.StructField("period_number", T.LongType(), False),  # u64
    T.StructField("protons_per_pulse", T.IntegerType(), False),  # u8
    T.StructField("running", T.BooleanType(), False),
    T.StructField("frame_number", T.LongType(), False),  # u32
    T.StructField("veto_flags", T.IntegerType(), False),  # u16 bitmask
]

# columns that form the frame-assembly grouping key (no veto_flags)
FRAME_KEY_COLS = ["ts", "period_number", "protons_per_pulse", "running", "frame_number"]

# ---------------------------------------------------------------------------
# dat2 — digitiser analog trace, long format: one row per (frame, digitiser,
# channel).  The reference message nests channels [ChannelTrace{channel,
# voltage:[u16]}]; we keep long format so channel-level parallelism is plain
# partition parallelism (the reference fans out with rayon,
# trace-to-events/src/processing.rs:33-56).
# ---------------------------------------------------------------------------

TRACE_SCHEMA = T.StructType(
    [
        T.StructField("digitizer_id", T.IntegerType(), False),  # u8
        *FRAME_METADATA_FIELDS,
        T.StructField("sample_rate", T.LongType(), False),  # u64, Hz
        T.StructField("channel", T.IntegerType(), False),  # u32
        T.StructField("voltage", T.ArrayType(T.IntegerType()), False),  # [u16]
    ]
)

# ---------------------------------------------------------------------------
# dev2 — digitiser event list, long format: one row per detected event.
# The reference keeps parallel SoA vectors time/voltage/channel
# (dev2_digitizer_event_v2.fbs:24-34); exploded long format lets relational
# ops (joins/aggs) run JVM-side.
# ---------------------------------------------------------------------------

DIGITISER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("digitizer_id", T.IntegerType(), False),
        *FRAME_METADATA_FIELDS,
        T.StructField("channel", T.IntegerType(), False),
        T.StructField("event_time", T.LongType(), False),  # u32 ns since frame start
        T.StructField("event_voltage", T.DoubleType(), False),  # pulse height (Real=f64)
    ]
)

# ---------------------------------------------------------------------------
# aev2 — frame-assembled event list (grouped form).
# ---------------------------------------------------------------------------

FRAME_EVENT_LIST_SCHEMA = T.StructType(
    [
        *[f for f in FRAME_METADATA_FIELDS],
        T.StructField("complete", T.BooleanType(), False),
        T.StructField("digitizers_present", T.ArrayType(T.IntegerType()), False),
        T.StructField("channel", T.ArrayType(T.IntegerType()), False),
        T.StructField("event_time", T.ArrayType(T.LongType()), False),
        T.StructField("event_voltage", T.ArrayType(T.DoubleType()), False),
    ]
)

# ---------------------------------------------------------------------------
# Runs (pl72 RunStart + 6s4t RunStop folded into an interval table,
# nexus-writer/src/run_engine/run/run_parameters.rs:40-51).
# collect_until is NULL while the run is open (run_parameters.rs:164-175).
# ---------------------------------------------------------------------------

RUN_SCHEMA = T.StructType(
    [
        T.StructField("run_name", T.StringType(), False),
        T.StructField("filename", T.StringType(), True),
        T.StructField("instrument_name", T.StringType(), True),
        T.StructField("collect_from", T.TimestampType(), False),
        T.StructField("collect_until", T.TimestampType(), True),
        T.StructField("n_periods", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Logs: f144 runlog (typed union → value + value_type tag, SURVEY.md §1.1),
# se00 sample-environment, al00 alarms.
# ---------------------------------------------------------------------------

RUNLOG_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("value_type", T.StringType(), False),
        T.StructField("value_array", T.ArrayType(T.DoubleType()), True),
    ]
)

SELOG_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("channel", T.IntegerType(), True),
        T.StructField("packet_ts", T.TimestampType(), False),
        T.StructField("time_delta", T.DoubleType(), True),  # ns between samples
        T.StructField("timestamp_location", T.StringType(), True),
        T.StructField("values", T.ArrayType(T.DoubleType()), False),
        T.StructField("timestamps", T.ArrayType(T.LongType()), True),  # explicit ns epochs
        T.StructField("message_counter", T.LongType(), True),
    ]
)

ALARM_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("severity", T.StringType(), False),  # OK/MINOR/MAJOR/INVALID
        T.StructField("message", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Nexus sink output layout (nexus-writer/src/nexus_structure/entry/event_data.rs:20-63):
# per-event rows carrying the per-frame index columns the HDF5 file stores as
# parallel datasets (event_index, event_time_zero).
# ---------------------------------------------------------------------------

NEXUS_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("run_name", T.StringType(), False),
        T.StructField("frame_seq", T.LongType(), False),
        T.StructField("event_time_zero", T.LongType(), False),  # ns rel. collect_from
        T.StructField("event_index", T.LongType(), False),  # running event count
        T.StructField("period_number", T.LongType(), False),
        T.StructField("frame_number", T.LongType(), False),
        T.StructField("frame_complete", T.BooleanType(), False),
        T.StructField("running", T.BooleanType(), False),
        T.StructField("veto_flags", T.IntegerType(), False),
        T.StructField("event_time_offset", T.LongType(), True),  # u32 ns
        T.StructField("event_id", T.IntegerType(), True),  # channel
        T.StructField("pulse_height", T.DoubleType(), True),
    ]
)

# Driver-provided analytics tables (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
