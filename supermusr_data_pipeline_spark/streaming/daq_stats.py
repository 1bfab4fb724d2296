"""DAQ observability aggregations (SURVEY.md §2.4 A7/A8, §2.1 S8).

The reference's diagnostics TUI keeps per-digitiser running stats — message
count, first/last timestamp, latest frame number, per-message channel count,
sample count, all-channels-equal-length check, and a message rate over a
sliding interval (diagnostics/src/daq_trace/mod.rs:151-168,216-277).

Spark restatement: event-time tumbling-window aggregation with a watermark
(streaming) — the same expression compiles to a plain groupBy in batch, so
both share ``_stats_aggs``.  Everything is partial-aggregatable: the stream
state per (digitiser, window) is one row of counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stats_aggs() -> list:
    return [
        F.count("*").alias("n_msgs"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.max("frame_number").alias("last_frame"),
        F.sum("n_events").alias("n_events"),
        F.bool_and("msg_consistent").alias("arrays_consistent"),
    ]


def _msg_features(messages: DataFrame) -> DataFrame:
    """A8 per-message sanity features over the dev2 message arrays."""
    return messages.select(
        "digitizer_id",
        "ts",
        "frame_number",
        F.size("event_time").alias("n_events"),
        # SoA parallel arrays must agree in length WITHIN each message
        (
            F.least(F.size("channel"), F.size("event_time"), F.size("event_voltage"))
            == F.greatest(F.size("channel"), F.size("event_time"), F.size("event_voltage"))
        ).alias("msg_consistent"),
    )


def daq_stats_batch(messages: DataFrame, window: str = "1 minute") -> DataFrame:
    """Batch form: per (digitiser, tumbling window) counters + SoA-parallel
    length check (arrays must stay equal length, daq_trace/mod.rs:222-237)."""
    f = _msg_features(messages)
    return (
        f.groupBy("digitizer_id", F.window("ts", window).alias("win"))
        .agg(*_stats_aggs())
        .select(
            "digitizer_id",
            F.col("win.start").alias("window_start"),
            "n_msgs",
            "first_ts",
            "last_ts",
            "last_frame",
            "n_events",
            "arrays_consistent",
            # msg rate over the window (msgs/s) — daq_trace/mod.rs:252-277
            (
                F.col("n_msgs")
                / (F.unix_timestamp("win.end") - F.unix_timestamp("win.start")).cast("double")
            ).alias("msg_rate"),
        )
    )


def daq_stats_stream(
    messages: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Streaming form: same aggregation under an event-time watermark — late
    messages beyond the watermark are dropped (T3 late-data policy analog)."""
    f = _msg_features(messages).withWatermark("ts", watermark)
    return (
        f.groupBy("digitizer_id", F.window("ts", window).alias("win"))
        .agg(*_stats_aggs())
        .select(
            "digitizer_id",
            F.col("win.start").alias("window_start"),
            "n_msgs",
            "first_ts",
            "last_ts",
            "last_frame",
            "n_events",
            "arrays_consistent",
        )
    )
