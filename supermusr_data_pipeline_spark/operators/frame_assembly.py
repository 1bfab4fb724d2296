"""Frame assembly: dev2-shaped event rows → aev2-shaped frame event lists.

Batch form of the digitiser-aggregator (SURVEY.md §2.4 A1-A3, §3.2).  The
reference groups incoming per-digitiser event lists by FrameMetadata —
equality IGNORING veto_flags (streaming-types/src/frame_metadata.rs:57-73) —
rejects duplicate (frame, digitiser) messages
(digitiser-aggregator/src/frame/cache.rs:71-74), OR-accumulates veto flags
(frame/partial.rs:80-82), and marks a frame complete when the collected
digitiser-id set equals the expected list (frame/partial.rs:56-60).

In batch there is no TTL: completeness is purely the expected-id set
(SURVEY.md §7 hard part b); the streaming lift with
ProcessingTimeTimeout lives in streaming/frame_assembly_stream.py.

Scale notes: one shuffle on the frame key (unavoidable — it IS the
aggregation key); partial aggregation (map-side combine) applies to all
aggs used here.  Event vectors are concatenated ordered by
(digitizer_id, channel, event_time) — the reference is arrival-order; we
impose a deterministic sort (SURVEY.md §7 hard part e).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import FRAME_KEY_COLS


def assemble_frames(
    events: DataFrame,
    expected_digitizers: list[int],
    dedup_messages: bool = False,
) -> DataFrame:
    """Group dev2-shaped event rows into aev2-shaped frames.

    ``events``: DIGITISER_EVENT_SCHEMA-shaped long table.
    ``expected_digitizers``: the -d list the aggregator is launched with
    (digitiser-aggregator/src/main.rs).

    Returns one row per frame with sorted event arrays, ``complete``,
    ``digitizers_present`` and OR'd ``veto_flags``.
    """
    df = events
    if dedup_messages:
        # J5: a duplicate (frame, digitiser) *message* is rejected wholesale.
        # Long format ≙ keep only rows of the first message per key; without a
        # message id we approximate by exact-row dedup.
        df = df.dropDuplicates(
            [*FRAME_KEY_COLS, "digitizer_id", "channel", "event_time", "event_voltage"]
        )

    expected = F.array([F.lit(d) for d in sorted(expected_digitizers)])

    # deterministic event order within the frame: (digitizer_id, channel, time)
    ev = F.struct(
        F.col("digitizer_id"), F.col("channel"), F.col("event_time"), F.col("event_voltage")
    )
    grouped = df.groupBy(*FRAME_KEY_COLS).agg(
        F.sort_array(F.collect_list(ev)).alias("_events"),
        F.sort_array(F.collect_set("digitizer_id")).alias("digitizers_present"),
        F.bit_or("veto_flags").alias("veto_flags"),
        F.max("protons_per_pulse").alias("_ppp"),  # constant within frame
    )
    return grouped.select(
        "ts",
        "period_number",
        F.col("_ppp").alias("protons_per_pulse"),
        "running",
        "frame_number",
        "veto_flags",
        (F.col("digitizers_present") == expected).alias("complete"),
        "digitizers_present",
        F.col("_events.channel").alias("channel"),
        F.col("_events.event_time").alias("event_time"),
        F.col("_events.event_voltage").alias("event_voltage"),
    )


def assemble_frames_long(events: DataFrame, expected_digitizers: list[int]) -> DataFrame:
    """Frame assembly keeping events in long format (one row per event) with
    frame-level columns attached — the relational-friendly output used by the
    nexus sink.  Avoids materializing arrays when the next stage explodes
    them again.
    """
    expected = F.array([F.lit(d) for d in sorted(expected_digitizers)])
    frame_cols = F.struct(
        F.sort_array(F.collect_set("digitizer_id")).alias("digitizers_present"),
        F.bit_or("veto_flags").alias("veto_flags"),
        F.count("*").alias("n_events"),
    )
    frames = (
        events.groupBy(*FRAME_KEY_COLS)
        .agg(frame_cols.alias("f"))
        .select(
            *FRAME_KEY_COLS,
            F.col("f.digitizers_present").alias("digitizers_present"),
            F.col("f.veto_flags").alias("frame_veto_flags"),
            (F.col("f.digitizers_present") == expected).alias("complete"),
            F.col("f.n_events").alias("n_events"),
        )
    )
    return events.drop("veto_flags").join(frames, on=FRAME_KEY_COLS, how="inner")
