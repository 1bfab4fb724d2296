"""Streaming frame assembly: dev2 messages → aev2 frames with TTL.

The streaming lift of ``operators/frame_assembly.py`` — the reference's
digitiser-aggregator (SURVEY.md §2.4 A1-A3, §2.8 T1-T3, §3.2):

- messages group by FrameMetadata with equality IGNORING veto_flags
  (streaming-types/src/frame_metadata.rs:57-73) — here the grouping key of
  ``applyInPandasWithState``;
- a partial frame expires ``frame_ttl_ms`` after its FIRST message arrives
  (processing time, default 500 ms — digitiser-aggregator/src/main.rs:110-113)
  and is dispatched incomplete (frame/partial.rs:30-40,92-94) —
  ``GroupStateTimeout.ProcessingTimeTimeout``;
- a duplicate (frame, digitiser) message is rejected wholesale
  (frame/cache.rs:71-74);
- veto flags OR-accumulate across contributing messages (frame/partial.rs:80-82);
- the frame dispatches immediately once the collected digitiser-id set equals
  the expected list (frame/partial.rs:56-60).

Scale notes: state is per-frame and bounded — a frame holds ≤ (digitisers ×
events/frame) events and lives ≤ TTL, so the state store stays at
(frames-in-flight × frame size) regardless of stream length.  The input
shuffle is on the frame key, the same partitioning the batch operator uses.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import FRAME_EVENT_LIST_SCHEMA, FRAME_KEY_COLS

# dev2 message shape: one row per (frame, digitiser) with SoA arrays — the
# exact FlatBuffers layout (schemas/dev2_digitizer_event_v2.fbs:24-34)
DIGITISER_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("digitizer_id", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("period_number", T.LongType(), False),
        T.StructField("protons_per_pulse", T.IntegerType(), False),
        T.StructField("running", T.BooleanType(), False),
        T.StructField("frame_number", T.LongType(), False),
        T.StructField("veto_flags", T.IntegerType(), False),
        T.StructField("channel", T.ArrayType(T.IntegerType()), False),
        T.StructField("event_time", T.ArrayType(T.LongType()), False),
        T.StructField("event_voltage", T.ArrayType(T.DoubleType()), False),
    ]
)

# keyed state: per-event parallel arrays (with the source digitiser retained
# for the deterministic emit sort) + contributor set + OR'd veto flags
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("dids", T.ArrayType(T.IntegerType())),
        T.StructField("ev_did", T.ArrayType(T.IntegerType())),
        T.StructField("ev_channel", T.ArrayType(T.IntegerType())),
        T.StructField("ev_time", T.ArrayType(T.LongType())),
        T.StructField("ev_voltage", T.ArrayType(T.DoubleType())),
        T.StructField("veto", T.IntegerType()),
        # processing-time ms of the FIRST message — the TTL anchors here
        # (frame/partial.rs:30-40), not at the latest update, so the timeout
        # is re-armed relative to it on every call
        T.StructField("first_ms", T.LongType()),
        # tombstone: frame already dispatched; late messages for the key are
        # rejected instead of re-opening it (frame/cache.rs:55-63 — "reject
        # messages at or before the last dispatched frame timestamp"; here
        # per-key, which is the bounded-state streaming equivalent)
        T.StructField("dispatched", T.BooleanType()),
    ]
)


def events_long_to_messages(events: DataFrame) -> DataFrame:
    """Fold a dev2 long-format event table (DIGITISER_EVENT_SCHEMA) into
    message shape — the inverse of the explode the batch path applies."""
    ev = F.struct("channel", "event_time", "event_voltage")
    return (
        events.groupBy("digitizer_id", *FRAME_KEY_COLS)
        .agg(
            F.max("veto_flags").alias("veto_flags"),  # constant per message
            F.sort_array(F.collect_list(ev)).alias("_e"),
        )
        .select(
            "digitizer_id",
            *FRAME_KEY_COLS,
            "veto_flags",
            F.col("_e.channel").alias("channel"),
            F.col("_e.event_time").alias("event_time"),
            F.col("_e.event_voltage").alias("event_voltage"),
        )
    )


def _emit_frame(
    key: tuple[Any, ...], dids, ev_did, ev_ch, ev_t, ev_v, veto: int, expected: list[int]
) -> pd.DataFrame:
    """Build the one-row aev2 frame, events sorted by (did, channel, time) —
    the deterministic stand-in for the reference's arrival order
    (SURVEY.md §7 hard part e).  Event columns stay numpy end-to-end (the
    Arrow serializer takes ndarray cells directly); at 500 events/message
    the per-element ``.tolist()`` round-trip was the FSM's hottest line."""
    ts, period_number, ppp, running, frame_number = key
    did = np.asarray(ev_did, dtype=np.int64)
    ch = np.asarray(ev_ch, dtype=np.int64)
    et = np.asarray(ev_t, dtype=np.int64)
    ev = np.asarray(ev_v, dtype=np.float64)
    order = np.lexsort((et, ch, did))
    present = sorted(set(int(d) for d in dids))
    return pd.DataFrame(
        {
            "ts": [ts],
            "period_number": [period_number],
            "protons_per_pulse": [ppp],
            "running": [running],
            "frame_number": [frame_number],
            "veto_flags": [veto],
            "complete": [present == expected],
            "digitizers_present": [present],
            "channel": [ch[order]],
            "event_time": [et[order]],
            "event_voltage": [ev[order]],
        }
    )


def make_update_fn(
    expected_digitizers: list[int],
    frame_ttl_ms: int = 500,
    tombstone_ttl_ms: int = 2000,
):
    """Build the per-key FSM callable for ``applyInPandasWithState``.

    Module-level factory so the FSM is directly property-testable against
    the batch operator with a fake GroupState (tests/test_frame_fsm.py)."""
    expected = sorted(int(d) for d in expected_digitizers)
    _tombstone = ([], [], [], [], [], 0, 0, True)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            dids, ev_did, ev_ch, ev_t, ev_v, veto, _first, dispatched = state.get
            if dispatched:
                state.remove()  # tombstone expired quietly
                return
            # TTL dispatch of an incomplete frame; leave a tombstone behind
            state.update(_tombstone)
            state.setTimeoutDuration(tombstone_ttl_ms)
            yield _emit_frame(key, dids, ev_did, ev_ch, ev_t, ev_v, veto, expected)
            return

        now_ms = state.getCurrentProcessingTimeMs()
        if state.exists:
            dids, s_did, s_ch, s_t, s_v, veto, first_ms, dispatched = state.get
            if dispatched:
                # late message after dispatch: reject, keep tombstone armed
                state.setTimeoutDuration(tombstone_ttl_ms)
                return
            dids = [int(d) for d in dids]
            # per-message event chunks, concatenated once per invocation —
            # numpy end-to-end; per-element Python conversion at 500
            # events/message was the throughput bottleneck (bench_streaming)
            chunks = [
                (
                    np.asarray(s_did, dtype=np.int64),
                    np.asarray(s_ch, dtype=np.int64),
                    np.asarray(s_t, dtype=np.int64),
                    np.asarray(s_v, dtype=np.float64),
                )
            ]
        else:
            dids, veto, chunks = [], 0, []
            first_ms = now_ms

        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                d = int(row.digitizer_id)
                if d in dids:
                    continue  # duplicate (frame, digitiser) message: reject (J5/T6)
                dids.append(d)
                veto |= int(row.veto_flags)
                ch = np.asarray(row.channel, dtype=np.int64)
                chunks.append(
                    (
                        np.full(ch.size, d, dtype=np.int64),
                        ch,
                        np.asarray(row.event_time, dtype=np.int64),
                        np.asarray(row.event_voltage, dtype=np.float64),
                    )
                )

        if chunks:
            ev_did, ev_ch, ev_t, ev_v = (
                np.concatenate([c[i] for c in chunks]) for i in range(4)
            )
        else:
            ev_did = ev_ch = ev_t = np.array([], dtype=np.int64)
            ev_v = np.array([], dtype=np.float64)

        if sorted(dids) == expected:
            # dispatch complete frame now (frame/cache.rs:121-142), tombstone it
            state.update(_tombstone)
            state.setTimeoutDuration(tombstone_ttl_ms)
            yield _emit_frame(key, dids, ev_did, ev_ch, ev_t, ev_v, veto, expected)
        else:
            state.update(
                (dids, ev_did.tolist(), ev_ch.tolist(), ev_t.tolist(),
                 ev_v.tolist(), veto, first_ms, False)
            )
            # Spark resets the timeout on every call for the key; re-arm it
            # relative to the stored first arrival so the deadline is fixed
            state.setTimeoutDuration(max(1, first_ms + frame_ttl_ms - now_ms))

    return update


def assemble_frames_stream(
    messages: DataFrame,
    expected_digitizers: list[int],
    frame_ttl_ms: int = 500,
    tombstone_ttl_ms: int = 2000,
) -> DataFrame:
    """dev2 message stream → aev2 frame stream (FRAME_EVENT_LIST_SCHEMA +
    veto_flags), emitting on completeness or processing-time TTL.

    After a frame dispatches (complete or expired) its key keeps a tombstone
    for ``tombstone_ttl_ms``: straggler messages for the same frame are
    rejected instead of re-opening it and eventually emitting a second,
    incomplete frame row — the reference's late-message-rejection-after-
    dispatch (frame/cache.rs:55-63, tested at cache.rs:156-387).  The
    tombstone mirrors the nexus-writer's 2 s run TTL grace
    (nexus-writer/src/main.rs:109-111) and carries no event data, so
    dispatched-frame state is O(1) per key and self-expires."""
    out_schema = T.StructType(FRAME_EVENT_LIST_SCHEMA.fields[:])
    return (
        messages.groupBy(*FRAME_KEY_COLS)
        .applyInPandasWithState(
            make_update_fn(expected_digitizers, frame_ttl_ms, tombstone_ttl_ms),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
