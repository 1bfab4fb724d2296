"""Frame assembly on ``transformWithStateInPandas`` — the Spark 4.x
stateful-processor API — as an A/B alternative to
``frame_assembly_stream.assemble_frames_stream``
(applyInPandasWithState).

Semantics are identical to the legacy operator (same reference
citations — digitiser-aggregator frame/partial.rs, frame/cache.rs):
group by FrameMetadata ignoring veto_flags, reject duplicate
(frame, digitiser) messages, OR-accumulate veto flags, dispatch on
completeness, dispatch incomplete on a processing-time TTL anchored at
the FIRST message's arrival, and leave a tombstone that rejects
stragglers until it self-expires.  The stream/batch parity suite runs
both operators against the same tapes (tests/test_frame_tws.py).

Why the API matters for latency (VERDICT r7 #1): applyInPandasWithState
re-arms its per-key timeout on EVERY invocation — the engine pays a
timeout-bookkeeping pass per batch (~0.23 s measured on this topology)
and the FSM must re-derive the deadline from stored state.  The
transformWithState timer model is absolute: the TTL timer is registered
once at first arrival and either fires or is deleted at dispatch, and
the tombstone lifetime is likewise one absolute timer.  State lives in
a typed ValueState row (same columns as the legacy state struct, minus
the first-arrival ms the re-arm dance needed, plus the registered
expiry so dispatch can delete the exact timer).

Engine requirement: transformWithState runs only on the RocksDB state
store provider (streaming/state_store.rocksdb_state_conf) — which is
the 100 TB-posture store anyway (off-heap state, changelog
checkpointing).

A/B VERDICT (round 8, tools/ab_fsm_bench.py, 32 dig x 500 ev x 1500
frames paced at 50 fps, four soaks in ONE SparkSession): NOT adopted.
Steady-state commit-latency p50 — apply@RocksDB 4.27/5.41 s (two runs,
avg 4.84), tws@RocksDB 5.59 s (+0.75 s), apply@HDFS 4.24 s; per-batch
FSM phase 2.22 s (tws) vs 1.29-1.54 s (apply).  The absolute-timer
model does save the per-batch timeout re-arm, but transformWithState
serves every per-key state get/update over the state-server socket
(protobuf request per op) where applyInPandasWithState streams state
in-band with the Arrow data batches — at 150+ keys/batch the round
trips dominate.  Caveat recorded: this container runs the state
protocol on a pure-Python protobuf runtime (tools/pyshims), so the tws
numbers are an upper bound; the engine-side trigger time (4.55 s vs
3.0-3.2 s) was also worse, so the direction is not an artifact of the
shim alone.  The operator and its parity suite (tests/test_frame_tws.py)
stay in-repo as the maintained alternative; production remains
applyInPandasWithState (frame_assembly_stream).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from ..schemas import FRAME_EVENT_LIST_SCHEMA, FRAME_KEY_COLS
from .frame_assembly_stream import _emit_frame

# per-key value state: the legacy state struct with `first_ms` replaced
# by `timer_ms` (the absolute expiry registered for this key, so a
# dispatch can deleteTimer the exact pending deadline)
_TWS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("dids", T.ArrayType(T.IntegerType())),
        T.StructField("ev_did", T.ArrayType(T.IntegerType())),
        T.StructField("ev_channel", T.ArrayType(T.IntegerType())),
        T.StructField("ev_time", T.ArrayType(T.LongType())),
        T.StructField("ev_voltage", T.ArrayType(T.DoubleType())),
        T.StructField("veto", T.IntegerType()),
        T.StructField("timer_ms", T.LongType()),
        T.StructField("dispatched", T.BooleanType()),
    ]
)


class FrameAssemblyProcessor(StatefulProcessor):
    """The dev2→aev2 frame FSM as a StatefulProcessor.  One ValueState
    row per in-flight frame, one absolute timer per key (TTL while
    collecting, tombstone lifetime after dispatch)."""

    def __init__(
        self,
        expected_digitizers: list[int],
        frame_ttl_ms: int = 500,
        tombstone_ttl_ms: int = 2000,
    ) -> None:
        self._expected = sorted(int(d) for d in expected_digitizers)
        self._frame_ttl_ms = int(frame_ttl_ms)
        self._tombstone_ttl_ms = int(tombstone_ttl_ms)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("frame", _TWS_STATE_SCHEMA)

    def _tombstone(self, now_ms: int) -> None:
        expiry = now_ms + self._tombstone_ttl_ms
        self._state.update(([], [], [], [], [], 0, expiry, True))
        self._handle.registerTimer(expiry)

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        cur = self._state.get() if self._state.exists() else None
        if cur is not None:
            dids, s_did, s_ch, s_t, s_v, veto, timer_ms, dispatched = cur
            if dispatched:
                # late message after dispatch: reject, tombstone stays armed
                return
            dids = [int(d) for d in dids]
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
            # first arrival: ONE absolute TTL timer, never re-armed —
            # the deadline is fixed at first arrival by construction
            timer_ms = now_ms + self._frame_ttl_ms
            self._handle.registerTimer(timer_ms)

        for pdf in rows:
            for row in pdf.itertuples(index=False):
                d = int(row.digitizer_id)
                if d in dids:
                    continue  # duplicate (frame, digitiser): reject (J5/T6)
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

        if sorted(dids) == self._expected:
            # complete: retire the pending TTL timer, dispatch, tombstone
            self._handle.deleteTimer(timer_ms)
            self._tombstone(now_ms)
            yield _emit_frame(
                key, dids, ev_did, ev_ch, ev_t, ev_v, veto, self._expected
            )
        else:
            self._state.update(
                (dids, ev_did.tolist(), ev_ch.tolist(), ev_t.tolist(),
                 ev_v.tolist(), veto, timer_ms, False)
            )

    def handleExpiredTimer(
        self,
        key: tuple[Any, ...],
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        cur = self._state.get() if self._state.exists() else None
        if cur is None:
            return
        dids, ev_did, ev_ch, ev_t, ev_v, veto, _timer_ms, dispatched = cur
        if dispatched:
            self._state.clear()  # tombstone expired quietly
            return
        # frame TTL: dispatch incomplete, leave a tombstone behind
        self._tombstone(timerValues.getCurrentProcessingTimeInMs())
        yield _emit_frame(
            key, dids, ev_did, ev_ch, ev_t, ev_v, veto, self._expected
        )

    def close(self) -> None:
        pass


def assemble_frames_stream_tws(
    messages: DataFrame,
    expected_digitizers: list[int],
    frame_ttl_ms: int = 500,
    tombstone_ttl_ms: int = 2000,
) -> DataFrame:
    """dev2 message stream → aev2 frame stream, semantics identical to
    ``assemble_frames_stream`` but executed by transformWithStateInPandas.
    Requires the RocksDB state store provider on the session."""
    out_schema = T.StructType(FRAME_EVENT_LIST_SCHEMA.fields[:])
    return (
        messages.groupBy(*FRAME_KEY_COLS)
        .transformWithStateInPandas(
            FrameAssemblyProcessor(
                expected_digitizers, frame_ttl_ms, tombstone_ttl_ms
            ),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="ProcessingTime",
        )
    )
