"""Streaming gap-filled resampling — the q86 densification as a stateful
stream with TIMER-DRIVEN synthetic rows.

The batch q86 joins a generated grid; a stream has no grid to join — gap
rows must be INVENTED by state timers.  Per event type the state holds the
pending (unclosed) hour's aggregates plus the forward-fill value; an hour
is emitted when a LATER hour's event proves it complete, gap hours between
them are emitted immediately after it (carrying the filled value), and the
FINAL pending hour — which no later event will ever close — is flushed by
an event-time timeout when the watermark passes the end of that hour.
That timeout is the piece a join-based design cannot express: output that
exists because time passed, not because data arrived.

Semantics contract (pinned by tests/test_gap_fill_stream.py): on a tape
whose event times are non-decreasing per type and within the watermark,
the emitted rows equal q86's batch output row-for-row.  Late events
(event time before the pending hour) are dropped and counted nowhere —
the same trade the engine applies to any post-watermark straggler; the
lambda backfill for exact late-data accounting is batch q86 over the
day's tape (the near-dup reconcile pattern).

Scale shape: state per key is O(1) — five scalars, no buffered rows; one
shuffle on event_type; emission volume is the grid (hours x types),
independent of event volume.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_HOUR_MS = 3_600_000

_OUT_SCHEMA = (
    "event_type string, hour_us bigint, n_events int, "
    "filled_value double, is_gap boolean"
)
# pending_hour_ms, pending_n, pending_last_ts_ms, pending_last_event_id,
# pending_last_value, fill_value (last closed hour's carry)
_STATE_SCHEMA = (
    "ph bigint, pn bigint, plts bigint, pleid bigint, plv double, fv double"
)


def _gap_fill_fn(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    etype = key[0]
    got = state.getOption
    if got is not None:
        ph, pn, plts, pleid, plv, fv = got
        have = True
    else:
        ph = pn = plts = pleid = 0
        plv = fv = 0.0
        have = False

    out = []

    def close_pending(next_hour_ms):
        """Emit the pending hour, then gap rows up to (excl.) next_hour_ms."""
        nonlocal ph, pn, plv, fv, have
        out.append((etype, ph * 1000, int(pn), round(plv, 6), False))
        fv = plv
        if next_hour_ms is not None:
            g = ph + _HOUR_MS
            while g < next_hour_ms:
                out.append((etype, g * 1000, 0, round(fv, 6), True))
                g += _HOUR_MS

    if state.hasTimedOut:
        if have:
            close_pending(None)
            state.remove()
        if out:
            yield pd.DataFrame(
                out, columns=["event_type", "hour_us", "n_events",
                              "filled_value", "is_gap"]
            )
        return

    rows = []
    for pdf in pdfs:
        rows.extend(pdf.itertuples(index=False))
    rows.sort(key=lambda r: (r.ts_ms, r.event_id))
    for r in rows:
        ts_ms, eid, val = int(r.ts_ms), int(r.event_id), float(r.value)
        h = (ts_ms // _HOUR_MS) * _HOUR_MS
        if not have:
            ph, pn, plts, pleid, plv = h, 0, -1, -1, 0.0
            have = True
        if h < ph:
            continue  # late beyond the pending hour: dropped (documented)
        if h > ph:
            close_pending(h)
            ph, pn, plts, pleid, plv = h, 0, -1, -1, 0.0
        pn += 1
        if (ts_ms, eid) > (plts, pleid):
            plts, pleid, plv = ts_ms, eid, val

    state.update((ph, pn, plts, pleid, plv, fv))
    # flush the pending hour once the watermark passes its end (timeout
    # must sit strictly ahead of the current watermark or the engine
    # rejects it — a straggler batch can arrive with wm already past)
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(ph + _HOUR_MS, wm + 1))
    if out:
        yield pd.DataFrame(
            out, columns=["event_type", "hour_us", "n_events",
                          "filled_value", "is_gap"]
        )


def gap_fill_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Hourly gap-filled resampling over a streaming events source.

    ``events`` needs (event_id, ``ts_col``, event_type, value).  Returns
    q86's row shape (event_type, hour_us, n_events, filled_value, is_gap)
    in append mode; see the module docstring for the emission contract."""
    prepared = (
        events.withWatermark(ts_col, watermark)
        .select(
            "event_type",
            "event_id",
            "value",
            F.col(ts_col),
            (F.col(ts_col).cast("double") * 1000).cast("bigint").alias("ts_ms"),
        )
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        _gap_fill_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
