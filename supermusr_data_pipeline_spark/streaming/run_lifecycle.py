"""Run lifecycle FSM (SURVEY.md §2.8 T4): RunStart/RunStop → run intervals.

Reference behavior (nexus-writer/src/run_engine/engine.rs:194-212,296-326;
run_parameters.rs:94-148):

- RunStart(run_name, ts) opens a run with ``collect_from = ts``; if another
  run is still open, the new start ABORTS it (its collect_until becomes the
  aborting start's ts, with a warning in the file);
- RunStop(run_name, ts) closes the matching open run (``collect_until = ts``);
  a stop must be > start, and double-stops / stops without a start are
  rejected;
- a run with no stop stays open (collect_until NULL).

``runs_from_control`` is the batch fold — pure window functions, fully
SQL-expressible (the q30 oracle checks it).  ``run_lifecycle_stream`` is the
streaming lift: global FSM state via applyInPandasWithState over a
single-group control stream (control traffic is a few messages per hour —
one group is not a bottleneck; the DATA path never routes through it).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

# control message shape (pl72 RunStart / 6s4t RunStop essentials)
CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'start' | 'stop'
        T.StructField("run_name", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("instrument_name", T.StringType(), True),
    ]
)

RUN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("run_name", T.StringType(), False),
        T.StructField("collect_from", T.TimestampType(), False),
        T.StructField("collect_until", T.TimestampType(), True),
        T.StructField("aborted", T.BooleanType(), False),
    ]
)


def runs_from_control(control: DataFrame) -> DataFrame:
    """Fold a control-message table into the runs interval table.

    Every 'start' opens a run; it closes at the FIRST later control message
    that is either its own 'stop' or any other 'start' (abort).  Stops
    without a matching open run are ignored (engine.rs:296-326 rejects
    them).  Pure window functions — one shuffle on the (tiny) control
    stream, never on data.
    """
    starts = control.filter(F.col("kind") == "start").select(
        "run_name", F.col("ts").alias("collect_from")
    )
    # for each start: next start ts (any run) and own stop ts
    next_start = (
        F.lead("collect_from")
        .over(Window.orderBy("collect_from", "run_name"))
    )
    starts = starts.withColumn("next_start", next_start)
    stops = control.filter(F.col("kind") == "stop").select(
        F.col("run_name").alias("s_run_name"), F.col("ts").alias("stop_ts")
    )
    j = starts.join(
        F.broadcast(stops),
        (starts.run_name == stops.s_run_name)
        & (stops.stop_ts > starts.collect_from)
        & (starts.next_start.isNull() | (stops.stop_ts <= starts.next_start)),
        "left",
    )
    # earliest qualifying stop per start (double stops collapse here)
    agg = j.groupBy("run_name", "collect_from", "next_start").agg(
        F.min("stop_ts").alias("stop_ts")
    )
    return agg.select(
        "run_name",
        "collect_from",
        F.coalesce("stop_ts", "next_start").alias("collect_until"),
        (F.col("stop_ts").isNull() & F.col("next_start").isNotNull()).alias("aborted"),
    )


def run_lifecycle_stream(control: DataFrame, run_ttl_ms: int = 2000) -> DataFrame:
    """Streaming T4: emit a run row when it closes (stop or abort); an open
    run is flushed ``run_ttl_ms`` after its last control activity if the
    stream goes quiet (the writer's run-TTL grace, nexus-writer/src/
    main.rs:109-111).  State = the single open run (the reference keeps at
    most one active acquisition per instrument)."""

    _STATE = T.StructType(
        [
            T.StructField("run_name", T.StringType()),
            T.StructField("from_us", T.LongType()),
        ]
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(name, from_us, until_us, aborted):
            return pd.DataFrame(
                {
                    "run_name": [name],
                    "collect_from": [pd.Timestamp(from_us, unit="us")],
                    "collect_until": [
                        pd.Timestamp(until_us, unit="us") if until_us is not None else pd.NaT
                    ],
                    "aborted": [aborted],
                }
            )

        if state.hasTimedOut:
            name, from_us = state.get
            state.remove()
            yield row(name, from_us, None, False)  # still-open run flushed
            return

        open_run = state.get if state.exists else None
        msgs = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                msgs.append((r.ts, r.kind, r.run_name))
        msgs.sort(key=lambda m: m[0])

        for ts, kind, name in msgs:
            us = int(pd.Timestamp(ts).value // 1000)
            if kind == "start":
                if open_run is not None:
                    # abort unstopped predecessor (engine.rs:194-212)
                    yield row(open_run[0], open_run[1], us, True)
                open_run = (name, us)
            elif kind == "stop":
                if open_run is not None and open_run[0] == name and us > open_run[1]:
                    yield row(name, open_run[1], us, False)
                    open_run = None
                # else: stop without open run / double stop → rejected

        if open_run is not None:
            state.update(open_run)
            state.setTimeoutDuration(run_ttl_ms)
        elif state.exists:
            state.remove()

    return (
        control.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandasWithState(
            update,
            outputStructType=RUN_OUT_SCHEMA,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
