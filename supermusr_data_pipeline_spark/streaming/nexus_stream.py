"""Streaming NeXus sink: aev2 frame stream → per-run Parquet (S6/S7/T5).

The reference appends each assembled frame to the run's HDF5 file as it
arrives, maintaining two cumulative per-run datasets
(nexus-writer/src/nexus_structure/entry/event_data.rs:190-247):

- ``event_time_zero``: frame ts − run collect_from (ns) — stateless (P5);
- ``event_index``: running total of events in all PRIOR frames of the run —
  cumulative ACROSS micro-batches (A5).

``foreachBatch`` runs exactly TWO Spark actions per micro-batch: (1) the
stateful FSM subtree executes once into a cache and yields a SLIM per-frame
projection (no event arrays), from which run matching, frame sequencing, and
the continuation totals are computed driver-side (the runs table is a tiny
in-memory dimension, exactly as the reference's writer holds it); (2) the
decorated per-frame dimension goes back as a local relation that the cached
event arrays broadcast-join and explode through, inside the parquet append —
the only action that touches event data, written straight into the run's
partition directory.
The continuation totals are re-derived FROM THE SINK on restart — the same
crash-recovery move the reference makes when it reopens an orphaned .nxs file
and reads its sizes back (run_engine/engine.rs:144-173, T5); between batches
they ride in the writer object.

Scale notes: per-batch work is the batch operator (shuffle on run/frame key);
the continuation state is one (frame_seq, event_index) pair per ACTIVE run —
O(runs), kept on the driver, never the data path.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache_conf import uncompressed_cache


_FRAME_KEY = ["ts", "period_number", "protons_per_pulse", "running", "frame_number"]
# the dimension round-trips through driver rows and back into a local
# relation; its join key uses INTEGER microseconds (unix_micros), never
# the timestamp itself — PySpark's datetime collect/createDataFrame
# conversion goes through the session-local timezone and drops the fold
# attribute, so in a non-UTC session a DST-ambiguous wall-clock instant
# would round-trip to a different microsecond and the broadcast join
# would silently drop those frames' events (ADVICE r7)
_JOIN_KEY = ["ts_us", "period_number", "protons_per_pulse", "running", "frame_number"]


def _slim_frames(frames_batch: DataFrame) -> DataFrame:
    """One row per frame, no event arrays — the ONLY thing the dimension
    pass pulls out of the stateful subtree.  Time is carried ONLY as
    ``ts_us`` integer microseconds: the raw timestamp never crosses the
    collect/createDataFrame boundary (see _JOIN_KEY note).

    n_events is greatest(size, 1): ``explode_outer`` keeps zero-event
    frames as one null-event row, and that row counts 1 toward
    ``event_index`` — the original exploded path's behavior."""
    return frames_batch.select(
        F.unix_micros("ts").alias("ts_us"),
        *_FRAME_KEY[1:],
        F.col("veto_flags").alias("frame_veto_flags"),
        "complete",
        F.greatest(F.size("channel"), F.lit(1)).cast("long").alias("n_events"),
    )


def _quote(name: str) -> str:
    """Escape a partition VALUE for use in a ``run_name=<value>`` directory
    name, matching Spark's ExternalCatalogUtils.escapePathName character
    set — so a directory this sink writes is byte-identical to what
    ``partitionBy("run_name")`` would have produced and partition
    discovery decodes it to the same value."""
    out = []
    for c in name:
        if ord(c) < 0x20 or c == "\x7f" or c in '"#%\'*/:=?\\{[]^':
            out.append("%%%02X" % ord(c))
        else:
            out.append(c)
    return "".join(out)


def _unquote(name: str) -> str:
    """Inverse of :func:`_quote` (Spark's unescapePathName): decode the
    ``%XX`` escapes a partition directory name carries."""
    import re

    return re.sub(
        "%([0-9A-Fa-f]{2})", lambda m: chr(int(m.group(1), 16)), name
    )


_DIM_SCHEMA = (
    "ts_us long, period_number long, protons_per_pulse int, running boolean, "
    "frame_number long, run_name string, frame_veto_flags int, complete boolean, "
    "frame_seq long, event_time_zero long, event_index long"
)


def _events_with_dim(
    frames_batch: DataFrame, dim: DataFrame, with_run_col: bool = True
) -> DataFrame:
    """Array rows + broadcast frame dimension -> NEXUS_EVENT_SCHEMA.  The
    decorated dimension broadcast-joins onto the array rows and events
    explode ONCE, already carrying their run columns — the event side
    never shuffles.  ``with_run_col=False`` drops run_name from the
    output (for a write that targets one run's partition directory
    directly, where the directory name carries the value).

    The join runs BEFORE any per-event expression, on the raw parallel
    arrays, and the explode is posexplode-of-one-array + element_at on
    the others: zipping 3 arrays into a struct array ahead of the join
    serialized 4000 structs per frame into every join row — measurably
    slower than indexing the primitive arrays after the fact.  The three
    arrays are always equal-length (one event per element, the aev2
    contract), so positional indexing is exact; posexplode_outer keeps
    the zero-event frame as one null row, as explode_outer did."""
    return _events_us_with_dim(
        frames_batch.select(
            F.unix_micros("ts").alias("ts_us"),
            *_FRAME_KEY[1:],
            "channel", "event_time", "event_voltage",
        ),
        dim,
        with_run_col=with_run_col,
    )


def _events_us_with_dim(
    rows_us: DataFrame, dim: DataFrame, with_run_col: bool = True,
    outer: bool = True,
) -> DataFrame:
    """The ts_us-shaped core of ``_events_with_dim``: ``rows_us`` carries
    integer-microsecond ``ts_us`` plus the rest of the frame key and the
    three parallel event arrays (frame-level OR message-level rows — the
    join decorates either the same way).  ``outer=False`` uses plain
    posexplode, for message-level callers that handle zero-event frames
    via a dimension-side branch instead (streaming/nexus_direct.py)."""
    explode = F.posexplode_outer if outer else F.posexplode
    dim_cols = [
        "frame_seq",
        "event_time_zero",
        "event_index",
        "period_number",
        "frame_number",
        F.col("complete").alias("frame_complete"),
        "running",
        F.col("frame_veto_flags").alias("veto_flags"),
    ]
    if with_run_col:
        dim_cols.insert(0, F.col("run_name"))
    joined = (
        rows_us.select(
            *_JOIN_KEY, "channel", "event_time", "event_voltage",
        )
        .join(F.broadcast(dim), _JOIN_KEY)
        .select(
            *dim_cols,
            "event_time",
            "event_voltage",
            explode("channel"),
        )
    )
    passthrough = (["run_name"] if with_run_col else []) + [
        "frame_seq",
        "event_time_zero",
        "event_index",
        "period_number",
        "frame_number",
        "frame_complete",
        "running",
        "veto_flags",
    ]
    return joined.select(
        *passthrough,
        F.element_at("event_time", F.col("pos") + 1)
        .cast("long")
        .alias("event_time_offset"),
        F.col("col").cast("int").alias("event_id"),
        F.element_at("event_voltage", F.col("pos") + 1)
        .cast("double")
        .alias("pulse_height"),
    )




class NexusStreamWriter:
    """The foreachBatch callable.  Holds per-run continuation totals
    {run_name: (next_frame_seq, next_event_index)}; rebuilds them from the
    sink directory on first use (T5 resume).

    Replay safety: a write-ahead INTENT file (bid + pre-batch totals,
    written just before each append, overwritten by the next — never
    removed, since removal would reopen a window before the engine's
    commit-log write) makes the sink append exactly-once under the
    engine's batch replay — on restart, sink-derived totals differing
    from the intent's prove the crashed batch's append landed, so its
    replay short-circuits (the nexus_direct.py protocol, sidecar
    ``_writer_state``)."""

    def __init__(
        self, runs: DataFrame, path: str, on_commit=None,
        write_intent: bool = True,
    ):
        self.runs = runs
        self.path = path
        # write_intent=False drops the per-batch write-ahead intent and
        # with it the exactly-once-under-replay guarantee (the door
        # reverts to documented at-least-once with compact_nexus_run as
        # the dedupe backstop).  Exists for the same-session A/B that
        # attributes the intent's latency cost (tools/ab_fsm_intent.py);
        # production keeps the default.
        self.write_intent = write_intent
        # optional observer: called with the sorted frame_numbers committed
        # by each batch, AFTER the sink write — rides the slim dimension
        # rows the batch collects anyway, so observation adds no Spark
        # job.  The streaming envelope bench (bench_streaming.py) uses it
        # to stamp per-frame commit times.
        self.on_commit = on_commit
        # optional bucket log: when set to a list, each batch appends
        # {"batch_id", "n_frames", "fsm_s", "write_s", "sink_s"} — the
        # cycle decomposition bench_streaming publishes (two perf_counter
        # reads per batch; no Spark-side cost)
        self.phase_log: list | None = None
        self._totals: dict[str, tuple[int, int]] | None = None
        self._runs_rows: list | None = None
        self._skip_bid: int | None = None

    def _load_runs(self, spark: SparkSession) -> list:
        """Collect the tiny runs dimension ONCE (run_name + interval in
        integer µs).  The reference's nexus-writer holds the same table in
        memory (run_engine/engine.rs:54-80); re-broadcasting it inside
        every micro-batch's plan was a measurable flat cost on the
        latency path, and the interval match over (frames-in-batch ×
        runs) rows is driver-trivial."""
        if self._runs_rows is None:
            self._runs_rows = self.runs.select(
                "run_name",
                F.unix_micros("collect_from").alias("from_us"),
                F.unix_micros("collect_until").alias("until_us"),
            ).collect()
        return self._runs_rows

    def refresh_runs(self, runs: DataFrame | None = None) -> None:
        """Drop the collected runs snapshot (optionally replacing the
        DataFrame) so the next batch re-collects it — the hook for a
        control plane that starts/stops runs while the sink is live."""
        if runs is not None:
            self.runs = runs
        self._runs_rows = None

    def _intent_file(self) -> str:
        return os.path.join(self.path, "_writer_state", "intent.json")

    def _totals_from_sink(self, spark: SparkSession) -> dict[str, tuple[int, int]]:
        totals: dict[str, tuple[int, int]] = {}
        if os.path.isdir(self.path) and any(
            n.startswith("run_name=") for n in os.listdir(self.path)
        ):
            # T5 resume: re-derive continuation totals from the sink itself
            prev = spark.read.parquet(self.path)
            for r in (
                prev.groupBy("run_name")
                .agg(
                    (F.max("frame_seq") + 1).alias("next_seq"),
                    F.count("*").alias("n_events"),
                )
                .collect()
            ):
                totals[r["run_name"]] = (int(r["next_seq"]), int(r["n_events"]))
        return totals

    def _load_totals(self, spark: SparkSession) -> dict[str, tuple[int, int]]:
        if self._totals is not None:
            return self._totals
        totals = self._totals_from_sink(spark)
        itf = self._intent_file()
        if os.path.isfile(itf):
            # the intent persists across batches (overwritten, never
            # removed — removal would reopen a window between removal and
            # the engine's own commit-log write).  On restart: totals
            # differing from the intent's pre-batch snapshot prove that
            # batch's append committed — short-circuit its replay; a
            # long-committed stale intent is harmless because the engine
            # never re-delivers batches at-or-before its commit log.
            import json

            with open(itf) as fh:
                intent = json.load(fh)
            pre = {k: tuple(v) for k, v in intent["totals"].items()}
            if totals != pre:
                self._skip_bid = intent["bid"]
        self._totals = totals
        return totals

    def __call__(self, frames_batch: DataFrame, batch_id: int) -> None:
        t_start = time.perf_counter()
        spark = frames_batch.sparkSession
        totals = self._load_totals(spark)
        if self._skip_bid is not None and batch_id <= self._skip_bid:
            # replay of a batch whose append already committed (intent
            # recovery in _load_totals)
            if self.on_commit is not None:
                self.on_commit([])
            return

        # Execute the stateful FSM subtree EXACTLY ONCE per batch: persist
        # the frame rows before any action.  Without this, the broadcast
        # dimension exchange and the event-side write each re-ran the
        # whole applyInPandasWithState plan (visible as 2x state-store
        # instances per partition in StreamingQueryProgress), and a third
        # job re-ran it for the post-write totals aggregate — the dominant
        # share of the measured ~3 s micro-batch cycle at the 50 fps
        # envelope shape.  Now: one FSM execution populates the cache, the
        # tiny per-frame dimension collect doubles as the totals /
        # commit-observation source (no post-write job at all), and the
        # write is the only action that touches the event arrays.
        runs_rows = self._load_runs(spark)
        # one-cycle micro-cache: columnar compression is pure CPU here —
        # depth-counted, exception-safe flip (streaming/cache_conf.py)
        comp_ctx = uncompressed_cache(spark)
        comp_ctx.__enter__()
        try:
            frames_batch.persist()
            # ONE action through the stateful subtree: a slim per-frame
            # projection (no event arrays) — bounded by frames-in-batch,
            # never by events.  Run matching, frame sequencing, and the
            # continuation totals all happen driver-side on these rows
            # (runs are a tiny in-memory dimension; the per-batch
            # broadcast build + window exchange they used to cost inside
            # the Spark plan was pure flat latency).  The decorated
            # dimension goes back as a LOCAL relation, so the write plan
            # is bit-identical across batches (codegen cache hit) and the
            # write job touches nothing but the cached arrays.
            slim_rows = _slim_frames(frames_batch).collect()
            t_fsm = time.perf_counter()
            frame_numbers = set()
            slim_rows.sort(key=lambda r: (r.ts_us, r.frame_number))
            matched = []  # (run_row, frame_row), grouped per run in order
            for run in runs_rows:
                for r in slim_rows:
                    # J1 predicate (run_parameters.rs:156-175), exactly as
                    # operators/run_matching.match_events_to_runs
                    if run.from_us < r.ts_us and (
                        run.until_us is None or r.ts_us < run.until_us
                    ):
                        matched.append((run, r))
            if matched:
                per_run: dict[str, tuple[int, int]] = {}
                dim_vals = []
                for run, r in matched:
                    seq, idx = per_run.get(
                        run.run_name, totals.get(run.run_name, (0, 0))
                    )
                    dim_vals.append(
                        (
                            r.ts_us, r.period_number, r.protons_per_pulse,
                            r.running, r.frame_number, run.run_name,
                            r.frame_veto_flags, r.complete, seq,
                            (r.ts_us - run.from_us) * 1000, idx,
                        )
                    )
                    per_run[run.run_name] = (seq + 1, idx + r.n_events)
                    frame_numbers.add(int(r.frame_number))
                # Single-run batch (the overwhelmingly common case on the
                # latency path): write the run's partition DIRECTORY
                # directly, skipping the dynamic-partition machinery —
                # its per-task sort-by-partition-key and multi-directory
                # commit were flat per-batch latency.  The directory name
                # carries run_name (standard partitioned-parquet layout),
                # so readers see exactly what partitionBy would have
                # written.  snappy, not the session's zstd: the sink
                # appends on the latency path every micro-batch (the
                # reference's HDF5 run files are uncompressed —
                # nexus_structure/mod.rs); compaction to zstd belongs to
                # the downstream maintenance pass, not here.
                #
                # A batch spanning MULTIPLE runs (a run transition) writes
                # all of them in ONE partitionBy job instead: independent
                # per-run jobs opened a crash window in which the first
                # run's append committed and the batch replay then
                # re-appended it (duplicate events the totals re-derivation
                # would count as real — ADVICE r7).  One job commits all
                # runs or none, restoring the all-or-nothing property at
                # the cost of the dynamic-partition machinery only on the
                # rare transition batch.
                # write-ahead intent: (bid, pre-batch totals) before the
                # append, removed after totals update — see class docstring
                if self.write_intent:
                    import json

                    os.makedirs(
                        os.path.dirname(self._intent_file()), exist_ok=True
                    )
                    itmp = self._intent_file() + ".tmp"
                    with open(itmp, "w") as fh:
                        json.dump(
                            {
                                "bid": batch_id,
                                "totals": {
                                    k: list(v) for k, v in totals.items()
                                },
                            },
                            fh,
                        )
                    os.replace(itmp, self._intent_file())
                if len(per_run) == 1:
                    (run_name,) = per_run
                    dim_local = spark.createDataFrame(dim_vals, _DIM_SCHEMA)
                    (
                        _events_with_dim(frames_batch, dim_local, with_run_col=False)
                        .write.mode("append")
                        .option("compression", "snappy")
                        .parquet(
                            os.path.join(
                                self.path, f"run_name={_quote(run_name)}"
                            )
                        )
                    )
                else:
                    dim_local = spark.createDataFrame(dim_vals, _DIM_SCHEMA)
                    (
                        _events_with_dim(frames_batch, dim_local, with_run_col=True)
                        .write.mode("append")
                        .option("compression", "snappy")
                        .partitionBy("run_name")
                        .parquet(self.path)
                    )
                totals.update(per_run)
        finally:
            frames_batch.unpersist()
            comp_ctx.__exit__(None, None, None)
        if self.phase_log is not None:
            t_end = time.perf_counter()
            self.phase_log.append(
                {
                    "batch_id": batch_id,
                    "n_frames": len(slim_rows),
                    "fsm_s": round(t_fsm - t_start, 4),
                    "write_s": round(t_end - t_fsm, 4),
                    "sink_s": round(t_end - t_start, 4),
                }
            )
        if self.on_commit is not None:
            self.on_commit(sorted(frame_numbers))


def write_nexus_stream(
    frames: DataFrame,
    runs: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """Start the streaming nexus sink.  ``frames`` is the aev2 stream from
    assemble_frames_stream; ``runs`` the interval table, collected once
    (call ``writer.refresh_runs()`` when the control plane changes it).
    Returns the StreamingQuery."""
    writer = NexusStreamWriter(runs, path)
    q = frames.writeStream.foreachBatch(writer).option("checkpointLocation", checkpoint)
    q = q.trigger(**(trigger or {"availableNow": True}))
    return q.start()
