"""Direct micro-batch NeXus door: dev2 messages -> per-run Parquet with
frame assembly FUSED into the sink's ``foreachBatch``.

The production topology (frame_assembly_stream + nexus_stream) runs the
frame FSM as ``applyInPandasWithState``; round 7's floor decomposition
measured ~0.58 s of every micro-batch as fixed stateful-operator
machinery (Python state-server round-trips + ProcessingTimeTimeout
re-arm) plus the FSM's shuffle on the frame key, and round 8's
``transformWithStateInPandas`` A/B showed the newer operator pays more,
not less (tools/AB_FSM_RESULT.json).  This door removes the stateful
operator entirely: the reference's digitiser-aggregator holds its
partial-frame cache in plain process memory
(digitiser-aggregator/src/frame/cache.rs) — bounded by
(frames-in-flight x frame size), a function of TTL x frame rate, NOT of
stream length — so the Spark-idiomatic equivalent is driver-held state
inside ``foreachBatch``, exactly the pattern the repo's ingest front
doors already use for their admission indexes.

Per micro-batch this door runs TWO narrow Spark jobs, no shuffle:

1. a SLIM per-message collect (frame key + digitiser id + veto +
   event count — never the arrays): the driver merges it into the
   partial-frame cache and decides, per frame, dispatch-complete /
   dispatch-expired / keep / reject-duplicate / reject-tombstoned —
   the same FSM as frame_assembly_stream.make_update_fn
   (frame/partial.rs:30-94, cache.rs:55-74);
2. the event write: the decorated frame dimension (run matching, veto
   OR, frame_seq, event_time_zero, event_index — all driver-side, as
   in nexus_stream.NexusStreamWriter) goes back as a local relation
   that the batch's cached message rows broadcast-join and posexplode
   through, appended straight into the run's partition directory.

A frame whose messages split across a batch boundary has its
already-arrived rows pulled driver-side (bounded: <= digitisers x
events/frame per in-flight frame, AND by ``pending_max_bytes`` — when
event density makes the TTL bound too loose, the oldest pending frames
dispatch incomplete-early, the reference's memory-pressure posture for
a partial frame) and re-joined as a local relation when the frame
dispatches.  Crash recovery: the cache (slim state +
carried rows + continuation totals + last batch id) persists to a
``_assembler_state`` sidecar under the sink after every batch
(tmp+rename), so a replayed batch id short-circuits instead of
re-appending (T5; run_engine/engine.rs:144-173 re-derivation remains
the fallback when the sidecar is absent).  The crash window between
the sink append and the sidecar write is closed by a WRITE-AHEAD
INTENT: each batch records (bid, pre-batch totals) before mutating
anything, and recovery compares sink-derived totals against the
intent's to decide whether the append landed (adopt actuals and
short-circuit the engine's replay) or not (drop the intent and let the
replay redo the batch) — exactly-once sink effects under replay, which
the FSM door (whose parquet append is not transactional with the state
store) documents only as at-least-once with compact_nexus_run as the
dedupe backstop.

Object-store posture of the sidecar: state.json / intent.json /
pending_rows.parquet are each ONE small file written whole via
tmp+os.replace — the rename exists only so a POSIX reader can never see
a partial file.  On S3-style stores the equivalent is a single PUT
(atomic per key), so the protocol ports without a rename primitive —
unlike directory swaps, which is why index maintenance needed the
pointer-file protocol (plans/index_maintenance.py) and this sidecar
does not.

Silent-stream TTL expiry (T1): batch-time expiry alone would let a
pending incomplete frame wait indefinitely on a source that goes
silent (Spark does not run no-data micro-batches for a stateless
foreachBatch plan).  The door therefore carries a driver-side expiry
ticker: ``expire_pending()`` dispatches TTL-expired frames from the
driver-held carried rows alone — every pending frame's admitted rows
are already in ``_pending_rows`` (pulled the batch they arrived), so
the tick needs no batch input, only a local-relation write.  A daemon
ticker thread (``start_expiry_timer``, wired by ``write_nexus_direct``)
fires it between batches under the same lock that serializes
``foreachBatch`` calls, restoring the FSM door's timer guarantee
(ProcessingTimeTimeout, frame/partial.rs:30-40 — expiry anchored to
first arrival) on the production door.  Tick writes get their own
write-ahead intent carrying the expired keys, so a crash between the
tick's append and its state save is recovered exactly-once too (see
``_load_state``).
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache_conf import uncompressed_cache
from .nexus_stream import _DIM_SCHEMA, _events_us_with_dim, _quote

_KEY_US = ["ts_us", "period_number", "protons_per_pulse", "running", "frame_number"]

_MSG_US_SCHEMA = (
    "ts_us long, period_number long, protons_per_pulse int, running boolean, "
    "frame_number long, digitizer_id int, veto_flags int, "
    "channel array<int>, event_time array<bigint>, event_voltage array<double>"
)

_NULL_ROW_SCHEMA = (
    "frame_seq long, event_time_zero long, event_index long, "
    "period_number long, frame_number long, frame_complete boolean, "
    "running boolean, veto_flags int, "
    "event_time_offset long, event_id int, pulse_height double"
)


class _FrameState:
    """Slim per-frame cache entry: contributor set, OR'd veto, event
    count, and the processing-time anchor of the FIRST message
    (frame/partial.rs:30-40 — the TTL runs from first arrival)."""

    __slots__ = ("dids", "veto", "first_ms", "n_events")

    def __init__(self, first_ms: int):
        self.dids: set[int] = set()
        self.veto = 0
        self.first_ms = first_ms
        self.n_events = 0


class DirectNexusWriter:
    """The fused foreachBatch callable over a dev2 MESSAGE stream
    (DIGITISER_MESSAGE_SCHEMA rows)."""

    def __init__(
        self,
        runs: DataFrame,
        path: str,
        expected_digitizers: list[int],
        frame_ttl_ms: int = 500,
        tombstone_ttl_ms: int = 2000,
        state_dir: str | None = None,
        on_commit=None,
        clock=time.time,
        persist_batch: bool = True,
        write_coalesce: int | None = None,
        pending_max_bytes: int = 256 << 20,
    ):
        self.runs = runs
        self.path = path
        self.expected = sorted(int(d) for d in expected_digitizers)
        self.frame_ttl_ms = frame_ttl_ms
        self.tombstone_ttl_ms = tombstone_ttl_ms
        self.state_dir = state_dir or os.path.join(path, "_assembler_state")
        self.on_commit = on_commit
        self.clock = clock
        # perf knobs (tools/ab_direct_sink.py measures both):
        # persist_batch=False lets the slim pass run on a column-PRUNED
        # scan (no event_time/event_voltage IO) and the write re-scan the
        # source instead of paying cache materialization (measured worse);
        # write_coalesce bounds the append's task/file count — a
        # micro-batch otherwise emits ONE FILE PER SOURCE PARTITION
        # (~one per arrival file), which at 50 fps accumulates thousands
        # of files per run-minute.  None (default) coalesces to the
        # session's spark.sql.shuffle.partitions — the same per-batch
        # file rate the FSM door's state partitioning produced, at
        # noise-level latency cost (same-session A/B: steady p50 2.21 s
        # vs 2.13 s at 32x500).  Pass 0 to disable coalescing.
        self.persist_batch = persist_batch
        self.write_coalesce = write_coalesce
        # same observability contract as NexusStreamWriter: fsm_s here is
        # the slim collect + driver FSM, write_s the event append
        self.phase_log: list | None = None
        self._loaded = False
        self._last_bid: int | None = None
        self._totals: dict[str, tuple[int, int]] = {}
        self._pending: dict[tuple, _FrameState] = {}
        self._pending_rows: dict[tuple, list[tuple]] = {}
        # byte budget for the carried rows (the one driver-side cache
        # that scales with event DENSITY, not just frames-in-flight);
        # overflow dispatches the oldest pending frames incomplete-early
        self.pending_max_bytes = pending_max_bytes
        self._pending_bytes = 0
        self._tombstones: dict[tuple, int] = {}
        self._runs_rows: list | None = None
        # silent-stream expiry: the ticker and the batch path serialize
        # on this lock; _spark is captured on the first batch so a tick
        # can build its local-relation write without a batch in hand
        self._lock = threading.RLock()
        self._spark: SparkSession | None = None
        self._timer_stop: threading.Event | None = None
        self._timer_thread: threading.Thread | None = None
        self.timer_error: BaseException | None = None

    # ---- runs dimension (identical contract to NexusStreamWriter) ----
    def _load_runs(self) -> list:
        if self._runs_rows is None:
            self._runs_rows = self.runs.select(
                "run_name",
                F.unix_micros("collect_from").alias("from_us"),
                F.unix_micros("collect_until").alias("until_us"),
            ).collect()
        return self._runs_rows

    def refresh_runs(self, runs: DataFrame | None = None) -> None:
        if runs is not None:
            self.runs = runs
        self._runs_rows = None

    # ---- state sidecar ----
    def _state_file(self) -> str:
        return os.path.join(self.state_dir, "state.json")

    def _rows_file(self) -> str:
        return os.path.join(self.state_dir, "pending_rows.parquet")

    def _intent_file(self) -> str:
        return os.path.join(self.state_dir, "intent.json")

    def _totals_from_sink(self, spark: SparkSession) -> dict[str, tuple[int, int]]:
        totals: dict[str, tuple[int, int]] = {}
        if os.path.isdir(self.path) and any(
            n.startswith("run_name=") for n in os.listdir(self.path)
        ):
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

    def _load_state(self, spark: SparkSession) -> None:
        if self._loaded:
            return
        self._loaded = True
        self._read_state_file(spark)
        # write-ahead intent recovery: an intent file survives a crash in
        # the window between the sink append and the post-batch state
        # save.  The intent carries the PRE-batch totals, so comparing
        # them against sink-derived actual totals discriminates whether
        # the append landed: different -> it did (adopt actuals, mark the
        # batch done so the engine's replay short-circuits); equal -> it
        # didn't (drop the intent, the replay redoes the batch).  This
        # closes the duplicate-append replay window the FSM door
        # documents as at-least-once.  Corner left open (documented): a
        # committed-then-crashed batch's effects on the PENDING cache
        # (carried rows, fresh tombstones) are lost with the process —
        # the same information the reference's aggregator loses when its
        # in-memory cache dies.
        itf = self._intent_file()
        if os.path.isfile(itf):
            with open(itf) as fh:
                intent = json.load(fh)
            if intent.get("tick"):
                # expiry-tick intent (expire_pending): same discriminator,
                # but the batch-replay short-circuit doesn't apply — the
                # engine never replays a tick — so the intent carries the
                # expired keys and the recovery FINISHES the tick's state
                # effects itself when the append landed (drop from
                # pending, tombstone, adopt actual totals); when it
                # didn't, pending stays intact and the next tick or
                # batch re-dispatches.
                pre = {k: tuple(v) for k, v in intent["totals"].items()}
                actual = self._totals_from_sink(spark)
                if actual != pre:
                    self._totals = actual
                    for kl in intent["expired_keys"]:
                        key = tuple(kl)
                        self._pending.pop(key, None)
                        self._pop_rows(key)
                        self._tombstones[key] = intent["tomb_until"]
            elif self._last_bid is None or intent["bid"] > self._last_bid:
                pre = {k: tuple(v) for k, v in intent["totals"].items()}
                actual = self._totals_from_sink(spark)
                if actual != pre:
                    self._totals = actual
                    self._last_bid = intent["bid"]
                else:
                    self._totals = pre
            os.remove(itf)

    def _read_state_file(self, spark: SparkSession) -> None:
        sf = self._state_file()
        if os.path.isfile(sf):
            with open(sf) as fh:
                st = json.load(fh)
            self._last_bid = st["last_bid"]
            self._totals = {k: tuple(v) for k, v in st["totals"].items()}
            for p in st["pending"]:
                key = tuple(p["key"])
                fs = _FrameState(p["first_ms"])
                fs.dids = set(p["dids"])
                fs.veto = p["veto"]
                fs.n_events = p["n"]
                self._pending[key] = fs
            self._tombstones = {tuple(t[0]): t[1] for t in st["tombstones"]}
            rf = self._rows_file()
            if os.path.isfile(rf):
                import pyarrow.parquet as pq

                for row in pq.read_table(rf).to_pylist():
                    key = (
                        row["ts_us"], row["period_number"],
                        row["protons_per_pulse"], row["running"],
                        row["frame_number"],
                    )
                    self._pending_rows.setdefault(key, []).append(
                        (
                            *key, row["digitizer_id"], row["veto_flags"],
                            row["channel"], row["event_time"],
                            row["event_voltage"],
                        )
                    )
                self._pending_bytes = sum(
                    self._rows_nbytes(rs) for rs in self._pending_rows.values()
                )
            return
        # no sidecar: re-derive continuation totals from the sink itself
        # (the reference reopens an orphaned .nxs and reads sizes back)
        self._totals = self._totals_from_sink(spark)

    def _save_state(self) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        st = {
            "last_bid": self._last_bid,
            "totals": {k: list(v) for k, v in self._totals.items()},
            "pending": [
                {
                    "key": list(k),
                    "dids": sorted(fs.dids),
                    "veto": fs.veto,
                    "first_ms": fs.first_ms,
                    "n": fs.n_events,
                }
                for k, fs in self._pending.items()
            ],
            "tombstones": [[list(k), e] for k, e in self._tombstones.items()],
        }
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(st, fh)
        os.replace(tmp, self._state_file())
        rf = self._rows_file()
        if self._pending_rows:
            import pyarrow as pa
            import pyarrow.parquet as pq

            names = [
                "ts_us", "period_number", "protons_per_pulse", "running",
                "frame_number", "digitizer_id", "veto_flags",
                "channel", "event_time", "event_voltage",
            ]
            types = [
                pa.int64(), pa.int64(), pa.int32(), pa.bool_(), pa.int64(),
                pa.int32(), pa.int32(), pa.list_(pa.int32()),
                pa.list_(pa.int64()), pa.list_(pa.float64()),
            ]
            rows = [r for rs in self._pending_rows.values() for r in rs]
            cols = list(zip(*rows))
            tbl = pa.table(
                {n: pa.array(list(c), type=t) for n, c, t in zip(names, cols, types)}
            )
            pq.write_table(tbl, rf + ".tmp")
            os.replace(rf + ".tmp", rf)
        elif os.path.isfile(rf):
            os.remove(rf)

    # ---- the batch ----
    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self.timer_error is not None:
            # a background expiry tick failed: surface it through the
            # engine (fail the query) instead of leaving it polled-only
            err, self.timer_error = self.timer_error, None
            raise RuntimeError("expiry ticker failed; see cause") from err
        with self._lock:
            self._spark = batch.sparkSession
            self._run_batch(batch, batch_id)
            # AFTER the batch protocol completes (its intent consumed):
            # an overflow dispatch is then an ordinary tick, so a crash
            # inside it recovers through the tick-intent path
            self._enforce_pending_budget()

    def _run_batch(self, batch: DataFrame, batch_id: int) -> None:
        t_start = time.perf_counter()
        spark = batch.sparkSession
        self._load_state(spark)
        if self._last_bid is not None and batch_id <= self._last_bid:
            # replayed batch: its append already committed before the crash
            if self.on_commit is not None:
                self.on_commit([])
            return
        now_ms = int(self.clock() * 1000)
        runs_rows = self._load_runs()

        # write-ahead intent: BEFORE any driver-state mutation or sink
        # write, record (batch id, pre-batch totals) so a crash anywhere
        # in this call is recoverable without a duplicate append (see
        # _load_state).  One ~KB tmp+rename per batch.
        os.makedirs(self.state_dir, exist_ok=True)
        itmp = self._intent_file() + ".tmp"
        with open(itmp, "w") as fh:
            json.dump(
                {
                    "bid": batch_id,
                    "totals": {k: list(v) for k, v in self._totals.items()},
                },
                fh,
            )
        os.replace(itmp, self._intent_file())

        msgs = batch.select(
            F.unix_micros("ts").alias("ts_us"),
            *_KEY_US[1:],
            "digitizer_id", "veto_flags",
            "channel", "event_time", "event_voltage",
        )
        # the per-batch micro-cache lives for ONE cycle (< 2 s):
        # columnar compression of the event arrays is pure CPU on both
        # the build and the two cache-hit jobs (measured ~55 + 15 ms per
        # 54-frame batch at 32x500).  Depth-counted context manager:
        # exception-safe and correct when another writer interleaves in
        # the same session (see streaming/cache_conf.py)
        comp_ctx = uncompressed_cache(spark) if self.persist_batch else None
        if comp_ctx is not None:
            comp_ctx.__enter__()
        n_frames_committed: list[int] = []
        try:
            if self.persist_batch:
                msgs.persist()
            # job 1: slim collect — key + did + veto + count, never arrays
            slim = msgs.select(
                *_KEY_US, "digitizer_id", "veto_flags",
                F.size("channel").alias("n"),
            ).collect()
            # deterministic FSM order; the duplicate winner is the row
            # minimizing (n, veto_flags) — see _clean's window rule
            slim.sort(key=lambda r: (
                r.ts_us, r.frame_number, r.digitizer_id, r.n, r.veto_flags,
            ))
            cross_rejects: set[tuple] = set()   # (key, did): did arrived in a PRIOR batch
            dup_in_batch = False
            seen_batch: set[tuple] = set()
            for r in slim:
                key = (
                    r.ts_us, r.period_number, r.protons_per_pulse,
                    r.running, r.frame_number,
                )
                if key in self._tombstones:
                    # late message after dispatch: reject, re-arm tombstone
                    # (frame/cache.rs:55-63)
                    self._tombstones[key] = now_ms + self.tombstone_ttl_ms
                    continue
                fs = self._pending.get(key)
                if fs is None:
                    fs = self._pending[key] = _FrameState(now_ms)
                kd = (key, int(r.digitizer_id))
                if int(r.digitizer_id) in fs.dids:
                    # duplicate (frame, digitiser) message: reject wholesale
                    # (frame/cache.rs:71-74)
                    if kd in seen_batch:
                        dup_in_batch = True
                    else:
                        cross_rejects.add(kd)
                    continue
                seen_batch.add(kd)
                fs.dids.add(int(r.digitizer_id))
                fs.veto |= int(r.veto_flags)
                fs.n_events += int(r.n)

            # dispatch decisions: complete now, or first-arrival TTL expired
            dispatch: list[tuple[tuple, _FrameState]] = []
            for key, fs in list(self._pending.items()):
                if sorted(fs.dids) == self.expected or (
                    now_ms - fs.first_ms >= self.frame_ttl_ms
                ):
                    dispatch.append((key, fs))
                    del self._pending[key]
                    self._tombstones[key] = now_ms + self.tombstone_ttl_ms
            for key in [k for k, e in self._tombstones.items() if e <= now_ms]:
                del self._tombstones[key]

            t_fsm = time.perf_counter()

            # run matching + frame sequencing, driver-side (J1 predicate,
            # run_parameters.rs:156-175), exactly as NexusStreamWriter
            dim_vals, null_rows, per_run, dispatched_keys, frames = (
                self._match_runs(dispatch, runs_rows)
            )
            n_frames_committed.extend(frames)

            if dim_vals:
                self._write(
                    spark, msgs, dim_vals, null_rows, per_run,
                    dispatched_keys, cross_rejects, dup_in_batch,
                )
                self._totals.update(per_run)
            # every dispatched frame's carried rows are done with — also
            # the ones matching no run (they are dropped, not written)
            for key, _fs in dispatch:
                self._pop_rows(key)

            # carry rows of still-pending frames driver-side (bounded by
            # frames-in-flight x frame size — the reference's cache bound).
            # Only frames that received rows THIS batch need a pull; a
            # frame merely waiting out its TTL must not cost a job per
            # intervening batch.
            touched = {
                k for (k, _d) in seen_batch if k in self._pending
            }
            if touched:
                self._pull_kept_rows(msgs, touched, cross_rejects, dup_in_batch)
            t_write = time.perf_counter()
        finally:
            if self.persist_batch:
                msgs.unpersist()
            if comp_ctx is not None:
                comp_ctx.__exit__(None, None, None)

        self._last_bid = batch_id
        self._save_state()
        if os.path.isfile(self._intent_file()):
            os.remove(self._intent_file())
        if self.phase_log is not None:
            self.phase_log.append(
                {
                    "batch_id": batch_id,
                    "n_frames": len(set(n_frames_committed)),
                    "fsm_s": round(t_fsm - t_start, 4),
                    "write_s": round(t_write - t_fsm, 4),
                    "sink_s": round(time.perf_counter() - t_start, 4),
                }
            )
        if self.on_commit is not None:
            self.on_commit(sorted(set(n_frames_committed)))

    def _match_runs(self, dispatch, runs_rows):
        """Run matching + frame sequencing for a dispatch set, driver-side
        (J1 predicate, run_parameters.rs:156-175) — shared by the batch
        path and the expiry tick.  Mutates nothing; returns
        (dim_vals, null_rows, per_run, dispatched_keys, frame_numbers)."""
        dispatch.sort(key=lambda kf: (kf[0][0], kf[0][4]))
        per_run: dict[str, tuple[int, int]] = {}
        dim_vals = []
        null_rows = []  # zero-event frames: ONE null-event row each
        dispatched_keys = set()
        frames: list[int] = []
        for run in runs_rows:
            for key, fs in dispatch:
                ts_us = key[0]
                if run.from_us < ts_us and (
                    run.until_us is None or ts_us < run.until_us
                ):
                    seq, idx = per_run.get(
                        run.run_name, self._totals.get(run.run_name, (0, 0))
                    )
                    complete = sorted(fs.dids) == self.expected
                    dim_vals.append(
                        (
                            *key, run.run_name, fs.veto, complete, seq,
                            (ts_us - run.from_us) * 1000, idx,
                        )
                    )
                    if fs.n_events == 0:
                        null_rows.append(
                            (
                                run.run_name, seq, (ts_us - run.from_us) * 1000,
                                idx, key[1], key[4], complete, key[3],
                                fs.veto, None, None, None,
                            )
                        )
                    per_run[run.run_name] = (
                        seq + 1, idx + max(fs.n_events, 1)
                    )
                    dispatched_keys.add(key)
                    frames.append(int(key[4]))
        return dim_vals, null_rows, per_run, dispatched_keys, frames

    # ---- silent-stream TTL expiry (T1) ----
    def expire_pending(self) -> list[int]:
        """Dispatch TTL-expired pending frames WITHOUT a micro-batch —
        the timer guarantee for a source that goes silent.  Every
        pending frame's admitted rows are already driver-side (pulled
        into ``_pending_rows`` the batch they arrived), so the write is
        a pure local-relation append.  Serialized against the batch
        path by the writer lock; returns the dispatched frame numbers.

        Crash safety mirrors the batch path: a tick that will touch the
        sink first records a write-ahead intent carrying the expired
        keys (the engine never replays a tick, so recovery must be able
        to FINISH the tick's state effects itself — see _load_state)."""
        with self._lock:
            if self._spark is None or not self._loaded or not self._pending:
                return []
            now_ms = int(self.clock() * 1000)
            dispatch = [
                (k, fs)
                for k, fs in self._pending.items()
                if now_ms - fs.first_ms >= self.frame_ttl_ms
            ]
            if not dispatch:
                return []
            return self._dispatch_pending(dispatch, now_ms)

    def _dispatch_pending(self, dispatch, now_ms: int) -> list[int]:
        """Tick-protocol dispatch of already-pending frames from the
        driver-held carried rows alone (no batch input): write-ahead
        intent -> local-relation append -> state save.  Shared by TTL
        expiry and the pending-cache byte budget (call under _lock,
        after _load_state, with _spark set)."""
        spark = self._spark
        runs_rows = self._load_runs()
        dim_vals, null_rows, per_run, dispatched_keys, frames = (
            self._match_runs(dispatch, runs_rows)
        )
        tomb_until = now_ms + self.tombstone_ttl_ms
        if dim_vals:
            os.makedirs(self.state_dir, exist_ok=True)
            itmp = self._intent_file() + ".tmp"
            with open(itmp, "w") as fh:
                json.dump(
                    {
                        "bid": self._last_bid,
                        "tick": True,
                        "totals": {
                            k: list(v) for k, v in self._totals.items()
                        },
                        "expired_keys": [list(k) for k in dispatched_keys],
                        "tomb_until": tomb_until,
                    },
                    fh,
                )
            os.replace(itmp, self._intent_file())
            self._write(
                spark, None, dim_vals, null_rows, per_run,
                dispatched_keys, set(), False,
            )
            self._totals.update(per_run)
        for key, _fs in dispatch:
            self._pending.pop(key, None)
            self._pop_rows(key)
            self._tombstones[key] = tomb_until
        self._save_state()
        itf = self._intent_file()
        if os.path.isfile(itf):
            os.remove(itf)
        out = sorted(set(frames))
        if self.on_commit is not None and out:
            self.on_commit(out)
        return out

    # ---- pending-cache byte budget ----
    @staticmethod
    def _rows_nbytes(rows) -> int:
        """Approximate driver-memory cost of carried rows: ~20 payload
        bytes per event (int32 channel + int64 time + float64 voltage)
        plus per-row object overhead.  A budget estimator, not an
        accountant — what matters is that it scales with event count."""
        return sum(80 + 20 * len(r[7]) for r in rows)

    def _pop_rows(self, key) -> None:
        rows = self._pending_rows.pop(key, None)
        if rows:
            self._pending_bytes -= self._rows_nbytes(rows)

    def _enforce_pending_budget(self) -> list[int]:
        """Dispatch-incomplete-early when the carried rows exceed
        ``pending_max_bytes`` (call under _lock, after a batch).  The
        TTL bound alone is rows-per-frame-dependent: at 100x event
        density the same frames-in-flight hold 100x the rows, unbounded
        by anything (VERDICT r10 next #5).  Overflow semantics are the
        reference's memory-pressure posture for a partial frame
        (frame/partial.rs:30-40 — a frame may dispatch incomplete;
        late messages then hit its tombstone), i.e. the TTL effectively
        shortens under pressure, oldest frames first."""
        if self._pending_bytes <= self.pending_max_bytes:
            return []
        victims = sorted(
            (
                (k, fs)
                for k, fs in self._pending.items()
                if k in self._pending_rows
            ),
            key=lambda kv: kv[1].first_ms,
        )
        dispatch = []
        projected = self._pending_bytes
        for key, fs in victims:
            if projected <= self.pending_max_bytes:
                break
            dispatch.append((key, fs))
            projected -= self._rows_nbytes(self._pending_rows[key])
        if not dispatch:
            return []
        return self._dispatch_pending(dispatch, int(self.clock() * 1000))

    def start_expiry_timer(
        self, interval_s: float | None = None, alive=None
    ) -> None:
        """Daemon ticker firing ``expire_pending`` so the production door
        is never weaker than the FSM door's ProcessingTimeTimeout.  The
        default cadence (TTL/4, floor 50 ms) bounds expiry lag on a
        silent stream to TTL + cadence.  Idle cost is one Event.wait —
        no Spark job runs unless a frame actually expired.

        ``alive`` (optional zero-arg callable) ties the ticker's lifetime
        to the owning StreamingQuery: when it returns falsy the loop
        exits on its own, so a query that dies on an error (or is
        stopped without ``stop_expiry_timer``) cannot leave a ticker
        appending expired frames to a dead stream's sink.  A tick
        failure is retained in ``timer_error`` AND re-raised into the
        next micro-batch (failing the query, Spark's error surface) —
        it is never silently swallowed."""
        if self._timer_stop is not None:
            return
        stop = threading.Event()
        self._timer_stop = stop
        iv = (
            interval_s
            if interval_s is not None
            else max(self.frame_ttl_ms / 4000.0, 0.05)
        )

        def _loop():
            while not stop.wait(iv):
                if alive is not None:
                    try:
                        ok = alive()
                    except BaseException:  # session torn down mid-check
                        ok = False
                    if not ok:
                        break
                try:
                    self.expire_pending()
                except BaseException as e:  # noqa: BLE001 — surfaced via timer_error
                    self.timer_error = e

        t = threading.Thread(
            target=_loop, daemon=True, name="nexus-direct-expiry"
        )
        t.start()
        self._timer_thread = t

    def stop_expiry_timer(self) -> None:
        if self._timer_stop is not None:
            self._timer_stop.set()
            if self._timer_thread is not None:
                self._timer_thread.join(timeout=10)
            self._timer_stop = None
            self._timer_thread = None

    # ---- helpers ----
    def _clean(self, msgs: DataFrame, cross_rejects, dup_in_batch) -> DataFrame:
        """Apply the (rare) duplicate-rejection transforms to the batch's
        message rows.  Cross-batch rejects anti-join a tiny local
        relation; within-batch duplicates keep the row minimizing
        (size(channel), veto_flags) — deterministic and, for the
        redelivery case (identical payloads), value-identical to the
        FSM's arbitrary first-wins."""
        out = msgs
        if cross_rejects:
            rej = msgs.sparkSession.createDataFrame(
                [(*k, d) for k, d in cross_rejects],
                "ts_us long, period_number long, protons_per_pulse int, "
                "running boolean, frame_number long, digitizer_id int",
            )
            out = out.join(
                F.broadcast(rej), [*_KEY_US, "digitizer_id"], "left_anti"
            )
        if dup_in_batch:
            from pyspark.sql import Window

            w = Window.partitionBy(*_KEY_US, "digitizer_id").orderBy(
                F.size("channel"), "veto_flags"
            )
            out = (
                out.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        return out

    def _pending_local(self, spark: SparkSession, keys) -> DataFrame | None:
        rows = [r for k in keys for r in self._pending_rows.get(k, [])]
        if not rows:
            return None
        return spark.createDataFrame(rows, _MSG_US_SCHEMA)

    def _write(
        self, spark, msgs, dim_vals, null_rows, per_run,
        dispatched_keys, cross_rejects, dup_in_batch,
    ) -> None:
        """Job 2: one broadcast-join + posexplode append.  Single-run
        batches write the run's partition directory directly; a batch
        spanning a run transition writes all runs in ONE partitionBy
        job (all-or-nothing, as nexus_stream).  ``msgs=None`` is the
        expiry-tick path: the event source is the driver-held carried
        rows alone (a local relation — no scan, no shuffle)."""
        single = len(per_run) == 1
        dim_local = spark.createDataFrame(dim_vals, _DIM_SCHEMA)
        ev_src = None
        if msgs is not None:
            ev_src = self._clean(msgs, cross_rejects, dup_in_batch).filter(
                F.size("channel") > 0
            )
        carried = self._pending_local(spark, dispatched_keys)
        if carried is not None:
            carried = carried.filter(F.size("channel") > 0)
            ev_src = (
                carried if ev_src is None else ev_src.unionByName(carried)
            )
        out = None
        if ev_src is not None:
            out = _events_us_with_dim(
                ev_src, dim_local, with_run_col=not single, outer=False
            )
            n_out = self.write_coalesce
            if n_out is None:
                n_out = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
            if n_out:
                out = out.coalesce(n_out)
        if null_rows:
            schema = _NULL_ROW_SCHEMA if single else (
                "run_name string, " + _NULL_ROW_SCHEMA
            )
            vals = [r[1:] for r in null_rows] if single else null_rows
            nr = spark.createDataFrame(vals, schema)
            out = nr if out is None else out.unionByName(nr)
        if out is None:
            return
        if single:
            (run_name,) = per_run
            out.write.mode("append").option("compression", "snappy").parquet(
                os.path.join(self.path, f"run_name={_quote(run_name)}")
            )
        else:
            (
                out.write.mode("append")
                .option("compression", "snappy")
                .partitionBy("run_name")
                .parquet(self.path)
            )

    def _pull_kept_rows(self, msgs, keys, cross_rejects, dup_in_batch) -> None:
        """Collect the batch's rows belonging to still-pending frames
        (a frame split across a batch boundary — typically <= 1 frame).
        Stored driver-side and re-joined as a local relation when the
        frame dispatches.  ``keys``: the pending frames that received
        rows in THIS batch."""
        keys = list(keys)
        cond = None
        for k in keys:
            this = (
                (F.col("ts_us") == F.lit(k[0]))
                & (F.col("period_number") == F.lit(k[1]))
                & (F.col("protons_per_pulse") == F.lit(k[2]))
                & (F.col("running") == F.lit(k[3]))
                & (F.col("frame_number") == F.lit(k[4]))
            )
            cond = this if cond is None else (cond | this)
        pulled = self._clean(msgs, cross_rejects, dup_in_batch).filter(cond).collect()
        for r in pulled:
            key = (
                r.ts_us, r.period_number, r.protons_per_pulse,
                r.running, r.frame_number,
            )
            row = (
                *key, int(r.digitizer_id), int(r.veto_flags),
                list(r.channel), list(r.event_time), list(r.event_voltage),
            )
            self._pending_rows.setdefault(key, []).append(row)
            self._pending_bytes += self._rows_nbytes([row])


def write_nexus_direct(
    messages: DataFrame,
    runs: DataFrame,
    path: str,
    checkpoint: str,
    expected_digitizers: list[int],
    frame_ttl_ms: int = 500,
    tombstone_ttl_ms: int = 2000,
    trigger: dict | None = None,
    expiry_timer: bool = True,
    pending_max_bytes: int = 256 << 20,
):
    """Start the fused direct door over a dev2 message stream
    (DIGITISER_MESSAGE_SCHEMA).  Returns the StreamingQuery (with the
    writer attached as ``query.direct_writer``).

    ``expiry_timer`` keeps the silent-stream TTL guarantee on by
    default: a daemon ticker dispatches expired pending frames even
    when no micro-batch runs (a stateless foreachBatch plan gets no
    no-data batches).  The thread is daemonized and idles on one
    Event.wait; call ``query.direct_writer.stop_expiry_timer()`` on
    teardown for a deterministic join."""
    writer = DirectNexusWriter(
        runs, path, expected_digitizers, frame_ttl_ms, tombstone_ttl_ms,
        pending_max_bytes=pending_max_bytes,
    )
    q = messages.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint
    )
    trig = trigger or {"availableNow": True}
    q = q.trigger(**trig)
    query = q.start()
    # finite triggers terminate with pending state parked (same as the
    # FSM door, whose timers also stop with the query) — a ticker that
    # outlived the query would mutate the sink after termination.  The
    # liveness probe below makes that guarantee unconditional: even if
    # the query dies on an error (or q.stop() without stop_expiry_timer),
    # the loop sees isActive go false and exits on its own.
    if expiry_timer and not (trig.get("availableNow") or trig.get("once")):

        def _alive() -> bool:
            try:
                return bool(query.isActive)
            except BaseException:  # session gone — definitely not alive
                return False

        writer.start_expiry_timer(alive=_alive)
    query.direct_writer = writer
    return query
