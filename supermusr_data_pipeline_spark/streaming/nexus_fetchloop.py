"""Fetch-loop NeXus door: an in-process Kafka consumer driving frame
assembly and the per-run Parquet append directly — no micro-batch.

Why this door exists: the 1 s sink-commit budget.  The reference
nexus-writer is a plain Kafka consumer polling every 200 ms and
flushing per message (nexus-writer/src/main.rs:105-107), so its
commit latency is poll cadence + write time — well under 1 s.  Every
micro-batch topology measured in this repo pays a FIXED ~1.0-1.3 s
trigger cycle before any useful work (BENCH_LOCAL
``cycle_decomposition``: trigger 1.299 s, of which add_batch 0.972 —
offset planning, Python-source round trips, commit-log writes), so no
foreachBatch arrangement can reach the budget (VERDICT r11 "what's
wrong" #1: direct-door steady p50 band [1.57, 2.11] s, floor measured).
Spark 4.1 offers no lower-latency trigger for this plan shape: the
continuous trigger supports neither ``foreachBatch`` nor Python data
sources, and ``availableNow`` terminates.  The remaining move is
topology-level — run the LATENCY-critical admission path as its own
fetch loop (the broker client is already in-process) and keep the
exactly-once bookkeeping protocol the micro-batch doors proved out.

What stays identical to the direct door (streaming/nexus_direct.py):

* the frame FSM — first-arrival TTL, completeness on the expected
  digitiser set, duplicate (frame, digitiser) rejection, tombstoned
  late-message rejection (digitiser-aggregator/src/frame/cache.rs);
* run matching + frame sequencing (J1 predicate,
  run_engine/run/run_parameters.rs:156-175) with per-run continuation
  totals;
* the sink LAYOUT — ``run_name=<escaped>`` partition directories of
  snappy Parquet with the NEXUS event schema, byte-compatible with
  what ``partitionBy("run_name")`` produces, so every downstream
  Spark/DuckDB query reads this door's output unchanged;
* crash safety by WRITE-AHEAD INTENT + state sidecar (tmp+rename, one
  small file each — S3-PUT-portable, as nexus_direct documents).

What changes: decode (``dev2_arrow_batch``, the same vectorized
whole-column walker the wire source fuses), assembly bookkeeping, and
the Parquet append all run in the loop thread on Arrow tables — no
Spark job in the hot path, so commit latency is poll cadence + decode
+ append (~tens of ms at the 32x500 shape) instead of the micro-batch
cycle.  The INTENT here is strictly STRONGER than the direct door's:
it carries the tmp->final RENAME LIST of part files already staged on
disk, so recovery can FINISH a half-landed multi-run append
idempotently per-run (atomic renames) instead of only deciding
landed/not-landed wholesale — and the event table is written exactly
ONCE per commit (the earlier intent_rows.parquet sidecar wrote it
twice, and was the dominant commit term at 2x the bar shape).

Exactly-once protocol (mirrors ``nexus_direct`` but the "engine
replay" is replaced by a HELD-BACK OFFSET CURSOR — the consumer-group
rule of committing only fully-processed positions):

1. poll advances the in-memory fetch cursor; decoded rows feed the FSM;
2. on dispatch: stage each run's rows as a DOT-prefixed tmp part file
   inside its run directory (invisible to Spark's listing and to
   ``*.parquet`` globs);
3. write ``intent.json`` = {persisted offsets, pre-batch totals,
   per-run (frames, rows) deltas, dispatched frame keys, the rename
   list} (tmp+rename — the commit point);
4. PUBLISH: ``os.replace`` each tmp to its final part name (atomic);
5. persist ``state.json`` (offsets, totals, tombstones) and delete the
   intent.

A crash before 3 leaves only invisible tmps (swept on recovery) and an
unadvanced persisted cursor — the records replay and the frames
re-assemble, correctly, because they never landed.  A crash after 3
recovers by re-running 4 idempotently (a final that exists already
published; a surviving tmp renames now), re-arming the dispatched
frames' tombstones, and adopting the intent's offsets/totals.

The PERSISTED cursor is held back to the pre-poll position of the
OLDEST still-pending frame (each frame snapshots the cursor at its
creation), so a crash replays every record a pending frame had
admitted — pending state itself never needs checkpointing, exactly the
replay-over-checkpoint trade the reference makes with its in-memory
frame cache.  Replayed records of already-DISPATCHED frames are
rejected by the persisted tombstones (re-armed to a fresh TTL on
load); the replay window is bounded by the frame TTL of tape, and the
constructor DERIVES the tombstone TTL past it (frame TTL + poll slack)
so no configuration can prune a tombstone while its records are still
replayable.  Recovery of a surviving intent finishes the publish step
idempotently from the rename list, then offsets/totals adopt the
intent's values — so the sink append is exactly-once across crashes at
EVERY step.

Durability scope: "crash" above means PROCESS crash (kill -9, OOM,
exception), which is what every test in the suite simulates — the
default mode issues no fsync, so an OS-level power cut can reorder a
rename ahead of its data and surface a truncated file at a final name.
``durability="power"`` closes that: fsync the staged part and intent
tmp files before their renames and the parent directories after, at
the cost of a few ms of commit latency per dispatch (still far inside
the 1 s budget; the default stays fsync-free because the soaks measure
the reference's own posture — a plain consumer process whose broker,
not filesystem, is the source of truth for replay).

Scale posture (100 TB honesty): this door is the real-time WRITER for
one instrument stream — the reference's own deployment shape (one
nexus-writer process per beamline; 32 digitisers x 500 events x 50 fps
= 13 MB/s, three orders of magnitude under a single core's Parquet
throughput).  Fan-out across instruments/topics is process-per-stream,
exactly like the reference.  Analytics at scale stay on the Spark
doors; the sink layout being identical is what makes that split free.
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .nexus_stream import _quote

_EVENT_SCHEMA = pa.schema(
    [
        ("frame_seq", pa.int64()),
        ("event_time_zero", pa.int64()),
        ("event_index", pa.int64()),
        ("period_number", pa.int64()),
        ("frame_number", pa.int64()),
        ("frame_complete", pa.bool_()),
        ("running", pa.bool_()),
        ("veto_flags", pa.int32()),
        ("event_time_offset", pa.int64()),
        ("event_id", pa.int32()),
        ("pulse_height", pa.float64()),
    ]
)



class _FrameState:
    __slots__ = (
        "dids", "veto", "first_ms", "n_events", "batches", "floor",
        "complete",
    )

    def __init__(self, first_ms: int, floor: dict[str, int]):
        self.dids: set[int] = set()
        self.veto = 0
        self.first_ms = first_ms
        self.n_events = 0
        # aev2 input: the message CARRIES the completeness verdict (the
        # aggregator already judged it); None = derive from dids
        self.complete: bool | None = None
        # per-arrival single-frame Arrow slices (decoded rows belonging
        # to this frame), concatenated at dispatch
        self.batches: list[pa.RecordBatch] = []
        # the fetch cursor as of this frame's FIRST arrival: the
        # persisted cursor never advances past the oldest pending floor,
        # so a crash replays every record this frame had admitted
        self.floor = floor


def _fsync_path(path: str) -> None:
    """fsync a file or directory by path (``durability='power'`` only:
    makes a preceding write/rename survive an OS power cut, not just a
    process crash)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _runs_rows(runs) -> list[dict]:
    """Accept the RUN_SCHEMA Spark DataFrame the other doors take (one
    driver-side collect — runs are a tiny dimension) or a pre-collected
    list of {run_name, from_us, until_us} dicts."""
    if isinstance(runs, list):
        return runs
    from pyspark.sql import functions as F

    return [
        r.asDict()
        for r in runs.select(
            "run_name",
            F.unix_micros("collect_from").alias("from_us"),
            F.unix_micros("collect_until").alias("until_us"),
        ).collect()
    ]


class FetchLoopNexusWriter:
    """``start()`` spawns the loop thread; ``stop()`` drains and joins.
    Alternatively ``poll_once()`` runs one iteration inline (tests and
    crash-at-step fixtures drive it this way)."""

    def __init__(
        self,
        runs,
        path: str,
        expected_digitizers: list[int],
        bootstrap: str,
        topics: list[str],
        frame_ttl_ms: int = 500,
        tombstone_ttl_ms: int = 2000,
        state_dir: str | None = None,
        on_commit=None,
        clock=time.time,
        poll_ms: int = 20,
        security=None,
        starting_offsets: str = "earliest",
        consumer_factory=None,
        input_format: str = "dev2",
        durability: str = "process",
    ):
        """``input_format``: 'dev2' (digitiser messages — this door runs
        the aggregator's frame FSM itself, the fused deployment) or
        'aev2' (pre-assembled FrameAssembledEventList messages — the
        reference nexus-writer's EXACT input, nexus-writer/src/main.rs:
        one message per frame, completeness judged upstream by the
        aggregator, so admission is decode -> tombstone-dedupe ->
        dispatch with no FSM wait)."""
        if input_format not in ("dev2", "aev2"):
            raise ValueError(
                f"input_format={input_format!r}: 'dev2' or 'aev2'"
            )
        if durability not in ("process", "power"):
            raise ValueError(
                f"durability={durability!r}: 'process' or 'power'"
            )
        self.input_format = input_format
        # 'process' (default): atomic tmp+rename, safe against process
        # crashes (what the suite simulates).  'power': additionally
        # fsync data before renames and directories after, so an OS
        # power cut cannot surface a truncated file at a final name.
        self._fsync = durability == "power"
        # directories whose OWN directory entry (in their parent) has
        # been fsynced — a dirent is durable once, so the hot commit
        # path pays the parent-directory fsync only when a run dir or
        # the state dir is first created, not per dispatch
        self._durable_dirs: set[str] = set()
        self.runs_rows = _runs_rows(runs)
        self.path = path
        self.expected = sorted(int(d) for d in expected_digitizers)
        self.bootstrap = bootstrap
        self.topics = list(topics)
        self.frame_ttl_ms = frame_ttl_ms
        # exactly-once across a crash REQUIRES the tombstone to outlive
        # the replay window: the persisted cursor is held back to the
        # oldest pending frame's floor (<= frame_ttl of tape plus a poll
        # period of scheduling slack), so a dispatched frame's records
        # can replay for up to that long after its dispatch.  If the
        # frame's tombstone expired, was pruned from memory, and the
        # pruned set was persisted by a later dispatch's _save_state
        # before the crash, the replayed records re-assemble the frame
        # and append its rows twice.  Derive rather than reject: a
        # shorter explicit tombstone TTL is never what the caller means,
        # and the raised floor costs only ~frame-rate x frame_ttl
        # tombstone entries (50 fps x 15 s = 750 tuples).
        self.tombstone_ttl_ms = max(
            tombstone_ttl_ms, frame_ttl_ms + max(2 * poll_ms, 250)
        )
        self.state_dir = state_dir or os.path.join(path, "_fetchloop_state")
        self.on_commit = on_commit
        self.clock = clock
        self.poll_ms = poll_ms
        self.security = security
        self.starting_offsets = starting_offsets
        self._consumer_factory = consumer_factory
        self._pending: dict[tuple, _FrameState] = {}
        self._tombstones: dict[tuple, int] = {}
        self._totals: dict[str, tuple[int, int]] = {}
        self._offsets: dict[str, int] = {}  # "topic/pid" -> next offset
        self._loaded = False
        self._consumer = None
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.loop_error: BaseException | None = None
        self.commit_log: list[dict] = []  # per-append timing observability
        self.poll_log: list[dict] = []  # per-cycle poll/process split
        self._file_seq = 0  # monotone per-writer part index (debuggability)

    # ---- sidecar paths ----
    def _state_file(self) -> str:
        return os.path.join(self.state_dir, "state.json")

    def _intent_file(self) -> str:
        return os.path.join(self.state_dir, "intent.json")

    # ---- totals derivation (recovery fallback; pyarrow, no Spark) ----
    def _totals_from_sink(self) -> dict[str, tuple[int, int]]:
        totals: dict[str, tuple[int, int]] = {}
        if not os.path.isdir(self.path):
            return totals
        from .nexus_stream import _unquote

        for name in os.listdir(self.path):
            if not name.startswith("run_name="):
                continue
            run_dir = os.path.join(self.path, name)
            files = [
                os.path.join(run_dir, f)
                for f in os.listdir(run_dir)
                if f.endswith(".parquet")
            ]
            if not files:
                continue
            n_rows = 0
            max_seq = -1
            for f in files:
                t = pq.read_table(f, columns=["frame_seq"])
                n_rows += t.num_rows
                if t.num_rows:
                    max_seq = max(
                        max_seq, int(pa.compute.max(t.column(0)).as_py())
                    )
            totals[_unquote(name[len("run_name="):])] = (max_seq + 1, n_rows)
        return totals

    # ---- state persistence ----
    def _persist_offsets(self) -> dict[str, int]:
        """The cursor safe to persist: the in-memory fetch position,
        held back per partition to the creation-time floor of every
        still-pending frame."""
        out = dict(self._offsets)
        for fs in self._pending.values():
            for k, v in fs.floor.items():
                out[k] = min(out.get(k, v), v)
        return out

    def _save_state(self) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "offsets": self._persist_offsets(),
                    "totals": {k: list(v) for k, v in self._totals.items()},
                    "tombstones": [
                        [list(k), e] for k, e in self._tombstones.items()
                    ],
                },
                fh,
            )
            if self._fsync:
                fh.flush()
                os.fsync(fh.fileno())
        os.replace(tmp, self._state_file())
        if self._fsync:
            _fsync_path(self.state_dir)
            self._ensure_state_dir_durable()

    def _ensure_state_dir_durable(self) -> None:
        """Power mode: the state dir's own DIRECTORY ENTRY must be
        durable once, or a power cut after the very first state write
        can lose state.json entirely (cursor regresses to the starting
        policy, persisted tombstones vanish).  Covers a custom
        ``state_dir`` outside ``self.path`` too."""
        if self.state_dir not in self._durable_dirs:
            _fsync_path(os.path.dirname(self.state_dir) or ".")
            self._durable_dirs.add(self.state_dir)

    def _load_state(self) -> None:
        """Resume: state.json -> offsets/totals/tombstones; a surviving
        intent is FINISHED per run (append the missing runs' slices from
        the intent table), then its post-offsets/totals adopted.
        Pending (undispatched) frames are deliberately NOT persisted:
        their records sit at offsets >= the cursor, so the resumed loop
        re-fetches and re-assembles them — the replay-is-cheaper-than-
        checkpointing trade the reference makes (its cache is process
        memory too)."""
        if self._loaded:
            return
        if os.path.isfile(self._state_file()):
            with open(self._state_file()) as fh:
                st = json.load(fh)
            self._offsets = {k: int(v) for k, v in st["offsets"].items()}
            self._totals = {
                k: (int(a), int(b)) for k, (a, b) in st["totals"].items()
            }
            # re-arm every persisted tombstone to a FRESH TTL: the
            # held-back cursor replays up to ~frame-TTL of tape, and
            # those records' dispatched frames must still reject
            now_ms = int(self.clock() * 1000)
            self._tombstones = {
                tuple(k): now_ms + self.tombstone_ttl_ms
                for k, _e in st.get("tombstones", [])
            }
        else:
            self._totals = self._totals_from_sink()
        if os.path.isfile(self._intent_file()):
            with open(self._intent_file()) as fh:
                intent = json.load(fh)
            # finish the publish idempotently: a final that exists
            # already landed before the crash; a surviving tmp renames
            # now (atomic os.replace — this is the only writer of these
            # names, uuid-unique per dispatch)
            self._publish_renames(intent.get("renames", []))
            # re-arm the dispatched frames' tombstones: the adopted
            # cursor below is held back to any crash-time pending
            # frame's floor, so the loop will replay this dispatch's
            # records — they must reject, not re-assemble (exactly-once)
            now_ms = int(self.clock() * 1000)
            for k in intent.get("frame_keys", []):
                self._tombstones[tuple(k)] = now_ms + self.tombstone_ttl_ms
            self._offsets = {
                k: int(v) for k, v in intent["offsets"].items()
            }
            self._totals.update(
                {
                    run: (pre[0] + intent["deltas"][run][0],
                          pre[1] + intent["deltas"][run][1])
                    for run, pre in (
                        (r, intent["pre_totals"][r])
                        for r in intent["pre_totals"]
                    )
                }
            )
            self._save_state()
            os.remove(self._intent_file())
        # sweep staged-part orphans from a crash BEFORE the intent was
        # written (the dispatch never committed — its records replay
        # from the unadvanced cursor): the dot-prefixed tmp names are
        # invisible to readers but would otherwise accumulate forever.
        # Runs after intent recovery, which consumes its own tmps.
        if os.path.isdir(self.path):
            for name in os.listdir(self.path):
                if not name.startswith("run_name="):
                    continue
                run_dir = os.path.join(self.path, name)
                for f in os.listdir(run_dir):
                    if f.startswith(".part-fetchloop-") and f.endswith(".tmp"):
                        os.remove(os.path.join(run_dir, f))
        self._loaded = True

    # ---- consumer ----
    def _make_consumer(self):
        if self._consumer_factory is not None:
            c = self._consumer_factory()
        else:
            from ..kafka.client import MiniConsumer

            c = MiniConsumer(
                self.bootstrap,
                self.topics,
                starting_offsets=self.starting_offsets,
                security=self.security,
                client_id="nexus-fetchloop",
            )
        # resume the cursor: saved offsets override the starting policy.
        # seek() is part of the consumer_factory contract — it applies
        # only partitions in the consumer's CURRENT assignment, so saved
        # offsets for topics no longer subscribed are dropped rather
        # than injected into the poll loop.
        c.seek(
            {
                (key.rpartition("/")[0], int(key.rpartition("/")[2])): off
                for key, off in self._offsets.items()
            }
        )
        return c

    # ---- the loop ----
    def start(self) -> None:
        if self._thread is not None:
            raise RuntimeError("already started")
        self._stop.clear()

        def _loop():
            try:
                with self._lock:
                    self._load_state()
                # the consumer dials lazily inside poll_once, so a
                # TRANSIENT startup failure (broker mid-bounce, group
                # coordination race) lands in the same retry path as a
                # mid-stream disconnect instead of killing the loop;
                # _load_state failures above still fail loudly
                while not self._stop.is_set():
                    try:
                        self.poll_once()
                    except (OSError, ConnectionError):
                        # broker bounce / leadership move the router
                        # retry did not absorb: re-dial and continue
                        # from the in-memory cursor (the reference's
                        # reconnect posture, common/src/lib.rs:72-94)
                        with self._lock:
                            if self._consumer is not None:
                                self._consumer.close()
                                self._consumer = None
                        self._stop.wait(0.1)
            except BaseException as e:  # surfaced via check_error()
                self.loop_error = e

        self._thread = threading.Thread(
            target=_loop, daemon=True, name="nexus-fetchloop"
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        if self._consumer is not None:
            self._consumer.close()
            self._consumer = None
        self.check_error()

    def check_error(self) -> None:
        if self.loop_error is not None:
            err, self.loop_error = self.loop_error, None
            raise RuntimeError("fetch loop failed; see cause") from err

    def poll_once(self, records=None) -> list[int]:
        """One iteration: poll (unless ``records`` is injected by a
        test), admit, dispatch, append, persist.  Returns the committed
        frame numbers."""
        with self._lock:
            self._load_state()
            t0 = time.perf_counter()
            if records is None:
                if self._consumer is None:
                    self._consumer = self._make_consumer()
                records = self._consumer.poll(max_wait_ms=self.poll_ms)
            t_poll = time.perf_counter()
            out = self._process(records)
            # per-cycle decomposition (poll wait vs processing, record
            # count) — the loop-throughput attribution the commit_log's
            # per-DISPATCH split cannot give (cycles with no dispatch
            # never reach it).  Same bounded-ring discipline.
            self.poll_log.append(
                {
                    "poll_s": round(t_poll - t0, 5),
                    "process_s": round(time.perf_counter() - t_poll, 5),
                    "n_records": len(records),
                    "n_committed": len(out),
                }
            )
            if len(self.poll_log) > 50_000:
                del self.poll_log[:25_000]
            return out

    def _process(self, records) -> list[int]:
        t_start = time.perf_counter()
        now_ms = int(self.clock() * 1000)
        pre_poll = dict(self._offsets)
        new_offsets = dict(self._offsets)
        poll_min: dict[str, int] = {}
        values = []
        for r in records:
            k = f"{r.topic}/{r.partition}"
            new_offsets[k] = r.offset + 1
            poll_min[k] = min(poll_min.get(k, r.offset), r.offset)
            values.append(r.value)
        # a frame admitted from this poll can be replayed from here: the
        # pre-poll cursor, extended with this poll's first offset for
        # partitions the cursor has never consumed
        floor_map = {
            k: pre_poll.get(k, poll_min.get(k))
            for k in set(pre_poll) | set(poll_min)
        }
        rb = None
        if values:
            from ..sources.decode import aev2_arrow_batch, dev2_arrow_batch

            fn = (
                dev2_arrow_batch if self.input_format == "dev2"
                else aev2_arrow_batch
            )
            rb = fn(pa.array(values, pa.binary()))
            if rb.num_rows == 0:
                rb = None
        if rb is not None:
            if self.input_format == "dev2":
                self._admit(rb, now_ms, floor_map)
            else:
                self._admit_aev2(rb, now_ms, floor_map)
        t_decode = time.perf_counter()

        # dispatch: complete now, or first-arrival TTL expired
        dispatch = []
        for key, fs in list(self._pending.items()):
            if sorted(fs.dids) == self.expected or (
                now_ms - fs.first_ms >= self.frame_ttl_ms
            ):
                dispatch.append((key, fs))
                del self._pending[key]
                self._tombstones[key] = now_ms + self.tombstone_ttl_ms
        for key in [k for k, e in self._tombstones.items() if e <= now_ms]:
            del self._tombstones[key]

        frames: list[int] = []
        if dispatch:
            frames = self._dispatch(dispatch, new_offsets, t_start, t_decode)
        else:
            self._offsets = new_offsets
            # no sink effect: the cursor may persist lazily; records not
            # yet persisted re-poll after a crash and are FSM-idempotent
            # (duplicates reject, tombstones reject)
        return frames

    def _admit_aev2(self, rb: pa.RecordBatch, now_ms: int, floor_map) -> None:
        """aev2 admission: every message is one COMPLETE-or-judged frame
        (the aggregator already ran the FSM), so each decoded row goes
        straight to pending with its carried completeness flag — the
        next dispatch pass emits it immediately (first_ms set past-TTL).
        Tombstones still dedupe re-delivered frame messages."""
        ts_us = rb.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        per = rb.column("period_number").to_numpy(zero_copy_only=False)
        ppp = rb.column("protons_per_pulse").to_numpy(zero_copy_only=False)
        run = rb.column("running").to_numpy(zero_copy_only=False)
        fno = rb.column("frame_number").to_numpy(zero_copy_only=False)
        veto = rb.column("veto_flags").to_numpy(zero_copy_only=False)
        comp = rb.column("complete").to_numpy(zero_copy_only=False)
        n_ev = pa.compute.list_value_length(
            rb.column("channel")
        ).to_numpy(zero_copy_only=False)
        for i in range(rb.num_rows):
            key = (
                int(ts_us[i]), int(per[i]), int(ppp[i]), bool(run[i]),
                int(fno[i]),
            )
            if key in self._tombstones:
                # re-delivered after dispatch: reject, re-arm
                self._tombstones[key] = now_ms + self.tombstone_ttl_ms
                continue
            if key in self._pending:
                continue  # duplicate within the poll: first copy wins
            fs = _FrameState(now_ms - self.frame_ttl_ms, dict(floor_map))
            fs.veto = int(veto[i])
            fs.n_events = int(n_ev[i])
            fs.complete = bool(comp[i])
            fs.batches.append(rb.take(pa.array([i], pa.int64())))
            self._pending[key] = fs

    def _admit(self, rb: pa.RecordBatch, now_ms: int, floor_map) -> None:
        """The FSM over one decoded Arrow batch: group rows by frame
        key, apply tombstone / duplicate rules, accumulate veto + event
        counts, stash each frame's row slice for its dispatch."""
        ts_us = rb.column(1).cast(pa.int64()).to_numpy(zero_copy_only=False)
        per = rb.column(2).to_numpy(zero_copy_only=False)
        ppp = rb.column(3).to_numpy(zero_copy_only=False)
        run = rb.column(4).to_numpy(zero_copy_only=False)
        fno = rb.column(5).to_numpy(zero_copy_only=False)
        did = rb.column(0).to_numpy(zero_copy_only=False)
        veto = rb.column(6).to_numpy(zero_copy_only=False)
        ch = rb.column(7)
        n_ev = pa.compute.list_value_length(ch).to_numpy(zero_copy_only=False)
        order = np.lexsort((veto, n_ev, did, fno, ts_us))
        keep_rows: dict[tuple, list[int]] = {}
        for i in map(int, order):
            key = (
                int(ts_us[i]), int(per[i]), int(ppp[i]), bool(run[i]),
                int(fno[i]),
            )
            if key in self._tombstones:
                self._tombstones[key] = (
                    int(self.clock() * 1000) + self.tombstone_ttl_ms
                )
                continue
            fs = self._pending.get(key)
            if fs is None:
                fs = self._pending[key] = _FrameState(now_ms, dict(floor_map))
            else:
                # rows arriving in LATER polls may touch partitions the
                # frame's floor has never seen: pin them at this poll's
                # replay point (older floors stay — they are smaller)
                for k, v in floor_map.items():
                    fs.floor.setdefault(k, v)
            d = int(did[i])
            if d in fs.dids:
                continue  # duplicate (frame, digitiser): reject wholesale
            fs.dids.add(d)
            fs.veto |= int(veto[i])
            fs.n_events += int(n_ev[i])
            keep_rows.setdefault(key, []).append(i)
        for key, idxs in keep_rows.items():
            self._pending[key].batches.append(
                rb.take(pa.array(sorted(idxs), pa.int64()))
            )

    def _match_runs(self, dispatch):
        """Identical decision table to DirectNexusWriter._match_runs
        (driver-side J1 + sequencing), returning per-frame dim tuples."""
        dispatch.sort(key=lambda kf: (kf[0][0], kf[0][4]))
        per_run: dict[str, tuple[int, int]] = {}
        dims = []  # (run_name, key, fs, seq, etz, idx)
        frames: list[int] = []
        for run in self.runs_rows:
            for key, fs in dispatch:
                ts_us = key[0]
                if run["from_us"] < ts_us and (
                    run["until_us"] is None or ts_us < run["until_us"]
                ):
                    seq, idx = per_run.get(
                        run["run_name"],
                        self._totals.get(run["run_name"], (0, 0)),
                    )
                    dims.append(
                        (
                            run["run_name"], key, fs, seq,
                            (ts_us - run["from_us"]) * 1000, idx,
                        )
                    )
                    per_run[run["run_name"]] = (
                        seq + 1, idx + max(fs.n_events, 1)
                    )
                    frames.append(int(key[4]))
        return dims, per_run, frames

    def _build_run_tables(self, dims) -> dict[str, pa.Table]:
        """The posexplode equivalent in Arrow, grouped PER RUN: repeat
        each frame's dim row across its event arrays; a zero-event frame
        contributes one null-event row.  Building per-run tables
        directly (instead of one table with a run_name column filtered
        per run) skips the string column, the equality masks, and the
        filter passes — with the numpy-backed constant columns this
        halved the dominant ``parts`` term of the commit at 2x the bar
        shape (64x500)."""
        per_run: dict[str, list[pa.Table]] = {}
        for run_name, key, fs, seq, etz, idx in dims:
            if fs.batches:
                ev = pa.Table.from_batches(fs.batches)
                ch = ev.column("channel").combine_chunks()
                n = int(
                    pa.compute.sum(
                        pa.compute.list_value_length(ch)
                    ).as_py()
                    or 0
                )
            else:
                n = 0
            complete = (
                fs.complete if fs.complete is not None
                else sorted(fs.dids) == self.expected
            )
            if n == 0:
                per_run.setdefault(run_name, []).append(
                    pa.table(
                        {
                            "frame_seq": [seq],
                            "event_time_zero": [etz],
                            "event_index": [idx],
                            "period_number": [key[1]],
                            "frame_number": [key[4]],
                            "frame_complete": [complete],
                            "running": [key[3]],
                            "veto_flags": pa.array(
                                [fs.veto], pa.int32()
                            ),
                            "event_time_offset": pa.array(
                                [None], pa.int64()
                            ),
                            "event_id": pa.array([None], pa.int32()),
                            "pulse_height": pa.array(
                                [None], pa.float64()
                            ),
                        },
                        schema=_EVENT_SCHEMA,
                    )
                )
                continue
            times = ev.column("event_time").combine_chunks()
            volts = ev.column("event_voltage").combine_chunks()

            def _rep(val, dtype, n=n):
                # np.full + zero-copy into Arrow: ~2x faster than
                # materializing a python list per constant column
                return pa.array(np.full(n, val, dtype))

            per_run.setdefault(run_name, []).append(
                pa.table(
                    {
                        "frame_seq": _rep(seq, np.int64),
                        "event_time_zero": _rep(etz, np.int64),
                        "event_index": _rep(idx, np.int64),
                        "period_number": _rep(key[1], np.int64),
                        "frame_number": _rep(key[4], np.int64),
                        "frame_complete": _rep(complete, bool),
                        "running": _rep(key[3], bool),
                        "veto_flags": _rep(fs.veto, np.int32),
                        "event_time_offset": times.flatten().cast(
                            pa.int64()
                        ),
                        "event_id": ch.flatten().cast(pa.int32()),
                        "pulse_height": volts.flatten().cast(
                            pa.float64()
                        ),
                    },
                    schema=_EVENT_SCHEMA,
                )
            )
        return {r: pa.concat_tables(cs) for r, cs in per_run.items()}

    def _write_run_tmp(self, run_name: str, table: pa.Table) -> list[str]:
        """Stage one run's rows as a hidden tmp part file; returns the
        ``[tmp, final]`` pair for the intent's rename list.  The final
        name is uuid-suffixed like Spark's own part files: a
        directory-count name could recur after compaction deletes files,
        and a recurring name silently overwrites.  The tmp name is
        DOT-prefixed so a crash orphan is invisible to Spark's directory
        listing (hidden-file filter) and to ``*.parquet`` globs; a
        PROCESS crash mid-write can therefore never leave a truncated
        .parquet at a final name (that would poison _totals_from_sink
        and every downstream reader).  Against an OS power cut the same
        holds only in ``durability='power'`` mode, which fsyncs the tmp
        before the publish rename and the directory after it."""
        tmp, final = self._alloc_part(run_name)
        try:
            pq.write_table(
                table.cast(_EVENT_SCHEMA), tmp, compression="snappy"
            )
            if self._fsync:
                _fsync_path(tmp)
        except BaseException:
            # the dispatch never committed (no intent yet): drop the
            # partial tmp now rather than leaving it for the next
            # restart's recovery sweep — same contract as the pooled
            # multi-part branch's error path
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
        return [tmp, final]

    def _alloc_part(self, run_name: str) -> list[str]:
        """Allocate one part's (tmp, final) path pair — single-threaded
        (mutates the monotone file sequence)."""
        run_dir = os.path.join(self.path, f"run_name={_quote(run_name)}")
        os.makedirs(run_dir, exist_ok=True)
        import uuid

        final = os.path.join(
            run_dir,
            "part-fetchloop-%d-%06d-%s.parquet"
            % (os.getpid(), self._file_seq, uuid.uuid4().hex[:8]),
        )
        self._file_seq += 1
        tmp = os.path.join(run_dir, "." + os.path.basename(final) + ".tmp")
        return [tmp, final]

    # large dispatches split into slices written concurrently: pyarrow's
    # parquet writer releases the GIL, and the write was the dominant
    # commit term at 4x the bar shape (58 ms of a ~105 ms cycle at
    # 128x500).  Below the threshold (the steady 32x500 path commits
    # one ~16k-row frame per cycle) staging stays single-file — thread
    # spawn would only add overhead there.
    _STAGE_SLICE_ROWS = 131_072

    def _stage_run_tables(self, run_tables: dict) -> list[list[str]]:
        """Stage every run's rows as one or more hidden tmp part files
        (concurrently when large); returns the rename list for the
        intent.  Part names are allocated in the caller thread — only
        the writes fan out."""
        jobs = []  # (run_name, table_slice)
        for run, t in run_tables.items():
            if t.num_rows > self._STAGE_SLICE_ROWS:
                n = min(4, (t.num_rows + self._STAGE_SLICE_ROWS - 1)
                        // self._STAGE_SLICE_ROWS)
                step = (t.num_rows + n - 1) // n
                for off in range(0, t.num_rows, step):
                    jobs.append((run, t.slice(off, step)))
            else:
                jobs.append((run, t))
        if len(jobs) == 1:
            return [self._write_run_tmp(*jobs[0])]
        # _write_run_tmp mutates _file_seq, so names are allocated here
        # in the caller thread; only the (GIL-releasing) writes fan out,
        # through a BOUNDED pool — a catch-up dispatch spanning many
        # overlapping runs must not spawn one writer thread per part
        allocated = [
            (self._alloc_part(run), tbl) for run, tbl in jobs
        ]
        errors: list = []
        next_job = iter(range(len(allocated)))
        it_lock = threading.Lock()

        def _worker():
            while True:
                with it_lock:
                    i = next(next_job, None)
                if i is None or errors:
                    return
                pair, tbl = allocated[i]
                try:
                    pq.write_table(
                        tbl.cast(_EVENT_SCHEMA), pair[0],
                        compression="snappy",
                    )
                    if self._fsync:
                        _fsync_path(pair[0])
                except BaseException as e:  # re-raised below
                    errors.append(e)
                    return

        threads = [
            threading.Thread(target=_worker, daemon=True)
            for _ in range(min(8, len(allocated)))
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if errors:
            # a failed staging never committed (the intent is not yet
            # written): drop every tmp now instead of leaving it for the
            # next restart's recovery sweep
            for (tmp, _final), _tbl in allocated:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
            raise errors[0]
        return [pair for pair, _tbl in allocated]

    def _write_intent(self, payload: dict) -> None:
        """Step 3, the commit point: the intent lands atomically or not
        at all (tmp+rename; fsync'd through in power mode so the rename
        can never beat its data to the journal)."""
        itmp = self._intent_file() + ".tmp"
        with open(itmp, "w") as fh:
            json.dump(payload, fh)
            if self._fsync:
                fh.flush()
                os.fsync(fh.fileno())
        os.replace(itmp, self._intent_file())
        if self._fsync:
            _fsync_path(self.state_dir)
            self._ensure_state_dir_durable()

    def _publish_renames(self, renames) -> None:
        """The publish step: atomic per-part renames.  Idempotent —
        recovery re-runs it for a surviving intent, where some pairs may
        already have published before the crash.  A pair with NEITHER
        file present is corruption (the intent promised rows that no
        longer exist — e.g. an un-fsynced directory entry lost to a
        power cut in the default mode, or an external job consuming the
        sink while an intent was pending): fail loudly rather than
        silently adopt totals for vanished rows.  In power mode the
        directory fsync covers every pair's directory, including pairs
        whose rename itself happened before a crash (their entries may
        not have been fsynced yet)."""
        dirs = set()
        for tmp, final in renames:
            if os.path.isfile(tmp):
                os.replace(tmp, final)
            elif not os.path.isfile(final):
                raise RuntimeError(
                    "commit corruption: neither the staged tmp nor the "
                    f"published part exists for {final} — the sink lost "
                    "rows the write-ahead intent committed"
                )
            dirs.add(os.path.dirname(final))
        if self._fsync:
            for d in dirs:
                _fsync_path(d)

    def _dispatch(
        self, dispatch, new_offsets, t_start, t_decode
    ) -> list[int]:
        dims, per_run, frames = self._match_runs(dispatch)
        if not dims:
            # no run matched: frames drop (as the other doors), but the
            # cursor still advances through a persisted state write
            self._offsets = new_offsets
            self._save_state()
            if self.on_commit is not None:
                self.on_commit([])
            return []
        run_tables = self._build_run_tables(dims)

        # stage: each run's rows land ONCE, as a hidden tmp part file
        # (step 2 of the protocol) — the intent then only needs the
        # rename list, not a copy of the event table.  The cursor must
        # be computed with the NEW fetch position already in place so
        # non-pending partitions commit.
        self._offsets = new_offsets
        os.makedirs(self.state_dir, exist_ok=True)
        deltas = {
            run: (
                per_run[run][0] - self._totals.get(run, (0, 0))[0],
                run_tables[run].num_rows,
            )
            for run in per_run
        }
        renames = self._stage_run_tables(
            {run: run_tables[run] for run in per_run}
        )
        if self._fsync:
            # the staged tmps' DIRECTORY ENTRIES must be durable before
            # the intent commits, or a power cut can lose a tmp the
            # intent promises (recovery would then see neither tmp nor
            # final and fail loudly).  The sink-root fsync covers run
            # directories' own entries and is paid only when a run dir
            # first appears, not per dispatch.
            stage_dirs = {os.path.dirname(t) for t, _f in renames}
            for d in stage_dirs:
                _fsync_path(d)
            new_dirs = stage_dirs - self._durable_dirs
            if new_dirs:
                _fsync_path(self.path)
                self._durable_dirs |= new_dirs
        t_parts = time.perf_counter()

        self._write_intent(
                {
                    "offsets": self._persist_offsets(),
                    "pre_totals": {
                        run: list(self._totals.get(run, (0, 0)))
                        for run in per_run
                    },
                    "deltas": {k: list(v) for k, v in deltas.items()},
                    # the dispatched frame keys: recovery re-arms their
                    # tombstones BEFORE resuming the loop.  The intent's
                    # offsets are held back to the floor of any frame
                    # still pending at crash time, so the resumed loop
                    # replays this dispatch's records too — without
                    # these tombstones (which were only in memory when
                    # the crash hit) the frames would re-assemble and
                    # re-append.
                    "frame_keys": [list(key) for key, _fs in dispatch],
                    # the publish list: recovery finishes these renames
                    # idempotently
                    "renames": renames,
                }
        )
        t_intent = time.perf_counter()

        self._publish_renames(renames)
        t_publish = time.perf_counter()

        self._totals.update(per_run)
        self._save_state()
        os.remove(self._intent_file())
        self.commit_log.append(
            {
                "n_frames": len(frames),
                "decode_s": round(t_decode - t_start, 5),
                "parts_s": round(t_parts - t_decode, 5),
                "intent_s": round(t_intent - t_parts, 5),
                "publish_s": round(t_publish - t_intent, 5),
                "total_s": round(time.perf_counter() - t_start, 5),
            }
        )
        if len(self.commit_log) > 20_000:
            # observability ring, not a ledger: bound driver memory on
            # long-running streams (50 dispatches/s would otherwise
            # grow it ~50 MB/day)
            del self.commit_log[:10_000]
        if self.on_commit is not None:
            self.on_commit(sorted(set(frames)))
        return frames
