"""The fused direct door (streaming/nexus_direct.py) must be
semantics-identical to the production FSM topology
(assemble_frames_stream -> NexusStreamWriter): same sink rows for the
same dev2 tape, same duplicate rejection, TTL dispatch, tombstones,
zero-event-frame rule, continuation totals, and crash-replay behavior.
The FSM door is itself row-pinned to the batch builder
(test_nexus_stream_batch_parity), so equality here chains to it."""

from datetime import datetime, timezone


from supermusr_data_pipeline_spark.streaming.frame_assembly_stream import (
    DIGITISER_MESSAGE_SCHEMA,
    assemble_frames_stream,
)
from supermusr_data_pipeline_spark.streaming.nexus_direct import (
    DirectNexusWriter,
    write_nexus_direct,
)
from supermusr_data_pipeline_spark.streaming.nexus_stream import NexusStreamWriter

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

T0_US = int(datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc).timestamp() * 1_000_000)
N_DIG = 4


def _msg(did, frame, n_events, veto=0, ev_offset=0):
    ts = datetime.fromtimestamp((T0_US + frame * 20_000) / 1e6, tz=timezone.utc)
    return (
        did, ts, frame // 1000, 4, True, frame, veto,
        [int((ev_offset + e) % 8) for e in range(n_events)],
        [int(100 * frame + 10 * (ev_offset + e)) for e in range(n_events)],
        [float(ev_offset + e) for e in range(n_events)],
    )


def _runs(spark, name="run_a", from_us=None, until_us=None):
    from pyspark.sql import functions as F

    rows = [(name, from_us or (T0_US - 1_000_000), until_us)]
    return spark.createDataFrame(
        rows, "run_name string, from_us long, until_us long"
    ).select(
        "run_name",
        F.timestamp_micros("from_us").alias("collect_from"),
        F.timestamp_micros(F.col("until_us")).alias("collect_until"),
    )


def _batch(spark, msgs):
    return spark.createDataFrame(msgs, DIGITISER_MESSAGE_SCHEMA)


def _rows(spark, path):
    df = spark.read.parquet(path)
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect()), cols


def test_direct_rows_equal_fsm_door(spark, tmp_path):
    """Same complete-frame tape through both doors -> identical sink rows."""
    msgs = [_msg(d, f, 5 + f, veto=1 << (f % 3)) for f in range(6) for d in range(N_DIG)]
    spool = str(tmp_path / "spool")
    _batch(spark, msgs).coalesce(1).write.parquet(spool)
    runs = _runs(spark)

    stream = spark.readStream.schema(DIGITISER_MESSAGE_SCHEMA).parquet(spool)
    frames = assemble_frames_stream(stream, list(range(N_DIG)), frame_ttl_ms=500)
    fsm_sink = str(tmp_path / "fsm_sink")
    q = (
        frames.writeStream.foreachBatch(NexusStreamWriter(runs, fsm_sink))
        .option("checkpointLocation", str(tmp_path / "fsm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stream2 = spark.readStream.schema(DIGITISER_MESSAGE_SCHEMA).parquet(spool)
    direct_sink = str(tmp_path / "direct_sink")
    q2 = write_nexus_direct(
        stream2, runs, direct_sink, str(tmp_path / "direct_ckpt"),
        list(range(N_DIG)),
    )
    q2.awaitTermination(120)

    fsm_rows, fsm_cols = _rows(spark, fsm_sink)
    d_rows, d_cols = _rows(spark, direct_sink)
    assert d_cols == fsm_cols
    assert d_rows == fsm_rows
    assert len(d_rows) == sum(5 + f for f in range(6)) * N_DIG


def test_zero_event_frame_single_null_row(spark, tmp_path):
    """All-empty frame -> exactly ONE null-event row counting 1 toward
    event_index (the batch builder's explode_outer rule)."""
    msgs = [_msg(d, 0, 0) for d in range(N_DIG)] + [
        _msg(d, 1, 3) for d in range(N_DIG)
    ]
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(_runs(spark), sink, list(range(N_DIG)))
    w(_batch(spark, msgs), 0)
    out = spark.read.parquet(sink)
    nulls = out.filter("event_id IS NULL").collect()
    assert len(nulls) == 1 and nulls[0].frame_number == 0
    assert nulls[0].frame_complete
    # frame 1's event_index continues from the null row's count of 1
    f1 = out.filter("frame_number = 1").collect()
    assert {r.event_index for r in f1} == {1}
    assert out.count() == 1 + 3 * N_DIG


def test_ttl_dispatch_incomplete(spark, tmp_path):
    """A frame missing a digitiser dispatches incomplete once the batch
    clock passes first-arrival + TTL; a straggler after dispatch is
    tombstone-rejected."""
    clock = [1000.0]
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    w(_batch(spark, [_msg(d, 0, 2) for d in range(N_DIG - 1)]), 0)
    import os
    assert not os.path.isdir(os.path.join(sink, "run_name=run_a"))
    clock[0] += 0.6  # past the 500 ms TTL
    w(_batch(spark, [_msg(d, 1, 2) for d in range(N_DIG)]), 1)
    out = spark.read.parquet(sink)
    f0 = out.filter("frame_number = 0").collect()
    assert len(f0) == 2 * (N_DIG - 1) and not f0[0].frame_complete
    assert out.filter("frame_number = 1").count() == 2 * N_DIG
    # straggler for frame 0: rejected by the tombstone
    w(_batch(spark, [_msg(N_DIG - 1, 0, 2)]), 2)
    assert spark.read.parquet(sink).filter("frame_number = 0").count() == 2 * (
        N_DIG - 1
    )


def test_duplicate_rejection(spark, tmp_path):
    """A duplicate (frame, digitiser) message is rejected wholesale —
    within one batch and across batches (redelivery)."""
    clock = [1000.0]
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), clock=lambda: clock[0]
    )
    # within-batch dup: digitiser 0 sends frame 0 twice (identical payload)
    w(
        _batch(
            spark,
            [_msg(0, 0, 3)] + [_msg(d, 0, 3) for d in range(N_DIG)],
        ),
        0,
    )
    out = spark.read.parquet(sink)
    assert out.filter("frame_number = 0").count() == 3 * N_DIG
    # cross-batch dup: frame 1 arrives without digitiser 3; the retry
    # redelivers digitiser 0 (different payload) alongside digitiser 3
    w(_batch(spark, [_msg(d, 1, 3) for d in range(N_DIG - 1)]), 1)
    w(_batch(spark, [_msg(0, 1, 9, ev_offset=50), _msg(N_DIG - 1, 1, 3)]), 2)
    f1 = spark.read.parquet(sink).filter("frame_number = 1")
    assert f1.count() == 3 * N_DIG  # the 9-event redelivery was rejected
    assert f1.filter("pulse_height >= 50").count() == 0
    assert f1.collect()[0].frame_complete


def test_replay_skip_and_restart_continuation(spark, tmp_path):
    """A replayed batch id short-circuits (no duplicate append); a
    restarted writer resumes totals from the sidecar."""
    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    w = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    b0 = _batch(spark, [_msg(d, 0, 2) for d in range(N_DIG)])
    w(b0, 0)
    n = spark.read.parquet(sink).count()
    w(b0, 0)  # crash-replay of the same batch
    assert spark.read.parquet(sink).count() == n
    # restart: a fresh writer on the same sink continues seq/index
    w2 = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    w2(_batch(spark, [_msg(d, 1, 2) for d in range(N_DIG)]), 1)
    out = spark.read.parquet(sink)
    f1 = out.filter("frame_number = 1").collect()
    assert {r.frame_seq for r in f1} == {1}
    assert {r.event_index for r in f1} == {2 * N_DIG}


def test_boundary_frame_carried_across_batches(spark, tmp_path):
    """A frame whose messages split across batches assembles exactly as
    if they arrived together: events from BOTH batches, one frame."""
    sink = str(tmp_path / "sink")
    clock = [1000.0]
    w = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), clock=lambda: clock[0]
    )
    w(_batch(spark, [_msg(d, 0, 4) for d in range(2)]), 0)
    clock[0] += 0.1  # inside the TTL
    w(_batch(spark, [_msg(d, 0, 4) for d in range(2, N_DIG)]), 1)
    out = spark.read.parquet(sink)
    f0 = out.filter("frame_number = 0")
    assert f0.count() == 4 * N_DIG
    assert f0.collect()[0].frame_complete
    assert {r.frame_seq for r in f0.collect()} == {0}
    # writer restart mid-flight preserves the carried rows via the sidecar
    w3 = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), clock=lambda: clock[0]
    )
    w3(_batch(spark, [_msg(d, 5, 3) for d in range(1)]), 2)
    clock[0] += 0.1
    w3b = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), clock=lambda: clock[0]
    )
    w3b(_batch(spark, [_msg(d, 5, 3) for d in range(1, N_DIG)]), 3)
    f5 = spark.read.parquet(sink).filter("frame_number = 5")
    assert f5.count() == 3 * N_DIG and f5.collect()[0].frame_complete


def test_multi_run_transition_single_job(spark, tmp_path):
    """A batch spanning two runs writes both partitions (partitionBy
    path) with per-run seq/index starting at 0."""
    from pyspark.sql import functions as F

    runs = spark.createDataFrame(
        [
            ("run_1", T0_US - 1_000_000, T0_US + 50_000),
            ("run_2", T0_US + 50_000, None),
        ],
        "run_name string, from_us long, until_us long",
    ).select(
        "run_name",
        F.timestamp_micros("from_us").alias("collect_from"),
        F.timestamp_micros(F.col("until_us")).alias("collect_until"),
    )
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    # frame 0 at T0 (run_1), frame 10 at T0+200ms (run_2)
    w(_batch(spark, [_msg(d, f, 2) for f in (0, 10) for d in range(N_DIG)]), 0)
    out = spark.read.parquet(sink)
    assert set(r.run_name for r in out.select("run_name").distinct().collect()) == {
        "run_1", "run_2"
    }
    for rn, fn in (("run_1", 0), ("run_2", 10)):
        part = out.filter(out.run_name == rn).collect()
        assert {r.frame_number for r in part} == {fn}
        assert {r.frame_seq for r in part} == {0}
        assert {r.event_index for r in part} == {0}


def test_direct_door_over_kafka_wire(spark, tmp_path):
    """The production door consumes the same Kafka face the FSM door
    does: dev2 wire messages -> kafka-wire source -> decode -> fused
    direct sink, with the event table matching the batch builder's on
    the same payloads."""
    from supermusr_data_pipeline_spark.kafka import MiniBroker, MiniProducer
    from supermusr_data_pipeline_spark.kafka.spark_source import KafkaWireDataSource
    from supermusr_data_pipeline_spark.sources import messages as M
    from supermusr_data_pipeline_spark.sources.decode import decode_dev2_messages
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        kafka_source_options,
    )

    spark.dataSource.register(KafkaWireDataSource)
    n_frames, n_dig, n_ev = 3, 2, 4
    base_ns = T0_US * 1000

    def dev2(frame, dig):
        md = {
            "ts_ns": base_ns + frame * 20_000_000,
            "period_number": 0, "protons_per_pulse": 4, "running": True,
            "frame_number": frame, "veto_flags": 0,
        }
        et = [100 * frame + 10 * e for e in range(n_ev)]
        ev = [float(e) for e in range(n_ev)]
        ch = [e % 8 for e in range(n_ev)]
        return M.encode_dev2(dig, md, et, ev, ch)

    sink = str(tmp_path / "wire_sink")
    with MiniBroker() as broker:
        broker.create_topic("daq-events", partitions=2)
        with MiniProducer(broker.bootstrap) as prod:
            for f in range(n_frames):
                for d in range(n_dig):
                    prod.send("daq-events", dev2(f, d), key=str(d).encode())
            prod.flush()
        opts = kafka_source_options(
            broker.bootstrap, ["daq-events"], starting_offsets="earliest"
        )
        wire = (
            spark.readStream.format("kafka-wire").options(**opts).load()
            .select("key", "value", "topic")
        )
        q = write_nexus_direct(
            decode_dev2_messages(wire), _runs(spark), sink,
            str(tmp_path / "wire_ckpt"), list(range(n_dig)),
        )
        q.awaitTermination(120)

    out = spark.read.parquet(sink)
    assert out.count() == n_frames * n_dig * n_ev
    rows = out.collect()
    assert all(r.frame_complete for r in rows)
    assert sorted({r.frame_number for r in rows}) == list(range(n_frames))
    # event_index continuation across frames: frame f starts at f*n_dig*n_ev
    for r in rows:
        assert r.event_index == r.frame_number * n_dig * n_ev


def test_intent_recovers_committed_append(spark, tmp_path):
    """Crash AFTER the sink append but BEFORE the post-batch sidecar
    save: the surviving intent file + sink totals prove the append
    landed, so the engine's replay of that batch short-circuits instead
    of duplicating rows."""
    import json as _json
    import os
    import shutil

    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    w = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    w(_batch(spark, [_msg(d, 0, 2) for d in range(N_DIG)]), 0)
    state_dir = w.state_dir
    post_b0 = str(tmp_path / "state_post_b0.json")
    shutil.copy(os.path.join(state_dir, "state.json"), post_b0)
    totals_b0 = dict(w._totals)

    b1 = _batch(spark, [_msg(d, 1, 3) for d in range(N_DIG)])
    w(b1, 1)
    n_after_b1 = spark.read.parquet(sink).count()

    # reconstruct the crash: sidecar rolled back to post-batch-0, intent
    # for batch 1 present, sink already holds batch 1's rows
    shutil.copy(post_b0, os.path.join(state_dir, "state.json"))
    with open(os.path.join(state_dir, "intent.json"), "w") as fh:
        _json.dump(
            {"bid": 1, "totals": {k: list(v) for k, v in totals_b0.items()}}, fh
        )

    w2 = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    w2(b1, 1)  # the engine replays batch 1
    assert spark.read.parquet(sink).count() == n_after_b1  # no duplicates
    w2(_batch(spark, [_msg(d, 2, 2) for d in range(N_DIG)]), 2)
    f2 = spark.read.parquet(sink).filter("frame_number = 2").collect()
    assert {r.frame_seq for r in f2} == {2}
    assert {r.event_index for r in f2} == {2 * N_DIG + 3 * N_DIG}


def test_intent_replays_uncommitted_append(spark, tmp_path):
    """Crash AFTER the intent write but BEFORE the sink append: totals
    match the intent's, so the batch is NOT marked done and the replay
    appends it exactly once."""
    import json as _json
    import os

    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    w = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    w(_batch(spark, [_msg(d, 0, 2) for d in range(N_DIG)]), 0)
    totals_b0 = dict(w._totals)
    # intent for batch 1 exists, but nothing of batch 1 reached the sink
    with open(os.path.join(w.state_dir, "intent.json"), "w") as fh:
        _json.dump(
            {"bid": 1, "totals": {k: list(v) for k, v in totals_b0.items()}}, fh
        )

    w2 = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    w2(_batch(spark, [_msg(d, 1, 3) for d in range(N_DIG)]), 1)
    out = spark.read.parquet(sink)
    assert out.filter("frame_number = 1").count() == 3 * N_DIG
    f1 = out.filter("frame_number = 1").collect()
    assert {r.frame_seq for r in f1} == {1}
    assert {r.event_index for r in f1} == {2 * N_DIG}


# ---- the same intent protocol on the FSM door's writer ----


def _frame_row(frame, n_events, veto=0):
    ts = datetime.fromtimestamp((T0_US + frame * 20_000) / 1e6, tz=timezone.utc)
    return (
        ts, frame // 1000, 4, True, frame, veto, True, [0, 1],
        [e % 8 for e in range(n_events)],
        [100 * frame + 10 * e for e in range(n_events)],
        [float(e) for e in range(n_events)],
    )


def _frames(spark, rows):
    from supermusr_data_pipeline_spark.schemas import FRAME_EVENT_LIST_SCHEMA

    return spark.createDataFrame(rows, FRAME_EVENT_LIST_SCHEMA)


def test_fsm_writer_intent_recovers_committed_append(spark, tmp_path):
    """NexusStreamWriter: a crash between the append and the engine's
    commit leaves the intent on disk; the restarted writer detects the
    committed append via totals and short-circuits the replay."""
    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    w = NexusStreamWriter(runs, sink)
    w(_frames(spark, [_frame_row(0, 2)]), 0)
    b1 = _frames(spark, [_frame_row(1, 3)])
    w(b1, 1)  # intent for bid 1 stays on disk (never removed)
    n = spark.read.parquet(sink).count()

    w2 = NexusStreamWriter(runs, sink)  # crash-restart
    w2(b1, 1)  # engine replays batch 1
    assert spark.read.parquet(sink).count() == n
    w2(_frames(spark, [_frame_row(2, 2)]), 2)
    f2 = spark.read.parquet(sink).filter("frame_number = 2").collect()
    assert {r.frame_seq for r in f2} == {2}
    assert {r.event_index for r in f2} == {5}


def test_fsm_writer_intent_replays_uncommitted_append(spark, tmp_path):
    """NexusStreamWriter: intent written but the append never landed —
    the replay redoes the batch exactly once."""
    import json as _json
    import os

    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    w = NexusStreamWriter(runs, sink)
    w(_frames(spark, [_frame_row(0, 2)]), 0)
    totals_b0 = dict(w._totals)
    os.makedirs(os.path.join(sink, "_writer_state"), exist_ok=True)
    with open(os.path.join(sink, "_writer_state", "intent.json"), "w") as fh:
        _json.dump(
            {"bid": 1, "totals": {k: list(v) for k, v in totals_b0.items()}}, fh
        )

    w2 = NexusStreamWriter(runs, sink)
    w2(_frames(spark, [_frame_row(1, 3)]), 1)
    out = spark.read.parquet(sink)
    f1 = out.filter("frame_number = 1").collect()
    assert len(f1) == 3
    assert {r.frame_seq for r in f1} == {1}
    assert {r.event_index for r in f1} == {2}


def test_empty_batch_fires_ttl(spark, tmp_path):
    """A no-data micro-batch (noDataMicroBatches is on by default in
    production) still fires the TTL pass: a pending frame whose deadline
    passed dispatches from carried rows alone."""
    clock = [1000.0]
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    w(_batch(spark, [_msg(d, 0, 3) for d in range(N_DIG - 1)]), 0)
    clock[0] += 0.7
    w(_batch(spark, []), 1)  # empty batch -> TTL dispatch
    out = spark.read.parquet(sink)
    f0 = out.filter("frame_number = 0").collect()
    assert len(f0) == 3 * (N_DIG - 1)
    assert not f0[0].frame_complete


def test_write_plan_shape_no_shuffle(spark):
    """The direct door's event write must stay narrow: ONE broadcast
    exchange (the frame dimension), no shuffle exchange, no Python — the
    'two narrow jobs per batch' claim, CI-pinned like the query-plan
    audit."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.streaming.nexus_direct import (
        _MSG_US_SCHEMA,
    )
    from supermusr_data_pipeline_spark.streaming.nexus_stream import (
        _DIM_SCHEMA,
        _events_us_with_dim,
    )

    msgs = spark.createDataFrame(
        [
            (T0_US, 0, 4, True, 0, d, 0, [0, 1], [10, 20], [1.0, 2.0])
            for d in range(N_DIG)
        ],
        _MSG_US_SCHEMA,
    )
    dim = spark.createDataFrame(
        [(T0_US, 0, 4, True, 0, "run_a", 0, True, 0, 1000, 0)], _DIM_SCHEMA
    )
    out = _events_us_with_dim(
        msgs.filter(F.size("channel") > 0), dim, with_run_col=False, outer=False
    ).coalesce(8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastExchange" in p
    assert "ShuffleExchange" not in p and "Exchange hashpartitioning" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "SortMergeJoin" not in p


def test_retirement_drops_run_from_live_writer(spark, tmp_path):
    """After retire_completed_runs(writer=...), a straggler frame for the
    retired run no longer matches its interval — the run's live
    directory is not resurrected next to its completed/ copy."""
    import os

    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.operators.nexus_sink import (
        retire_completed_runs,
    )

    until = T0_US + 100_000  # run stops 100 ms after T0
    runs = spark.createDataFrame(
        [("run_a", T0_US - 1_000_000, until)],
        "run_name string, from_us long, until_us long",
    ).select(
        "run_name",
        F.timestamp_micros("from_us").alias("collect_from"),
        F.timestamp_micros("until_us").alias("collect_until"),
    )
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(runs, sink, list(range(N_DIG)))
    w(_batch(spark, [_msg(d, 0, 2) for d in range(N_DIG)]), 0)
    assert os.path.isdir(os.path.join(sink, "run_name=run_a"))

    moved = retire_completed_runs(
        spark, sink, runs, now="2030-01-01 00:00:00", compact=True, writer=w
    )
    assert moved == ["run_a"]
    assert not os.path.exists(os.path.join(sink, "run_name=run_a"))

    # straggler inside the retired run's interval: frame 2 at T0+40ms
    w(_batch(spark, [_msg(d, 2, 2) for d in range(N_DIG)]), 1)
    assert not os.path.exists(os.path.join(sink, "run_name=run_a"))
    completed = os.path.join(sink, "completed", "run_name=run_a")
    assert spark.read.parquet(completed).count() == 2 * N_DIG


# ---------------------------------------------------------------------------
# silent-stream TTL expiry (VERDICT r9 #2): the production door's guarantee
# must never be weaker than the FSM door's ProcessingTimeTimeout
# ---------------------------------------------------------------------------


def test_silent_stream_tick_dispatches_expired_frame(spark, tmp_path):
    """expire_pending() with NO batch in flight dispatches a TTL-expired
    incomplete frame from the driver-held carried rows, and a straggler
    arriving afterwards is tombstone-rejected."""
    import os

    clock = [1000.0]
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    w(_batch(spark, [_msg(d, 0, 2) for d in range(N_DIG - 1)]), 0)
    assert not os.path.isdir(os.path.join(sink, "run_name=run_a"))
    assert w.expire_pending() == []  # TTL not reached: tick is a no-op
    clock[0] += 0.6
    assert w.expire_pending() == [0]  # the tick itself dispatches
    out = spark.read.parquet(sink).collect()
    assert len(out) == 2 * (N_DIG - 1)
    assert all(not r.frame_complete and r.frame_number == 0 for r in out)
    # straggler after the tick: rejected by the tick's tombstone
    w(_batch(spark, [_msg(N_DIG - 1, 0, 2)]), 1)
    assert spark.read.parquet(sink).count() == 2 * (N_DIG - 1)
    # frame sequencing continues past the tick's dispatch
    w(_batch(spark, [_msg(d, 1, 3) for d in range(N_DIG)]), 2)
    f1 = spark.read.parquet(sink).filter("frame_number = 1").collect()
    assert {r.frame_seq for r in f1} == {1}


def test_silent_stream_zero_event_frame_tick(spark, tmp_path):
    """A pending all-empty frame expires via the tick into exactly ONE
    null-event row (the batch builder's explode_outer rule)."""
    clock = [1000.0]
    sink = str(tmp_path / "sink")
    w = DirectNexusWriter(
        _runs(spark), sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    w(_batch(spark, [_msg(d, 0, 0) for d in range(N_DIG - 2)]), 0)
    clock[0] += 0.6
    assert w.expire_pending() == [0]
    out = spark.read.parquet(sink).collect()
    assert len(out) == 1 and out[0].event_id is None
    assert not out[0].frame_complete and out[0].event_index == 0


def test_silent_stream_live_timer_dispatches_within_ttl(spark, tmp_path):
    """The pinned silent-tape test: one incomplete frame arrives, the
    source goes silent, and the sink still receives the frame within
    TTL + trigger + ticker cadence — no second batch ever runs."""
    import os
    import time as _time

    spool = str(tmp_path / "spool")
    _batch(spark, [_msg(d, 0, 2) for d in range(N_DIG - 1)]).coalesce(
        1
    ).write.parquet(spool)
    stream = spark.readStream.schema(DIGITISER_MESSAGE_SCHEMA).parquet(spool)
    sink = str(tmp_path / "sink")
    q = write_nexus_direct(
        stream, _runs(spark), sink, str(tmp_path / "ckpt"),
        list(range(N_DIG)), frame_ttl_ms=400,
        trigger={"processingTime": "200 milliseconds"},
    )
    try:
        deadline = _time.time() + 30
        rows = []
        while _time.time() < deadline:
            if os.path.isdir(os.path.join(sink, "run_name=run_a")):
                try:
                    rows = spark.read.parquet(sink).collect()
                except Exception:
                    rows = []  # partition dir exists, part files mid-commit
                # poll until the FULL dispatch is visible: a read racing
                # the append can legitimately see a subset of part files
                # (observed under heavy machine load), and that partial
                # view is not the assertion target
                if len(rows) >= 2 * (N_DIG - 1):
                    break
            _time.sleep(0.1)
        assert len(rows) == 2 * (N_DIG - 1)
        assert all(not r.frame_complete for r in rows)
        assert q.direct_writer.timer_error is None
    finally:
        q.direct_writer.stop_expiry_timer()
        q.stop()


def test_tick_crash_after_append_recovers_exactly_once(spark, tmp_path):
    """Crash in the window between the tick's sink append and its state
    save: the tick intent (expired keys + pre-totals) lets a fresh
    writer FINISH the tick — no duplicate append, tombstone armed,
    frame_seq continues."""

    class CrashySave(DirectNexusWriter):
        crash = False

        def _save_state(self):
            if self.crash:
                raise RuntimeError("simulated crash before state save")
            super()._save_state()

    import pytest

    clock = [1000.0]
    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    w = CrashySave(
        runs, sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    w(_batch(spark, [_msg(d, 0, 2) for d in range(N_DIG - 1)]), 0)
    clock[0] += 0.6
    w.crash = True
    with pytest.raises(RuntimeError):
        w.expire_pending()
    # the append landed; state.json is stale (frame 0 still pending)
    assert spark.read.parquet(sink).count() == 2 * (N_DIG - 1)

    w2 = DirectNexusWriter(
        runs, sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    # straggler for frame 0 plus a complete frame 1
    w2(
        _batch(
            spark,
            [_msg(N_DIG - 1, 0, 2)] + [_msg(d, 1, 3) for d in range(N_DIG)],
        ),
        1,
    )
    out = spark.read.parquet(sink)
    assert out.filter("frame_number = 0").count() == 2 * (N_DIG - 1)  # no dup
    f1 = out.filter("frame_number = 1").collect()
    assert len(f1) == 3 * N_DIG and {r.frame_seq for r in f1} == {1}
    assert {r.event_index for r in f1} == {2 * (N_DIG - 1)}


def test_tick_crash_before_append_redispatches(spark, tmp_path):
    """Crash between the tick's intent write and the sink append: the
    intent's pre-totals equal the sink's actuals, so recovery keeps the
    frame pending and a later tick dispatches it exactly once."""

    class CrashyWrite(DirectNexusWriter):
        crash = False

        def _write(self, *a, **kw):
            if self.crash:
                raise RuntimeError("simulated crash before sink append")
            super()._write(*a, **kw)

    import os

    import pytest

    clock = [1000.0]
    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    w = CrashyWrite(
        runs, sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    w(_batch(spark, [_msg(d, 0, 2) for d in range(N_DIG - 1)]), 0)
    clock[0] += 0.6
    w.crash = True
    with pytest.raises(RuntimeError):
        w.expire_pending()
    assert os.path.isfile(os.path.join(sink, "_assembler_state", "intent.json"))
    assert not os.path.isdir(os.path.join(sink, "run_name=run_a"))

    w2 = DirectNexusWriter(
        runs, sink, list(range(N_DIG)), frame_ttl_ms=500,
        clock=lambda: clock[0],
    )
    w2._spark = spark
    w2._load_state(spark)
    assert w2.expire_pending() == [0]
    out = spark.read.parquet(sink).collect()
    assert len(out) == 2 * (N_DIG - 1)
    assert all(not r.frame_complete and r.frame_number == 0 for r in out)


def test_expiry_timer_exits_when_query_dead(tmp_path):
    """The ticker's lifetime is tied to the owning query: when the
    liveness probe goes false (query errored / stopped without
    stop_expiry_timer), the loop exits on its own instead of appending
    to a dead stream's sink (ADVICE r10)."""
    import time as _time

    w = DirectNexusWriter(None, str(tmp_path / "s"), [0])
    alive = {"v": True}
    w.start_expiry_timer(interval_s=0.02, alive=lambda: alive["v"])
    assert w._timer_thread.is_alive()
    alive["v"] = False
    deadline = _time.time() + 2
    while w._timer_thread.is_alive() and _time.time() < deadline:
        _time.sleep(0.02)
    assert not w._timer_thread.is_alive()
    w.stop_expiry_timer()


def test_timer_error_fails_next_batch(tmp_path):
    """A failed expiry tick is re-raised into the next micro-batch —
    surfaced through the engine, not left polled-only (ADVICE r10)."""
    import pytest

    w = DirectNexusWriter(None, str(tmp_path / "s"), [0])
    w.timer_error = ValueError("tick failed")
    with pytest.raises(RuntimeError, match="expiry ticker"):
        w(None, 0)
    assert w.timer_error is None  # consumed, not re-raised forever


def test_pending_rows_byte_budget_dispatches_early(spark, tmp_path):
    """The carried-rows cache is bounded by BYTES, not just TTL
    (VERDICT r10 next #5): at 10x event density the budget forces the
    oldest pending frames to dispatch incomplete-early (the reference's
    memory-pressure posture for a partial frame, frame/partial.rs:30-40)
    and late messages for them hit tombstones, exactly as TTL expiry."""
    clock = [1000.0]
    sink = str(tmp_path / "sink")
    runs = _runs(spark)
    budget = 300_000
    mk = lambda: DirectNexusWriter(  # noqa: E731
        runs, sink, [0, 1], frame_ttl_ms=10**9, tombstone_ttl_ms=10**9,
        clock=lambda: clock[0], pending_max_bytes=budget,
    )
    w = mk()
    n_ev = 5000  # 10x the 32x500 shape's per-message event density
    row_b = 80 + 20 * n_ev
    for f in range(6):
        # every frame arrives INCOMPLETE (digitiser 1 never shows)
        w(_batch(spark, [_msg(0, f, n_ev)]), f)
        clock[0] += 0.02
        assert w._pending_bytes <= budget, f"budget breached after batch {f}"
    # oldest frames were dispatched incomplete to honor the budget ...
    out = spark.read.parquet(sink)
    done = {int(r.frame_number) for r in out.select("frame_number").distinct().collect()}
    assert done and min(done) == 0, "eviction must be oldest-first"
    assert all(
        not r.frame_complete
        for r in out.select("frame_complete").distinct().collect()
    )
    # ... and the driver-held cache stays FLAT: at most budget's worth
    held = sum(len(rs) for rs in w._pending_rows.values())
    assert held * row_b <= budget
    assert 0 < held < 6
    # a late message for an early-dispatched frame hits its tombstone
    n_before = out.count()
    w(_batch(spark, [_msg(1, 0, n_ev)]), 6)
    assert spark.read.parquet(sink).count() == n_before
    # restart recomputes the byte accounting from the sidecar
    w2 = mk()
    w2._load_state(spark)
    assert w2._pending_bytes == w._pending_bytes > 0
