"""G6 end-to-end: a schedule-DSL script drives a MULTI-RUN, OUT-OF-ORDER,
DUPLICATE-BEARING envelope tape through the full streaming topology —
wire bytes → identifier dispatch → dev2 decode → stateful frame assembly —
with run lifecycle + run matching asserted on the same tape.  This is the
closest this environment gets to the reference's integrated simulation
envelope (simulator/src/integrated/simulation_engine/actions.rs:83-137)
without a Kafka broker."""

import time

import numpy as np

from supermusr_data_pipeline_spark.generator.schedule import run_schedule
from supermusr_data_pipeline_spark.operators.run_matching import match_events_to_runs
from supermusr_data_pipeline_spark.sources.decode import (
    decode_dev2_messages,
    decode_stream,
    run_control_events,
)
from supermusr_data_pipeline_spark.streaming import (
    assemble_frames_stream,
    read_envelope_stream,
    runs_from_control,
)

SCRIPT = [
    {"action": "set_timestamp", "iso": "2024-01-01T12:00:00"},
    {"action": "run_start", "name": "run_1", "n_periods": 2},
    {"action": "advance_ms", "ms": 10},
    {"action": "run_log", "source": "pv:temp", "value": 1.5},
    {
        "action": "frame_loop",
        "frames": 3,
        "advance_ms": 20,
        "body": [
            {
                "action": "digitiser_loop",
                "ids": [0, 1],
                "body": [{"action": "send_event_list", "channels": 2}],
            }
        ],
    },
    {"action": "alarm", "source": "dev0", "severity": "MINOR", "message": "warm"},
    {"action": "run_stop", "name": "run_1"},
    {"action": "advance_ms", "ms": 1000},
    {"action": "run_start", "name": "run_2"},
    {"action": "advance_ms", "ms": 10},
    {
        "action": "frame_loop",
        "frames": 2,
        "advance_ms": 20,
        "body": [
            {
                "action": "digitiser_loop",
                "ids": [0, 1],
                "body": [{"action": "send_event_list", "channels": 2}],
            }
        ],
    },
    {"action": "run_log", "source": "pv:temp", "value": 2.5},
    {"action": "run_stop", "name": "run_2"},
]


def test_schedule_tape_through_streaming_topology(spark, tmp_path):
    msgs = run_schedule(SCRIPT, seed=7)
    rows = [(None, payload, topic) for topic, payload in msgs]

    # out-of-order replay: deterministic shuffle of the whole tape
    perm = np.random.default_rng(0).permutation(len(rows))
    shuffled = [rows[i] for i in perm]
    # duplicates: re-send one dev2 message and one run_stop (J5/T6 rejects)
    dup_event = next(r for r in rows if r[2] == "daq-events")
    dup_stop = next(r for r in rows if r[2] == "run-controls")
    shuffled.append(dup_event)
    shuffled.append(dup_stop)

    # three parquet files = three micro-batches of interleaved runs
    src = tmp_path / "tape"
    src.mkdir()
    thirds = [shuffled[0::3], shuffled[1::3], shuffled[2::3]]
    for part in thirds:
        spark.createDataFrame(
            part, "key binary, value binary, topic string"
        ).coalesce(1).write.mode("append").parquet(str(src))

    env = spark.read.parquet(str(src))

    # run lifecycle from the same tape (batch fold of the control stream)
    runs = runs_from_control(run_control_events(env))
    by_name = {r.run_name: r for r in runs.collect()}
    assert set(by_name) == {"run_1", "run_2"}
    assert by_name["run_1"].collect_until is not None
    assert by_name["run_2"].collect_until is not None
    assert not by_name["run_1"].aborted and not by_name["run_2"].aborted

    # multi-topic routing sanity: every schedule action reached its stream
    streams = decode_stream(env)
    assert streams["f144"].count() == 2
    assert streams["al00"].count() == 1
    assert streams["dev2"].count() > 0

    # the streaming topology: envelope tape → decode → frame assembly
    stream = read_envelope_stream(spark, str(src), max_files_per_trigger=1)
    frames = assemble_frames_stream(
        decode_dev2_messages(stream), expected_digitizers=[0, 1], frame_ttl_ms=10_000
    )
    q = (
        frames.writeStream.format("memory")
        .queryName("t_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM t_replay").count() >= 5:
                break
            time.sleep(0.3)
    finally:
        q.stop()

    out = spark.sql("SELECT * FROM t_replay").collect()
    # 5 frames, each exactly once: the duplicate dev2 message was rejected
    assert len(out) == 5
    assert all(r.complete for r in out)
    assert all(r.digitizers_present == [0, 1] for r in out)
    # 2 digitisers x 2 channels = 4 events per frame, (did, ch)-sorted
    assert all(len(r.channel) == 4 for r in out)
    assert all(r.channel == sorted(r.channel) for r in out)

    # run matching routes the assembled frames back into their runs
    assembled = spark.createDataFrame(out, frames.schema)
    matched = match_events_to_runs(assembled, runs).select("frame_number", "run_name")
    per_run = {}
    for r in matched.collect():
        per_run.setdefault(r.run_name, set()).add(r.frame_number)
    assert len(per_run.get("run_1", set())) == 3
    assert len(per_run.get("run_2", set())) == 2
