"""nexus-writer front door: EVERYTHING from wire bytes.

A schedule-DSL script emits dat2 traces, run control, runlog/selog/alarm
messages as FlatBuffers envelopes; the writer side decodes + dispatches
(S3), folds run control into the interval table (T4), detects + assembles
(W4/A1), builds the per-run event table with index columns (S6/A5/P5), and
writes event data AND logs into the same one-directory-per-run layout
(J1/J2) — the full nexus-writer role of message_handlers.rs:38-120."""

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.generator.schedule import schedule_to_envelope
from supermusr_data_pipeline_spark.operators.event_formation import form_events
from supermusr_data_pipeline_spark.operators.nexus_sink import (
    build_nexus_events_fused,
    write_nexus,
    write_nexus_logs,
)
from supermusr_data_pipeline_spark.sources.decode import (
    decode_stream,
    run_control_events,
    with_identifier,
)
from supermusr_data_pipeline_spark.streaming import runs_from_control

N_DIG = 2

SCRIPT = [
    {"action": "set_timestamp", "iso": "2024-01-01T12:00:00"},
    {"action": "run_log", "source": "pv:pre", "value": 0.5},  # precedes run start (J2)
    {"action": "advance_ms", "ms": 5},
    {"action": "run_start", "name": "run_w"},
    {"action": "advance_ms", "ms": 5},
    {
        "action": "frame_loop",
        "frames": 3,
        "advance_ms": 20,
        "body": [
            {
                "action": "digitiser_loop",
                "ids": [0, 1],
                "body": [
                    {"action": "send_trace", "n_samples": 250, "channels": 2,
                     "noise_sd": 2.0},
                ],
            },
        ],
    },
    {"action": "run_log", "source": "pv:t", "value": 1.5},
    {"action": "se_log", "name": "se:f", "values": [1.0, 2.0], "time_delta_ns": 100.0},
    {"action": "alarm", "source": "dev", "severity": "MINOR", "message": "warm"},
    {"action": "advance_ms", "ms": 50},
    {"action": "run_stop", "name": "run_w"},
]


def test_writer_front_door_from_wire_bytes(spark, tmp_path):
    env = schedule_to_envelope(spark, SCRIPT, seed=13)
    streams = decode_stream(env)

    # T4: fold the decoded control stream into the run interval table
    runs = runs_from_control(run_control_events(with_identifier(env)))
    run_rows = runs.collect()
    assert len(run_rows) == 1
    assert run_rows[0].run_name == "run_w"
    assert run_rows[0].collect_until is not None
    runs_dim = runs.select("run_name", "collect_from", "collect_until")

    # trace-to-events + aggregation + nexus build, all from decoded dat2
    events = form_events(streams["dat2"], mode="fixed", threshold=300.0, duration=2)
    nexus = build_nexus_events_fused(events, runs_dim, expected_digitizers=[0, 1])
    sink = str(tmp_path / "nexus")
    write_nexus(nexus, sink)

    out = spark.read.parquet(sink)
    assert out.filter(F.col("run_name") == "run_w").count() == out.count() > 0
    assert {r.frame_number for r in out.select("frame_number").distinct().collect()} == {0, 1, 2}
    # event_index strictly non-decreasing along frame_seq
    idx = (
        out.select("frame_seq", "event_index").distinct().orderBy("frame_seq").collect()
    )
    assert [r.frame_seq for r in idx] == [0, 1, 2]
    assert idx[0].event_index == 0
    assert all(a.event_index < b.event_index for a, b in zip(idx, idx[1:]))
    assert out.filter(F.col("frame_complete") == False).count() == 0  # noqa: E712

    # per-run log sink (J2 one-sided: the pre-start log lands in run_w)
    write_nexus_logs(streams["f144"], streams["se00"], streams["al00"], runs_dim, sink)
    runlog = spark.read.parquet(f"{sink}/runlog").collect()
    assert {r.source_name for r in runlog} == {"pv:pre", "pv:t"}
    assert all(r.run_name == "run_w" for r in runlog)
    pre = next(r for r in runlog if r.source_name == "pv:pre")
    assert pre.log_time_ns < 0  # preceded the run start
    assert spark.read.parquet(f"{sink}/selog").collect()[0]["values"] == [1.0, 2.0]
    assert spark.read.parquet(f"{sink}/alarms").collect()[0].severity == "MINOR"
