"""G6 schedule DSL: a JSON script drives the message builders and the
resulting envelope stream feeds the engine end to end (the fixture-driver
role of simulator/src/integrated/simulation_engine/actions.rs:83-137)."""

import pytest

from supermusr_data_pipeline_spark.generator.schedule import (
    run_schedule,
    schedule_to_envelope,
)
from supermusr_data_pipeline_spark.sources.decode import decode_stream

SCRIPT = [
    {"action": "set_timestamp", "iso": "2024-01-01T12:00:00"},
    {"action": "run_start", "name": "run_a", "filename": "a.nxs"},
    {"action": "set_protons_per_pulse", "n": 4},
    {
        "action": "frame_loop",
        "frames": 3,
        "advance_ms": 20,
        "body": [
            {
                "action": "digitiser_loop",
                "ids": [0, 1],
                "body": [
                    {"action": "send_trace", "n_samples": 120, "channels": 2},
                    {"action": "send_event_list", "channels": 2},
                ],
            },
            {"action": "set_veto", "flags": 2},
        ],
    },
    {"action": "run_log", "source": "pv:t", "value": 1.5},
    {"action": "se_log", "name": "se:f", "values": [1.0, 2.0], "time_delta_ns": 100.0},
    {"action": "alarm", "source": "dev", "severity": "MAJOR", "message": "hot"},
    {"action": "advance_ms", "ms": 100},
    {"action": "run_stop", "name": "run_a"},
]


def test_schedule_message_sequence():
    msgs = run_schedule(SCRIPT, seed=5)
    topics = [t for t, _ in msgs]
    # 2 control + 3 frames × 2 digitisers × (trace + events) + 3 logs
    assert topics.count("run-controls") == 2
    assert topics.count("daq-traces") == 6
    assert topics.count("daq-events") == 6
    assert topics.count("runlog") == 1 and topics.count("selog") == 1
    assert topics.count("alarms") == 1
    # deterministic across runs
    assert run_schedule(SCRIPT, seed=5) == msgs
    assert run_schedule(SCRIPT, seed=6) != msgs


def test_schedule_feeds_decode_stream(spark):
    env = schedule_to_envelope(spark, SCRIPT, seed=5)
    streams = decode_stream(env)
    traces = streams["dat2"].collect()
    assert len(traces) == 12  # 6 messages × 2 channels
    assert {r.frame_number for r in traces} == {0, 1, 2}
    assert all(r.protons_per_pulse == 4 for r in traces)
    # veto set after the sends of frame 0 → applies from frame 1 onwards
    assert {r.frame_number for r in traces if r.veto_flags == 2} == {1, 2}

    rc = {(r.kind, r.run_name): r for r in streams["run_control"].collect()}
    start = rc[("start", "run_a")]
    stop = rc[("stop", "run_a")]
    assert start.filename == "a.nxs"
    # 3 frames × 20 ms + 100 ms advance after the loop
    assert stop.time_ms - start.time_ms == 160

    ev = streams["dev2"].collect()
    assert len(ev) == 12 and all(r.event_voltage > 0 for r in ev)
    assert streams["f144"].count() == 1
    assert streams["al00"].collect()[0].severity == "MAJOR"


def test_dump_cli_over_schedule_output(spark, tmp_path, capsys):
    """S8 CLI surface: decode-and-pretty-print over an envelope table."""
    from supermusr_data_pipeline_spark.operators.diagnostics import dump_messages

    env = schedule_to_envelope(spark, SCRIPT, seed=5)
    lines = dump_messages(env).collect()
    assert any("RunStart 'run_a'" in r.summary for r in lines)
    assert any(r.identifier == "dat2" for r in lines)

    # the __main__ path reads an envelope parquet
    path = str(tmp_path / "env")
    env.write.parquet(path)
    from supermusr_data_pipeline_spark.dump import main

    assert main([path, "5"]) == 0
    out = capsys.readouterr().out
    assert "messages)" in out


def test_short_trace_synthesis_guard(spark):
    """Degenerate n_samples (< pulse window) must still synthesize."""
    from supermusr_data_pipeline_spark.generator.simulator import _synth_channel

    import numpy as np

    v, s, h = _synth_channel(np.array([1, 0, 0, 0], dtype=np.uint64), 30, 2, 50.0, 1.0)
    assert len(v) == 30


def test_unknown_action_raises():
    with pytest.raises(ValueError, match="unknown schedule action"):
        run_schedule([{"action": "warp_time"}])
