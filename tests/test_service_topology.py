"""The full reference topology over REAL wire messages
(docs/data_pipeline.md:9-71):

    schedule DSL → dat2 envelope → [trace-to-events] → dev2 envelope →
    [digitiser-aggregator] → aev2 envelope → [nexus-writer] event table

Every hop crosses the FlatBuffers envelope boundary — the same bytes a
Kafka broker would carry — so this exercises S3 decode, W4 detection, A1
assembly, G6/G7 generation and the aev2 encode/decode roundtrip in one
chain."""

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.generator.schedule import schedule_to_envelope
from supermusr_data_pipeline_spark.operators.event_formation import form_events
from supermusr_data_pipeline_spark.operators.frame_assembly import assemble_frames
from supermusr_data_pipeline_spark.sources.decode import (
    decode_aev2,
    decode_dat2,
    decode_dev2_messages,
)
from supermusr_data_pipeline_spark.streaming import encode_dev2_stream
from supermusr_data_pipeline_spark.streaming.envelope_stream import encode_aev2_stream
from supermusr_data_pipeline_spark.streaming.frame_assembly_stream import (
    events_long_to_messages,
)

N_FRAMES, N_DIG, N_CH = 3, 2, 2

SCRIPT = [
    {"action": "set_timestamp", "iso": "2024-01-01T12:00:00"},
    {"action": "run_start", "name": "run_t"},
    {
        "action": "frame_loop",
        "frames": N_FRAMES,
        "advance_ms": 20,
        "body": [
            {
                "action": "digitiser_loop",
                "ids": list(range(N_DIG)),
                "body": [
                    {"action": "send_trace", "n_samples": 300, "channels": N_CH,
                     "n_pulses": 4, "noise_sd": 2.0},
                ],
            },
        ],
    },
    {"action": "run_stop", "name": "run_t"},
]


def test_full_topology_through_wire_messages(spark):
    # stage 0: simulator → dat2 wire messages
    env_dat2 = schedule_to_envelope(spark, SCRIPT, seed=9)

    # stage 1: trace-to-events — decode dat2, detect, re-encode as dev2
    traces = decode_dat2(env_dat2)
    assert traces.count() == N_FRAMES * N_DIG * N_CH
    events = form_events(traces, mode="fixed", threshold=300.0, duration=2, cool_off=0)
    assert events.count() > 0
    env_dev2 = encode_dev2_stream(events_long_to_messages(events))

    # stage 2: digitiser-aggregator — decode dev2 messages, assemble frames
    messages = decode_dev2_messages(env_dev2)
    assert messages.count() == N_FRAMES * N_DIG
    frames = assemble_frames(messages.select(
        "digitizer_id", "ts", "period_number", "protons_per_pulse", "running",
        "frame_number", "veto_flags",
        F.explode(F.arrays_zip("channel", "event_time", "event_voltage")).alias("e"),
    ).select(
        "digitizer_id", "ts", "period_number", "protons_per_pulse", "running",
        "frame_number", "veto_flags",
        F.col("e.channel").alias("channel"),
        F.col("e.event_time").alias("event_time"),
        F.col("e.event_voltage").alias("event_voltage"),
    ), expected_digitizers=list(range(N_DIG)))
    got_frames = {r.frame_number: r for r in frames.collect()}
    assert set(got_frames) == set(range(N_FRAMES))
    assert all(r.complete for r in got_frames.values())
    assert all(r.digitizers_present == list(range(N_DIG)) for r in got_frames.values())

    # stage 3: aev2 wire roundtrip — aggregator output crosses the envelope
    env_aev2 = encode_aev2_stream(frames)
    back = {r.frame_number: r for r in decode_aev2(env_aev2).collect()}
    assert set(back) == set(got_frames)
    for fn, orig in got_frames.items():
        rt = back[fn]
        assert rt.complete == orig.complete
        assert rt.digitizers_present == orig.digitizers_present
        assert rt.channel == orig.channel
        assert rt.event_time == orig.event_time
        assert [int(round(v)) for v in orig.event_voltage] == rt.event_voltage
        assert rt.ts == orig.ts

    # events per frame: every (digitiser, channel) produced at least one pulse
    n_events_per_frame = {fn: len(r.channel) for fn, r in got_frames.items()}
    assert all(n >= N_DIG * N_CH for n in n_events_per_frame.values())
