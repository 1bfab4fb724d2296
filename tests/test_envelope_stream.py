"""S1/S2 integration: typed streams round-tripped through the Kafka
envelope shape (key/value/topic binary rows) with rate limiting and
graceful drain — the no-broker analog of the production Kafka wiring
(common/src/lib.rs:72-94, trace-to-events/src/main.rs:366-431)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.sources.decode import (
    decode_dev2_messages,
    with_identifier,
)
from supermusr_data_pipeline_spark.streaming import (
    DIGITISER_MESSAGE_SCHEMA,
    assemble_frames_stream,
    encode_dev2_stream,
    kafka_source_options,
    read_envelope_stream,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _msg(did, frame, channels, times, volts, veto=0):
    return (
        did,
        T0 + timedelta(milliseconds=20 * frame),
        1,
        8,
        True,
        frame,
        veto,
        channels,
        times,
        volts,
    )


def test_envelope_roundtrip_through_streaming_frame_assembly(spark, tmp_path):
    """dev2 messages → encode (S2) → envelope parquet → rate-limited
    envelope stream (S1) → identifier dispatch → decode → stateful frame
    assembly → memory sink; graceful stop after quiescence (T8)."""
    import time

    msgs = [
        _msg(0, 1, [0, 1], [10, 20], [5.0, 6.0]),
        _msg(1, 1, [7], [15], [9.0], veto=2),
        _msg(0, 2, [3], [11], [4.0]),
        _msg(1, 2, [4], [12], [8.0]),
    ]
    typed = spark.createDataFrame(msgs, DIGITISER_MESSAGE_SCHEMA)
    env_dir = str(tmp_path / "envelope")

    # S2 produce path (batch write stands in for the kafka sink)
    encoded = encode_dev2_stream(typed)
    assert encoded.columns == ["key", "value", "topic"]
    encoded.repartition(3).write.parquet(env_dir)  # several files → several micro-batches

    # S1 consume path, rate-limited like maxOffsetsPerTrigger
    env = read_envelope_stream(spark, env_dir, max_files_per_trigger=1)
    assert env.isStreaming
    frames = assemble_frames_stream(
        decode_dev2_messages(env), expected_digitizers=[0, 1], frame_ttl_ms=60_000
    )
    q = (
        frames.writeStream.format("memory")
        .queryName("t_env_frames")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM t_env_frames").count() >= 2:
                break
            time.sleep(0.3)
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert n_batches >= 2, "maxFilesPerTrigger rate limit should split micro-batches"
    finally:
        q.stop()  # T8: graceful stop after the sink quiesces
    assert not q.isActive

    out = {r.frame_number: r for r in spark.sql("SELECT * FROM t_env_frames").collect()}
    assert set(out) == {1, 2}
    f1 = out[1]
    assert f1.complete is True
    assert f1.digitizers_present == [0, 1]
    assert f1.veto_flags == 2
    assert f1.channel == [0, 1, 7]
    assert f1.event_time == [10, 20, 15]
    assert f1.event_voltage == [5.0, 6.0, 9.0]
    assert out[2].complete is True and out[2].event_voltage == [4.0, 8.0]


def test_envelope_identifier_jvm_side(spark, tmp_path):
    """The dispatch filter reads the identifier without any Python stage."""
    typed = spark.createDataFrame([_msg(0, 1, [0], [1], [2.0])], DIGITISER_MESSAGE_SCHEMA)
    env = encode_dev2_stream(typed)
    row = with_identifier(env).select("identifier", "topic", "key").collect()[0]
    assert row.identifier == "dev2"
    assert row.topic == "digitiser-events"
    assert bytes(row.key) == b"0"


def test_streaming_topology_envelope_to_nexus(spark, tmp_path):
    """Production topology, streaming mode: envelope files → identifier
    dispatch → stateful frame assembly → foreachBatch nexus sink, with the
    run table folded from control envelopes — every hop the nexus-writer
    service makes, on wire bytes."""
    import time

    from supermusr_data_pipeline_spark.generator.schedule import schedule_to_envelope
    from supermusr_data_pipeline_spark.sources.decode import run_control_events
    from supermusr_data_pipeline_spark.streaming import (
        runs_from_control,
        write_nexus_stream,
    )

    script = [
        {"action": "set_timestamp", "iso": "2024-01-01T12:00:00"},
        {"action": "run_start", "name": "run_s"},
        {"action": "advance_ms", "ms": 5},
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
        {"action": "advance_ms", "ms": 50},
        {"action": "run_stop", "name": "run_s"},
    ]
    env = schedule_to_envelope(spark, script, seed=21)
    env_dir = str(tmp_path / "env")
    env.select("value").withColumn("topic", F.lit("mixed")).select("topic", "value") \
        .repartition(2).write.parquet(env_dir)

    # control plane folds batch-side (tiny), data plane streams
    runs = runs_from_control(run_control_events(spark.read.parquet(env_dir)))
    runs_dim = runs.select("run_name", "collect_from", "collect_until")
    assert runs_dim.count() == 1

    stream = read_envelope_stream(spark, env_dir)
    frames = assemble_frames_stream(
        decode_dev2_messages(stream), expected_digitizers=[0, 1], frame_ttl_ms=60_000
    )
    sink = str(tmp_path / "nexus")
    q = write_nexus_stream(
        frames, runs_dim, sink, str(tmp_path / "ckpt"),
        trigger={"processingTime": "200 milliseconds"},
    )
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(sink).collect()
            except Exception:
                rows = []
            if len(rows) >= 8:  # 2 frames x 2 digitisers x 2 channels
                break
            time.sleep(0.4)
    finally:
        q.stop()
    assert len(rows) == 8
    assert all(r.run_name == "run_s" for r in rows)
    by_frame = {}
    for r in rows:
        by_frame.setdefault(r.frame_number, set()).add(r.event_index)
    assert set(by_frame) == {0, 1}
    # event_index: frame 0 events share index 0; frame 1 starts at 4
    assert by_frame[0] == {0} and by_frame[1] == {4}
    assert all(r.frame_complete for r in rows)


def test_kafka_source_options_shape():
    opts = kafka_source_options("broker:9092", ["traces", "controls"],
                                max_offsets_per_trigger=5000,
                                starting_offsets="earliest")
    assert opts["subscribe"] == "traces,controls"
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["startingOffsets"] == "earliest"


def test_kafka_source_options_by_timestamp():
    """O3: the manual offset bisect becomes the source's all-partitions
    startingTimestamp lookup (startingOffsetsByTimestamp is per-partition
    only — there is no wildcard partition in its json format)."""
    opts = kafka_source_options("b:9092", ["traces"], starting_timestamp_ms=1_700_000_000_000)
    assert "startingOffsets" not in opts
    assert opts["startingTimestamp"] == "1700000000000"


# The documented option names of Spark's Kafka source (structured-streaming
# kafka integration guide) that this repo may legitimately emit.  A typo'd
# name in kafka_source_options fails here even though no broker exists to
# execute the reader.
_KAFKA_SOURCE_OPTION_NAMES = {
    "subscribe",
    "startingOffsets",
    "startingTimestamp",
    "startingOffsetsByTimestamp",
    "maxOffsetsPerTrigger",
    "failOnDataLoss",
}


def test_kafka_source_options_construct_reader(spark):
    """Pin the reader wiring itself: every option name is either a
    documented source option or a pass-through 'kafka.'-prefixed client
    property, all values are strings, and the DataStreamReader accepts the
    dict.  Source resolution (.load()) is exercised too: with no kafka
    connector jar in this environment it must fail with DATA_SOURCE_NOT_FOUND
    — never an option error."""
    opts = kafka_source_options(
        "broker:9092", ["traces"], starting_timestamp_ms=1_700_000_000_000
    )
    for k, v in opts.items():
        assert isinstance(k, str) and isinstance(v, str)
        assert k in _KAFKA_SOURCE_OPTION_NAMES or k.startswith("kafka."), k
    reader = spark.readStream.format("kafka").options(**opts)
    try:
        reader.load()
    except Exception as e:  # no kafka connector jar in this container
        msg = str(e)
        assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg, msg
