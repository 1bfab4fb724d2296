"""The full reference topology over REAL Kafka TCP topics — the S1/S2
end-to-end run VERDICT r7 #7 asked for:

    schedule DSL → dat2 → [produce "daq-traces"] → trace-to-events
    (consume, detect, re-encode) → [produce "daq-events"] →
    digitiser-aggregator (consume, assemble) → [produce "frame-events"]
    → nexus front door (consume → spool → Spark) → event table

Every hop crosses the in-process broker as v1 wire messages (gzip on
the trace topic, like the reference's compressed transport), consumers
are built from the production `kafka_source_options` dict, multi-
partition topics route by the murmur2 default partitioner keyed on
digitiser id (the reference keys messages by source digitiser), and the
final stage lands in Spark through the kafka-source-shaped spool so
Structured Streaming can micro-batch it.  Parity oracle: the identical
chain run in-memory with no broker (tests/test_service_topology.py's
topology) must produce the same frames."""

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.generator.schedule import schedule_to_envelope
from supermusr_data_pipeline_spark.kafka import (
    MiniBroker,
    MiniProducer,
    consumer_from_options,
    read_kafka_spool_stream,
    spool_to_parquet,
)
from supermusr_data_pipeline_spark.kafka.client import KAFKA_SPOOL_SCHEMA
from supermusr_data_pipeline_spark.operators.event_formation import form_events
from supermusr_data_pipeline_spark.operators.frame_assembly import assemble_frames
from supermusr_data_pipeline_spark.sources import messages as M
from supermusr_data_pipeline_spark.sources.decode import (
    decode_aev2,
    decode_dat2,
    decode_dev2_messages,
)
from supermusr_data_pipeline_spark.streaming import encode_dev2_stream
from supermusr_data_pipeline_spark.streaming.envelope_stream import (
    ENVELOPE_STREAM_SCHEMA,
    encode_aev2_stream,
    kafka_source_options,
)
from supermusr_data_pipeline_spark.streaming.frame_assembly_stream import (
    events_long_to_messages,
)

N_FRAMES, N_DIG, N_CH = 3, 2, 2

SCRIPT = [
    {"action": "set_timestamp", "iso": "2024-01-01T12:00:00"},
    {"action": "run_start", "name": "run_k"},
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
    {"action": "run_stop", "name": "run_k"},
]

DETECT = dict(mode="fixed", threshold=300.0, duration=2, cool_off=0)


def _drain_to_df(spark, consumer):
    """Consume to quiescence and re-wrap as an envelope DataFrame — one
    service's Kafka-in boundary."""
    rows = []
    while True:
        batch = consumer.poll(max_wait_ms=100)
        if not batch:
            break
        rows.extend((r.key, r.value, r.topic) for r in batch)
    return spark.createDataFrame(rows, ENVELOPE_STREAM_SCHEMA)


def _messages_to_events_long(messages):
    return messages.select(
        "digitizer_id", "ts", "period_number", "protons_per_pulse", "running",
        "frame_number", "veto_flags",
        F.explode(F.arrays_zip("channel", "event_time", "event_voltage")).alias("e"),
    ).select(
        "digitizer_id", "ts", "period_number", "protons_per_pulse", "running",
        "frame_number", "veto_flags",
        F.col("e.channel").alias("channel"),
        F.col("e.event_time").alias("event_time"),
        F.col("e.event_voltage").alias("event_voltage"),
    )


def _frame_tuples(aev2_decoded):
    out = {}
    for r in aev2_decoded.collect():
        out[r.frame_number] = (
            r.complete,
            tuple(r.digitizers_present),
            tuple(r.channel),
            tuple(r.event_time),
            tuple(r.event_voltage),
            r.ts,
        )
    return out


def test_full_topology_over_kafka_topics(spark, tmp_path):
    env_dat2 = schedule_to_envelope(spark, SCRIPT, seed=9)
    dat2_rows = [r for r in env_dat2.collect() if r.topic == "daq-traces"]
    assert len(dat2_rows) == N_FRAMES * N_DIG

    with MiniBroker() as broker:
        broker.create_topic("daq-traces", partitions=2)
        broker.create_topic("daq-events", partitions=2)
        broker.create_topic("frame-events", partitions=1)

        # ---- generator service: produce dat2, gzip transport, keyed by
        # source digitiser (the reference's message key)
        with MiniProducer(broker.bootstrap, compression="gzip") as prod:
            for r in dat2_rows:
                did = M.decode_dat2(bytes(r.value))["digitizer_id"]
                prod.send("daq-traces", bytes(r.value), key=str(did).encode())

        # ---- trace-to-events service
        cons = consumer_from_options(
            kafka_source_options(broker.bootstrap, ["daq-traces"],
                                 starting_offsets="earliest")
        )
        traces = decode_dat2(_drain_to_df(spark, cons))
        assert traces.count() == N_FRAMES * N_DIG * N_CH
        events = form_events(traces, **DETECT)
        env_dev2 = encode_dev2_stream(events_long_to_messages(events))
        with MiniProducer(broker.bootstrap) as prod:
            for r in env_dev2.collect():
                prod.send("daq-events", bytes(r.value), key=bytes(r.key))

        # ---- digitiser-aggregator service
        cons = consumer_from_options(
            kafka_source_options(broker.bootstrap, ["daq-events"],
                                 starting_offsets="earliest")
        )
        messages = decode_dev2_messages(_drain_to_df(spark, cons))
        assert messages.count() == N_FRAMES * N_DIG
        frames = assemble_frames(
            _messages_to_events_long(messages), expected_digitizers=list(range(N_DIG))
        )
        env_aev2 = encode_aev2_stream(frames)
        with MiniProducer(broker.bootstrap) as prod:
            for r in env_aev2.collect():
                prod.send("frame-events", bytes(r.value), key=bytes(r.key))

        # ---- nexus front door: consume → spool (kafka-source column
        # shape) → Spark
        cons = consumer_from_options(
            kafka_source_options(broker.bootstrap, ["frame-events"],
                                 starting_offsets="earliest")
        )
        spool = str(tmp_path / "spool")
        n = spool_to_parquet(cons, spool)
        assert n == N_FRAMES

    spooled = spark.read.schema(KAFKA_SPOOL_SCHEMA).parquet(spool)
    got = _frame_tuples(decode_aev2(spooled.select("key", "value", "topic")))

    # ---- parity oracle: the same chain with no broker in the middle
    direct_traces = decode_dat2(env_dat2.withColumn("key", F.lit(None).cast("binary")))
    direct_events = form_events(direct_traces, **DETECT)
    direct_frames = assemble_frames(
        _messages_to_events_long(
            decode_dev2_messages(
                encode_dev2_stream(events_long_to_messages(direct_events))
            )
        ),
        expected_digitizers=list(range(N_DIG)),
    )
    want = _frame_tuples(decode_aev2(encode_aev2_stream(direct_frames)))

    assert set(got) == set(range(N_FRAMES))
    assert got == want, "Kafka-transported frames differ from the direct chain"
    assert all(v[0] for v in got.values())  # every frame complete


def test_kafka_to_nexus_sink_stream(spark, tmp_path):
    """The last hop of VERDICT r7 #7's done-criterion: run-control AND
    assembled-frame messages travel as wire messages over real topics,
    the run interval table folds from the consumed control stream, and
    the streaming NeXus sink writes the event table from the spooled
    frame stream — row-identical to the batch builder on the same wire
    data."""
    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.operators.nexus_sink import build_nexus_events
    from supermusr_data_pipeline_spark.operators.run_matching import (
        match_events_to_runs,
    )
    from supermusr_data_pipeline_spark.sources.decode import run_control_events
    from supermusr_data_pipeline_spark.streaming.nexus_stream import (
        write_nexus_stream,
    )
    from supermusr_data_pipeline_spark.streaming.run_lifecycle import (
        runs_from_control,
    )

    env = schedule_to_envelope(spark, SCRIPT, seed=9).collect()
    with MiniBroker() as broker:
        broker.create_topic("run-controls", partitions=1)
        broker.create_topic("frame-events", partitions=1)
        # control plane and data plane over their own topics
        with MiniProducer(broker.bootstrap) as prod:
            for r in env:
                if r.topic == "run-controls":
                    prod.send("run-controls", bytes(r.value))
        traces = decode_dat2(
            spark.createDataFrame(
                [(None, r.value, r.topic) for r in env if r.topic == "daq-traces"],
                ENVELOPE_STREAM_SCHEMA,
            )
        )
        frames = assemble_frames(
            form_events(traces, **DETECT), expected_digitizers=list(range(N_DIG))
        )
        with MiniProducer(broker.bootstrap) as prod:
            for r in encode_aev2_stream(frames).collect():
                prod.send("frame-events", bytes(r.value), key=bytes(r.key))

        # ---- nexus-writer service: both consumers from the production
        # option dict
        ctl = consumer_from_options(
            kafka_source_options(broker.bootstrap, ["run-controls"],
                                 starting_offsets="earliest")
        )
        runs = runs_from_control(
            run_control_events(_drain_to_df(spark, ctl))
        ).select("run_name", "collect_from", "collect_until")
        assert runs.count() == 1

        cons = consumer_from_options(
            kafka_source_options(broker.bootstrap, ["frame-events"],
                                 starting_offsets="earliest")
        )
        spool = str(tmp_path / "spool")
        assert spool_to_parquet(cons, spool) == N_FRAMES

    frame_stream = decode_aev2(
        read_kafka_spool_stream(spark, spool).select("key", "value", "topic")
    ).withColumn("event_voltage", F.col("event_voltage").cast("array<double>"))
    sink = str(tmp_path / "nexus")
    q = write_nexus_stream(frame_stream, runs, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(sink)

    # batch oracle over the SAME wire frames (read from the spool)
    wire_frames = decode_aev2(
        spark.read.schema(KAFKA_SPOOL_SCHEMA).parquet(spool).select("key", "value", "topic")
    )
    z = F.arrays_zip("channel", "event_time", "event_voltage")
    long = wire_frames.withColumn("_e", F.explode_outer(z)).select(
        "ts", "period_number", "protons_per_pulse", "running", "frame_number",
        F.col("veto_flags").alias("frame_veto_flags"), "complete",
        F.col("_e.channel").alias("channel"),
        F.col("_e.event_time").alias("event_time"),
        F.col("_e.event_voltage").cast("double").alias("event_voltage"),
    )
    want = build_nexus_events(match_events_to_runs(long, runs))

    cols = sorted(set(got.columns) & set(want.columns))
    # sort on every column: (frame, offset) alone is ambiguous when two
    # channels fire at the same sample
    g = sorted(tuple(r) for r in got.select(cols).collect())
    w = sorted(tuple(r) for r in want.select(cols).collect())
    assert len(g) > 0
    assert g == w, "Kafka-fed streaming sink differs from the batch builder"


def test_spool_feeds_structured_streaming(spark, tmp_path):
    """The spool is a Structured Streaming source: one poll = one file =
    one micro-batch ingestion unit, with the kafka source's columns."""
    with MiniBroker() as broker:
        with MiniProducer(broker.bootstrap) as prod:
            for i in range(6):
                prod.send("daq-traces", f"payload-{i}".encode(),
                          key=str(i % 2).encode(), timestamp_ms=1000 + i)
        cons = consumer_from_options(
            kafka_source_options(broker.bootstrap, ["daq-traces"],
                                 starting_offsets="earliest",
                                 max_offsets_per_trigger=4)
        )
        spool = str(tmp_path / "spool")
        n = spool_to_parquet(cons, spool)
        assert n == 6

    stream = read_kafka_spool_stream(spark, spool, max_files_per_trigger=1)
    assert stream.isStreaming
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).orderBy("offset", "partition").collect()
    assert len(rows) == 6
    assert {bytes(r.value) for r in rows} == {f"payload-{i}".encode() for i in range(6)}
    # offsets are per-partition sequences starting at 0
    per_part = {}
    for r in rows:
        per_part.setdefault(r.partition, []).append(r.offset)
    for offs in per_part.values():
        assert offs == list(range(len(offs)))
