"""The kafka-wire Python DataSource: format("kafka-wire") as a real
Structured Streaming source over the in-process broker — engine-managed
offset ranges (checkpoint resume), maxOffsetsPerTrigger admission
control, per-partition task reads, and the DAQ chain consuming it
directly with no spool files."""

import pytest

from supermusr_data_pipeline_spark.kafka import MiniBroker, MiniProducer
from supermusr_data_pipeline_spark.kafka.spark_source import KafkaWireDataSource
from supermusr_data_pipeline_spark.streaming.envelope_stream import kafka_source_options


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(KafkaWireDataSource)
    return spark


def _produce(bootstrap, topic, values, key=b"k", ts0=1000):
    with MiniProducer(bootstrap) as prod:
        for i, v in enumerate(values):
            prod.send(topic, v, key=key, timestamp_ms=ts0 + i)


def _run_until_count(spark, stream_df, out, ckpt, want, timeout_s=90):
    """Python stream sources don't support Trigger.AvailableNow (the
    engine falls back to ONE batch) — drive a processingTime trigger
    until the sink holds `want` rows, then stop."""
    import time

    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(processingTime="100 milliseconds").start()
    )
    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            try:
                if spark.read.parquet(out).count() >= want:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination(60)


def test_batch_read_snapshot(registered):
    spark = registered
    with MiniBroker() as b:
        b.create_topic("t", partitions=3)
        with MiniProducer(b.bootstrap) as prod:
            for i in range(30):
                prod.send("t", f"v{i}".encode(), key=f"key-{i}".encode(),
                          timestamp_ms=1000 + i)
        df = (
            spark.read.format("kafka-wire")
            .options(**kafka_source_options(b.bootstrap, ["t"],
                                            max_offsets_per_trigger=None))
            .load()
        )
        rows = df.collect()
        assert len(rows) == 30
        assert {bytes(r.value) for r in rows} == {f"v{i}".encode() for i in range(30)}
        assert {r.partition for r in rows} == {0, 1, 2}  # murmur2 spread
        # per-partition offsets are dense from 0
        per = {}
        for r in rows:
            per.setdefault(r.partition, []).append(r.offset)
        assert all(sorted(o) == list(range(len(o))) for o in per.values())


def test_stream_trigger_caps_and_resumes(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    with MiniBroker() as b:
        _produce(b.bootstrap, "s", [f"a{i}".encode() for i in range(10)])
        opts = kafka_source_options(
            b.bootstrap, ["s"], max_offsets_per_trigger=4,
            starting_offsets="earliest",
        )
        stream = spark.readStream.format("kafka-wire").options(**opts).load()
        _run_until_count(spark, stream, out, ckpt, want=10)
        got = spark.read.parquet(out)
        assert got.count() == 10
        # admission control: no micro-batch carried more than 4 offsets
        import glob
        import json

        sizes = []
        for f in sorted(glob.glob(f"{ckpt}/offsets/*")):
            if f.rsplit("/", 1)[-1].isdigit():
                with open(f) as fh:
                    lines = fh.read().strip().splitlines()
                sizes.append(json.loads(lines[-1]))
        ends = [v for d in sizes for v in d.values()]
        assert ends, "no offset log written"
        steps = [b - a for a, b in zip(ends, ends[1:])]
        assert all(s <= 4 for s in steps), steps

        # restart with the same checkpoint: only NEW records flow
        _produce(b.bootstrap, "s", [f"b{i}".encode() for i in range(3)], ts0=5000)
        stream2 = spark.readStream.format("kafka-wire").options(**opts).load()
        _run_until_count(spark, stream2, out, ckpt, want=13)
        vals = {bytes(r.value) for r in spark.read.parquet(out).collect()}
        assert vals == {f"a{i}".encode() for i in range(10)} | {
            f"b{i}".encode() for i in range(3)
        }
        assert spark.read.parquet(out).count() == 13  # no redelivery


def test_starting_timestamp_stream(registered, tmp_path):
    spark = registered
    with MiniBroker() as b:
        _produce(b.bootstrap, "tt", [b"old0", b"old1"], ts0=1000)
        _produce(b.bootstrap, "tt", [b"new0", b"new1"], ts0=9000)
        opts = kafka_source_options(b.bootstrap, ["tt"], starting_timestamp_ms=9000)
        out = str(tmp_path / "out")
        stream = spark.readStream.format("kafka-wire").options(**opts).load()
        _run_until_count(spark, stream, out, str(tmp_path / "ckpt"), want=2)
        vals = {bytes(r.value) for r in spark.read.parquet(out).collect()}
    assert vals == {b"new0", b"new1"}


def test_daq_chain_consumes_native_source(registered, tmp_path):
    """S1 fully Spark-native: aev2 frames on a live topic → readStream
    format('kafka-wire') → decode → streaming NeXus sink.  No spool
    files; offsets live in the engine checkpoint."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.schemas import FRAME_EVENT_LIST_SCHEMA
    from supermusr_data_pipeline_spark.sources.decode import decode_aev2
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        encode_aev2_stream,
    )
    from supermusr_data_pipeline_spark.streaming.nexus_stream import (
        write_nexus_stream,
    )

    spark = registered
    T0 = datetime(2024, 3, 1, 12, 0, 0)

    def frame_row(frame, n_events):
        return (
            T0 + timedelta(milliseconds=20 * frame), 1, 8, True, frame, 0, True,
            [0, 1], list(range(n_events)),
            [100 + 10 * i for i in range(n_events)],
            [float(i) for i in range(n_events)],
        )

    frames = spark.createDataFrame(
        [frame_row(1, 3), frame_row(2, 2)], FRAME_EVENT_LIST_SCHEMA
    )
    runs = spark.createDataFrame(
        [("run_w", T0 - timedelta(seconds=1), None)],
        "run_name string, collect_from timestamp, collect_until timestamp",
    )
    with MiniBroker() as b:
        with MiniProducer(b.bootstrap) as prod:
            for r in encode_aev2_stream(frames).collect():
                prod.send("frame-events", bytes(r.value), key=bytes(r.key))
        opts = kafka_source_options(b.bootstrap, ["frame-events"],
                                    starting_offsets="earliest")
        wire = (
            spark.readStream.format("kafka-wire").options(**opts).load()
            .select("key", "value", "topic")
        )
        decoded = decode_aev2(wire).withColumn(
            "event_voltage", F.col("event_voltage").cast("array<double>")
        )
        sink = str(tmp_path / "nexus")
        q = write_nexus_stream(decoded, runs, sink, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 5
    assert {r.frame_number for r in out.collect()} == {1, 2}
    assert out.filter("run_name = 'run_w'").count() == 5


def test_value_decode_dev2_fused_matches_two_stage(spark):
    """valueDecode=dev2 (decode fused into the source task) is
    row-identical to the two-stage raw-read -> decode_dev2_messages
    path, including the warn-and-skip of a non-dev2 payload on the
    topic (P8).  The fused form removes a JVM<->Python round trip of
    the raw payload bytes per micro-batch (r11, wire-door latency)."""
    from supermusr_data_pipeline_spark.kafka import (
        KafkaWireDataSource,
        MiniBroker,
        MiniProducer,
    )
    from supermusr_data_pipeline_spark.sources import messages as M
    from supermusr_data_pipeline_spark.sources.decode import decode_dev2_messages
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        kafka_source_options,
    )

    spark.dataSource.register(KafkaWireDataSource)
    with MiniBroker() as broker:
        broker.create_topic("t", partitions=2)
        with MiniProducer(broker.bootstrap) as prod:
            for i in range(24):
                md = {
                    "ts_ns": (1_700_000_000_000_000 + i * 20_000) * 1000,
                    "period_number": i // 8, "protons_per_pulse": 4,
                    "running": True, "frame_number": i, "veto_flags": i % 3,
                }
                prod.send(
                    "t",
                    M.encode_dev2(i % 4, md, [1, 2, 3], [10, 20, 30], [0, 1, 2]),
                    key=str(i % 4).encode(),
                )
            prod.send("t", b"garbage-not-a-dev2-payload", key=b"x")
        opts = kafka_source_options(
            broker.bootstrap, ["t"], starting_offsets="earliest"
        )
        fused = (
            spark.read.format("kafka-wire").options(**opts)
            .option("valueDecode", "dev2").load()
        )
        raw = spark.read.format("kafka-wire").options(**opts).load()
        two_stage = decode_dev2_messages(raw.select("key", "value", "topic"))
        a = sorted(map(repr, fused.collect()))
        b = sorted(map(repr, two_stage.collect()))
        assert len(a) == 24 and a == b

        import pytest

        with pytest.raises(Exception, match="valueDecode"):
            (
                spark.read.format("kafka-wire").options(**opts)
                .option("valueDecode", "protobuf").load().count()
            )


def test_value_decode_aev2_fused_matches_two_stage(spark):
    """valueDecode=aev2 (assembled-frame decode fused into the source
    task) is row-identical to the two-stage raw-read -> decode_aev2
    path, including the warn-and-skip of a non-aev2 payload (P8).  This
    is the aggregator -> nexus-writer wire leg (the reference writer's
    input, nexus-writer/src/main.rs): before the fusion it paid raw
    columns through the JVM plus a second Python stage."""
    from supermusr_data_pipeline_spark.kafka import (
        KafkaWireDataSource,
        MiniBroker,
        MiniProducer,
    )
    from supermusr_data_pipeline_spark.sources import messages as M
    from supermusr_data_pipeline_spark.sources.decode import decode_aev2
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        kafka_source_options,
    )

    spark.dataSource.register(KafkaWireDataSource)
    with MiniBroker() as broker:
        broker.create_topic("frames", partitions=2)
        with MiniProducer(broker.bootstrap) as prod:
            for i in range(16):
                md = {
                    "ts_ns": (1_700_000_000_000_000 + i * 20_000) * 1000,
                    "period_number": i // 8, "protons_per_pulse": 4,
                    "running": True, "frame_number": i, "veto_flags": i % 3,
                }
                prod.send(
                    "frames",
                    M.encode_aev2(
                        md, [1, 2, 3 + i], [10, 20, 30], [0, 1, 2],
                        complete=(i % 2 == 0),
                        digitizers_present=[0, 1, 2, 3],
                    ),
                    key=str(i).encode(),
                )
            prod.send("frames", b"garbage-not-an-aev2-payload", key=b"x")
        opts = kafka_source_options(
            broker.bootstrap, ["frames"], starting_offsets="earliest"
        )
        fused = (
            spark.read.format("kafka-wire").options(**opts)
            .option("valueDecode", "aev2").load()
        )
        raw = spark.read.format("kafka-wire").options(**opts).load()
        two_stage = decode_aev2(raw.select("key", "value", "topic"))
        a = sorted(map(repr, fused.collect()))
        b = sorted(map(repr, two_stage.collect()))
        assert len(a) == 16 and a == b


def test_assign_reads_only_listed_partitions(registered, tmp_path):
    """The JVM source's ``assign`` form (explicit topic-partitions):
    the fleet-sharding primitive — N writer instances each own a
    disjoint partition set of ONE topic.  Both the batch and streaming
    readers must plan ranges only for the assigned partitions, and the
    two shards' outputs must partition the topic's records exactly."""
    spark = registered
    with MiniBroker() as b:
        b.create_topic("t", partitions=4)
        with MiniProducer(b.bootstrap) as prod:
            for i in range(40):
                prod.send(
                    "t", f"v{i}".encode(), partition=i % 4,
                    timestamp_ms=1000 + i,
                )

        def read(assign):
            return (
                spark.read.format("kafka-wire")
                .options(**kafka_source_options(
                    b.bootstrap, [], max_offsets_per_trigger=None,
                    starting_offsets="earliest", assign=assign,
                ))
                .load()
                .collect()
            )

        lo = read({"t": [0, 1]})
        hi = read({"t": [2, 3]})
        assert {r.partition for r in lo} == {0, 1}
        assert {r.partition for r in hi} == {2, 3}
        assert len(lo) == len(hi) == 20
        assert {bytes(r.value) for r in lo} | {bytes(r.value) for r in hi} == {
            f"v{i}".encode() for i in range(40)
        }

        # streaming form: same planner, engine-managed offsets
        opts = kafka_source_options(
            b.bootstrap, [], starting_offsets="earliest",
            assign={"t": [1]},
        )
        stream = spark.readStream.format("kafka-wire").options(**opts).load()
        out = str(tmp_path / "out")
        _run_until_count(
            spark, stream, out, str(tmp_path / "ckpt"), want=10
        )
        got = spark.read.parquet(out).collect()
        assert {r.partition for r in got} == {1}
        assert len(got) == 10


def test_assign_option_validation(registered):
    spark = registered
    with MiniBroker() as b:
        b.create_topic("t", partitions=2)
        base = {"kafka.bootstrap.servers": b.bootstrap}
        with pytest.raises(Exception, match="mutually exclusive"):
            (
                spark.read.format("kafka-wire")
                .options(**base, subscribe="t", assign='{"t":[0]}')
                .load()
                .collect()
            )
        with pytest.raises(Exception, match="outside topic range"):
            (
                spark.read.format("kafka-wire")
                .options(**base, assign='{"t":[0,7]}')
                .load()
                .collect()
            )
