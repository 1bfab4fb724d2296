"""Row-level parity: the streaming NeXus sink (driver-side dimension +
direct partition-dir writes, rebuilt round 7) must produce EXACTLY the
rows of the batch builder (operators/nexus_sink.build_nexus_events) on
the same assembled frames — including the zero-event-frame rule (one
null-event row that counts 1 toward event_index) and multi-run
matching."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.operators.nexus_sink import build_nexus_events
from supermusr_data_pipeline_spark.operators.run_matching import match_events_to_runs
from supermusr_data_pipeline_spark.schemas import FRAME_EVENT_LIST_SCHEMA
from supermusr_data_pipeline_spark.streaming.nexus_stream import write_nexus_stream

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _frames_df(spark):
    def row(frame, n_events, veto):
        return (
            T0 + timedelta(milliseconds=20 * frame),
            frame // 1000,
            4,
            True,
            frame,
            veto,
            frame % 2 == 0,
            [0, 1],
            [i % 8 for i in range(n_events)],
            [100 * frame + 10 * i for i in range(n_events)],
            [float(i) for i in range(n_events)],
        )

    rows = [row(1, 3, 1), row(2, 0, 2), row(3, 5, 0), row(4, 2, 4),
            row(120, 4, 8)]  # frame 120 lands in run_2
    return spark.createDataFrame(rows, FRAME_EVENT_LIST_SCHEMA)


def _runs_df(spark):
    return spark.createDataFrame(
        [
            ("run_1", T0 - timedelta(seconds=1), T0 + timedelta(seconds=2)),
            ("run_2", T0 + timedelta(seconds=2), None),
        ],
        "run_name string, collect_from timestamp, collect_until timestamp",
    )


def test_stream_sink_rows_equal_batch_builder(spark, tmp_path):
    frames = _frames_df(spark)
    runs = _runs_df(spark)

    # batch path: frames -> long events (explode_outer keeps the
    # zero-event frame as one null row) -> run match -> builder
    z = F.arrays_zip("channel", "event_time", "event_voltage")
    long = (
        frames.withColumn("_e", F.explode_outer(z))
        .select(
            "ts", "period_number", "protons_per_pulse", "running",
            "frame_number",
            F.col("veto_flags").alias("frame_veto_flags"),
            "complete",
            F.col("_e.channel").alias("channel"),
            F.col("_e.event_time").alias("event_time"),
            F.col("_e.event_voltage").alias("event_voltage"),
        )
    )
    batch_out = build_nexus_events(match_events_to_runs(long, runs))

    # streaming path: same frames through the foreachBatch sink
    frames_dir = str(tmp_path / "frames")
    frames.coalesce(1).write.parquet(frames_dir)
    stream = spark.readStream.schema(FRAME_EVENT_LIST_SCHEMA).parquet(frames_dir)
    sink = str(tmp_path / "sink")
    q = write_nexus_stream(stream, runs, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    stream_out = spark.read.parquet(sink)

    assert sorted(stream_out.columns) == sorted(batch_out.columns)
    cols = sorted(batch_out.columns)
    b = sorted(tuple(repr(r[c]) for c in cols) for r in batch_out.collect())
    s = sorted(tuple(repr(r[c]) for c in cols) for r in stream_out.collect())
    assert s == b, (
        f"stream sink diverged from batch builder:\nbatch={b}\nstream={s}"
    )
    # the zero-event frame contributed exactly one null-event row
    nulls = stream_out.filter("event_id IS NULL").collect()
    assert len(nulls) == 1 and nulls[0].frame_number == 2
