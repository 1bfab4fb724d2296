"""compact_nexus_run: the streaming sink's one-file-per-batch output must
compact to a single sorted zstd file per run with identical rows, and the
writer's totals-resume (T5) must read the compacted layout unchanged."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.plans.index_maintenance import compact_nexus_run
from supermusr_data_pipeline_spark.streaming.nexus_stream import NexusStreamWriter

FRAMES_SCHEMA = (
    "ts timestamp, period_number long, protons_per_pulse int, running boolean, "
    "frame_number long, veto_flags int, complete boolean, "
    "digitizers_present array<int>, channel array<int>, "
    "event_time array<long>, event_voltage array<double>"
)


def _frames(spark, lo, hi):
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(lo, hi):
        ts = datetime.fromtimestamp(base.timestamp() + i * 0.02, tz=timezone.utc)
        ev = list(range(i * 10, i * 10 + 5))
        rows.append(
            (ts.replace(tzinfo=None), 0, 4, True, i, 1, True, [0, 1],
             [e % 8 for e in ev], [e * 7 for e in ev], [float(e) for e in ev])
        )
    return spark.createDataFrame(rows, FRAMES_SCHEMA)


def _runs(spark):
    return spark.createDataFrame(
        # collect_from strictly BEFORE the first frame ts (J1 is a strict
        # inequality, run_parameters.rs:156-175)
        [("runA", "2023-12-31 23:59:59", "2024-01-02 00:00:00")],
        "run_name string, f string, u string",
    ).select(
        "run_name",
        F.to_timestamp("f").alias("collect_from"),
        F.to_timestamp("u").alias("collect_until"),
    )


def test_compact_run_identical_rows_and_resume(spark, tmp_path):
    sink = str(tmp_path / "sink")
    writer = NexusStreamWriter(_runs(spark), sink)
    # three micro-batches -> three files under run_name=runA
    writer(_frames(spark, 0, 4), 0)
    writer(_frames(spark, 4, 7), 1)
    writer(_frames(spark, 7, 10), 2)

    before = sorted(map(tuple, spark.read.parquet(sink).collect()))
    stats = compact_nexus_run(spark, sink, "run_name=runA")
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1

    after_df = spark.read.parquet(sink)
    after = sorted(map(tuple, after_df.collect()))
    assert after == before, "compaction changed the run's rows"

    # T5 resume over the compacted layout: a fresh writer continues the
    # frame_seq / event_index sequences exactly
    w2 = NexusStreamWriter(_runs(spark), sink)
    w2(_frames(spark, 10, 12), 3)
    out = spark.read.parquet(sink).filter("frame_number >= 10")
    seqs = sorted(r.frame_seq for r in out.select("frame_seq").distinct().collect())
    assert seqs == [10, 11]
    # event_index continues from 10 frames x 5 events
    idx0 = out.filter("frame_number = 10").select("event_index").distinct().collect()
    assert [r.event_index for r in idx0] == [50]
