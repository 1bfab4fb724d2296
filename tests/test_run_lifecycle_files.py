"""S7 — completed-run file lifecycle: retire stopped runs into completed/
(run/mod.rs:116-139) then archive-flush (flush_to_archive.rs:1-118), as
Hadoop-FS renames over the partitioned nexus sink."""

import os

from supermusr_data_pipeline_spark.generator import generate_runs, generate_traces
from supermusr_data_pipeline_spark.operators.nexus_sink import (
    flush_completed_to_archive,
    retire_completed_runs,
)
from supermusr_data_pipeline_spark.plans.daq_chain import daq_chain
from supermusr_data_pipeline_spark.operators.nexus_sink import write_nexus


def test_retire_and_archive(spark, tmp_path):
    traces = generate_traces(spark, n_frames=12, n_digitizers=2, n_samples=300)
    runs = generate_runs(spark, n_frames=12, frames_per_run=4, gap_frames=1)
    nexus = daq_chain(
        traces, runs, expected_digitizers=[0, 1], mode="fixed", threshold=300.0,
        duration=2, cool_off=0,
    )
    sink = str(tmp_path / "sink")
    write_nexus(nexus, sink)
    run_dirs = sorted(d for d in os.listdir(sink) if d.startswith("run_name="))
    assert len(run_dirs) >= 2

    # far-future "now": every stopped run is past its TTL; the open last run
    # (collect_until NULL) must never be retired
    moved = retire_completed_runs(
        spark, sink, runs, now="2030-01-01 00:00:00", run_ttl_ms=2000
    )
    open_runs = {r["run_name"] for r in runs.filter("collect_until IS NULL").collect()}
    stopped_with_data = {d.split("=")[1] for d in run_dirs} - open_runs
    assert sorted(moved) == sorted(stopped_with_data)
    assert not (set(moved) & open_runs)
    for name in moved:
        assert os.path.isdir(os.path.join(sink, "completed", f"run_name={name}"))
        assert not os.path.exists(os.path.join(sink, f"run_name={name}"))

    # a "now" before any stop retires nothing
    assert retire_completed_runs(spark, sink, runs, now="2000-01-01 00:00:00") == []

    archive = str(tmp_path / "archive")
    flushed = flush_completed_to_archive(spark, sink, archive)
    assert sorted(flushed) == sorted(f"run_name={m}" for m in moved)
    for name in moved:
        assert os.path.isdir(os.path.join(archive, f"run_name={name}"))
    assert flush_completed_to_archive(spark, sink, archive) == []

    # retired data stays readable: the archive is still a valid parquet table
    back = spark.read.parquet(archive)
    assert back.count() > 0


def test_retire_with_compaction(spark, tmp_path):
    """retire_completed_runs(compact=True): each retired run's partition
    is rewritten to ONE sorted zstd file with identical rows — the
    lifecycle closing the appender's file accumulation."""
    traces = generate_traces(spark, n_frames=8, n_digitizers=2, n_samples=300)
    runs = generate_runs(spark, n_frames=8, frames_per_run=4, gap_frames=0)
    nexus = daq_chain(
        traces, runs, expected_digitizers=[0, 1], mode="fixed", threshold=300.0,
        duration=2, cool_off=0,
    )
    sink = str(tmp_path / "sink")
    # write twice so each run dir holds multiple files (micro-batch shape)
    write_nexus(nexus.filter("event_index % 2 = 0"), sink)
    write_nexus(nexus.filter("event_index % 2 = 1"), sink, mode="append")
    before = {}
    for d in os.listdir(sink):
        if d.startswith("run_name="):
            p = os.path.join(sink, d)
            before[d] = sorted(
                tuple(map(repr, r)) for r in spark.read.parquet(p).collect()
            )
            assert len([f for f in os.listdir(p) if f.endswith(".parquet")]) > 1

    moved = retire_completed_runs(
        spark, sink, runs, now="2030-01-01 00:00:00", compact=True
    )
    assert moved
    for name in moved:
        p = os.path.join(sink, "completed", f"run_name={name}")
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        assert len(files) == 1 and files[0].endswith(".zstd.parquet")
        after = sorted(
            tuple(map(repr, r)) for r in spark.read.parquet(p).collect()
        )
        assert after == before[f"run_name={name}"]
