"""Per-run log/alarm sink (S6 log side + J2): runlog/selog/alarm tables
written next to event data, one directory per run, with one-sided run
matching (nexus-writer/src/nexus/logs/f114.rs:1-79, se00.rs:1-147)."""

from datetime import datetime, timedelta

import pytest

from supermusr_data_pipeline_spark.operators.nexus_sink import (
    build_run_logs,
    write_nexus_logs,
)
from supermusr_data_pipeline_spark.operators.run_matching import match_logs_to_runs
from supermusr_data_pipeline_spark.schemas import (
    ALARM_SCHEMA,
    RUNLOG_SCHEMA,
    RUN_SCHEMA,
    SELOG_SCHEMA,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _runs(spark):
    # run_a [12:00, 12:10), run_b open since 12:20
    return spark.createDataFrame(
        [
            ("run_a", "a.nxs", "MUSR", T0, T0 + timedelta(minutes=10), 1),
            ("run_b", "b.nxs", "MUSR", T0 + timedelta(minutes=20), None, 1),
        ],
        RUN_SCHEMA,
    ).select("run_name", "collect_from", "collect_until")


def test_one_sided_match_routes_early_and_gap_logs(spark):
    """J2: a log BEFORE run_a's start lands in run_a; a log in the gap
    between runs lands in run_b (earliest run not ending before it); a log
    after the open run's start lands in run_b."""
    logs = spark.createDataFrame(
        [
            ("pv", T0 - timedelta(minutes=5), 1.0, "double", None),  # pre-start
            ("pv", T0 + timedelta(minutes=5), 2.0, "double", None),  # inside run_a
            ("pv", T0 + timedelta(minutes=15), 3.0, "double", None),  # gap
            ("pv", T0 + timedelta(minutes=30), 4.0, "double", None),  # open run
        ],
        RUNLOG_SCHEMA,
    )
    got = {r.value: r.run_name for r in match_logs_to_runs(logs, _runs(spark)).collect()}
    assert got == {1.0: "run_a", 2.0: "run_a", 3.0: "run_b", 4.0: "run_b"}


def test_build_run_logs_relative_time(spark):
    logs = spark.createDataFrame(
        [("pv", T0 - timedelta(seconds=1), 1.0, "double", None)], RUNLOG_SCHEMA
    )
    row = build_run_logs(logs, _runs(spark)).collect()[0]
    assert row.run_name == "run_a"
    assert row.log_time_ns == -1_000_000_000  # may precede the run start


def test_write_nexus_logs_per_run_layout(spark, tmp_path):
    runlog = spark.createDataFrame(
        [
            ("pv:t", T0 + timedelta(minutes=1), 1.5, "double", None),
            ("pv:t", T0 + timedelta(minutes=21), 2.5, "double", None),
        ],
        RUNLOG_SCHEMA,
    )
    selog = spark.createDataFrame(
        [("se:f", 1, T0 + timedelta(minutes=2), 100.0, "Start", [1.0, 2.0], None, 7)],
        SELOG_SCHEMA,
    )
    alarms = spark.createDataFrame(
        [("dev", T0 + timedelta(minutes=25), "MAJOR", "hot")], ALARM_SCHEMA
    )
    sink = str(tmp_path / "nexus")
    write_nexus_logs(runlog, selog, alarms, _runs(spark), sink)

    rl = spark.read.parquet(f"{sink}/runlog")
    by_run = {r.run_name: r for r in rl.collect()}
    assert by_run["run_a"].value == 1.5 and by_run["run_b"].value == 2.5
    assert by_run["run_a"].log_time_ns == 60_000_000_000
    assert (tmp_path / "nexus" / "runlog" / "run_name=run_a").exists()

    se = spark.read.parquet(f"{sink}/selog").collect()
    assert len(se) == 1 and se[0].run_name == "run_a" and se[0]["values"] == [1.0, 2.0]

    al = spark.read.parquet(f"{sink}/alarms").collect()
    assert len(al) == 1 and al[0].run_name == "run_b" and al[0].severity == "MAJOR"


def test_expand_se00_both_timestamp_branches(spark):
    """P10: explicit timestamps win when present; delta expansion otherwise
    (schemas/ecs_se00_data.fbs:143-150)."""
    from supermusr_data_pipeline_spark.operators.selog import expand_se00

    base_ns = int(T0.timestamp()) * 1_000_000_000
    rows = [
        # explicit, non-uniform timestamps
        ("a", 1, T0, 100.0, "Start", [1.0, 2.0], [base_ns + 5, base_ns + 17], 1),
        # delta-compressed (timestamps absent), fractional delta rounds per-sample
        ("b", 2, T0, 2.5, "Start", [3.0, 4.0, 5.0], None, 2),
    ]
    out = expand_se00(spark.createDataFrame(rows, SELOG_SCHEMA))
    got = {
        (r.name, r.sample_index): (r.sample_ts_ns, r.sample_value, r.from_explicit)
        for r in out.collect()
    }
    assert got[("a", 0)] == (base_ns + 5, 1.0, True)
    assert got[("a", 1)] == (base_ns + 17, 2.0, True)
    assert got[("b", 0)] == (base_ns, 3.0, False)
    assert got[("b", 1)] == (base_ns + 3, 4.0, False)  # Spark round() is HALF_UP: 2.5 -> 3
    assert got[("b", 2)] == (base_ns + 5, 5.0, False)


def test_no_open_run_drops_trailing_logs(spark):
    """A log after the last closed run (no open run) matches nothing —
    the writer drops messages outside every run (engine.rs:246-288)."""
    runs = spark.createDataFrame(
        [("run_a", "a.nxs", "MUSR", T0, T0 + timedelta(minutes=10), 1)], RUN_SCHEMA
    ).select("run_name", "collect_from", "collect_until")
    logs = spark.createDataFrame(
        [("pv", T0 + timedelta(minutes=11), 9.0, "double", None)], RUNLOG_SCHEMA
    )
    assert match_logs_to_runs(logs, runs).count() == 0


def test_two_open_runs_fail_loudly(spark):
    """The disjoint-interval rewrite requires at most one open run; a
    control stream that starts a second run without stopping the first must
    raise, not silently duplicate every log match."""
    runs = spark.createDataFrame(
        [
            ("run_a", "a.nxs", "MUSR", T0, None, 1),
            ("run_b", "b.nxs", "MUSR", T0 + timedelta(minutes=20), None, 1),
        ],
        RUN_SCHEMA,
    ).select("run_name", "collect_from", "collect_until")
    logs = spark.createDataFrame(
        [("pv", T0 + timedelta(minutes=30), 4.0, "double", None)], RUNLOG_SCHEMA
    )
    with pytest.raises(Exception, match="more than one open run"):
        match_logs_to_runs(logs, runs).collect()


def test_expand_se00_short_timestamps_vector(spark):
    """from_explicit is per SAMPLE: samples beyond a short timestamps
    vector fall back to the derived clock and report false."""
    from supermusr_data_pipeline_spark.operators.selog import expand_se00

    base_ns = int(T0.timestamp()) * 1_000_000_000
    rows = [("c", 3, T0, 10.0, "Start", [1.0, 2.0, 3.0], [base_ns + 5], 3)]
    out = expand_se00(spark.createDataFrame(rows, SELOG_SCHEMA))
    got = {r.sample_index: (r.sample_ts_ns, r.from_explicit) for r in out.collect()}
    assert got[0] == (base_ns + 5, True)
    assert got[1] == (base_ns + 10, False)
    assert got[2] == (base_ns + 20, False)
