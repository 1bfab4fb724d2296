"""Era-detection contract for the events table loader: the legacy
nanosAsLong conf is only set when the parquet footer actually contains
TIMESTAMP(NANOS), a directory mixing generator eras fails fast with a clear
error (even when the deviant file sorts late in the listing), and the NTZ
conversion is column-scoped wall-as-UTC arithmetic — TZ-independent
instants with no session-timezone side effect."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from supermusr_data_pipeline_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _write_events(path, unit):
    # the same instant (2020-09-13T12:26:40Z) expressed in the era's unit
    val = 1_600_000_000 * {"us": 10**6, "ns": 10**9}[unit]
    ts = pa.array([val], type=pa.timestamp(unit))
    pq.write_table(pa.table({"ts": ts, "event_id": pa.array([1], pa.int64())}), path)


def test_micros_era_does_not_set_legacy_conf(spark, tmp_path):
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), "us")
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")


def test_nanos_era_sets_legacy_conf_and_loads(spark, tmp_path):
    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), "ns")
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # same instant regardless of era: 2020-09-13T12:26:40 UTC
    assert str(df.collect()[0].ts) == "2020-09-13 12:26:40"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_mixed_era_directory_fails_fast(spark, tmp_path):
    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), "us")
    _write_events(str(d / "part-1.parquet"), "ns")
    with pytest.raises(ValueError, match="mixes generator eras"):
        load_table(spark, str(tmp_path), "events")


def test_mixed_era_detected_when_deviant_file_sorts_last(spark, tmp_path):
    """The footer sample is an even spread over the sorted listing, so a
    late-sorting deviant-era file (a re-run with a newer generator) is
    caught by the fail-fast, not deferred to a confusing scan-time error."""
    d = tmp_path / "events.parquet"
    d.mkdir()
    for i in range(20):  # more part files than the 16-footer sample
        _write_events(str(d / f"part-{i:05d}.parquet"), "us")
    _write_events(str(d / "part-99999.parquet"), "ns")  # past any 16-prefix
    with pytest.raises(ValueError, match="mixes generator eras"):
        load_table(spark, str(tmp_path), "events")


def test_ntz_conversion_is_column_scoped_not_session_clobbering(spark, tmp_path):
    """A session drifted off UTC still decodes NTZ data as UTC instants —
    and the loader does NOT overwrite the caller's session timezone (the
    conversion is column arithmetic, not a session-wide side effect)."""
    from pyspark.sql import functions as F

    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), "us")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_table(spark, str(tmp_path), "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        # instant comparison (unix micros) — collect() would render in the
        # session zone, which is exactly the dependence we removed
        assert (
            df.select(F.unix_micros("ts")).collect()[0][0]
            == 1_600_000_000 * 10**6
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_real_testdata_still_loads(spark):
    df = load_table(spark, SF_DIR, "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"].startswith("timestamp")
