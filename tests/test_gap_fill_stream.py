"""Streaming gap-fill: on an ordered in-watermark tape the emitted rows
must equal batch q86 row-for-row, including gap rows INVENTED between
observed hours and the final pending hour flushed by the event-time
timeout (output that exists because time passed, not because data
arrived)."""

import time
from datetime import datetime, timedelta

import __spark_entry__ as entry_mod
from supermusr_data_pipeline_spark.streaming.gap_fill_stream import gap_fill_stream

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
T0 = datetime(2024, 3, 1, 0, 15, 0)


def _rows():
    """Two types; type 'a' has a 2-hour gap, type 'b' is contiguous."""
    h = timedelta(hours=1)
    return [
        (1, T0, 1, "a", 10.0, ""),
        (2, T0 + timedelta(minutes=5), 1, "a", 11.0, ""),
        (3, T0 + 3 * h, 1, "a", 12.0, ""),          # hours 1,2 are gaps
        (4, T0 + 4 * h, 1, "a", 13.0, ""),
        (5, T0, 2, "b", 1.0, ""),
        (6, T0 + h, 2, "b", 2.0, ""),
        (7, T0 + 2 * h, 2, "b", 3.0, ""),
        # watermark pushers so the final pending hours time out
        (8, T0 + 9 * h, 3, "a", 99.0, ""),
        (9, T0 + 9 * h, 3, "b", 99.0, ""),
    ]


def _drain(spark, q, table, min_rows, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if spark.sql(f"SELECT * FROM {table}").count() >= min_rows:
            break
        time.sleep(0.3)
    q.stop()


def test_stream_matches_batch_q86(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = _rows()
    # two ordered files -> two micro-batches; the late watermark pushers
    # ride in a third so earlier hours close deterministically
    spark.createDataFrame(rows[:4], SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows[4:7], SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    spark.createDataFrame(rows[7:], SCHEMA).coalesce(1).write.parquet(str(src / "b3"))

    # batch expectation: q86 over the same tape (written as a corpus dir)
    corpus = tmp_path / "sf"
    corpus.mkdir()
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(corpus / "events.parquet"))
    expected = {
        (r.event_type, r.hour_us): (r.n_events, r.filled_value, r.is_gap)
        for r in entry_mod.queries()["q86_gap_fill"](spark, str(corpus)).collect()
    }
    # the tape's final hour (the watermark pusher) stays PENDING when the
    # stream stops — only hours strictly before it are comparable
    last_us = {"a": max(u for (t, u) in expected if t == "a"),
               "b": max(u for (t, u) in expected if t == "b")}
    comparable = {k: v for k, v in expected.items() if k[1] < last_us[k[0]]}

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        gap_fill_stream(stream, ts_col="ts", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("t_gap_fill")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    _drain(spark, q, "t_gap_fill", len(comparable))
    got = {
        (r.event_type, r.hour_us): (r.n_events, r.filled_value, r.is_gap)
        for r in spark.sql("SELECT * FROM t_gap_fill").collect()
    }
    missing = set(comparable) - set(got)
    assert not missing, f"stream missed hours: {sorted(missing)[:5]}"
    for k, v in comparable.items():
        assert got[k] == v, f"{k}: stream {got[k]} != batch {v}"
    # the invented rows actually exist: type 'a' has gap hours
    assert any(r[2] for k, r in got.items() if k[0] == "a"), "no gap rows emitted"
