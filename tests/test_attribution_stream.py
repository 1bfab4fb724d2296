"""Stream-stream join gates: stream == batch on an in-watermark tape, the
out-of-horizon purchase matches nothing, and the join's buffered state is
visible (and bounded) in the query progress."""

import time
from datetime import datetime, timedelta

from supermusr_data_pipeline_spark.streaming.attribution_stream import (

    attribute_purchases_batch,
    attribute_purchases_stream,
)

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
T0 = datetime(2024, 5, 1, 9, 0, 0)


def _rows():
    m = lambda k: T0 + timedelta(minutes=k)
    return [
        (1, m(0), 1, "click", 0.0, ""),
        (2, m(5), 1, "purchase", 9.99, ""),     # pairs with click 1
        (3, m(10), 1, "click", 0.0, ""),
        (4, m(12), 1, "purchase", 5.00, ""),    # pairs with clicks 1 AND 3
        (5, m(0), 2, "click", 0.0, ""),
        (6, m(200), 2, "purchase", 1.00, ""),   # > 1h after the click: no pair
        (7, m(1), 3, "purchase", 2.50, ""),     # user 3 never clicked
        (8, m(240), 9, "click", 0.0, ""),       # watermark pusher
        (9, m(240), 9, "purchase", 0.0, ""),
    ]


def test_stream_matches_batch_and_horizon_binds(spark, tmp_path):
    rows = _rows()
    batch = attribute_purchases_batch(
        spark.createDataFrame(rows, SCHEMA)
    )
    expected = {
        (r.click_id, r.purchase_id): (r.user_id, r.secs_to_convert, r.purchase_value)
        for r in batch.collect()
    }
    # semantics sanity before the parity question
    assert set(expected) >= {(1, 2), (1, 4), (3, 4), (8, 9)}
    assert not any(cid == 5 or pid == 6 for cid, pid in expected if pid == 6), (
        "out-of-horizon purchase must not attribute"
    )
    assert not any(pid == 7 for _c, pid in expected)

    src = tmp_path / "events"
    src.mkdir()
    spark.createDataFrame(rows[:4], SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows[4:], SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        attribute_purchases_stream(stream)
        .writeStream.format("memory")
        .queryName("t_attr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_attr").count() >= len(expected):
            break
        time.sleep(0.3)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    q.stop()
    got = {
        (r.click_id, r.purchase_id): (r.user_id, r.secs_to_convert, r.purchase_value)
        for r in spark.sql("SELECT * FROM t_attr").collect()
    }
    assert got == expected
    # the join IS stateful, and its buffered rows are bounded by the tape
    ops = progresses[-1]["stateOperators"]
    assert any("symmetricHashJoin" in op["operatorName"] for op in ops)
    total_state = sum(op["numRowsTotal"] for op in ops)
    assert 0 < total_state <= len(_rows()) * 2
