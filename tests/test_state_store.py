"""State-store scale contract for the streaming operators, run under the
RocksDB provider (the 100 TB configuration — the default HDFS-backed store
keeps all state on the JVM heap and is the first thing to fall over):

1. dedup state must NOT grow monotonically past the watermark horizon — the
   engine has to evict fingerprints older than the horizon (this is the
   test that catches the classic ``dropDuplicates(key-only)`` trap, whose
   state ignores the watermark and grows forever);
2. the RocksDB provider must actually be in effect (rocksdb custom metrics
   in the query progress), not silently fall back to the default store.
"""

import time
from datetime import datetime, timedelta

import pytest

from supermusr_data_pipeline_spark.streaming.doc_dedup import dedup_documents_stream
from supermusr_data_pipeline_spark.streaming.state_store import (
    configure_rocksdb,
    rocksdb_state_conf,
)


# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

T0 = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "doc_id long, text string, ingest_ts timestamp"

N_BATCHES = 6
DOCS_PER_BATCH = 10
BATCH_SPACING_S = 60  # event time advances a minute per batch
WATERMARK = "30 seconds"  # horizon well inside the spacing -> must evict


@pytest.fixture
def rocksdb_session(spark):
    prior = {k: spark.conf.get(k, None) for k in rocksdb_state_conf()}
    configure_rocksdb(spark)
    yield spark
    for k, v in prior.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_dedup_state_bounded_under_watermark(rocksdb_session, tmp_path):
    spark = rocksdb_session
    src = tmp_path / "docs"
    src.mkdir()
    total = 0
    for b in range(N_BATCHES):
        t = T0 + timedelta(seconds=b * BATCH_SPACING_S)
        rows = [
            (b * DOCS_PER_BATCH + i, f"text {b} {i}", t + timedelta(seconds=i))
            for i in range(DOCS_PER_BATCH)
        ]
        total += len(rows)
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"b{b}"), mode="overwrite"
        )

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        dedup_documents_stream(stream, ts_col="ingest_ts", watermark=WATERMARK)
        .writeStream.format("memory")
        .queryName("t_state_bound")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_state_bound").count() >= total:
            break
        time.sleep(0.3)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    q.stop()

    assert spark.sql("SELECT * FROM t_state_bound").count() == total  # all unique

    state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    final = state_rows[-1]
    # 6 batches x 10 docs ingested; horizon covers at most ~2 batches of
    # fingerprints.  Unevicted state would sit at `total` (60).
    assert final < total / 2, (
        f"dedup state did not age out: {final} rows retained of {total} "
        f"ingested (history: {state_rows})"
    )
    # eviction must actually have removed rows at some point
    assert any(p["stateOperators"][0]["numRowsRemoved"] > 0 for p in progresses)

    # the RocksDB provider is really in effect, not a silent fallback
    custom = progresses[-1]["stateOperators"][0].get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in custom), sorted(custom)[:5]


def test_near_dup_stream_runs_under_rocksdb(rocksdb_session, tmp_path):
    """The single stateful pair-emitter (capped per-bucket state) runs
    under the RocksDB provider and produces the same pairs as the default
    store (result checked in test_near_dup_stream; here: pairs found +
    rocksdb metrics present)."""
    from supermusr_data_pipeline_spark.streaming.near_dup_stream import (
        near_dup_pairs_stream,
    )

    spark = rocksdb_session
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    docs = [
        (1, base, T0),
        (2, base.replace("pi", "zzz15"), T0 + timedelta(seconds=1)),
        (3, "unrelated words entirely here", T0 + timedelta(seconds=2)),
    ]
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(docs, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
    q = (
        near_dup_pairs_stream(stream, ts_col="ingest_ts", horizon="1 hour")
        .writeStream.format("memory")
        .queryName("t_ndup_rocks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_ndup_rocks").count() >= 1:
            break
        time.sleep(0.3)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    q.stop()
    rows = spark.sql("SELECT * FROM t_ndup_rocks").collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(1, 2)}
    ops = progresses[-1]["stateOperators"]
    # ONE stateful operator by design: the pair emitter needs no downstream
    # dedup state (lowest-colliding-band ownership dedups by construction)
    assert [op["operatorName"] for op in ops] == ["applyInPandasWithState"]
    assert any(
        "rocksdb" in k.lower() for op in ops for k in op.get("customMetrics", {})
    )


def test_duplicate_after_horizon_reemits(rocksdb_session, tmp_path):
    """The documented bounded-state trade, pinned: a duplicate arriving
    after its original aged out of the watermark window is re-emitted (the
    batch layer owns cross-window exactness in the lambda split).  If this
    test starts failing with one row, state stopped being evicted — the
    memory win silently vanished."""
    spark = rocksdb_session
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(
        [(1, "same text", T0)], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1"))
    # two filler batches: the first advances the watermark past the
    # original, the second lets the end-of-batch state cleanup run under
    # that watermark (watermarks update at batch boundaries and eviction
    # happens after a batch's input is matched, so a dup needs to arrive
    # two batches after the horizon passed to see evicted state)
    spark.createDataFrame(
        [(10, "other text", T0 + timedelta(hours=1))], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b2"))
    spark.createDataFrame(
        [(11, "more text", T0 + timedelta(minutes=90))], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b3"))
    # 2h later: far past the 30s horizon; original's fingerprint is evicted
    spark.createDataFrame(
        [(2, "same text", T0 + timedelta(hours=2))], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b4"))
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        dedup_documents_stream(stream, ts_col="ingest_ts", watermark=WATERMARK)
        .writeStream.format("memory")
        .queryName("t_reemit")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_reemit").count() >= 4:
            break
        time.sleep(0.3)
    q.stop()
    rows = spark.sql("SELECT doc_id FROM t_reemit").collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 10, 11]


def test_gap_fill_stream_runs_under_rocksdb(rocksdb_session, tmp_path):
    """The timer-driven gap-fill (O(1) state per event type, EventTime
    timeout) runs under the RocksDB provider: gap rows emitted, rocksdb
    custom metrics present (parity with batch q86 is pinned in
    tests/test_gap_fill_stream.py under the default store)."""
    from supermusr_data_pipeline_spark.streaming.gap_fill_stream import (
        gap_fill_stream,
    )

    spark = rocksdb_session
    ev_schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    rows = [
        (1, T0, 1, "a", 10.0, ""),
        (2, T0 + timedelta(hours=2), 1, "a", 12.0, ""),  # hour 1 is a gap
        (3, T0 + timedelta(hours=3), 1, "a", 13.0, ""),
    ]
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(rows, ev_schema).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(ev_schema).parquet(str(src / "*"))
    q = (
        gap_fill_stream(stream, ts_col="ts", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("t_gapfill_rocks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_gf"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_gapfill_rocks").count() >= 3:
            break
        time.sleep(0.3)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    q.stop()
    got = {r.hour_us: r for r in spark.sql("SELECT * FROM t_gapfill_rocks").collect()}
    assert len(got) >= 3
    gaps = [r for r in got.values() if r.is_gap]
    assert gaps and all(r.n_events == 0 and r.filled_value == 10.0 for r in gaps)
    ops = progresses[-1]["stateOperators"]
    assert any(
        "rocksdb" in k.lower() for op in ops for k in op.get("customMetrics", {})
    )
