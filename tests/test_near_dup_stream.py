"""Streaming MinHash-LSH near-dup: stream pairs must match the batch
execution of the identical recipe on the same in-window data (lockstep by
shared expressions), including candidates that straddle micro-batches."""

import time
from datetime import datetime, timedelta

from supermusr_data_pipeline_spark.streaming.near_dup_stream import (

    near_dup_pairs_batch,
    near_dup_pairs_stream,
)

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

T0 = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "doc_id long, text string, ingest_ts timestamp"

# 16 tokens: a one-token swap is jaccard 15/17 ≈ 0.88, which these exact
# md5-derived signatures verifiably band-collide on (deterministic hashing)
BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
BASE2 = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
DOCS_B1 = [
    (1, BASE, T0),
    (2, BASE.replace("pi", "zzz15"), T0 + timedelta(seconds=1)),  # near-dup of 1
    (3, BASE2, T0 + timedelta(seconds=2)),
    (4, "completely different text about muon detectors", T0 + timedelta(seconds=3)),
]
DOCS_B2 = [
    (5, BASE, T0 + timedelta(seconds=4)),  # exact dup of 1, near-dup of 2 (cross-batch)
    (6, BASE2.replace("sixteen", "yard"), T0 + timedelta(seconds=5)),  # near-dup of 3
]


def _drain(spark, q, table, min_rows, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if spark.sql(f"SELECT * FROM {table}").count() >= min_rows:
            break
        time.sleep(0.3)
    q.stop()


def test_stream_pairs_match_batch_within_window(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(DOCS_B1, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1"), mode="overwrite"
    )
    spark.createDataFrame(DOCS_B2, SCHEMA).coalesce(1).write.parquet(
        str(src / "b2"), mode="overwrite"
    )

    batch_docs = spark.createDataFrame(DOCS_B1 + DOCS_B2, SCHEMA)
    expected = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs_batch(batch_docs, horizon="1 hour").collect()
    }
    # the corpus is built to contain these (exact dup 1-5; one-token swaps)
    assert (1, 5) in expected and expected[(1, 5)] == 1.0
    assert (1, 2) in expected and (3, 6) in expected
    assert not any(4 in p for p in expected)

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        near_dup_pairs_stream(stream, ts_col="ingest_ts", horizon="1 hour")
        .writeStream.format("memory")
        .queryName("t_near_dup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    _drain(spark, q, "t_near_dup", len(expected))
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in spark.sql("SELECT * FROM t_near_dup").collect()
    }
    assert got == expected  # stream == batch on in-window data, jaccard included


def test_near_dup_survives_restart(spark, tmp_path):
    """Join + dedup state recover from the checkpoint: a near-dup pair whose
    two sides arrive on opposite sides of a query restart is still found,
    and pairs already emitted are not re-emitted.  (File sink — the memory
    sink does not support checkpoint recovery.)"""
    src = tmp_path / "docs"
    out = str(tmp_path / "out")
    src.mkdir()
    spark.createDataFrame(DOCS_B1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))

    def start():
        stream = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src / "*"))
        return (
            near_dup_pairs_stream(stream, ts_col="ingest_ts", horizon="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    def sink_pairs():
        try:
            return {
                (r.doc_a, r.doc_b) for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return set()

    def drain(q, min_pairs):
        deadline = time.time() + 120
        while time.time() < deadline:
            if len(sink_pairs()) >= min_pairs:
                break
            time.sleep(0.3)
        q.stop()

    q = start()
    drain(q, 1)  # (1, 2) from within b1
    assert sink_pairs() == {(1, 2)}

    # b2 lands while the query is DOWN; restart must resume from join state
    spark.createDataFrame(DOCS_B2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    q = start()
    drain(q, 4)
    # cross-restart pairs found; (1, 2) not re-emitted (exactly-once sink)
    assert sink_pairs() == {(1, 2), (1, 5), (2, 5), (3, 6)}


def test_degenerate_hot_bucket_is_capped(spark, tmp_path):
    """The stop-bucket guard: 200 identical docs land in ONE band bucket
    (all four, in fact) inside one horizon.  Uncapped, that is 19 900
    verified pairs and quadratic join state; with the cap only the first
    ``cap`` arrivals participate, so pair output is C(cap, 2) from the
    lowest band and state stays at cap rows per bucket.  The batch oracle
    applies the identical admission rule, so stream == batch even here."""
    cap = 8
    n_hot = 200
    hot = [
        (100 + i, BASE, T0 + timedelta(seconds=i)) for i in range(n_hot)
    ]
    normal = [
        (1, BASE2, T0),
        (2, BASE2.replace("sixteen", "yard"), T0 + timedelta(seconds=1)),
    ]
    docs = hot + normal
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(docs, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))

    expected = {
        (r.doc_a, r.doc_b)
        for r in near_dup_pairs_batch(
            spark.createDataFrame(docs, SCHEMA), horizon="1 hour", bucket_cap=cap
        ).collect()
    }
    hot_expected = {p for p in expected if p[0] >= 100}
    assert len(hot_expected) == cap * (cap - 1) // 2  # 28, not 19 900
    # only the cap earliest arrivals are in any pair
    assert max(d for p in hot_expected for d in p) == 100 + cap - 1
    assert (1, 2) in expected  # sub-cap buckets unaffected

    stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
    q = (
        near_dup_pairs_stream(stream, ts_col="ingest_ts", horizon="1 hour", bucket_cap=cap)
        .writeStream.format("memory")
        .queryName("t_hot_bucket")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    _drain(spark, q, "t_hot_bucket", len(expected))
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.sql("SELECT * FROM t_hot_bucket").collect()
    }
    assert got == expected
