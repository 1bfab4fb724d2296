"""Streaming document dedup: first-arrival-wins over a watermarked
fingerprint state, agreeing with the batch q22 recipe on what counts as a
duplicate."""

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.streaming.doc_dedup import (
    dedup_documents_stream,
    fingerprint_documents,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "doc_id long, text string, ingest_ts timestamp"


def _drain(spark, q, table, min_rows, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if spark.sql(f"SELECT * FROM {table}").count() >= min_rows:
            break
        time.sleep(0.3)
    q.stop()


def test_dedup_stream_first_arrival_wins(spark, tmp_path):
    """Duplicates within and across micro-batches collapse to one row; the
    surviving row is deterministic per fingerprint (exactly one emitted)."""
    batch1 = [
        (1, "alpha beta", T0),
        (2, "gamma delta", T0 + timedelta(seconds=1)),
        (3, "ALPHA BETA", T0 + timedelta(seconds=2)),  # dup of 1 (lowercased)
    ]
    batch2 = [
        (4, "alpha beta", T0 + timedelta(seconds=3)),  # cross-batch dup of 1
        (5, "epsilon", T0 + timedelta(seconds=4)),
    ]
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1"), mode="overwrite"
    )
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(
        str(src / "b2"), mode="overwrite"
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        dedup_documents_stream(stream, ts_col="ingest_ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_doc_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    _drain(spark, q, "t_doc_dedup", 3)
    rows = spark.sql("SELECT * FROM t_doc_dedup").collect()
    texts = sorted(r.text.lower() for r in rows)
    assert texts == ["alpha beta", "epsilon", "gamma delta"]
    assert len({r.fingerprint for r in rows}) == 3


def test_stream_fingerprint_matches_batch_q22(spark):
    """Lockstep check: the streaming fingerprint equals the batch q22
    expression on identical text, so the lambda split (stream dedups the
    window, batch dedups history) never disagrees about identity."""
    docs = spark.createDataFrame(
        [(1, "Some Document Text", T0), (2, "some document text", T0)], SCHEMA
    )
    fps = fingerprint_documents(docs).select("doc_id", "fingerprint")
    q22_fp = docs.select(
        "doc_id", F.md5(F.lower("text")).alias("expected")
    )
    joined = fps.join(q22_fp, "doc_id")
    assert joined.filter(F.col("fingerprint") != F.col("expected")).count() == 0
    # the two differently-cased copies share one fingerprint
    assert fps.select("fingerprint").distinct().count() == 1
