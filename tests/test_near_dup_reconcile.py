"""Lambda reconciliation for streaming near-dup: the stream's documented
recall holes (partner aged out of the horizon) are closed by the batch
backfill — stream-emitted pairs + backfill must EXACTLY equal the
authoritative full-tape batch pass, with per-pair provenance."""

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.streaming.near_dup_stream import (
    near_dup_pairs_batch,
    near_dup_pairs_stream,
    near_dup_reconcile,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "doc_id long, text string, ingest_ts timestamp"

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
# tape split so that doc 5 (dup of 1, near-dup of 2) arrives 30 min after
# its partners — far outside the stream's 1-minute horizon
DOCS_B1 = [
    (1, BASE, T0),
    (2, BASE.replace("pi", "zzz15"), T0 + timedelta(seconds=10)),
    (4, "completely different text about muon detectors", T0 + timedelta(seconds=20)),
]
DOCS_B2 = [
    (5, BASE, T0 + timedelta(minutes=30)),
]


def test_stream_plus_backfill_equals_batch(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(DOCS_B1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(DOCS_B2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))

    tape = spark.createDataFrame(DOCS_B1 + DOCS_B2, SCHEMA)
    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs_batch(tape, horizon=None).collect()
    }
    # the tape is built so the authoritative pass finds all three pairs
    assert set(truth) == {(1, 2), (1, 5), (2, 5)}

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        near_dup_pairs_stream(stream, ts_col="ingest_ts", horizon="1 minute")
        .writeStream.format("memory")
        .queryName("t_reconcile")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_reconcile").count() >= 1:
            break
        time.sleep(0.3)
    q.stop()

    stream_pairs = spark.sql("SELECT * FROM t_reconcile")
    # the stream alone is incomplete: 1-5 / 2-5 straddle the horizon
    assert {(r.doc_a, r.doc_b) for r in stream_pairs.collect()} == {(1, 2)}

    rec = near_dup_reconcile(stream_pairs, tape).collect()
    assert {(r.doc_a, r.doc_b) for r in rec} == set(truth)  # completeness restored
    by_pair = {(r.doc_a, r.doc_b): r for r in rec}
    assert by_pair[(1, 2)].source == "both"
    assert by_pair[(1, 5)].source == "backfill"
    assert by_pair[(2, 5)].source == "backfill"
    assert not any(r.source == "stream_only" for r in rec)
    # authoritative scores ride along for the downstream apply step
    for (a, b), jac in truth.items():
        assert by_pair[(a, b)].jaccard == jac
        assert by_pair[(a, b)].pair_ts is not None


def test_stream_only_anomaly_is_surfaced(spark):
    """A stream pair the authoritative pass lacks is labeled, not dropped —
    the alarm path the provenance column exists for."""
    tape = spark.createDataFrame(DOCS_B1 + DOCS_B2, SCHEMA)
    phantom = spark.createDataFrame(
        [(7, 9, 0.75, T0)], "doc_a long, doc_b long, jaccard double, pair_ts timestamp"
    )
    rec = near_dup_reconcile(phantom, tape)
    row = rec.filter((F.col("doc_a") == 7) & (F.col("doc_b") == 9)).collect()[0]
    assert row.source == "stream_only"
    assert row.jaccard == 0.75  # stream's values survive for diagnosis
