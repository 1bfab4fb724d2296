"""Streaming curation front door: the stateless gate must agree row-for-row
with the batch composition of q40 + q56 + q50 (shared column definitions),
and the full stream (dedup + gate) must admit exactly the curated set."""

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.plans.text_dedup import with_quality_metrics
from supermusr_data_pipeline_spark.sources.testdata import load_table
from supermusr_data_pipeline_spark.streaming.curation_gate import (
    CURATED_COLUMNS,
    curate_documents,
    curate_documents_stream,
)

SF_DIR = "/root/testdata/sf0.001"
T0 = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "doc_id long, text string, lang string, source string, ingest_ts timestamp"

GOOD = (
    "the quick brown fox jumps over the lazy dog and that is fine "
    "for a quality gate to admit with real words"
)
PII = (
    "the contact for the data team is alice@example.com and the backup "
    "host is 10.1.2.3 which should have been redacted before training"
)
SHORT = "too short"  # fails the n_words >= 5 rule
PUNCT = "the !!! ??? ;;; ::: @@@ ### $$$ %%% ^^^ &&& *** ((( )))"  # punct_ratio


def _rows():
    return [
        (1, GOOD, "en", "src0", T0),
        (2, PII, "en", "src0", T0 + timedelta(seconds=1)),
        (3, SHORT, "en", "src1", T0 + timedelta(seconds=2)),
        (4, PUNCT, "en", "src1", T0 + timedelta(seconds=3)),
        (5, GOOD, "en", "src2", T0 + timedelta(seconds=4)),  # exact dup of 1
    ]


def test_gate_batch_semantics_on_crafted_docs(spark):
    out = curate_documents(spark.createDataFrame(_rows(), SCHEMA))
    by_id = {r.doc_id: r for r in out.collect()}
    assert set(by_id) == {1, 2, 5}  # SHORT and PUNCT rejected, no dedup here
    assert by_id[2].n_emails == 1 and by_id[2].n_ips == 1
    assert "[EMAIL]" in by_id[2].clean_text and "[IP]" in by_id[2].clean_text
    assert "alice@example.com" not in by_id[2].clean_text
    assert by_id[1].clean_text == GOOD  # clean docs pass through unchanged
    assert by_id[1].split in ("train", "val", "test")
    assert by_id[1].ingest_ts is not None  # extra columns ride along


def test_gate_matches_batch_queries_on_corpus(spark):
    """Lockstep with the batch tier: the gate's admitted doc_ids are exactly
    q40's passing set, and its metric values are q40's values."""
    docs = load_table(spark, SF_DIR, "documents")
    gate = {r.doc_id: r for r in curate_documents(docs).collect()}
    q40 = {
        r.doc_id: r
        for r in with_quality_metrics(docs).select("doc_id", "n_words", "passes").collect()
    }
    assert set(gate) == {d for d, r in q40.items() if r.passes}
    for d, r in gate.items():
        assert r.n_words == q40[d].n_words
    assert set(CURATED_COLUMNS).issubset(set(next(iter(gate.values())).asDict()))


def test_full_stream_dedups_then_gates(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(
        str(src / "b1"), mode="overwrite"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
    q = (
        curate_documents_stream(stream, dedup_watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_curation_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_curation_gate").count() >= 2:
            break
        time.sleep(0.3)
    q.stop()
    rows = spark.sql("SELECT * FROM t_curation_gate").collect()
    ids = sorted(r.doc_id for r in rows)
    assert ids == [1, 2]  # 3/4 quality-rejected, 5 dedup-dropped (dup of 1)
    assert [r for r in rows if r.doc_id == 2][0].n_emails == 1


def test_ingest_report_counts_rejects_and_pii(spark, tmp_path):
    from supermusr_data_pipeline_spark.streaming.curation_gate import (
        ingest_report_stream,
    )

    rows = _rows() + [(6, GOOD, "en", "src9", T0 + timedelta(hours=6))]  # flush
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1"), mode="overwrite"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
    q = (
        ingest_report_stream(stream, window="1 hour", watermark="1 second")
        .writeStream.format("memory")
        .queryName("t_ingest_report")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM t_ingest_report").count() >= 3:
            break
        time.sleep(0.3)
    q.stop()
    got = {r.source: r for r in spark.sql("SELECT * FROM t_ingest_report").collect()}
    # src0: GOOD + PII doc — both pass, one carries 2 PII hits
    assert got["src0"].n_docs == 2 and got["src0"].n_pass == 2
    assert got["src0"].n_pii_hits == 2
    # src1: SHORT + PUNCT — both rejected, visible in the report
    assert got["src1"].n_docs == 2 and got["src1"].n_pass == 0
    assert got["src2"].n_pass == 1
