"""Streaming curation front door for document ingest — the streaming lift
of the batch curation steps a pretraining pipeline runs as data lands:
exact dedup (optional, stateful), Gopher-style quality gating (q40),
PII scrub (q56), and train/val/test split stamping (q50).

Batch/stream unification is by CONSTRUCTION, not by parallel maintenance:
the gate composes the exact same column definitions the batch queries use
(``plans.text_dedup.with_quality_metrics``, ``plans.text_train.
with_pii_scrub``, ``plans.text_dedup._split_case_spark``), so a document
admitted by the stream is byte-for-byte the document the batch capstone
(q46) would admit — pinned by the lockstep test
(tests/test_curation_gate_stream.py).

Scale/state design: everything except the optional dedup stage is a
STATELESS narrow map (JVM regex + higher-order functions, no Python, no
shuffle) — it scales with source parallelism and needs no watermark.  The
dedup stage is ``doc_dedup.dedup_documents_stream``'s watermark-bounded
first-arrival state (RocksDB-backed on a cluster); near-dup and semantic
dedup stay in the batch/lambda tier (near_dup_stream.py, q58) because
their state is relational, not keyed-by-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.text_dedup import _split_case_spark, with_quality_metrics
from ..plans.text_train import with_pii_scrub
from .doc_dedup import dedup_documents_stream

#: columns the gate emits, in order — the curated-ingest record schema
CURATED_COLUMNS = [
    "doc_id",
    "source",
    "lang",
    "n_words",
    "mean_word_len",
    "punct_ratio",
    "stop_hits",
    "n_emails",
    "n_phones",
    "n_ips",
    "clean_text",
    "split",
]


def curate_documents(docs: DataFrame) -> DataFrame:
    """The stateless gate over any documents frame (batch OR streaming —
    the plan is identical): score quality, DROP failing docs, scrub PII,
    stamp the hash split.  Extra input columns (e.g. the event-time
    column) pass through untouched."""
    passed = with_quality_metrics(docs).filter(F.col("passes")).drop("passes")
    scrubbed = with_pii_scrub(passed).drop("text")
    extra = [c for c in scrubbed.columns if c not in CURATED_COLUMNS]
    return scrubbed.withColumn(
        "split", F.expr(_split_case_spark("doc_id"))
    ).select(*CURATED_COLUMNS, *extra)


def curate_documents_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    dedup_watermark: str | None = "10 minutes",
) -> DataFrame:
    """The full streaming front door: optional exact dedup (first-arrival
    wins within ``dedup_watermark``), then the stateless curation gate.
    Pass ``dedup_watermark=None`` for a purely stateless pipeline."""
    if dedup_watermark is not None:
        docs = dedup_documents_stream(
            docs, ts_col=ts_col, watermark=dedup_watermark
        ).drop("fingerprint")
    return curate_documents(docs)


def ingest_report_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "1 minute",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Gate observability: per-(window, source) admission metrics over the
    RAW stream (metrics see rejected docs too, so the reject rate is
    visible — the number an ingest operator alarms on).  Emits doc counts,
    quality pass counts/rate, and PII hit counts per tumbling window.

    Scale shape: the quality/PII columns are the same narrow JVM
    expressions as the gate; the only state is the windowed aggregation,
    watermark-bounded (same pattern as the DAQ stats stream)."""
    m = with_pii_scrub(with_quality_metrics(docs))
    return (
        m.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("passes").cast("long")).alias("n_pass"),
            F.round(F.avg(F.col("passes").cast("double")), 4).alias("pass_rate"),
            F.sum(F.col("n_emails") + F.col("n_phones") + F.col("n_ips")).alias(
                "n_pii_hits"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "source",
            "n_docs",
            "n_pass",
            "pass_rate",
            "n_pii_hits",
        )
    )
