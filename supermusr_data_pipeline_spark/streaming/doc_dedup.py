"""Streaming exact deduplication for document ingest — the streaming lift
of the q22 fingerprint dedup (and the document-side analog of the frame
layer's J5/T6 duplicate rejection).

A pretraining-data ingest stream dedups as it lands: fingerprint each
document (whitespace-normalized md5, identical to the batch q22 recipe so
batch and stream agree on what "the same document" means), then keep the
first arrival per fingerprint with Spark's stateful ``dropDuplicates``.

Scale/state design: unbounded exact dedup state grows forever, so the
operator takes an event-time watermark horizon — state for fingerprints
older than the horizon is dropped by the engine (RocksDB-backed state
store on a real cluster).  A duplicate arriving AFTER its original has
aged out of the watermark window is re-emitted; that is the documented
trade (bounded state vs unbounded memory).  Cross-window exactness is the
batch job's (q22/q42) responsibility in the lambda-style split the
reference's own pipeline uses for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# content fingerprint — MUST stay in lockstep with the batch q22 recipe
# (plans/text_dedup.py: md5(lower(text))) so batch and stream dedup agree
_FINGERPRINT = "md5(lower(text))"


def fingerprint_documents(docs: DataFrame) -> DataFrame:
    """Add the content ``fingerprint`` column (JVM-side md5, no Python)."""
    return docs.withColumn("fingerprint", F.expr(_FINGERPRINT))


def dedup_documents_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins exact dedup over a streaming documents source.

    ``docs`` must carry an event-time column ``ts_col``; ``watermark``
    bounds both late-data acceptance and dedup-state retention.  Returns
    the input rows (plus ``fingerprint``) with duplicates removed.

    Eviction note: plain ``dropDuplicates(subset)`` only ages state out
    when the event-time column is PART of the subset — keyed by fingerprint
    alone its state grows forever despite the watermark.
    ``dropDuplicatesWithinWatermark`` is the operator built for exactly
    this shape: dedup on the key, evict state once the watermark passes the
    row's event time (asserted by the bounded-state test under RocksDB).
    """
    return (
        fingerprint_documents(docs)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
