"""Streaming MinHash-LSH near-duplicate detection — the streaming lift of
the batch q25 pipeline (the near-dup analog of ``doc_dedup``'s exact-dedup
lift, and the document-side cousin of the frame layer's J5/T6 duplicate
rejection, digitiser-aggregator/src/frame/cache.rs:71-74).

Recipe lockstep: signatures reuse the BATCH module's expressions verbatim
(token hashing, the 16-permutation MinHash family, 4×4 banding, Jaccard
≥ 0.5 verify — ``plans/text_dedup.py``), so batch and stream agree on what
"a near-duplicate" is by construction; ``near_dup_pairs_batch`` runs the
identical transformation on a static frame for parity testing.

Scale/state design:

- Signature computation is a NARROW per-row map (JVM higher-order
  functions, no Python, no shuffle) — stream-safe at any rate.
- Candidate matching is a watermarked stream-stream self-join on the band
  key with a time-range bound: the engine keeps only rows inside the
  event-time horizon in join state (RocksDB-backed on a real cluster) and
  evicts the rest — the bounded "recent signatures" window.
- A pair seen in several bands dedups via ``dropDuplicatesWithinWatermark``
  keyed by the pair ids, the same horizon trade as exact dedup: a
  near-duplicate arriving after its partner aged out of the window is
  re-emitted, and cross-window completeness is the batch job's (q25/q42)
  responsibility in the lambda split.
- The batch path's stop-bucket cap has no streaming equivalent here: bucket
  population inside one horizon is bounded by ingest rate × horizon, which
  is the knob an operator actually tunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.text_dedup import (
    _minhash_cols_spark,
    _N_BANDS,
    _ROWS_PER_BAND,
    _TOKENS_EXPR_SPARK,
    _TOKHASH_SPARK,
)

_JACCARD_THRESHOLD = 0.5


def banded_signatures(docs: DataFrame, ts_col: str = "ingest_ts") -> DataFrame:
    """Distinct-token hashes + MinHash signature + banded LSH keys, as a
    narrow map (one output row per (doc, band)).  Identical expressions to
    the batch q25 recipe."""
    th = F.expr(
        "transform(array_distinct({toks}), t -> {h})".format(
            toks=_TOKENS_EXPR_SPARK, h=_TOKHASH_SPARK.format(t="t")
        )
    )
    sigs = (
        docs.withColumn("th", th)
        .filter(F.size("th") > 0)
        .select("doc_id", ts_col, "th", *_minhash_cols_spark())
    )
    band_cols = []
    for bnd in range(_N_BANDS):
        parts = [
            F.col(f"mh{bnd * _ROWS_PER_BAND + r:02d}").cast("string")
            for r in range(_ROWS_PER_BAND)
        ]
        band_cols.append(
            F.struct(
                F.lit(bnd).alias("band_no"), F.md5(F.concat_ws(",", *parts)).alias("key")
            ).alias(f"b{bnd}")
        )
    return (
        sigs.select("doc_id", ts_col, "th", F.explode(F.array(*band_cols)).alias("bk"))
        .select(
            "doc_id",
            ts_col,
            "th",
            F.col("bk.band_no").alias("band_no"),
            F.col("bk.key").alias("key"),
        )
    )


def _candidate_pairs(docs: DataFrame, ts_col: str, horizon: str) -> DataFrame:
    """Band-key self-join + Jaccard verify — shared by stream and batch;
    may emit a pair once per colliding band (finishers dedup)."""
    banded = banded_signatures(docs, ts_col).withWatermark(ts_col, horizon)
    a = banded.alias("a")
    b = banded.alias("b")
    ats, bts = F.col(f"a.{ts_col}"), F.col(f"b.{ts_col}")
    joined = a.join(
        b,
        (F.col("a.band_no") == F.col("b.band_no"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        # time-range bound: lets the engine evict join state past the horizon
        & (bts >= ats - F.expr(f"INTERVAL {horizon}"))
        & (bts <= ats + F.expr(f"INTERVAL {horizon}")),
    )
    inter = F.size(F.array_intersect("a.th", "b.th"))
    union = F.size("a.th") + F.size("b.th") - inter
    jac = inter.cast("double") / union
    # pair event time = the earlier side's watermarked column, kept AS-IS:
    # redefining a watermark downstream of a stream-stream join is disallowed,
    # so the pair inherits a's watermark tag for the dedup state's eviction
    return joined.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        jac.alias("jaccard"),
        ats.alias("pair_ts"),
    ).filter(F.col("jaccard") >= _JACCARD_THRESHOLD)


def near_dup_pairs_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Near-duplicate pairs over a streaming documents source.

    ``docs`` needs (doc_id, text, ``ts_col``).  Returns (doc_a, doc_b,
    jaccard, pair_ts) for verified near-dups whose arrivals fall within
    ``horizon`` of each other; a pair is emitted once per horizon window no
    matter how many bands collide (``dropDuplicatesWithinWatermark`` keyed
    by the pair ids — bounded state under the same horizon, evicted by the
    watermark the pair inherits from the join's left side)."""
    return _candidate_pairs(docs, ts_col, horizon).dropDuplicatesWithinWatermark(
        ["doc_a", "doc_b"]
    )


def near_dup_pairs_batch(docs: DataFrame, ts_col: str = "ingest_ts") -> DataFrame:
    """The identical transformation on a static frame (watermarks are
    no-ops, the range join runs as a plain batch join, and the pair dedup
    is a plain dropDuplicates — the streaming-only variant is not allowed
    on batch frames) — the parity oracle for the stream."""
    return _candidate_pairs(docs, ts_col, horizon="10 minutes").dropDuplicates(
        ["doc_a", "doc_b"]
    )
