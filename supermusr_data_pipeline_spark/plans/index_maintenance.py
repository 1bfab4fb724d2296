"""Compaction for the streaming-appended physical indexes.

The ingest front doors (streaming/shard_ingest.py, vector_ingest.py)
append one parquet file per micro-batch per partition directory — the
right write shape for a latency path, the wrong read shape after a few
thousand batches (every probe opens hundreds of small files and reads
hundreds of footers).  This module is the downstream maintenance pass
both docstrings promise: rewrite an index's data into one well-sized
file per partition directory (folding per-batch ``bid`` segments into
the reserved base segment) and atomically swap it in.  The front doors'
crash-retry idempotency lives in the segment layout itself (dynamic
partition overwrite of ``bid=<batch_id>``), so compaction has no
sidecar marker state to preserve — but it DOES retire old segment ids,
which is why it must run against a paused stream with no pre-compaction
batch retry in flight.

Swap protocol (per artifact directory): write the compacted copy to
``<dir>.compacting``, rename ``<dir>`` -> ``<dir>.old``, rename the
compacted copy into place, delete ``<dir>.old``.  Two renames — a
reader can race only into a clean miss-and-retry, and a crash at any
point leaves either the old or the new directory recoverable by name.
Run it from ONE maintenance process while the ingest stream is paused
(the front doors' appends target the directory by name; compacting
under a live appender would drop its in-flight batch on the swap —
same single-maintainer rule the reference's file lifecycle follows,
operators/nexus_sink.py).

Scale notes: compaction is one shuffle per artifact keyed by the
partition column (band_no / cell), writing ~one file per key — the
exact layout the builders (plans/incremental.write_lsh_index,
plans/ivf_index) produce, so a compacted index is indistinguishable
from a freshly built one.  Content equality is CI-pinned: admission
decisions against a compacted index must be byte-identical
(tests/test_index_maintenance.py).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _swap_in(new_dir: str, live_dir: str) -> None:
    old = live_dir + ".old-" + uuid.uuid4().hex[:8]
    os.rename(live_dir, old)
    os.rename(new_dir, live_dir)
    shutil.rmtree(old, ignore_errors=True)


def _count_files(d: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(d):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _compact_partitioned(
    spark: SparkSession,
    live_dir: str,
    key: str | None,
    files_per_key: int = 1,
    sort_cols: list | None = None,
    compression: str | None = None,
) -> dict:
    """Rewrite one artifact directory: repartition by ``key`` (None = a
    single unpartitioned directory) into ``files_per_key`` files per
    partition value — optionally sorted within files (row-group pruning)
    and re-compressed — then atomically swap.  Returns before/after file
    counts."""
    before = _count_files(live_dir)
    df = spark.read.parquet(live_dir)
    tmp = live_dir + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    if key is None:
        out = df.coalesce(files_per_key)
    else:
        out = df.repartition(
            files_per_key * max(1, df.select(key).distinct().count()), key
        )
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if key is not None:
        w = w.partitionBy(key)
    w.parquet(tmp)
    _swap_in(tmp, live_dir)
    return {"files_before": before, "files_after": _count_files(live_dir)}


def _compact_segmented(
    spark: SparkSession, live_dir: str, key: str, base_bid: int = -1
) -> dict:
    """Compact a segmented (``bid``-partitioned) artifact: fold every
    segment into the reserved base segment ``bid=<base_bid>`` with one
    file per bucket directory.  Pure concatenation — a row lives in
    exactly one segment, so values are untouched.  Run on a PAUSED
    stream: after compaction the ingest resumes with fresh batch ids and
    no pre-compaction batch retry may be in flight (the single-maintainer
    rule all the front doors document)."""
    before = _count_files(live_dir)
    df = spark.read.parquet(live_dir).drop("bid")
    tmp = live_dir + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        df.withColumn("bid", F.lit(int(base_bid)))
        .repartition(max(1, df.select(key).distinct().count()), key)
        .write.partitionBy(key, "bid")
        .mode("overwrite")
        .parquet(tmp)
    )
    _swap_in(tmp, live_dir)
    return {"files_before": before, "files_after": _count_files(live_dir)}


def compact_lsh_index(spark: SparkSession, index_path: str) -> dict:
    """Compact the q82/shard-ingest LSH index: every per-batch ``bid``
    segment folds into the bid=-1 base segment — ``bands/`` back to one
    file per band_no directory, ``tokens/`` to one file per tb bucket
    directory."""
    return {
        "bands": _compact_segmented(
            spark, os.path.join(index_path, "bands"), "band_no"
        ),
        "tokens": _compact_segmented(
            spark, os.path.join(index_path, "tokens"), "tb"
        ),
    }


def compact_nexus_run(
    spark: SparkSession, sink_path: str, run_dir_name: str
) -> dict:
    """Compact ONE run's partition directory of the streaming NeXus sink
    (streaming/nexus_stream.py writes one snappy file per micro-batch on
    the latency path — this is the promised downstream pass): a single
    zstd file per run, rows sorted by (frame_seq, event_index) so any
    frame- or time-range read prunes row groups on the parquet footers.
    Run it on COMPLETED runs (the retire/flush lifecycle's precondition,
    operators/nexus_sink.py) — never under the live appender."""
    run_dir = os.path.join(sink_path, run_dir_name)
    return _compact_partitioned(
        spark,
        run_dir,
        None,
        sort_cols=["frame_seq", "event_index", "event_id", "event_time_offset"],
        compression="zstd",
    )


def compact_postings_index(spark: SparkSession, index_path: str) -> dict:
    """Merge the streaming lexical index's per-batch SEGMENTS
    (streaming/postings_ingest.py) into one base segment per artifact:
    postings rows re-land under ``batch=-1/tb=*`` (one file per term
    bucket), doclen under ``batch=-1/db=*``, and the stats ledger folds
    to a single delta row.  Pure concatenation — a document lives in
    exactly one segment, so no aggregation is involved and probes are
    value-identical.  Run on a PAUSED stream (single-maintainer rule):
    after compaction the ingest resumes with fresh batch ids; a
    crash-retry of a pre-compaction batch must not be in flight."""
    out = {}
    for sub, key in (("postings", "tb"), ("doclen", "db")):
        live = os.path.join(index_path, sub)
        before = _count_files(live)
        df = spark.read.parquet(live).drop("batch")
        tmp = live + ".compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            df.withColumn("batch", F.lit(-1))
            .repartition(max(1, df.select(key).distinct().count()), key)
            .write.partitionBy("batch", key)
            .mode("overwrite")
            .parquet(tmp)
        )
        _swap_in(tmp, live)
        out[sub] = {"files_before": before, "files_after": _count_files(live)}
    stats_live = os.path.join(index_path, "stats")
    before = _count_files(stats_live)
    folded = (
        spark.read.parquet(stats_live)
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl"))
        .withColumn("batch", F.lit(-1))
        .coalesce(1)
    )
    tmp = stats_live + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.write.partitionBy("batch").mode("overwrite").parquet(tmp)
    _swap_in(tmp, stats_live)
    out["stats"] = {"files_before": before, "files_after": _count_files(stats_live)}
    return out


def compact_vector_index(spark: SparkSession, index_path: str) -> dict:
    """Compact the cell-partitioned IVF vector index (vector_ingest's
    standing state): every per-batch ``bid`` segment folds into the
    bid=-1 base segment, one file per cell directory.  The front door
    keeps no marker files — segment overwrite is its idempotency — so
    there is no sidecar state to carry across the swap."""
    return {"index": _compact_segmented(spark, index_path, "cell")}
