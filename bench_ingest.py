#!/usr/bin/env python
"""Streaming-ingest throughput soak: puts the two index-backed front
doors (streaming/shard_ingest.py, streaming/vector_ingest.py — "the
index IS the state") on the same measured footing as the frame pipeline
(VERDICT r6 #9).

Shape: the standing indexes are built from the sf corpus's BASE slice
(doc_id % 10 != 7, the q79/q82 split), and the DELTA slice arrives as a
paced stream of fixed-size batches.  Reported per door:

- offered docs (the whole delta slice), admitted / rejected counts;
- batch wall-times (p50) once the stream is warm;
- sustained throughput docs/s = delta docs / (last decision - first
  arrival) — the number to compare against an ingest SLA.

Standalone: `python bench_ingest.py` prints one JSON line; bench.py
embeds the same dict under its "streaming_ingest" key.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_INGEST_SF_DIR", "/root/testdata/sf0.01")
BATCH_DOCS = int(os.environ.get("SPARK_GRAFT_INGEST_BATCH", "100"))


def _wait_rows(spark, path: str, want: int, timeout_s: float = 300) -> None:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            if spark.read.parquet(path).count() >= want:
                return
        except Exception:
            pass
        time.sleep(0.25)
    raise TimeoutError(f"{path}: fewer than {want} decision rows after {timeout_s}s")


def _spool_batches(df, key_col: str, spool: str, batch_docs: int) -> int:
    """Write the delta slice as numbered single-file batches; returns the
    number of docs spooled.  maxFilesPerTrigger=1 then replays them as
    discrete micro-batches."""
    rows = df.collect()  # delta slice of a bench sf — bounded by design
    os.makedirs(spool, exist_ok=True)
    spark = df.sparkSession
    for bi in range(0, len(rows), batch_docs):
        chunk = rows[bi : bi + batch_docs]
        (
            spark.createDataFrame(chunk, df.schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(spool, f"b{bi // batch_docs:04d}"))
        )
    return len(rows)


def bench_shard_ingest(spark, base: str) -> dict:
    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.plans.incremental import (
        _DELTA_MOD,
        _DELTA_REM,
        write_lsh_index,
    )
    from supermusr_data_pipeline_spark.sources.testdata import load_table
    from supermusr_data_pipeline_spark.streaming.shard_ingest import (
        ingest_shard_stream,
    )

    idx = os.path.join(base, "lsh_idx")
    t0 = time.perf_counter()
    write_lsh_index(spark, SF_DIR, idx)
    build_s = time.perf_counter() - t0

    docs = load_table(spark, SF_DIR, "documents")
    delta = docs.filter(F.col("doc_id") % _DELTA_MOD == _DELTA_REM)
    spool = os.path.join(base, "shard_spool")
    n_docs = _spool_batches(delta, "doc_id", spool, BATCH_DOCS)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(spool, "*"))
    )
    dec = os.path.join(base, "shard_decisions")
    t1 = time.perf_counter()
    q = ingest_shard_stream(stream, idx, dec, os.path.join(base, "shard_ckpt"))
    _wait_rows(spark, dec, n_docs)
    elapsed = time.perf_counter() - t1
    q.stop()

    decisions = spark.read.parquet(dec)
    by_reason = {
        r["reason"]: r["n"]
        for r in decisions.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    return {
        "offered_docs": n_docs,
        "batch_docs": BATCH_DOCS,
        "index_build_s": round(build_s, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "by_reason": by_reason,
    }


def bench_vector_ingest(spark, base: str) -> dict:
    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.plans.text_dedup import _codebook
    from supermusr_data_pipeline_spark.sources.testdata import load_table
    from supermusr_data_pipeline_spark.streaming.vector_ingest import (
        assign_cells,
        ingest_vector_stream,
    )

    cents = _codebook(SF_DIR)[0]
    emb = load_table(spark, SF_DIR, "embeddings")
    base_vecs = emb.filter(F.col("vec_id") % 10 != 7).select(
        "vec_id", F.col("embedding")
    )
    delta = emb.filter(F.col("vec_id") % 10 == 7).select("vec_id", "embedding")

    idx = os.path.join(base, "ivf_idx")
    t0 = time.perf_counter()
    (
        assign_cells(base_vecs, cents)
        .repartition("cell")
        .write.partitionBy("cell")
        .parquet(idx)
    )
    build_s = time.perf_counter() - t0

    spool = os.path.join(base, "vec_spool")
    n_vecs = _spool_batches(delta, "vec_id", spool, BATCH_DOCS)
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(spool, "*"))
    )
    dec = os.path.join(base, "vec_decisions")
    t1 = time.perf_counter()
    q = ingest_vector_stream(
        stream, idx, dec, os.path.join(base, "vec_ckpt"), cents
    )
    _wait_rows(spark, dec, n_vecs)
    elapsed = time.perf_counter() - t1
    q.stop()

    decisions = spark.read.parquet(dec)
    by_reason = {
        r["reason"]: r["n"]
        for r in decisions.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    return {
        "offered_vecs": n_vecs,
        "batch_docs": BATCH_DOCS,
        "index_build_s": round(build_s, 3),
        "vecs_per_sec": round(n_vecs / elapsed, 1),
        "by_reason": by_reason,
    }


def run(spark) -> dict:
    base = tempfile.mkdtemp(prefix="supermusr_ingest_bench_")
    try:
        return {
            "sf_dir": SF_DIR,
            "shard_ingest": bench_shard_ingest(spark, base),
            "vector_ingest": bench_vector_ingest(spark, base),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-bench-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"metric": "streaming_ingest", **run(spark)}))
    spark.stop()


if __name__ == "__main__":
    main()
