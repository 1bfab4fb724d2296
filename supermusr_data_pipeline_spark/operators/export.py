"""Training-shard export — the pipeline's terminal sink: write the curated
corpus as split-partitioned, size-bounded parquet shards a trainer's data
loader can consume directly.

Layout contract: ``split=train|val|test`` directories (hash splits from
q50/q70 — a reader prunes to its split via PartitionFilters, the q64
mechanism), shards bounded by ``max_records_per_file`` so no single file
outgrows a loader worker, and shard membership deterministic under retry
(the writer re-runs produce the same rows in the same split directories;
shard boundaries within a split are an execution detail, which is why the
loader contract is "read the directory", never "read shard 17").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_training_shards(
    curated: DataFrame,
    out_path: str,
    split_col: str = "split",
    max_records_per_file: int = 10_000,
) -> None:
    """Write ``curated`` (any frame carrying ``split_col``) as
    ``{out_path}/split=<v>/part-*.parquet`` shards.

    Scale shape: ``partitionBy`` routes rows during the write tasks (no
    pre-shuffle — each task writes into per-split files), and
    ``maxRecordsPerFile`` rolls files at the bound.  For few-huge-splits
    corpora add ``.repartition(split_col, ...)`` upstream to bound open
    files per task; at this engine's scale the default task-level routing
    is the cheaper plan."""
    (
        curated.write.option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(split_col)
        .mode("overwrite")
        .parquet(out_path)
    )
