"""Bucketed-table layout for exchange-free co-located joins.

The reference's correlation workloads (J3: trace↔event matching on the
composite (digitiser, timestamp) key, trace-viewer/src/finder/task/
binary_by_timestamp.rs:96-135) join two FACT-sized tables.  In-memory the
engine pays one hash exchange per side; at 100 TB the right answer is to
pay that shuffle ONCE at write time: store both tables bucketed (and
sorted) by the join key, and every subsequent join plans as a sort-merge
over co-located buckets with ZERO Exchange nodes — the Spark analog of
the reference keeping both finder indexes sharded the same way.

Bucket-key choice: bucket by the FULL join key — by default Spark only
treats two tables as co-partitioned when the bucket keys equal the join
keys (spark.sql.requireAllClusterKeysForCoPartition), so a subset-key
layout would silently re-shuffle.  Bucket count
is a layout constant both writers must share — at 100 TB pick it from
target bucket file size (~128-512 MB), not executor count.

Pinned by tests/test_bucketed_layout.py: the q17-shaped join over two
bucketed sides contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Write ``df`` as a parquet table bucketed AND sorted by
    ``bucket_keys``.  ``path`` makes it an external table (tests use a tmp
    dir); omitting it writes under the warehouse dir."""
    w = (
        df.write.format("parquet")
        .bucketBy(n_buckets, *bucket_keys)
        .sortBy(*bucket_keys)
        .mode("overwrite")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
