"""State-store scale knobs for the streaming operators.

The default HDFS-backed state store keeps every state row on the JVM heap —
at 100 TB (millions of in-flight dedup fingerprints, LSH pair keys, frame
buckets) it is the first thing to fall over.  RocksDB keeps state off-heap
with incremental checkpointing; these confs are what a production deploy of
frame assembly / doc dedup / near-dup dedup sets, and the bounded-state
tests run under them so the scale configuration is exercised in CI, not
just documented.

Apply at session build (`get_spark(extra_conf=rocksdb_state_conf())`) or on
an existing session before starting the query (`configure_rocksdb(spark)`);
the provider is picked up per-query at stream start.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_conf() -> dict[str, str]:
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        # changelog checkpointing ships deltas, not full snapshots, per batch
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # bound block-cache memory so state can't evict executor working set
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    }


def configure_rocksdb(spark: SparkSession) -> None:
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
