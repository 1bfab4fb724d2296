"""S1/S2 closure: a minimal, from-spec Kafka wire-protocol broker and
client, so the pipeline's front/back doors can be exercised end-to-end
over REAL Kafka TCP traffic inside this container (no external broker,
no third-party client library).

The implementation follows the public Apache Kafka protocol guide
(https://kafka.apache.org/protocol) exclusively: message-format v1
(magic 1, CRC-32 integrity, millisecond timestamps), Produce v2,
Fetch v2, ListOffsets v1, Metadata v0, ApiVersions v0, the group
coordination set (FindCoordinator/JoinGroup/SyncGroup/Heartbeat/
LeaveGroup v0, generation-fenced OffsetCommit v2, OffsetFetch v1, and
the consumer protocol-type's embedded subscription/assignment schemas),
the default partitioner's murmur2 hash, and AUTHENTICATION:
SaslHandshake v1 + SaslAuthenticate v0 carrying SCRAM-SHA-256
(RFC 5802/7677 — the reference's mechanism, common/src/lib.rs:62-68)
or PLAIN (RFC 4616), over PLAINTEXT or TLS channels (SSL / SASL_SSL,
stdlib ssl with broker-generated self-signed certs).  REPLICATION:
``cluster.MiniCluster`` runs N broker nodes on distinct sockets with
pull-based follower fetch, ISR + high-watermark commit semantics,
acks=-1 waits, min.insync.replicas, and ISR-fenced leader failover;
producer/consumer route requests per partition leader with metadata
refresh on NOT_LEADER, and the Spark kafka-wire source fans its fetch
tasks out across brokers.  The broker is a single-node in-process
TCP server whose logs live in memory; the client is a blocking
socket producer/consumer pair that parses the SAME option dict the
production `kafka_source_options` builder emits, so the configuration
surface tested here is the one `spark.readStream.format("kafka")`
would receive against a real cluster.

Reference parity: consumer factory common/src/lib.rs:72-94, bounded
producer buffer trace-to-events/src/main.rs:81-84, drain-on-shutdown
digitiser-aggregator/src/main.rs:463-495.
"""

from .auth import ClientSecurity
from .broker import MiniBroker
from .cluster import ClusterBroker, MiniCluster
from .client import (
    GroupConsumer,
    MiniConsumer,
    MiniProducer,
    consumer_from_options,
    read_kafka_spool_stream,
    spool_to_parquet,
)
from .spark_source import KafkaWireDataSource

__all__ = [
    "ClientSecurity",
    "ClusterBroker",
    "GroupConsumer",
    "MiniCluster",
    "KafkaWireDataSource",
    "MiniBroker",
    "MiniConsumer",
    "MiniProducer",
    "consumer_from_options",
    "read_kafka_spool_stream",
    "spool_to_parquet",
]
