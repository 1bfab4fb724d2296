"""Minimal Kafka producer/consumer speaking the real wire protocol
(protocol.py; public spec https://kafka.apache.org/protocol), plus the
bridge that lands consumed records where Spark Structured Streaming can
micro-batch them.

The consumer is built from the SAME option dict the production
`kafka_source_options` builder emits for ``spark.readStream
.format("kafka")`` (`consumer_from_options`), so S1's configuration
surface — bootstrap servers, subscribe list, startingOffsets /
startingTimestamp, maxOffsetsPerTrigger backpressure — is exercised
against a live (in-process) broker rather than only constructed.
Reference parity: consumer factory common/src/lib.rs:72-94; the
producer's bounded buffer mirrors trace-to-events/src/main.rs:81-84
(1024-message cap, flush on overflow).

Spark bridge: `spool_to_parquet` drains polls into parquet files whose
schema mirrors the Kafka source's output columns (key, value, topic,
partition, offset, timestamp), and `read_kafka_spool_stream` reads that
spool as a file stream — each poll becomes one file, i.e. one
micro-batch ingestion unit, the file-source analog of
``maxOffsetsPerTrigger`` batching."""

from __future__ import annotations

import itertools
import os
import socket
import struct
import time
from dataclasses import dataclass

from . import protocol as P

_DEFAULT_MAX_PARTITION_BYTES = 1 << 20


@dataclass
class ConsumerRecord:
    topic: str
    partition: int
    offset: int
    timestamp: int  # ms
    key: bytes | None
    value: bytes | None


class _Conn:
    """One blocking connection: frame requests, match correlation ids."""

    def __init__(self, bootstrap: str, client_id: str) -> None:
        host, port = bootstrap.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)), timeout=30)
        self.client_id = client_id
        self._corr = itertools.count(1)

    def request(self, api_key: int, api_version: int, body: bytes) -> P.Cursor:
        corr = next(self._corr)
        self.sock.sendall(
            P.encode_request(api_key, api_version, corr, self.client_id, body)
        )
        (size,) = struct.unpack(">i", self._recv(4))
        payload = self._recv(size)
        cur = P.Cursor(payload)
        got = cur.i32()
        if got != corr:
            raise OSError(f"correlation mismatch: sent {corr}, got {got}")
        return cur

    def _recv(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("broker closed connection")
            buf += chunk
        return buf

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def metadata(self, topics: list[str]) -> dict[str, int]:
        """topic → partition count (touching a topic auto-creates it)."""
        cur = self.request(P.API_METADATA, 0, P.encode_metadata_request(topics))
        _brokers, tmeta = P.decode_metadata_response(cur)
        return {name: len(parts) for err, name, parts in tmeta if err == P.ERR_NONE}


class MiniProducer:
    """Buffered producer with the reference's bounded-buffer discipline:
    ``send`` enqueues, the buffer flushes itself at ``buffer_max``
    messages (trace-to-events/src/main.rs:81-84), and ``flush`` drains
    explicitly (the SIGINT drain path, T8)."""

    def __init__(
        self,
        bootstrap: str,
        compression: str = "none",
        buffer_max: int = 1024,
        client_id: str = "supermusr-producer",
    ) -> None:
        self._conn = _Conn(bootstrap, client_id)
        self.compression = compression
        self.buffer_max = buffer_max
        self._buf: list[tuple[str, int, int, bytes | None, bytes | None]] = []
        self._n_partitions: dict[str, int] = {}
        self.acked = 0

    def _partitions(self, topic: str) -> int:
        if topic not in self._n_partitions:
            self._n_partitions.update(self._conn.metadata([topic]))
        return self._n_partitions[topic]

    def send(
        self,
        topic: str,
        value: bytes | None,
        key: bytes | None = None,
        timestamp_ms: int | None = None,
        partition: int | None = None,
    ) -> None:
        if partition is None:
            partition = P.default_partition(key, self._partitions(topic))
        ts = int(time.time() * 1000) if timestamp_ms is None else timestamp_ms
        self._buf.append((topic, partition, ts, key, value))
        if len(self._buf) >= self.buffer_max:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        grouped: dict[tuple[str, int], list[tuple[int, bytes | None, bytes | None]]] = {}
        for topic, pid, ts, k, v in self._buf:
            grouped.setdefault((topic, pid), []).append((ts, k, v))
        self._buf = []
        by_topic: dict[str, list[tuple[int, bytes]]] = {}
        for (topic, pid), recs in grouped.items():
            mset = P.encode_message_set(recs, compression=self.compression)
            by_topic.setdefault(topic, []).append((pid, mset))
        body = P.encode_produce_request(-1, 30_000, sorted(by_topic.items()))
        cur = self._conn.request(P.API_PRODUCE, 2, body)
        topics, _throttle = P.decode_produce_response(cur)
        for topic, prs in topics:
            for pid, err, _base, _lat in prs:
                if err != P.ERR_NONE:
                    raise OSError(f"produce to {topic}/{pid} failed: error {err}")
        self.acked += sum(len(r) for r in grouped.values())

    def close(self) -> None:
        self.flush()
        self._conn.close()

    def __enter__(self) -> "MiniProducer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class MiniConsumer:
    """Manual-assignment consumer over every partition of the subscribed
    topics (the pipeline's consumers are single-group readers of whole
    topics — common/src/lib.rs:72-94; no group coordinator needed)."""

    def __init__(
        self,
        bootstrap: str,
        topics: list[str],
        starting_offsets: str = "earliest",
        starting_timestamp_ms: int | None = None,
        max_poll_records: int | None = None,
        client_id: str = "supermusr-consumer",
    ) -> None:
        self._conn = _Conn(bootstrap, client_id)
        self.max_poll_records = max_poll_records
        counts = self._conn.metadata(topics)
        self._positions: dict[tuple[str, int], int] = {}
        missing = [t for t in topics if t not in counts]
        if missing:
            raise ValueError(f"unknown topics: {missing}")
        if starting_timestamp_ms is not None:
            target = starting_timestamp_ms
        else:
            target = (
                P.EARLIEST_TIMESTAMP
                if starting_offsets == "earliest"
                else P.LATEST_TIMESTAMP
            )
        self._seek_all(
            [(t, list(range(counts[t]))) for t in topics], target
        )

    def _seek_all(self, assignment: list[tuple[str, list[int]]], target: int) -> None:
        body = P.encode_list_offsets_request(
            [(t, [(p, target) for p in pids]) for t, pids in assignment]
        )
        cur = self._conn.request(P.API_LIST_OFFSETS, 1, body)
        for topic, prs in P.decode_list_offsets_response(cur):
            for pid, err, _ts, off in prs:
                if err != P.ERR_NONE:
                    raise OSError(f"list_offsets {topic}/{pid}: error {err}")
                # timestamp lookup past the log end → -1: start at the end
                # (nothing at/after the target yet), matching the Kafka
                # source's startingTimestamp + failOnDataLoss=false posture
                self._positions[(topic, pid)] = off if off >= 0 else self._log_end(topic, pid)

    def _log_end(self, topic: str, pid: int) -> int:
        body = P.encode_list_offsets_request([(topic, [(pid, P.LATEST_TIMESTAMP)])])
        cur = self._conn.request(P.API_LIST_OFFSETS, 1, body)
        return P.decode_list_offsets_response(cur)[0][1][0][3]

    def seek_tail(self, n: int) -> None:
        """Position each partition ``n`` records before its log end — the
        kafka-tail diagnostic's read window (reference
        diagnostics/src/kafka_tail.rs:10-52).  With multiple partitions
        the aggregate window is up to n×partitions, like tailing each
        partition independently."""
        for (t, p) in list(self._positions):
            self._positions[(t, p)] = max(0, self._log_end(t, p) - n)

    def seek_to_timestamp(self, timestamp_ms: int) -> None:
        """O3 analog over the wire: the broker's time→offset bisect
        replaces the reference's manual binary_by_timestamp.rs search."""
        by_topic: dict[str, list[int]] = {}
        for t, p in self._positions:
            by_topic.setdefault(t, []).append(p)
        self._seek_all(sorted((t, sorted(ps)) for t, ps in by_topic.items()), timestamp_ms)

    def positions(self) -> dict[tuple[str, int], int]:
        return dict(self._positions)

    def poll(
        self,
        max_wait_ms: int = 500,
        min_bytes: int = 1,
        max_partition_bytes: int = _DEFAULT_MAX_PARTITION_BYTES,
    ) -> list[ConsumerRecord]:
        """One blocking fetch across the assignment; advances positions.
        ``max_poll_records`` (the maxOffsetsPerTrigger analog) bounds the
        batch — excess records stay on the broker for the next poll."""
        by_topic: dict[str, list[tuple[int, int, int]]] = {}
        for (t, p), off in sorted(self._positions.items()):
            by_topic.setdefault(t, []).append((p, off, max_partition_bytes))
        body = P.encode_fetch_request(max_wait_ms, min_bytes, sorted(by_topic.items()))
        cur = self._conn.request(P.API_FETCH, 2, body)
        _throttle, topics = P.decode_fetch_response(cur)
        out: list[ConsumerRecord] = []
        budget = self.max_poll_records
        for topic, prs in topics:
            for pid, err, _hw, mset in prs:
                if err != P.ERR_NONE:
                    raise OSError(f"fetch {topic}/{pid}: error {err}")
                for r in P.decode_message_set(mset or b""):
                    if r.offset < self._positions[(topic, pid)]:
                        continue  # duplicate below our position — drop
                    if budget is not None and budget <= 0:
                        break
                    out.append(
                        ConsumerRecord(topic, pid, r.offset, r.timestamp, r.key, r.value)
                    )
                    self._positions[(topic, pid)] = r.offset + 1
                    if budget is not None:
                        budget -= 1
        return out

    def close(self) -> None:
        self._conn.close()

    def __enter__(self) -> "MiniConsumer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def consumer_from_options(options: dict[str, str]) -> MiniConsumer:
    """Build a consumer from the EXACT dict `kafka_source_options`
    produces for ``spark.readStream.format("kafka")`` — the S1 closure:
    the same keys Spark's Kafka source would consume configure a live
    consumer here (unknown ``kafka.*`` passthrough keys are accepted and
    ignored, as the real source does for client configs)."""
    brokers = options["kafka.bootstrap.servers"]
    topics = options["subscribe"].split(",")
    ts = options.get("startingTimestamp")
    max_offsets = options.get("maxOffsetsPerTrigger")
    return MiniConsumer(
        brokers,
        topics,
        starting_offsets=options.get("startingOffsets", "latest"),
        starting_timestamp_ms=int(ts) if ts is not None else None,
        max_poll_records=int(max_offsets) if max_offsets is not None else None,
    )


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------

KAFKA_SPOOL_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp"
)


def spool_to_parquet(
    consumer: MiniConsumer,
    spool_dir: str,
    max_polls: int = 1_000_000,
    max_wait_ms: int = 200,
    stop_when_empty: bool = True,
) -> int:
    """Drain the consumer into ``spool_dir``: each non-empty poll becomes
    one parquet file of KAFKA_SPOOL_SCHEMA rows (the Kafka source's
    column shape), so a file stream over the spool sees one file per
    poll — micro-batch boundaries that mirror maxOffsetsPerTrigger
    batching.  Stops after ``max_polls`` or the first empty poll
    (drain-to-quiescence, T8).  Returns records spooled."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(spool_dir, exist_ok=True)
    seq = len([f for f in os.listdir(spool_dir) if f.endswith(".parquet")])
    total = 0
    for _ in range(max_polls):
        recs = consumer.poll(max_wait_ms=max_wait_ms)
        if not recs:
            if stop_when_empty:
                break
            continue
        table = pa.table(
            {
                "key": pa.array([r.key for r in recs], pa.binary()),
                "value": pa.array([r.value for r in recs], pa.binary()),
                "topic": pa.array([r.topic for r in recs], pa.string()),
                "partition": pa.array([r.partition for r in recs], pa.int32()),
                "offset": pa.array([r.offset for r in recs], pa.int64()),
                "timestamp": pa.array(
                    [r.timestamp * 1000 for r in recs], pa.timestamp("us")
                ),
            }
        )
        # write-then-rename so a concurrent file-stream lister never sees
        # a half-written parquet footer
        tmp = os.path.join(spool_dir, f"_spool-{seq:06d}.parquet.tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(spool_dir, f"spool-{seq:06d}.parquet"))
        seq += 1
        total += len(recs)
    return total


def read_kafka_spool_stream(spark, spool_dir: str, max_files_per_trigger: int | None = None):
    """File stream over a spool directory, one poll per file — the
    columns are exactly what ``spark.readStream.format("kafka")`` emits,
    so downstream operators are agnostic to which front door fed them."""
    reader = spark.readStream.schema(KAFKA_SPOOL_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(spool_dir)
