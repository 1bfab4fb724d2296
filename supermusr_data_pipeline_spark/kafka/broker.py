"""A minimal single-node Kafka broker speaking the real wire protocol
over TCP (see protocol.py; public spec https://kafka.apache.org/protocol).

In-memory partition logs, one thread per connection, bound to
127.0.0.1 on an ephemeral port — just enough broker for the pipeline's
S1/S2 front/back doors to be exercised end-to-end inside this container
(reference consumer/producer factories: common/src/lib.rs:72-94,
trace-to-events/src/main.rs:366-431).

Behavior notes (all protocol-conformant choices):
- topics auto-create on first produce or metadata touch (like
  ``auto.create.topics.enable``), with ``default_partitions`` each;
- compressed produces (gzip) are decompressed on append and always
  served uncompressed — a broker-side down-conversion the protocol
  permits;
- Fetch honors ``max_bytes`` per partition but always returns at least
  one message when any is available (the protocol's no-starvation
  rule), and respects ``max_wait_ms``/``min_bytes`` long-polling;
- ListOffsets v1 implements -2 (earliest), -1 (log end) and
  timestamp lookup (first offset with timestamp >= target).
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
import time
from dataclasses import dataclass, field

from . import protocol as P


@dataclass
class _PartitionLog:
    # records[i] = (timestamp_ms, key, value); offset == index
    records: list[tuple[int, bytes | None, bytes | None]] = field(default_factory=list)
    lock: threading.Lock = field(default_factory=threading.Lock)

    def append_set(self, message_set: bytes) -> tuple[int, int]:
        """Validate + append a produced message set; returns
        (base_offset, error_code)."""
        try:
            recs = P.decode_message_set(message_set)
        except ValueError:
            return -1, P.ERR_CORRUPT_MESSAGE
        with self.lock:
            base = len(self.records)
            now = int(time.time() * 1000)
            for r in recs:
                ts = r.timestamp if r.timestamp >= 0 else now
                self.records.append((ts, r.key, r.value))
        return base, P.ERR_NONE

    def read(self, fetch_offset: int, max_bytes: int) -> tuple[bytes, int, int]:
        """Serve a fetch: returns (message_set, high_watermark, error)."""
        with self.lock:
            hw = len(self.records)
            if fetch_offset < 0 or fetch_offset > hw:
                return b"", hw, P.ERR_OFFSET_OUT_OF_RANGE
            out: list[bytes] = []
            size = 0
            for off in range(fetch_offset, hw):
                ts, k, v = self.records[off]
                entry = P.encode_message_set([(ts, k, v)], base_offset=off)
                if out and size + len(entry) > max_bytes:
                    break
                out.append(entry)
                size += len(entry)
                if size >= max_bytes:
                    break
            return b"".join(out), hw, P.ERR_NONE

    def lookup(self, timestamp: int) -> tuple[int, int]:
        """ListOffsets: returns (found_timestamp, offset); offset -1 when
        no message has timestamp >= target."""
        with self.lock:
            if timestamp == P.EARLIEST_TIMESTAMP:
                return (-1, 0)
            if timestamp == P.LATEST_TIMESTAMP:
                return (-1, len(self.records))
            for off, (ts, _k, _v) in enumerate(self.records):
                if ts >= timestamp:
                    return (ts, off)
            return (-1, -1)


class MiniBroker:
    """Context-manager broker: ``with MiniBroker() as b: ...`` or
    explicit start()/stop().  ``b.bootstrap`` is the
    ``host:port`` string the clients (and kafka_source_options) take."""

    def __init__(self, default_partitions: int = 1, host: str = "127.0.0.1") -> None:
        self.default_partitions = default_partitions
        self.host = host
        self.port: int | None = None
        self._topics: dict[str, list[_PartitionLog]] = {}
        self._topics_lock = threading.Lock()
        self._server: socketserver.ThreadingTCPServer | None = None
        self._thread: threading.Thread | None = None

    # -- log access ---------------------------------------------------------

    def _get_topic(self, name: str, create: bool = True) -> list[_PartitionLog] | None:
        with self._topics_lock:
            if name not in self._topics:
                if not create:
                    return None
                self._topics[name] = [
                    _PartitionLog() for _ in range(self.default_partitions)
                ]
            return self._topics[name]

    def create_topic(self, name: str, partitions: int) -> None:
        with self._topics_lock:
            if name not in self._topics:
                self._topics[name] = [_PartitionLog() for _ in range(partitions)]

    def topic_sizes(self) -> dict[str, list[int]]:
        with self._topics_lock:
            return {t: [len(p.records) for p in parts] for t, parts in self._topics.items()}

    # -- request dispatch ---------------------------------------------------

    def _handle(self, payload: bytes) -> bytes:
        cur = P.Cursor(payload)
        api_key, api_version, corr_id, _client = P.decode_request_header(cur)
        versions = {k: (lo, hi) for k, lo, hi in P.SUPPORTED_APIS}
        if api_key not in versions or not (
            versions[api_key][0] <= api_version <= versions[api_key][1]
        ):
            # ApiVersions carries the error in-band; others get an empty
            # error body of their shape — keep it simple and version-gate
            # via ApiVersions, which every client calls first
            return P.encode_response(
                corr_id, P.encode_api_versions_response(P.ERR_UNSUPPORTED_VERSION)
            )
        if api_key == P.API_VERSIONS:
            body = P.encode_api_versions_response()
        elif api_key == P.API_METADATA:
            body = self._metadata(cur)
        elif api_key == P.API_PRODUCE:
            body = self._produce(cur)
        elif api_key == P.API_FETCH:
            body = self._fetch(cur)
        else:  # API_LIST_OFFSETS
            body = self._list_offsets(cur)
        return P.encode_response(corr_id, body)

    def _metadata(self, cur: P.Cursor) -> bytes:
        names = P.decode_metadata_request(cur)
        if not names:
            with self._topics_lock:
                names = sorted(self._topics)
        topics = []
        for name in names:
            parts = self._get_topic(name)
            topics.append(
                (P.ERR_NONE, name, [(P.ERR_NONE, i, 0) for i in range(len(parts))])
            )
        return P.encode_metadata_response([(0, self.host, self.port)], topics)

    def _produce(self, cur: P.Cursor) -> bytes:
        _acks, _timeout, topic_data = P.decode_produce_request(cur)
        responses = []
        for topic, parts in topic_data:
            logs = self._get_topic(topic)
            prs = []
            for pid, mset in parts:
                if pid < 0 or pid >= len(logs):
                    prs.append((pid, P.ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, -1))
                    continue
                base, err = logs[pid].append_set(mset or b"")
                prs.append((pid, err, base, -1))
            responses.append((topic, prs))
        return P.encode_produce_response(responses)

    def _fetch(self, cur: P.Cursor) -> bytes:
        _replica, max_wait, min_bytes, topics = P.decode_fetch_request(cur)
        deadline = time.monotonic() + max_wait / 1000.0

        def serve():
            out, total = [], 0
            for topic, parts in topics:
                logs = self._get_topic(topic, create=False)
                prs = []
                for pid, off, max_bytes in parts:
                    if logs is None or pid < 0 or pid >= len(logs):
                        prs.append((pid, P.ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, b""))
                        continue
                    mset, hw, err = logs[pid].read(off, max_bytes)
                    total += len(mset)
                    prs.append((pid, err, hw, mset))
                out.append((topic, prs))
            return out, total

        out, total = serve()
        # long-poll: wait for min_bytes or the deadline (the consumer's
        # blocking-poll semantics the reference relies on)
        while total < min_bytes and time.monotonic() < deadline:
            time.sleep(0.005)
            out, total = serve()
        return P.encode_fetch_response(out)

    def _list_offsets(self, cur: P.Cursor) -> bytes:
        _replica, topics = P.decode_list_offsets_request(cur)
        out = []
        for topic, parts in topics:
            logs = self._get_topic(topic, create=False)
            prs = []
            for pid, ts in parts:
                if logs is None or pid < 0 or pid >= len(logs):
                    prs.append((pid, P.ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, -1))
                    continue
                found_ts, off = logs[pid].lookup(ts)
                prs.append((pid, P.ERR_NONE, found_ts, off))
            out.append((topic, prs))
        return P.encode_list_offsets_response(out)

    # -- TCP plumbing -------------------------------------------------------

    def start(self) -> "MiniBroker":
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:  # one connection, many requests
                sock = self.request
                try:
                    while True:
                        hdr = _recv_exact(sock, 4)
                        if hdr is None:
                            return
                        (size,) = struct.unpack(">i", hdr)
                        payload = _recv_exact(sock, size)
                        if payload is None:
                            return
                        sock.sendall(broker._handle(payload))
                except (ConnectionResetError, BrokenPipeError, OSError):
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((self.host, 0), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def __enter__(self) -> "MiniBroker":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf
