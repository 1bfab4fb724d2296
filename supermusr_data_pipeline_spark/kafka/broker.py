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
  timestamp lookup (first offset with timestamp >= target);
- SECURITY: ``security_protocol`` selects PLAINTEXT / SSL /
  SASL_PLAINTEXT / SASL_SSL.  SASL rides SaslHandshake v1 +
  SaslAuthenticate v0 with SCRAM-SHA-256 (RFC 5802/7677) or PLAIN
  (RFC 4616); credentials are stored salted (StoredKey/ServerKey),
  never as passwords.  Pre-auth connections are served only
  ApiVersions + the SASL APIs and are dropped on any other request or
  on a failed proof, like a real broker;
- the GROUP COORDINATOR (``_Group``): JoinGroup rebalance rounds with
  generation bump + leader election + common-protocol selection,
  SyncGroup assignment distribution, Heartbeat/LeaveGroup membership,
  lazy session-timeout eviction (every group API passes through
  ``_evict_expired``), and per-group committed offsets with
  generation-fenced OffsetCommit v2 / OffsetFetch v1.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
import time
import uuid
from dataclasses import dataclass, field

from . import auth as A
from . import protocol as P


@dataclass
class _PartitionLog:
    """Pre-encoded partition log: entry ``i``'s wire bytes live at
    ``buf[pos[i] : pos[i+1]]``, encoded ONCE at append time.  A fetch is
    then a bisect + ONE buffer slice — O(1) Python operations per
    request — instead of a per-record re-encode.  (The per-record
    encode capped a single connection at ~156 MB/s and made concurrent
    fetch tasks CONTEND on the broker process's interpreter lock, which
    is why the r10 partition sweep scaled inversely: 114 MB/s at 2
    partitions -> 59.5 at 16.  Real brokers do the same thing for the
    same reason — the log is stored in wire format and served
    zero-copy.)"""

    timestamps: list[int] = field(default_factory=list)
    buf: bytearray = field(default_factory=bytearray)
    pos: list[int] = field(default_factory=lambda: [0])
    lock: threading.Lock = field(default_factory=threading.Lock)

    def append_set(self, message_set: bytes) -> tuple[int, int]:
        """Validate + append a produced message set; returns
        (base_offset, error_code).  Gzip'd produces are decompressed
        here (broker-side down-conversion) so every stored entry is a
        plain v1 message served as-is."""
        try:
            recs = P.decode_message_set(message_set)
        except ValueError:
            return -1, P.ERR_CORRUPT_MESSAGE
        with self.lock:
            base = len(self.timestamps)
            now = int(time.time() * 1000)
            for i, r in enumerate(recs):
                ts = r.timestamp if r.timestamp >= 0 else now
                self.timestamps.append(ts)
                self.buf += P.encode_message_set(
                    [(ts, r.key, r.value)], base_offset=base + i
                )
                self.pos.append(len(self.buf))
        return base, P.ERR_NONE

    def read(
        self, fetch_offset: int, max_bytes: int, limit: int | None = None
    ) -> tuple[bytes, int, int]:
        """Serve a fetch: returns (message_set, served_up_to, error).
        Whole entries up to ``max_bytes``, always at least one when any
        is available (the protocol's no-starvation rule).  ``limit``
        caps the readable end below the log end — the replicated
        cluster's HIGH WATERMARK fence for consumer fetches (followers
        fetch with limit=None and read past the HW, per the protocol)."""
        import bisect

        with self.lock:
            hw = len(self.timestamps)
            if limit is not None:
                hw = min(hw, limit)
            if fetch_offset < 0 or fetch_offset > len(self.timestamps):
                return b"", hw, P.ERR_OFFSET_OUT_OF_RANGE
            if fetch_offset >= hw:
                return b"", hw, P.ERR_NONE
            lo = fetch_offset
            # largest hi with pos[hi] - pos[lo] <= max_bytes, floor lo+1
            hi = bisect.bisect_right(self.pos, self.pos[lo] + max_bytes) - 1
            hi = max(lo + 1, min(hi, hw))
            # ONE copy (memoryview slice -> bytes); the gather-write
            # response path sends this buffer to the socket as-is
            return (
                bytes(memoryview(self.buf)[self.pos[lo] : self.pos[hi]]),
                hw,
                P.ERR_NONE,
            )

    def truncate(self, to: int) -> None:
        """Drop every entry at offset >= ``to`` — the replication
        recovery rule: a replica rejoining after a crash (or finding its
        log ahead of a new leader's) truncates its uncommitted tail and
        re-fetches from the leader."""
        with self.lock:
            if to >= len(self.timestamps):
                return
            del self.timestamps[to:]
            del self.buf[self.pos[to]:]
            del self.pos[to + 1:]

    def lookup(self, timestamp: int) -> tuple[int, int]:
        """ListOffsets: returns (found_timestamp, offset); offset -1 when
        no message has timestamp >= target."""
        with self.lock:
            if timestamp == P.EARLIEST_TIMESTAMP:
                return (-1, 0)
            if timestamp == P.LATEST_TIMESTAMP:
                return (-1, len(self.timestamps))
            for off, ts in enumerate(self.timestamps):
                if ts >= timestamp:
                    return (ts, off)
            return (-1, -1)


@dataclass
class _Member:
    protocols: dict[str, bytes]  # protocol name -> subscription metadata
    session_timeout_ms: int
    last_seen: float
    assignment: bytes = b""


class _Group:
    """One consumer group's coordinator state (the group-membership FSM
    from the public protocol guide's group-management section): Empty ->
    PreparingRebalance (members rejoin) -> CompletingRebalance (leader
    computes assignments) -> Stable.  All transitions under one
    condition variable; JoinGroup/SyncGroup responses BLOCK on it, which
    is protocol behavior (the coordinator delays the join response until
    the rebalance completes) and is safe here because the TCP server is
    thread-per-connection."""

    def __init__(self) -> None:
        self.cond = threading.Condition()
        self.state = "Empty"
        self.generation = 0
        self.members: dict[str, _Member] = {}
        self.leader: str | None = None
        self.protocol: str | None = None
        self.protocol_type: str | None = None
        self.joined: set[str] = set()
        self.round = 0
        # committed offsets survive membership churn (and even Empty)
        self.offsets: dict[tuple[str, int], tuple[int, str | None]] = {}


class MiniBroker:
    """Context-manager broker: ``with MiniBroker() as b: ...`` or
    explicit start()/stop().  ``b.bootstrap`` is the
    ``host:port`` string the clients (and kafka_source_options) take."""

    def __init__(
        self,
        default_partitions: int = 1,
        host: str = "127.0.0.1",
        security_protocol: str = "PLAINTEXT",
        scram_users: dict[str, str] | None = None,
        plain_users: dict[str, str] | None = None,
        ssl_cert: tuple[str, str] | None = None,
    ) -> None:
        """``security_protocol``: PLAINTEXT (default), SSL, SASL_PLAINTEXT
        or SASL_SSL.  ``scram_users``/``plain_users`` map username ->
        password for the SCRAM-SHA-256 / PLAIN mechanisms (SCRAM
        passwords are converted to salted StoredKey/ServerKey
        credentials at construction — the broker never retains them).
        ``ssl_cert`` is a (cert_pem, key_pem) path pair; omitted under
        SSL/SASL_SSL, a self-signed pair is generated into a temp dir
        (``self.ssl_cert`` exposes it for the client's ca.location)."""
        self.default_partitions = default_partitions
        self.host = host
        self.port: int | None = None
        # data-arrival signal for blocked long-poll fetches: notified on
        # every append so a parked fetch wakes the instant bytes are
        # servable instead of on a 5 ms sleep tick (the tick added up to
        # half the fetch-loop door's poll cadence in commit latency).
        # The generation counter closes the notify-vs-recheck race.
        self._data_cond = threading.Condition()
        self._data_gen = 0
        self.security_protocol = security_protocol.upper()
        if self.security_protocol not in (
            "PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL",
        ):
            raise ValueError(f"unknown security protocol {security_protocol!r}")
        self._scram: dict[str, A.ScramCredential] = {
            u: A.make_scram_credential(p) for u, p in (scram_users or {}).items()
        }
        # one per-broker secret so unknown-user decoy credentials are
        # stable across connections (anti-enumeration) yet unpredictable
        import secrets as _secrets

        self._scram_decoy = _secrets.token_bytes(16)
        self._plain = dict(plain_users or {})
        self._mechanisms = [
            m
            for m, have in (
                (A.SCRAM_SHA_256, self._scram), (A.PLAIN, self._plain),
            )
            if have
        ]
        self._needs_sasl = self.security_protocol.startswith("SASL")
        if self._needs_sasl and not self._mechanisms:
            raise ValueError(
                "SASL protocol requires scram_users and/or plain_users"
            )
        self.ssl_cert: tuple[str, str] | None = None
        self._ssl_ctx = None
        if self.security_protocol in ("SSL", "SASL_SSL"):
            if ssl_cert is None:
                import tempfile

                self._ssl_dir = tempfile.TemporaryDirectory(prefix="minibroker-tls-")
                ssl_cert = A.generate_self_signed_cert(self._ssl_dir.name)
            self.ssl_cert = ssl_cert
            self._ssl_ctx = A.server_ssl_context(*ssl_cert)
        self._topics: dict[str, list[_PartitionLog]] = {}
        self._topics_lock = threading.Lock()
        self._groups: dict[str, _Group] = {}
        self._groups_lock = threading.Lock()
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
            return {
                t: [len(p.timestamps) for p in parts]
                for t, parts in self._topics.items()
            }

    # -- request dispatch ---------------------------------------------------

    def _handle(
        self, payload: bytes, conn: "_ConnState | None" = None
    ) -> bytes | list[bytes]:
        """Returns the framed response: bytes, or a list of buffers for
        a gather write (the fetch path — multi-MB message sets go to the
        socket without being re-joined into one buffer)."""
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
        if self._needs_sasl and (conn is None or not conn.authenticated):
            # pre-auth, only ApiVersions and the SASL APIs are served;
            # anything else disconnects (the real broker's behavior)
            if api_key not in (
                P.API_VERSIONS, P.API_SASL_HANDSHAKE, P.API_SASL_AUTHENTICATE,
            ):
                raise _CloseConnection(
                    f"api {api_key} before SASL authentication"
                )
        if api_key == P.API_VERSIONS:
            body = P.encode_api_versions_response()
        elif api_key == P.API_SASL_HANDSHAKE:
            body = self._sasl_handshake(cur, conn)
        elif api_key == P.API_SASL_AUTHENTICATE:
            body = self._sasl_authenticate(cur, conn)
        elif api_key == P.API_METADATA:
            body = self._metadata(cur)
        elif api_key == P.API_PRODUCE:
            body = self._produce(cur)
        elif api_key == P.API_FETCH:
            return self._fetch(cur, corr_id)
        elif api_key == P.API_LIST_OFFSETS:
            body = self._list_offsets(cur)
        elif api_key == P.API_FIND_COORDINATOR:
            body = self._find_coordinator(cur)
        elif api_key == P.API_JOIN_GROUP:
            body = self._join_group(cur, _client or "member")
        elif api_key == P.API_SYNC_GROUP:
            body = self._sync_group(cur)
        elif api_key == P.API_HEARTBEAT:
            body = self._heartbeat(cur)
        elif api_key == P.API_LEAVE_GROUP:
            body = self._leave_group(cur)
        elif api_key == P.API_OFFSET_COMMIT:
            body = self._offset_commit(cur)
        else:  # API_OFFSET_FETCH
            body = self._offset_fetch(cur)
        return P.encode_response(corr_id, body)

    # -- SASL (SaslHandshake v1 + SaslAuthenticate v0) ------------------------

    def _sasl_handshake(self, cur: P.Cursor, conn: "_ConnState | None") -> bytes:
        mechanism = P.decode_sasl_handshake_request(cur)
        if conn is None or not self._needs_sasl:
            return P.encode_sasl_handshake_response(
                P.ERR_ILLEGAL_SASL_STATE, self._mechanisms
            )
        if mechanism not in self._mechanisms:
            return P.encode_sasl_handshake_response(
                P.ERR_UNSUPPORTED_SASL_MECHANISM, self._mechanisms
            )
        conn.mechanism = mechanism
        conn.scram = (
            A.ScramServer(self._scram, decoy_secret=self._scram_decoy)
            if mechanism == A.SCRAM_SHA_256
            else None
        )
        return P.encode_sasl_handshake_response(P.ERR_NONE, self._mechanisms)

    def _sasl_authenticate(self, cur: P.Cursor, conn: "_ConnState | None") -> bytes:
        token = P.decode_sasl_authenticate_request(cur)
        if conn is None or conn.mechanism is None or conn.authenticated:
            return P.encode_sasl_authenticate_response(
                P.ERR_ILLEGAL_SASL_STATE, "handshake first", b""
            )
        try:
            if conn.mechanism == A.PLAIN:
                conn.principal = A.plain_check(token, self._plain)
                conn.authenticated = True
                return P.encode_sasl_authenticate_response(P.ERR_NONE, None, b"")
            # SCRAM: two SaslAuthenticate round trips
            if not conn.scram_started:
                conn.scram_started = True
                return P.encode_sasl_authenticate_response(
                    P.ERR_NONE, None, conn.scram.first(token)
                )
            out = conn.scram.final(token)
            conn.principal = conn.scram.username
            conn.authenticated = True
            return P.encode_sasl_authenticate_response(P.ERR_NONE, None, out)
        except A.AuthError as e:
            # fail loud in-band, then the handler drops the connection
            conn.failed = True
            return P.encode_sasl_authenticate_response(
                P.ERR_SASL_AUTHENTICATION_FAILED, str(e), b""
            )

    # -- group coordination ---------------------------------------------------

    def _get_group(self, group_id: str) -> _Group:
        with self._groups_lock:
            if group_id not in self._groups:
                self._groups[group_id] = _Group()
            return self._groups[group_id]

    @staticmethod
    def _evict_expired(g: _Group) -> None:
        """Drop members whose session timed out (call under g.cond) —
        the lazy form of the coordinator's session timer: every group
        API passes through here, so a dead member is discovered no later
        than the next group request."""
        now = time.monotonic()
        dead = [
            mid for mid, m in g.members.items()
            if (now - m.last_seen) * 1000.0 > m.session_timeout_ms
        ]
        if not dead:
            return
        for mid in dead:
            del g.members[mid]
            g.joined.discard(mid)
        if g.members:
            if g.state in ("Stable", "CompletingRebalance"):
                g.state = "PreparingRebalance"
                g.joined = set()
                g.round += 1
        else:
            g.state = "Empty"
        g.cond.notify_all()

    @staticmethod
    def _complete_join(g: _Group) -> None:
        """All (surviving) members rejoined: bump the generation, elect
        the leader, pick the common protocol (call under g.cond)."""
        g.generation += 1
        order = sorted(g.members)
        g.leader = order[0] if order else None
        common: list[str] = []
        if g.leader is not None:
            for name in g.members[g.leader].protocols:
                if all(name in m.protocols for m in g.members.values()):
                    common.append(name)
        g.protocol = common[0] if common else None
        g.state = "CompletingRebalance" if g.members else "Empty"

    def _join_group(self, cur: P.Cursor, client_id: str) -> bytes:
        group_id, session_timeout, member_id, ptype, protocols = (
            P.decode_join_group_request(cur)
        )
        g = self._get_group(group_id)
        with g.cond:
            self._evict_expired(g)
            if member_id:
                if member_id not in g.members:
                    return P.encode_join_group_response(
                        P.ERR_UNKNOWN_MEMBER_ID, -1, None, None, member_id, []
                    )
            else:
                member_id = f"{client_id}-{uuid.uuid4().hex[:12]}"
            if g.members and g.protocol_type and ptype != g.protocol_type:
                return P.encode_join_group_response(
                    P.ERR_INCONSISTENT_GROUP_PROTOCOL, -1, None, None,
                    member_id, [],
                )
            g.protocol_type = ptype
            g.members[member_id] = _Member(
                dict(protocols), session_timeout, time.monotonic()
            )
            if g.state != "PreparingRebalance":
                g.state = "PreparingRebalance"
                g.joined = set()
                g.round += 1
            my_round = g.round
            g.joined.add(member_id)
            g.cond.notify_all()
            deadline = time.monotonic() + session_timeout / 1000.0
            while g.state == "PreparingRebalance":
                if member_id not in g.members:
                    break  # evicted mid-wait (session expiry elsewhere)
                if g.round != my_round:
                    # a new round started mid-wait (LeaveGroup/eviction
                    # bumped it and cleared g.joined): this OUTSTANDING
                    # join participates in the new round — the real
                    # coordinator keeps a pending JoinGroup enrolled
                    # across rebalance restarts rather than failing it
                    my_round = g.round
                    g.joined.add(member_id)
                    deadline = time.monotonic() + session_timeout / 1000.0
                if set(g.members) <= g.joined:
                    self._complete_join(g)
                    g.cond.notify_all()
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    # stragglers missed the rebalance window: evict them
                    # and complete with whoever rejoined (protocol's
                    # rebalance-timeout behavior)
                    for mid in [m for m in g.members if m not in g.joined]:
                        del g.members[mid]
                    self._complete_join(g)
                    g.cond.notify_all()
                    break
                g.cond.wait(min(remaining, 0.05))
            if member_id not in g.members or g.protocol is None:
                err = (
                    P.ERR_UNKNOWN_MEMBER_ID
                    if member_id not in g.members
                    else P.ERR_INCONSISTENT_GROUP_PROTOCOL
                )
                return P.encode_join_group_response(
                    err, -1, None, None, member_id, []
                )
            g.members[member_id].last_seen = time.monotonic()
            members = []
            if member_id == g.leader:
                members = [
                    (mid, g.members[mid].protocols.get(g.protocol, b""))
                    for mid in sorted(g.members)
                ]
            return P.encode_join_group_response(
                P.ERR_NONE, g.generation, g.protocol, g.leader, member_id,
                members,
            )

    def _sync_group(self, cur: P.Cursor) -> bytes:
        group_id, gen, member_id, assignments = P.decode_sync_group_request(cur)
        g = self._get_group(group_id)
        with g.cond:
            self._evict_expired(g)
            if member_id not in g.members:
                return P.encode_sync_group_response(P.ERR_UNKNOWN_MEMBER_ID, b"")
            if gen != g.generation:
                return P.encode_sync_group_response(P.ERR_ILLEGAL_GENERATION, b"")
            if g.state == "PreparingRebalance":
                return P.encode_sync_group_response(
                    P.ERR_REBALANCE_IN_PROGRESS, b""
                )
            g.members[member_id].last_seen = time.monotonic()
            if member_id == g.leader and assignments:
                for mid, a in assignments:
                    if mid in g.members:
                        g.members[mid].assignment = a or b""
                g.state = "Stable"
                g.cond.notify_all()
            deadline = time.monotonic() + g.members[member_id].session_timeout_ms / 1000.0
            while g.state == "CompletingRebalance" and gen == g.generation:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or member_id not in g.members:
                    break
                g.cond.wait(min(remaining, 0.05))
            if gen != g.generation or g.state != "Stable":
                return P.encode_sync_group_response(
                    P.ERR_REBALANCE_IN_PROGRESS, b""
                )
            return P.encode_sync_group_response(
                P.ERR_NONE, g.members[member_id].assignment
            )

    def _heartbeat(self, cur: P.Cursor) -> bytes:
        group_id, gen, member_id = P.decode_heartbeat_request(cur)
        g = self._get_group(group_id)
        with g.cond:
            self._evict_expired(g)
            if member_id not in g.members:
                return P.encode_heartbeat_response(P.ERR_UNKNOWN_MEMBER_ID)
            g.members[member_id].last_seen = time.monotonic()
            if gen != g.generation:
                return P.encode_heartbeat_response(P.ERR_ILLEGAL_GENERATION)
            if g.state == "PreparingRebalance":
                return P.encode_heartbeat_response(P.ERR_REBALANCE_IN_PROGRESS)
            return P.encode_heartbeat_response(P.ERR_NONE)

    def _leave_group(self, cur: P.Cursor) -> bytes:
        group_id, member_id = P.decode_leave_group_request(cur)
        g = self._get_group(group_id)
        with g.cond:
            if member_id not in g.members:
                return P.encode_leave_group_response(P.ERR_UNKNOWN_MEMBER_ID)
            del g.members[member_id]
            g.joined.discard(member_id)
            if g.members:
                g.state = "PreparingRebalance"
                g.joined = set()
                g.round += 1
            else:
                g.state = "Empty"
            g.cond.notify_all()
            return P.encode_leave_group_response(P.ERR_NONE)

    def _offset_commit(self, cur: P.Cursor) -> bytes:
        group_id, gen, member_id, _retention, topics = (
            P.decode_offset_commit_request(cur)
        )
        g = self._get_group(group_id)
        with g.cond:
            self._evict_expired(g)
            err = P.ERR_NONE
            if gen != -1 or member_id:
                # group-managed commit: FENCED on membership + generation
                if member_id not in g.members:
                    err = P.ERR_UNKNOWN_MEMBER_ID
                elif gen != g.generation:
                    err = P.ERR_ILLEGAL_GENERATION
                elif g.state == "PreparingRebalance":
                    err = P.ERR_REBALANCE_IN_PROGRESS
                else:
                    g.members[member_id].last_seen = time.monotonic()
            out = []
            for topic, parts in topics:
                prs = []
                for pid, offset, metadata in parts:
                    if err == P.ERR_NONE:
                        g.offsets[(topic, pid)] = (offset, metadata)
                    prs.append((pid, err))
                out.append((topic, prs))
            return P.encode_offset_commit_response(out)

    def _offset_fetch(self, cur: P.Cursor) -> bytes:
        group_id, topics = P.decode_offset_fetch_request(cur)
        g = self._get_group(group_id)
        with g.cond:
            out = []
            for topic, pids in topics:
                prs = []
                for pid in pids:
                    off, md = g.offsets.get((topic, pid), (-1, None))
                    prs.append((pid, off, md, P.ERR_NONE))
                out.append((topic, prs))
            return P.encode_offset_fetch_response(out)

    def _find_coordinator(self, cur: P.Cursor) -> bytes:
        P.decode_find_coordinator_request(cur)
        # single-node: this broker coordinates every group
        return P.encode_find_coordinator_response(
            P.ERR_NONE, 0, self.host, self.port
        )

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

    def _notify_data(self) -> None:
        with self._data_cond:
            self._data_gen += 1
            self._data_cond.notify_all()

    def _produce(self, cur: P.Cursor) -> bytes:
        _acks, _timeout, topic_data = P.decode_produce_request(cur)
        responses = []
        appended = False
        for topic, parts in topic_data:
            logs = self._get_topic(topic)
            prs = []
            for pid, mset in parts:
                if pid < 0 or pid >= len(logs):
                    prs.append((pid, P.ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, -1))
                    continue
                base, err = logs[pid].append_set(mset or b"")
                appended = appended or err == P.ERR_NONE
                prs.append((pid, err, base, -1))
            responses.append((topic, prs))
        if appended:
            self._notify_data()
        return P.encode_produce_response(responses)

    def _fetch(self, cur: P.Cursor, corr_id: int) -> list[bytes]:
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

        gen = self._data_gen
        out, total = serve()
        # long-poll: wait for min_bytes or the deadline (the consumer's
        # blocking-poll semantics the reference relies on), waking on
        # append rather than a sleep tick
        while total < min_bytes and time.monotonic() < deadline:
            with self._data_cond:
                if self._data_gen == gen:
                    self._data_cond.wait(
                        min(0.05, max(0.0, deadline - time.monotonic()))
                    )
                gen = self._data_gen
            out, total = serve()
        return P.encode_fetch_response_parts(out, corr_id)

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
                sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                if broker._ssl_ctx is not None:
                    try:
                        sock = broker._ssl_ctx.wrap_socket(sock, server_side=True)
                    except (OSError, ValueError):
                        return  # failed TLS handshake: drop, like a real broker
                conn = _ConnState()
                try:
                    while True:
                        hdr = _recv_exact(sock, 4)
                        if hdr is None:
                            return
                        (size,) = struct.unpack(">i", hdr)
                        payload = _recv_exact(sock, size)
                        if payload is None:
                            return
                        try:
                            resp = broker._handle(payload, conn)
                        except _CloseConnection:
                            return
                        if isinstance(resp, list):
                            _send_buffers(sock, resp)  # gather write
                        else:
                            sock.sendall(resp)
                        if conn.failed:
                            return  # auth error was sent in-band; disconnect
                except (ConnectionResetError, BrokenPipeError, OSError):
                    return
                finally:
                    if broker._ssl_ctx is not None:
                        try:
                            sock.close()
                        except OSError:
                            pass

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


class _ConnState:
    """Per-connection SASL progress (one Handler thread each)."""

    __slots__ = (
        "authenticated", "mechanism", "scram", "scram_started",
        "principal", "failed",
    )

    def __init__(self) -> None:
        self.authenticated = False
        self.mechanism: str | None = None
        self.scram = None
        self.scram_started = False
        self.principal: str | None = None
        self.failed = False


class _CloseConnection(Exception):
    """Raised by _handle to make the Handler drop the connection (the
    broker's response to protocol-order violations, e.g. produce before
    SASL auth)."""


# Linux caps one sendmsg at IOV_MAX (1024) iovecs; beyond it the call
# raises EMSGSIZE rather than taking a prefix.  A fetch response for a
# very wide subscription (~2 buffers per partition) can exceed that.
_IOV_MAX = 1024


def _send_buffers(sock: socket.socket, parts: list[bytes]) -> None:
    """Write a gather-form response: sendmsg in a loop — like send(), it
    may accept only a prefix on a blocking socket, so resume past what
    was taken until the whole response is on the wire.  Each call sends
    at most _IOV_MAX buffers (EMSGSIZE above that, not a short write).
    TLS sockets expose no working sendmsg (ssl.SSLSocket's raises
    NotImplementedError — records are framed by the TLS layer itself);
    they take the buffers with sendall."""
    import ssl as _ssl

    if isinstance(sock, _ssl.SSLSocket):
        for p in parts:
            sock.sendall(p)
        return
    while parts:
        sent = sock.sendmsg(parts[: _IOV_MAX])
        skip = sent
        rest: list = []
        for i, p in enumerate(parts):
            if skip >= len(p):
                skip -= len(p)
                continue
            rest.append(memoryview(p)[skip:] if skip else p)
            rest.extend(parts[i + 1 :])
            break
        parts = rest


def _recv_exact(sock: socket.socket, n: int) -> bytearray | None:
    # recv_into a preallocated buffer — a multi-MB produce request in
    # kernel-sized chunks must not pay quadratic ``bytes +=`` re-copies.
    # Returned as the bytearray itself: a final bytes() would be one
    # more whole-payload memcpy, and every consumer (Cursor's
    # struct.unpack_from, np.frombuffer, gzip) takes any buffer
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:])
        if r == 0:
            return None
        got += r
    return buf
