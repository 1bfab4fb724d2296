"""Kafka wire-protocol primitives, from the public protocol guide
(https://kafka.apache.org/protocol).  Everything is big-endian.

Scope (deliberately the smallest set that lets a producer, a consumer,
and a broker interoperate over real TCP):

- primitives: INT8/16/32/64, STRING (int16-length), BYTES (int32-length),
  ARRAY (int32-count);
- message-format v1 (magic 1): each log entry is
  ``offset int64 | size int32 | crc int32 | magic int8 | attributes int8 |
  timestamp int64 | key BYTES | value BYTES`` with the CRC-32 computed
  over everything after the crc field; gzip compression (attributes
  codec 1) wraps an inner message set in a single outer message;
- request header v1 (api_key, api_version, correlation_id, client_id)
  and response header v0 (correlation_id);
- APIs: Produce v2, Fetch v2, ListOffsets v1, Metadata v0,
  ApiVersions v0 — the minimum for produce / consume / seek-by-time /
  topology discovery — plus the group-coordination set:
  FindCoordinator v0, JoinGroup v0, SyncGroup v0, Heartbeat v0,
  LeaveGroup v0, OffsetCommit v2 (generation-fenced), OffsetFetch v1,
  and the consumer protocol-type's embedded subscription/assignment
  schemas (ConsumerProtocolSubscription/Assignment v0);
- the default partitioner's murmur2 (seed 0x9747b28c), so keyed
  messages land on the same partition a stock Kafka client would pick.

Error codes used: 0 NONE, 1 OFFSET_OUT_OF_RANGE, 2 CORRUPT_MESSAGE,
3 UNKNOWN_TOPIC_OR_PARTITION, 22 ILLEGAL_GENERATION,
23 INCONSISTENT_GROUP_PROTOCOL, 25 UNKNOWN_MEMBER_ID,
27 REBALANCE_IN_PROGRESS, 35 UNSUPPORTED_VERSION.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from dataclasses import dataclass

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_OFFSET_COMMIT = 8
API_OFFSET_FETCH = 9
API_FIND_COORDINATOR = 10
API_JOIN_GROUP = 11
API_HEARTBEAT = 12
API_LEAVE_GROUP = 13
API_SYNC_GROUP = 14
API_SASL_HANDSHAKE = 17
API_VERSIONS = 18
API_SASL_AUTHENTICATE = 36

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_CORRUPT_MESSAGE = 2
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_LEADER_NOT_AVAILABLE = 5
ERR_NOT_LEADER_FOR_PARTITION = 6
ERR_REQUEST_TIMED_OUT = 7
ERR_NOT_ENOUGH_REPLICAS = 19
ERR_ILLEGAL_GENERATION = 22
ERR_INCONSISTENT_GROUP_PROTOCOL = 23
ERR_UNKNOWN_MEMBER_ID = 25
ERR_REBALANCE_IN_PROGRESS = 27
ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_ILLEGAL_SASL_STATE = 34
ERR_UNSUPPORTED_VERSION = 35
ERR_SASL_AUTHENTICATION_FAILED = 58

# (api_key, min_version, max_version) advertised by ApiVersions
SUPPORTED_APIS = [
    (API_PRODUCE, 2, 2),
    (API_FETCH, 2, 2),
    (API_LIST_OFFSETS, 1, 1),
    (API_METADATA, 0, 0),
    (API_OFFSET_COMMIT, 2, 2),
    (API_OFFSET_FETCH, 1, 1),
    (API_FIND_COORDINATOR, 0, 0),
    (API_JOIN_GROUP, 0, 0),
    (API_HEARTBEAT, 0, 0),
    (API_LEAVE_GROUP, 0, 0),
    (API_SYNC_GROUP, 0, 0),
    (API_SASL_HANDSHAKE, 1, 1),
    (API_VERSIONS, 0, 0),
    (API_SASL_AUTHENTICATE, 0, 0),
]

EARLIEST_TIMESTAMP = -2
LATEST_TIMESTAMP = -1


# ---------------------------------------------------------------------------
# primitive encode/decode
# ---------------------------------------------------------------------------


class Cursor:
    """Sequential reader over a bytes buffer."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("short buffer")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n == -1 else self._take(n).decode("utf-8")

    def bytes_(self) -> bytes | None:
        n = self.i32()
        return None if n == -1 else self._take(n)

    def array(self, elem):
        return [elem(self) for _ in range(self.i32())]

    def remaining(self) -> int:
        return len(self.buf) - self.pos


def e_i8(v: int) -> bytes:
    return struct.pack(">b", v)


def e_i16(v: int) -> bytes:
    return struct.pack(">h", v)


def e_i32(v: int) -> bytes:
    return struct.pack(">i", v)


def e_i64(v: int) -> bytes:
    return struct.pack(">q", v)


def e_string(s: str | None) -> bytes:
    if s is None:
        return e_i16(-1)
    b = s.encode("utf-8")
    return e_i16(len(b)) + b


def e_bytes(b: bytes | None) -> bytes:
    if b is None:
        return e_i32(-1)
    return e_i32(len(b)) + b


def e_array(items, elem) -> bytes:
    return e_i32(len(items)) + b"".join(elem(x) for x in items)


# ---------------------------------------------------------------------------
# murmur2 — the default partitioner hash (public Kafka algorithm)
# ---------------------------------------------------------------------------


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (seed 0x9747b28c), as specified for the default
    partitioner: partition = (murmur2(key) & 0x7fffffff) % n."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    mask = 0xFFFFFFFF
    h = (seed ^ length) & mask
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = (h * m) & mask
        h ^= k
    rest = length & 3
    if rest == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rest >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rest >= 1:
        h ^= data[n4] & 0xFF
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    return h


def default_partition(key: bytes | None, n_partitions: int, fallback: int = 0) -> int:
    if key is None:
        return fallback % n_partitions
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


# ---------------------------------------------------------------------------
# message-format v1 (magic 1)
# ---------------------------------------------------------------------------


@dataclass
class Record:
    offset: int
    timestamp: int  # ms since epoch, -1 if unset
    key: bytes | None
    value: bytes | None


_COMPRESSION_MASK = 0x07
_CODEC_NONE = 0
_CODEC_GZIP = 1


def _encode_message(
    timestamp: int, key: bytes | None, value: bytes | None, attributes: int = 0
) -> bytes:
    body = (
        e_i8(1)  # magic
        + e_i8(attributes)
        + e_i64(timestamp)
        + e_bytes(key)
        + e_bytes(value)
    )
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", crc) + body


def encode_message_set(
    records: list[tuple[int, bytes | None, bytes | None]],
    base_offset: int = 0,
    compression: str = "none",
) -> bytes:
    """records = [(timestamp_ms, key, value)] → a v1 message set.  With
    gzip, the whole set nests inside one wrapper message whose offset is
    the LAST inner relative offset and whose timestamp is the max inner
    timestamp, per the v1 compressed-set rules."""
    if compression == "none":
        out = []
        for i, (ts, k, v) in enumerate(records):
            msg = _encode_message(ts, k, v)
            out.append(e_i64(base_offset + i) + e_i32(len(msg)) + msg)
        return b"".join(out)
    if compression != "gzip":
        raise ValueError(f"unsupported compression {compression!r}")
    inner = []
    max_ts = -1
    for i, (ts, k, v) in enumerate(records):
        max_ts = max(max_ts, ts)
        msg = _encode_message(ts, k, v)
        inner.append(e_i64(i) + e_i32(len(msg)) + msg)  # relative offsets
    # level 1: transport compression favors speed (noisy DAQ payloads
    # barely compress; level 9 is ~20x slower for ~2% smaller here)
    payload = gzip.compress(b"".join(inner), compresslevel=1)
    wrapper = _encode_message(max_ts, None, payload, attributes=_CODEC_GZIP)
    # wrapper offset = absolute offset of the LAST inner record (v1 rule);
    # inner offsets are 0-based relative
    return e_i64(base_offset + len(records) - 1) + e_i32(len(wrapper)) + wrapper


def decode_message_set(buf: bytes, *, verify_crc: bool = True) -> list[Record]:
    """Parse a v1 message set, unwrapping gzip wrappers.  A trailing
    partial entry (the fetch max_bytes truncation the protocol allows)
    is silently dropped.  Raises ValueError on CRC mismatch."""
    out: list[Record] = []
    cur = Cursor(buf)
    while cur.remaining() >= 12:
        offset = cur.i64()
        size = cur.i32()
        if cur.remaining() < size:
            break  # partial trailing message — protocol-legal truncation
        msg = Cursor(cur._take(size))
        crc = struct.unpack(">I", msg._take(4))[0]
        body_start = msg.pos
        magic = msg.i8()
        attributes = msg.i8()
        if magic != 1:
            raise ValueError(f"unsupported magic {magic}")
        if verify_crc and (zlib.crc32(msg.buf[body_start:]) & 0xFFFFFFFF) != crc:
            raise ValueError("CRC mismatch")
        timestamp = msg.i64()
        key = msg.bytes_()
        value = msg.bytes_()
        codec = attributes & _COMPRESSION_MASK
        if codec == _CODEC_NONE:
            out.append(Record(offset, timestamp, key, value))
        elif codec == _CODEC_GZIP:
            inner = decode_message_set(gzip.decompress(value), verify_crc=verify_crc)
            # wrapper offset = last inner RELATIVE offset's absolute value
            base = offset - (inner[-1].offset if inner else 0)
            for r in inner:
                out.append(Record(base + r.offset, r.timestamp, r.key, r.value))
        else:
            raise ValueError(f"unsupported compression codec {codec}")
    return out


def message_set_last_offset(buf: bytes) -> int | None:
    """Size-walk a message set and return the LAST complete entry's
    offset field (None when empty).  For a gzip wrapper this is the v1
    rule's absolute offset of the last INNER record, so ``last + 1`` is
    the correct next fetch position either way.  Used by the pipelined
    fetch path to put the next request on the wire BEFORE paying the
    full columnar decode of the current response."""
    pos, L, last = 0, len(buf), None
    while L - pos >= 12:
        offset, size = struct.unpack_from(">qi", buf, pos)
        if L - pos - 12 < size:
            break  # partial trailing message — protocol-legal truncation
        last = offset
        pos += 12 + size
    return last


def message_set_prefix_len(buf: bytes, end_offset: int) -> int:
    """Byte length of the prefix holding every record with offset <
    ``end_offset`` — so a planned-range consumer can clamp the columnar
    decode to what the range actually needs instead of decoding a whole
    16 MiB response whose tail belongs to the NEXT trigger.  The entry
    whose offset field first reaches ``end_offset`` is INCLUDED: a v1
    gzip wrapper's offset is its LAST inner record's, so that boundary
    entry may still straddle ``end_offset`` with earlier inner records
    the range needs (the caller's offset filter drops the overshoot);
    every later entry's records all sit at or past it."""
    pos, L = 0, len(buf)
    while L - pos >= 12:
        offset, size = struct.unpack_from(">qi", buf, pos)
        if L - pos - 12 < size:
            break  # partial trailing message — protocol-legal truncation
        pos += 12 + size
        if offset >= end_offset:
            break
    return pos


def _binary_column(u8, starts, lens):
    """Build one Arrow binary array by direct buffer assembly: int32
    offsets via cumsum + one numpy slice-copy per element (C memcpy) —
    no per-element Python bytes objects.  ``lens`` uses -1 for null."""
    import numpy as np
    import pyarrow as pa

    n = len(starts)
    clipped = np.maximum(lens, 0)
    total = int(clipped.sum(dtype=np.int64))
    if total > np.iinfo(np.int32).max:
        # Arrow binary offsets are int32: a (decompressed) fetch response
        # whose key/value bytes exceed 2 GiB would silently wrap cumsum —
        # fail loud instead (decode_message_set handles any size; callers
        # should fetch smaller ranges)
        raise ValueError(
            f"message-set key/value bytes ({total}) exceed the 2 GiB "
            "Arrow binary-offset limit; fetch a smaller range"
        )
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(clipped, out=offs[1:])
    if n and total < n * 256:
        # many small elements: one fully-vectorized gather (output
        # position p of element i reads source starts[i] - offs[i] + p)
        src = np.repeat(
            starts.astype(np.int64) - offs[:-1], clipped
        ) + np.arange(total, dtype=np.int64)
        values = u8[src]
    else:
        # few large elements: one C memcpy per element
        values = np.empty(total, dtype=np.uint8)
        s_l, o_l, c_l = starts.tolist(), offs.tolist(), clipped.tolist()
        for i in range(n):
            ln = c_l[i]
            if ln:
                lo, s = o_l[i], s_l[i]
                values[lo : lo + ln] = u8[s : s + ln]
    if (lens < 0).any():
        validity = pa.py_buffer(
            np.packbits(lens >= 0, bitorder="little").tobytes()
        )
        nulls = int((lens < 0).sum())
    else:
        validity = None
        nulls = 0
    return pa.Array.from_buffers(
        pa.binary(), n,
        [validity, pa.py_buffer(offs), pa.py_buffer(values)],
        null_count=nulls,
    )


def _gather_be(u8, starts, width, dtype):
    """Vectorized big-endian field gather: one (n, width) fancy-index
    over the raw buffer, reinterpreted as the big-endian dtype."""
    import numpy as np

    idx = starts[:, None] + np.arange(width)
    return u8[idx].copy().view(dtype).ravel()


def decode_message_set_columns(buf: bytes, *, verify_crc: bool = True):
    """Vectorized v1 message-set parse for the Spark source's fetch path:
    returns ``(offsets, timestamps_ms, keys, values)`` with the integer
    columns as numpy int64 arrays and key/value as Arrow binary arrays
    assembled straight from the fetched byte range — the only per-record
    Python is a size-walk (2 struct reads each) and, when ``verify_crc``,
    one C-level crc32 call.  Row-identical to ``decode_message_set``
    (same truncation, CRC, and gzip-unwrap semantics; gzip wrappers
    decompress then vector-parse their inner set with offset rebase)."""
    import numpy as np
    import pyarrow as pa

    # size-walk: find entry starts (variable-length records — the only
    # sequential dependency in the format)
    starts: list[int] = []
    pos, L = 0, len(buf)
    while L - pos >= 12:
        (size,) = struct.unpack_from(">i", buf, pos + 8)
        if L - pos - 12 < size:
            break  # partial trailing message — protocol-legal truncation
        starts.append(pos)
        pos += 12 + size
    empty = (
        np.empty(0, np.int64), np.empty(0, np.int64),
        pa.array([], pa.binary()), pa.array([], pa.binary()),
    )
    if not starts:
        return empty
    st = np.asarray(starts, dtype=np.int64)
    u8 = np.frombuffer(buf, dtype=np.uint8)

    # fixed-offset header fields, gathered batch-wise
    offsets = _gather_be(u8, st, 8, ">i8").astype(np.int64)
    sizes = _gather_be(u8, st + 8, 4, ">i4").astype(np.int64)
    magic = u8[st + 16]
    attrs = u8[st + 17]
    if (magic != 1).any():
        raise ValueError(
            f"unsupported magic {int(magic[(magic != 1).argmax()])}"
        )
    if verify_crc:
        # plain-int zip + one C crc32 call per record (numpy-scalar
        # iteration costs ~3x more than the checksum itself here)
        crcs = _gather_be(u8, st + 12, 4, ">u4").tolist()
        mv = memoryview(buf)
        crc32 = zlib.crc32
        for s, e, c in zip(
            (st + 16).tolist(), (st + 12 + sizes).tolist(), crcs
        ):
            if crc32(mv[s:e]) != c:
                raise ValueError("CRC mismatch")

    codecs = attrs & _COMPRESSION_MASK
    if codecs.any():
        # wrappers present: unwrap each entry scalar-side (decompress is
        # the cost, not the parse), vector-parse inner sets, concatenate
        if ((codecs != _CODEC_NONE) & (codecs != _CODEC_GZIP)).any():
            bad = codecs[(codecs != _CODEC_NONE) & (codecs != _CODEC_GZIP)][0]
            raise ValueError(f"unsupported compression codec {int(bad)}")
        chunks = []
        for i in range(len(st)):
            s, e = int(st[i]) + 12, int(st[i]) + 12 + int(sizes[i])
            if codecs[i] == _CODEC_NONE:
                chunks.append(
                    decode_message_set_columns(
                        buf[int(st[i]) : e], verify_crc=False
                    )
                )
            else:
                msg = Cursor(buf[s:e])
                msg._take(4)  # crc (verified above)
                msg.i8(), msg.i8()  # magic, attributes
                msg.i64()  # wrapper timestamp
                msg.bytes_()  # wrapper key (null)
                inner = decode_message_set_columns(
                    gzip.decompress(msg.bytes_() or b""), verify_crc=verify_crc
                )
                base = offsets[i] - (inner[0][-1] if len(inner[0]) else 0)
                chunks.append((inner[0] + base, *inner[1:]))
        return (
            np.concatenate([c[0] for c in chunks]),
            np.concatenate([c[1] for c in chunks]),
            pa.concat_arrays([c[2] for c in chunks]),
            pa.concat_arrays([c[3] for c in chunks]),
        )

    timestamps = _gather_be(u8, st + 18, 8, ">i8").astype(np.int64)
    key_len = _gather_be(u8, st + 26, 4, ">i4").astype(np.int64)
    key_start = st + 30
    val_len_pos = key_start + np.maximum(key_len, 0)
    val_len = _gather_be(u8, val_len_pos, 4, ">i4").astype(np.int64)
    val_start = val_len_pos + 4
    if ((val_start + np.maximum(val_len, 0)) != (st + 12 + sizes)).any():
        raise ValueError("message size does not match key/value lengths")
    keys = _binary_column(u8, key_start, key_len)
    values = _binary_column(u8, val_start, val_len)
    return offsets, timestamps, keys, values


# ---------------------------------------------------------------------------
# request/response framing
# ---------------------------------------------------------------------------


def encode_request(
    api_key: int, api_version: int, correlation_id: int, client_id: str, body: bytes
) -> bytes:
    payload = (
        e_i16(api_key)
        + e_i16(api_version)
        + e_i32(correlation_id)
        + e_string(client_id)
        + body
    )
    return e_i32(len(payload)) + payload


def decode_request_header(cur: Cursor) -> tuple[int, int, int, str | None]:
    return cur.i16(), cur.i16(), cur.i32(), cur.string()


def encode_response(correlation_id: int, body: bytes) -> bytes:
    payload = e_i32(correlation_id) + body
    return e_i32(len(payload)) + payload


# --- Produce v2 ------------------------------------------------------------


def encode_produce_request(
    acks: int,
    timeout_ms: int,
    topic_data: list[tuple[str, list[tuple[int, bytes]]]],
) -> bytes:
    """topic_data = [(topic, [(partition, message_set_bytes)])]."""
    return (
        e_i16(acks)
        + e_i32(timeout_ms)
        + e_array(
            topic_data,
            lambda td: e_string(td[0])
            + e_array(td[1], lambda pd: e_i32(pd[0]) + e_bytes(pd[1])),
        )
    )


def decode_produce_request(cur: Cursor):
    acks = cur.i16()
    timeout = cur.i32()

    def part(c: Cursor):
        return c.i32(), c.bytes_()

    def topic(c: Cursor):
        return c.string(), c.array(part)

    return acks, timeout, cur.array(topic)


def encode_produce_response(
    responses: list[tuple[str, list[tuple[int, int, int, int]]]],
    throttle_ms: int = 0,
) -> bytes:
    """responses = [(topic, [(partition, error, base_offset, log_append_time)])]."""
    return (
        e_array(
            responses,
            lambda tr: e_string(tr[0])
            + e_array(
                tr[1],
                lambda pr: e_i32(pr[0]) + e_i16(pr[1]) + e_i64(pr[2]) + e_i64(pr[3]),
            ),
        )
        + e_i32(throttle_ms)
    )


def decode_produce_response(cur: Cursor):
    def part(c: Cursor):
        return c.i32(), c.i16(), c.i64(), c.i64()

    def topic(c: Cursor):
        return c.string(), c.array(part)

    topics = cur.array(topic)
    throttle = cur.i32()
    return topics, throttle


# --- Fetch v2 --------------------------------------------------------------


def encode_fetch_request(
    max_wait_ms: int,
    min_bytes: int,
    topics: list[tuple[str, list[tuple[int, int, int]]]],
    replica_id: int = -1,
) -> bytes:
    """topics = [(topic, [(partition, fetch_offset, max_bytes)])]."""
    return (
        e_i32(replica_id)
        + e_i32(max_wait_ms)
        + e_i32(min_bytes)
        + e_array(
            topics,
            lambda t: e_string(t[0])
            + e_array(t[1], lambda p: e_i32(p[0]) + e_i64(p[1]) + e_i32(p[2])),
        )
    )


def decode_fetch_request(cur: Cursor):
    replica_id = cur.i32()
    max_wait = cur.i32()
    min_bytes = cur.i32()

    def part(c: Cursor):
        return c.i32(), c.i64(), c.i32()

    def topic(c: Cursor):
        return c.string(), c.array(part)

    return replica_id, max_wait, min_bytes, cur.array(topic)


def encode_fetch_response(
    topics: list[tuple[str, list[tuple[int, int, int, bytes]]]],
    throttle_ms: int = 0,
) -> bytes:
    """topics = [(topic, [(partition, error, high_watermark, message_set)])]."""
    return e_i32(throttle_ms) + e_array(
        topics,
        lambda t: e_string(t[0])
        + e_array(
            t[1],
            lambda p: e_i32(p[0]) + e_i16(p[1]) + e_i64(p[2]) + e_bytes(p[3]),
        ),
    )


def encode_fetch_response_parts(
    topics: list[tuple[str, list[tuple[int, int, int, bytes]]]],
    correlation_id: int,
    throttle_ms: int = 0,
) -> list[bytes]:
    """Gather-write form of a FULL framed fetch response (size prefix +
    correlation id included): returns a list of buffers for the server
    to write straight to the socket, with each partition's message set
    passed through UN-COPIED.  ``encode_fetch_response`` + two
    ``encode_response`` concatenations memcpy a multi-MB response ~5
    more times; at this VM's ~2 GB/s memcpy that was the broker's serve
    ceiling.  Wire bytes are identical to the joined form (the fetch
    test suite pins decode-equality)."""
    head: list[bytes] = []  # small pieces accumulated, flushed per mset
    parts: list[bytes] = []
    total = 0

    def emit(b: bytes, big: bool = False) -> None:
        nonlocal total
        total += len(b)
        if big:
            if head:
                parts.append(b"".join(head))
                head.clear()
            parts.append(b)
        else:
            head.append(b)

    emit(e_i32(correlation_id))
    emit(e_i32(throttle_ms))
    emit(e_i32(len(topics)))
    for topic, prs in topics:
        emit(e_string(topic))
        emit(e_i32(len(prs)))
        for pid, err, hw, mset in prs:
            emit(struct.pack(">ihqi", pid, err, hw, len(mset)))
            if mset:
                emit(mset, big=len(mset) > 1 << 16)
    if head:
        parts.append(b"".join(head))
    return [e_i32(total), *parts]


def decode_fetch_response(cur: Cursor):
    throttle = cur.i32()

    def part(c: Cursor):
        return c.i32(), c.i16(), c.i64(), c.bytes_()

    def topic(c: Cursor):
        return c.string(), c.array(part)

    return throttle, cur.array(topic)


# --- ListOffsets v1 --------------------------------------------------------


def encode_list_offsets_request(
    topics: list[tuple[str, list[tuple[int, int]]]], replica_id: int = -1
) -> bytes:
    """topics = [(topic, [(partition, timestamp)])]; timestamp -1=latest,
    -2=earliest, else ms — return the first offset with ts >= timestamp."""
    return e_i32(replica_id) + e_array(
        topics,
        lambda t: e_string(t[0])
        + e_array(t[1], lambda p: e_i32(p[0]) + e_i64(p[1])),
    )


def decode_list_offsets_request(cur: Cursor):
    replica_id = cur.i32()

    def part(c: Cursor):
        return c.i32(), c.i64()

    def topic(c: Cursor):
        return c.string(), c.array(part)

    return replica_id, cur.array(topic)


def encode_list_offsets_response(
    topics: list[tuple[str, list[tuple[int, int, int, int]]]],
) -> bytes:
    """topics = [(topic, [(partition, error, timestamp, offset)])]."""
    return e_array(
        topics,
        lambda t: e_string(t[0])
        + e_array(
            t[1],
            lambda p: e_i32(p[0]) + e_i16(p[1]) + e_i64(p[2]) + e_i64(p[3]),
        ),
    )


def decode_list_offsets_response(cur: Cursor):
    def part(c: Cursor):
        return c.i32(), c.i16(), c.i64(), c.i64()

    def topic(c: Cursor):
        return c.string(), c.array(part)

    return cur.array(topic)


# --- Metadata v0 -----------------------------------------------------------


def encode_metadata_request(topics: list[str]) -> bytes:
    return e_array(topics, e_string)


def decode_metadata_request(cur: Cursor) -> list[str]:
    return cur.array(lambda c: c.string())


def encode_metadata_response(
    brokers: list[tuple[int, str, int]],
    topics: list,
) -> bytes:
    """brokers = [(node_id, host, port)];
    topics = [(error, name, parts)] where each part is either
    (error, partition, leader) — the single-node form, replicas == isr
    == [leader] — or (error, partition, leader, replicas, isr) for a
    replicated cluster (leader -1 when the partition is offline)."""

    def part(p) -> bytes:
        err, pid, leader = p[0], p[1], p[2]
        replicas = p[3] if len(p) > 3 else [leader]
        isr = p[4] if len(p) > 4 else [leader]
        return (
            e_i16(err) + e_i32(pid) + e_i32(leader)
            + e_array(replicas, e_i32) + e_array(isr, e_i32)
        )

    return e_array(
        brokers, lambda b: e_i32(b[0]) + e_string(b[1]) + e_i32(b[2])
    ) + e_array(
        topics,
        lambda t: e_i16(t[0]) + e_string(t[1]) + e_array(t[2], part),
    )


def decode_metadata_response(cur: Cursor):
    def broker(c: Cursor):
        return c.i32(), c.string(), c.i32()

    def part(c: Cursor):
        err, pid, leader = c.i16(), c.i32(), c.i32()
        replicas = c.array(lambda cc: cc.i32())
        isr = c.array(lambda cc: cc.i32())
        return err, pid, leader, replicas, isr

    def topic(c: Cursor):
        return c.i16(), c.string(), c.array(part)

    return cur.array(broker), cur.array(topic)


# --- ApiVersions v0 --------------------------------------------------------


def encode_api_versions_response(error: int = 0) -> bytes:
    return e_i16(error) + e_array(
        SUPPORTED_APIS, lambda a: e_i16(a[0]) + e_i16(a[1]) + e_i16(a[2])
    )


def decode_api_versions_response(cur: Cursor):
    err = cur.i16()
    apis = cur.array(lambda c: (c.i16(), c.i16(), c.i16()))
    return err, apis


# --- SaslHandshake v1 / SaslAuthenticate v0 ---------------------------------
# With handshake v1 the SASL challenge/response bytes travel inside
# SaslAuthenticate requests (framed, correlation-id'd) rather than as
# raw tokens on the socket — the modern flow every stock client uses.


def encode_sasl_handshake_request(mechanism: str) -> bytes:
    return e_string(mechanism)


def decode_sasl_handshake_request(cur: Cursor) -> str:
    return cur.string()


def encode_sasl_handshake_response(error: int, mechanisms: list[str]) -> bytes:
    return e_i16(error) + e_array(mechanisms, e_string)


def decode_sasl_handshake_response(cur: Cursor) -> tuple[int, list[str]]:
    return cur.i16(), cur.array(lambda c: c.string())


def encode_sasl_authenticate_request(auth_bytes: bytes) -> bytes:
    return e_bytes(auth_bytes)


def decode_sasl_authenticate_request(cur: Cursor) -> bytes:
    return cur.bytes_() or b""


def encode_sasl_authenticate_response(
    error: int, error_message: str | None, auth_bytes: bytes
) -> bytes:
    return e_i16(error) + e_string(error_message) + e_bytes(auth_bytes)


def decode_sasl_authenticate_response(
    cur: Cursor,
) -> tuple[int, str | None, bytes]:
    return cur.i16(), cur.string(), cur.bytes_() or b""


# --- Group coordination (FindCoordinator v0, JoinGroup v0, SyncGroup v0,
# --- Heartbeat v0, LeaveGroup v0, OffsetCommit v2, OffsetFetch v1) ----------
# Message layouts from the public protocol guide; the consumer-embedded
# subscription/assignment schemas are the "consumer" protocol-type ones
# every stock client uses (ConsumerProtocolSubscription/Assignment v0).


def encode_find_coordinator_request(group_id: str) -> bytes:
    return e_string(group_id)


def decode_find_coordinator_request(cur: Cursor) -> str:
    return cur.string()


def encode_find_coordinator_response(
    error: int, node_id: int, host: str, port: int
) -> bytes:
    return e_i16(error) + e_i32(node_id) + e_string(host) + e_i32(port)


def decode_find_coordinator_response(cur: Cursor):
    return cur.i16(), cur.i32(), cur.string(), cur.i32()


def encode_join_group_request(
    group_id: str,
    session_timeout_ms: int,
    member_id: str,
    protocol_type: str,
    protocols: list[tuple[str, bytes]],
) -> bytes:
    return (
        e_string(group_id)
        + e_i32(session_timeout_ms)
        + e_string(member_id)
        + e_string(protocol_type)
        + e_array(protocols, lambda p: e_string(p[0]) + e_bytes(p[1]))
    )


def decode_join_group_request(cur: Cursor):
    group_id = cur.string()
    session_timeout = cur.i32()
    member_id = cur.string()
    protocol_type = cur.string()
    protocols = cur.array(lambda c: (c.string(), c.bytes_()))
    return group_id, session_timeout, member_id, protocol_type, protocols


def encode_join_group_response(
    error: int,
    generation_id: int,
    group_protocol: str | None,
    leader_id: str | None,
    member_id: str | None,
    members: list[tuple[str, bytes]],
) -> bytes:
    """``members`` is non-empty only in the LEADER's response."""
    return (
        e_i16(error)
        + e_i32(generation_id)
        + e_string(group_protocol or "")
        + e_string(leader_id or "")
        + e_string(member_id or "")
        + e_array(members, lambda m: e_string(m[0]) + e_bytes(m[1]))
    )


def decode_join_group_response(cur: Cursor):
    error = cur.i16()
    gen = cur.i32()
    proto = cur.string()
    leader = cur.string()
    member = cur.string()
    members = cur.array(lambda c: (c.string(), c.bytes_()))
    return error, gen, proto, leader, member, members


def encode_sync_group_request(
    group_id: str,
    generation_id: int,
    member_id: str,
    assignments: list[tuple[str, bytes]],
) -> bytes:
    """``assignments`` is non-empty only from the LEADER."""
    return (
        e_string(group_id)
        + e_i32(generation_id)
        + e_string(member_id)
        + e_array(assignments, lambda a: e_string(a[0]) + e_bytes(a[1]))
    )


def decode_sync_group_request(cur: Cursor):
    group_id = cur.string()
    gen = cur.i32()
    member = cur.string()
    assignments = cur.array(lambda c: (c.string(), c.bytes_()))
    return group_id, gen, member, assignments


def encode_sync_group_response(error: int, assignment: bytes) -> bytes:
    return e_i16(error) + e_bytes(assignment)


def decode_sync_group_response(cur: Cursor):
    return cur.i16(), cur.bytes_()


def encode_heartbeat_request(group_id: str, generation_id: int, member_id: str) -> bytes:
    return e_string(group_id) + e_i32(generation_id) + e_string(member_id)


def decode_heartbeat_request(cur: Cursor):
    return cur.string(), cur.i32(), cur.string()


def encode_heartbeat_response(error: int) -> bytes:
    return e_i16(error)


def decode_heartbeat_response(cur: Cursor) -> int:
    return cur.i16()


def encode_leave_group_request(group_id: str, member_id: str) -> bytes:
    return e_string(group_id) + e_string(member_id)


def decode_leave_group_request(cur: Cursor):
    return cur.string(), cur.string()


encode_leave_group_response = encode_heartbeat_response
decode_leave_group_response = decode_heartbeat_response


def encode_offset_commit_request(
    group_id: str,
    generation_id: int,
    member_id: str,
    topics: list[tuple[str, list[tuple[int, int, str | None]]]],
    retention_time_ms: int = -1,
) -> bytes:
    """v2: topics = [(topic, [(partition, offset, metadata)])].
    generation_id=-1 + member_id='' is the standalone (non-group-managed)
    commit the protocol allows; real generations are FENCED."""
    return (
        e_string(group_id)
        + e_i32(generation_id)
        + e_string(member_id)
        + e_i64(retention_time_ms)
        + e_array(
            topics,
            lambda t: e_string(t[0])
            + e_array(
                t[1],
                lambda p: e_i32(p[0]) + e_i64(p[1]) + e_string(p[2]),
            ),
        )
    )


def decode_offset_commit_request(cur: Cursor):
    group_id = cur.string()
    gen = cur.i32()
    member = cur.string()
    retention = cur.i64()

    def part(c: Cursor):
        return c.i32(), c.i64(), c.string()

    topics = cur.array(lambda c: (c.string(), c.array(part)))
    return group_id, gen, member, retention, topics


def encode_offset_commit_response(
    topics: list[tuple[str, list[tuple[int, int]]]],
) -> bytes:
    """topics = [(topic, [(partition, error)])]."""
    return e_array(
        topics,
        lambda t: e_string(t[0])
        + e_array(t[1], lambda p: e_i32(p[0]) + e_i16(p[1])),
    )


def decode_offset_commit_response(cur: Cursor):
    return cur.array(lambda c: (c.string(), c.array(lambda p: (p.i32(), p.i16()))))


def encode_offset_fetch_request(
    group_id: str, topics: list[tuple[str, list[int]]]
) -> bytes:
    return e_string(group_id) + e_array(
        topics,
        lambda t: e_string(t[0]) + e_array(t[1], e_i32),
    )


def decode_offset_fetch_request(cur: Cursor):
    group_id = cur.string()
    topics = cur.array(lambda c: (c.string(), c.array(lambda p: p.i32())))
    return group_id, topics


def encode_offset_fetch_response(
    topics: list[tuple[str, list[tuple[int, int, str | None, int]]]],
) -> bytes:
    """topics = [(topic, [(partition, offset, metadata, error)])];
    offset -1 = nothing committed."""
    return e_array(
        topics,
        lambda t: e_string(t[0])
        + e_array(
            t[1],
            lambda p: e_i32(p[0]) + e_i64(p[1]) + e_string(p[2]) + e_i16(p[3]),
        ),
    )


def decode_offset_fetch_response(cur: Cursor):
    def part(c: Cursor):
        return c.i32(), c.i64(), c.string(), c.i16()

    return cur.array(lambda c: (c.string(), c.array(part)))


# --- the "consumer" protocol-type embedded schemas --------------------------


def encode_consumer_subscription(topics: list[str], user_data: bytes = b"") -> bytes:
    """ConsumerProtocolSubscription v0: the metadata each member sends in
    JoinGroup when protocol_type='consumer'."""
    return e_i16(0) + e_array(topics, e_string) + e_bytes(user_data)


def decode_consumer_subscription(buf: bytes):
    cur = Cursor(buf)
    _version = cur.i16()
    topics = cur.array(lambda c: c.string())
    user_data = cur.bytes_()
    return topics, user_data


def encode_consumer_assignment(
    topics: list[tuple[str, list[int]]], user_data: bytes = b""
) -> bytes:
    """ConsumerProtocolAssignment v0: what the leader hands each member
    through SyncGroup."""
    return (
        e_i16(0)
        + e_array(topics, lambda t: e_string(t[0]) + e_array(t[1], e_i32))
        + e_bytes(user_data)
    )


def decode_consumer_assignment(buf: bytes):
    cur = Cursor(buf)
    _version = cur.i16()
    topics = cur.array(lambda c: (c.string(), c.array(lambda p: p.i32())))
    user_data = cur.bytes_()
    return topics, user_data
