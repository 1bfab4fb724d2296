"""S3: byte-payload decode + identifier dispatch as Spark operators.

The front door of every reference service is: receive a Kafka record, check
the payload's 4-byte FlatBuffers file identifier, parse, and route by
topic/type (trace-to-events/src/main.rs:199-257, nexus-writer/src/
message_handlers.rs:38-120).  This module lifts that into Spark:

- envelope rows are ``(topic string, key binary?, value binary)`` — exactly
  the projection of Spark's Kafka source (works identically for
  ``readStream.format("kafka")`` in production and for in-test DataFrames);
- ``with_identifier`` extracts the identifier JVM-side so the dispatch
  filter prunes before any Python is involved;
- ``decode_*`` run the Python codec inside ``mapInPandas`` — narrow,
  Arrow-batched, scan-stage work with no shuffle: at 100 TB the payload
  bytes stream through executors once and the per-identifier filters mean
  each decoder only ever deserializes its own message family.

Malformed payloads (short buffer / wrong identifier / parse error) are
dropped, mirroring the reference's warn-and-skip policy
(digitiser-aggregator/src/main.rs:331-352); ``decode_errors`` exposes the
error-side channel for the P8 failure counters.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import messages as M

# identifiers handled by the dispatch layer
IDENTIFIERS = tuple(M.DECODERS)


def with_identifier(df: DataFrame) -> DataFrame:
    """Add the FlatBuffers file identifier (bytes 4..8 of value), JVM-side."""
    return df.withColumn("identifier", F.substring(F.col("value"), 5, 4).cast("string"))


def dispatch(df: DataFrame, ident: str) -> DataFrame:
    """Filter an envelope frame to one message family (identifier check).

    Identifier, not topic, is authoritative — the reference warns and skips
    when a topic carries an unexpected identifier."""
    out = df if "identifier" in df.columns else with_identifier(df)
    return out.filter(F.col("identifier") == ident)


def _map_decoded(df: DataFrame, ident: str, schema: T.StructType, row_fn) -> DataFrame:
    """mapInPandas plumbing shared by all decoders: filter to ``ident``,
    decode each payload, fan out via ``row_fn(decoded) -> list[dict]``.

    Integer columns are materialized as pandas NULLABLE Int64/Int32 arrays:
    a plain ``pd.DataFrame(rows)`` silently coerces an int column containing
    a ``None`` to float64, which rounds i64 values above 2^53 before Arrow
    ever sees them (the f144 value_int sidecar exists precisely to avoid
    that rounding)."""
    cols = [f.name for f in schema.fields]
    int_dtype = {
        f.name: "Int64" if isinstance(f.dataType, T.LongType) else "Int32"
        for f in schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType))
    }

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for payload in pdf["value"]:
                buf = bytes(payload)
                try:
                    decoded = M.DECODERS[ident](buf)
                except Exception:
                    continue  # malformed: warn-and-skip channel (P8)
                out.extend(row_fn(decoded))
            if out:
                yield pd.DataFrame(
                    {
                        c: pd.array([r[c] for r in out], dtype=int_dtype[c])
                        if c in int_dtype
                        else pd.Series([r[c] for r in out])
                        for c in cols
                    },
                    columns=cols,
                )
            else:
                yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    return dispatch(df, ident).select("value").mapInPandas(proc, schema)


def _map_decoded_cols(df: DataFrame, ident: str, schema: T.StructType, cols_fn) -> DataFrame:
    """Columnar variant of ``_map_decoded``: ``cols_fn(decoded) ->
    dict[str, np.ndarray]`` returns the already-expanded column vectors for
    ONE message; per Arrow batch the vectors are concatenated column-wise
    and handed to pandas once.  This avoids materializing one Python dict
    per OUTPUT ROW (a 10k-event dev2 message used to allocate 10k dicts
    before pandas re-columnarized them) — the decoder already holds SoA
    numpy vectors, so the batch is built with np.repeat/np.concatenate at
    C speed.  Throughput-critical at the reference's 800k events/s wire
    rate."""
    cols = [f.name for f in schema.fields]

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts: list[dict] = []
            for payload in pdf["value"]:
                buf = bytes(payload)
                try:
                    decoded = M.DECODERS[ident](buf)
                except Exception:
                    continue  # malformed: warn-and-skip channel (P8)
                part = cols_fn(decoded)
                if part is not None:
                    parts.append(part)
            if parts:
                yield pd.DataFrame(
                    {c: np.concatenate([p[c] for p in parts]) for c in cols},
                    columns=cols,
                )
            else:
                yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    return dispatch(df, ident).select("value").mapInPandas(proc, schema)


def _ts_us(ns: int) -> pd.Timestamp:
    """Spark's TimestampType is microsecond; truncate explicitly (ns
    fidelity only matters for the relative event_time_offset, SURVEY §1.2).
    The python-level codec (messages.py) keeps exact nanoseconds."""
    return pd.Timestamp(int(ns) - int(ns) % 1000, unit="ns")


def _md_cols(md: dict) -> dict:
    return {
        "ts": _ts_us(md["ts_ns"]),
        "period_number": md["period_number"],
        "protons_per_pulse": md["protons_per_pulse"],
        "running": md["running"],
        "frame_number": md["frame_number"],
        "veto_flags": md["veto_flags"],
    }


def _md_vecs(md: dict, n: int) -> dict:
    """Metadata as n-repeated column vectors (columnar twin of _md_cols)."""
    return {
        "ts": np.full(n, _ts_us(md["ts_ns"]).to_datetime64(), dtype="datetime64[ns]"),
        "period_number": np.full(n, md["period_number"], dtype="int64"),
        "protons_per_pulse": np.full(n, md["protons_per_pulse"], dtype="int32"),
        "running": np.full(n, bool(md["running"]), dtype=bool),
        "frame_number": np.full(n, md["frame_number"], dtype="int64"),
        "veto_flags": np.full(n, md["veto_flags"], dtype="int32"),
    }


_MD_FIELDS = [
    T.StructField("ts", T.TimestampType()),
    T.StructField("period_number", T.LongType()),
    T.StructField("protons_per_pulse", T.IntegerType()),
    T.StructField("running", T.BooleanType()),
    T.StructField("frame_number", T.LongType()),
    T.StructField("veto_flags", T.IntegerType()),
]

DAT2_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("digitizer_id", T.IntegerType()),
        *_MD_FIELDS,
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("voltage", T.ArrayType(T.IntegerType())),
    ]
)

DEV2_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("digitizer_id", T.IntegerType()),
        *_MD_FIELDS,
        T.StructField("channel", T.IntegerType()),
        T.StructField("event_time", T.LongType()),
        T.StructField("event_voltage", T.IntegerType()),
    ]
)

AEV2_DECODED_SCHEMA = T.StructType(
    [
        *_MD_FIELDS,
        T.StructField("complete", T.BooleanType()),
        T.StructField("digitizers_present", T.ArrayType(T.IntegerType())),
        T.StructField("channel", T.ArrayType(T.IntegerType())),
        T.StructField("event_time", T.ArrayType(T.LongType())),
        T.StructField("event_voltage", T.ArrayType(T.IntegerType())),
    ]
)

RUN_CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # start | stop
        T.StructField("run_name", T.StringType()),
        T.StructField("time_ms", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("instrument_name", T.StringType()),
        T.StructField("n_periods", T.IntegerType()),
        T.StructField("job_id", T.StringType()),
    ]
)

F144_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_int", T.LongType()),
        T.StructField("value_type", T.StringType()),
        T.StructField("value_array", T.ArrayType(T.DoubleType())),
    ]
)

SE00_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("packet_ts", T.TimestampType()),
        T.StructField("time_delta", T.DoubleType()),
        T.StructField("timestamp_location", T.StringType()),
        T.StructField("values", T.ArrayType(T.DoubleType())),
        T.StructField("timestamps", T.ArrayType(T.LongType())),
        T.StructField("message_counter", T.LongType()),
    ]
)

AL00_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("severity", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)


def decode_dat2(df: DataFrame) -> DataFrame:
    """dat2 payloads → long trace rows (one per channel), matching
    ``schemas.TRACE_SCHEMA``.  Built columnarly from the decoder's SoA
    vectors — no per-row Python dicts."""

    def cols(d: dict):
        chans = d["channels"]
        n = len(chans)
        if n == 0:
            return None
        voltage = np.empty(n, dtype=object)
        for i, (_, v) in enumerate(chans):
            voltage[i] = np.asarray(v).astype("int32").tolist()
        return {
            "digitizer_id": np.full(n, d["digitizer_id"], dtype="int32"),
            **_md_vecs(d["metadata"], n),
            "sample_rate": np.full(n, d["sample_rate"], dtype="int64"),
            "channel": np.asarray([ch for ch, _ in chans], dtype="int32"),
            "voltage": voltage,
        }

    return _map_decoded_cols(df, "dat2", DAT2_DECODED_SCHEMA, cols)


def decode_dev2(df: DataFrame) -> DataFrame:
    """dev2 payloads → long event rows (one per detected event).  Built
    columnarly: a 10k-event message becomes 9 np.repeat/asarray column
    vectors, not 10k row dicts — several times cheaper at wire rates."""

    def cols(d: dict):
        t = d["time"]
        n = 0 if t is None else len(t)
        if n == 0:
            return None
        return {
            "digitizer_id": np.full(n, d["digitizer_id"], dtype="int32"),
            **_md_vecs(d["metadata"], n),
            "channel": np.asarray(d["channel"], dtype="int32"),
            "event_time": np.asarray(t, dtype="int64"),
            "event_voltage": np.asarray(d["voltage"]).astype("int32"),
        }

    return _map_decoded_cols(df, "dev2", DEV2_DECODED_SCHEMA, cols)


def _dev2_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("digitizer_id", pa.int32()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("period_number", pa.int64()),
            ("protons_per_pulse", pa.int32()),
            ("running", pa.bool_()),
            ("frame_number", pa.int64()),
            ("veto_flags", pa.int32()),
            ("channel", pa.list_(pa.int32())),
            ("event_time", pa.list_(pa.int64())),
            ("event_voltage", pa.list_(pa.float64())),
        ]
    )


# Epoch seconds of Jan 1 for GpsTime's year-since-2000 u8 (256 possible
# years) — lets the vectorized decoder turn GPS fields into epoch ns with
# pure int64 numpy arithmetic, no datetime objects per message.
_YEAR_EPOCH_S: np.ndarray | None = None


def _year_epoch_table() -> np.ndarray:
    global _YEAR_EPOCH_S
    if _YEAR_EPOCH_S is None:
        import calendar

        _YEAR_EPOCH_S = np.array(
            [calendar.timegm((2000 + y, 1, 1, 0, 0, 0)) for y in range(256)],
            dtype=np.int64,
        )
    return _YEAR_EPOCH_S


def _gather_ranges(B: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate ``B[s:s+l]`` for every (s, l) pair.  Hot case — equal
    lengths at an equal pitch, i.e. a column of identically-shaped
    messages — is ONE strided-view copy with no index arrays at all
    (a per-element fancy-index gather measured 3x slower: building +
    cumsum-ing a bytes-sized int64 index dominates).  Ragged inputs fall
    back to per-range ``frombuffer`` views joined by one concatenate —
    C memcpys, still no per-element Python work.  ``lens`` all > 0."""
    nr = len(starts)
    if nr == 1:
        return np.frombuffer(
            B, dtype=np.uint8, count=int(lens[0]), offset=int(starts[0])
        ).copy()
    if int(lens.max()) == int(lens.min()):
        pitch = np.diff(starts)
        if int(pitch.max()) == int(pitch.min()) and int(pitch[0]) >= 0:
            length = int(lens[0])
            mat = np.lib.stride_tricks.as_strided(
                B[int(starts[0]) :],
                shape=(nr, length),
                strides=(int(pitch[0]), 1),
            )
            return np.ascontiguousarray(mat).reshape(-1)
    return np.concatenate(
        [
            np.frombuffer(B, dtype=np.uint8, count=int(l), offset=int(s))
            for s, l in zip(starts.tolist(), lens.tolist())
        ]
    )


class _FbColumnWalker:
    """Vectorized whole-column FlatBuffers traversal: every step (root
    uoffset → vtable → field slots → vector headers) runs as a numpy
    gather over the Arrow binary column's ONE contiguous data buffer —
    no per-message Python objects.  Decodes the generic table wire
    format (any vtable layout, absent fields → schema defaults) with
    strict per-message bounds masking: a message whose traversal would
    read outside its own [start, end) byte range drops out of ``ok``,
    exactly the warn-and-skip contract of the per-message decoders
    (P8).  Shared by the dev2 and aev2 column decoders.  Raises
    TypeError for a non-binary column (callers fall back to the
    per-message path)."""

    def __init__(self, arr) -> None:
        import pyarrow as pa

        if arr.type == pa.binary():
            offdt = np.int32
        elif arr.type == pa.large_binary():
            offdt = np.int64
        else:
            raise TypeError(f"not a binary column: {arr.type}")
        self.n = len(arr)
        bufs = arr.buffers()
        self.empty = self.n == 0 or bufs[2] is None or len(bufs[2]) == 0
        if self.empty:
            return
        off = np.frombuffer(
            bufs[1], dtype=offdt, count=self.n + 1,
            offset=arr.offset * np.dtype(offdt).itemsize,
        ).astype(np.int64)
        self.B = np.frombuffer(bufs[2], dtype=np.uint8)
        self.Bn = len(self.B)
        self.s, self.e = off[:-1], off[1:]
        self.ok = (self.e - self.s) >= 8
        if bufs[0] is not None:  # validity bitmap (slice-aware)
            bits = np.unpackbits(
                np.frombuffer(bufs[0], dtype=np.uint8), bitorder="little"
            )
            self.ok &= bits[arr.offset : arr.offset + self.n].astype(bool)

    # all byte reads are CLIPPED so masked-out messages can never index
    # out of bounds; their garbage values are discarded by ``ok``
    def u8(self, p):
        return self.B[np.clip(p, 0, self.Bn - 1)].astype(np.int64)

    def u16(self, p):
        p = np.clip(p, 0, max(self.Bn - 2, 0))
        return self.u8(p) | (self.u8(p + 1) << 8)

    def u32(self, p):
        p = np.clip(p, 0, max(self.Bn - 4, 0))
        return self.u16(p) | (self.u16(p + 2) << 16)

    def u64(self, p):
        p = np.clip(p, 0, max(self.Bn - 8, 0))
        return self.u32(p) | (self.u32(p + 4) << 32)

    def require_ident(self, ident: bytes) -> None:
        for k in range(4):
            self.ok &= self.u8(self.s + 4 + k) == ident[k]

    def root(self):
        return self.s + self.u32(self.s)

    def table_at(self, tpos):
        """vtable position + size of the table at ``tpos``, folding the
        structural bounds checks into ``ok``."""
        self.ok &= (tpos >= self.s) & (tpos + 4 <= self.e)
        soff = self.u32(tpos)
        soff = np.where(soff >= 1 << 31, soff - (1 << 32), soff)
        vpos = tpos - soff
        self.ok &= (vpos >= self.s) & (vpos + 4 <= self.e)
        vsize = self.u16(vpos)
        self.ok &= (vsize >= 4) & (vpos + vsize <= self.e)
        return vpos, vsize

    def field(self, tpos, vpos, vsize, idx):
        """(present, field_pos) of slot ``idx`` — absent fields get the
        schema default downstream, exactly like flatbuf.field_pos."""
        slot = 4 + 2 * idx
        has = (slot + 2) <= vsize
        voff = np.where(has, self.u16(vpos + slot), 0)
        return has & (voff != 0), tpos + voff

    def scalar(self, tpos, vpos, vsize, idx, reader, width, default=0):
        present, fpos = self.field(tpos, vpos, vsize, idx)
        self.ok &= ~present | (fpos + width <= self.e)
        return np.where(present, reader(fpos), default)

    def vector_header(self, tpos, vpos, vsize, idx, itemsize):
        """(values_pos, count) of the vector at slot ``idx``; absent →
        count 0 (schema default: empty)."""
        present, fpos = self.field(tpos, vpos, vsize, idx)
        self.ok &= ~present | (fpos + 4 <= self.e)
        vp = fpos + self.u32(fpos)
        self.ok &= ~present | ((vp >= self.s) & (vp + 4 <= self.e))
        cnt = np.where(present, self.u32(vp), 0)
        self.ok &= ~present | (vp + 4 + cnt * itemsize <= self.e)
        return vp, cnt

    def metadata_arrays(self, tpos, vpos, vsize, slot):
        """FrameMetadataV2 at the REQUIRED table slot (absent metadata
        masks the message out — the per-message path raises and skips):
        (ts_us, period, protons, running, frame, veto) numpy arrays.
        GpsTime (slot 0, 14-byte inline struct <BxHBBBxHHH) becomes
        epoch µs via a year-epoch lookup — pure int64 arithmetic."""
        md_present, md_fp = self.field(tpos, vpos, vsize, slot)
        self.ok &= md_present & (md_fp + 4 <= self.e)
        mpos = md_fp + self.u32(md_fp)
        mv, mvs = self.table_at(mpos)
        period = self.scalar(mpos, mv, mvs, 1, self.u64, 8)
        protons = self.scalar(mpos, mv, mvs, 2, self.u8, 1)
        running = self.scalar(mpos, mv, mvs, 3, self.u8, 1) != 0
        frame = self.scalar(mpos, mv, mvs, 4, self.u32, 4)
        veto = self.scalar(mpos, mv, mvs, 5, self.u16, 2)
        g_present, gpos = self.field(mpos, mv, mvs, 0)
        self.ok &= ~g_present | (gpos + 14 <= self.e)
        base_s = (
            _year_epoch_table()[self.u8(gpos)]
            + (self.u16(gpos + 2) - 1) * 86400
            + self.u8(gpos + 4) * 3600
            + self.u8(gpos + 5) * 60
            + self.u8(gpos + 6)
        )
        ts_ns = base_s * 1_000_000_000 + (
            self.u16(gpos + 8) * 1_000_000
            + self.u16(gpos + 10) * 1_000
            + self.u16(gpos + 12)
        )
        ts_us = np.where(g_present, ts_ns // 1_000, 0)
        return ts_us, period, protons, running, frame, veto

    def list_col(self, vp, cnt, itemsize, view_dt, np_out, pa_value_type):
        """Build one Arrow list column from vector headers — call only
        after ``ok`` is FINAL.  Values land via _gather_ranges (strided
        zero-index copy for uniform layouts)."""
        import pyarrow as pa

        ok = self.ok
        counts = cnt[ok].astype(np.int32)
        offs = np.zeros(int(np.count_nonzero(ok)) + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        rows = ok & (cnt > 0)
        if rows.any():
            raw = _gather_ranges(self.B, vp[rows] + 4, cnt[rows] * itemsize)
            values_buf = raw.view(view_dt).astype(np_out)
        else:
            values_buf = np.empty(0, dtype=np_out)
        return pa.ListArray.from_arrays(
            pa.array(offs), pa.array(values_buf, type=pa_value_type)
        )


def _empty_batch(out_schema):
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [pa.array([], type=f.type) for f in out_schema], schema=out_schema
    )


def _dev2_vectorized(arr):
    """Vectorized whole-column dev2 decode on _FbColumnWalker.  Returns
    a DIGITISER_MESSAGE_SCHEMA-shaped RecordBatch; raises TypeError for
    a non-binary column (caller falls back to the per-message path)."""
    import pyarrow as pa

    out_schema = _dev2_arrow_schema()
    w = _FbColumnWalker(arr)
    if w.empty:
        return _empty_batch(out_schema)
    w.require_ident(b"dev2")
    root = w.root()
    rv, rvs = w.table_at(root)
    digitizer_id = w.scalar(root, rv, rvs, 0, w.u8, 1)
    ts_us, period, protons, running, frame, veto = w.metadata_arrays(
        root, rv, rvs, 1
    )
    # event vectors: slots 2 time(u32) / 3 voltage(u16) / 4 channel(u32)
    vec = {
        idx: w.vector_header(root, rv, rvs, idx, itemsize)
        for idx, itemsize in ((2, 4), (3, 2), (4, 4))
    }
    ok = w.ok
    if not ok.any():
        return _empty_batch(out_schema)
    arrays = [
        pa.array(digitizer_id[ok].astype(np.int32)),
        pa.array(ts_us[ok]).view(pa.timestamp("us", tz="UTC")),
        pa.array(period[ok]),
        pa.array(protons[ok].astype(np.int32)),
        pa.array(running[ok]),
        pa.array(frame[ok]),
        pa.array(veto[ok].astype(np.int32)),
        w.list_col(*vec[4], 4, "<u4", np.int32, pa.int32()),
        w.list_col(*vec[2], 4, "<u4", np.int64, pa.int64()),
        w.list_col(*vec[3], 2, "<u2", np.float64, pa.float64()),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def _aev2_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("ts", pa.timestamp("us", tz="UTC")),
            ("period_number", pa.int64()),
            ("protons_per_pulse", pa.int32()),
            ("running", pa.bool_()),
            ("frame_number", pa.int64()),
            ("veto_flags", pa.int32()),
            ("complete", pa.bool_()),
            ("digitizers_present", pa.list_(pa.int32())),
            ("channel", pa.list_(pa.int32())),
            ("event_time", pa.list_(pa.int64())),
            ("event_voltage", pa.list_(pa.int32())),
        ]
    )


def _aev2_vectorized(arr):
    """Vectorized whole-column aev2 decode (FrameAssembledEventList —
    the reference nexus-writer's wire input): AEV2_DECODED_SCHEMA-shaped
    RecordBatch.  Root slots: 0 metadata / 1 time(u32) / 2 voltage(u16)
    / 3 channel(u32) / 4 complete(bool) / 5 digitizers_present(u8)."""
    import pyarrow as pa

    out_schema = _aev2_arrow_schema()
    w = _FbColumnWalker(arr)
    if w.empty:
        return _empty_batch(out_schema)
    w.require_ident(b"aev2")
    root = w.root()
    rv, rvs = w.table_at(root)
    ts_us, period, protons, running, frame, veto = w.metadata_arrays(
        root, rv, rvs, 0
    )
    complete = w.scalar(root, rv, rvs, 4, w.u8, 1) != 0
    vec = {
        idx: w.vector_header(root, rv, rvs, idx, itemsize)
        for idx, itemsize in ((1, 4), (2, 2), (3, 4), (5, 1))
    }
    ok = w.ok
    if not ok.any():
        return _empty_batch(out_schema)
    arrays = [
        pa.array(ts_us[ok]).view(pa.timestamp("us", tz="UTC")),
        pa.array(period[ok]),
        pa.array(protons[ok].astype(np.int32)),
        pa.array(running[ok]),
        pa.array(frame[ok]),
        pa.array(veto[ok].astype(np.int32)),
        pa.array(complete[ok]),
        w.list_col(*vec[5], 1, "<u1", np.int32, pa.int32()),
        w.list_col(*vec[3], 4, "<u4", np.int32, pa.int32()),
        w.list_col(*vec[1], 4, "<u4", np.int64, pa.int64()),
        w.list_col(*vec[2], 2, "<u2", np.int32, pa.int32()),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def aev2_arrow_batch(values):
    """aev2 payloads → ONE AEV2_DECODED_SCHEMA-shaped RecordBatch.
    Arrow binary columns take the vectorized whole-column path; other
    inputs fall back to the per-message decoder (same warn-and-skip
    contract).  Pinned row-identical by tests/test_envelope_decode.py."""
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        try:
            return _aev2_vectorized(values)
        except TypeError:
            pass  # exotic column type: per-message below

    out_schema = _aev2_arrow_schema()
    decoder = M.DECODERS["aev2"]
    dec = []
    for v in values:
        b = v if isinstance(v, (bytes, bytearray)) or v is None else v.as_py()
        if b is None or len(b) < 8 or bytes(b[4:8]) != b"aev2":
            continue  # wrong family: warn-and-skip
        try:
            dec.append(decoder(b))
        except Exception:
            continue  # malformed: warn-and-skip channel (P8)
    n = len(dec)
    if n == 0:
        return _empty_batch(out_schema)

    def _list_col(vecs, np_type, pa_value_type):
        lens = np.fromiter((len(v) for v in vecs), np.int32, len(vecs))
        offs = np.zeros(len(vecs) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        values_buf = (
            np.concatenate([np.asarray(v).astype(np_type) for v in vecs])
            if int(offs[-1])
            else np.empty(0, dtype=np_type)
        )
        return pa.ListArray.from_arrays(
            pa.array(offs), pa.array(values_buf, type=pa_value_type)
        )

    md = [d["metadata"] for d in dec]
    arrays = [
        pa.array(
            np.fromiter((m["ts_ns"] // 1000 for m in md), np.int64, n)
        ).view(pa.timestamp("us", tz="UTC")),
        pa.array(np.fromiter((m["period_number"] for m in md), np.int64, n)),
        pa.array(
            np.fromiter((m["protons_per_pulse"] for m in md), np.int32, n)
        ),
        pa.array(np.fromiter((bool(m["running"]) for m in md), bool, n)),
        pa.array(np.fromiter((m["frame_number"] for m in md), np.int64, n)),
        pa.array(np.fromiter((m["veto_flags"] for m in md), np.int32, n)),
        pa.array(np.fromiter((bool(d["complete"]) for d in dec), bool, n)),
        _list_col(
            [d["digitizers_present"] if d["digitizers_present"] is not None
             else () for d in dec],
            np.int32, pa.int32(),
        ),
        _list_col(
            [d["channel"] if d["channel"] is not None else () for d in dec],
            np.int32, pa.int32(),
        ),
        _list_col(
            [d["time"] if d["time"] is not None else () for d in dec],
            np.int64, pa.int64(),
        ),
        _list_col(
            [d["voltage"] if d["voltage"] is not None else () for d in dec],
            np.int32, pa.int32(),
        ),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def dev2_arrow_batch(values):
    """Decode an iterable of raw dev2 payloads (bytes / None / Arrow
    binary scalars) into ONE Arrow RecordBatch of the
    DIGITISER_MESSAGE_SCHEMA shape.  Identifier-checked per payload:
    non-dev2 or malformed entries are warn-and-skipped (P8).  All event
    vectors concatenate into one values buffer per column
    (``pa.ListArray.from_arrays``) — no per-event Python objects.

    Arrow binary columns take the VECTORIZED whole-column path
    (``_dev2_vectorized``: numpy gathers over the column's one data
    buffer, ~memory-bandwidth decode); anything else — python lists in
    tests, exotic column types — falls back to the per-message decoder.
    Both paths are pinned row-identical by
    tests/test_envelope_decode.py.

    Shared by the ``mapInArrow`` decoder stage
    (``decode_dev2_messages``) and the kafka-wire source's FUSED
    ``valueDecode=dev2`` path (kafka/spark_source.py), where decoding
    inside the source task removes a whole JVM<->Python round trip of
    the raw payload bytes per micro-batch."""
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        rb = _dev2_vectorized(values)
        if rb is not None:
            return rb

    out_schema = _dev2_arrow_schema()
    decoder = M.DECODERS["dev2"]
    dec = []
    for v in values:
        b = v if isinstance(v, (bytes, bytearray)) or v is None else v.as_py()
        if b is None or len(b) < 8 or bytes(b[4:8]) != b"dev2":
            continue  # wrong family on the topic: warn-and-skip
        try:
            dec.append(decoder(b))
        except Exception:
            continue  # malformed: warn-and-skip channel (P8)
    n = len(dec)
    if n == 0:
        return pa.RecordBatch.from_arrays(
            [pa.array([], type=f.type) for f in out_schema],
            schema=out_schema,
        )

    def _list_col(vecs: list, np_type, pa_value_type):
        lens = np.fromiter((len(v) for v in vecs), np.int32, len(vecs))
        offs = np.zeros(len(vecs) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        values_buf = (
            np.concatenate([np.asarray(v, dtype=np_type) for v in vecs])
            if int(offs[-1])
            else np.empty(0, dtype=np_type)
        )
        return pa.ListArray.from_arrays(
            pa.array(offs), pa.array(values_buf, type=pa_value_type)
        )

    md = [d["metadata"] for d in dec]
    ts_us = np.fromiter((m["ts_ns"] // 1000 for m in md), np.int64, n)
    arrays = [
        pa.array(np.fromiter((d["digitizer_id"] for d in dec), np.int32, n)),
        pa.array(ts_us).view(pa.timestamp("us", tz="UTC")),
        pa.array(np.fromiter((m["period_number"] for m in md), np.int64, n)),
        pa.array(
            np.fromiter((m["protons_per_pulse"] for m in md), np.int32, n)
        ),
        pa.array(np.fromiter((bool(m["running"]) for m in md), bool, n)),
        pa.array(np.fromiter((m["frame_number"] for m in md), np.int64, n)),
        pa.array(np.fromiter((m["veto_flags"] for m in md), np.int32, n)),
        _list_col(
            [d["channel"] if d["channel"] is not None else () for d in dec],
            np.int32, pa.int32(),
        ),
        _list_col(
            [d["time"] if d["time"] is not None else () for d in dec],
            np.int64, pa.int64(),
        ),
        _list_col(
            [d["voltage"] if d["voltage"] is not None else () for d in dec],
            np.float64, pa.float64(),
        ),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def decode_dev2_messages(df: DataFrame) -> DataFrame:
    """dev2 payloads → one row per MESSAGE with SoA arrays — exactly the
    DIGITISER_MESSAGE_SCHEMA shape streaming frame assembly consumes, so a
    Kafka-envelope stream plugs straight into assemble_frames_stream.

    Arrow-native (``mapInArrow`` over ``dev2_arrow_batch``): per batch,
    the event vectors of all messages concatenate into ONE values buffer
    per column and the list columns are built with
    ``pa.ListArray.from_arrays`` — no per-event Python objects anywhere.
    The previous pandas build boxed every event through ``.tolist()``
    (~3 PyObjects/event), which dominated the kafka-wire front door's
    decode cost at the 32x500 shape (VERDICT r9 #3).  Timestamps are
    emitted as timestamp[us, UTC] (sessions here pin
    spark.sql.session.timeZone=UTC)."""
    from ..streaming.frame_assembly_stream import DIGITISER_MESSAGE_SCHEMA

    def proc(batches):
        for rb in batches:
            yield dev2_arrow_batch(rb.column(0))

    return dispatch(df, "dev2").select("value").mapInArrow(
        proc, DIGITISER_MESSAGE_SCHEMA
    )


def decode_aev2(df: DataFrame) -> DataFrame:
    """aev2 payloads → one grouped row per assembled frame.

    Arrow-native (``mapInArrow`` over ``aev2_arrow_batch``, the
    vectorized whole-column decoder): the previous row-dict build boxed
    every event through ``.tolist()`` (~3 PyObjects/event) — at the
    reference writer's 800k events/s aev2 ingest that per-event Python
    was the decode cost."""

    def proc(batches):
        for rb in batches:
            yield aev2_arrow_batch(rb.column(0))

    return dispatch(df, "aev2").select("value").mapInArrow(
        proc, AEV2_DECODED_SCHEMA
    )


def decode_run_control(df: DataFrame) -> DataFrame:
    """pl72 + 6s4t payloads → a unified run-control stream (T4 input)."""

    def start_rows(d: dict) -> list[dict]:
        return [
            {
                "kind": "start",
                "run_name": d["run_name"],
                "time_ms": d["start_time_ms"],
                "filename": d["filename"],
                "instrument_name": d["instrument_name"],
                "n_periods": d["n_periods"],
                "job_id": d["job_id"],
            }
        ]

    def stop_rows(d: dict) -> list[dict]:
        return [
            {
                "kind": "stop",
                "run_name": d["run_name"],
                "time_ms": d["stop_time_ms"],
                "filename": None,
                "instrument_name": None,
                "n_periods": None,
                "job_id": d["job_id"],
            }
        ]

    starts = _map_decoded(df, "pl72", RUN_CONTROL_SCHEMA, start_rows)
    stops = _map_decoded(df, "6s4t", RUN_CONTROL_SCHEMA, stop_rows)
    return starts.unionByName(stops)


def run_control_events(df: DataFrame) -> DataFrame:
    """Decoded pl72/6s4t envelope rows → the CONTROL_SCHEMA shape the run
    lifecycle FSM consumes (streaming/run_lifecycle.py): kind, run_name,
    ts (epoch-ms widened to timestamp), instrument."""
    return decode_run_control(df).select(
        "kind",
        "run_name",
        F.timestamp_millis(F.col("time_ms")).alias("ts"),
        F.col("instrument_name").alias("instrument"),
    )


# f144 scalar families whose exact value survives in the value_int sidecar
_F144_INT_KINDS = frozenset(
    ["byte", "ubyte", "short", "ushort", "int", "uint", "long", "ulong"]
)


def decode_f144(df: DataFrame) -> DataFrame:
    """f144 payloads → RUNLOG_SCHEMA shape: union widened to DOUBLE + tag
    column (SURVEY §1.1 'widest type + tag'), plus a ``value_int`` BIGINT
    sidecar for the integer families so i64/u64 log values above 2^53 keep
    exact integer fidelity (schemas/ecs_f144_logdata.fbs:80-101 allows the
    full u64 range; the DOUBLE widening alone would silently round).  A
    ulong value >= 2^63 exceeds BIGINT and leaves the sidecar NULL — the
    DOUBLE approximation is then the only representation, as in the
    reference's f64 read path."""

    def rows(d: dict) -> list[dict]:
        vt = d["value_type"]
        is_array = vt.startswith("array")
        value_int = None
        if not is_array and vt in _F144_INT_KINDS:
            iv = int(d["value"])
            if -(2**63) <= iv < 2**63:
                value_int = iv
        return [
            {
                "source_name": d["source_name"],
                "ts": _ts_us(d["timestamp_ns"]),
                "value": None if is_array else float(d["value"]),
                "value_int": value_int,
                "value_type": vt,
                "value_array": [float(x) for x in d["value"]] if is_array else None,
            }
        ]

    return _map_decoded(df, "f144", F144_DECODED_SCHEMA, rows)


def decode_se00(df: DataFrame) -> DataFrame:
    def rows(d: dict) -> list[dict]:
        return [
            {
                "name": d["name"],
                "channel": d["channel"],
                "packet_ts": _ts_us(d["packet_timestamp_ns"]),
                "time_delta": d["time_delta_ns"],
                "timestamp_location": d["timestamp_location"],
                "values": [float(x) for x in d["values"]],
                "timestamps": None
                if d["timestamps"] is None
                else [int(x) for x in d["timestamps"]],
                "message_counter": d["message_counter"],
            }
        ]

    return _map_decoded(df, "se00", SE00_DECODED_SCHEMA, rows)


DF12_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("spectrum", T.IntegerType()),
        T.StructField("detector_id", T.IntegerType()),
        T.StructField("n_spectra", T.IntegerType()),
    ]
)


def decode_df12(df: DataFrame) -> DataFrame:
    """df12 detector-spectrum map payloads → long (spectrum, detector_id)
    rows (J4's broadcast lookup side; schemas/ecs_df12_det_spec_map.fbs)."""

    def rows(d: dict) -> list[dict]:
        n = int(d["n_spectra"])
        return [
            {"spectrum": int(s), "detector_id": int(det), "n_spectra": n}
            for s, det in zip(d["spectrum"], d["detector_id"])
        ]

    return _map_decoded(df, "df12", DF12_DECODED_SCHEMA, rows)


def decode_al00(df: DataFrame) -> DataFrame:
    def rows(d: dict) -> list[dict]:
        return [
            {
                "source_name": d["source_name"],
                "ts": _ts_us(d["timestamp_ns"]),
                "severity": d["severity"],
                "message": d["message"],
            }
        ]

    return _map_decoded(df, "al00", AL00_DECODED_SCHEMA, rows)


def decode_stream(df: DataFrame) -> dict[str, DataFrame]:
    """Route an envelope frame into every typed stream the pipeline consumes
    — the Spark restatement of per-topic handler dispatch
    (nexus-writer/src/main.rs:284-323).  Works on batch and streaming
    DataFrames alike (all operators here are stateless/narrow)."""
    env = with_identifier(df)
    return {
        "dat2": decode_dat2(env),
        "dev2": decode_dev2(env),
        "aev2": decode_aev2(env),
        "run_control": decode_run_control(env),
        "f144": decode_f144(env),
        "se00": decode_se00(env),
        "al00": decode_al00(env),
        "df12": decode_df12(env),
    }


def decode_errors(df: DataFrame) -> DataFrame:
    """Error-side output: envelope rows whose payload has no known
    identifier (P8 failure counters feed off this).

    SCOPE: this is the shallow (JVM-only) check — short buffers and unknown
    identifiers.  A payload with a KNOWN identifier but a corrupt body is
    dropped inside the decoders' warn-and-skip branch and does NOT appear
    here; use :func:`..operators.diagnostics.parse_failure_counters` (the
    deep variant that attempts the parse) to count those as
    ``parse_error``."""
    return with_identifier(df).filter(
        (F.length("value") < 8) | ~F.col("identifier").isin(*IDENTIFIERS)
    )
