"""Minimal FlatBuffers wire codec (builder + reader), dependency-free.

The reference pipeline's Kafka payloads are FlatBuffers messages
(streaming-types/src/lib.rs:7-41 routes by 4-byte file identifier).  The
``flatbuffers`` runtime is not available in this environment, so this module
implements the small subset of the public FlatBuffers wire format
(https://flatbuffers.dev/internals — little-endian scalars, vtable-indexed
tables, length-prefixed vectors/strings, inline structs, (type, value)
unions) needed to encode and decode the pipeline's nine schemas.  It is
written from the published format specification, not from any generated
code.

Builder semantics follow the spec: buffers are constructed back-to-front so
all references are forward uoffsets; alignment is maintained relative to the
buffer end (``finish`` pads so end-relative alignment equals absolute
alignment).  Vtables are not deduplicated (valid, slightly larger buffers).
"""

from __future__ import annotations

import struct

import numpy as np

_U16 = struct.Struct("<H")
_U32 = struct.Struct("<I")
_I32 = struct.Struct("<i")

# scalar format codes: (struct char, size)
SCALARS = {
    "bool": ("?", 1),
    "i8": ("b", 1),
    "u8": ("B", 1),
    "i16": ("h", 2),
    "u16": ("H", 2),
    "i32": ("i", 4),
    "u32": ("I", 4),
    "i64": ("q", 8),
    "u64": ("Q", 8),
    "f32": ("f", 4),
    "f64": ("d", 8),
}

_NP_DTYPE = {
    "bool": np.bool_,
    "i8": np.int8,
    "u8": np.uint8,
    "i16": np.int16,
    "u16": np.uint16,
    "i32": np.int32,
    "u32": np.uint32,
    "i64": np.int64,
    "u64": np.uint64,
    "f32": np.float32,
    "f64": np.float64,
}


class Builder:
    """Back-to-front FlatBuffers builder.

    Internally keeps a list of chunks in *prepend order*; the final buffer is
    ``b"".join(reversed(chunks))``.  All offsets handed to callers are
    end-offsets (distance from the final byte of the buffer to the start of
    the object).
    """

    def __init__(self) -> None:
        self._chunks: list[bytes] = []
        self._len = 0
        self._minalign = 1
        # set while a table is open
        self._table_start_len: int | None = None
        self._slots: dict[int, int] | None = None

    # -- low-level ---------------------------------------------------------

    def _push(self, data: bytes) -> None:
        self._chunks.append(data)
        self._len += len(data)

    def _prep(self, size: int, additional: int = 0) -> None:
        """Pad so the next write of ``size`` bytes (after ``additional``
        bytes that will also be written) lands end-aligned to ``size``."""
        if size > self._minalign:
            self._minalign = size
        pad = (-(self._len + additional)) % size
        if pad:
            self._push(b"\x00" * pad)

    def _prepend_scalar(self, kind: str, value) -> None:
        fmt, size = SCALARS[kind]
        self._prep(size)
        self._push(struct.pack("<" + fmt, value))

    def _prepend_uoffset(self, target: int) -> None:
        self._prep(4)
        self._push(_U32.pack(self._len + 4 - target))

    # -- leaf objects (create BEFORE opening the enclosing table) ----------

    def create_string(self, s: str) -> int:
        data = s.encode("utf-8")
        self._push(b"\x00")  # NUL terminator (not counted in length)
        self._prep(4, len(data))  # length prefix 4-aligned after data lands
        self._push(data)
        self._push(_U32.pack(len(data)))
        return self._len

    def create_vector(self, kind: str, values) -> int:
        """Vector of scalars; ``values`` is any sequence (numpy fast-path)."""
        arr = np.asarray(values, dtype=_NP_DTYPE[kind])
        elem = arr.dtype.itemsize
        body = arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
        self._prep(4, len(body))  # length prefix aligned; elems follow
        self._prep(elem, len(body))
        self._push(body)
        self._push(_U32.pack(len(arr)))
        return self._len

    def create_offset_vector(self, offsets: list[int]) -> int:
        """Vector of uoffsets (tables/strings), given their end-offsets."""
        self._prep(4, 4 * len(offsets))
        for off in reversed(offsets):
            self._prepend_uoffset(off)
        self._push(_U32.pack(len(offsets)))
        return self._len

    # -- tables ------------------------------------------------------------

    def start_table(self) -> None:
        assert self._table_start_len is None, "nested start_table"
        self._table_start_len = self._len
        self._slots = {}

    def slot_scalar(self, idx: int, kind: str, value) -> None:
        self._prepend_scalar(kind, value)
        self._slots[idx] = self._len

    def slot_offset(self, idx: int, target: int | None) -> None:
        if target is None:
            return
        self._prepend_uoffset(target)
        self._slots[idx] = self._len

    def slot_struct(self, idx: int, packed: bytes, align: int) -> None:
        """Inline struct; ``packed`` must already contain interior padding."""
        self._prep(align, len(packed))
        self._push(packed)
        self._slots[idx] = self._len

    def end_table(self) -> int:
        assert self._table_start_len is not None, "end_table without start"
        n_slots = (max(self._slots) + 1) if self._slots else 0
        # soffset placeholder: vtable will sit immediately in front of it
        self._prep(4)
        vtable_bytes = 4 + 2 * n_slots
        self._push(_I32.pack(vtable_bytes))
        table_pos = self._len
        table_bytes = table_pos - self._table_start_len
        voffs = [self._slots.get(i, 0) for i in range(n_slots)]
        vt = bytearray(_U16.pack(vtable_bytes) + _U16.pack(table_bytes))
        for f in voffs:
            vt += _U16.pack(table_pos - f if f else 0)
        self._push(bytes(vt))
        self._table_start_len = None
        self._slots = None
        return table_pos

    def finish(self, root: int, file_identifier: str) -> bytes:
        ident = file_identifier.encode("ascii")
        assert len(ident) == 4
        self._minalign = max(self._minalign, 4)
        self._prep(self._minalign, 8)
        self._push(ident)
        self._prepend_uoffset(root)
        return b"".join(reversed(self._chunks))


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def identifier(buf: bytes) -> str:
    """4-byte file identifier at bytes 4..8 of every finished buffer."""
    return bytes(buf[4:8]).decode("ascii", errors="replace")


def root_pos(buf: bytes) -> int:
    return _U32.unpack_from(buf, 0)[0]


def _vtable(buf: bytes, tpos: int) -> tuple[int, int]:
    (soff,) = _I32.unpack_from(buf, tpos)
    vpos = tpos - soff
    (vsize,) = _U16.unpack_from(buf, vpos)
    return vpos, vsize


def field_pos(buf: bytes, tpos: int, idx: int) -> int | None:
    """Absolute position of field ``idx`` of the table at ``tpos``; None if
    the field is absent (reader then applies the schema default)."""
    vpos, vsize = _vtable(buf, tpos)
    slot = 4 + 2 * idx
    if slot + 2 > vsize:
        return None
    (off,) = _U16.unpack_from(buf, vpos + slot)
    return tpos + off if off else None


def read_scalar(buf: bytes, tpos: int, idx: int, kind: str, default=0):
    p = field_pos(buf, tpos, idx)
    if p is None:
        return default
    fmt, _ = SCALARS[kind]
    return struct.unpack_from("<" + fmt, buf, p)[0]


def read_offset(buf: bytes, tpos: int, idx: int) -> int | None:
    """Follow a uoffset field to the absolute position of its target."""
    p = field_pos(buf, tpos, idx)
    if p is None:
        return None
    return p + _U32.unpack_from(buf, p)[0]


def read_string(buf: bytes, tpos: int, idx: int) -> str | None:
    sp = read_offset(buf, tpos, idx)
    if sp is None:
        return None
    (n,) = _U32.unpack_from(buf, sp)
    return bytes(buf[sp + 4 : sp + 4 + n]).decode("utf-8")


def read_vector(buf: bytes, tpos: int, idx: int, kind: str) -> np.ndarray | None:
    vp = read_offset(buf, tpos, idx)
    if vp is None:
        return None
    (n,) = _U32.unpack_from(buf, vp)
    dt = np.dtype(_NP_DTYPE[kind]).newbyteorder("<")
    return np.frombuffer(buf, dtype=dt, count=n, offset=vp + 4)


def read_vector_at(buf: bytes, vp: int, kind: str) -> np.ndarray:
    (n,) = _U32.unpack_from(buf, vp)
    dt = np.dtype(_NP_DTYPE[kind]).newbyteorder("<")
    return np.frombuffer(buf, dtype=dt, count=n, offset=vp + 4)


def read_offset_vector(buf: bytes, tpos: int, idx: int) -> list[int]:
    """Positions of the tables/strings referenced by an offset vector."""
    vp = read_offset(buf, tpos, idx)
    if vp is None:
        return []
    (n,) = _U32.unpack_from(buf, vp)
    out = []
    for i in range(n):
        ep = vp + 4 + 4 * i
        out.append(ep + _U32.unpack_from(buf, ep)[0])
    return out
