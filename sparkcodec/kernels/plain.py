"""PLAIN codec: raw little-endian values (parquet spec semantics).

Mirrors the reference's PLAIN encoder (reference: src/plain.js:10-135):
ints/floats as raw LE bytes, booleans bit-packed LSB-first, BYTE_ARRAY as
u32 length prefix + bytes.  Byte-array columns are converted through
pyarrow so the offsets/data buffers are obtained without per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NUMERIC_DTYPES = {
    "int32": "<i4",
    "int64": "<i8",
    "float32": "<f4",
    "float64": "<f8",
}


def plain_encode_numeric(values: np.ndarray, dtype: str) -> bytes:
    return np.ascontiguousarray(values, dtype=_NUMERIC_DTYPES[dtype]).tobytes()


def plain_decode_numeric(buf, dtype: str) -> np.ndarray:
    return np.frombuffer(buf, dtype=_NUMERIC_DTYPES[dtype]).copy()


def plain_encode_bool(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=bool)
    return np.packbits(v, bitorder="little").tobytes()


def plain_decode_bool(buf, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype="u1"), bitorder="little")
    return bits[:n].astype(bool)


def binary_buffers(values) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], data uint8[*]) for a string/bytes column.

    Accepts a pyarrow Array, pandas Series, numpy object array, or list.
    """
    if isinstance(values, pa.Array):
        arr = values
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.large_binary())
        elif pa.types.is_binary(arr.type):
            arr = arr.cast(pa.large_binary())
    else:
        seq = list(values) if not hasattr(values, "__array__") else values
        try:
            arr = pa.array(seq, type=pa.large_binary())
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            arr = pa.array([s.encode() if isinstance(s, str) else s for s in seq],
                           type=pa.large_binary())
    if arr.null_count:
        raise ValueError("binary_buffers expects null-free input")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype="<i8", count=len(arr) + 1, offset=arr.offset * 8)
    data_buf = bufs[2]
    data = (np.frombuffer(data_buf, dtype="u1") if data_buf is not None
            else np.zeros(0, dtype="u1"))
    lo, hi = int(offsets[0]), int(offsets[-1])
    return offsets - lo, data[lo:hi]


def plain_encode_binary(values) -> bytes:
    offsets, data = binary_buffers(values)
    lengths = np.diff(offsets).astype("<u4")
    n = len(lengths)
    total = 4 * n + int(data.size)
    out = np.empty(total, dtype="u1")
    # interleave u32 length prefixes with value bytes, vectorized scatter
    starts = np.arange(n, dtype=np.int64) * 4 + offsets[:-1]
    len_bytes = lengths.view("u1").reshape(n, 4)
    idx = (starts[:, None] + np.arange(4)).reshape(-1)
    out[idx] = len_bytes.reshape(-1)
    if data.size:
        mask = np.ones(total, dtype=bool)
        mask[idx] = False
        out[mask] = data
    return out.tobytes()


def plain_decode_binary(buf, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode u32-length-prefixed byte arrays -> (offsets int64[n+1], data u8)."""
    raw = np.frombuffer(buf, dtype="u1")
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    pieces = []
    pos = 0
    # lengths are data-dependent; walk prefixes with numpy slicing per value
    lengths = np.empty(n, dtype=np.int64)
    for i in range(n):
        ln = int(raw[pos : pos + 4].view("<u4")[0])
        lengths[i] = ln
        pos += 4 + ln
    offsets[1:] = np.cumsum(lengths)
    data = np.empty(offsets[-1], dtype="u1")
    pos = 0
    di = 0
    for i in range(n):
        ln = int(lengths[i])
        pos += 4
        data[di : di + ln] = raw[pos : pos + ln]
        pos += ln
        di += ln
    return offsets, data


def arrow_binary_from_buffers(offsets: np.ndarray, data: np.ndarray, as_string: bool) -> pa.Array:
    off = pa.py_buffer(np.ascontiguousarray(offsets, dtype="<i8").tobytes())
    dat = pa.py_buffer(np.ascontiguousarray(data, dtype="u1").tobytes())
    typ = pa.large_string() if as_string else pa.large_binary()
    return pa.Array.from_buffers(typ, len(offsets) - 1, [None, off, dat])
