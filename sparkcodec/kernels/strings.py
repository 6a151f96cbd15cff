"""Byte-array codecs: DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY, and
BYTE_STREAM_SPLIT for fixed-width values.

Semantics follow the reference:
  * DELTA_LENGTH_BYTE_ARRAY -- delta-pack the lengths, then the
    concatenated raw bytes (reference: src/delta.js:280-298).
  * DELTA_BYTE_ARRAY -- prefix compression: delta-packed prefix lengths,
    delta-packed suffix lengths, suffix bytes (reference:
    src/delta.js:307-364).  Prefix search is vectorized over a padded
    byte matrix instead of the reference's per-char loop.
  * BYTE_STREAM_SPLIT -- transpose value bytes (reference:
    src/splitstream.js:13-54).
"""

from __future__ import annotations

import numpy as np

from .delta import delta_binary_pack, delta_binary_unpack
from .varint import read_uvarint, write_uvarint

_PREFIX_CAP = 128  # max common-prefix bytes searched (valid: prefix may be sub-maximal)


def delta_length_encode(offsets: np.ndarray, data: np.ndarray) -> bytes:
    lengths = np.diff(offsets.astype(np.int64))
    out = bytearray()
    lb = delta_binary_pack(lengths)
    write_uvarint(out, len(lb))
    out.extend(lb)
    out.extend(np.ascontiguousarray(data, dtype="u1").tobytes())
    return bytes(out)


def delta_length_decode(buf) -> tuple[np.ndarray, np.ndarray]:
    mv = memoryview(buf)
    lb_len, pos = read_uvarint(mv, 0)
    lengths = delta_binary_unpack(mv[pos : pos + lb_len])
    pos += lb_len
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = np.frombuffer(mv[pos : pos + int(offsets[-1])], dtype="u1").copy()
    return offsets, data


def _common_prefix_lengths(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """prefix[i] = common prefix of value i with value i-1 (prefix[0] = 0)."""
    n = len(offsets) - 1
    prefix = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return prefix
    lengths = np.diff(offsets)
    cap = int(min(_PREFIX_CAP, lengths.max(initial=0)))
    if cap == 0:
        return prefix
    # padded matrix of the first `cap` bytes of every value
    padded = np.zeros((n, cap), dtype=np.int16)  # -1 pad never equals a byte
    padded[:] = -1
    gather = offsets[:-1, None] + np.arange(cap)
    valid = np.arange(cap)[None, :] < lengths[:, None]
    padded[valid] = data[np.minimum(gather, len(data) - 1)][valid]
    neq = padded[1:] != padded[:-1]
    # first mismatching byte position; all-equal rows -> full cap
    any_neq = neq.any(axis=1)
    first = np.where(any_neq, neq.argmax(axis=1), cap)
    maxp = np.minimum(lengths[1:], lengths[:-1])
    prefix[1:] = np.minimum(first, np.minimum(maxp, cap))
    return prefix


def delta_byte_array_encode(offsets: np.ndarray, data: np.ndarray) -> bytes:
    offsets = offsets.astype(np.int64)
    data = np.ascontiguousarray(data, dtype="u1")
    n = len(offsets) - 1
    prefix = _common_prefix_lengths(offsets, data)
    lengths = np.diff(offsets)
    suffix_len = lengths - prefix
    # gather suffix bytes vectorized: mask out the first prefix[i] bytes of each value
    starts = offsets[:-1] + prefix
    keep = np.zeros(len(data) + 1, dtype=np.int8)
    np.add.at(keep, starts, 1)
    np.add.at(keep, offsets[1:], -1)
    mask = np.cumsum(keep[:-1]) > 0
    suffix_data = data[mask]
    out = bytearray()
    pb = delta_binary_pack(prefix)
    sb = delta_binary_pack(suffix_len)
    write_uvarint(out, len(pb))
    out.extend(pb)
    write_uvarint(out, len(sb))
    out.extend(sb)
    out.extend(suffix_data.tobytes())
    return bytes(out)


def delta_byte_array_decode(buf) -> tuple[np.ndarray, np.ndarray]:
    mv = memoryview(buf)
    pb_len, pos = read_uvarint(mv, 0)
    prefix = delta_binary_unpack(mv[pos : pos + pb_len])
    pos += pb_len
    sb_len, pos2 = read_uvarint(mv, pos)
    suffix_len = delta_binary_unpack(mv[pos2 : pos2 + sb_len])
    pos = pos2 + sb_len
    n = len(prefix)
    lengths = prefix + suffix_len
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    suffix = np.frombuffer(mv[pos:], dtype="u1")
    data = np.empty(int(offsets[-1]), dtype="u1")
    si = 0
    # prefix copy is inherently sequential (value i depends on i-1)
    for i in range(n):
        o = offsets[i]
        p = int(prefix[i])
        s = int(suffix_len[i])
        if p:
            data[o : o + p] = data[offsets[i - 1] : offsets[i - 1] + p]
        data[o + p : o + p + s] = suffix[si : si + s]
        si += s
    return offsets, data


def byte_stream_split_encode(values: np.ndarray, width: int) -> bytes:
    v = np.ascontiguousarray(values)
    return v.view("u1").reshape(-1, width).T.copy().tobytes()


def byte_stream_split_decode(buf, width: int, n: int, dtype: str) -> np.ndarray:
    raw = np.frombuffer(buf, dtype="u1").reshape(width, n).T.copy()
    return raw.reshape(-1).view(dtype).copy()
