"""ULEB128 varints and zigzag transforms.

Scalar varints are used only for headers/counts (a handful per column
chunk); bulk value transforms (zigzag) are vectorized numpy.
Semantics match the reference's ByteWriter varint/zigzag
(reference: src/bytewriter.js:120-175).
"""

from __future__ import annotations

import numpy as np


def write_uvarint(out: bytearray, v: int) -> None:
    if v < 0:
        raise ValueError("uvarint must be non-negative")
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def read_uvarint(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def uvarint_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value ULEB128 byte count for a uint64 array (0 -> 1 byte)."""
    from .bitpack import bit_widths

    bl = bit_widths(np.ascontiguousarray(values, dtype=np.uint64)).astype(np.int64)
    return np.maximum(1, (bl + 6) // 7)


def uvarint_scatter(values: np.ndarray, nb: np.ndarray, out: np.ndarray,
                    starts: np.ndarray) -> None:
    """Write each value's ULEB128 bytes into ``out`` at ``starts``
    (vectorized; byte-identical to :func:`write_uvarint` per value).
    ``nb`` is :func:`uvarint_lengths` of ``values``."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    for k in range(int(nb.max()) if len(nb) else 0):
        sel = nb > k
        byte = (v[sel] & np.uint64(0x7F)).astype(np.uint8)
        byte[nb[sel] > k + 1] |= np.uint8(0x80)
        out[starts[sel] + k] = byte
        v = v >> np.uint64(7)


def zigzag_int(v: int) -> int:
    """Scalar zigzag for header fields (64-bit domain)."""
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def unzigzag_int(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def zigzag(arr: np.ndarray) -> np.ndarray:
    """Vectorized zigzag: int64 array -> uint64 array."""
    v = np.ascontiguousarray(arr, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(arr: np.ndarray) -> np.ndarray:
    """Vectorized inverse zigzag: uint64 array -> int64 array."""
    u = np.ascontiguousarray(arr, dtype=np.uint64)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))
