"""LSB-first bit-packing kernels (vectorized numpy).

Semantics match the parquet bit-packed layout used by the reference's
RLE/bit-packed hybrid encoder (reference: src/encoding.js:78-106): value i
occupies bits [i*bw, (i+1)*bw) of the output stream, least-significant bit
first within each byte.  Everything here operates on whole numpy arrays --
no per-value Python.
"""

from __future__ import annotations

import numpy as np

_POWERS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def bit_width(max_value: int) -> int:
    """Number of bits needed to represent ``max_value`` (0 -> 0 bits)."""
    return int(max_value).bit_length()


def bit_widths(arr: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for a uint64 array."""
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    return np.searchsorted(_POWERS, a, side="right").astype(np.uint8)


def pack_bits_lsb(values: np.ndarray, bw: int) -> bytes:
    """Pack non-negative ints (< 2**bw each) into an LSB-first bitstream.

    len(values)*bw bits, zero-padded up to a byte boundary.
    """
    n = len(values)
    if bw == 0 or n == 0:
        return b""
    if bw < 0 or bw > 64:
        raise ValueError(f"bit width out of range: {bw}")
    # byte-aligned widths: a dtype cast IS the bit-packing (single pass --
    # this is the hot path for token ids, which FOR-shift into 16 bits)
    if bw == 8:
        return np.ascontiguousarray(values, dtype="<u8").astype("u1").tobytes()
    if bw == 16:
        return np.ascontiguousarray(values, dtype="<u8").astype("<u2").tobytes()
    if bw == 32:
        return np.ascontiguousarray(values, dtype="<u8").astype("<u4").tobytes()
    if bw == 64:
        return np.ascontiguousarray(values, dtype="<u8").tobytes()
    v = np.ascontiguousarray(values, dtype="<u8").view("u1").reshape(n, 8)
    # count=bw keeps the bit matrix at n*bw instead of n*64
    bits = np.unpackbits(v, axis=1, bitorder="little", count=bw)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits_lsb(buf: bytes | memoryview | np.ndarray, bw: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits_lsb`; returns uint64 array of length n."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if bw == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype="u1")
    need = n * bw
    nbytes = (need + 7) // 8
    if raw.size < nbytes:
        raise ValueError(f"buffer too short: need {nbytes} bytes, have {raw.size}")
    if bw == 8:
        return raw[:n].astype(np.uint64)
    if bw == 16:
        return raw[: 2 * n].view("<u2").astype(np.uint64)
    if bw == 32:
        return raw[: 4 * n].view("<u4").astype(np.uint64)
    if bw == 64:
        return raw[: 8 * n].view("<u8").astype(np.uint64)
    bits = np.unpackbits(raw[:nbytes], bitorder="little")[:need].reshape(n, bw)
    # per-row packbits gives the low ceil(bw/8) bytes of each value
    packed = np.packbits(bits, axis=1, bitorder="little")
    out = np.zeros((n, 8), dtype="u1")
    out[:, : packed.shape[1]] = packed
    return np.ascontiguousarray(out).view("<u8").ravel()
