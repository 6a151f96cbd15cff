"""RLE / bit-packed hybrid codec (parquet spec compatible).

Same stream grammar as the reference encoder (reference:
src/encoding.js:12-106): a sequence of runs, each either

  * RLE run:        varint(count << 1), value in ceil(bw/8) LE bytes
  * bit-packed run: varint(groups << 1 | 1), groups*8 values LSB-first packed

The reference emits an RLE run for >=8 consecutive equal values and
bit-packs groups of 8 otherwise; we reproduce that decision rule but
detect runs vectorized (np.diff) instead of scanning value-by-value.
Mid-stream bit-packed spans must contain an exact multiple of 8 real
values, so spans borrow up to 7 leading values from the following RLE
run (the borrowed values equal the run value, so the stream decodes
identically); only the final span is zero-padded.
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack_bits_lsb, unpack_bits_lsb
from .varint import read_uvarint, write_uvarint

RLE_MIN_RUN = 8  # reference: src/encoding.js:22-25


def rle_hybrid_encode(values: np.ndarray, bw: int) -> bytes:
    """Encode non-negative ints (< 2**bw) as an RLE/bit-packed hybrid stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    out = bytearray()
    if n == 0:
        return bytes(out)
    vbytes = (bw + 7) // 8

    def emit_bitpack(lo: int, hi: int) -> None:
        count = hi - lo
        if count == 0:
            return
        groups = (count + 7) // 8
        seg = v[lo:hi]
        if count % 8:
            seg = np.concatenate([seg, np.zeros(groups * 8 - count, np.uint64)])
        write_uvarint(out, (groups << 1) | 1)
        out.extend(pack_bits_lsb(seg, bw))

    def emit_rle(val: int, count: int) -> None:
        write_uvarint(out, count << 1)
        out.extend(int(val).to_bytes(vbytes, "little"))

    boundaries = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [n]))
    lens = ends - starts
    long_idx = np.flatnonzero(lens >= RLE_MIN_RUN)

    pend = 0
    for ri in long_idx:
        s = int(starts[ri])
        l = int(lens[ri])
        gap = s - pend
        k = (-gap) % 8  # values borrowed from the run to 8-align the span
        if l - k < RLE_MIN_RUN:
            continue  # run too short after borrowing; fold into bit-packed span
        emit_bitpack(pend, s + k)
        emit_rle(int(v[s]), l - k)
        pend = int(ends[ri])
    emit_bitpack(pend, n)
    return bytes(out)


def rle_hybrid_decode(buf, bw: int, n: int) -> np.ndarray:
    """Decode n values from an RLE/bit-packed hybrid stream -> uint64 array."""
    out = np.empty(n, dtype=np.uint64)
    mv = memoryview(buf)
    vbytes = (bw + 7) // 8
    pos = 0
    i = 0
    while i < n:
        header, pos = read_uvarint(mv, pos)
        if header & 1:
            groups = header >> 1
            count = groups * 8
            nbytes = groups * bw
            vals = unpack_bits_lsb(mv[pos : pos + nbytes], bw, count)
            take = min(count, n - i)
            out[i : i + take] = vals[:take]
            i += take
            pos += nbytes
        else:
            count = header >> 1
            val = int.from_bytes(mv[pos : pos + vbytes], "little")
            pos += vbytes
            out[i : i + count] = val
            i += count
    return out
