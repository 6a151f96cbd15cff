"""PFOR: patched frame-of-reference bit-packing for integer chunks.

Public-literature codec (Zukowski, Heman, Nes, Boncz: "Super-Scalar
RAM-CPU Cache Compression", ICDE 2006; Lemire & Boytsov: "Decoding
billions of integers per second through vectorization", 2014).  Plain FOR
(:func:`sparkcodec.kernels.delta.for_pack`) packs EVERY value at the
width of the chunk maximum, so one outlier -- a rare huge token id, a
stray sentinel -- forces the whole chunk wide.  PFOR picks the
cost-optimal base width ``b``, packs every value's low ``b`` bits, and
patches the few exceptions' HIGH bits through (position, high-bits) side
lists.  The width choice is EXACT, not sampled: a histogram of per-value
bit widths prices all <=65 candidate widths and the argmin wins, so the
encoded size is never worse than FOR's beyond the few header bytes.

The reference writer has no patched codec (its closest is the per-block
width adaptation of DELTA_BINARY_PACKED, src/delta.js); this is the
scale-path codec the north rule's "frame-of-reference + bit-packing for
int32 token streams" calls for when the stream is skewed.

wire format (everything little-endian / LSB-first):

    uvarint n | zigzag-uvarint ref | u8 b | uvarint n_exc
    [ u8 pos_bw | u8 high_bw
      | packed exception positions (n_exc x pos_bw bits)
      | packed exception high bits (n_exc x high_bw bits) ]   iff n_exc>0
    packed low bits (n x b bits)
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_widths, pack_bits_lsb, unpack_bits_lsb
from .varint import (
    read_uvarint,
    unzigzag,
    unzigzag_int,
    write_uvarint,
    zigzag,
    zigzag_int,
)

_SIDE_HEADER_BITS = 16  # u8 pos_bw + u8 high_bw, charged iff exceptions exist


def choose_base_width(widths: np.ndarray, n: int) -> int:
    """Cost-optimal PFOR base width for a chunk whose per-value bit widths
    are ``widths``: minimizes  n*b + n_exc(b) * (pos_bw + (maxw - b))
    (+ side header) over b in [0, maxw]; ties break toward the LARGER
    width (fewer exceptions)."""
    maxw = int(widths.max()) if len(widths) else 0
    hist = np.bincount(widths.astype(np.int64), minlength=maxw + 2)
    # suffix[k] = count(width >= k)
    suffix = np.concatenate([np.cumsum(hist[::-1])[::-1], [0]])
    pos_bw = max(1, int(n - 1).bit_length()) if n > 1 else 1
    best_b, best_cost = maxw, None
    for b in range(maxw + 1):
        n_exc = int(suffix[b + 1])
        cost = n * b + n_exc * (pos_bw + (maxw - b))
        if n_exc:
            cost += _SIDE_HEADER_BITS
        if best_cost is None or cost < best_cost or \
                (cost == best_cost and b > best_b):
            best_b, best_cost = b, cost
    return best_b


def pfor_bits_per_value(values_i64: np.ndarray) -> float:
    """Exact PFOR payload bits/value for the given sample -- the cost-model
    probe used by the codec auto-selector."""
    v = np.ascontiguousarray(values_i64, dtype=np.int64)
    n = len(v)
    if n == 0:
        return 64.0
    with np.errstate(over="ignore"):
        adjusted = (v - int(v.min())).view(np.uint64)
    widths = bit_widths(adjusted)
    maxw = int(widths.max())
    b = choose_base_width(widths, n)
    n_exc = int(np.count_nonzero(widths > b))
    pos_bw = max(1, int(n - 1).bit_length()) if n > 1 else 1
    bits = n * b + n_exc * (pos_bw + (maxw - b)) + (_SIDE_HEADER_BITS if n_exc else 0)
    return bits / n


def pfor_pack(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    out = bytearray()
    write_uvarint(out, n)
    if n == 0:
        return bytes(out)
    ref = int(v.min())
    with np.errstate(over="ignore"):
        adjusted = (v - ref).view(np.uint64)
    widths = bit_widths(adjusted)
    b = choose_base_width(widths, n)
    write_uvarint(out, zigzag_int(ref))
    out.append(b)
    exc_idx = np.flatnonzero(widths > b)
    write_uvarint(out, len(exc_idx))
    if len(exc_idx):
        highs = adjusted[exc_idx] >> np.uint64(b)
        pos_bw = max(1, int(bit_widths(
            np.array([exc_idx[-1]], dtype=np.uint64))[0]))
        high_bw = max(1, int(bit_widths(
            np.array([highs.max()], dtype=np.uint64))[0]))
        out.append(pos_bw)
        out.append(high_bw)
        out.extend(pack_bits_lsb(exc_idx.astype(np.uint64), pos_bw))
        out.extend(pack_bits_lsb(highs, high_bw))
    if b:
        mask = np.uint64((1 << b) - 1) if b < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
        out.extend(pack_bits_lsb(adjusted & mask, b))
    return bytes(out)


def pfor_unpack(buf) -> np.ndarray:
    mv = memoryview(buf)
    n, pos = read_uvarint(mv, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    zz_ref, pos = read_uvarint(mv, pos)
    ref = unzigzag_int(zz_ref)
    b = mv[pos]
    pos += 1
    n_exc, pos = read_uvarint(mv, pos)
    exc_idx = highs = None
    if n_exc:
        pos_bw = mv[pos]
        high_bw = mv[pos + 1]
        pos += 2
        plen = (n_exc * pos_bw + 7) // 8
        exc_idx = unpack_bits_lsb(mv[pos : pos + plen], pos_bw, n_exc)
        pos += plen
        hlen = (n_exc * high_bw + 7) // 8
        highs = unpack_bits_lsb(mv[pos : pos + hlen], high_bw, n_exc)
        pos += hlen
        if len(exc_idx) and int(exc_idx.max()) >= n:
            raise ValueError(
                f"corrupt PFOR chunk: exception position {int(exc_idx.max())} "
                f">= n {n}")
    adjusted = unpack_bits_lsb(mv[pos:], b, n) if b else \
        np.zeros(n, dtype=np.uint64)
    if n_exc:
        adjusted = adjusted.copy() if b else adjusted
        adjusted[exc_idx] |= highs << np.uint64(b)
    with np.errstate(over="ignore"):
        return (adjusted.view(np.int64) + ref).astype(np.int64)


def delta_pfor_pack(values: np.ndarray) -> bytes:
    """Delta then PFOR over the zigzag deltas: the outlier-tolerant cousin
    of :func:`sparkcodec.kernels.delta.delta_for_pack` -- a near-monotonic
    stream (list offsets, sorted ids) with a handful of huge jumps packs
    at the width of the TYPICAL step, patching only the jumps."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    out = bytearray()
    write_uvarint(out, n)
    if n == 0:
        return bytes(out)
    write_uvarint(out, zigzag_int(int(v[0])))
    if n == 1:
        return bytes(out)
    with np.errstate(over="ignore"):
        zz = zigzag(v[1:] - v[:-1])
    # pfor_pack's (v - min) adjustment is two's-complement wraparound-safe,
    # so the uint64 zigzag values round-trip through the int64 view
    out.extend(pfor_pack(zz.view(np.int64)))
    return bytes(out)


def delta_pfor_unpack(buf) -> np.ndarray:
    mv = memoryview(buf)
    n, pos = read_uvarint(mv, 0)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    zz_first, pos = read_uvarint(mv, pos)
    out[0] = unzigzag_int(zz_first)
    if n == 1:
        return out
    deltas = unzigzag(pfor_unpack(mv[pos:]).view(np.uint64))
    with np.errstate(over="ignore"):
        out[1:] = out[0] + np.cumsum(deltas, dtype=np.int64)
    return out
