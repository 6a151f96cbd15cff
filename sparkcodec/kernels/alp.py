"""ALP: adaptive lossless floating-point compression.

Public-literature codec (Afroozeh & Boncz, "ALP: Adaptive Lossless
floating-Point Compression", SIGMOD/VLDB 2023; same family as Chimp and
Gorilla but integer-domain).  Two modes, chosen per chunk from an exact
probe of the sample:

* **decimal** (mode 0): most real-world doubles are decimals with a few
  significant digits (prices, ratios, sensor readings).  Pick the
  (exponent ``e``, factor ``f``) pair that maximizes the number of values
  for which ``round(v * 10^e / 10^f)`` reconstructs BITWISE via
  ``d * 10^f / 10^e``; store the ints PFOR-packed
  (:func:`sparkcodec.kernels.pfor.pfor_pack` -- outlier ints patch
  instead of widening the chunk) and the non-reconstructing values as
  (position, raw-bit-pattern) exception side lists.
* **ALP-RD** ("real doubles", mode 1): when decimals don't fit (true
  reals, embeddings), cut each value's bit pattern at a learned position:
  the LEFT (sign + exponent + top mantissa) bits are low-cardinality and
  dictionary-encode in <=3 bits; the RIGHT bits are stored verbatim.
  Values whose left bits miss the <=8-entry dictionary patch through a
  side list.  Lossless by construction -- the bits are merely re-grouped.

The reference writer has no float codec at all beyond PLAIN +
BYTE_STREAM_SPLIT (reference: src/column.js encodings list); ALP is the
scale-path float codec for the embeddings/price columns the mandate's
tables carry.

wire format (little-endian / LSB-first):

  u8 mode | u8 itemsize (4|8) | uvarint n
  mode 0: zigzag-uvarint e-f combined?  no --
          u8 e | u8 f | uvarint n_exc
          [ packed exc positions (pos_bw u8 first) | raw exc patterns ]
          pfor block of the scaled ints
  mode 1: u8 right_bw | u8 dict_size | dict entries (left patterns,
          uvarint each) | uvarint n_exc
          [ u8 pos_bw | packed exc positions | uvarint exc left values ]
          packed dict indexes (idx_bw = bits(dict_size-1))
          packed right bits (n x right_bw)
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_widths, pack_bits_lsb, unpack_bits_lsb
from .pfor import pfor_pack, pfor_unpack
from .varint import read_uvarint, write_uvarint

_MAX_EXP = 18          # 10^18 still exact in int64
_SAFE_INT = float(1 << 51)  # |scaled| bound: exactly representable in f64
_RD_MAX_DICT = 8       # paper: left-parts dictionary capped at 8 entries
_F10 = 10.0 ** np.arange(_MAX_EXP + 1)
_IF10 = 10.0 ** -np.arange(_MAX_EXP + 1)


def _decimal_fit(v: np.ndarray, e: int, f: int) -> np.ndarray:
    """Boolean mask of values that reconstruct bitwise under (e, f).

    The arithmetic is forced to float64 so the verification EXACTLY
    mirrors the decoder (int64 d promotes to f64 there); with float32
    inputs, value-based casting would otherwise verify in f32 and admit
    values whose f64 reconstruction rounds to a different f32 (found by
    hypothesis on 2**-14)."""
    v64 = v.astype(np.float64, copy=False)
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = v64 * _F10[e] * _IF10[f]
        d = np.round(scaled)
        ok = (np.abs(d) < _SAFE_INT) & np.isfinite(scaled)
        # reconstruct through the INT64 cast the storage applies: float d
        # would carry -0.0 through the check while the stored int cannot
        di = np.where(ok, d, 0.0).astype(np.int64)
        rec = di * _F10[f] * _IF10[e]
    # bitwise equality (handles -0.0 vs 0.0 and NaN correctly: NaN never
    # reconstructs, so it always lands in the exception list)
    return ok & (rec.astype(v.dtype, copy=False).view(_bits_dtype(v))
                 == v.view(_bits_dtype(v)))


def _bits_dtype(v: np.ndarray):
    return np.uint64 if v.dtype.itemsize == 8 else np.uint32


def choose_decimal_params(sample: np.ndarray) -> tuple[int, int, float, float]:
    """Best (e, f) on the sample, scored by estimated SIZE like the paper
    (not hit ratio alone: a pair with marginally more exact hits can cost
    3x the bits if its scaled ints are wide).  Score = exact PFOR probe of
    the scaled ints + per-miss exception cost.  Returns
    (e, f, hit_ratio, est_bits_per_value)."""
    from .pfor import pfor_bits_per_value

    n = len(sample)
    if n == 0:
        return 0, 0, 0.0, np.inf
    width = sample.dtype.itemsize * 8
    best = (0, 0, 0.0, np.inf)
    for e in range(_MAX_EXP + 1):
        # f <= e; larger f divides magnitude back down (trailing zeros)
        for f in range(e + 1):
            fit = _decimal_fit(sample, e, f)
            hits = int(fit.sum())
            if hits == 0:
                continue
            # exception cost alone lower-bounds the score: skip the PFOR
            # probe for pairs that cannot beat the incumbent
            if (n - hits) * (16 + width) / n >= best[3] - 1e-12:
                continue
            d = np.round(sample[fit].astype(np.float64, copy=False)
                         * _F10[e] * _IF10[f]).astype(np.int64)
            bits = (pfor_bits_per_value(d) * hits
                    + (n - hits) * (16 + width)) / n
            if bits < best[3] - 1e-12:
                best = (e, f, hits / n, bits)
    return best


def choose_rd_cut(bits: np.ndarray, width: int) -> tuple[int, float]:
    """Best right-part width for ALP-RD on the sampled bit patterns:
    minimize  right_bw + idx_bits + exception cost  per value.  Returns
    (right_bw, est_bits_per_value)."""
    n = len(bits)
    best_bw, best_cost = width - 1, np.inf
    for left_bw in range(1, 17):
        right_bw = width - left_bw
        left = (bits >> np.uint64(right_bw)).astype(np.uint64)
        uniq, counts = np.unique(left, return_counts=True)
        order = np.argsort(counts)[::-1]
        in_dict = counts[order[:_RD_MAX_DICT]].sum()
        n_exc = n - int(in_dict)
        dict_size = min(len(uniq), _RD_MAX_DICT)
        idx_bits = max(1, int(dict_size - 1).bit_length())
        cost = right_bw + idx_bits + n_exc / n * (16 + left_bw)
        if cost < best_cost:
            best_bw, best_cost = right_bw, cost
    return best_bw, best_cost


def alp_bits_per_value(values: np.ndarray) -> float:
    """Exact-probe cost (payload bits/value) for the auto-selector."""
    v = np.ascontiguousarray(values)
    n = len(v)
    if n == 0 or v.dtype.kind != "f" or v.dtype.itemsize == 2:
        return 1e9
    width = v.dtype.itemsize * 8
    _, _, _, dec_bits = choose_decimal_params(v)
    bits = v.view(_bits_dtype(v)).astype(np.uint64)
    _, rd_cost = choose_rd_cut(bits, width)
    return min(dec_bits, rd_cost)


def alp_encode(values: np.ndarray, sample_n: int = 1024) -> bytes:
    v = np.ascontiguousarray(values)
    if v.dtype.kind != "f" or v.dtype.itemsize not in (4, 8):
        raise ValueError(f"ALP requires float32/float64, got {v.dtype}")
    n = len(v)
    width = v.dtype.itemsize * 8
    out = bytearray()
    sample = v[:sample_n]
    e, f, ratio, dec_bits = choose_decimal_params(sample)
    all_bits = v.view(_bits_dtype(v)).astype(np.uint64)
    rd_bw, rd_cost = choose_rd_cut(all_bits[:sample_n], width) if n \
        else (width - 1, np.inf)
    if n and dec_bits < rd_cost:
        fit = _decimal_fit(v, e, f)
        n_exc = n - int(fit.sum())
        # sample said decimal; if the full chunk disagrees wildly (heavy
        # realized exception rate), fall through to ALP-RD instead
        if n_exc <= max(1, n // 4):
            out.append(0)
            out.append(v.dtype.itemsize)
            write_uvarint(out, n)
            out.append(e)
            out.append(f)
            d = np.zeros(n, dtype=np.int64)
            # f64 like the fit check and the decoder (f32 inputs included)
            d[fit] = np.round(v[fit].astype(np.float64, copy=False)
                              * _F10[e] * _IF10[f]).astype(np.int64)
            exc_idx = np.flatnonzero(~fit)
            write_uvarint(out, len(exc_idx))
            if len(exc_idx):
                pos_bw = max(1, int(bit_widths(
                    np.array([exc_idx[-1]], dtype=np.uint64))[0]))
                out.append(pos_bw)
                out.extend(pack_bits_lsb(exc_idx.astype(np.uint64), pos_bw))
                out.extend(v[exc_idx].tobytes())
                # exception slots carry the fill value so they never widen
                # the PFOR frame
                d[exc_idx] = int(d[fit].min()) if fit.any() else 0
            out.extend(pfor_pack(d))
            return bytes(out)
    # ALP-RD
    out.append(1)
    out.append(v.dtype.itemsize)
    write_uvarint(out, n)
    bits = all_bits
    right_bw = rd_bw  # cut already searched for the mode decision above
    left = (bits >> np.uint64(right_bw)).astype(np.uint64)
    right_mask = np.uint64((1 << right_bw) - 1)
    uniq, counts = np.unique(left, return_counts=True)
    order = np.argsort(counts, kind="stable")[::-1][:_RD_MAX_DICT]
    dict_vals = np.sort(uniq[order])  # canonical order: deterministic
    out.append(right_bw)
    out.append(len(dict_vals))
    for dv in dict_vals:
        write_uvarint(out, int(dv))
    pos_in_dict = np.searchsorted(dict_vals, left)
    pos_in_dict = np.minimum(pos_in_dict, len(dict_vals) - 1) if len(dict_vals) \
        else np.zeros(n, dtype=np.int64)
    hit = len(dict_vals) > 0
    in_dict = dict_vals[pos_in_dict] == left if hit else np.zeros(n, bool)
    exc_idx = np.flatnonzero(~in_dict)
    write_uvarint(out, len(exc_idx))
    if len(exc_idx):
        pos_bw = max(1, int(bit_widths(
            np.array([exc_idx[-1]], dtype=np.uint64))[0]))
        out.append(pos_bw)
        out.extend(pack_bits_lsb(exc_idx.astype(np.uint64), pos_bw))
        for lv in left[exc_idx]:
            write_uvarint(out, int(lv))
        pos_in_dict[exc_idx] = 0  # placeholder index, patched on decode
    idx_bw = max(1, int(max(0, len(dict_vals) - 1)).bit_length()) \
        if len(dict_vals) else 1
    out.extend(pack_bits_lsb(pos_in_dict.astype(np.uint64), idx_bw))
    out.extend(pack_bits_lsb(bits & right_mask, right_bw))
    return bytes(out)


def alp_decode(buf) -> np.ndarray:
    mv = memoryview(buf)
    mode = mv[0]
    itemsize = mv[1]
    dtype = np.float64 if itemsize == 8 else np.float32
    bdt = np.uint64 if itemsize == 8 else np.uint32
    width = itemsize * 8
    n, pos = read_uvarint(mv, 2)
    if n == 0:
        return np.empty(0, dtype=dtype)
    if mode == 0:
        e = mv[pos]
        f = mv[pos + 1]
        pos += 2
        n_exc, pos = read_uvarint(mv, pos)
        exc_idx = exc_raw = None
        if n_exc:
            pos_bw = mv[pos]
            pos += 1
            plen = (n_exc * pos_bw + 7) // 8
            exc_idx = unpack_bits_lsb(mv[pos : pos + plen], pos_bw, n_exc)
            pos += plen
            exc_raw = np.frombuffer(mv[pos : pos + n_exc * itemsize], dtype=dtype)
            pos += n_exc * itemsize
            if int(exc_idx.max()) >= n:
                raise ValueError("corrupt ALP chunk: exception position out of range")
        d = pfor_unpack(mv[pos:])
        with np.errstate(over="ignore", invalid="ignore"):
            out = (d * _F10[f] * _IF10[e]).astype(dtype)
        if n_exc:
            out[exc_idx] = exc_raw
        return out
    if mode != 1:
        raise ValueError(f"corrupt ALP chunk: mode {mode}")
    right_bw = mv[pos]
    dict_size = mv[pos + 1]
    pos += 2
    dict_vals = np.empty(dict_size, dtype=np.uint64)
    for i in range(dict_size):
        dv, pos = read_uvarint(mv, pos)
        dict_vals[i] = dv
    n_exc, pos = read_uvarint(mv, pos)
    exc_idx = None
    exc_left = None
    if n_exc:
        pos_bw = mv[pos]
        pos += 1
        plen = (n_exc * pos_bw + 7) // 8
        exc_idx = unpack_bits_lsb(mv[pos : pos + plen], pos_bw, n_exc)
        pos += plen
        exc_left = np.empty(n_exc, dtype=np.uint64)
        for i in range(n_exc):
            lv, pos = read_uvarint(mv, pos)
            exc_left[i] = lv
        if int(exc_idx.max()) >= n:
            raise ValueError("corrupt ALP chunk: exception position out of range")
    idx_bw = max(1, int(max(0, dict_size - 1)).bit_length()) if dict_size else 1
    ilen = (n * idx_bw + 7) // 8
    idx = unpack_bits_lsb(mv[pos : pos + ilen], idx_bw, n)
    pos += ilen
    rlen = (n * right_bw + 7) // 8
    right = unpack_bits_lsb(mv[pos : pos + rlen], right_bw, n)
    if dict_size:
        if int(idx.max()) >= dict_size:
            raise ValueError("corrupt ALP chunk: dict index out of range")
        left = dict_vals[idx]
    else:
        left = np.zeros(n, dtype=np.uint64)
    if n_exc:
        left = left.copy()
        left[exc_idx] = exc_left
    bits = (left << np.uint64(right_bw)) | right
    if itemsize == 4:
        return bits.astype(np.uint32).view(np.float32)
    return bits.view(np.float64)
