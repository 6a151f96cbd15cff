"""Self-describing column-chunk format: header + null bitmap + optional
dictionary block + encoded payload, plus footer-style metadata.

Plays the role of the reference's column-chunk writer + DataPageV2 framing
(reference: src/column.js:22-199, src/datapage.js:17-101): per chunk we
compute statistics, make the codec decision, strip nulls (definition
levels at bit width 1, like the reference's flat OPTIONAL fast path,
src/dremel.js:32-37), encode, and return (payload bytes, metadata).

Wire layout (all little-endian):

    magic 'SCK1' | u8 version | u8 type_tag | u8 codec_tag | u8 comp_tag
    | [u8 precision + u8 scale   -- iff type_tag DECIMAL/DECIMAL_WIDE]
    | [u8 byte_width             -- iff type_tag FIXED]
    | uvarint n_logical | uvarint null_count
    | [uvarint len + validity RLE stream         -- iff 0 < null_count < n]
    | [uvarint len + u8 comp + dictionary block  -- iff codec == DICT]
    | payload (to end; compressed iff comp_tag != 0)

Timestamps are stored at us/ns granularity WITHOUT timezone: the chunk
alone decodes to a tz-naive timestamp (the engine layer restores the
original unit/tz from schema_json; direct encode_array/decode_array
users must track tz themselves).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import selector as S
from .kernels.bitpack import bit_widths
from .kernels.delta import (
    delta_binary_pack,
    delta_binary_unpack,
    delta_for_pack,
    delta_for_unpack,
    for_pack,
    for_unpack,
)
from .kernels.dictionary import dict_indexes_decode, dict_indexes_encode, factorize
from .kernels.alp import alp_decode, alp_encode
from .kernels.pfor import (
    delta_pfor_pack,
    delta_pfor_unpack,
    pfor_pack,
    pfor_unpack,
)
from .kernels.plain import (
    arrow_binary_from_buffers,
    binary_buffers,
    plain_decode_binary,
    plain_decode_bool,
    plain_decode_numeric,
    plain_encode_binary,
    plain_encode_bool,
    plain_encode_numeric,
)
from .kernels.rle import rle_hybrid_decode, rle_hybrid_encode
from .kernels.strings import (
    byte_stream_split_decode,
    byte_stream_split_encode,
    delta_byte_array_decode,
    delta_byte_array_encode,
    delta_length_decode,
    delta_length_encode,
)
from .kernels.varint import read_uvarint, unzigzag_int, write_uvarint, zigzag_int
from .stats import ChunkStats, binary_stats, numeric_stats

MAGIC = b"SCK1"
VERSION = 1

# general-purpose compressor stage applied after the lightweight codec,
# mirroring the reference's pluggable Compressors map with a built-in
# default (reference: src/parquet-writer.js:35, src/snappy.js).  The
# default is pyarrow's native zstd (level 1) -- C++ speed, ~3.4x faster
# than Python zlib-1 at a better ratio; zlib stays registered for decode
# compat and as the no-pyarrow fallback.
COMP_NONE = 0
COMP_ZLIB = 1
COMP_ZSTD = 2
COMP_LZ4 = 3
COMP_SNAPPY = 4
_COMP_KEEP_RATIO = 0.9  # keep compressed form only if it saves >=10%
_COMP_SAMPLE = 1 << 16


def _zlib_c(data: bytes) -> bytes:
    import zlib

    return zlib.compress(data, 1)


def _zlib_d(data) -> bytes:
    import zlib

    return zlib.decompress(data)


def _pa_codec_fns(name: str, level=None):
    """(compress, decompress) backed by pyarrow's native codec.  pyarrow's
    raw codecs need the decompressed size, so the compressed form carries a
    uvarint raw-length prefix."""
    codec = pa.Codec(name, compression_level=level) if level is not None else pa.Codec(name)

    def c(data: bytes) -> bytes:
        out = bytearray()
        write_uvarint(out, len(data))
        out.extend(codec.compress(data, asbytes=True))
        return bytes(out)

    def d(data) -> bytes:
        mv = memoryview(data)
        raw_len, pos = read_uvarint(mv, 0)
        return codec.decompress(bytes(mv[pos:]), decompressed_size=raw_len, asbytes=True)

    return c, d


# pluggable compressor registry, the reference's Compressors map analog
# (reference: src/types.d.ts:3-4, src/parquet-writer.js:35): tag ->
# (name, compress, decompress).  Register more via register_compressor.
_COMPRESSORS: dict[int, tuple[str, object, object]] = {
    COMP_ZLIB: ("zlib", _zlib_c, _zlib_d),
}
_COMP_BY_NAME = {"zlib": COMP_ZLIB}
_DEFAULT_COMP = COMP_ZLIB
for _tag, _name, _lvl in ((COMP_ZSTD, "zstd", 1), (COMP_LZ4, "lz4", None),
                          (COMP_SNAPPY, "snappy", None)):
    try:
        _c, _d = _pa_codec_fns(_name, _lvl)
        _COMPRESSORS[_tag] = (_name, _c, _d)
        _COMP_BY_NAME[_name] = _tag
    except Exception:  # codec not built into this pyarrow
        continue
if COMP_ZSTD in _COMPRESSORS:
    _DEFAULT_COMP = COMP_ZSTD


def register_compressor(tag: int, name: str, compress_fn, decompress_fn,
                        make_default: bool = False) -> None:
    if tag in (COMP_NONE,):
        raise ValueError("tag 0 is reserved for uncompressed")
    global _DEFAULT_COMP
    _COMPRESSORS[tag] = (name, compress_fn, decompress_fn)
    _COMP_BY_NAME[name] = tag
    if make_default:
        _DEFAULT_COMP = tag


def _compress(payload: bytes, enable) -> tuple[int, bytes]:
    """``enable``: False/None -> store raw; True -> default compressor;
    a registered name ("zlib") -> that compressor."""
    if not enable or len(payload) < 64:
        return COMP_NONE, payload
    if enable is True:
        tag = _DEFAULT_COMP
    elif enable in _COMP_BY_NAME:
        tag = _COMP_BY_NAME[enable]
    else:
        raise ValueError(f"unknown compressor {enable!r}; registered: "
                         f"{sorted(_COMP_BY_NAME)} (register_compressor adds more)")
    _, cfn, _ = _COMPRESSORS[tag]
    # bit-packed payloads are usually incompressible: probe a 64 KiB sample
    # first and skip the full pass unless the sample actually shrinks
    if len(payload) > 4 * _COMP_SAMPLE:
        probe = cfn(payload[:_COMP_SAMPLE])
        if len(probe) > _COMP_SAMPLE * 0.85:
            return COMP_NONE, payload
    comp = cfn(payload)
    if len(comp) < len(payload) * _COMP_KEEP_RATIO:
        return tag, comp
    return COMP_NONE, payload


def _sample_comp_ratio(raw_sample: bytes, enable) -> float:
    """Compressibility of the chunk's sample bytes under the active
    general-purpose compressor (selector cost-model input).  Deterministic:
    a pure function of the sample prefix.  1.0 = incompressible/disabled."""
    if not enable or len(raw_sample) < 256:
        return 1.0
    if enable is True:
        tag = _DEFAULT_COMP
    else:
        tag = _COMP_BY_NAME.get(enable)
        if tag is None:
            return 1.0
    _, cfn, _ = _COMPRESSORS[tag]
    probe = raw_sample[:_COMP_SAMPLE]
    return min(1.0, len(cfn(probe)) / len(probe))


def _decompress(tag: int, payload) -> bytes:
    if tag == COMP_NONE:
        return payload
    ent = _COMPRESSORS.get(tag)
    if ent is None:
        raise ValueError(f"unknown compressor tag {tag}")
    return ent[2](payload)

# type tags
T_INT32, T_INT64, T_FLOAT32, T_FLOAT64, T_BOOL, T_BINARY, T_STRING = 1, 2, 3, 4, 5, 6, 7
T_TIMESTAMP_US, T_TIMESTAMP_NS, T_DATE32 = 8, 9, 10  # lowered to int64/int32
T_DECIMAL = 11  # precision <= 18: unscaled int64 (reference: src/unconvert.js:21-28)
T_FLOAT16 = 12  # IEEE half, stored as uint16 bit patterns (reference: src/unconvert.js:313-367)
T_FIXED = 13    # fixed-size binary, e.g. UUID=16 (reference: src/schema.js:157-159)
T_DECIMAL_WIDE = 14  # precision 19-38: 16-byte two's-complement, byte-array
#                      encodings (reference FLBA lowering: src/unconvert.js:279-307)

TYPE_NAMES = {
    T_INT32: "int32", T_INT64: "int64", T_FLOAT32: "float32",
    T_FLOAT64: "float64", T_BOOL: "bool", T_BINARY: "binary", T_STRING: "string",
    T_TIMESTAMP_US: "timestamp_us", T_TIMESTAMP_NS: "timestamp_ns",
    T_DATE32: "date32", T_DECIMAL: "decimal", T_FLOAT16: "float16",
    T_FIXED: "fixed", T_DECIMAL_WIDE: "decimal_wide",
}
_PHYS_NAMES = {
    T_INT32: "int32", T_INT64: "int64", T_FLOAT32: "float32",
    T_FLOAT64: "float64", T_TIMESTAMP_US: "int64", T_TIMESTAMP_NS: "int64",
    T_DATE32: "int32", T_DECIMAL: "int64", T_FLOAT16: "int32",
}
_NP_DTYPES = {
    T_INT32: "<i4", T_INT64: "<i8", T_FLOAT32: "<f4", T_FLOAT64: "<f8",
    T_TIMESTAMP_US: "<i8", T_TIMESTAMP_NS: "<i8", T_DATE32: "<i4",
    T_DECIMAL: "<i8", T_FLOAT16: "<i4",
}
_PA_TYPES = {
    T_INT32: pa.int32(), T_INT64: pa.int64(), T_FLOAT32: pa.float32(),
    T_FLOAT64: pa.float64(), T_BOOL: pa.bool_(),
    T_BINARY: pa.large_binary(), T_STRING: pa.large_string(),
    T_TIMESTAMP_US: pa.timestamp("us"), T_TIMESTAMP_NS: pa.timestamp("ns"),
    T_DATE32: pa.date32(),
}


def _type_tag_of(arr: pa.Array) -> int:
    t = arr.type
    if pa.types.is_int32(t):
        return T_INT32
    if pa.types.is_int64(t):
        return T_INT64
    if pa.types.is_float32(t):
        return T_FLOAT32
    if pa.types.is_float64(t):
        return T_FLOAT64
    if pa.types.is_boolean(t):
        return T_BOOL
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T_STRING
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T_BINARY
    if pa.types.is_timestamp(t):
        return T_TIMESTAMP_NS if t.unit == "ns" else T_TIMESTAMP_US
    if pa.types.is_date32(t):
        return T_DATE32
    if pa.types.is_decimal(t):
        if not pa.types.is_decimal128(t):
            raise TypeError(f"only decimal128 supported, got {t}")
        if t.precision > 38:
            raise TypeError(f"decimal precision > 38 unsupported: {t}")
        return T_DECIMAL_WIDE if t.precision > 18 else T_DECIMAL
    if pa.types.is_float16(t):
        return T_FLOAT16
    if pa.types.is_fixed_size_binary(t):
        if t.byte_width > 255:
            raise TypeError(f"fixed width > 255 unsupported: {t}")
        return T_FIXED
    raise TypeError(f"unsupported arrow type: {t}")


def _to_arrow(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        return values.combine_chunks()
    if isinstance(values, pa.Array):
        return values
    return pa.array(values)


# ---------- numeric payload encode/decode ----------

def _rle_for_encode(ints: np.ndarray) -> bytes:
    """RLE hybrid over frame-of-reference-shifted values."""
    out = bytearray()
    if len(ints) == 0:
        write_uvarint(out, 0)
        return bytes(out)
    ref = int(ints.min())
    with np.errstate(over="ignore"):
        adjusted = (ints - ref).view(np.uint64)
    bw = int(bit_widths(np.array([adjusted.max()], dtype=np.uint64))[0])
    write_uvarint(out, zigzag_int(ref))
    out.append(bw)
    out.extend(rle_hybrid_encode(adjusted, bw))
    return bytes(out)


def _rle_for_decode(buf, n: int) -> np.ndarray:
    mv = memoryview(buf)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    zz, pos = read_uvarint(mv, 0)
    ref = unzigzag_int(zz)
    bw = mv[pos]
    with np.errstate(over="ignore"):
        return rle_hybrid_decode(mv[pos + 1 :], bw, n).view(np.int64) + ref


def _rank_encode(ints: np.ndarray, compress) -> bytes | None:
    """Frequency-ranked dictionary + byte-plane split (codec RANK).

    Realizes the reference's open TODO "sort by frequency?"
    (reference: src/dictionary.js:133): values remapped to their frequency
    rank, so skewed distributions concentrate in the low byte; the high
    plane(s) become low-entropy and compress hard.  O(n + span) via
    bincount -- no sort over the data.  Returns None when inapplicable
    (span too wide), so callers can fall back to FOR.
    """
    n = len(ints)
    if n == 0:
        return None
    ref = int(ints.min())
    # compute the span in uint64 so an int64-overflowing (max - min) wraps
    # to a huge unsigned value and takes the fallback, instead of a wrapped
    # negative slipping past the guard into np.bincount (ADVICE r1)
    with np.errstate(over="ignore"):
        shifted_u = (ints - ref).view(np.uint64)
    max_shift = int(shifted_u.max())
    if max_shift >= (1 << 22):
        return None
    shifted = shifted_u.view(np.int64)
    span = max_shift + 1
    counts = np.bincount(shifted, minlength=span)
    nz = np.flatnonzero(counts)
    order = np.argsort(-counts[nz], kind="stable")
    dict_vals = nz[order]
    ndv = len(dict_vals)
    # ranks fit in uint32 (span < 2**22): a little-endian view of the rank
    # array IS its byte planes -- each plane is one strided copy, no
    # shift/mask temporaries over the full column
    rank_of = np.empty(span, dtype="<u4")
    rank_of[dict_vals] = np.arange(ndv, dtype="<u4")
    r = rank_of[shifted]
    planes_mat = r.view("u1").reshape(-1, 4)
    out = bytearray()
    write_uvarint(out, n)
    write_uvarint(out, zigzag_int(ref))
    write_uvarint(out, ndv)
    dblock = for_pack(dict_vals)
    write_uvarint(out, len(dblock))
    out.extend(dblock)
    n_planes = max(1, (bit_widths(np.array([max(ndv - 1, 0)], dtype=np.uint64))[0] + 7) // 8)
    out.append(int(n_planes))
    for p in range(n_planes):
        plane = np.ascontiguousarray(planes_mat[:, p]).tobytes()
        tag, comp = _compress(plane, compress)
        out.append(tag)
        write_uvarint(out, len(comp))
        out.extend(comp)
    return bytes(out)


def _rank_decode(buf, out_dtype=None) -> np.ndarray:
    mv = memoryview(buf)
    n, pos = read_uvarint(mv, 0)
    zz, pos = read_uvarint(mv, pos)
    ref = unzigzag_int(zz)
    ndv, pos = read_uvarint(mv, pos)
    dlen, pos = read_uvarint(mv, pos)
    dict_vals = for_unpack(mv[pos : pos + dlen])
    pos += dlen
    n_planes = mv[pos]
    pos += 1
    # reassemble ranks by strided byte-plane writes into a uint32 view --
    # the exact inverse of the encode's plane split; no per-plane int64
    # astype/shift temporaries (they were 4x the rest of the decode)
    r32 = np.zeros(n, dtype="<u4")
    rb = r32.view("u1").reshape(-1, 4)
    for p in range(n_planes):
        tag = mv[pos]
        pos += 1
        clen, pos = read_uvarint(mv, pos)
        plane = np.frombuffer(_decompress(tag, mv[pos : pos + clen]), dtype="u1")
        pos += clen
        rb[:, p] = plane
    with np.errstate(over="ignore"):
        # de-reference on the ndv-sized dictionary, THEN gather: the +ref
        # add and the final dtype cast touch ndv values instead of n (values
        # fit out_dtype by construction -- it is the column's own type)
        final_dict = dict_vals + ref
        if out_dtype is not None:
            final_dict = final_dict.astype(out_dtype)
        return final_dict[r32]


def _bits_of(values: np.ndarray) -> np.ndarray:
    """Reinterpret float bit patterns as int64 (exact, reversible)."""
    if values.dtype.itemsize == 4:
        return values.view("<u4").astype(np.int64)
    return values.view("<i8")


def _bits_back(ints: np.ndarray, type_tag: int) -> np.ndarray:
    if type_tag == T_FLOAT32:
        return ints.astype("<u4").view("<f4")
    return ints.view("<f8")


# ---------- public API ----------

def encode_array(values, codec: int | None = None, stats: bool = True,
                 compress: bool = True) -> tuple[bytes, dict]:
    """Encode one column chunk.  Returns (chunk bytes, metadata dict).

    ``values`` may be a pyarrow Array/ChunkedArray, numpy array, pandas
    Series values, or list.  ``codec=None`` engages the auto-selector.
    ``compress`` enables the general-purpose post-codec stage.
    ``stats=False`` skips min/max computation (the reference's
    ``statistics: false`` option, reference: src/write.js:22).
    """
    arr = _to_arrow(values)
    type_tag = _type_tag_of(arr)
    n = len(arr)
    null_count = arr.null_count
    dense = arr.drop_null() if null_count else arr
    # temporal types are lowered to their physical ints (parquet-style:
    # TIMESTAMP -> INT64 epoch units, DATE -> INT32 days; reference analog
    # src/unconvert.js:29-48) and restored from the type tag on decode
    dec_params = b""
    # stats captured on the ORIGINAL values when the lowering changes the
    # value ORDER (decimal -> unscaled ints, float16 -> bit patterns):
    # stats on the lowered representation would record wrong bounds
    pre_minmax: tuple | None = None

    def _orig_minmax() -> tuple | None:
        if not (stats and len(dense)):
            return None
        import pyarrow.compute as pc

        mm = pc.min_max(dense)
        return (mm["min"].as_py(), mm["max"].as_py())

    if type_tag in (T_TIMESTAMP_US, T_TIMESTAMP_NS):
        # normalize to the tag's unit first: a timestamp[s]/[ms] column
        # cast straight to int64 would store raw s/ms ints tagged as us
        unit = "us" if type_tag == T_TIMESTAMP_US else "ns"
        if dense.type.unit != unit:
            dense = dense.cast(pa.timestamp(unit, tz=dense.type.tz))
        dense = dense.cast(pa.int64())
    elif type_tag == T_DATE32:
        dense = dense.cast(pa.int32())
    elif type_tag == T_DECIMAL:
        dec_params = bytes([arr.type.precision, arr.type.scale])
        pre_minmax = _orig_minmax()
        dense = _decimal_unscaled(dense)
    elif type_tag == T_DECIMAL_WIDE:
        dec_params = bytes([arr.type.precision, arr.type.scale])
        pre_minmax = _orig_minmax()
        dense = _decimal_wide_binary(dense)
    elif type_tag == T_FLOAT16:
        # half-float bit patterns as small ints (FOR packs them at <=16 bits);
        # stats from the float VALUES via numpy (pyarrow has no halffloat
        # min_max kernel), NaN-skipped and signed-zero-normalized like
        # numeric_stats; all-NaN publishes NO bounds (a bit-pattern stat
        # would fabricate the value 32256.0)
        if stats and len(dense):
            f = np.asarray(dense, dtype=np.float16)
            finite = f[~np.isnan(f)]
            if len(finite):
                mn, mx = float(finite.min()), float(finite.max())
                if mn == 0.0:
                    mn = -0.0
                if mx == 0.0:
                    mx = 0.0
                pre_minmax = (mn, mx)
            else:
                pre_minmax = (None, None)
        bits16 = np.asarray(dense).view("<u2").astype(np.int32)
        dense = pa.array(bits16, type=pa.int32())
    elif type_tag == T_FIXED:
        dec_params = bytes([arr.type.byte_width])
        dense = dense.cast(pa.large_binary())

    out = bytearray()
    out.extend(MAGIC)
    out.append(VERSION)
    out.append(type_tag)

    header_tail = bytearray()
    write_uvarint(header_tail, n)
    write_uvarint(header_tail, null_count)
    if 0 < null_count < n:
        validity = np.asarray(arr.is_valid()).astype(np.uint64)
        vbuf = rle_hybrid_encode(validity, 1)
        write_uvarint(header_tail, len(vbuf))
        header_tail.extend(vbuf)

    st: ChunkStats
    dict_block = b""
    if type_tag in (T_BINARY, T_STRING, T_FIXED, T_DECIMAL_WIDE):
        offsets, data = binary_buffers(dense)
        if type_tag == T_DECIMAL_WIDE:
            # byte-lexicographic order is wrong for two's-complement
            # decimals; real min/max computed on the decimal values above
            st = (ChunkStats(n, null_count, *pre_minmax)
                  if stats and pre_minmax else ChunkStats(n, null_count))
        else:
            st = binary_stats(offsets, data, n) if stats else ChunkStats(n, null_count)
        fsst_table = None
        if codec is None:
            samp = S.sample_binary(offsets, data)
            costs = S.estimate_costs_binary(samp)
            # the FSST probe trains a symbol table on the sample (~tens of
            # ms); run it only when it could still win the pick (see
            # S.FSST_COST_FLOOR -- skipping never changes the selection)
            if min(costs.values()) > S.FSST_COST_FLOOR:
                gain, fsst_table = _fsst_gain(offsets, data)
                costs = S.estimate_costs_binary(samp, fsst_gain=gain)
            codec = S.pick(costs)
        if codec == S.PLAIN:
            payload = plain_encode_binary(dense)
        elif codec == S.DELTA_LENGTH:
            payload = delta_length_encode(offsets, data)
        elif codec == S.DELTA_BA:
            payload = delta_byte_array_encode(offsets, data)
        elif codec == S.FSST:
            from .kernels.fsst import fsst_encode

            # reuse the sample-trained table from the selector probe (the
            # encoder would otherwise re-train on the same sample prefix)
            payload = fsst_encode(offsets, data, table=fsst_table)
        elif codec == S.DICT:
            idx, d = factorize(dense, "binary")
            doff, ddata = binary_buffers(d)
            dict_block = delta_length_encode(doff, ddata)
            payload = dict_indexes_encode(idx, len(d))
        else:
            raise ValueError(f"codec {codec} not valid for byte arrays")
    elif type_tag == T_BOOL:
        vals = np.asarray(dense).astype(bool)
        st = numeric_stats(vals, n) if stats else ChunkStats(n, null_count)
        if codec is None:
            samp = S.sample_numeric(vals.astype(np.int64))
            costs = S.estimate_costs_numeric(samp, "b")
            # booleans only have PLAIN/RLE encoders: drop whatever else
            # the generic numeric cost model offers (DICT of 2 values
            # would otherwise win on run-heavy columns and crash)
            codec = S.pick({c: v for c, v in costs.items()
                            if c in (S.PLAIN, S.RLE)})
        if codec == S.PLAIN:
            payload = plain_encode_bool(vals)
        elif codec == S.RLE:
            payload = _rle_for_encode(vals.astype(np.int64))
        else:
            raise ValueError(f"codec {codec} not valid for booleans")
    else:
        vals = np.asarray(dense)
        st = numeric_stats(vals, n) if stats else ChunkStats(n, null_count)
        if pre_minmax is not None:
            # decimal/float16 meta stats carry the ORIGINAL values, not the
            # unscaled-int / bit-pattern lowering (whose order is wrong)
            st = ChunkStats(n, null_count, *pre_minmax)
        kind = vals.dtype.kind
        ints = _bits_of(vals) if kind == "f" else vals.astype(np.int64)
        if codec is None:
            samp = S.sample_numeric(vals)
            ratio = _sample_comp_ratio(vals[: S.SAMPLE_N].tobytes(), compress)
            bss_ratio = None
            if kind == "f":
                bss_ratio = _sample_comp_ratio(
                    byte_stream_split_encode(vals[: S.SAMPLE_N],
                                             vals.dtype.itemsize), compress)
            codec = S.pick(S.estimate_costs_numeric(samp, kind, n_total=len(vals),
                                                    comp_ratio=ratio,
                                                    bss_comp_ratio=bss_ratio))
        if codec == S.PLAIN:
            payload = plain_encode_numeric(vals, _PHYS_NAMES[type_tag])
        elif codec == S.RANK:
            payload = _rank_encode(ints, compress)
            if payload is None:  # span too wide: fall back
                codec = S.FOR
                payload = for_pack(ints)
        elif codec == S.FOR:
            payload = for_pack(ints)
        elif codec == S.DELTA_FOR:
            payload = delta_for_pack(ints)
        elif codec == S.PFOR:
            payload = pfor_pack(ints)
        elif codec == S.DELTA_PFOR:
            payload = delta_pfor_pack(ints)
        elif codec == S.DELTA_BP:
            payload = delta_binary_pack(ints)
        elif codec == S.RLE:
            payload = _rle_for_encode(ints)
        elif codec == S.BSS:
            payload = byte_stream_split_encode(vals, vals.dtype.itemsize)
        elif codec == S.ALP:
            payload = alp_encode(vals)
        elif codec == S.DICT:
            idx, d = factorize(ints, "numeric")
            dict_block = plain_encode_numeric(d.astype(np.int64), "int64")
            payload = dict_indexes_encode(idx, len(d))
        else:
            raise ValueError(f"codec {codec} not valid for {TYPE_NAMES[type_tag]}")

    # RANK planes carry their own per-plane compression tags: an outer
    # pass re-compresses already-compressed bytes (probe cost, no gain)
    ptag, payload = _compress(payload, False if codec == S.RANK else compress)
    out.append(codec)
    out.append(ptag)
    out.extend(dec_params)  # (precision, scale) iff T_DECIMAL
    out.extend(header_tail)
    if codec == S.DICT:
        dtag, dict_block = _compress(dict_block, compress)
        write_uvarint(out, len(dict_block) + 1)
        out.append(dtag)
        out.extend(dict_block)
    out.extend(payload)

    min_repr, min_adj = _meta_repr(st.min_value)
    max_repr, max_adj = _meta_repr(st.max_value, is_max=True)
    meta = {
        "type": TYPE_NAMES[type_tag],
        "codec": S.CODEC_NAMES[codec],
        "n_values": n,
        "null_count": null_count,
        "min": min_repr,
        "max": max_repr,
        "is_min_exact": st.is_min_exact and not min_adj,
        "is_max_exact": st.is_max_exact and not max_adj,
        "bytes_out": len(out),
    }
    return bytes(out), meta


def _meta_repr(v, is_max: bool = False) -> tuple[object, bool]:
    """(JSON-able stat value, adjusted?).  A 16-byte truncation can split
    a multi-byte UTF-8 character: back off to the longest valid prefix (a
    valid LOWER bound for min; for max, bump the last bumpable character
    -- with carry -- so the repr stays an UPPER bound; a hex digest would
    compare wrongly in range pruning).  ``adjusted`` means the repr is no
    longer the attained value, so exactness flags must clear.  An
    un-bumpable max (all U+10FFFF) publishes None -- range pruning treats
    a null bound as may-match.  Truly non-UTF-8 bytes (binary columns)
    stay hex, marked adjusted."""
    if not isinstance(v, bytes):
        return v, False
    for cut in range(len(v), max(len(v) - 4, 0), -1):
        try:
            s = v[:cut].decode("utf-8")
        except UnicodeDecodeError:
            continue
        if cut == len(v):
            return s, False
        if is_max and s:
            chars = list(s)
            for i in range(len(chars) - 1, -1, -1):
                nxt = ord(chars[i]) + 1
                if 0xD800 <= nxt <= 0xDFFF:
                    nxt = 0xE000  # skip the unpaired-surrogate gap
                if nxt <= 0x10FFFF:
                    return "".join(chars[:i]) + chr(nxt), True
            return None, True  # every char maxed out: no sound upper bound
        return s, True
    return v.hex(), True


def _fsst_gain(offsets, data):
    """(estimated fractional FSST size reduction | None, trained table)."""
    try:
        from .kernels.fsst import fsst_sample_gain
    except ImportError:
        return None, None
    return fsst_sample_gain(offsets, data, return_table=True)


def decode_array(buf) -> pa.Array:
    """Decode a chunk produced by :func:`encode_array` back to pyarrow."""
    mv = memoryview(buf)
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("bad chunk magic")
    version = mv[4]
    if version != VERSION:
        raise ValueError(f"unsupported chunk version {version}")
    type_tag = mv[5]
    codec = mv[6]
    ptag = mv[7]
    pos = 8
    dec_precision = dec_scale = fixed_width = None
    if type_tag in (T_DECIMAL, T_DECIMAL_WIDE):
        dec_precision, dec_scale = mv[8], mv[9]
        pos = 10
    elif type_tag == T_FIXED:
        fixed_width = mv[8]
        pos = 9
    n, pos = read_uvarint(mv, pos)
    null_count, pos = read_uvarint(mv, pos)
    validity = None
    if 0 < null_count < n:
        vlen, pos = read_uvarint(mv, pos)
        validity = rle_hybrid_decode(mv[pos : pos + vlen], 1, n).astype(bool)
        pos += vlen
    dict_block = None
    if codec == S.DICT:
        dlen, pos = read_uvarint(mv, pos)
        dict_block = _decompress(mv[pos], mv[pos + 1 : pos + dlen])
        pos += dlen
    payload = _decompress(ptag, mv[pos:])
    n_dense = n - null_count

    if type_tag in (T_BINARY, T_STRING, T_FIXED, T_DECIMAL_WIDE):
        as_string = type_tag == T_STRING
        if codec == S.PLAIN:
            offsets, data = plain_decode_binary(payload, n_dense)
        elif codec == S.DELTA_LENGTH:
            offsets, data = delta_length_decode(payload)
        elif codec == S.DELTA_BA:
            offsets, data = delta_byte_array_decode(payload)
        elif codec == S.FSST:
            from .kernels.fsst import fsst_decode

            offsets, data = fsst_decode(payload)
        elif codec == S.DICT:
            doff, ddata = delta_length_decode(dict_block)
            idx = dict_indexes_decode(bytes(payload), n_dense)
            lens = np.diff(doff)
            sel_len = lens[idx]
            offsets = np.zeros(n_dense + 1, dtype=np.int64)
            np.cumsum(sel_len, out=offsets[1:])
            # gather value bytes: repeat dict spans per index
            data = _gather_spans(ddata, doff[:-1][idx], sel_len)
        else:
            raise ValueError(f"bad codec {codec} for byte arrays")
        dense = arrow_binary_from_buffers(offsets, data, as_string)
    elif type_tag == T_BOOL:
        if codec == S.PLAIN:
            vals = plain_decode_bool(payload, n_dense)
        elif codec == S.RLE:
            vals = _rle_for_decode(payload, n_dense).astype(bool)
        else:
            raise ValueError(f"bad codec {codec} for booleans")
        dense = pa.array(vals, type=pa.bool_())
    else:
        dtype_name = _PHYS_NAMES[type_tag]
        if codec == S.PLAIN:
            vals = plain_decode_numeric(payload, dtype_name)
        elif codec == S.BSS:
            itemsize = int(_NP_DTYPES[type_tag][-1])
            vals = byte_stream_split_decode(payload, itemsize, n_dense, _NP_DTYPES[type_tag])
        elif codec == S.ALP:
            vals = alp_decode(payload)
        else:
            if codec == S.RANK:
                out_dt = (None if type_tag in (T_FLOAT32, T_FLOAT64)
                          else _NP_DTYPES[type_tag])
                ints = _rank_decode(payload, out_dt)
            elif codec == S.FOR:
                ints = for_unpack(payload)
            elif codec == S.DELTA_FOR:
                ints = delta_for_unpack(payload)
            elif codec == S.PFOR:
                ints = pfor_unpack(payload)
            elif codec == S.DELTA_PFOR:
                ints = delta_pfor_unpack(payload)
            elif codec == S.DELTA_BP:
                ints = delta_binary_unpack(payload)
            elif codec == S.RLE:
                ints = _rle_for_decode(payload, n_dense)
            elif codec == S.DICT:
                d = plain_decode_numeric(dict_block, "int64")
                idx = dict_indexes_decode(bytes(payload), n_dense)
                ints = d[idx]
            else:
                raise ValueError(f"bad codec {codec} for {dtype_name}")
            if type_tag in (T_FLOAT32, T_FLOAT64):
                vals = _bits_back(ints, type_tag)
            else:
                # copy=False: decoders return fresh arrays (never views of
                # the input buffer), so an already-int64 result passes
                # through without a redundant full-column copy
                vals = ints.astype(_NP_DTYPES[type_tag], copy=False)
        if type_tag == T_DECIMAL:
            dense = _decimal_from_unscaled(vals, dec_precision, dec_scale)
        elif type_tag == T_FLOAT16:
            dense = pa.array(vals.astype("<u2").view("<f2"), type=pa.float16())
        else:
            dense = pa.array(vals, type=_PA_TYPES[type_tag])

    if type_tag == T_DECIMAL:
        out_type = pa.decimal128(dec_precision, dec_scale)
    elif type_tag == T_DECIMAL_WIDE:
        out_type = pa.decimal128(dec_precision, dec_scale)
        dense = _decimal_wide_from_binary(dense, dec_precision, dec_scale)
    elif type_tag == T_FIXED:
        out_type = pa.binary(fixed_width)
        dense = dense.cast(out_type)
    elif type_tag == T_FLOAT16:
        out_type = pa.float16()
    else:
        out_type = _PA_TYPES[type_tag]
    if null_count == 0:
        return dense
    if null_count == n:
        return pa.nulls(n, type=out_type)
    return _expand_with_nulls(dense, validity, n, type_tag)


def _expand_with_nulls(dense: pa.Array, validity: np.ndarray, n: int, type_tag: int) -> pa.Array:
    # take() with a null index yields a null output -- works for every type
    # (if_else lacks kernels for e.g. halffloat)
    idx = np.zeros(n, dtype=np.int64)
    idx[validity] = np.arange(len(dense))
    return dense.take(pa.array(idx, mask=~validity))


def _decimal_unscaled(arr: pa.Array) -> pa.Array:
    """decimal128(p<=18, s) -> unscaled int64 (two's complement low word)."""
    n = len(arr)
    if n == 0:
        return pa.array(np.zeros(0, dtype=np.int64))
    buf = arr.buffers()[1]
    words = np.frombuffer(buf, dtype="<i8", count=2 * (arr.offset + n))
    low = words.reshape(-1, 2)[arr.offset:, 0]
    return pa.array(low.copy())


def _decimal_wide_binary(arr: pa.Array) -> pa.Array:
    """decimal128(p>18, s) -> large_binary of the 16-byte little-endian
    two's-complement storage words (the byte-array encodings then apply;
    reference lowers wide decimals to FLBA bytes, src/unconvert.js:279-307)."""
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.large_binary())
    buf = arr.buffers()[1]
    raw = np.frombuffer(buf, dtype="u1",
                        count=16 * (arr.offset + n))[arr.offset * 16:]
    offsets = np.arange(0, 16 * (n + 1), 16, dtype=np.int64)
    return arrow_binary_from_buffers(offsets, raw.copy(), False)


def _decimal_wide_from_binary(dense: pa.Array, precision: int, scale: int) -> pa.Array:
    n = len(dense)
    if n == 0:
        return pa.array([], type=pa.decimal128(precision, scale))
    _, data = binary_buffers(dense)  # every value is exactly 16 bytes
    raw = np.ascontiguousarray(data, dtype="u1")
    return pa.Array.from_buffers(pa.decimal128(precision, scale), n,
                                 [None, pa.py_buffer(raw.tobytes())])


def _decimal_from_unscaled(ints: np.ndarray, precision: int, scale: int) -> pa.Array:
    v = np.ascontiguousarray(ints, dtype="<i8")
    n = len(v)
    out = np.empty((n, 2), dtype="<i8")
    out[:, 0] = v
    out[:, 1] = v >> 63  # sign extension to 128 bits
    data = pa.py_buffer(out.tobytes())
    return pa.Array.from_buffers(pa.decimal128(precision, scale), n, [None, data])


def _gather_spans(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenate data[starts[i]:starts[i]+lengths[i]] vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype="u1")
    out_off = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off[1:])
    pos = np.arange(total, dtype=np.int64)
    span_id = np.searchsorted(out_off[1:], pos, side="right")
    rel = pos - out_off[span_id]
    return data[starts[span_id] + rel]
