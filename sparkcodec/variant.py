"""Parquet Variant binary codec, from scratch per the public Variant spec
(the reference's largest component, reference: src/variant.js:23-633).

Layout (Variant binary encoding spec):

  metadata  = header(version=1 | sorted<<4 | (offset_size-1)<<6)
              + dict_size + offsets[n+1] + utf8 key bytes
  value     = tagged tree:
              basic type in low 2 bits of the first byte
                0 primitive (type id in bits 2..7)
                1 short string (length in bits 2..7)
                2 object  (offset/id widths + is_large in bits 2..7)
                3 array   (offset width + is_large in bits 2..7)

Primitive ids: 0 null, 1 true, 2 false, 3 int8, 4 int16, 5 int32,
6 int64, 7 double, 8/9/10 decimal4/8/16, 11 date, 12 timestamp,
13 timestamp_ntz, 14 float, 15 binary, 16 long string.

The encoder emits the same subset the reference does (null/bool/ints/
double/string/binary/timestamp/object/array, shared sorted column
dictionary); the decoder additionally reads decimal4/8/16, date and
float so bytes produced by Spark's native `parse_json` (which lowers
JSON fractions to decimals) decode too.  Spark's `VariantVal` is the
cross-engine oracle in tests: our bytes must `toJson()` correctly and
Spark-produced bytes must decode to equal Python values.
"""

from __future__ import annotations

import datetime
import decimal
import json
import struct

# primitive type ids
_NULL, _TRUE, _FALSE = 0, 1, 2
_INT8, _INT16, _INT32, _INT64, _DOUBLE = 3, 4, 5, 6, 7
_DEC4, _DEC8, _DEC16 = 8, 9, 10
_DATE, _TS, _TS_NTZ, _FLOAT, _BINARY, _LONG_STR = 11, 12, 13, 14, 15, 16

_EPOCH = datetime.date(1970, 1, 1)


def _byte_width(max_value: int) -> int:
    if max_value <= 0xFF:
        return 1
    if max_value <= 0xFFFF:
        return 2
    if max_value <= 0xFFFFFF:
        return 3
    return 4


def _append_le(out: bytearray, value: int, width: int) -> None:
    out.extend(int(value).to_bytes(width, "little"))


# ---------- metadata ----------

def collect_keys(value, keys: set) -> None:
    """All object keys in the value tree (reference: src/variant.js:371-390)."""
    if isinstance(value, dict):
        for k, v in value.items():
            keys.add(k)
            collect_keys(v, keys)
    elif isinstance(value, (list, tuple)):
        for v in value:
            collect_keys(v, keys)


def build_metadata(keys: list[str]) -> tuple[bytes, dict[str, int]]:
    """Sorted-dictionary metadata bytes + key->id map
    (reference: src/variant.js:392-445)."""
    dictionary = sorted(keys)
    enc = [k.encode("utf-8") for k in dictionary]
    total = sum(len(e) for e in enc)
    osz = _byte_width(total)
    out = bytearray()
    out.append(1 | (1 << 4) | ((osz - 1) << 6))  # version, sorted, offset size
    _append_le(out, len(enc), osz)
    pos = 0
    for e in enc:
        _append_le(out, pos, osz)
        pos += len(e)
    _append_le(out, pos, osz)
    for e in enc:
        out.extend(e)
    return bytes(out), {k: i for i, k in enumerate(dictionary)}


# ---------- value encode ----------

def _write_value(out: bytearray, val, key_index: dict[str, int]) -> None:
    if val is None:
        out.append(0x00)
    elif val is True:
        out.append(_TRUE << 2)
    elif val is False:
        out.append(_FALSE << 2)
    elif isinstance(val, int):
        if -(1 << 7) <= val < (1 << 7):
            out.append(_INT8 << 2)
            out.extend(val.to_bytes(1, "little", signed=True))
        elif -(1 << 15) <= val < (1 << 15):
            out.append(_INT16 << 2)
            out.extend(val.to_bytes(2, "little", signed=True))
        elif -(1 << 31) <= val < (1 << 31):
            out.append(_INT32 << 2)
            out.extend(val.to_bytes(4, "little", signed=True))
        elif -(1 << 63) <= val < (1 << 63):
            out.append(_INT64 << 2)
            out.extend(val.to_bytes(8, "little", signed=True))
        else:
            raise OverflowError(f"variant int out of int64 range: {val}")
    elif isinstance(val, float):
        out.append(_DOUBLE << 2)
        out.extend(struct.pack("<d", val))
    elif isinstance(val, decimal.Decimal):
        # smallest of decimal4/8/16 that fits the unscaled value; scale is
        # the decimal's own exponent (negative exponents only).  The
        # unscaled value is derived EXACTLY from the digit tuple --
        # int(val.scaleb(scale)) would silently round past the default
        # Decimal context's 28 significant digits.
        sign, digits, exp = val.as_tuple()
        if not isinstance(exp, int):
            raise ValueError(f"cannot encode non-finite decimal {val}")
        scale = max(-exp, 0)
        if scale > 38:
            raise OverflowError(f"variant decimal scale out of range: {val}")
        unscaled = int("".join(map(str, digits)) or "0") * 10 ** (exp + scale)
        if sign:
            unscaled = -unscaled
        for tid, w in ((_DEC4, 4), (_DEC8, 8), (_DEC16, 16)):
            if -(1 << (8 * w - 1)) <= unscaled < (1 << (8 * w - 1)):
                out.append(tid << 2)
                out.append(scale)
                out.extend(unscaled.to_bytes(w, "little", signed=True))
                break
        else:
            raise OverflowError(f"variant decimal out of decimal16 range: {val}")
    elif isinstance(val, str):
        b = val.encode("utf-8")
        if len(b) <= 63:
            out.append((len(b) << 2) | 1)  # short string
            out.extend(b)
        else:
            out.append(_LONG_STR << 2)
            out.extend(len(b).to_bytes(4, "little"))
            out.extend(b)
    elif isinstance(val, (bytes, bytearray)):
        out.append(_BINARY << 2)
        out.extend(len(val).to_bytes(4, "little"))
        out.extend(val)
    elif isinstance(val, datetime.datetime):
        # per the Variant spec: id 12 (timestamp) for tz-aware instants,
        # id 13 (timestamp_ntz) only for naive datetimes -- Spark readers
        # would otherwise misread aware instants as NTZ
        if val.tzinfo is not None:
            out.append(_TS << 2)
            delta = val - datetime.datetime(1970, 1, 1,
                                            tzinfo=datetime.timezone.utc)
        else:
            out.append(_TS_NTZ << 2)
            delta = val - datetime.datetime(1970, 1, 1)
        micros = delta // datetime.timedelta(microseconds=1)
        out.extend(micros.to_bytes(8, "little", signed=True))
    elif isinstance(val, datetime.date):
        out.append(_DATE << 2)
        out.extend((val - _EPOCH).days.to_bytes(4, "little", signed=True))
    elif isinstance(val, (list, tuple)):
        scratch = bytearray()
        offsets = [0]
        for el in val:
            _write_value(scratch, el, key_index)
            offsets.append(len(scratch))
        ow = _byte_width(offsets[-1])
        large = 1 if len(val) > 255 else 0
        out.append((((ow - 1) | (large << 2)) << 2) | 3)
        _append_le(out, len(val), 4 if large else 1)
        for off in offsets:
            _append_le(out, off, ow)
        out.extend(scratch)
    elif isinstance(val, dict):
        entries = sorted(((key_index[k], k) for k in val), key=lambda t: t[0])
        scratch = bytearray()
        offsets = [0]
        for _, k in entries:
            _write_value(scratch, val[k], key_index)
            offsets.append(len(scratch))
        idw = _byte_width(entries[-1][0] if entries else 0)
        ow = _byte_width(offsets[-1])
        large = 1 if len(entries) > 255 else 0
        out.append((((ow - 1) | ((idw - 1) << 2) | (large << 4)) << 2) | 2)
        _append_le(out, len(entries), 4 if large else 1)
        for fid, _ in entries:
            _append_le(out, fid, idw)
        for off in offsets:
            _append_le(out, off, ow)
        out.extend(scratch)
    else:
        raise TypeError(f"variant cannot encode {type(val).__name__}")


def encode_value(val, key_index: dict[str, int]) -> bytes:
    out = bytearray()
    _write_value(out, val, key_index)
    return bytes(out)


def encode_variant_rows(values: list) -> tuple[bytes, list[bytes | None]]:
    """Column-level encode with one shared sorted dictionary (the
    reference's unshredded path, src/variant.js:50-64).  None rows stay
    present Variant nulls; a Python-level MISSING is not modeled."""
    keys: set[str] = set()
    for v in values:
        collect_keys(v, keys)
    metadata, key_index = build_metadata(sorted(keys))
    return metadata, [encode_value(v, key_index) for v in values]


# ---------- value decode ----------

def decode_metadata(buf: bytes) -> list[str]:
    header = buf[0]
    if header & 0x0F != 1:
        raise ValueError(f"unsupported variant metadata version {header & 0x0F}")
    osz = (header >> 6) + 1
    n = int.from_bytes(buf[1:1 + osz], "little")
    pos = 1 + osz
    offs = [int.from_bytes(buf[pos + i * osz: pos + (i + 1) * osz], "little")
            for i in range(n + 1)]
    base = pos + (n + 1) * osz
    return [buf[base + offs[i]: base + offs[i + 1]].decode("utf-8") for i in range(n)]


def _read_value(buf: bytes, pos: int, dictionary: list[str]):
    header = buf[pos]
    basic = header & 0x03
    info = header >> 2
    pos += 1
    if basic == 1:  # short string
        return buf[pos:pos + info].decode("utf-8"), pos + info
    if basic == 2:  # object
        ow = (info & 0x03) + 1
        idw = ((info >> 2) & 0x03) + 1
        large = (info >> 4) & 1
        n = int.from_bytes(buf[pos:pos + (4 if large else 1)], "little")
        pos += 4 if large else 1
        ids = [int.from_bytes(buf[pos + i * idw: pos + (i + 1) * idw], "little")
               for i in range(n)]
        pos += n * idw
        offs = [int.from_bytes(buf[pos + i * ow: pos + (i + 1) * ow], "little")
                for i in range(n + 1)]
        pos += (n + 1) * ow
        out = {}
        for i in range(n):
            v, _ = _read_value(buf, pos + offs[i], dictionary)
            out[dictionary[ids[i]]] = v
        return out, pos + offs[-1]
    if basic == 3:  # array
        ow = (info & 0x03) + 1
        large = (info >> 2) & 1
        n = int.from_bytes(buf[pos:pos + (4 if large else 1)], "little")
        pos += 4 if large else 1
        offs = [int.from_bytes(buf[pos + i * ow: pos + (i + 1) * ow], "little")
                for i in range(n + 1)]
        pos += (n + 1) * ow
        out = [_read_value(buf, pos + offs[i], dictionary)[0] for i in range(n)]
        return out, pos + offs[-1]
    # primitives
    tid = info
    if tid == _NULL:
        return None, pos
    if tid == _TRUE:
        return True, pos
    if tid == _FALSE:
        return False, pos
    if tid in (_INT8, _INT16, _INT32, _INT64):
        w = {_INT8: 1, _INT16: 2, _INT32: 4, _INT64: 8}[tid]
        return int.from_bytes(buf[pos:pos + w], "little", signed=True), pos + w
    if tid == _DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if tid == _FLOAT:
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if tid in (_DEC4, _DEC8, _DEC16):
        w = {_DEC4: 4, _DEC8: 8, _DEC16: 16}[tid]
        scale = buf[pos]
        unscaled = int.from_bytes(buf[pos + 1:pos + 1 + w], "little", signed=True)
        # tuple constructor: exact regardless of the Decimal context
        # (scaleb would round decimal16 values past 28 significant digits)
        digits = tuple(int(c) for c in str(abs(unscaled)))
        return decimal.Decimal((1 if unscaled < 0 else 0, digits, -scale)), pos + 1 + w
    if tid == _DATE:
        days = int.from_bytes(buf[pos:pos + 4], "little", signed=True)
        return _EPOCH + datetime.timedelta(days=days), pos + 4
    if tid in (_TS, _TS_NTZ):
        micros = int.from_bytes(buf[pos:pos + 8], "little", signed=True)
        epoch = (datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                 if tid == _TS else datetime.datetime(1970, 1, 1))
        return epoch + datetime.timedelta(microseconds=micros), pos + 8
    if tid == _BINARY:
        n = int.from_bytes(buf[pos:pos + 4], "little")
        return bytes(buf[pos + 4:pos + 4 + n]), pos + 4 + n
    if tid == _LONG_STR:
        n = int.from_bytes(buf[pos:pos + 4], "little")
        return buf[pos + 4:pos + 4 + n].decode("utf-8"), pos + 4 + n
    raise ValueError(f"unsupported variant primitive id {tid}")


def decode_variant(metadata: bytes, value: bytes):
    """(metadata, value) bytes -> Python value."""
    return _read_value(bytes(value), 0, decode_metadata(bytes(metadata)))[0]


# ---------- shredding (reference: src/variant.js:83-147, 216-303) ----------

VARIANT_NULL = b"\x00"
MAX_SHRED_DEPTH = 3
MAX_SHRED_LEAVES = 256
_RESERVED_SHRED_FIELDS = {"value", "typed_value"}
_SCALAR_SHREDS = {"BOOLEAN", "INT32", "INT64", "FLOAT", "DOUBLE", "STRING", "TIMESTAMP"}


def normalize_shredding(shred):
    """Strip field names reserved by the shredded wrapper layout
    (reference: src/variant.js:324-343); None when a level empties out."""
    if isinstance(shred, list):
        elem = normalize_shredding(shred[0]) if shred else None
        return None if elem is None else [elem]
    if isinstance(shred, dict):
        out = {}
        for k, v in shred.items():
            if k in _RESERVED_SHRED_FIELDS:
                continue
            n = normalize_shredding(v)
            if n is not None:
                out[k] = n
        return out or None
    if shred not in _SCALAR_SHREDS:
        raise ValueError(f"unknown scalar shred type {shred!r}")
    return shred


def _matches_type(value, shred: str) -> bool:
    if value is None:
        return False
    if shred == "BOOLEAN":
        return isinstance(value, bool)
    if isinstance(value, bool):
        return False  # bool is an int in Python; never shred it as one
    if shred == "INT32":
        return isinstance(value, int) and -(1 << 31) <= value < (1 << 31)
    if shred == "INT64":
        return isinstance(value, int) and -(1 << 63) <= value < (1 << 63)
    if shred in ("FLOAT", "DOUBLE"):
        return isinstance(value, float)
    if shred == "STRING":
        return isinstance(value, str)
    if shred == "TIMESTAMP":
        return isinstance(value, datetime.datetime)
    return False


def count_shred_leaves(shred) -> int:
    if isinstance(shred, list):
        return count_shred_leaves(shred[0]) if shred else 0
    if isinstance(shred, dict):
        return sum(count_shred_leaves(v) for v in shred.values())
    return 1


def detect_shredding(values, depth: int = 0):
    """Auto-detect a shred type from sample values (reference:
    src/variant.js:243-303): object if any plain dict, array if all lists,
    scalar if one consistent basic type; None otherwise or past the depth
    cap.  Shredding is a query optimization -- conservative by design."""
    non_null = [v for v in values if v is not None]
    if not non_null:
        return None
    if any(isinstance(v, dict) for v in non_null):
        if depth >= MAX_SHRED_DEPTH:
            return None
        fields: dict[str, list] = {}
        for v in non_null:
            if isinstance(v, dict):
                for k, fv in v.items():
                    fields.setdefault(k, []).append(fv)
        out = {}
        for k, vals in fields.items():
            fs = detect_shredding(vals, depth + 1)
            if fs is not None:
                out[k] = fs
        return out or None
    if all(isinstance(v, (list, tuple)) for v in non_null):
        if depth >= MAX_SHRED_DEPTH:
            return None
        elems = [el for arr in non_null for el in arr]
        es = detect_shredding(elems, depth + 1)
        return None if es is None else [es]
    kinds = set()
    for v in non_null:
        if isinstance(v, (list, tuple)):
            return None  # mixed array + scalar
        if isinstance(v, bool):
            kinds.add("BOOLEAN")
        elif isinstance(v, int):
            kinds.add("INT64")
        elif isinstance(v, float):
            kinds.add("DOUBLE")
        elif isinstance(v, str):
            kinds.add("STRING")
        elif isinstance(v, datetime.datetime):
            kinds.add("TIMESTAMP")
        else:
            return None
    return kinds.pop() if len(kinds) == 1 else None


def encode_shredded(value, shred, key_index: dict[str, int],
                    allow_partial: bool = True) -> dict:
    """One value against a shred type -> {value: bytes|None, typed_value}
    (reference: src/variant.js:83-147).  typed_value holds spec-shaped
    wrappers recursively; value carries the binary fallback/remainder."""
    if value is None:
        return {"value": VARIANT_NULL, "typed_value": None}
    if isinstance(shred, list):
        if not isinstance(value, (list, tuple)):
            return {"value": encode_value(value, key_index), "typed_value": None}
        return {"value": None,
                "typed_value": [encode_shredded(el, shred[0], key_index, False)
                                for el in value]}
    if isinstance(shred, dict):
        if not isinstance(value, dict):
            return {"value": encode_value(value, key_index), "typed_value": None}
        remaining = {k: v for k, v in value.items() if k not in shred}
        if remaining and not allow_partial:
            return {"value": encode_value(value, key_index), "typed_value": None}
        # a shredded field missing from the row but present in the
        # dictionary is ambiguous for readers: fall back to binary
        if any(f not in value and f in key_index for f in shred):
            return {"value": encode_value(value, key_index), "typed_value": None}
        typed = {f: encode_shredded(value[f], shred[f], key_index, False)
                 for f in shred if f in value}
        binary = encode_value(remaining, key_index) if remaining else None
        return {"value": binary, "typed_value": typed}
    if _matches_type(value, shred):
        return {"value": None, "typed_value": value}
    return {"value": encode_value(value, key_index), "typed_value": None}


def encode_shredded_rows(values: list, shredding=None) -> tuple[list[dict], object]:
    """Column-level shredded encode: per-row metadata covering the row's
    own keys (cached by key-set signature, reference: src/variant.js:33-47).
    Returns ([{metadata, value, typed_value}...], shredding used)."""
    if shredding is None:
        shredding = detect_shredding(values)
    shredding = normalize_shredding(shredding) if shredding is not None else None
    if shredding is None or count_shred_leaves(shredding) > MAX_SHRED_LEAVES:
        meta, vals = encode_variant_rows(values)
        return [{"metadata": meta, "value": v, "typed_value": None}
                for v in vals], None
    cache: dict[tuple, tuple[bytes, dict]] = {}
    rows = []
    for v in values:
        keys: set[str] = set()
        collect_keys(v, keys)
        sig = tuple(sorted(keys))
        if sig not in cache:
            cache[sig] = build_metadata(list(sig))
        metadata, key_index = cache[sig]
        rows.append({"metadata": metadata,
                     **encode_shredded(v, shredding, key_index, True)})
    return rows, shredding


def decode_shredded(metadata: bytes, row: dict, shred):
    """Reconstruct the original value from a shredded row (merge typed
    fields with the binary remainder)."""
    value, typed = row.get("value"), row.get("typed_value")
    if typed is None:
        return None if value is None else decode_variant(metadata, value)
    if isinstance(shred, list):
        return [decode_shredded(metadata, el, shred[0]) for el in typed]
    if isinstance(shred, dict):
        out = {}
        for f in shred:
            if f in typed and typed[f] is not None:
                out[f] = decode_shredded(metadata, typed[f], shred[f])
        if value is not None:
            rem = decode_variant(metadata, value)
            if isinstance(rem, dict):
                out.update(rem)
        return out
    return typed  # scalar


# ---------- Spark column operators ----------

VARIANT_DDL = "metadata BINARY, value BINARY"


def json_to_variant_column(df, json_col: str, id_col: str):
    """JSON string column -> (id, metadata, value) variant-encoded rows.
    Arrow-batched kernel; the per-value tree walk mirrors the reference's
    per-value encoder (variant trees are inherently irregular -- this is
    the semi-structured metadata path, not the token hot path).  On Spark
    4, `F.parse_json` is the JVM-native equivalent; this operator exists
    so OUR writer can emit variant without relying on it."""
    import pandas as pd

    def enc(it):
        for pdf in it:
            metas, vals = [], []
            for s in pdf[json_col]:
                obj = None if s is None else json.loads(s)
                m, vs = encode_variant_rows([obj])
                metas.append(m)
                vals.append(vs[0])
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "metadata": metas, "value": vals})

    return df.select(id_col, json_col).mapInPandas(
        enc, f"{id_col} {dict(df.dtypes)[id_col]}, metadata binary, value binary")


_SHRED_SPARK_TYPES = {
    "BOOLEAN": "boolean", "INT32": "int", "INT64": "long", "FLOAT": "float",
    "DOUBLE": "double", "STRING": "string", "TIMESTAMP": "timestamp",
}


def shred_spark_ddl(shred) -> str:
    """Spark type DDL of the typed_value column for a shred type: every
    object field / array element is a struct<value binary, typed_value T>
    wrapper (the Variant shredding spec's parquet shape)."""
    if isinstance(shred, list):
        return f"array<struct<value: binary, typed_value: {shred_spark_ddl(shred[0])}>>"
    if isinstance(shred, dict):
        inner = ", ".join(
            f"`{k}`: struct<value: binary, typed_value: {shred_spark_ddl(v)}>"
            for k, v in shred.items())
        return f"struct<{inner}>"
    return _SHRED_SPARK_TYPES[shred]


def json_to_shredded_column(df, json_col: str, id_col: str, shredding):
    """JSON string column -> (id, metadata, value, typed_value) shredded
    variant rows: shredded fields land in TYPED Spark columns (filter/agg
    pushdown reaches them directly -- the point of shredding), the rest
    stays binary variant."""
    import pandas as pd

    shredding = normalize_shredding(shredding)
    if shredding is None:
        raise ValueError("shredding config normalized to empty")
    ddl = (f"{id_col} {dict(df.dtypes)[id_col]}, metadata binary, value binary, "
           f"typed_value {shred_spark_ddl(shredding)}")

    def enc(it):
        for pdf in it:
            objs = [None if s is None else json.loads(s) for s in pdf[json_col]]
            rows, _ = encode_shredded_rows(objs, shredding)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "metadata": [r["metadata"] for r in rows],
                "value": [r["value"] for r in rows],
                "typed_value": [r["typed_value"] for r in rows],
            })

    return df.select(id_col, json_col).mapInPandas(enc, ddl)


def _from_spark(x):
    """Normalize Arrow->pandas struct values back to plain Python."""
    import numpy as np

    if isinstance(x, dict):
        return {k: _from_spark(v) for k, v in x.items()}
    if isinstance(x, np.ndarray):
        # BEFORE the .item() fallback: a 1-element object ndarray would
        # otherwise collapse into its inner wrapper dict and the list
        # branch of decode_shredded would iterate the dict's keys
        return [_from_spark(i) for i in x.tolist()]
    if isinstance(x, (list, tuple)):
        return [_from_spark(i) for i in x]
    if isinstance(x, bytearray):
        return bytes(x)
    if hasattr(x, "item") and not isinstance(x, (bytes, str)):
        try:
            return x.item()
        except Exception:
            return x
    return x


def shredded_to_json_column(df, id_col: str, shredding):
    """Inverse of :func:`json_to_shredded_column`: merge typed fields with
    the binary remainder and re-serialize to JSON."""
    import pandas as pd

    shredding = normalize_shredding(shredding)

    def dec(it):
        for pdf in it:
            js = []
            for m, v, tv in zip(pdf["metadata"], pdf["value"], pdf["typed_value"]):
                row = {"value": None if v is None else bytes(v),
                       "typed_value": _from_spark(tv)}
                js.append(json.dumps(decode_shredded(bytes(m), row, shredding),
                                     default=_json_default))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "json": js})

    return df.select(id_col, "metadata", "value", "typed_value").mapInPandas(
        dec, f"{id_col} {dict(df.dtypes)[id_col]}, json string")


def _json_default(o):
    """JSON serializer for non-JSON variant primitives, following
    VariantVal.toJson conventions: decimals as their exact decimal string,
    dates/timestamps as ISO-8601, binary as base64."""
    import base64

    if isinstance(o, decimal.Decimal):
        return str(o)
    if isinstance(o, (datetime.datetime, datetime.date)):
        return o.isoformat()
    if isinstance(o, (bytes, bytearray)):
        return base64.b64encode(bytes(o)).decode("ascii")
    raise TypeError(f"not JSON-serializable: {type(o).__name__}")


def variant_to_json_column(df, id_col: str, *, sort_keys: bool = False):
    """(id, metadata, value) -> (id, json) decode, the inverse operator."""
    import pandas as pd

    def dec(it):
        for pdf in it:
            js = [json.dumps(decode_variant(m, v), sort_keys=sort_keys,
                             default=_json_default)
                  for m, v in zip(pdf["metadata"], pdf["value"])]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "json": js})

    return df.select(id_col, "metadata", "value").mapInPandas(
        dec, f"{id_col} {dict(df.dtypes)[id_col]}, json string")
