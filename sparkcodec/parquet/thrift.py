"""Thrift TCompactProtocol serializer (write-only).

Same wire grammar as the reference's generic serializer (reference:
src/thrift.js:26-149): zigzag varint ints, length-prefixed binaries,
short/long list headers, field-id delta encoding with explicit zigzag ids
for deltas > 15, booleans folded into the field type nibble.

The API is data-driven: a struct is a list of (field_id, type, value)
tuples with field ids strictly increasing (the reference validates the
same monotonicity, src/thrift.js:40-44).
"""

from __future__ import annotations

from ..kernels.varint import write_uvarint, zigzag_int

# compact-protocol type nibbles
CT_STOP = 0
CT_TRUE = 1
CT_FALSE = 2
CT_BYTE = 3
CT_I16 = 4
CT_I32 = 5
CT_I64 = 6
CT_DOUBLE = 7
CT_BINARY = 8
CT_LIST = 9
CT_STRUCT = 12

# element-type names used in (LIST, (elem, values)) payloads
_ELEM = {"i32": CT_I32, "i64": CT_I64, "binary": CT_BINARY, "struct": CT_STRUCT,
         "bool": CT_TRUE}


def _write_value(out: bytearray, ctype: int, value) -> None:
    if ctype in (CT_I16, CT_I32, CT_I64):
        write_uvarint(out, zigzag_int(int(value)))
    elif ctype == CT_BYTE:
        out.append(value & 0xFF)
    elif ctype == CT_DOUBLE:
        import struct

        out.extend(struct.pack("<d", value))
    elif ctype == CT_BINARY:
        data = value.encode() if isinstance(value, str) else bytes(value)
        write_uvarint(out, len(data))
        out.extend(data)
    elif ctype == CT_STRUCT:
        write_struct(out, value)
    elif ctype == CT_LIST:
        elem_name, items = value
        etype = _ELEM[elem_name]
        n = len(items)
        if n < 15:
            out.append((n << 4) | etype)
        else:
            out.append(0xF0 | etype)
            write_uvarint(out, n)
        if elem_name == "bool":
            for it in items:
                out.append(CT_TRUE if it else CT_FALSE)
        else:
            for it in items:
                _write_value(out, etype, it)
    elif ctype in (CT_TRUE, CT_FALSE):
        out.append(CT_TRUE if value else CT_FALSE)
    else:
        raise ValueError(f"unsupported compact type {ctype}")


def write_struct(out: bytearray, fields) -> None:
    """fields: iterable of (field_id, ctype, value); ids strictly increasing.
    Values of None are skipped (optional fields)."""
    last_id = 0
    for fid, ctype, value in fields:
        if value is None:
            continue
        if fid <= last_id:
            raise ValueError(f"field ids must increase: {fid} after {last_id}")
        wire_type = ctype
        if ctype in (CT_TRUE, CT_FALSE):
            wire_type = CT_TRUE if value else CT_FALSE
        delta = fid - last_id
        if delta <= 15:
            out.append((delta << 4) | wire_type)
        else:
            out.append(wire_type)
            write_uvarint(out, zigzag_int(fid))
        if ctype not in (CT_TRUE, CT_FALSE):
            _write_value(out, ctype, value)
        last_id = fid
    out.append(CT_STOP)


def serialize_struct(fields) -> bytes:
    out = bytearray()
    write_struct(out, fields)
    return bytes(out)
