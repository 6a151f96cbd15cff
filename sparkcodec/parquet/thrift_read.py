"""Minimal TCompactProtocol reader (generic, tag-based).

Used in tests to verify structures that mainstream readers don't expose
through Python APIs (ColumnIndex / OffsetIndex page indexes).  Returns
structs as {field_id: value} dicts, mirroring the reference reader's
generic decoding approach.
"""

from __future__ import annotations

import struct

from ..kernels.varint import read_uvarint, unzigzag_int

CT_STOP, CT_TRUE, CT_FALSE, CT_BYTE, CT_I16, CT_I32, CT_I64, CT_DOUBLE, \
    CT_BINARY, CT_LIST, CT_SET, CT_MAP, CT_STRUCT = range(13)


def read_struct(mv, pos: int) -> tuple[dict, int]:
    out: dict[int, object] = {}
    last_id = 0
    while True:
        byte = mv[pos]
        pos += 1
        if byte == CT_STOP:
            return out, pos
        delta = byte >> 4
        ctype = byte & 0x0F
        if delta == 0:
            zz, pos = read_uvarint(mv, pos)
            fid = unzigzag_int(zz)
        else:
            fid = last_id + delta
        last_id = fid
        value, pos = _read_value(mv, pos, ctype)
        out[fid] = value


def _read_value(mv, pos: int, ctype: int):
    if ctype == CT_TRUE:
        return True, pos
    if ctype == CT_FALSE:
        return False, pos
    if ctype == CT_BYTE:
        return mv[pos], pos + 1
    if ctype in (CT_I16, CT_I32, CT_I64):
        zz, pos = read_uvarint(mv, pos)
        return unzigzag_int(zz), pos
    if ctype == CT_DOUBLE:
        return struct.unpack_from("<d", mv, pos)[0], pos + 8
    if ctype == CT_BINARY:
        ln, pos = read_uvarint(mv, pos)
        return bytes(mv[pos : pos + ln]), pos + ln
    if ctype == CT_STRUCT:
        return read_struct(mv, pos)
    if ctype == CT_LIST:
        header = mv[pos]
        pos += 1
        n = header >> 4
        etype = header & 0x0F
        if n == 15:
            n, pos = read_uvarint(mv, pos)
        items = []
        for _ in range(n):
            if etype in (CT_TRUE, CT_FALSE):
                items.append(mv[pos] == CT_TRUE)
                pos += 1
            else:
                v, pos = _read_value(mv, pos, etype)
                items.append(v)
        return items, pos
    raise ValueError(f"unsupported compact type {ctype}")
