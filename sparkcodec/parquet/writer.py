"""Parquet file writer built on sparkcodec's own encoding kernels.

File anatomy mirrors the reference (reference: src/parquet-writer.js:
48,63-175): PAR1 magic, row groups of column chunks (optional dictionary
page + DataPageV2s), a TCompactProtocol FileMetaData footer, u32 footer
length, PAR1.  Everything is produced by this package's kernels -- the
point is that pyarrow/DuckDB then act as the cross-implementation decode
oracle for our encoders (FIXTURES.md F4(b)).

Supported: BOOLEAN, INT32, INT64, FLOAT, DOUBLE, BYTE_ARRAY (string /
binary), TIMESTAMP_MICROS, DATE, and one-level LIST columns.  Encodings:
PLAIN, RLE_DICTIONARY, DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY,
DELTA_BYTE_ARRAY, BYTE_STREAM_SPLIT; GZIP or no compression.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .. import selector as S
from ..kernels.bitpack import bit_width
from ..kernels.delta import delta_binary_pack
from ..kernels.dictionary import factorize
from ..kernels.plain import binary_buffers, plain_encode_binary, plain_encode_bool, plain_encode_numeric
from ..kernels.rle import rle_hybrid_encode
from ..kernels.strings import byte_stream_split_encode
from ..stats import binary_stats, numeric_stats, truncate_max, truncate_min
from .thrift import CT_BINARY, CT_BYTE, CT_I32, CT_I64, CT_LIST, CT_STRUCT, CT_TRUE, serialize_struct

MAGIC = b"PAR1"

# parquet enums
PT_BOOLEAN, PT_INT32, PT_INT64, PT_INT96, PT_FLOAT, PT_DOUBLE, PT_BYTE_ARRAY = 0, 1, 2, 3, 4, 5, 6
ENC_PLAIN, ENC_RLE, ENC_DELTA_BP, ENC_DELTA_LBA, ENC_DELTA_BA, ENC_RLE_DICT, ENC_BSS = 0, 3, 5, 6, 7, 8, 9
COMP_UNCOMPRESSED, COMP_GZIP = 0, 2
PAGE_DATA_V2, PAGE_DICT = 3, 2
REP_REQUIRED, REP_OPTIONAL, REP_REPEATED = 0, 1, 2
CONV_UTF8, CONV_LIST, CONV_DATE, CONV_TS_MICROS = 0, 3, 6, 10

_PAGE_BYTES = 1 << 20  # estimated-uncompressed split budget (reference: src/column.js:211-239)


class _Leaf:
    """One leaf of the schema tree.  A top-level column yields one leaf for
    primitives and lists, and one leaf PER nested primitive for structs
    (``field_indices`` walks from the column to the leaf)."""

    def __init__(self, name: str, arr_type: pa.DataType, col_index: int,
                 field_indices: tuple[int, ...] = (),
                 path: list[str] | None = None):
        self.name = name
        self.col_index = col_index
        self.field_indices = field_indices
        t = arr_type
        self.is_list = pa.types.is_list(t) or pa.types.is_large_list(t)
        if self.is_list:
            self.path = [name, "list", "element"]
            self.max_def = 3  # optional list, repeated, optional element
            self.max_rep = 1
            self.value_type = t.value_type
        else:
            self.path = path or [name]
            # every level on the path is OPTIONAL: column + each struct field
            self.max_def = 1 + len(field_indices)
            self.max_rep = 0
            self.value_type = t
        self.phys, self.conv = _physical_of(self.value_type)


def _build_leaves(schema: pa.Schema) -> list[_Leaf]:
    """Flatten the (struct-nested) schema into leaves, preorder."""
    leaves: list[_Leaf] = []

    def walk(t: pa.DataType, col_index: int, path: list[str],
             indices: tuple[int, ...]) -> None:
        if pa.types.is_struct(t):
            for i in range(t.num_fields):
                f = t.field(i)
                walk(f.type, col_index, path + [f.name], indices + (i,))
            return
        if (pa.types.is_list(t) or pa.types.is_large_list(t)) and indices:
            raise TypeError("lists nested inside structs are not supported by "
                            "the parquet file writer (the engine chunk format "
                            "handles them)")
        leaves.append(_Leaf(path[0] if not indices else path[0],
                            t, col_index,
                            field_indices=indices, path=path))

    for i, f in enumerate(schema):
        walk(f.type, i, [f.name], ())
    return leaves


def _physical_of(t: pa.DataType) -> tuple[int, int | None]:
    if pa.types.is_boolean(t):
        return PT_BOOLEAN, None
    if pa.types.is_int32(t):
        return PT_INT32, None
    if pa.types.is_int64(t):
        return PT_INT64, None
    if pa.types.is_float32(t):
        return PT_FLOAT, None
    if pa.types.is_float64(t):
        return PT_DOUBLE, None
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return PT_BYTE_ARRAY, CONV_UTF8
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return PT_BYTE_ARRAY, None
    if pa.types.is_timestamp(t):
        return PT_INT64, CONV_TS_MICROS
    if pa.types.is_date32(t):
        return PT_INT32, CONV_DATE
    raise TypeError(f"unsupported parquet leaf type {t}")


def _dremel_levels(arr: pa.Array, leaf: _Leaf) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(def_levels, rep_levels, dense leaf values) for one column.

    For flat optional columns: def in {0,1}, no rep (reference fast path
    src/dremel.js:32-37).  For one-level lists the full Dremel recursion
    collapses to offset arithmetic (SURVEY.md §1.4): per row, the first
    slot has rep 0 and later slots rep 1; def is 3 for present elements,
    1 for empty lists, 0 for null lists.
    """
    n = len(arr)
    if leaf.field_indices:
        # struct path: def level counts live ancestors until the first null
        # (physical child validity under a dead parent is masked by `alive`)
        alive = (np.asarray(arr.is_valid()) if arr.null_count
                 else np.ones(n, dtype=bool))
        d = alive.astype(np.uint64)
        cur = arr
        for idx in leaf.field_indices:
            cur = cur.field(idx)
            v = (np.asarray(cur.is_valid()) if cur.null_count
                 else np.ones(n, dtype=bool))
            step = alive & v
            d += step.astype(np.uint64)
            alive = step
        values = cur.filter(pa.array(alive)) if not alive.all() else cur
        return d, np.zeros(0, dtype=np.uint64), values
    if not leaf.is_list:
        if arr.null_count == 0:
            return np.ones(n, dtype=np.uint64), np.zeros(0, dtype=np.uint64), arr
        valid = np.asarray(arr.is_valid())
        return valid.astype(np.uint64), np.zeros(0, dtype=np.uint64), arr.drop_null()
    lens = arr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = np.asarray(arr.is_valid()) if arr.null_count else np.ones(n, dtype=bool)
    slots = np.maximum(lens, 1)  # empty/null lists still occupy one level slot
    total = int(slots.sum())
    rep = np.ones(total, dtype=np.uint64)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(slots, out=starts[1:])
    rep[starts[:-1]] = 0
    d = np.full(total, 3, dtype=np.uint64)
    empty_rows = np.flatnonzero((lens == 0) & valid)
    null_rows = np.flatnonzero(~valid)
    d[starts[:-1][empty_rows]] = 1
    d[starts[:-1][null_rows]] = 0
    values = arr.flatten()
    if values.null_count:
        # def 2 marks a present-but-null element
        elem_valid = np.asarray(values.is_valid())
        has_elems = np.flatnonzero(lens > 0)
        elem_slots = np.repeat(starts[:-1][has_elems], lens[has_elems]) + _ragged(lens[has_elems])
        d[elem_slots[~elem_valid]] = 2
        values = values.drop_null()
    return d, rep, values


def _ragged(lengths: np.ndarray) -> np.ndarray:
    total = int(lengths.sum())
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)


def _rle_levels(levels: np.ndarray, max_level: int) -> bytes:
    if max_level == 0 or len(levels) == 0:
        return b""
    return rle_hybrid_encode(levels, bit_width(max_level))


def _encode_values(values: pa.Array, phys: int, encoding: int) -> bytes:
    if phys == PT_BOOLEAN:
        return plain_encode_bool(np.asarray(values))
    if phys == PT_BYTE_ARRAY:
        offsets, data = binary_buffers(values)
        if encoding == ENC_PLAIN:
            return plain_encode_binary(values)
        # spec layouts are bare concatenations -- DELTA_BINARY_PACKED is
        # self-delimiting via its header count, so no length prefixes
        # (reference: src/delta.js:280-298, 307-364)
        if encoding == ENC_DELTA_LBA:
            lengths = np.diff(offsets.astype(np.int64))
            return delta_binary_pack(lengths) + data.tobytes()
        if encoding == ENC_DELTA_BA:
            from ..kernels.strings import _common_prefix_lengths

            offsets = offsets.astype(np.int64)
            prefix = _common_prefix_lengths(offsets, data)
            lengths = np.diff(offsets)
            suffix_len = lengths - prefix
            starts = offsets[:-1] + prefix
            keep = np.zeros(len(data) + 1, dtype=np.int8)
            np.add.at(keep, starts, 1)
            np.add.at(keep, offsets[1:], -1)
            mask = np.cumsum(keep[:-1]) > 0
            return (delta_binary_pack(prefix) + delta_binary_pack(suffix_len)
                    + data[mask].tobytes())
        raise ValueError(f"bad byte-array encoding {encoding}")
    # numeric
    np_vals = _numeric_np(values, phys)
    if encoding == ENC_PLAIN:
        dt = {PT_INT32: "int32", PT_INT64: "int64", PT_FLOAT: "float32", PT_DOUBLE: "float64"}[phys]
        return plain_encode_numeric(np_vals, dt)
    if encoding == ENC_DELTA_BP:
        return delta_binary_pack(np_vals.astype(np.int64))
    if encoding == ENC_BSS:
        return byte_stream_split_encode(np_vals, np_vals.dtype.itemsize)
    raise ValueError(f"bad numeric encoding {encoding}")


def _numeric_np(values: pa.Array, phys: int) -> np.ndarray:
    t = values.type
    if pa.types.is_timestamp(t):
        values = values.cast(pa.int64())
    elif pa.types.is_date32(t):
        values = values.cast(pa.int32())
    return values.to_numpy(zero_copy_only=False)


def _plain_single(value, phys: int) -> bytes:
    """PLAIN encoding of one value, for Statistics min/max."""
    if phys == PT_INT32:
        return int(value).to_bytes(4, "little", signed=True)
    if phys == PT_INT64:
        return int(value).to_bytes(8, "little", signed=True)
    if phys == PT_FLOAT:
        return np.float32(value).tobytes()
    if phys == PT_DOUBLE:
        return np.float64(value).tobytes()
    if phys == PT_BOOLEAN:
        return b"\x01" if value else b"\x00"
    raise ValueError


def _stats_raw(values: pa.Array, phys: int, n_logical: int):
    """(null_count, min_raw, max_raw, min_bytes, max_bytes)."""
    if phys == PT_BYTE_ARRAY:
        offsets, data = binary_buffers(values)
        st = binary_stats(offsets, data, n_logical)
        return st.null_count, st.min_value, st.max_value, st.min_value, st.max_value
    np_vals = _numeric_np(values, phys) if phys != PT_BOOLEAN else np.asarray(values)
    st = numeric_stats(np_vals, n_logical)
    mn = None if st.min_value is None else _plain_single(st.min_value, phys)
    mx = None if st.max_value is None else _plain_single(st.max_value, phys)
    return st.null_count, st.min_value, st.max_value, mn, mx


def _statistics(values: pa.Array, phys: int, n_logical: int) -> list:
    """Statistics struct fields (3: null_count, 5: max_value, 6: min_value)."""
    null_count, _, _, mn, mx = _stats_raw(values, phys, n_logical)
    return [(3, CT_I64, null_count), (5, CT_BINARY, mx), (6, CT_BINARY, mn)]


def _pick_encoding(values: pa.Array, phys: int, use_dictionary: bool):
    """(encoding, dict_values|None, indexes|None) via the chunk selector."""
    n = len(values)
    if n == 0:
        return ENC_PLAIN, None, None
    if phys == PT_BOOLEAN:
        return ENC_PLAIN, None, None
    if phys == PT_BYTE_ARRAY:
        offsets, data = binary_buffers(values)
        samp = S.sample_binary(offsets, data)
        costs = S.estimate_costs_binary(samp)
        costs.pop(S.FSST, None)
        if not use_dictionary:
            costs.pop(S.DICT, None)
        pick = S.pick(costs)
        if pick == S.DICT:
            idx, d = factorize(values, "binary")
            if len(d) <= (1 << 20):
                return ENC_RLE_DICT, d, idx
            pick = S.DELTA_LENGTH
        return {S.PLAIN: ENC_PLAIN, S.DELTA_LENGTH: ENC_DELTA_LBA,
                S.DELTA_BA: ENC_DELTA_BA}.get(pick, ENC_PLAIN), None, None
    np_vals = _numeric_np(values, phys)
    kind = np_vals.dtype.kind
    samp = S.sample_numeric(np_vals)
    costs = S.estimate_costs_numeric(samp, kind)
    # parquet has no FOR/DELTA_FOR/RLE data encoding for plain ints; map to
    # the closest spec encoding
    costs.pop(S.RLE, None)
    costs.pop(S.FOR, None)
    if kind == "f":
        costs.pop(S.DELTA_FOR, None)
        costs.pop(S.DELTA_BP, None)
    else:
        if S.DELTA_FOR in costs:
            costs[S.DELTA_BP] = min(costs.get(S.DELTA_BP, 1e18), costs.pop(S.DELTA_FOR))
    if not use_dictionary:
        costs.pop(S.DICT, None)
    pick = S.pick(costs)
    if pick == S.DICT:
        idx, d = factorize(np_vals if kind != "f" else np_vals, "numeric")
        return ENC_RLE_DICT, d, idx
    return {S.PLAIN: ENC_PLAIN, S.DELTA_BP: ENC_DELTA_BP,
            S.BSS: ENC_BSS}.get(pick, ENC_PLAIN), None, None


def _compress(data: bytes, codec: int) -> bytes:
    if codec == COMP_GZIP:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(data) + co.flush()
    return data


def _page_header_v2(num_values: int, num_nulls: int, num_rows: int, encoding: int,
                    def_len: int, rep_len: int, comp_size: int, uncomp_size: int,
                    stats_fields) -> bytes:
    dphv2 = [
        (1, CT_I32, num_values), (2, CT_I32, num_nulls), (3, CT_I32, num_rows),
        (4, CT_I32, encoding), (5, CT_I32, def_len), (6, CT_I32, rep_len),
        (7, CT_TRUE, True),
        (8, CT_STRUCT, stats_fields) if stats_fields else (8, CT_STRUCT, None),
    ]
    return serialize_struct([
        (1, CT_I32, PAGE_DATA_V2),
        (2, CT_I32, uncomp_size),
        (3, CT_I32, comp_size),
        (8, CT_STRUCT, dphv2),
    ])


def _dict_page(dict_values, phys: int, codec: int) -> tuple[bytes, int, int]:
    if phys == PT_BYTE_ARRAY:
        raw = plain_encode_binary(dict_values)
    else:
        dt = {PT_INT32: "int32", PT_INT64: "int64", PT_FLOAT: "float32",
              PT_DOUBLE: "float64"}[phys]
        raw = plain_encode_numeric(np.asarray(dict_values, dtype=dt), dt)
    comp = _compress(raw, codec)
    header = serialize_struct([
        (1, CT_I32, PAGE_DICT),
        (2, CT_I32, len(raw)),
        (3, CT_I32, len(comp)),
        (7, CT_STRUCT, [(1, CT_I32, len(dict_values)), (2, CT_I32, ENC_PLAIN)]),
    ])
    return header + comp, len(dict_values), len(header) + len(raw)


def _row_group_sizes(n_rows: int, spec) -> list[int]:
    """Row-group sizes from an int or an array-of-sizes with the LAST entry
    repeating (the reference's fast-preview shape [1000, 100000],
    reference: src/parquet-writer.js:186-216, src/write.js:23)."""
    sizes = [spec] if isinstance(spec, int) else list(spec)
    if not sizes or any(not isinstance(s, int) or s < 1 for s in sizes):
        raise ValueError(f"row-group sizes must be positive ints, got {spec!r}")
    out = []
    remaining = n_rows
    i = 0
    while remaining > 0:
        s = sizes[min(i, len(sizes) - 1)]
        take = min(s, remaining)
        out.append(take)
        remaining -= take
        i += 1
    return out


class ParquetWriter:
    """Incremental multi-call parquet writer (the reference's ParquetWriter
    class analog, reference: src/parquet-writer.js:18-176): each ``write``
    encodes row groups immediately into the output buffer (bounded memory),
    ``finish`` emits page indexes + footer + trailing magic."""

    def __init__(self, schema: pa.Schema, *, row_group_rows=1 << 20,
                 compression: str = "gzip", use_dictionary: bool = True,
                 page_bytes: int = _PAGE_BYTES,
                 kv_metadata: dict[str, str] | None = None):
        self.schema = schema
        self.codec = {"gzip": COMP_GZIP, "none": COMP_UNCOMPRESSED}[compression]
        self.row_group_rows = row_group_rows
        self.use_dictionary = use_dictionary
        self.page_bytes = page_bytes
        self.kv_metadata = kv_metadata
        self.leaves: list[_Leaf] | None = None
        self.out = bytearray(MAGIC)
        self.row_groups: list = []
        self.n_rows = 0
        self._finished = False

    def write(self, table: pa.Table) -> None:
        if self._finished:
            raise RuntimeError("writer already finished")
        table = table.combine_chunks()
        if self.leaves is None:
            self.leaves = _build_leaves(table.schema)
        start = 0
        for size in _row_group_sizes(len(table), self.row_group_rows):
            rg = table.slice(start, size)
            start += size
            chunk_infos = []
            total_bytes = 0
            for leaf in self.leaves:
                col = rg.column(leaf.col_index)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                info = _write_column_chunk(self.out, col, leaf, self.codec,
                                           self.use_dictionary, self.page_bytes)
                chunk_infos.append(info)
                total_bytes += info["total_comp"]
            self.row_groups.append((chunk_infos, total_bytes, len(rg)))
            self.n_rows += len(rg)

    def finish(self) -> bytes:
        if self._finished:
            raise RuntimeError("writer already finished")
        self._finished = True
        if self.leaves is None:
            self.leaves = _build_leaves(self.schema)
        out = self.out
        # page indexes: all ColumnIndexes, then all OffsetIndexes, after the
        # row groups and before the footer (reference: src/indexes.js:15-22);
        # skipped for single-page chunks (reference: src/indexes.js:31)
        for chunk_infos, _, _ in self.row_groups:
            for info in chunk_infos:
                if len(info["pages"]) > 1:
                    ci = _column_index_bytes(info)
                    info["column_index_offset"] = len(out)
                    info["column_index_length"] = len(ci)
                    out.extend(ci)
        for chunk_infos, _, _ in self.row_groups:
            for info in chunk_infos:
                if len(info["pages"]) > 1:
                    oi = _offset_index_bytes(info)
                    info["offset_index_offset"] = len(out)
                    info["offset_index_length"] = len(oi)
                    out.extend(oi)
        rg_structs = [([_chunk_struct(info) for info in chunk_infos], tb, nr)
                      for chunk_infos, tb, nr in self.row_groups]
        footer = _file_metadata(self.schema, self.leaves, rg_structs, self.n_rows,
                                self.kv_metadata)
        out.extend(footer)
        out.extend(len(footer).to_bytes(4, "little"))
        out.extend(MAGIC)
        return bytes(out)


def write_parquet_bytes(table: pa.Table, *, row_group_rows=1 << 20,
                        compression: str = "gzip", use_dictionary: bool = True,
                        page_bytes: int = _PAGE_BYTES,
                        kv_metadata: dict[str, str] | None = None) -> bytes:
    """Serialize a pyarrow Table to parquet bytes using our own encoders.

    ``row_group_rows`` may be an int or an array of sizes with the last
    repeating (reference fast-preview shape, e.g. [1000, 100000])."""
    w = ParquetWriter(table.schema, row_group_rows=row_group_rows,
                      compression=compression, use_dictionary=use_dictionary,
                      page_bytes=page_bytes, kv_metadata=kv_metadata)
    if len(table):
        w.write(table)
    return w.finish()


def _boundary_order(pages: list[dict]) -> int:
    mins = [p["min_raw"] for p in pages if p["min_raw"] is not None]
    maxs = [p["max_raw"] for p in pages if p["max_raw"] is not None]
    if len(mins) < 2:
        return 0  # UNORDERED
    try:
        asc = all(mins[i] <= mins[i + 1] for i in range(len(mins) - 1)) and \
            all(maxs[i] <= maxs[i + 1] for i in range(len(maxs) - 1))
        desc = all(mins[i] >= mins[i + 1] for i in range(len(mins) - 1)) and \
            all(maxs[i] >= maxs[i + 1] for i in range(len(maxs) - 1))
    except TypeError:
        return 0
    if asc:
        return 1
    if desc:
        return 2
    return 0


def _column_index_bytes(info: dict) -> bytes:
    pages = info["pages"]
    null_pages = [p["min_bytes"] is None for p in pages]
    min_values = [p["min_bytes"] if p["min_bytes"] is not None else b"" for p in pages]
    max_values = [p["max_bytes"] if p["max_bytes"] is not None else b"" for p in pages]
    return serialize_struct([
        (1, CT_LIST, ("bool", null_pages)),
        (2, CT_LIST, ("binary", min_values)),
        (3, CT_LIST, ("binary", max_values)),
        (4, CT_I32, _boundary_order(pages)),
        (5, CT_LIST, ("i64", [p["null_count"] for p in pages])),
    ])


def _offset_index_bytes(info: dict) -> bytes:
    locs = [[(1, CT_I64, p["offset"]), (2, CT_I32, p["size"]),
             (3, CT_I64, p["first_row"])] for p in info["pages"]]
    return serialize_struct([(1, CT_LIST, ("struct", locs))])


def _chunk_struct(info: dict):
    col_meta = [
        (1, CT_I32, info["phys"]),
        (2, CT_LIST, ("i32", info["encodings"])),
        (3, CT_LIST, ("binary", info["path"])),
        (4, CT_I32, info["codec"]),
        (5, CT_I64, info["n_slots"]),
        (6, CT_I64, info["uncomp_total"]),
        (7, CT_I64, info["total_comp"]),
        (9, CT_I64, info["data_offset"]),
        (11, CT_I64, info["dict_offset"]),
        (12, CT_STRUCT, info["stats_all"]),
    ]
    return [
        (2, CT_I64, info["chunk_start"]),
        (3, CT_STRUCT, col_meta),
        (4, CT_I64, info.get("offset_index_offset")),
        (5, CT_I32, info.get("offset_index_length")),
        (6, CT_I64, info.get("column_index_offset")),
        (7, CT_I32, info.get("column_index_length")),
    ]


def _write_column_chunk(out: bytearray, arr: pa.Array, leaf: _Leaf, codec: int,
                        use_dictionary: bool, page_bytes: int):
    d, r, values = _dremel_levels(arr, leaf)
    n_slots = len(d) if leaf.max_def else len(arr)
    num_nulls = n_slots - len(values)
    encoding, dict_vals, indexes = _pick_encoding(values, leaf.phys, use_dictionary)

    chunk_start = len(out)
    dict_offset = None
    encodings = [ENC_PLAIN]
    uncomp_total = 0
    if dict_vals is not None:
        dict_offset = len(out)
        page, _, dict_uncomp = _dict_page(dict_vals, leaf.phys, codec)
        out.extend(page)
        uncomp_total += dict_uncomp
        encodings = [ENC_PLAIN, ENC_RLE_DICT]

    data_offset = len(out)
    # single V2 page per chunk for <= page budget, else split on row bounds
    pages = _page_spans(arr, leaf, page_bytes)
    vpos = 0
    first_row = 0
    pages_info = []
    for (row_lo, row_hi) in pages:
        sub = arr.slice(row_lo, row_hi - row_lo)
        dd, rr, vv = _dremel_levels(sub, leaf)
        def_bytes = _rle_levels(dd, leaf.max_def)
        rep_bytes = _rle_levels(rr, leaf.max_rep)
        if indexes is not None:
            idx = indexes[vpos:vpos + len(vv)]
            bw = max(1, bit_width(max(len(dict_vals) - 1, 0)))
            raw = bytes([bw]) + rle_hybrid_encode(idx.astype(np.uint64), bw)
            enc_tag = ENC_RLE_DICT
        else:
            raw = _encode_values(vv, leaf.phys, encoding)
            enc_tag = encoding
        comp = _compress(raw, codec)
        n_page_slots = len(dd) if leaf.max_def else len(sub)
        null_count, mn_raw, mx_raw, mn_b, mx_b = _stats_raw(vv, leaf.phys, n_page_slots)
        stats = [(3, CT_I64, null_count), (5, CT_BINARY, mx_b), (6, CT_BINARY, mn_b)]
        header = _page_header_v2(
            num_values=n_page_slots,
            num_nulls=(len(dd) - len(vv)) if leaf.max_def else 0,
            num_rows=len(sub), encoding=enc_tag,
            def_len=len(def_bytes), rep_len=len(rep_bytes),
            comp_size=len(comp) + len(def_bytes) + len(rep_bytes),
            uncomp_size=len(raw) + len(def_bytes) + len(rep_bytes),
            stats_fields=stats)
        page_offset = len(out)
        out.extend(header)
        out.extend(rep_bytes)
        out.extend(def_bytes)
        out.extend(comp)
        uncomp_total += len(header) + len(rep_bytes) + len(def_bytes) + len(raw)
        pages_info.append({
            "offset": page_offset, "size": len(out) - page_offset,
            "first_row": first_row, "null_count": null_count,
            "min_raw": mn_raw, "max_raw": mx_raw,
            "min_bytes": mn_b, "max_bytes": mx_b,
        })
        first_row += len(sub)
        vpos += len(vv)

    total_comp = len(out) - chunk_start
    enc_final = ENC_RLE_DICT if indexes is not None else encoding
    return {
        "phys": leaf.phys,
        "path": leaf.path,
        "codec": codec,
        "n_slots": n_slots,
        "uncomp_total": uncomp_total,
        "total_comp": total_comp,
        "chunk_start": chunk_start,
        "data_offset": data_offset,
        "dict_offset": dict_offset,
        "encodings": sorted({ENC_RLE, enc_final} | set(encodings)),
        "stats_all": _statistics(values, leaf.phys, n_slots),
        "pages": pages_info,
    }


def _page_spans(arr: pa.Array, leaf: _Leaf, page_bytes: int) -> list[tuple[int, int]]:
    """Greedy page split on estimated uncompressed bytes (reference E13:
    src/column.js:211-239), on row boundaries."""
    n = len(arr)
    if n == 0:
        return [(0, 0)]
    if leaf.field_indices:
        for idx in leaf.field_indices:
            arr = arr.field(idx)  # size estimate only; dead-parent slots ok
    if leaf.is_list:
        lens = arr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        width = 4 if leaf.phys in (PT_INT32, PT_FLOAT) else 8
        sizes = lens * width + 1
    elif leaf.phys == PT_BYTE_ARRAY:
        import pyarrow.compute as pc

        sizes = pc.binary_length(arr.cast(pa.large_binary()) if not (
            pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type))
            else arr).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64) + 4
    elif leaf.phys == PT_BOOLEAN:
        sizes = np.full(n, 1, dtype=np.int64)
    else:
        width = 4 if leaf.phys in (PT_INT32, PT_FLOAT) else 8
        sizes = np.full(n, width, dtype=np.int64)
    cum = np.cumsum(sizes)
    spans = []
    start = 0
    while start < n:
        target = (cum[start - 1] if start else 0) + page_bytes
        end = int(np.searchsorted(cum, target, side="left")) + 1
        end = max(start + 1, min(end, n))
        spans.append((start, end))
        start = end
    return spans


def _file_metadata(schema: pa.Schema, leaves: list[_Leaf], row_groups, n_rows: int,
                   kv_metadata: dict[str, str] | None = None) -> bytes:
    # preorder schema tree; struct columns emit nested groups
    elements = [_schema_element("root", None, None, len(schema), None)]

    def emit(name: str, t: pa.DataType) -> None:
        if pa.types.is_struct(t):
            elements.append(_schema_element(name, None, REP_OPTIONAL, t.num_fields, None))
            for i in range(t.num_fields):
                f = t.field(i)
                emit(f.name, f.type)
            return
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            elements.append(_schema_element(name, None, REP_OPTIONAL, 1, CONV_LIST))
            elements.append(_schema_element("list", None, REP_REPEATED, 1, None))
            phys, conv = _physical_of(t.value_type)
            elements.append(_schema_element("element", phys, REP_OPTIONAL, None, conv))
            return
        phys, conv = _physical_of(t)
        elements.append(_schema_element(name, phys, REP_OPTIONAL, None, conv))

    for f in schema:
        emit(f.name, f.type)
    rgs = []
    for cols_meta, total_bytes, nr in row_groups:
        rgs.append([
            (1, CT_LIST, ("struct", cols_meta)),
            (2, CT_I64, total_bytes),
            (3, CT_I64, nr),
        ])
    # column_orders (TypeDefinedOrder per leaf) -- required for readers to
    # trust min_value/max_value statistics
    orders = [[(1, CT_STRUCT, [])] for _ in leaves]
    kvs = None
    if kv_metadata:
        kvs = ("struct", [[(1, CT_BINARY, k), (2, CT_BINARY, v)]
                          for k, v in sorted(kv_metadata.items())])
    return serialize_struct([
        (1, CT_I32, 2),
        (2, CT_LIST, ("struct", elements)),
        (3, CT_I64, n_rows),
        (4, CT_LIST, ("struct", rgs)),
        (5, CT_LIST, kvs),
        (6, CT_BINARY, "sparkcodec"),
        (7, CT_LIST, ("struct", orders)),
    ])


def write_partitioned_parquet(df, out_dir: str, *, compression: str = "gzip",
                              use_dictionary: bool = True,
                              row_group_rows: int = 1 << 20):
    """Spark sink: each partition writes one parquet file produced by OUR
    encoders (the reference's file-sink analog, reference: src/node.js:16-70).
    Returns a DataFrame of (path, n_rows, n_bytes) manifest rows."""
    import os
    import uuid

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)

    def sink(batches):
        import pyarrow as pa

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        tbls = list(batches)
        if not tbls:
            return
        table = pa.Table.from_batches(tbls)
        buf = write_parquet_bytes(table, compression=compression,
                                  use_dictionary=use_dictionary,
                                  row_group_rows=row_group_rows)
        path = os.path.join(out_dir, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.rename(tmp, path)
        yield pa.RecordBatch.from_pylist(
            [{"path": path, "n_rows": len(table), "n_bytes": len(buf)}],
            schema=pa.schema([("path", pa.string()), ("n_rows", pa.int64()),
                              ("n_bytes", pa.int64())]))

    return df.mapInArrow(sink, "path string, n_rows long, n_bytes long")


def _schema_element(name: str, phys: int | None, rep: int | None,
                    num_children: int | None, conv: int | None):
    return [
        (1, CT_I32, phys),
        (3, CT_I32, rep),
        (4, CT_BINARY, name),
        (5, CT_I32, num_children),
        (6, CT_I32, conv),
    ]
