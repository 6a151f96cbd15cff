"""Schema inference from raw column data (reference parity: §1.3).

Mirrors the reference's `schemaFromColumnData` semantics (reference:
src/schema.js:63-66, 179-241): infer each column's type from a sample of
the first 1000 values; widen INT32 -> DOUBLE when floats and ints mix
(src/schema.js:225-228); mark OPTIONAL if any sampled value is null
(src/schema.js:193-195); raise on incompatible mixed types
(src/schema.js:229-231); all-null columns default to OPTIONAL BYTE_ARRAY
(src/schema.js:234-239).  Per-column overrides merge into inference
(src/schema.js:25-41).

Output is a pyarrow schema (our engine's native currency); a Spark
StructType is derivable via ``sparkcodec.engine.spark_schema_from_names``.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa

SAMPLE_N = 1000  # reference: src/schema.js:66


class SchemaError(TypeError):
    pass


_WIDEN = {
    ("int32", "int64"): "int64",
    ("int32", "float64"): "float64",   # INT32 -> DOUBLE widening
    ("int64", "float64"): "float64",
}

_PA = {
    "bool": pa.bool_(), "int32": pa.int32(), "int64": pa.int64(),
    "float64": pa.float64(), "string": pa.large_string(),
    "binary": pa.large_binary(), "timestamp": pa.timestamp("us"),
    "date": pa.date32(),
}


def _kind_of(v) -> str:
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "bool"
    if isinstance(v, (int, np.integer)):
        iv = int(v)
        return "int32" if -(2**31) <= iv < 2**31 else "int64"
    if isinstance(v, (float, np.floating)):
        return "float64"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (bytes, bytearray)):
        return "binary"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    raise SchemaError(f"cannot infer a type from value {v!r} ({type(v).__name__})")


def _merge(a: str | None, b: str) -> str:
    if a is None or a == b:
        return b
    if (a, b) in _WIDEN:
        return _WIDEN[(a, b)]
    if (b, a) in _WIDEN:
        return _WIDEN[(b, a)]
    raise SchemaError(f"mixed incompatible types: {a} vs {b}")


def infer_column_type(values, override: pa.DataType | None = None) -> tuple[pa.DataType, bool]:
    """(arrow type, nullable) inferred from the first SAMPLE_N values."""
    if override is not None:
        return override, True
    sample = values[:SAMPLE_N]
    kind: str | None = None
    elem_kind: str | None = None
    nullable = False
    for v in sample:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            nullable = True
            continue
        k = _kind_of(v)
        if k == "list":
            if kind not in (None, "list"):
                raise SchemaError(f"mixed incompatible types: {kind} vs list")
            kind = "list"
            for e in list(v)[:16]:
                if e is None:
                    continue
                elem_kind = _merge(elem_kind, _kind_of(e))
            continue
        kind = _merge(kind, k)
    if kind is None:
        # all-null column -> OPTIONAL BYTE_ARRAY (reference: src/schema.js:234-239)
        return pa.large_binary(), True
    if kind == "list":
        if elem_kind is not None and elem_kind not in _PA:
            raise SchemaError(
                f"cannot infer nested list element type {elem_kind!r}; "
                "pass an explicit override for this column")
        return pa.list_(_PA[elem_kind or "int32"]), nullable
    return _PA[kind], nullable


def infer_schema(column_data: dict[str, list],
                 overrides: dict[str, pa.DataType] | None = None) -> pa.Schema:
    """Infer a pyarrow schema for a dict of name -> values."""
    overrides = overrides or {}
    fields = []
    for name, values in column_data.items():
        typ, nullable = infer_column_type(values, overrides.get(name))
        fields.append(pa.field(name, typ, nullable=nullable))
    return pa.schema(fields)


def table_from_columns(column_data: dict[str, list],
                       overrides: dict[str, pa.DataType] | None = None) -> pa.Table:
    """ColumnSource[]-style entry: dict of plain columns -> typed Table
    (the reference's columnar input shape, reference: src/types.d.ts:47-58)."""
    schema = infer_schema(column_data, overrides)
    arrays = []
    for field in schema:
        vals = column_data[field.name]
        if field.type == pa.int32():
            vals = [None if v is None else int(v) for v in vals]
        arrays.append(pa.array(vals, type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def rows_to_table(rows, overrides: dict[str, pa.DataType] | None = None,
                  window: int = 100_000):
    """Row-object iterable -> pyarrow Tables, one per window (the
    reference's parquetWriteRows adapter analog, reference:
    src/write-rows.js:36-178: windows are transposed to columns one row
    group at a time with one-group backpressure; here each yielded Table
    is one such window -- generators are never read ahead)."""
    it = iter(rows)
    schema = None
    while True:
        window_rows = []
        for r in it:
            window_rows.append(r)
            if len(window_rows) >= window:
                break
        if not window_rows:
            return
        if schema is None:
            # keys from the UNION over the first window's rows (not just
            # the first row: rows may carry heterogeneous key sets)
            keys: list[str] = []
            seen = set()
            for r in window_rows:
                for k in r:
                    if k not in seen:
                        seen.add(k)
                        keys.append(k)
            cols = {k: [r.get(k) for r in window_rows] for k in keys}
            schema = infer_schema(cols, overrides)
        # later windows fill the FROZEN schema: missing keys are nulls,
        # unknown keys are ignored (the schema is fixed after window 1,
        # as in the reference's row adapter)
        arrays = [pa.array([r.get(f.name) for r in window_rows], type=f.type)
                  for f in schema]
        yield pa.Table.from_arrays(arrays, schema=schema)
