"""Schema inference (reference §1.3 semantics) and nested struct/list
column support in the engine."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sparkcodec.schema import SchemaError, infer_column_type, infer_schema, table_from_columns


# ---------- inference ----------

def test_infer_basic_types():
    sch = infer_schema({
        "i": [1, 2, 3],
        "big": [2**40, 1],
        "f": [1.5, 2.5],
        "b": [True, False],
        "s": ["a", "b"],
        "raw": [b"x"],
        "l": [[1, 2], [3]],
    })
    assert sch.field("i").type == pa.int32()
    assert sch.field("big").type == pa.int64()
    assert sch.field("f").type == pa.float64()
    assert sch.field("b").type == pa.bool_()
    assert sch.field("s").type == pa.large_string()
    assert sch.field("raw").type == pa.large_binary()
    assert sch.field("l").type == pa.list_(pa.int32())


def test_infer_int_double_widening():
    t, _ = infer_column_type([1, 2, 3.5])
    assert t == pa.float64()  # INT32 -> DOUBLE widening (src/schema.js:225-228)
    t, _ = infer_column_type([1, 2**40])
    assert t == pa.int64()


def test_infer_nullability_and_all_null():
    t, nullable = infer_column_type([1, None, 3])
    assert nullable
    t, nullable = infer_column_type([None, None])
    assert t == pa.large_binary() and nullable  # src/schema.js:234-239


def test_infer_mixed_incompatible_raises():
    with pytest.raises(SchemaError, match="mixed"):
        infer_column_type(["a", 1])
    with pytest.raises(SchemaError, match="mixed"):
        infer_column_type([True, 1.5])


def test_infer_samples_first_1000_only():
    vals = [1] * 1000 + ["late-surprise"]
    t, _ = infer_column_type(vals)  # the string is beyond the sample window
    assert t == pa.int32()


def test_table_from_columns_roundtrips_through_engine():
    from sparkcodec.engine import decode_chunk_group, encode_chunk_group

    tbl = table_from_columns({
        "id": list(range(100)),
        "name": [f"u{i}" for i in range(100)],
        "score": [i / 7 for i in range(100)],
        "tags": [[i, i + 1] for i in range(100)],
    })
    blob, metas, pairs, _ = encode_chunk_group(tbl)
    back = decode_chunk_group(blob, pairs)
    assert back.to_pylist() == tbl.to_pylist()  # values exact (schema may
    # differ in nullability flags / string flavor)


# ---------- struct columns ----------

def test_struct_column_roundtrip_local():
    from sparkcodec.engine import decode_chunk_group, encode_chunk_group

    props = pa.array(
        [{"a": i, "b": f"s{i % 5}", "c": i * 0.5} for i in range(500)],
        type=pa.struct([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())]),
    )
    tbl = pa.table({"id": pa.array(np.arange(500)), "props": props})
    blob, metas, pairs, _ = encode_chunk_group(tbl)
    assert metas["props"]["kind"] == "struct"
    back = decode_chunk_group(blob, pairs)
    assert back.column(1).to_pylist() == props.to_pylist()


def test_struct_with_nulls_and_nested():
    from sparkcodec.engine import decode_chunk_group, encode_chunk_group

    t = pa.struct([("x", pa.int32()),
                   ("inner", pa.struct([("y", pa.string())])),
                   ("lst", pa.list_(pa.int32()))])
    vals = [
        {"x": 1, "inner": {"y": "a"}, "lst": [1, 2]},
        None,
        {"x": None, "inner": None, "lst": []},
        {"x": 4, "inner": {"y": None}, "lst": None},
    ]
    arr = pa.array(vals, type=t)
    tbl = pa.table({"s": arr})
    blob, metas, pairs, _ = encode_chunk_group(tbl)
    back = decode_chunk_group(blob, pairs)
    assert back.column(0).to_pylist() == arr.to_pylist()


def test_struct_column_roundtrip_spark(spark):
    from pyspark.sql import functions as F

    from sparkcodec.engine import decode_dataframe, encode_dataframe

    sdf = spark.range(2000).select(
        F.col("id"),
        F.struct(
            (F.col("id") % 7).alias("bucket"),
            F.concat(F.lit("n"), F.col("id")).alias("label"),
            F.array(F.col("id"), F.col("id") * 2).alias("pair"),
        ).alias("props"),
    )
    dec = decode_dataframe(encode_dataframe(sdf))
    a = [(r["id"], r["props"]["bucket"], r["props"]["label"], list(r["props"]["pair"]))
         for r in sdf.orderBy("id").collect()]
    b = [(r["id"], r["props"]["bucket"], r["props"]["label"], list(r["props"]["pair"]))
         for r in dec.orderBy("id").collect()]
    assert a == b


def test_list_of_struct_roundtrip():
    from sparkcodec.engine import decode_chunk_group, encode_chunk_group

    t = pa.list_(pa.struct([("k", pa.string()), ("v", pa.int64())]))
    vals = [[{"k": "a", "v": 1}, {"k": "b", "v": 2}], [], None, [{"k": None, "v": None}]]
    tbl = pa.table({"m": pa.array(vals, type=t)})
    blob, metas, pairs, _ = encode_chunk_group(tbl)
    back = decode_chunk_group(blob, pairs)
    assert back.column(0).to_pylist() == tbl.column(0).to_pylist()


def test_rows_to_table_windows():
    from sparkcodec.schema import rows_to_table

    def gen():
        for i in range(2500):
            yield {"id": i, "name": f"r{i}", "score": i / 3}

    tables = list(rows_to_table(gen(), window=1000))
    assert [len(t) for t in tables] == [1000, 1000, 500]
    assert tables[0].schema == tables[2].schema
    # windows concatenate back to the full data (byte-identical columnar
    # equivalence, reference: test/write.rows.test.js:26-33)
    all_ids = [v for t in tables for v in t.column("id").to_pylist()]
    assert all_ids == list(range(2500))


def test_rows_to_table_empty():
    from sparkcodec.schema import rows_to_table

    assert list(rows_to_table(iter([]))) == []


def test_map_column_roundtrip_spark(spark):
    from pyspark.sql import functions as F

    from sparkcodec.engine import decode_dataframe, encode_dataframe

    sdf = spark.range(1500).select(
        "id",
        F.when(F.col("id") % 7 == 0, None).otherwise(
            F.create_map(F.lit("k1"), F.col("id"),
                         F.lit("k2"), F.col("id") * 2)).alias("props"),
    )
    dec = decode_dataframe(encode_dataframe(sdf))
    a = {r["id"]: (dict(r["props"]) if r["props"] is not None else None)
         for r in sdf.collect()}
    b = {r["id"]: (dict(r["props"]) if r["props"] is not None else None)
         for r in dec.collect()}
    assert a == b


def test_map_column_local_edges():
    import pyarrow as pa

    from sparkcodec.engine import decode_chunk_group, encode_chunk_group

    m = pa.array([{"a": 1}, None, {}, {"x": None}, {"y": 5, "z": 6}],
                 type=pa.map_(pa.string(), pa.int32()))
    tbl = pa.table({"m": m})
    blob, metas, pairs, _ = encode_chunk_group(tbl)
    back = decode_chunk_group(blob, pairs)
    assert back.column(0).to_pylist() == m.to_pylist()
    assert metas["m"]["kind"] == "map"


def test_rows_to_table_heterogeneous_keys():
    """Rows with differing key sets: the schema freezes from the FIRST
    window's key union; later windows fill missing keys with nulls and
    ignore unknown keys (code-review r3 finding: KeyError on windows whose
    first row lacked a column)."""
    from sparkcodec.schema import rows_to_table

    rows = [{"a": 1, "b": 2}] * 3 + [{"a": 3}] * 2 + [{"a": 4, "c": 9}]
    tables = list(rows_to_table(iter(rows), window=3))
    assert len(tables) == 2
    assert tables[0].column_names == ["a", "b"]
    assert tables[1].column("b").to_pylist() == [None, None, None]
    assert "c" not in tables[1].column_names
    # first-window union: a key missing from row 0 but present later
    rows2 = [{"a": 1}, {"a": 2, "b": 5}]
    t2 = next(rows_to_table(iter(rows2), window=10))
    assert t2.column("b").to_pylist() == [None, 5]


def test_nested_list_inference_raises_schema_error():
    import pytest as _pytest

    from sparkcodec.schema import SchemaError, infer_schema

    with _pytest.raises(SchemaError, match="nested list"):
        infer_schema({"c": [[[1, 2], [3]]]})
