"""Variant binary codec (reference: src/variant.js): roundtrip through our
own encode/decode, cross-checked against Spark's NATIVE VariantVal --
bytes we produce must parse with Spark, bytes Spark produces (parse_json)
must decode with us."""

from __future__ import annotations

import datetime
import decimal
import json

import pytest
from pyspark.sql.types import VariantVal

from sparkcodec.variant import (
    build_metadata,
    decode_metadata,
    decode_variant,
    encode_value,
    encode_variant_rows,
    json_to_variant_column,
    variant_to_json_column,
)

CASES = [
    None, True, False, 0, -5, 127, -128, 300, -70000, 2**40, -(2**62),
    1.5, -0.25, "", "short", "x" * 100, b"\x00\x01\xff",
    [1, "a", None, [True, 2.5]], {"b": 1, "a": {"c": [1, 2, 3]}, "z": None},
    {"k": 69}, [{"a": 1}, {"b": 2}], list(range(300)),
]


def _deep(x):
    if isinstance(x, dict):
        return {k: _deep(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_deep(i) for i in x]
    if isinstance(x, (bytes, bytearray)):
        return bytes(x)
    if isinstance(x, decimal.Decimal):
        return float(x)
    return x


def test_roundtrip_and_spark_reads_our_bytes():
    meta, vals = encode_variant_rows(CASES)
    for c, v in zip(CASES, vals):
        assert decode_variant(meta, v) == c
        assert _deep(VariantVal(v, meta).toPython()) == _deep(c)


def test_our_decode_reads_spark_bytes():
    for js in ['{"k": 69}', '[1.5, true, null, "x"]',
               '{"a": {"b": [1, 2.25]}, "c": "yo"}',
               '123456789012345678901234567890', '"plain"', 'null']:
        vv = VariantVal.parseJson(js)
        assert _deep(decode_variant(vv.metadata, vv.value)) == _deep(vv.toPython())


def test_metadata_dictionary_sorted_and_shared():
    meta, key_index = build_metadata(["zz", "aa", "mm"])
    assert decode_metadata(meta) == ["aa", "mm", "zz"]
    assert key_index == {"aa": 0, "mm": 1, "zz": 2}
    # object field ids sort ascending in the value bytes (spec requirement)
    v = encode_value({"zz": 1, "aa": 2}, key_index)
    assert decode_variant(meta, v) == {"zz": 1, "aa": 2}


def test_temporal_values():
    meta, vals = encode_variant_rows([
        datetime.date(2024, 2, 29),
        datetime.datetime(2024, 1, 1, 12, 30, 0, 123456),
    ])
    assert decode_variant(meta, vals[0]) == datetime.date(2024, 2, 29)
    assert decode_variant(meta, vals[1]) == datetime.datetime(2024, 1, 1, 12, 30, 0, 123456)


def test_int64_overflow_raises():
    with pytest.raises(OverflowError):
        encode_variant_rows([2**63])


def test_spark_column_operators(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "props").limit(200)
    enc = json_to_variant_column(ev, "props", "event_id")
    dec = variant_to_json_column(enc, "event_id")
    got = {r["event_id"]: r["json"] for r in dec.collect()}
    exp = {r["event_id"]: json.dumps(json.loads(r["props"]))
           for r in ev.collect()}
    assert got == exp
