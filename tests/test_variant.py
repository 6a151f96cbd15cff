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


# ---------- shredding (reference: src/variant.js:83-147, 216-303) ----------

def _roundtrip_shredded(values, shredding=None):
    from sparkcodec.variant import decode_shredded, encode_shredded_rows

    rows, used = encode_shredded_rows(values, shredding)
    if used is None:
        return [decode_variant(r["metadata"], r["value"]) for r in rows], None
    return [decode_shredded(r["metadata"], r, used) for r in rows], used


def test_shredded_scalar_and_fallback():
    vals = [{"k": 1}, {"k": 2}, {"k": "oops"}, None, {"k": None}]
    back, used = _roundtrip_shredded(vals, {"k": "INT64"})
    assert used == {"k": "INT64"}
    assert back == vals


def test_shredded_partial_objects_keep_remainder():
    vals = [{"k": 1, "extra": [1, 2]}, {"k": 2}, {"other": True}]
    back, _ = _roundtrip_shredded(vals, {"k": "INT64"})
    assert back == vals


def test_shredded_array_and_nested():
    shred = {"tags": ["STRING"], "meta": {"n": "INT64"}}
    vals = [
        {"tags": ["a", "b"], "meta": {"n": 5}},
        {"tags": [], "meta": {"n": 6, "x": 1.5}},
        {"tags": ["c", 7], "meta": "not-an-object"},  # element + object fallback
    ]
    back, _ = _roundtrip_shredded(vals, shred)
    assert back == vals


def test_detect_shredding():
    from sparkcodec.variant import detect_shredding

    assert detect_shredding([{"a": 1, "b": "x"}, {"a": 2}]) == {"a": "INT64", "b": "STRING"}
    assert detect_shredding([[1.5], [2.5, 3.5]]) == ["DOUBLE"]
    assert detect_shredding([1, "mixed"]) is None
    assert detect_shredding([True, False]) == "BOOLEAN"
    # depth cap: containers nested past MAX_SHRED_DEPTH stay binary, and
    # empty object levels collapse all the way up
    deep = [{"a": {"b": {"c": {"d": 1}}}}]
    assert detect_shredding(deep) is None
    shallow = [{"a": {"b": 1}, "s": "x"}]
    assert detect_shredding(shallow) == {"a": {"b": "INT64"}, "s": "STRING"}


def test_normalize_strips_reserved_fields():
    from sparkcodec.variant import normalize_shredding

    assert normalize_shredding({"value": "INT64", "k": "STRING"}) == {"k": "STRING"}
    assert normalize_shredding({"value": "INT64"}) is None


def test_shredded_spark_column_operators(spark):
    from pyspark.sql import functions as F

    from sparkcodec.variant import json_to_shredded_column, shredded_to_json_column

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "props").limit(300)
    shred = {"k": "INT64"}
    enc = json_to_shredded_column(ev, "props", "event_id", shred)
    # the point of shredding: k is a TYPED Spark column, directly queryable
    typed_sum = enc.agg(F.sum("typed_value.k.typed_value")).collect()[0][0]
    exp_sum = ev.select(F.get_json_object("props", "$.k").cast("long").alias("k")) \
        .agg(F.sum("k")).collect()[0][0]
    assert typed_sum == exp_sum
    dec = shredded_to_json_column(enc, "event_id", shred)
    got = {r["event_id"]: r["json"] for r in dec.collect()}
    exp = {r["event_id"]: json.dumps(json.loads(r["props"])) for r in ev.collect()}
    assert got == exp


def test_tz_aware_timestamp_uses_timestamp_id():
    """Per the Variant spec, tz-aware instants use primitive id 12
    (timestamp) and roundtrip as aware UTC; naive datetimes use id 13
    (timestamp_ntz) and roundtrip naive."""
    from sparkcodec.variant import decode_variant, encode_variant_rows

    aware = datetime.datetime(2024, 3, 1, 10, 0, 0, 250000,
                              tzinfo=datetime.timezone.utc)
    est = datetime.datetime(2024, 3, 1, 5, 0, 0, 250000,
                            tzinfo=datetime.timezone(datetime.timedelta(hours=-5)))
    naive = datetime.datetime(2024, 3, 1, 10, 0, 0, 250000)
    meta, vals = encode_variant_rows([aware, est, naive])
    assert vals[0][0] >> 2 == 12
    assert vals[1][0] >> 2 == 12
    assert vals[2][0] >> 2 == 13
    a = decode_variant(meta, vals[0])
    assert a.tzinfo is not None and a == aware
    e = decode_variant(meta, vals[1])
    assert e == est  # same instant, rendered in UTC
    n = decode_variant(meta, vals[2])
    assert n.tzinfo is None and n == naive


def test_variant_to_json_handles_non_json_primitives(spark):
    """variant_to_json_column must serialize Decimal/date/timestamp/binary
    primitives (Spark parse_json interop lowers JSON fractions to
    decimal4/8/16) instead of raising TypeError."""
    from sparkcodec.variant import (
        build_metadata, collect_keys, encode_value, variant_to_json_column,
    )

    obj = {
        "d": decimal.Decimal("12.345"),
        "day": datetime.date(2024, 2, 29),
        "ts": datetime.datetime(2024, 1, 1, 12, 0, 0,
                                tzinfo=datetime.timezone.utc),
        "blob": b"\x00\x01binary",
    }
    keys: set = set()
    collect_keys(obj, keys)
    meta, idx = build_metadata(sorted(keys))
    val = encode_value(obj, idx)
    df = spark.createDataFrame([(1, bytes(meta), bytes(val))],
                               "id long, metadata binary, value binary")
    out = variant_to_json_column(df, "id").collect()
    assert len(out) == 1
    parsed = json.loads(out[0]["json"])
    assert parsed["d"] == "12.345"
    assert parsed["day"] == "2024-02-29"
    assert parsed["ts"].startswith("2024-01-01T12:00:00")
    import base64
    assert base64.b64decode(parsed["blob"]) == b"\x00\x01binary"


def test_variant_decimal_exact_past_28_digits_and_scale_bounds():
    """Decimal encode derives the unscaled value from the digit tuple --
    int(scaleb) would silently round >28 significant digits -- and
    out-of-range scales raise instead of writing spec-invalid bytes."""
    from sparkcodec.variant import decode_variant, encode_variant_rows

    v = decimal.Decimal("1234567890123456789012345678.90")  # 30 sig digits
    meta, vals = encode_variant_rows([v])
    assert decode_variant(meta, vals[0]) == v
    with pytest.raises(OverflowError, match="scale"):
        encode_variant_rows([decimal.Decimal("1E-300")])
    with pytest.raises(OverflowError, match="decimal16|scale"):
        encode_variant_rows([decimal.Decimal(10) ** 50])


def test_shredded_single_element_array_roundtrip(spark):
    """Array shreds deliver numpy ndarrays to the decode kernel: a
    1-element array must stay a list (code-review r3: the .item()
    fallback collapsed it into its wrapper dict)."""
    from sparkcodec.variant import json_to_shredded_column, shredded_to_json_column

    df = spark.createDataFrame(
        [(1, "[5]"), (2, "[1, 2, 3]"), (3, "[]")],
        "id long, js string")
    enc = json_to_shredded_column(df, "js", "id", shredding=["INT64"])
    out = {r["id"]: json.loads(r["json"])
           for r in shredded_to_json_column(enc, "id", ["INT64"]).collect()}
    assert out == {1: [5], 2: [1, 2, 3], 3: []}
