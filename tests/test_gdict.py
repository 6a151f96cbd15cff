"""Shared corpus-level dictionary encoding (gdict.py)."""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sparkcodec import engine, gdict
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "lang", "source", "n_chars").localCheckpoint())


def test_roundtrip_through_chunk_encode(spark, docs):
    coded, dicts = gdict.dict_encode_columns(docs, ["lang", "source"])
    dec = engine.decode_dataframe(
        engine.encode_dataframe(coded.repartition(4), chunk_rows=128))
    back = gdict.dict_decode_columns(dec, dicts)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, docs.collect()))


def test_nulls_keep_null_codes_and_values(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "de"), (4, None), (5, "en")],
        "id int, lang string")
    coded, dicts = gdict.dict_encode_columns(df, ["lang"])
    rows = {r.id: r.lang for r in coded.collect()}
    assert rows[2] is None and rows[4] is None
    assert rows[1] == rows[5] is not None
    back = {r.id: r.lang for r in
            gdict.dict_decode_columns(coded, dicts).collect()}
    assert back == {1: "en", 2: None, 3: "de", 4: None, 5: "en"}


def test_codes_deterministic_across_partitionings(spark, docs):
    d1 = {r.value: r.code
          for r in gdict.build_dictionary(docs.repartition(1), "source").collect()}
    d7 = {r.value: r.code
          for r in gdict.build_dictionary(docs.repartition(7), "source").collect()}
    assert d1 == d7
    # codes follow value sort order (the documented contract)
    assert [v for v, _ in sorted(d1.items(), key=lambda kv: kv[1])] == \
        sorted(d1)


def test_shared_dict_shrinks_multi_chunk_payload(spark, docs):
    """The point of the operator: across many chunks the per-chunk string
    dictionaries repeat; int codes don't carry them."""
    def col_bytes(enc, cols):
        total = 0
        for r in enc.select("meta_json").collect():
            m = json.loads(r.meta_json)
            total += sum(m[c]["bytes_out"] for c in cols)
        return total

    raw_enc = engine.encode_dataframe(docs.repartition(8), chunk_rows=64)
    coded, _ = gdict.dict_encode_columns(docs, ["lang", "source"])
    coded_enc = engine.encode_dataframe(coded.repartition(8), chunk_rows=64)
    raw_b = col_bytes(raw_enc, ["lang", "source"])
    coded_b = col_bytes(coded_enc, ["lang", "source"])
    assert coded_b < raw_b


def test_cardinality_bound_raises(spark, docs, monkeypatch):
    monkeypatch.setattr(gdict, "MAX_DICT_VALUES", 3)
    with pytest.raises(ValueError, match="distinct values"):
        gdict.build_dictionary(docs, "source")


def test_corrupt_sidecar_raises_not_nulls(spark, docs):
    coded, dicts = gdict.dict_encode_columns(docs, ["source"])
    truncated = {"source": dicts["source"].filter(F.col("code") < 2)}
    with pytest.raises(Exception, match="no dictionary entry"):
        gdict.dict_decode_columns(coded, truncated).collect()


def test_sidecar_write_read(spark, docs, tmp_path):
    d = gdict.build_dictionary(docs, "lang")
    gdict.write_dictionary(d, str(tmp_path), "lang")
    back = gdict.read_dictionary(spark, str(tmp_path), "lang")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, d.collect()))
