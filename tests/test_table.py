"""Table-format adapter: Iceberg when configured, parquet fallback here
(this sandbox ships no Iceberg runtime jar -- the adapter must detect
that and fall back, with a clear error when Iceberg is pinned)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcodec.engine import decode_dataframe, encode_dataframe, range_repartition
from sparkcodec.table import iceberg_available, read_encoded_table, write_encoded_table
from tests.conftest import SF_DIR


def test_iceberg_not_available_in_sandbox(spark):
    assert iceberg_available(spark) is False


def test_auto_falls_back_to_parquet_roundtrip(spark, tmp_path):
    from sparkcodec.tokens import tokens_table

    toks = tokens_table(spark, SF_DIR)
    enc = encode_dataframe(range_repartition(toks, 4), chunk_rows=128)
    target = str(tmp_path / "enc_table")
    used = write_encoded_table(enc, target, mode="overwrite")
    assert used == "parquet"
    back = read_encoded_table(spark, target)
    dec = decode_dataframe(back)
    cols = "doc_id, tokens, n_tok, source"
    assert (dec.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()
            == toks.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect())


def test_pinned_iceberg_raises_clearly(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="no Iceberg runtime/catalog"):
        write_encoded_table(df, "cat.db.t", fmt="iceberg")


def test_bad_fmt_rejected(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError, match="fmt must be"):
        write_encoded_table(df, str(tmp_path / "x"), fmt="orc")
    with pytest.raises(ValueError, match="fmt must be"):
        read_encoded_table(spark, str(tmp_path / "x"), fmt="orc")
