"""Encoded-dataset compaction: fewer files, identical decode, pruning
structures intact."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkcodec.compact import _parquet_files, compact_encoded
from sparkcodec.engine import (
    decode_dataframe,
    encode_to_parquet,
    lookup_rows,
)
from sparkcodec.tokens import tokens_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    """A deliberately fragmented encoded dataset: tiny chunks, many
    splits -> many small container files."""
    base = tmp_path_factory.mktemp("compact")
    src = str(base / "src")
    toks = tokens_table(spark, SF_DIR)
    toks.repartition(8).write.parquet(src)
    enc_dir = str(base / "enc")
    encode_to_parquet(spark, src, enc_dir, chunk_rows=32, n_splits=16,
                      bloom_columns=("doc_id",)).collect()
    return src, enc_dir, str(base)


def test_compaction_reduces_files_and_decodes_identically(spark, fragmented):
    src, enc_dir, base = fragmented
    n_in = len(_parquet_files(enc_dir))
    assert n_in > 4  # genuinely fragmented

    out_dir = f"{base}/compacted"
    man = compact_encoded(spark, enc_dir, out_dir,
                          target_file_bytes=64 * 1024 * 1024).collect()[0]
    n_out = len(_parquet_files(out_dir))
    assert n_out < n_in and n_out == man["n_files_out"] == 1

    a = sorted((r["doc_id"], tuple(r["tokens"])) for r in
               decode_dataframe(spark.read.parquet(enc_dir)).collect())
    b = sorted((r["doc_id"], tuple(r["tokens"])) for r in
               decode_dataframe(spark.read.parquet(out_dir)).collect())
    assert a == b and len(a) > 0
    # chunk count and totals preserved exactly
    assert man["n_chunks"] == spark.read.parquet(enc_dir).count()

    # the _compaction_manifest.json must not break parquet dir reads
    assert os.path.exists(f"{out_dir}/_compaction_manifest.json")
    spark.read.parquet(out_dir).count()


def test_bloom_lookup_survives_compaction(spark, fragmented):
    """The pruning structures ride along: a bloom point lookup over the
    COMPACTED dataset returns the same row."""
    src, enc_dir, base = fragmented
    out_dir = f"{base}/compacted2"
    compact_encoded(spark, enc_dir, out_dir).collect()

    target = spark.read.parquet(src).agg(F.min("doc_id")).collect()[0][0]
    hit = lookup_rows(spark.read.parquet(out_dir), "doc_id", target)
    rows = hit.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == target


def test_compaction_rejects_bad_args(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        compact_encoded(spark, str(tmp_path / "missing"), str(tmp_path / "o"))
    with pytest.raises(ValueError):
        compact_encoded(spark, str(tmp_path), str(tmp_path / "o"),
                        target_file_bytes=0)
