"""Dataset-level file index: per-file zone maps prune whole container
files from the plan before any footer is read (sparkcodec/findex.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkcodec.cluster import cluster_encode
from sparkcodec.findex import (
    build_file_index,
    indexed_range_scan,
    prune_files_by_ranges,
)


def _write_clustered(spark, tmp_path, n_files=8):
    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_returnflag"))
    enc = cluster_encode(li, ["l_orderkey"], num_partitions=n_files,
                         chunk_rows=256, auto_fastpath=False)
    out = str(tmp_path / "enc")
    enc.write.parquet(out)
    return li, out


def test_file_index_prunes_files_and_scan_is_exact(spark, tmp_path):
    li, out = _write_clustered(spark, tmp_path)
    idx = build_file_index(spark, out)
    n_files = len([f for f in os.listdir(out)
                   if f.endswith(".parquet") and not f.startswith("_")])
    assert idx.count() == n_files and n_files > 1
    # narrow range on the clustered key: most files plan out entirely
    lo, hi = 100, 200
    paths = prune_files_by_ranges(spark, out, {"l_orderkey": (lo, hi)})
    assert 0 < len(paths) < n_files
    got = sorted(tuple(r) for r in
                 indexed_range_scan(spark, out, "l_orderkey", lo, hi,
                                    "long").collect())
    exp = sorted(tuple(r) for r in li.filter(
        (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)).collect())
    assert got == exp and len(got) > 0
    # disjoint range: zero files planned, empty result, no crash
    assert prune_files_by_ranges(
        spark, out, {"l_orderkey": (10**9, 2 * 10**9)}) == []
    assert indexed_range_scan(
        spark, out, "l_orderkey", 10**9, 2 * 10**9, "long").count() == 0


def test_file_index_staleness_guard(spark, tmp_path):
    _, out = _write_clustered(spark, tmp_path, n_files=4)
    build_file_index(spark, out)
    # a file that appeared AFTER the build must fail planning loudly --
    # stale bounds silently pruning new data would lose rows
    extra = (spark.read.parquet(out).limit(1))
    extra.write.mode("append").parquet(out)
    with pytest.raises(ValueError, match="stale"):
        prune_files_by_ranges(spark, out, {"l_orderkey": (0, 10)})
    # rebuild repairs it
    build_file_index(spark, out)
    assert prune_files_by_ranges(spark, out, {"l_orderkey": (0, 10)}) != []


def test_file_index_null_bounds_survive(spark, tmp_path):
    """A file holding any chunk with NULL stat bounds (all-null values:
    pyarrow min_max yields null scalars) records NULL file bounds and
    always survives pruning."""
    from sparkcodec.engine import encode_dataframe

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 5.0), (4, 7.0)],
        "id INT, v DOUBLE").coalesce(1).sortWithinPartitions("id")
    enc = encode_dataframe(df, chunk_rows=2, stat_columns=("v",),
                           auto_fastpath=False)
    out = str(tmp_path / "enc_nan")
    enc.write.parquet(out)
    idx = build_file_index(spark, out)
    assert idx.filter(F.col("min_v").isNull()).count() > 0
    # range far from the real values: the NULL-bound file must survive
    paths = prune_files_by_ranges(spark, out, {"v": (1000.0, 2000.0)})
    assert len(paths) > 0
    got = sorted(r["id"] for r in
                 indexed_range_scan(spark, out, "v", 4.0, 8.0).collect())
    assert got == [3, 4]


def test_file_index_requires_stat_columns(spark, tmp_path):
    from sparkcodec.engine import encode_dataframe

    df = spark.createDataFrame([(1, 2)], "a INT, b INT")
    out = str(tmp_path / "nostats")
    encode_dataframe(df, auto_fastpath=False).write.parquet(out)
    with pytest.raises(ValueError, match="stat_columns"):
        build_file_index(spark, out)


def test_update_file_index_incremental(spark, tmp_path):
    """Append-only maintenance: only NEW files are scanned, removed files
    drop out, and planning stays correct across the update."""
    from sparkcodec.findex import build_file_index, update_file_index

    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_returnflag"))
    lo_half = li.filter("l_orderkey <= 3000")
    hi_half = li.filter("l_orderkey > 3000")
    out = str(tmp_path / "enc")
    cluster_encode(lo_half, ["l_orderkey"], num_partitions=4,
                   chunk_rows=256, auto_fastpath=False).write.parquet(out)
    n0 = build_file_index(spark, out).count()
    # append new encoded files, then update: index grows, no rebuild
    cluster_encode(hi_half, ["l_orderkey"], num_partitions=3,
                   chunk_rows=256, auto_fastpath=False) \
        .write.mode("append").parquet(out)
    idx = update_file_index(spark, out)
    n_files = len([f for f in os.listdir(out)
                   if f.endswith(".parquet") and not f.startswith("_")])
    assert idx.count() == n_files > n0
    # planning over the refreshed index covers the appended key range
    mx = li.agg(F.max("l_orderkey")).collect()[0][0]
    paths = prune_files_by_ranges(spark, out, {"l_orderkey": (mx, mx)})
    assert 0 < len(paths) < n_files
    got = sorted(tuple(r) for r in indexed_range_scan(
        spark, out, "l_orderkey", mx, mx, "long").collect())
    exp = sorted(tuple(r) for r in
                 li.filter(F.col("l_orderkey") == mx).collect())
    assert got == exp and len(got) > 0
    # a deleted file drops out of the index on the next update
    victim = next(os.path.join(out, f) for f in sorted(os.listdir(out))
                  if f.endswith(".parquet") and not f.startswith("_"))
    os.remove(victim)
    assert update_file_index(spark, out).count() == n_files - 1
    # no-op update leaves the index unchanged
    assert update_file_index(spark, out).count() == n_files - 1


def test_update_file_index_stat_schema_drift_raises(spark, tmp_path):
    from sparkcodec.engine import encode_dataframe
    from sparkcodec.findex import build_file_index, update_file_index

    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select("l_orderkey", "l_quantity").limit(100))
    out = str(tmp_path / "enc")
    encode_dataframe(li.coalesce(1), chunk_rows=64,
                     stat_columns=("l_orderkey",),
                     auto_fastpath=False).write.parquet(out)
    build_file_index(spark, out)
    encode_dataframe(li.coalesce(1), chunk_rows=64,
                     stat_columns=("l_quantity",),
                     auto_fastpath=False).write.mode("append").parquet(out)
    with pytest.raises(ValueError, match="stat columns"):
        update_file_index(spark, out)
