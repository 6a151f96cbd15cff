"""Layout clustering: pruning selectivity + exact values (cluster.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcodec import cluster, engine
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def li(spark):
    return (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .select("l_orderkey", "l_partkey", "l_quantity",
                    "l_extendedprice").localCheckpoint())


@pytest.fixture(scope="module")
def layouts(spark, li):
    """(unclustered, linear-on-orderkey, zorder-on-both) chunk tables."""
    enc0 = engine.encode_dataframe(
        li.repartition(8), chunk_rows=256,
        stat_columns=("l_orderkey", "l_partkey")).localCheckpoint()
    enc1 = cluster.cluster_encode(li, ["l_orderkey"],
                                  chunk_rows=256).localCheckpoint()
    enc2 = cluster.cluster_encode(li, ["l_orderkey", "l_partkey"],
                                  chunk_rows=256).localCheckpoint()
    return enc0, enc1, enc2


RANGES = {"l_orderkey": (100, 400), "l_partkey": (10, 60)}
ORDER = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"]


def test_linear_cluster_prunes_and_matches(li, layouts):
    enc0, enc1, _ = layouts
    lo, hi = RANGES["l_orderkey"]
    s0, t0 = cluster.pruning_selectivity(enc0, {"l_orderkey": (lo, hi)})
    s1, t1 = cluster.pruning_selectivity(enc1, {"l_orderkey": (lo, hi)})
    # unclustered: every chunk spans ~the full key range -> nothing prunes
    assert s0 == t0
    # clustered: a ~20% key range must survive in well under half the chunks
    assert s1 <= t1 // 3
    got = engine.range_scan_rows(enc1, "l_orderkey", lo, hi).orderBy(*ORDER)
    exp = li.filter(F.col("l_orderkey").between(lo, hi)).orderBy(*ORDER)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in exp.collect()]


def test_zorder_prunes_both_keys_and_matches(li, layouts):
    enc0, enc1, enc2 = layouts
    s0, t0 = cluster.pruning_selectivity(enc0, RANGES)
    s2, t2 = cluster.pruning_selectivity(enc2, RANGES)
    assert s0 == t0                    # unclustered: no pruning
    assert s2 <= t2 // 3               # z-order: conjunctive probe prunes
    # the z-order selling point: the SECONDARY key prunes too, which the
    # linear layout cannot do (its partkey min/max spans ~everything)
    s1_pk, t1 = cluster.pruning_selectivity(
        enc1, {"l_partkey": RANGES["l_partkey"]})
    s2_pk, _ = cluster.pruning_selectivity(
        enc2, {"l_partkey": RANGES["l_partkey"]})
    assert s1_pk == t1
    assert s2_pk < t2
    got = engine.probe_rows(enc2, ranges=RANGES).orderBy(*ORDER)
    exp = li.filter(
        F.col("l_orderkey").between(*RANGES["l_orderkey"])
        & F.col("l_partkey").between(*RANGES["l_partkey"])).orderBy(*ORDER)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in exp.collect()]


def test_cluster_encode_adds_typed_stat_columns(layouts):
    _, enc1, enc2 = layouts
    assert {"min_l_orderkey", "max_l_orderkey"} <= set(enc1.columns)
    assert {"min_l_orderkey", "max_l_orderkey",
            "min_l_partkey", "max_l_partkey"} <= set(enc2.columns)


def test_zorder_null_and_constant_keys_roundtrip(spark):
    # nulls land in bucket 0 (sort first); a constant key contributes
    # code 0 everywhere -- neither may break the encode or lose rows
    rows = [(None, 7, "a"), (3, 7, "b"), (1, 7, "c"), (None, 7, "d"),
            (2, 7, "e")]
    df = spark.createDataFrame(rows, "k1 int, k2 int, v string")
    enc = cluster.cluster_encode(df, ["k1", "k2"], chunk_rows=2,
                                 num_partitions=2)
    dec = engine.decode_dataframe(enc)
    assert sorted((r.v for r in dec.collect())) == ["a", "b", "c", "d", "e"]


def test_zorder_key_validation(spark):
    df = spark.range(4).select(F.col("id").alias("a"),
                               F.col("id").alias("b"))
    with pytest.raises(ValueError, match=">= 2 keys"):
        cluster.zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="62"):
        cluster.zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="already exists"):
        cluster.zorder_key(df.withColumn("_zkey", F.lit(0)), ["a", "b"])
    with pytest.raises(ValueError, match="at least one key"):
        cluster.cluster_encode(df, [])
    with pytest.raises(ValueError, match="unknown layout"):
        cluster.cluster_encode(df, ["a"], layout="hilbert")


def test_zorder_key_interleaves_bits(spark):
    # 2 keys x 2 bits over the value range [0, 3]: the Morton code of
    # (x, y) must be the textbook interleave x0 y0 x1 y1 (LSB first)
    pts = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(pts, "x int, y int")
    out = {(r.x, r.y): r._zkey
           for r in cluster.zorder_key(df, ["x", "y"], bits=2).collect()}

    def morton(x, y):
        return ((x & 1) | ((y & 1) << 1) | ((x >> 1) << 2)
                | ((y >> 1) << 3))

    assert out == {(x, y): morton(x, y) for x, y in pts}
