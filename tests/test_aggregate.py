"""Metadata-only aggregation: per-chunk cnt_/sum_ agg columns at encode
time + aggregate_encoded answering global count/sum/min/max/avg from the
tiny stat columns -- zero payload IO (ORC-style stripe sums; the
reference's footers carry min/max/null_count only, reference
src/metadata.js, with no query path over them)."""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sparkcodec.engine import (
    aggregate_encoded,
    decode_dataframe,
    encode_dataframe,
    encode_parquet_dataset,
)


def _ground_truth(df, cols):
    aggs = [F.count(F.lit(1)).cast("long").alias("count_rows")]
    for c in cols:
        aggs += [
            F.count(c).cast("long").alias(f"count_{c}"),
            F.sum(c).alias(f"sum_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df.agg(*aggs).collect()[0].asDict()


def test_aggregate_encoded_matches_dataframe_agg(spark, tmp_path):
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        (F.col("id") % 11).cast("int").alias("v"),
        F.when(F.col("id") % 4 == 0, None)
         .otherwise(F.col("id") * 0.25).alias("x"),
    )
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    enc = encode_parquet_dataset(
        spark, src, chunk_rows=700,
        stat_columns=("k", "v", "x"), agg_columns=("k", "v", "x"))
    got = aggregate_encoded(enc, ["k", "v", "x"],
                            include_avg=True).collect()[0].asDict()
    exp = _ground_truth(spark.read.parquet(src), ["k", "v", "x"])
    for name, want in exp.items():
        if isinstance(want, float):
            assert got[name] == pytest.approx(want, rel=1e-12), name
        else:
            assert got[name] == want, name
    # avg = sum/count on the SAME partials
    assert got["avg_k"] == pytest.approx(exp["sum_k"] / exp["count_k"])
    assert got["avg_x"] == pytest.approx(exp["sum_x"] / exp["count_x"])
    # int sums stay BIGINT, float sums DOUBLE, counts BIGINT
    types = dict(aggregate_encoded(enc, ["k", "x"]).dtypes)
    assert types["sum_k"] == "bigint" and types["sum_x"] == "double"
    assert types["count_rows"] == "bigint"
    # payload still decodes with the extra agg columns present
    assert decode_dataframe(enc).count() == 20000


def test_aggregate_encoded_all_null_and_empty(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(None).cast("long").alias("dead"))
    enc = encode_dataframe(df, auto_fastpath=False, chunk_rows=30,
                           stat_columns=("k", "dead"),
                           agg_columns=("k", "dead"))
    got = aggregate_encoded(enc, ["dead"]).collect()[0].asDict()
    # SQL semantics: COUNT 0, SUM/MIN/MAX NULL
    assert got == {"count_rows": 100, "count_dead": 0, "sum_dead": None,
                   "min_dead": None, "max_dead": None}
    empty = enc.filter(F.lit(False))
    got0 = aggregate_encoded(empty, ["k"]).collect()[0].asDict()
    assert got0["count_rows"] == 0 and got0["count_k"] == 0
    assert got0["sum_k"] is None and got0["min_k"] is None


def test_aggregate_encoded_reads_only_metadata_columns(spark, tmp_path):
    """The 100-TB property: over an on-disk encoded table the aggregate's
    parquet ReadSchema contains ONLY the scalar stat/agg columns -- the
    payload blobs (the bulk of the table) are never read from storage."""
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        F.array_repeat((F.col("id") % 97).cast("int"), 40).alias("tokens"),
    )
    src = str(tmp_path / "src")
    df.write.parquet(src)
    enc = encode_parquet_dataset(spark, src, chunk_rows=500,
                                 stat_columns=("k",), agg_columns=("k",))
    out = str(tmp_path / "enc")
    enc.write.parquet(out)
    q = aggregate_encoded(spark.read.parquet(out), ["k"])
    plan = q._jdf.queryExecution().executedPlan().toString()
    rs = re.search(r"ReadSchema: ([^\n]+)", plan).group(1)
    assert "payload" not in rs and "schema_json" not in rs
    assert "sum_k" in rs and "n_rows" in rs
    row = q.collect()[0]
    assert row["count_rows"] == 5000 and row["sum_k"] == 5000 * 4999 // 2


def test_agg_columns_validation(spark, tmp_path):
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("s").alias("txt"))
    with pytest.raises(TypeError, match="integer and float"):
        encode_dataframe(df, auto_fastpath=False,
                         agg_columns=("txt",)).count()
    with pytest.raises(ValueError, match="does not exist"):
        encode_dataframe(df, auto_fastpath=False, agg_columns=("nope",))
    # uint64 sums rejected (no Spark representation)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "u64")
    pq.write_table(pa.table({"u": np.arange(10, dtype=np.uint64)}), src)
    with pytest.raises(TypeError, match="uint64"):
        encode_parquet_dataset(spark, src, agg_columns=("u",)).count()
    # aggregate over a table encoded WITHOUT agg columns -> clear error
    enc = encode_dataframe(df.select("k"), auto_fastpath=False,
                           stat_columns=("k",))
    with pytest.raises(ValueError, match="agg_columns"):
        aggregate_encoded(enc, ["k"])
