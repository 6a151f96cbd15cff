"""Spark integration: encode -> decode round-trip (per-row token-array
equality, the reference's write->read deep-equality invariant, reference:
test/write.roundtrip.test.js:6-34), chunk windowing, and skew-defusing
repartition."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkcodec.engine import (
    decode_dataframe,
    encode_dataframe,
    range_repartition,
    weighted_repartition,
)
from sparkcodec.tokens import tokens_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def toks(spark):
    return tokens_table(spark, SF_DIR).cache()


def _sorted_rows(df, key="doc_id"):
    rows = df.orderBy(key).collect()
    return [(r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"]) for r in rows]


def test_roundtrip_tokens_table(spark, toks):
    enc = encode_dataframe(range_repartition(toks, 4))
    dec = decode_dataframe(enc)
    assert _sorted_rows(dec) == _sorted_rows(toks)


def test_roundtrip_exact_per_row_token_equality(spark, toks):
    enc = encode_dataframe(toks, chunk_rows=128)  # force many chunks
    dec = decode_dataframe(enc)
    orig = {r["doc_id"]: list(r["tokens"]) for r in toks.collect()}
    got = {r["doc_id"]: list(r["tokens"]) for r in dec.collect()}
    assert orig == got  # bit-identical int32 arrays, order preserved


def test_encoded_metadata(spark, toks):
    enc = encode_dataframe(range_repartition(toks, 2)).cache()
    rows = enc.collect()
    assert all(r["bytes_out"] > 0 for r in rows)
    assert sum(r["n_rows"] for r in rows) == toks.count()
    total_tok = toks.agg(F.sum("n_tok")).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == total_tok
    meta = json.loads(rows[0]["meta_json"])
    assert set(meta) == {"doc_id", "tokens", "n_tok", "source"}
    assert meta["tokens"]["kind"] == "list"
    assert "|" in meta["tokens"]["codec"]
    # compression should be real on this table
    assert sum(r["bytes_out"] for r in rows) < sum(r["bytes_in"] for r in rows)
    enc.unpersist()


def test_chunk_windowing_token_budget(spark, toks):
    enc = encode_dataframe(toks.repartition(1), chunk_rows=10**9, token_budget=5000)
    rows = enc.collect()
    assert len(rows) > 1
    # every chunk except possibly the last respects the budget loosely
    # (budget is a greedy bound: a chunk may exceed it by at most one row)
    max_row_tok = toks.agg(F.max("n_tok")).collect()[0][0]
    for r in rows:
        assert r["n_tokens"] <= 5000 + max_row_tok


def test_decode_after_write_read(spark, toks, tmp_path):
    """Encoded chunks survive a parquet write/read (Iceberg-managed binary
    column stand-in) and still decode exactly."""
    enc = encode_dataframe(range_repartition(toks, 2))
    path = str(tmp_path / "encoded.parquet")
    enc.write.mode("overwrite").parquet(path)
    enc2 = spark.read.parquet(path)
    dec = decode_dataframe(enc2)
    assert _sorted_rows(dec) == _sorted_rows(toks)


def test_weighted_repartition_balances_tokens(spark, toks):
    heavy = toks.withColumn(
        "source", F.when(F.rand(7) < 0.9, F.lit("web")).otherwise(F.col("source"))
    )
    parts = 8
    df = weighted_repartition(heavy, parts)
    sizes = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.sum("n_tok").alias("w"))
        .collect()
    )
    weights = np.array([r["w"] for r in sizes], dtype=float)
    total = weights.sum()
    # no partition holds more than ~2.5x its fair share despite 90% skew
    assert weights.max() <= 2.5 * total / parts, weights
    assert len(sizes) >= parts // 2


def test_nullable_and_empty_lists_roundtrip(spark):
    data = [
        ("a", [1, 2, 3], 3, "web"),
        ("b", [], 0, "web"),
        ("c", None, 0, "books"),
        ("d", [7] * 100, 100, "code"),
        ("e", None, 0, "books"),
    ]
    df = spark.createDataFrame(data, "doc_id string, tokens array<int>, n_tok int, source string")
    dec = decode_dataframe(encode_dataframe(df))
    got = {r["doc_id"]: r["tokens"] and list(r["tokens"]) for r in dec.collect()}
    exp = {r[0]: (list(r[1]) if r[1] is not None else None) for r in data}
    assert got == exp


def test_mixed_type_table_roundtrip(spark):
    sdf = spark.range(5000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 7).cast("int").alias("small"),
        (F.rand(1) * 100).alias("dbl"),
        (F.col("id") % 2 == 0).alias("flag"),
        F.concat(F.lit("user-"), F.col("id")).alias("name"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") * 2).alias("nullable"),
        F.timestamp_micros((F.col("id") * 1000000 + 1700000000000000).cast("long")).alias("ts"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 1000).cast("int")).alias("d"),
    )
    dec = decode_dataframe(encode_dataframe(sdf))
    a = [tuple(r) for r in sdf.orderBy("k").collect()]
    b = [tuple(r) for r in dec.orderBy("k").collect()]
    assert a == b


def test_bloom_chunk_pruning(spark, toks):
    from sparkcodec.engine import group_may_contain

    enc = encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                           bloom_columns=("doc_id",)).collect()
    assert len(enc) > 4
    target = toks.select("doc_id").first()[0]
    hits = [r for r in enc if group_may_contain(r["payload"], "doc_id", target)]
    # no false negatives: the chunk holding the target must survive
    dec_hits = decode_dataframe(
        spark.createDataFrame(hits, schema=spark.createDataFrame(enc).schema))
    assert dec_hits.filter(F.col("doc_id") == target).count() == 1
    # pruning is real: most chunks are eliminated
    assert len(hits) < len(enc) / 2, (len(hits), len(enc))
    # column without a bloom always passes
    assert group_may_contain(enc[0]["payload"], "source", "nope")


def test_selective_column_decode(spark, toks):
    import time

    enc = encode_dataframe(range_repartition(toks, 4)).cache()
    enc.count()
    only = decode_dataframe(enc, columns=["doc_id", "n_tok"])
    assert only.columns == ["doc_id", "n_tok"]
    got = {r["doc_id"]: r["n_tok"] for r in only.collect()}
    exp = {r["doc_id"]: r["n_tok"] for r in toks.collect()}
    assert got == exp
    enc.unpersist()


def test_decimal_column_roundtrip_spark(spark):
    sdf = spark.range(1000).select(
        F.col("id"),
        (F.col("id") / 7).cast("decimal(18,4)").alias("money"),
    )
    dec = decode_dataframe(encode_dataframe(sdf))
    a = [(r["id"], r["money"]) for r in sdf.orderBy("id").collect()]
    b = [(r["id"], r["money"]) for r in dec.orderBy("id").collect()]
    assert a == b


def test_encode_parquet_dataset_roundtrip(spark, toks, tmp_path):
    """Scan-side fast path (descriptors to Python tasks, pyarrow reads the
    splits) must produce chunks the normal decoder restores exactly."""
    from sparkcodec.engine import encode_parquet_dataset

    src = str(tmp_path / "in.parquet")
    toks.repartition(4).write.mode("overwrite").parquet(src)
    enc = encode_parquet_dataset(spark, src, n_splits=6)
    assert enc.agg(F.sum("n_rows")).collect()[0][0] == toks.count()
    got = _sorted_rows(decode_dataframe(enc))
    assert got == _sorted_rows(toks)


def test_encode_parquet_dataset_column_pruning(spark, toks, tmp_path):
    from sparkcodec.engine import encode_parquet_dataset

    src = str(tmp_path / "in2.parquet")
    toks.write.mode("overwrite").parquet(src)
    enc = encode_parquet_dataset(spark, src, columns=["doc_id", "n_tok"])
    pairs = json.loads(enc.select("schema_json").first()[0])
    assert [p[0] for p in pairs] == ["doc_id", "n_tok"]
    dec = decode_dataframe(enc)
    assert dec.columns == ["doc_id", "n_tok"]
    assert dec.count() == toks.count()


def test_list_of_timestamp_schema_inference(spark):
    """ADVICE r1: inferred decode schema must recurse into list element
    types (list<timestamp>, list<decimal>, list<list<...>>)."""
    import datetime

    rows = [
        ([datetime.datetime(2024, 1, 1, 12, 0, 0)], [[1, 2]], 1),
        ([datetime.datetime(2024, 6, 30, 23, 59, 59)], [[3], [4, 5]], 2),
    ]
    df = spark.createDataFrame(
        rows, "ts array<timestamp_ntz>, nested array<array<int>>, k int")
    dec = decode_dataframe(encode_dataframe(df))  # schema inferred from chunks
    got = sorted(dec.collect(), key=lambda r: r["k"])
    assert [list(r["ts"]) for r in got] == [r[0] for r in rows]
    assert [[list(x) for x in r["nested"]] for r in got] == [r[1] for r in rows]


def test_decode_to_parquet_scan_side(spark, toks, tmp_path):
    """Symmetric fast path out: decode inside Python tasks and write REAL
    parquet with OUR writer -- Spark and DuckDB read the result exactly."""
    import duckdb

    from sparkcodec.engine import decode_to_parquet, encode_parquet_dataset

    src = str(tmp_path / "src.parquet")
    enc_path = str(tmp_path / "enc.parquet")
    out = str(tmp_path / "decoded")
    toks.repartition(3).write.mode("overwrite").parquet(src)
    encode_parquet_dataset(spark, src, n_splits=4).write.parquet(enc_path)

    manifest = decode_to_parquet(spark, enc_path, out).collect()
    assert sum(r["n_rows"] for r in manifest) == toks.count()
    back = spark.read.parquet(out)
    assert _sorted_rows(back) == _sorted_rows(toks)
    n = duckdb.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
    assert n == toks.count()

    # column-pruned variant decodes only the selected columns
    out2 = str(tmp_path / "decoded2")
    decode_to_parquet(spark, enc_path, out2, columns=["doc_id", "n_tok"]).collect()
    back2 = spark.read.parquet(out2)
    assert sorted(back2.columns) == ["doc_id", "n_tok"]
    assert back2.count() == toks.count()


def test_encode_dataframe_auto_fastpath_reroute(spark, toks, tmp_path):
    """A bare parquet scan (with column projection) transparently reroutes
    to the scan-side fast path; filters/repartitions/derived columns keep
    the bridge path.  Both produce chunks that decode identically."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import _bare_parquet_scan

    src = str(tmp_path / "t.parquet")
    toks.write.mode("overwrite").parquet(src)
    raw = spark.read.parquet(src)
    proj = raw.select("doc_id", "tokens")
    assert _bare_parquet_scan(proj) is not None
    assert _bare_parquet_scan(raw.filter(F.col("n_tok") > 3)) is None
    assert _bare_parquet_scan(raw.repartition(2)) is None
    assert _bare_parquet_scan(raw.withColumn("z", F.lit(1))) is None

    enc = encode_dataframe(proj)  # rerouted
    got = sorted((r["doc_id"], tuple(r["tokens"] or ()))
                 for r in decode_dataframe(enc).collect())
    exp = sorted((r["doc_id"], tuple(r["tokens"] or ())) for r in proj.collect())
    assert got == exp
    pinned = encode_dataframe(proj, auto_fastpath=False)  # bridge path
    got2 = sorted((r["doc_id"], tuple(r["tokens"] or ()))
                  for r in decode_dataframe(pinned).collect())
    assert got2 == exp


def test_full_table_roundtrips_all_columns(spark):
    """Every column of every testdata table round-trips bit-exact through
    both encode paths (auto-fastpath scan and pinned bridge) -- the widest
    mixed-type stress short of the fuzzers."""
    from pyspark.sql import functions as F

    for table in ("lineitem", "orders", "customer", "part", "supplier",
                  "nation", "region"):
        src = spark.read.parquet(f"/root/testdata/sf0.001/{table}.parquet")
        cs_src = src.agg(F.expr(
            f"bit_xor(xxhash64({', '.join(src.columns)}))")).collect()[0][0]
        for flag in (True, False):
            dec = decode_dataframe(encode_dataframe(src, auto_fastpath=flag))
            cs = dec.agg(F.expr(
                f"bit_xor(xxhash64({', '.join(src.columns)}))")).collect()[0][0]
            assert cs == cs_src, (table, flag)


def test_bloom_point_lookup_prunes_chunks(spark, toks):
    """lookup_rows: bloom-prune encoded chunks without decoding, then
    decode only survivors -- the pruned set is strictly smaller and the
    lookup returns exactly the target row."""
    from sparkcodec.engine import filter_chunks_may_contain, lookup_rows

    enc = encode_dataframe(range_repartition(toks, 8),
                           chunk_rows=64, bloom_columns=("doc_id",),
                           auto_fastpath=False).cache()
    total = enc.count()
    target = toks.orderBy("doc_id").first()["doc_id"]
    pruned = filter_chunks_may_contain(enc, "doc_id", target)
    n_pruned = pruned.count()
    assert 0 < n_pruned < total  # real pruning happened
    got = lookup_rows(enc, "doc_id", target).collect()
    assert len(got) == 1 and got[0]["doc_id"] == target
    # absent value: (almost) everything pruned by the bloom
    absent = "zzz-no-such-doc"
    assert filter_chunks_may_contain(enc, "doc_id", absent).count() < total
    enc.unpersist()


def test_stats_range_scan_prunes_chunks(spark):
    """range_scan_rows: JVM-side min/max pruning on chunk metadata skips
    non-overlapping chunks; results equal a plain filter on the source."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import filter_chunks_by_range, range_scan_rows

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_orderkey", "l_quantity", "l_returnflag") \
        .orderBy("l_orderkey")
    enc = encode_dataframe(li.repartitionByRange(6, "l_orderkey")
                           .sortWithinPartitions("l_orderkey"),
                           chunk_rows=128, auto_fastpath=False).cache()
    total = enc.count()
    lo, hi = 100, 140
    pruned = filter_chunks_by_range(enc, "l_orderkey", lo, hi, "long")
    assert 0 < pruned.count() < total  # stats actually prune
    got = sorted(tuple(r) for r in
                 range_scan_rows(enc, "l_orderkey", lo, hi, "long").collect())
    exp = sorted(tuple(r) for r in li.filter(
        (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)).collect())
    assert got == exp and len(got) > 0
    enc.unpersist()


def test_typed_stat_columns_pushdown(spark, tmp_path):
    """stat_columns emits TYPED per-chunk min/max columns; a range filter
    on the encoded-on-disk table pushes down into the parquet scan
    (PushedFilters visible in the plan), and range_scan_rows prefers them."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import filter_chunks_by_range, range_scan_rows

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_orderkey", "l_quantity").orderBy("l_orderkey")
    enc = encode_dataframe(li.repartitionByRange(4, "l_orderkey")
                           .sortWithinPartitions("l_orderkey"),
                           chunk_rows=256, auto_fastpath=False,
                           stat_columns=("l_orderkey",))
    assert "min_l_orderkey" in enc.columns and "max_l_orderkey" in enc.columns
    out = str(tmp_path / "enc.parquet")
    enc.write.parquet(out)
    stored = spark.read.parquet(out)
    pruned = filter_chunks_by_range(stored, "l_orderkey", 100, 140)
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "PushedFilters" in plan and "max_l_orderkey" in plan.split("PushedFilters")[1][:300]
    got = sorted(tuple(r) for r in
                 range_scan_rows(stored, "l_orderkey", 100, 140, "long").collect())
    exp = sorted(tuple(r) for r in li.filter(
        (F.col("l_orderkey") >= 100) & (F.col("l_orderkey") <= 140)).collect())
    assert got == exp and len(got) > 0

    # fast path carries the same typed stats
    from sparkcodec.engine import encode_parquet_dataset

    src = str(tmp_path / "src.parquet")
    li.write.parquet(src)
    enc2 = encode_parquet_dataset(spark, src, stat_columns=("l_orderkey",))
    row = enc2.select("min_l_orderkey", "max_l_orderkey").first()
    assert row["min_l_orderkey"] <= row["max_l_orderkey"]


def test_bloom_probe_reads_only_bloom_columns(spark, toks, tmp_path):
    """The IO-prunable probe: when the encoded table carries bloom_<col>
    columns, the probe stage's parquet scan must NOT read payload -- its
    ReadSchema is (chunk_id, bloom_<col>) only."""
    from sparkcodec.engine import filter_chunks_may_contain, lookup_rows

    enc_dir = str(tmp_path / "enc")
    encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                     bloom_columns=("doc_id",),
                     auto_fastpath=False).write.parquet(enc_dir)
    enc = spark.read.parquet(enc_dir)
    assert "bloom_doc_id" in enc.columns
    target = toks.orderBy("doc_id").first()["doc_id"]
    pruned = filter_chunks_may_contain(enc, "doc_id", target)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted")
    # two scans: the probe side (narrow) and the kept side (full). At
    # least one scan -- the probe -- must read bloom_doc_id WITHOUT payload.
    scans = [line for line in plan.splitlines() if "ReadSchema" in line]
    narrow = [s for s in scans
              if "bloom_doc_id" in s and "payload" not in s]
    assert narrow, plan
    assert narrow[0].count(",") <= 2, narrow  # chunk_id + bloom only
    # correctness unchanged: exactly the target row comes back
    got = lookup_rows(enc, "doc_id", target).collect()
    assert len(got) == 1 and got[0]["doc_id"] == target
    # roundtrip of the full encoded table still exact with bloom columns present
    dec = decode_dataframe(enc)
    assert dec.count() == toks.count()


def test_lookup_rows_in_batch_needles(spark, toks, tmp_path):
    """IN-list lookup: one vectorized bloom pass admits chunks containing
    ANY of the K needles; the probe scan stays narrow (no payload), the
    pruned chunk count is at most the sum of the per-needle prunes, and
    the rows come back exact -- including an all-miss empty result."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import (
        filter_chunks_may_contain_any, lookup_rows, lookup_rows_in,
    )

    enc_dir = str(tmp_path / "enc")
    encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                     bloom_columns=("doc_id",),
                     auto_fastpath=False).write.parquet(enc_dir)
    enc = spark.read.parquet(enc_dir)
    ids = [r["doc_id"] for r in toks.orderBy("doc_id").limit(50).collect()]
    targets = ids[::10]  # 5 spread-out needles

    got = lookup_rows_in(enc, "doc_id", targets)
    rows = {r["doc_id"]: r["n_tok"] for r in got.collect()}
    exp = {r["doc_id"]: r["n_tok"] for r in
           toks.filter(F.col("doc_id").isin(targets)).collect()}
    assert rows == exp and len(rows) == len(targets)

    # the batch probe prunes: fewer chunks than the table, and no more
    # than the union of single-needle probes
    n_all = enc.count()
    n_batch = filter_chunks_may_contain_any(enc, "doc_id", targets).count()
    singles = set()
    for t in targets:
        from sparkcodec.engine import filter_chunks_may_contain

        singles |= {r["chunk_id"] for r in filter_chunks_may_contain(
            enc, "doc_id", t).select("chunk_id").collect()}
    assert n_batch <= len(singles) and n_batch < n_all

    # all-miss -> empty, empty list -> empty
    assert lookup_rows_in(enc, "doc_id", [-1, -2]).count() == 0
    assert lookup_rows_in(enc, "doc_id", []).count() == 0
    # a one-shot iterable must not be exhausted by the probe before the
    # exact IN-list filter sees it
    gen = (t for t in targets)
    assert {r["doc_id"] for r in lookup_rows_in(enc, "doc_id", gen).collect()} \
        == set(targets)
    # consistent with the single-value operator
    one = lookup_rows(enc, "doc_id", targets[0]).collect()
    assert len(one) == 1 and one[0]["doc_id"] == targets[0]


def test_probe_rows_conjunctive_pruning(spark, toks, tmp_path):
    """probe_rows composes BOTH prune structures before decode: the n_tok
    range pushes down into the encoded table's parquet scan
    (PushedFilters on min_/max_n_tok) AND the bloom probe stage reads
    only (chunk_id, bloom_doc_id) -- plus exact conjunctive filtering of
    the decoded rows, including the all-pruned empty case."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import probe_rows

    enc_dir = str(tmp_path / "enc")
    encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                     bloom_columns=("doc_id",), stat_columns=("n_tok",),
                     auto_fastpath=False).write.parquet(enc_dir)
    enc = spark.read.parquet(enc_dir)
    row = toks.orderBy("doc_id").first()
    target, ntk = row["doc_id"], row["n_tok"]

    hit = probe_rows(enc, equals={"doc_id": target},
                     ranges={"n_tok": (ntk - 5, ntk + 5)})
    plan = hit._sc._jvm.PythonSQLUtils.explainString(
        hit._jdf.queryExecution(), "formatted")
    # prune stage 1: typed stats predicate reaches the parquet scan
    assert "PushedFilters" in plan
    assert "max_n_tok" in plan.split("PushedFilters")[1][:400], plan
    # prune stage 2: a narrow bloom-probe scan without payload
    scans = [line for line in plan.splitlines() if "ReadSchema" in line]
    narrow = [s for s in scans if "bloom_doc_id" in s and "payload" not in s]
    assert narrow, plan
    got = hit.collect()
    assert len(got) == 1 and got[0]["doc_id"] == target
    assert got[0]["n_tok"] == ntk

    # conjunction is real: same key, disjoint range -> empty (stats prune
    # may remove every chunk; must not crash on schema inference)
    miss = probe_rows(enc, equals={"doc_id": target},
                      ranges={"n_tok": (ntk + 10**6, None)})
    assert miss.count() == 0
    with pytest.raises(ValueError, match="at least one"):
        probe_rows(enc)


def test_stats_blooms_and_source_file_column_order(spark, toks, tmp_path):
    """stat_columns + bloom_columns + include_source_file together: the
    output DDL must match the worker's record-batch column order
    (source_file is appended LAST after bloom/stat columns)."""
    from sparkcodec.engine import encode_parquet_dataset

    src = str(tmp_path / "in.parquet")
    toks.write.parquet(src)
    enc = encode_parquet_dataset(
        spark, src, chunk_rows=128,
        bloom_columns=("doc_id",), stat_columns=("n_tok",),
        include_source_file=True)
    rows = enc.collect()
    assert len(rows) > 1
    cols = enc.columns
    assert cols.index("bloom_doc_id") < cols.index("min_n_tok") < cols.index("source_file")
    for r in rows:
        assert r["source_file"].endswith(".parquet")
        assert r["min_n_tok"] is not None and r["min_n_tok"] <= r["max_n_tok"]
        assert r["bloom_doc_id"] is None or len(r["bloom_doc_id"]) > 0
    # decode still exact with all the extra metadata columns present
    dec = decode_dataframe(enc)
    assert dec.count() == toks.count()


def test_lookup_miss_returns_empty_not_crash(spark, toks):
    """A needle query for an absent key prunes every chunk: it must return
    an EMPTY result, not crash on schema inference over zero rows
    (code-review r3 finding)."""
    from sparkcodec.engine import lookup_rows, range_scan_rows

    enc = encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                           bloom_columns=("doc_id",),
                           auto_fastpath=False).cache()
    enc.count()
    miss = lookup_rows(enc, "doc_id", "zzz-no-such-doc")
    assert miss.count() == 0
    assert "doc_id" in miss.columns  # schema still the decoded one
    empty_range = range_scan_rows(
        encode_dataframe(toks, auto_fastpath=False), "n_tok",
        10**9, 2 * 10**9, "long")
    assert empty_range.count() == 0
    enc.unpersist()


def test_column_hashes_bounded_by_total_bytes(spark):
    """One megabyte-long value must not inflate every row's padded hash
    width (code-review r3 finding: n x max_len matrix)."""
    import pyarrow as pa

    from sparkcodec.engine import _column_hashes
    from sparkcodec.kernels.bloom import xxhash64_matrix

    vals = ["short"] * 5000 + ["x" * 1_000_000]
    arr = pa.array(vals, type=pa.large_string())
    h = _column_hashes(arr)
    assert len(h) == 5001 and len(set(h.tolist())) == 2
    # equals the reference single-row hash of the long value
    big = np.frombuffer(b"x" * 1_000_000, dtype="u1")[None, :]
    ref = xxhash64_matrix(big, np.array([1_000_000]))
    assert h[-1] == ref[0]


def test_bloom_date_timestamp_probes(spark):
    """Blooms on date/timestamp columns: hits found, misses prune every
    chunk, float probes/columns rejected with clear errors (review r3)."""
    import datetime

    from sparkcodec.engine import filter_chunks_may_contain, lookup_rows

    d = spark.range(100).selectExpr(
        "date_add(DATE'2020-01-01', CAST(id AS INT)) AS d", "id")
    enc = encode_dataframe(d.repartition(2), chunk_rows=32,
                           auto_fastpath=False, bloom_columns=("d",)).cache()
    hit = lookup_rows(enc, "d", datetime.date(2020, 2, 1)).collect()
    assert len(hit) == 1 and hit[0]["id"] == 31
    assert filter_chunks_may_contain(
        enc, "d", datetime.date(1999, 1, 1)).count() == 0
    ts = spark.range(100).selectExpr(
        "timestamp_micros(id * 1000000) AS ts", "id")
    enc2 = encode_dataframe(ts.repartition(2), chunk_rows=32,
                            auto_fastpath=False, bloom_columns=("ts",)).cache()
    hit2 = lookup_rows(enc2, "ts",
                       datetime.datetime(1970, 1, 1, 0, 0, 42)).collect()
    assert len(hit2) == 1 and hit2[0]["id"] == 42
    assert filter_chunks_may_contain(
        enc2, "ts", datetime.datetime(2001, 1, 1)).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="blooms are built"):
        encode_dataframe(spark.range(5).selectExpr("CAST(id AS DOUBLE) AS f"),
                         auto_fastpath=False, bloom_columns=("f",))
    with _pt.raises(Exception, match="bloom probes"):
        lookup_rows(enc, "d", 3.5).collect()


def test_aux_columns_validated_against_projection(spark, toks, tmp_path):
    """Scan-side encodes reject stat/bloom columns outside the read
    projection (stats would KeyError executor-side; blooms would silently
    emit all-null and never prune)."""
    import pytest as _pt

    from sparkcodec.engine import encode_parquet_dataset, encode_to_parquet

    src = str(tmp_path / "src.parquet")
    toks.write.parquet(src)
    with _pt.raises(ValueError, match="not in the read projection"):
        encode_parquet_dataset(spark, src, columns=["doc_id"],
                               stat_columns=("n_tok",))
    with _pt.raises(ValueError, match="not in the read projection"):
        encode_to_parquet(spark, src, str(tmp_path / "o"),
                          columns=["doc_id"], bloom_columns=("n_tok",))


def test_range_scan_dotted_column_meta_json(spark):
    """filter_chunks_by_range over a dotted column name must address the
    literal meta_json key (dot notation would navigate nested fields,
    yield NULL, and silently prune every chunk)."""
    from sparkcodec.engine import filter_chunks_by_range

    d = spark.range(100).selectExpr("id AS `k.x`", "CAST(id AS INT) AS v")
    enc = encode_dataframe(d.repartitionByRange(4, "`k.x`"), chunk_rows=16,
                           auto_fastpath=False)
    kept = filter_chunks_by_range(enc, "k.x", 10, 20, "long")
    assert 0 < kept.count() < enc.count()


def test_decode_to_parquet_rolling_files_and_blob_validation(spark, toks, tmp_path):
    """decode_to_parquet rolls output files at target_file_bytes (bounded
    task memory / bounded file sizes) and validates unknown columns on the
    single-blob layout too."""
    import pytest as _pt

    from sparkcodec.engine import decode_to_parquet

    enc_dir = str(tmp_path / "enc")
    encode_dataframe(range_repartition(toks, 2), chunk_rows=64,
                     auto_fastpath=False).write.parquet(enc_dir)
    out = str(tmp_path / "dec")
    manifest = decode_to_parquet(spark, enc_dir, out, n_splits=2,
                                 target_file_bytes=4 << 10).collect()
    assert len(manifest) > 2  # rolled: several files per task
    assert sum(r["n_rows"] for r in manifest) == toks.count()
    back = spark.read.parquet(out)
    assert back.count() == toks.count()
    assert (back.agg(F.expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))")).collect()
            == toks.agg(F.expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))")).collect())
    with _pt.raises(ValueError, match="unknown columns"):
        decode_to_parquet(spark, enc_dir, str(tmp_path / "x"),
                          columns=["tokns"])


def test_bloom_probe_unit_detection_and_far_future(spark, tmp_path):
    """Timestamp bloom probes must hash at the ENCODED column's unit
    (scan-side sources are often ns/ms, Spark-side us) -- a fixed-us probe
    silently false-negatives; and datetime->micros must use exact integer
    arithmetic (float total_seconds() drops the last microsecond past
    ~2100, e.g. the 9999-12-31 warehouse sentinel)."""
    import datetime

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkcodec.engine import encode_parquet_dataset, lookup_rows

    ts = [datetime.datetime(2020, 1, 1) + datetime.timedelta(seconds=i)
          for i in range(99)] + [datetime.datetime(9999, 12, 31, 23, 59, 59, 999999)]
    tbl = pa.table({"ts": pa.array(ts, type=pa.timestamp("ms")),
                    "id": pa.array(range(100), type=pa.int64())})
    src = str(tmp_path / "ns.parquet")
    pq.write_table(tbl, src)
    enc = encode_parquet_dataset(spark, src, chunk_rows=32,
                                 bloom_columns=("ts",)).cache()
    hit = lookup_rows(enc, "ts", datetime.datetime(2020, 1, 1, 0, 0, 42)).collect()
    assert len(hit) == 1 and hit[0]["id"] == 42
    far = lookup_rows(
        enc, "ts", datetime.datetime(9999, 12, 31, 23, 59, 59, 999000)).collect()
    assert len(far) == 1 and far[0]["id"] == 99


def test_misspelled_aux_column_raises(spark, toks):
    import pytest as _pt

    with _pt.raises(ValueError, match="does not exist"):
        encode_dataframe(toks, auto_fastpath=False, bloom_columns=("doc_idd",))
    with _pt.raises(ValueError, match="does not exist"):
        encode_dataframe(toks, auto_fastpath=False, stat_columns=("n_tokk",))


def test_decode_to_parquet_rerun_cleans_stale_rolls(spark, toks, tmp_path):
    """Re-running decode_to_parquet into the same dir with a larger
    target_file_bytes must remove the previous run's higher-index rolled
    files -- reads of out_dir must see exactly the current run's rows."""
    from sparkcodec.engine import decode_to_parquet

    enc_dir = str(tmp_path / "enc")
    encode_dataframe(range_repartition(toks, 2), chunk_rows=64,
                     auto_fastpath=False).write.parquet(enc_dir)
    out = str(tmp_path / "dec")
    m1 = decode_to_parquet(spark, enc_dir, out, n_splits=2,
                           target_file_bytes=4 << 10).collect()
    assert len(m1) > 2
    m2 = decode_to_parquet(spark, enc_dir, out, n_splits=2).collect()
    assert len(m2) <= 2
    back = spark.read.parquet(out)
    assert back.count() == toks.count()


def test_exotic_arrow_types_scan_roundtrip(spark, tmp_path):
    """Real-world parquet carries arrow types Spark's bridge lacks:
    unsigned ints (uint64 above 2^63 bit-exact via decimal(20,0)),
    int8/16, float16, fixed-size binary, second-unit timestamps, nested
    list<uint16>.  The engine widens losslessly for the chunk codecs
    (schema_json keeps the original type) and lowers at the Arrow bridge
    per Spark's own parquet conventions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkcodec.engine import encode_parquet_dataset

    n = 100
    tbl = pa.table({
        "u8": pa.array(np.arange(n, dtype=np.uint8)),
        "u16": pa.array(np.arange(n, dtype=np.uint16) * 600),
        "u32": pa.array(np.arange(n, dtype=np.uint32) * 40_000_000),
        "u64": pa.array((np.arange(n, dtype=np.uint64) << 57) + 3),
        "i8": pa.array(np.arange(-50, 50, dtype=np.int8)),
        "i16": pa.array(np.arange(-50, 50, dtype=np.int16)),
        "f16": pa.array(np.arange(n, dtype=np.float16)),
        "ts_s": pa.array(range(n), type=pa.timestamp("s")),
        "fx": pa.array([bytes([i] * 4) for i in range(n)], type=pa.binary(4)),
        "lu16": pa.array([[1, 2], [65535]] * (n // 2),
                         type=pa.list_(pa.uint16())),
        "id": pa.array(range(n)),
    })
    src = str(tmp_path / "exotic.parquet")
    pq.write_table(tbl, src)
    enc = encode_parquet_dataset(spark, src, chunk_rows=32)
    dec = decode_dataframe(enc)
    types = dict(dec.dtypes)
    assert types["u8"] == "smallint" and types["u16"] == "int"
    assert types["u32"] == "bigint" and types["u64"] == "decimal(20,0)"
    assert types["i8"] == "tinyint" and types["f16"] == "float"
    assert types["fx"] == "binary" and types["lu16"] == "array<int>"
    rows = dec.orderBy("id").collect()
    assert int(rows[99]["u64"]) == int((np.uint64(99) << np.uint64(57)) + np.uint64(3))
    assert rows[99]["u8"] == 99 and rows[0]["i8"] == -50
    assert list(rows[1]["lu16"]) == [65535]
    assert rows[5]["fx"] == bytes([5] * 4)


def test_time_columns_spark_guidance_and_native_sink(spark, tmp_path):
    """Spark's Arrow bridge rejects TIME: full decode raises with
    guidance, a projection excluding the time column works, and
    decode_to_parquet preserves the native time64 type."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from sparkcodec.engine import decode_to_parquet, encode_parquet_dataset

    src = str(tmp_path / "time.parquet")
    pq.write_table(pa.table({"t": pa.array(range(50), type=pa.time64("us")),
                             "id": pa.array(range(50))}), src)
    enc = encode_parquet_dataset(spark, src, chunk_rows=16)
    with _pt.raises(NotImplementedError, match="decode_to_parquet"):
        decode_dataframe(enc).count()
    assert decode_dataframe(enc, columns=["id"]).count() == 50
    enc_dir = str(tmp_path / "enc")
    enc.write.parquet(enc_dir)
    out = str(tmp_path / "out")
    decode_to_parquet(spark, enc_dir, out).collect()
    back = pq.read_table(out)
    assert str(back.schema.field("t").type) == "time64[us]"
    assert back.column("t")[5].as_py().microsecond == 5


def test_uint_blooms_and_stats(spark, tmp_path):
    """uint64 blooms hash the int64 bit pattern (values above 2^63
    bit-exact; probe wraps identically; the final exact filter uses a
    Decimal literal); uint16 typed stats lower to a bridge-compatible
    int32; uint64 stats are rejected with a clear error."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from sparkcodec.engine import (
        encode_parquet_dataset, filter_chunks_may_contain, lookup_rows,
        range_scan_rows,
    )

    src = str(tmp_path / "u.parquet")
    pq.write_table(pa.table({
        "u64": pa.array((np.arange(100, dtype=np.uint64) << 57) + 3),
        "u16": pa.array(np.arange(100, dtype=np.uint16) * 600),
        "id": pa.array(range(100))}), src)
    enc = encode_parquet_dataset(spark, src, chunk_rows=16,
                                 bloom_columns=("u64",),
                                 stat_columns=("u16",)).cache()
    target = int((np.uint64(99) << np.uint64(57)) + np.uint64(3))
    hit = lookup_rows(enc, "u64", target).collect()
    assert len(hit) == 1 and int(hit[0]["id"]) == 99
    assert filter_chunks_may_contain(enc, "u64", 12345).count() < enc.count()
    got = sorted(r["id"] for r in
                 range_scan_rows(enc, "u16", 600, 1800, "int").collect())
    assert got == [1, 2, 3]
    # range bounds past int64 take the same Decimal lowering as equality
    # probes (u64 decodes to DecimalType(20,0); a bare 2**63 literal has
    # no JVM long representation)
    lo = int((np.uint64(98) << np.uint64(57)) + np.uint64(3))
    got64 = sorted(int(r["id"]) for r in
                   range_scan_rows(enc, "u64", lo, None,
                                   "decimal(20,0)").collect())
    assert got64 == [98, 99]
    with _pt.raises(Exception, match="uint64"):
        encode_parquet_dataset(spark, src, stat_columns=("u64",)).count()


def test_exotic_types_native_sink_roundtrip(spark, tmp_path):
    """decode_to_parquet preserves the ORIGINAL arrow types exactly --
    uint8/uint64 (incl. values above 2^63), int16, float16, time64,
    fixed-size binary -- because its sink is our own writer, not Spark's
    bridge.  Type AND value equality both ways."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkcodec.engine import decode_to_parquet, encode_parquet_dataset

    n = 100
    tbl = pa.table({
        "u8": pa.array(np.arange(n, dtype=np.uint8)),
        "u64": pa.array((np.arange(n, dtype=np.uint64) << 57) + 3),
        "i16": pa.array(np.arange(-50, 50, dtype=np.int16)),
        "f16": pa.array(np.arange(n, dtype=np.float16)),
        "t64": pa.array(range(n), type=pa.time64("us")),
        "fx": pa.array([bytes([i] * 4) for i in range(n)], type=pa.binary(4)),
        "id": pa.array(range(n))})
    src = str(tmp_path / "src.parquet")
    pq.write_table(tbl, src)
    enc_dir = str(tmp_path / "enc")
    encode_parquet_dataset(spark, src, chunk_rows=32).write.parquet(enc_dir)
    out = str(tmp_path / "out")
    decode_to_parquet(spark, enc_dir, out).collect()
    back = pq.read_table(out).sort_by("id")
    for name in tbl.column_names:
        a, b = tbl.column(name), back.column(name)
        assert a.type.equals(b.type), name
        assert a.combine_chunks().to_pylist() == \
            b.combine_chunks().to_pylist(), name


def test_null_stat_chunks_survive_range_pruning(spark):
    """A NULL meta bound means 'no sound bound' -- the chunk MAY match and
    must survive range pruning (a plain comparison evaluated NULL and
    silently pruned it, losing real rows)."""
    from sparkcodec.engine import range_scan_rows

    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("nan")), (3, 5.0), (4, 7.0)],
        "id INT, v DOUBLE").repartition(2)
    enc = encode_dataframe(df, chunk_rows=2, auto_fastpath=False)
    rows = sorted(r["id"] for r in range_scan_rows(enc, "v", 4.0, 8.0).collect())
    assert rows == [3, 4]


def test_float16_stat_columns_and_np_uint64_probe(spark, tmp_path):
    """float16 stat columns lower to float32 end-to-end (pyarrow has no
    halffloat min_max kernel); numpy-integer probes above 2^63-1 convert
    to Decimal literals like plain ints do."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkcodec.engine import encode_parquet_dataset, lookup_rows, range_scan_rows

    src = str(tmp_path / "f16.parquet")
    pq.write_table(pa.table({"f16": pa.array(np.arange(100, dtype=np.float16)),
                             "id": pa.array(range(100))}), src)
    enc = encode_parquet_dataset(spark, src, chunk_rows=16,
                                 stat_columns=("f16",))
    got = sorted(r["id"] for r in range_scan_rows(enc, "f16", 10.0, 12.0).collect())
    assert got == [10, 11, 12]
    src2 = str(tmp_path / "u.parquet")
    pq.write_table(pa.table(
        {"u64": pa.array((np.arange(100, dtype=np.uint64) << 57) + 3),
         "id": pa.array(range(100))}), src2)
    enc2 = encode_parquet_dataset(spark, src2, chunk_rows=16,
                                  bloom_columns=("u64",))
    t = np.uint64((np.uint64(99) << np.uint64(57)) + np.uint64(3))
    hit = lookup_rows(enc2, "u64", t).collect()
    assert len(hit) == 1 and int(hit[0]["id"]) == 99


def test_element_bloom_planted_needles(spark):
    """Element-level blooms on an array<int> column: 'which rows' arrays
    contain token X' prunes at the chunk level before any decode -- the
    token-native needle shape over the contract payload.  Planted corpus:
    row i holds [i % 50, 1000 + i], so 1000+i is unique to row i and
    i % 50 is corpus-wide boilerplate."""
    from sparkcodec.engine import (
        filter_chunks_may_contain,
        filter_chunks_may_contain_all,
        lookup_rows_containing,
    )

    df = spark.createDataFrame(
        [(i, [i % 50, 1000 + i]) for i in range(400)],
        "id INT, tokens ARRAY<INT>").coalesce(1).sortWithinPartitions("id")
    enc = encode_dataframe(df, chunk_rows=50, bloom_columns=("tokens",),
                           auto_fastpath=False).cache()
    total = enc.count()
    assert total == 8
    # rare element: only the chunk holding row 7 survives the bloom
    assert filter_chunks_may_contain(enc, "tokens", 1007).count() < total
    got = lookup_rows_containing(enc, "tokens", [1007]).collect()
    assert [r["id"] for r in got] == [7]
    # ANY semantics across two rare elements in different chunks
    got = sorted(r["id"] for r in
                 lookup_rows_containing(enc, "tokens", [1007, 1357]).collect())
    assert got == [7, 357]
    # ALL semantics: boilerplate 7 is everywhere, 1007 pins row 7; the
    # contains-all prune needs BOTH admitted, so only row 7's chunk decodes
    assert filter_chunks_may_contain_all(enc, "tokens", [7, 1007]).count() < total
    got = lookup_rows_containing(enc, "tokens", [7, 1007], mode="all").collect()
    assert [r["id"] for r in got] == [7]
    # absent element: exact filter guarantees empty regardless of bloom FPs
    assert lookup_rows_containing(enc, "tokens", [49999]).count() == 0
    enc.unpersist()


def test_element_bloom_matches_plain_filter_on_tokens_table(spark, toks):
    """Integration over the contract table: lookup_rows_containing on an
    encoded tokens table equals array_contains over the source, for a
    rare needle (the corpus-max token value)."""
    from sparkcodec.engine import lookup_rows_containing

    needle = toks.select(
        F.max(F.array_max("tokens")).alias("m")).collect()[0]["m"]
    enc = encode_dataframe(range_repartition(toks, 8), chunk_rows=64,
                           bloom_columns=("tokens",), auto_fastpath=False)
    got = sorted(r["doc_id"] for r in
                 lookup_rows_containing(enc, "tokens", [needle]).collect())
    exp = sorted(r["doc_id"] for r in
                 toks.filter(F.array_contains("tokens", needle)).collect())
    assert got == exp and len(got) > 0


def test_element_bloom_scan_side_and_validation(spark, tmp_path):
    """Scan-side encode (pyarrow path) builds element blooms for list
    columns too, and the aux-column validation accepts array<int> /
    array<string> while still rejecting unhashable element types."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkcodec.engine import (
        encode_parquet_dataset,
        filter_chunks_may_contain,
        lookup_rows_containing,
    )

    src = str(tmp_path / "toks.parquet")
    pq.write_table(pa.table({
        "id": pa.array(range(200), type=pa.int32()),
        "tokens": pa.array([[i % 10, 5000 + i] for i in range(200)],
                           type=pa.list_(pa.int32())),
    }), src)
    enc = encode_parquet_dataset(spark, src, chunk_rows=25,
                                 bloom_columns=("tokens",)).cache()
    total = enc.count()
    assert filter_chunks_may_contain(enc, "tokens", 5003).count() < total
    got = lookup_rows_containing(enc, "tokens", [5003]).collect()
    assert [r["id"] for r in got] == [3]
    enc.unpersist()
    # unhashable element type rejected up front, not silently no-op
    bad = spark.createDataFrame([(1, [1.5])], "id INT, v ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="bloom_columns"):
        encode_dataframe(bad, bloom_columns=("v",), auto_fastpath=False)


def test_probe_rows_contains_conjunctive(spark):
    """probe_rows composes element-containment with stats ranges: the id
    range prunes via typed min/max (pushed into the encoded table's
    parquet scan), the token set prunes via the element bloom, and only
    the intersection decodes."""
    from sparkcodec.engine import probe_rows

    df = spark.createDataFrame(
        [(i, [i % 50, 1000 + i]) for i in range(400)],
        "id INT, tokens ARRAY<INT>").coalesce(1).sortWithinPartitions("id")
    enc = encode_dataframe(df, chunk_rows=50, bloom_columns=("tokens",),
                           stat_columns=("id",), auto_fastpath=False)
    got = probe_rows(enc, ranges={"id": (100, 200)},
                     contains={"tokens": 1150},
                     range_dtypes={"id": "int"}).collect()
    assert [r["id"] for r in got] == [150]
    # conjunctive contains-all: element list with boilerplate + unique
    got = probe_rows(enc, contains={"tokens": [150 % 50, 1150]}).collect()
    assert [r["id"] for r in got] == [150]
    # disjoint range and element: empty, not a crash
    assert probe_rows(enc, ranges={"id": (0, 50)},
                      contains={"tokens": 1150},
                      range_dtypes={"id": "int"}).count() == 0


def test_ndv_sketches_metadata_only(spark, toks, tmp_path):
    """Per-chunk HLL sketches: estimate_ndv answers dataset-level distinct
    counts from the ndv_<col> columns alone -- the scan over a PERSISTED
    encoded table must not read payload bytes -- and the estimate tracks
    the true cardinalities (exact via linear counting at fixture scale,
    <2% at sketch scale by construction)."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import (
        encode_dataframe, estimate_ndv, ndv_registers, range_repartition,
    )

    enc_dir = str(tmp_path / "enc")
    encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                     ndv_columns=("tokens", "source"),
                     auto_fastpath=False).write.parquet(enc_dir)
    enc = spark.read.parquet(enc_dir)
    assert "ndv_tokens" in enc.columns

    true_tok = toks.select(F.explode("tokens").alias("t")) \
                   .agg(F.countDistinct("t")).collect()[0][0]
    est = estimate_ndv(enc, "tokens")
    assert abs(est - true_tok) / true_tok < 0.05
    true_src = toks.agg(F.countDistinct("source")).collect()[0][0]
    assert abs(estimate_ndv(enc, "source") - true_src) / true_src < 0.05

    # metadata-only: the merge plan's parquet scan reads ONLY the sketch
    narrow = enc.select("ndv_tokens")
    plan = narrow._sc._jvm.PythonSQLUtils.explainString(
        narrow._jdf.queryExecution(), "formatted")
    scans = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert scans and all(
        "ndv_tokens" in s and "payload" not in s for s in scans), plan

    # registers are integer-exact and partitioning-independent: re-encode
    # at a different parallelism, same merged registers
    enc2 = encode_dataframe(range_repartition(toks, 2), chunk_rows=256,
                            ndv_columns=("tokens",), auto_fastpath=False)
    r1 = sorted(map(tuple, ndv_registers(enc, "tokens").collect()))
    r2 = sorted(map(tuple, ndv_registers(enc2, "tokens").collect()))
    assert r1 == r2


def test_ndv_column_validation(spark, toks):
    import pytest

    from sparkcodec.engine import encode_dataframe

    with pytest.raises(ValueError, match="does not exist"):
        encode_dataframe(toks, ndv_columns=("nope",), auto_fastpath=False)


def test_magnitude_histogram_exact(spark, tmp_path):
    """hist_<col>: exact power-of-two magnitude counts, mergeable across
    chunks by elementwise sum, covering sign/zero/INT64-extreme buckets;
    the rollup runs over the persisted metadata without payload reads."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import encode_dataframe, magnitude_histogram

    vals = [0, 1, 2, 3, 255, 256, -1, -2, -255, -256,
            (1 << 62), -(1 << 62), -(1 << 63), (1 << 63) - 1]
    df = spark.createDataFrame([(v,) for v in vals * 10], "x BIGINT")
    enc = encode_dataframe(df.repartition(3), chunk_rows=16,
                           hist_columns=("x",), auto_fastpath=False)
    got = {r.bucket: r.cnt for r in magnitude_histogram(enc, "x").collect()}

    def bucket(v: int) -> int:
        if v == 0:
            return 0
        if v > 0:
            return v.bit_length()
        return 64 + (-(v + 1)).bit_length()

    expected: dict[int, int] = {}
    for v in vals * 10:
        expected[bucket(v)] = expected.get(bucket(v), 0) + 1
    assert got == expected

    # persisted table: the rollup's scan must read only the hist column
    enc_dir = str(tmp_path / "enc")
    enc.write.parquet(enc_dir)
    roll = magnitude_histogram(spark.read.parquet(enc_dir), "x")
    plan = roll._sc._jvm.PythonSQLUtils.explainString(
        roll._jdf.queryExecution(), "formatted")
    scans = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert scans and all("hist_x" in s and "payload" not in s for s in scans), plan
    assert {r.bucket: r.cnt for r in roll.collect()} == expected


def test_magnitude_histogram_list_elements_and_validation(spark, toks):
    import pytest
    from pyspark.sql import functions as F

    from sparkcodec.engine import encode_dataframe, magnitude_histogram

    enc = encode_dataframe(toks.repartition(2), chunk_rows=64,
                           hist_columns=("tokens",), auto_fastpath=False)
    got = {r.bucket: r.cnt for r in magnitude_histogram(enc, "tokens").collect()}
    exp_rows = (toks.select(F.explode("tokens").alias("t"))
                .select(F.when(F.col("t") == 0, 0)
                        .when(F.col("t") > 0,
                              (F.floor(F.log2(F.col("t"))) + 1).cast("int"))
                        .alias("b"))
                .groupBy("b").count().collect())
    assert got == {r.b: r["count"] for r in exp_rows}

    with pytest.raises(ValueError, match="int/timestamp/date"):
        encode_dataframe(toks, hist_columns=("doc_id",), auto_fastpath=False)


def test_apply_deletes_mask_exact_and_idempotent(spark, toks):
    """Deletion vectors: payloads untouched, decode equals the plain
    filter, sequential deletes OR into the mask, re-applying the same
    predicate changes nothing."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import apply_deletes, decode_dataframe

    enc = encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                           stat_columns=("n_tok",),
                           bloom_columns=("source",), auto_fastpath=False)
    thr = int(toks.agg(F.expr("percentile(n_tok, 0.8)")).collect()[0][0])
    src = toks.select("source").first()["source"]

    m1 = apply_deletes(enc, ranges={"n_tok": (thr, None)})
    exp1 = toks.filter(~(F.col("n_tok") >= thr))
    got1 = sorted(map(tuple, decode_dataframe(m1)
                      .select("doc_id", "n_tok", "source").collect()))
    want1 = sorted(map(tuple, exp1.select("doc_id", "n_tok", "source").collect()))
    assert got1 == want1
    # live accounting matches
    assert (m1.agg(F.sum("n_live")).collect()[0][0] == exp1.count())

    m2 = apply_deletes(m1, equals={"source": src})
    exp2 = exp1.filter(~(F.col("source") == src))
    assert decode_dataframe(m2).count() == exp2.count()
    m3 = apply_deletes(m2, equals={"source": src})
    assert decode_dataframe(m3).count() == exp2.count()

    # deleting a value no bloom admits touches nothing (short-circuit)
    m4 = apply_deletes(m2, equals={"source": "no-such-source"})
    a = sorted(map(tuple, m2.select("chunk_id", "n_live").collect()))
    b = sorted(map(tuple, m4.select("chunk_id", "n_live").collect()))
    assert a == b


def test_apply_deletes_stat_short_circuit_and_dead_chunks(spark, toks):
    """On a layout clustered by the predicate column, chunks outside the
    deleted range keep a NULL mask (they were never decoded), chunks fully
    inside it reach n_live = 0, and decode drops them before payload
    reads (the encoded-side n_live filter)."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import apply_deletes, decode_dataframe

    clustered = toks.orderBy("n_tok").coalesce(1)
    enc = encode_dataframe(clustered, chunk_rows=64,
                           stat_columns=("n_tok",), auto_fastpath=False)
    lo = int(toks.agg(F.expr("percentile(n_tok, 0.9)")).collect()[0][0])
    marked = apply_deletes(enc, ranges={"n_tok": (lo, None)})
    rows = marked.select("n_rows", "n_live",
                         F.col("del_mask").isNull().alias("untouched")).collect()
    assert any(r.untouched for r in rows)          # stats skipped some chunks
    assert any(r.n_live == 0 for r in rows) or \
        any(0 < r.n_live < r.n_rows for r in rows)  # clustered tail deleted
    got = sorted(r.doc_id for r in decode_dataframe(marked)
                 .select("doc_id").collect())
    want = sorted(r.doc_id for r in toks.filter(F.col("n_tok") < lo)
                  .select("doc_id").collect())
    assert got == want


def test_apply_deletes_validation(spark, toks):
    import pytest

    from sparkcodec.engine import apply_deletes

    enc = encode_dataframe(toks, auto_fastpath=False)
    with pytest.raises(ValueError, match="at least one"):
        apply_deletes(enc)


def test_apply_deletes_split_layout(spark, toks):
    """Deletion vectors on the per-column payload layout: marking decodes
    ONLY the predicate columns' cells, and the split decode honors the
    bitmap (and skips n_live=0 chunks) like the single-blob path."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import apply_deletes, decode_dataframe

    enc = encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                           split_payload=True, stat_columns=("n_tok",),
                           auto_fastpath=False)
    thr = int(toks.agg(F.expr("percentile(n_tok, 0.7)")).collect()[0][0])
    marked = apply_deletes(enc, ranges={"n_tok": (thr, None)})
    exp = toks.filter(F.col("n_tok") < thr)
    got = sorted(map(tuple, decode_dataframe(marked)
                     .select("doc_id", "n_tok", "source").collect()))
    want = sorted(map(tuple, exp.select("doc_id", "n_tok", "source").collect()))
    assert got == want
    # projection decode still prunes AND honors the mask
    got_proj = sorted(r.doc_id for r in
                      decode_dataframe(marked, columns=["doc_id"]).collect())
    assert got_proj == sorted(r.doc_id for r in exp.select("doc_id").collect())


def test_materialize_deletes_rewrites_clean(spark, toks):
    from pyspark.sql import functions as F

    from sparkcodec.engine import (
        apply_deletes, decode_dataframe, materialize_deletes,
    )

    enc = encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                           stat_columns=("n_tok",), auto_fastpath=False)
    thr = int(toks.agg(F.expr("percentile(n_tok, 0.5)")).collect()[0][0])
    marked = apply_deletes(enc, ranges={"n_tok": (thr, None)})
    clean = materialize_deletes(marked, stat_columns=("n_tok",))
    assert "del_mask" not in clean.columns
    got = sorted(r.doc_id for r in decode_dataframe(clean)
                 .select("doc_id").collect())
    want = sorted(r.doc_id for r in toks.filter(F.col("n_tok") < thr)
                  .select("doc_id").collect())
    assert got == want
    # payload really shrank: fewer encoded rows survive in the bytes
    assert (clean.agg(F.sum("n_rows")).collect()[0][0]
            == toks.filter(F.col("n_tok") < thr).count())


def test_compaction_preserves_delete_masks(spark, toks, tmp_path):
    from pyspark.sql import functions as F

    from sparkcodec.compact import compact_encoded
    from sparkcodec.engine import apply_deletes, decode_dataframe

    enc = encode_dataframe(range_repartition(toks, 4), chunk_rows=64,
                           stat_columns=("n_tok",), auto_fastpath=False)
    thr = int(toks.agg(F.expr("percentile(n_tok, 0.7)")).collect()[0][0])
    marked = apply_deletes(enc, ranges={"n_tok": (thr, None)})
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    marked.write.parquet(in_dir)
    compact_encoded(spark, in_dir, out_dir, target_file_bytes=1 << 16)
    got = sorted(r.doc_id for r in
                 decode_dataframe(spark.read.parquet(out_dir))
                 .select("doc_id").collect())
    want = sorted(r.doc_id for r in toks.filter(F.col("n_tok") < thr)
                  .select("doc_id").collect())
    assert got == want


def test_apply_deletes_predicate_validation(spark, toks):
    import pytest

    from sparkcodec.engine import apply_deletes

    enc = encode_dataframe(toks, auto_fastpath=False)
    with pytest.raises(ValueError, match="neither bound"):
        apply_deletes(enc, ranges={"n_tok": (None, None)})
    with pytest.raises(ValueError, match="not in the encoded schema"):
        apply_deletes(enc, equals={"typo_col": 1})


def test_aggregate_encoded_refuses_masked_tables(spark, toks):
    import pytest
    from pyspark.sql import functions as F

    from sparkcodec.engine import aggregate_encoded, apply_deletes

    enc = encode_dataframe(range_repartition(toks, 2), chunk_rows=64,
                           stat_columns=("n_tok",), agg_columns=("n_tok",),
                           auto_fastpath=False)
    thr = int(toks.agg(F.expr("percentile(n_tok, 0.5)")).collect()[0][0])
    marked = apply_deletes(enc, ranges={"n_tok": (thr, None)})
    with pytest.raises(ValueError, match="deletion vectors"):
        aggregate_encoded(marked, ["n_tok"])
