"""Checkpoint/resume + lineage manifest semantics."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from sparkcodec.engine import decode_dataframe
from sparkcodec.manifest import read_encoded, read_manifest, run_encode_job
from sparkcodec.tokens import tokens_table
from tests.conftest import SF_DIR


@pytest.fixture()
def toks(spark):
    return tokens_table(spark, SF_DIR)


def _tok_rows(df):
    return sorted((r["doc_id"], tuple(r["tokens"])) for r in df.collect())


def test_job_runs_and_manifests(spark, toks, tmp_path):
    out = str(tmp_path / "job")
    s = run_encode_job(spark, toks, out, num_partitions=6, job_id="j1",
                       input_snapshot="sf0.001/documents@v1")
    assert s["buckets_encoded"] > 0
    man = read_manifest(spark, out)
    rows = man.collect()
    assert len(rows) > 0
    assert all(r["input_snapshot"] == "sf0.001/documents@v1" for r in rows)
    assert all(r["tokens_per_sec"] > 0 for r in rows)
    assert all(r["bytes_out"] > 0 and r["n_tokens"] > 0 for r in rows)
    # decode everything committed -> exact equality with the source
    dec = decode_dataframe(read_encoded(spark, out))
    assert _tok_rows(dec) == _tok_rows(toks)


def test_rerun_is_noop(spark, toks, tmp_path):
    out = str(tmp_path / "job")
    run_encode_job(spark, toks, out, num_partitions=4)
    s2 = run_encode_job(spark, toks, out, num_partitions=4)
    assert s2["buckets_encoded"] == 0


def test_resume_after_partial_manifest_loss(spark, toks, tmp_path):
    """Simulate a crash where some buckets committed and others did not:
    drop half the manifest rows (their chunks become orphans), rerun, and
    require a complete, duplicate-free, exactly-decodable result."""
    out = str(tmp_path / "job")
    run_encode_job(spark, toks, out, num_partitions=6)
    man = read_manifest(spark, out)
    keep_buckets = [r["bucket"] for r in man.collect()][: man.count() // 2]
    kept = man.filter(F.col("bucket").isin(keep_buckets))
    # rewrite the manifest with only the "surviving" rows
    kept_pd = kept.toPandas()
    shutil.rmtree(f"{out}/manifest")
    spark.createDataFrame(kept_pd, man.schema).write.parquet(f"{out}/manifest")

    s = run_encode_job(spark, toks, out, num_partitions=6)
    assert s["buckets_encoded"] > 0

    man2 = read_manifest(spark, out)
    assert man2.select("bucket").distinct().count() == man2.count()  # no dupes
    dec = decode_dataframe(read_encoded(spark, out))
    assert _tok_rows(dec) == _tok_rows(toks)


def test_bucket_assignment_deterministic(spark, toks):
    from sparkcodec.engine import assign_weight_buckets

    a, na = assign_weight_buckets(toks, 8)
    b, nb = assign_weight_buckets(toks.orderBy(F.rand(3)), 8)
    assert na == nb
    ma = {r["doc_id"]: r["_bucket"] for r in a.collect()}
    mb = {r["doc_id"]: r["_bucket"] for r in b.collect()}
    assert ma == mb  # pure function of (source, doc_id) + totals


def test_files_job_resume_and_decode(spark, tmp_path):
    """Shuffle-free file-granular job: first run encodes every input file,
    rerun is a no-op, a file whose manifest rows vanish (simulated crash
    between chunk write and manifest append) is re-encoded idempotently,
    and the committed chunks decode to the exact input."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import decode_dataframe
    from sparkcodec.manifest import read_encoded_files, run_encode_files_job
    from sparkcodec.tokens import tokens_table
    from tests.conftest import SF_DIR

    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    toks = tokens_table(spark, SF_DIR)
    toks.repartition(4).write.mode("overwrite").parquet(src)

    s1 = run_encode_files_job(spark, src, out, input_snapshot="snap@1")
    assert s1["files_total"] == 4 and s1["files_encoded"] == 4

    s2 = run_encode_files_job(spark, src, out, input_snapshot="snap@1")
    assert s2["files_encoded"] == 0  # fully resumed, nothing re-done

    # crash simulation: drop one file's manifest rows; rerun re-encodes it
    man = spark.read.parquet(f"{out}/manifest")
    victim = man.select("source_file").first()[0]
    kept_pdf = man.filter(F.col("source_file") != victim).toPandas()
    import shutil

    shutil.rmtree(f"{out}/manifest")
    spark.createDataFrame(kept_pdf).write.mode("overwrite") \
        .parquet(f"{out}/manifest")
    s3 = run_encode_files_job(spark, src, out, input_snapshot="snap@1")
    assert s3["files_encoded"] == 1

    committed = read_encoded_files(spark, out)
    # lineage present per file
    man2 = spark.read.parquet(f"{out}/manifest")
    assert man2.filter(F.col("input_snapshot") == "snap@1").count() >= 4
    dec = decode_dataframe(committed)
    a = sorted((r["doc_id"], tuple(r["tokens"] or ())) for r in dec.collect())
    b = sorted((r["doc_id"], tuple(r["tokens"] or ())) for r in toks.collect())
    assert a == b


def test_encode_jobs_split_payload_roundtrip(spark, tmp_path):
    """Both resumable jobs accept split_payload and the chunks decode
    exactly (resume machinery is layout-agnostic)."""
    from sparkcodec.engine import decode_dataframe
    from sparkcodec.manifest import (
        read_encoded, read_encoded_files, run_encode_files_job, run_encode_job,
    )
    from sparkcodec.tokens import tokens_table
    from tests.conftest import SF_DIR

    toks = tokens_table(spark, SF_DIR)
    out_b = str(tmp_path / "buckets")
    run_encode_job(spark, toks, out_b, num_partitions=4, split_payload=True)
    enc_b = read_encoded(spark, out_b)
    assert "payload_tokens" in enc_b.columns and "payload" not in enc_b.columns
    assert decode_dataframe(
        enc_b.drop("bucket")).count() == toks.count()

    src = str(tmp_path / "src")
    toks.write.parquet(src)
    out_f = str(tmp_path / "files")
    run_encode_files_job(spark, src, out_f, split_payload=True)
    enc_f = read_encoded_files(spark, out_f)
    assert "payload_tokens" in enc_f.columns
    from pyspark.sql import functions as F
    a = decode_dataframe(enc_f.drop("file_key", "source_file")) \
        .agg(F.expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))")).collect()
    b = toks.agg(F.expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))")).collect()
    assert a == b


def test_resume_layout_mismatch_raises(spark, tmp_path):
    """Resuming a partially-complete job with split_payload toggled must
    raise instead of writing mixed-layout chunk partitions."""
    import pytest as _pt

    from sparkcodec.manifest import run_encode_files_job
    from sparkcodec.tokens import tokens_table
    from tests.conftest import SF_DIR

    toks = tokens_table(spark, SF_DIR)
    src = str(tmp_path / "src")
    # two files so a second (pending) file exists after we fake a partial run
    toks.repartition(2).write.parquet(src)
    out = str(tmp_path / "out")
    run_encode_files_job(spark, src, out)  # completes fully
    # add a new input file -> pending work on the resumed run
    toks.limit(50).write.mode("append").parquet(src)
    with _pt.raises(ValueError, match="resume layout mismatch"):
        run_encode_files_job(spark, src, out, split_payload=True)
