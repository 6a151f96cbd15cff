"""SBBF bloom filter + vectorized xxhash64, validated against public
xxHash test vectors and Spark's builtin xxhash64 as an independent
implementation oracle."""

from __future__ import annotations

import numpy as np
import pytest

from sparkcodec.kernels.bloom import (
    SplitBlockBloom,
    build_bloom,
    optimal_bytes,
    xxhash64_int64,
    xxhash64_matrix,
)

RNG = np.random.default_rng(42)


def _xxh(data: bytes, seed: int = 0) -> int:
    mat = np.zeros((1, max(len(data), 1)), dtype="u1")
    if data:
        mat[0, : len(data)] = np.frombuffer(data, dtype="u1")
    return int(xxhash64_matrix(mat, np.array([len(data)]), seed)[0])


def test_xxhash64_known_vectors():
    # public xxHash spec vectors (seed 0)
    assert _xxh(b"") == 0xEF46DB3751D8E999
    assert _xxh(b"abc") == 0x44BC2CF5AD770999


def test_xxhash64_vs_spark_oracle(spark):
    """Spark's xxhash64 (seed 42) over binary == our kernel (seed 42)."""
    vals = [RNG.integers(0, 256, int(n)).astype("u1").tobytes()
            for n in np.concatenate([RNG.integers(0, 8, 20), RNG.integers(8, 32, 20),
                                     RNG.integers(32, 200, 30), [0, 1, 4, 7, 8, 16, 31, 32, 33, 64]])]
    df = spark.createDataFrame([(bytearray(v),) for v in vals], "b binary")
    got_spark = [r[0] for r in df.selectExpr("xxhash64(b)").collect()]
    width = max(max(len(v) for v in vals), 1)
    mat = np.zeros((len(vals), width), dtype="u1")
    lens = np.zeros(len(vals), dtype=np.int64)
    for i, v in enumerate(vals):
        mat[i, : len(v)] = np.frombuffer(v, dtype="u1")
        lens[i] = len(v)
    ours = xxhash64_matrix(mat, lens, seed=42).view(np.int64)
    assert list(ours) == got_spark


def test_bloom_no_false_negatives():
    vals = RNG.integers(-(2**40), 2**40, 20000)
    h = xxhash64_int64(vals)
    f = build_bloom(h)
    assert f is not None
    assert f.might_contain(h).all()


def test_bloom_false_positive_rate():
    vals = np.arange(10000, dtype=np.int64)
    f = build_bloom(xxhash64_int64(vals), fpp=0.01)
    probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fp = f.might_contain(xxhash64_int64(probe)).mean()
    assert fp < 0.03, fp


def test_bloom_sizing_rules():
    assert optimal_bytes(0) == 32
    # power-of-2 snap below 1024 bytes (parquet-mr compatible)
    for ndv in (10, 100, 500):
        b = optimal_bytes(ndv)
        assert b < 2048 and (b & (b - 1)) == 0 or b % 32 == 0
    assert optimal_bytes(100) in (128, 256, 512, 1024)
    # abort beyond max_bytes
    assert build_bloom(xxhash64_int64(np.arange(500000)), max_bytes=1024) is None


def test_bloom_serialization_roundtrip():
    vals = RNG.integers(0, 10**6, 5000)
    h = xxhash64_int64(vals)
    f = build_bloom(h)
    g = SplitBlockBloom.from_bytes(f.to_bytes())
    assert g.might_contain(h).all()
    assert g.to_bytes() == f.to_bytes()
