"""Chunk encode/decode round-trips over the FIXTURES.md F2 codec-probe
shapes, plus stats semantics (NaN skip, signed zero, 16-byte truncation)
mirroring the reference's statistics tests
(reference: test/write.buffer.test.js:225-255, write.statistics.test.js)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sparkcodec import selector as S
from sparkcodec.chunk import decode_array, encode_array
from sparkcodec.stats import truncate_max, truncate_min

RNG = np.random.default_rng(42)
N = 100_000


def roundtrip(values, codec=None):
    buf, meta = encode_array(values, codec=codec)
    out = decode_array(buf)
    return out, buf, meta


def assert_equal_arrays(out: pa.Array, expected: pa.Array):
    assert out.equals(expected) or out.cast(expected.type).equals(expected), (
        out.slice(0, 10), expected.slice(0, 10))


# ---------- F2 codec-probe columns ----------

def test_const_int_picks_rle():
    v = pa.array(np.full(N, 7, dtype=np.int32))
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert meta["codec"] in ("RLE", "DICT")
    assert len(buf) < 100


def test_low_card_str_dictionary_size_pin():
    # reference pin: 100k rows / 2 distinct strings -> 170-byte parquet file.
    # Our chunk has no thrift footer; assert the same order of magnitude.
    v = pa.array(["aaaa"] * 50000 + ["bbbb"] * 50000)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert meta["codec"] in ("DICT", "RLE")
    assert len(buf) <= 170


def test_low_card_int_dictionary():
    vals = RNG.zipf(1.5, N).astype(np.int64) % 16
    v = pa.array(vals.astype(np.int32))
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert len(buf) < N  # <1 byte/value

def test_high_card_int_full_range():
    vals = RNG.integers(-(2**31), 2**31, N, dtype=np.int64).astype(np.int32)
    vals[:4] = [2**31 - 1, -(2**31), 2**31 - 1, 0]  # 33-bit adjusted deltas
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)


def test_monotonic_int_delta():
    vals = (np.arange(N, dtype=np.int64) * 3 + RNG.integers(0, 3, N)).astype(np.int32)
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert meta["codec"] in ("DELTA_BP", "DELTA_FOR")
    assert len(buf) <= N // 2 + 64  # 4 bits/value (zigzag deltas span [2,10])


def test_small_range_int_bitpack_width6():
    vals = RNG.integers(1000, 1063, N).astype(np.int32)
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert len(buf) <= N * 6 // 8 + 64


def test_sparse_bool_nulls():
    vals = [None] * 10000
    for i, b in zip((17, 401, 5000, 9998), (True, False, True, True)):
        vals[i] = b
    v = pa.array(vals, type=pa.bool_())
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert meta["null_count"] == 9996
    assert len(buf) < 200  # RLE levels + values (ref pin: 168-byte file)


def test_prefix_str():
    vals = [f"https://example.com/shared/prefix/{i % 100:04d}/{i:08d}" for i in range(20000)]
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    avg = len(buf) / len(vals)
    assert avg < 30  # beats raw (~47 B/value)


def test_rand_str_distinct():
    import string

    alpha = np.array(list(string.ascii_letters + string.digits))
    lens = RNG.integers(8, 25, 5000)
    vals = ["".join(alpha[RNG.integers(0, len(alpha), l)]) for l in lens]
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)


def test_floats_special_values():
    vals = RNG.normal(size=N)
    vals[:6] = [np.nan, 0.0, -0.0, np.inf, -np.inf, 1.5]
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    got = out.to_numpy(zero_copy_only=False)
    np.testing.assert_array_equal(got, vals)  # NaN == NaN under array_equal
    # signed zero: -0.0 decodes with its sign bit intact
    assert np.signbit(got[2]) and not np.signbit(got[1])
    # NaN skipped in stats; min is -inf, max +inf
    assert meta["min"] == -np.inf and meta["max"] == np.inf


def test_nullable_int_every_third():
    vals = [None if i % 3 == 0 else i * 11 for i in range(30000)]
    v = pa.array(vals, type=pa.int32())
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert meta["null_count"] == 10000


def test_long_str_truncation():
    vals = ["x" * 56 + f"{i:06d}" for i in range(1000)]
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert len(meta["min"]) == 16 and not meta["is_min_exact"]
    assert meta["max"] == "x" * 15 + "y"  # prefix rounded up
    assert not meta["is_max_exact"]


def test_all_null_column():
    v = pa.array([None] * 100, type=pa.int64())
    out, buf, meta = roundtrip(v)
    assert out.null_count == 100 and len(out) == 100


def test_empty_column():
    v = pa.array([], type=pa.int32())
    out, buf, meta = roundtrip(v)
    assert len(out) == 0


# ---------- every codec explicitly, round-trip ----------

@pytest.mark.parametrize("codec", [S.PLAIN, S.RLE, S.DICT, S.DELTA_BP, S.FOR, S.DELTA_FOR])
def test_explicit_codecs_int(codec):
    vals = RNG.integers(0, 1000, 5000).astype(np.int32)
    v = pa.array(vals)
    out, buf, meta = roundtrip(v, codec=codec)
    assert_equal_arrays(out, v)
    assert meta["codec"] == S.CODEC_NAMES[codec]


@pytest.mark.parametrize("codec", [S.PLAIN, S.DICT, S.DELTA_LENGTH, S.DELTA_BA])
def test_explicit_codecs_str(codec):
    vals = [f"val-{i % 50}" for i in range(5000)]
    v = pa.array(vals)
    out, buf, meta = roundtrip(v, codec=codec)
    assert_equal_arrays(out, v)


@pytest.mark.parametrize("codec", [S.PLAIN, S.BSS, S.DICT, S.RLE])
def test_explicit_codecs_float(codec):
    vals = np.round(RNG.normal(size=5000), 2)
    v = pa.array(vals)
    out, buf, meta = roundtrip(v, codec=codec)
    assert_equal_arrays(out, v)


@pytest.mark.parametrize("codec", [S.PLAIN, S.RLE])
def test_explicit_codecs_bool(codec):
    vals = RNG.integers(0, 2, 5001).astype(bool)
    v = pa.array(vals)
    out, buf, meta = roundtrip(v, codec=codec)
    assert_equal_arrays(out, v)


def test_binary_type_roundtrip():
    vals = [bytes([i % 256, 255 - i % 256]) * (i % 5) for i in range(3000)]
    v = pa.array(vals, type=pa.large_binary())
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)
    assert meta["type"] == "binary"


def test_int64_roundtrip():
    vals = RNG.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)


def test_float32_roundtrip():
    vals = RNG.normal(size=5000).astype(np.float32)
    v = pa.array(vals)
    out, buf, meta = roundtrip(v)
    assert_equal_arrays(out, v)


# ---------- truncation unit rules ----------

def test_truncate_rules():
    assert truncate_min(b"short") == (b"short", True)
    assert truncate_min(b"x" * 20) == (b"x" * 16, False)
    assert truncate_max(b"x" * 20) == (b"x" * 15 + b"y", False)
    assert truncate_max(b"\xff" * 20) == (None, False)
    assert truncate_max(b"a" + b"\xff" * 19) == (b"b", False)
    assert truncate_max(b"\xff" * 16) == (b"\xff" * 16, True)  # fits: no truncation


# ---------- selector determinism ----------

def test_selector_is_deterministic():
    vals = RNG.integers(0, 100, 5000).astype(np.int32)
    v = pa.array(vals)
    metas = {encode_array(v)[1]["codec"] for _ in range(3)}
    assert len(metas) == 1


def test_compressed_at_most_pyarrow_parquet():
    """FIXTURES F4(c): chunk bytes <= pyarrow parquet of the same column."""
    import io

    import pyarrow.parquet as pq

    cases = {
        "const": pa.array(np.full(N, 7, dtype=np.int32)),
        "low_card_str": pa.array(["aaaa", "bbbb"] * (N // 2)),
        "monotonic": pa.array(np.arange(N, dtype=np.int32) * 3),
        "small_range": pa.array(RNG.integers(1000, 1063, N).astype(np.int32)),
        "zipf_tokens": pa.array((RNG.zipf(1.2, N) % 50257).astype(np.int32)),
    }
    for name, arr in cases.items():
        buf, meta = encode_array(arr)
        sink = io.BytesIO()
        pq.write_table(pa.table({"c": arr}), sink, compression="snappy", use_dictionary=True)
        ref = sink.getbuffer().nbytes
        assert len(buf) <= ref, (name, len(buf), ref, meta["codec"])


def test_decimal_roundtrip():
    import decimal

    vals = [decimal.Decimal(f"{i}.{i % 100:02d}") * (1 if i % 2 else -1)
            for i in range(3000)] + [None]
    v = pa.array(vals, type=pa.decimal128(18, 2))
    out, buf, meta = roundtrip(v)
    assert out.cast(v.type).to_pylist() == v.to_pylist()


def test_wide_decimal_roundtrip():
    """precision 19-38 lowers to 16-byte two's-complement byte arrays
    (reference FLBA lowering: src/unconvert.js:279-307) with real decimal
    min/max in the chunk stats."""
    import decimal

    vals = [decimal.Decimal("12345678901234567890.12"), None,
            decimal.Decimal("-98765432109876543210.99"),
            decimal.Decimal("0.01")] * 500
    v = pa.array(vals, type=pa.decimal128(38, 2))
    out, buf, meta = roundtrip(v)
    assert out.to_pylist() == v.to_pylist()
    assert meta["type"] == "decimal_wide"
    assert meta["min"] == decimal.Decimal("-98765432109876543210.99")
    assert meta["max"] == decimal.Decimal("12345678901234567890.12")


def test_pluggable_compressor():
    """Reference Compressors-map parity: register a custom codec and
    round-trip through it."""
    import bz2

    from sparkcodec.chunk import register_compressor

    register_compressor(7, "bz2", lambda d: bz2.compress(d, 1), bz2.decompress)
    v = pa.array(["repetitive text block " * 4] * 20000)
    buf, meta = encode_array(v, compress="bz2")
    out = decode_array(buf)
    assert_equal_arrays(out, v)
    buf_raw, _ = encode_array(v, compress=False)
    assert len(buf) < len(buf_raw)


def test_compress_false_stores_raw():
    v = pa.array(np.arange(50000, dtype=np.int64) % 977)
    b1, m1 = encode_array(v, compress=False)
    out = decode_array(b1)
    assert_equal_arrays(out, v)


def test_stats_false_skips_minmax():
    v = pa.array(np.arange(1000, dtype=np.int64))
    buf, meta = encode_array(v, stats=False)
    assert meta["min"] is None and meta["max"] is None
    assert_equal_arrays(decode_array(buf), v)


def test_rank_codec_roundtrip_and_wins_on_zipf():
    """RANK (frequency-ranked dict + plane split) realizes the reference's
    dictionary frequency-sort TODO (src/dictionary.js:133)."""
    from sparkcodec.datagen import gen_rows

    # at the engine's default chunk scale (~4M tokens) RANK beats FOR+zlib
    # on the F1 token shape AND encodes ~2x faster (no multi-MB zlib pass)
    v = gen_rows(np.arange(8000), seed=42).column("tokens").flatten()
    out, buf, meta = roundtrip(v, codec=S.CODEC_IDS["RANK"])
    assert_equal_arrays(out, v)
    for_buf, _ = encode_array(v, codec=S.FOR)
    assert len(buf) < len(for_buf)


def test_rank_codec_negatives_and_fallback():
    v = pa.array(RNG.integers(-5000, 5000, 20000).astype(np.int32))
    out, buf, meta = roundtrip(v, codec=S.CODEC_IDS["RANK"])
    assert_equal_arrays(out, v)
    # span too wide -> silent FOR fallback
    wide = pa.array(RNG.integers(-(2**31), 2**31, 5000).astype(np.int32))
    out, buf, meta = roundtrip(wide, codec=S.CODEC_IDS["RANK"])
    assert_equal_arrays(out, wide)
    assert meta["codec"] == "FOR"


def test_rank_selected_for_skewed_tokens():
    vals = ((RNG.zipf(1.2, 200_000) % 50257) * 2654435761 % 50257).astype(np.int32)
    buf, meta = encode_array(pa.array(vals))
    assert meta["codec"] in ("RANK", "FOR")  # RANK when skew probe fires


def test_float16_and_fixed_binary():
    """§1.2 BasicType parity: FLOAT16 (half bit patterns) and UUID-style
    FIXED_LEN_BYTE_ARRAY."""
    import uuid

    h = pa.array(np.arange(4000, dtype=np.float16) / 7, type=pa.float16())
    out, buf, meta = roundtrip(h)
    assert np.array_equal(out.to_numpy(zero_copy_only=False).view("<u2"),
                          h.to_numpy(zero_copy_only=False).view("<u2"))
    hn = pa.array([None if i % 5 == 0 else np.float16(i / 3) for i in range(500)],
                  type=pa.float16())
    out, _, _ = roundtrip(hn)
    assert out.to_pylist() == hn.to_pylist()

    vals = [uuid.UUID(int=i * 2654435761 % (1 << 128)).bytes for i in range(2000)]
    u = pa.array(vals, type=pa.binary(16))
    out, buf, meta = roundtrip(u)
    assert out.equals(u) and out.type == pa.binary(16)
    un = pa.array([vals[0], None, vals[2]], type=pa.binary(16))
    out, _, _ = roundtrip(un)
    assert out.to_pylist() == un.to_pylist()


def test_rank_overflow_span_falls_back():
    """ADVICE r1: a chunk whose int64 span overflows must not reach
    np.bincount via a wrapped negative -- RANK returns None and the
    encoder falls back (round-trip stays exact)."""
    import numpy as np

    # narrow/skewed head (selector sample) + extreme outliers in the tail
    vals = np.concatenate([
        np.full(2000, 1000, dtype=np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max], dtype=np.int64),
    ])
    blob, meta = encode_array(vals)
    assert meta["codec"] != "RANK"
    out = decode_array(blob)
    assert out.to_pylist() == vals.tolist()

    # forcing RANK on the same data must also fall back, not crash
    from sparkcodec import selector as S

    blob2, meta2 = encode_array(vals, codec=S.RANK)
    assert meta2["codec"] == "FOR"
    assert decode_array(blob2).to_pylist() == vals.tolist()


def test_zstd_default_compressor_roundtrip():
    """The post-codec stage defaults to pyarrow-native zstd; highly
    compressible payloads must round-trip through it exactly."""
    import numpy as np

    from sparkcodec.chunk import COMP_ZSTD, _COMPRESSORS

    assert COMP_ZSTD in _COMPRESSORS  # pyarrow ships zstd in this env
    vals = np.repeat(np.arange(50, dtype=np.int64), 2000)  # runs: compresses
    blob, meta = encode_array(vals, compress=True)
    assert decode_array(blob).to_pylist() == vals.tolist()
    blob_raw, _ = encode_array(vals, compress=False)
    assert decode_array(blob_raw).to_pylist() == vals.tolist()


def test_selector_compression_aware():
    """The cost model sees the post-codec compressor: highly-compressible
    wide values (text-like bytes in int64) should not be forced into a
    bit-packed codec when PLAIN+zstd is smaller; and the pick stays
    deterministic (pure function of the sample prefix)."""
    import numpy as np

    from sparkcodec import selector as S
    from sparkcodec.chunk import _sample_comp_ratio

    rng = np.random.default_rng(7)
    # compressible: repeated structure, wide span (FOR needs ~40 bits)
    base = rng.integers(0, 1 << 40, 50, dtype=np.int64)
    vals = np.tile(base, 200)  # runs of structure zstd crushes
    ratio = _sample_comp_ratio(vals[:1000].tobytes(), True)
    assert ratio < 0.6
    costs = S.estimate_costs_numeric(S.sample_numeric(vals), "i",
                                     n_total=len(vals), comp_ratio=ratio)
    assert costs[S.PLAIN] < 8.0  # the model credits the compressor
    blob, meta = encode_array(vals)
    assert decode_array(blob).to_pylist() == vals.tolist()
    blob2, meta2 = encode_array(vals)
    assert meta2["codec"] == meta["codec"]  # deterministic


def test_selector_regret_bounded_across_shapes():
    """Auto-selection must stay within 1.35x of the best candidate codec's
    actual encoded size on every representative shape -- the cost model is
    an estimate, but large regret is a regression."""
    import numpy as np

    from sparkcodec import selector as S

    rng = np.random.default_rng(11)
    n = 60_000
    shapes = {
        "zipf_tokens": (rng.zipf(1.3, n) % 50257).astype(np.int32),
        "sorted_ids": np.sort(rng.integers(0, 10**12, n)),
        "low_card": rng.integers(0, 40, n).astype(np.int64),
        "runs": np.repeat(rng.integers(0, 1000, n // 200), 200),
        "uniform_wide": rng.integers(-(10**15), 10**15, n),
        "skewed_small_span": np.minimum(rng.zipf(1.1, n), 1 << 20).astype(np.int64),
    }
    candidates = [S.PLAIN, S.FOR, S.DELTA_FOR, S.DELTA_BP, S.RLE, S.DICT, S.RANK]
    for name, vals in shapes.items():
        auto_blob, auto_meta = encode_array(vals)
        best = min(
            (len(encode_array(vals, codec=c)[0]) for c in candidates
             if _codec_applies(vals, c)),
        )
        regret = len(auto_blob) / best
        assert regret <= 1.35, (name, auto_meta["codec"], regret)


def _codec_applies(vals, codec):
    try:
        blob, _ = encode_array(vals, codec=codec)
        return decode_array(blob).to_pylist() == vals.tolist()
    except Exception:
        return False


def test_sliced_arrays_roundtrip_every_type():
    """Non-zero-offset (sliced) Arrow arrays must encode from their window
    only -- offset handling is a classic codec bug source."""
    import decimal

    import numpy as np
    import pyarrow as pa

    cases = [
        pa.array(list(range(100)) + [None] * 5 + list(range(100, 200)),
                 pa.int64()).slice(50, 100),
        pa.array([f"s{i}" for i in range(100)] + [None, "x"] * 5,
                 pa.string()).slice(30, 60),
        pa.array([b"\x00ab", None, b"c\x00d"] * 50, pa.binary()).slice(7, 100),
        pa.array(np.r_[np.nan, -0.0, 0.0, np.inf, -np.inf,
                       np.linspace(-5, 5, 200)]).slice(1, 150),
        pa.array(([True] * 30 + [None, False] * 10) * 5).slice(13, 80),
        pa.array([decimal.Decimal("1.23"), None] * 60,
                 pa.decimal128(9, 2)).slice(5, 70),
        pa.array([b"0123456789abcdef", None] * 40, pa.binary(16)).slice(3, 50),
        pa.array(np.arange(100, dtype=np.float16), pa.float16()).slice(11, 60),
    ]
    for arr in cases:
        blob, _ = encode_array(arr)
        assert decode_array(blob).to_pylist() == arr.to_pylist(), arr.type


def test_sliced_nested_chunk_group_roundtrip():
    import pyarrow as pa

    from sparkcodec.engine import decode_chunk_group, encode_chunk_group

    tok = pa.array([[1, 2], [3], None, [4, 5, 6]] * 30, pa.list_(pa.int32()))
    mp = pa.array([[("a", 1)], None, [("b", 2), ("c", 3)], []] * 30,
                  pa.map_(pa.string(), pa.int32()))
    st = pa.array([{"x": 1}, None, {"x": None}] * 40,
                  pa.struct([("x", pa.int32())]))
    t = pa.table({"l": tok, "m": mp, "s": st}).slice(17, 80)
    blob, _, pairs, _ = encode_chunk_group(t)
    back = decode_chunk_group(blob, pairs)
    for i, c in enumerate(back.schema.names):
        assert back.column(i).to_pylist() == t.column(c).to_pylist(), c


def test_bool_run_heavy_selector_never_crashes():
    """Run-heavy booleans: the generic numeric cost model offers DICT, but
    booleans only have PLAIN/RLE encoders -- the selector must stay within
    them (code-review r3 finding: ValueError 'codec 2 not valid')."""
    b = pa.array(np.repeat([True, False] * 50, 16))
    buf, meta = encode_array(b)
    assert meta["codec"] in ("PLAIN", "RLE")
    assert decode_array(buf).to_pylist() == b.to_pylist()


def test_timestamp_ms_and_s_rescale_to_tag_unit():
    """timestamp[ms]/[s] columns share the timestamp_us tag: values must be
    normalized to microseconds on encode, or decode returns instants 1000x
    too early (code-review r3 finding: 2023 decoded as 1970)."""
    from sparkcodec.engine import decode_chunk_group, encode_chunk_group

    t = pa.table({
        "ms": pa.array([1699999999123, None, 5], type=pa.timestamp("ms")),
        "s": pa.array([1699999999, None, 5], type=pa.timestamp("s")),
        "tz": pa.array([77, None, 5], type=pa.timestamp("us", tz="UTC")),
    })
    blob, _, pairs, _ = encode_chunk_group(t)
    back = pa.Table.from_batches([decode_chunk_group(blob, pairs, None)])
    for c in t.column_names:
        assert back.column(c).combine_chunks().equals(
            t.column(c).combine_chunks()), c


def test_decimal_and_float16_meta_stats_are_value_ordered():
    """Meta min/max must carry the ORIGINAL values: unscaled ints /
    float16 bit patterns order differently (code-review r3 findings)."""
    import decimal

    d = pa.array([decimal.Decimal("-0.50"), decimal.Decimal("-0.25")],
                 type=pa.decimal128(10, 2))
    _, m = encode_array(d)
    assert m["min"] == decimal.Decimal("-0.50")
    assert m["max"] == decimal.Decimal("-0.25")
    f16 = pa.array(np.array([-2.0, 1.0, np.nan], dtype=np.float16))
    _, m2 = encode_array(f16)
    assert float(m2["min"]) == -2.0 and float(m2["max"]) == 1.0


def test_stats_edge_semantics_review_fixes():
    """Chunk-stat edges from the codec-core review: all-NaN float16
    publishes NO bounds (was the 32256 bit pattern flagged exact); float16
    signed zeros normalize per the parquet rule; a 16-byte truncation
    splitting a multi-byte UTF-8 char yields STRING bounds that still
    bracket the values (was a hex digest that compares wrongly); binary
    non-UTF-8 stats stay hex."""
    import math

    import numpy as np
    import pyarrow as pa

    from sparkcodec.chunk import encode_array

    _, m = encode_array(pa.array(np.array([np.nan, np.nan], np.float16)))
    assert m["min"] is None and m["max"] is None
    _, m2 = encode_array(pa.array(np.array([-0.0, 0.0], np.float16)))
    assert math.copysign(1, m2["min"]) == -1 and math.copysign(1, m2["max"]) == 1
    vals = ["a" * 15 + "ézzz", "a" * 15 + "äqqq"]
    _, m3 = encode_array(pa.array(vals))
    assert m3["min"] <= min(vals) and m3["max"] >= max(vals)
    assert not m3["is_min_exact"] and not m3["is_max_exact"]
    _, m4 = encode_array(pa.array([b"\xff\xfe" * 10]))
    assert m4["min"] == ("fffe" * 8)  # truncated to 16 bytes, hex


def test_uint64_meta_stats_true_unsigned_bounds():
    """uint64 columns encode their int64 bit pattern, but meta stats must
    publish the TRUE unsigned bounds (bit-pattern order is wrong above
    2^63 and silently broke JSON-stats range pruning)."""
    import numpy as np
    import pyarrow as pa

    from sparkcodec.engine import _encode_any_column

    col = pa.array(np.array([1, 2, 2**64 - 1], dtype=np.uint64))
    _, meta = _encode_any_column(col, True)
    assert meta["min"] == 1 and meta["max"] == 2**64 - 1


def test_meta_repr_carry_and_adjusted_flags():
    """Review wave 5: an un-bumpable truncated max carries into the
    previous character (or publishes None); any repr adjustment clears
    the exactness flags."""
    import pyarrow as pa

    from sparkcodec.chunk import encode_array

    _, m = encode_array(pa.array(["a" * 5, "a" * 11 + "\U0010FFFF\x7fzz"]))
    true_max = "a" * 11 + "\U0010FFFF\x7fzz"
    assert m["max"] is None or m["max"] >= true_max
    assert not m["is_max_exact"]
    # untruncated binary with a non-UTF-8 tail: repr adjusts, flags clear
    _, m2 = encode_array(pa.array([b"abc\xff"]))
    assert m2["min"] <= "abc\x7f" and m2["max"] >= "abd"
    assert not m2["is_min_exact"] and not m2["is_max_exact"]
