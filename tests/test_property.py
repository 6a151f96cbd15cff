"""Property-based round-trip invariants over the codec kernels and the
chunk layer (hypothesis), mirroring the reference's randomized round-trips
(reference: test/encoding.test.js:51-57, test/delta.test.js:181)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcodec.chunk import decode_array, encode_array
from sparkcodec.kernels import (
    delta_binary_pack,
    delta_binary_unpack,
    delta_for_pack,
    delta_for_unpack,
    for_pack,
    for_unpack,
    rle_hybrid_decode,
    rle_hybrid_encode,
)
from sparkcodec.kernels.bitpack import bit_widths

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(I64, max_size=300))
def test_delta_binary_roundtrip_any_int64(vals):
    arr = np.array(vals, dtype=np.int64)
    np.testing.assert_array_equal(delta_binary_unpack(delta_binary_pack(arr)), arr)


@settings(max_examples=60, deadline=None)
@given(st.lists(I64, max_size=300))
def test_for_roundtrip_any_int64(vals):
    arr = np.array(vals, dtype=np.int64)
    np.testing.assert_array_equal(for_unpack(for_pack(arr)), arr)
    np.testing.assert_array_equal(delta_for_unpack(delta_for_pack(arr)), arr)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**20 - 1), max_size=400),
       st.integers(min_value=20, max_value=64))
def test_rle_hybrid_roundtrip_any(vals, bw):
    arr = np.array(vals, dtype=np.uint64)
    out = rle_hybrid_decode(rle_hybrid_encode(arr, bw), bw, len(arr))
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)), max_size=200))
def test_chunk_nullable_int_any(vals):
    v = pa.array(vals, type=pa.int32())
    buf, meta = encode_array(v)
    out = decode_array(buf)
    assert out.cast(pa.int32()).to_pylist() == vals


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=150))
def test_chunk_nullable_string_any(vals):
    v = pa.array(vals, type=pa.string())
    buf, meta = encode_array(v)
    out = decode_array(buf)
    assert out.cast(pa.string()).to_pylist() == vals


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=60)), max_size=120))
def test_chunk_nullable_binary_any(vals):
    v = pa.array(vals, type=pa.large_binary())
    buf, meta = encode_array(v)
    out = decode_array(buf)
    assert out.cast(pa.large_binary()).to_pylist() == vals


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=200))
def test_chunk_float_bitexact_any(vals):
    v = pa.array(vals, type=pa.float64())
    buf, meta = encode_array(v)
    out = decode_array(buf).to_numpy(zero_copy_only=False)
    src = np.array(vals, dtype=np.float64)
    # bit-exact incl. NaN payloads and signed zeros
    np.testing.assert_array_equal(out.view(np.int64), src.view(np.int64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=64))
def test_bit_widths_matches_python(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(bit_widths(arr), [v.bit_length() for v in vals])
