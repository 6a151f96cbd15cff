"""Focused regression tests for the round-6 optimization internals:
each pins that a rewritten fast path produces EXACTLY the bytes/rows of
the shape it replaced (the round's contract is identical results)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


# ---------- RLE hybrid: vectorized emission == scalar loop ----------

def _rle_scalar_reference(values: np.ndarray, bw: int) -> bytes:
    """The pre-round scalar emission loop, kept as the oracle."""
    from sparkcodec.kernels.bitpack import pack_bits_lsb
    from sparkcodec.kernels.varint import write_uvarint

    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    out = bytearray()
    if n == 0:
        return bytes(out)
    vbytes = (bw + 7) // 8

    def emit_bitpack(lo, hi):
        count = hi - lo
        if count == 0:
            return
        groups = (count + 7) // 8
        seg = v[lo:hi]
        if count % 8:
            seg = np.concatenate([seg, np.zeros(groups * 8 - count, np.uint64)])
        write_uvarint(out, (groups << 1) | 1)
        out.extend(pack_bits_lsb(seg, bw))

    boundaries = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [n]))
    lens = ends - starts
    pend = 0
    for ri in np.flatnonzero(lens >= 8):
        s, l = int(starts[ri]), int(lens[ri])
        k = (-(s - pend)) % 8
        if l - k < 8:
            continue
        emit_bitpack(pend, s + k)
        write_uvarint(out, (l - k) << 1)
        out.extend(int(v[s]).to_bytes(vbytes, "little"))
        pend = int(ends[ri])
    emit_bitpack(pend, n)
    return bytes(out)


def test_rle_fast_path_matches_scalar_reference():
    from sparkcodec.kernels.rle import rle_hybrid_decode, rle_hybrid_encode

    rng = np.random.default_rng(7)
    for trial in range(60):
        bw = int(rng.integers(1, 9))
        vmax = (1 << bw) - 1
        parts = []
        # enough runs to engage the vectorized path (> 64), with
        # borrow-edge lengths (8..14) mixed in so the acceptance walk runs
        for _ in range(int(rng.integers(70, 160))):
            parts.append(np.full(int(rng.integers(6, 18)),
                                 int(rng.integers(0, vmax + 1)), np.int64))
            parts.append(rng.integers(0, vmax + 1,
                                      int(rng.integers(0, 10))).astype(np.int64))
        arr = np.concatenate(parts).astype(np.uint64)
        enc = rle_hybrid_encode(arr, bw)
        assert enc == _rle_scalar_reference(arr, bw)
        back = rle_hybrid_decode(enc, bw, len(arr))
        assert np.array_equal(back, arr)


def test_rle_levels_shape_roundtrip():
    from sparkcodec.kernels.rle import rle_hybrid_decode, rle_hybrid_encode

    rng = np.random.default_rng(3)
    lens = rng.integers(1, 60, 500)
    lvl = np.concatenate(
        [np.concatenate([[0], np.ones(l - 1, np.int64)]) for l in lens]
    ).astype(np.uint64)
    enc = rle_hybrid_encode(lvl, 1)
    assert enc == _rle_scalar_reference(lvl, 1)
    assert np.array_equal(rle_hybrid_decode(enc, 1, len(lvl)), lvl)


# ---------- DELTA_BINARY_PACKED: vectorized assembly ----------

def test_delta_pack_partial_blocks_and_extremes():
    from sparkcodec.kernels.delta import delta_binary_pack, delta_binary_unpack

    rng = np.random.default_rng(11)
    for arr in (
        rng.integers(0, 100, 137).astype(np.int64),          # partial block
        np.array([5], np.int64),
        np.array([2**62, -(2**62), 0, -1, 1] * 999, np.int64),
        np.cumsum(rng.integers(0, 900, 10_001)).astype(np.int64),
        np.full(4096, -7, np.int64),
    ):
        buf = delta_binary_pack(arr)
        assert np.array_equal(delta_binary_unpack(buf), arr)


def test_uvarint_scatter_matches_scalar():
    from sparkcodec.kernels.varint import (
        read_uvarint, uvarint_lengths, uvarint_scatter, write_uvarint,
    )

    rng = np.random.default_rng(2)
    vals = np.concatenate([
        rng.integers(0, 128, 50), rng.integers(0, 1 << 20, 50),
        rng.integers(0, 1 << 62, 50), [0, 127, 128, (1 << 64) - 1],
    ]).astype(np.uint64)
    nb = uvarint_lengths(vals)
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    starts = np.zeros(len(vals), dtype=np.int64)
    np.cumsum(nb[:-1], out=starts[1:])
    uvarint_scatter(vals, nb, out, starts)
    ref = bytearray()
    for x in vals:
        write_uvarint(ref, int(x))
    assert out.tobytes() == bytes(ref)
    pos = 0
    for x in vals:
        got, pos = read_uvarint(out, pos)
        assert got == int(x)


# ---------- FSST: probe skip never changes the pick ----------

def test_fsst_probe_skipped_when_dict_wins():
    from sparkcodec.chunk import decode_array, encode_array

    cats = pa.array([["a", "bb", "ccc"][i % 3] for i in range(5000)])
    blob, meta = encode_array(cats)
    assert meta["codec"] == "DICT"
    assert decode_array(blob).cast(pa.string()).to_pylist() == cats.to_pylist()


def test_fsst_match_tables_agree_with_searchsorted():
    from sparkcodec.kernels.fsst import (
        MAX_SYM_LEN, _LEN_MASKS, _match_table, _windows_u64, train,
    )

    rng = np.random.default_rng(5)
    words = [b"the ", b"quick", b"encode", b"spark", b"zz"]
    data = np.frombuffer(
        b"".join(words[int(i)] for i in rng.integers(0, len(words), 3000)),
        dtype="u1").copy()
    offsets = np.arange(0, len(data) + 1, max(len(data) // 100, 1),
                        dtype=np.int64)
    offsets[-1] = len(data)
    table = train(offsets, data)
    bc, bl = _match_table(data, table)
    # reference: pure searchsorted over every length
    win = _windows_u64(data)
    ref_code = np.full(len(data), 255, dtype=np.int16)
    ref_len = np.ones(len(data), dtype=np.int8)
    for L in range(1, MAX_SYM_LEN + 1):
        ent = table._by_len.get(L)
        if ent is None:
            continue
        keys, codes = ent
        masked = win & _LEN_MASKS[L - 1]
        idx = np.minimum(np.searchsorted(keys, masked), len(keys) - 1)
        hit = keys[idx] == masked
        ref_code[hit] = codes[idx[hit]]
        ref_len[hit] = L
    assert np.array_equal(bc, ref_code)
    assert np.array_equal(np.asarray(bl, np.int64), np.asarray(ref_len, np.int64))


# ---------- ranged splits ----------

def test_ranged_split_reader_covers_exact_rows(tmp_path):
    import pyarrow.parquet as pq

    from sparkcodec.engine import _plan_parquet_splits

    n = 40_000
    tbl = pa.table({"i": np.arange(n, dtype=np.int64),
                    "v": np.arange(n, dtype=np.int64) * 3})
    p = str(tmp_path / "one_rg.parquet")
    pq.write_table(tbl, p, row_group_size=n)  # ONE row group
    splits = _plan_parquet_splits(p, 8)
    assert len(splits) > 1, "oversized row group should range-split"
    assert all(s["row_groups"] == [0] for s in splits)
    covered = []
    for s in splits:
        lo = s["skip_rows"]
        covered.append((lo, lo + s["take_rows"]))
    covered.sort()
    assert covered[0][0] == 0 and covered[-1][1] == n
    for (a, b), (c, d) in zip(covered, covered[1:]):
        assert b == c, "ranges must tile without gap or overlap"
    # pieces respect the row floor
    assert all(hi - lo >= 16384 for lo, hi in covered)


def test_plan_splits_no_ranges_when_disallowed(tmp_path):
    import pyarrow.parquet as pq

    from sparkcodec.engine import _plan_parquet_splits

    tbl = pa.table({"i": np.arange(100_000, dtype=np.int64)})
    p = str(tmp_path / "one_rg.parquet")
    pq.write_table(tbl, p, row_group_size=100_000)
    splits = _plan_parquet_splits(p, 8, allow_ranges=False)
    assert len(splits) == 1
    assert "skip_rows" not in splits[0]


def test_task_slices_adaptive():
    from sparkcodec.engine import _MIN_SPLIT_BYTES, _task_slices

    tiny = [{"n_bytes": 1 << 20} for _ in range(64)]   # 64 MB total
    assert _task_slices(tiny, 8) == 8                  # parallelism floor
    assert _task_slices(tiny, None) == 64              # pinned n_splits
    big = [{"n_bytes": _MIN_SPLIT_BYTES} for _ in range(64)]
    assert _task_slices(big, 8) == 64                  # enough bytes: 1/task
    assert _task_slices(big[:4], 8) == 4               # never exceeds splits


# ---------- zero-copy cells ----------

def test_binary_cells_zero_copy_and_nulls():
    from sparkcodec.engine import _binary_cells

    arr = pa.array([b"abc", None, b"", b"xyzw"], type=pa.binary())
    cells = _binary_cells(arr)
    assert bytes(cells[0]) == b"abc"
    assert cells[1] is None
    assert bytes(cells[2]) == b""
    assert bytes(cells[3]) == b"xyzw"
    assert isinstance(cells[0], memoryview)
    # sliced arrays keep correct offsets
    s = arr.slice(2)
    cells = _binary_cells(s)
    assert bytes(cells[0]) == b"" and bytes(cells[1]) == b"xyzw"


# ---------- RANK decode dtype fusion ----------

def test_rank_decode_int32_exact():
    from sparkcodec.chunk import decode_array, encode_array
    from sparkcodec.selector import RANK

    rng = np.random.default_rng(9)
    u = rng.random(300_000)
    toks = ((np.minimum(u ** (-1 / 0.2), 1e9).astype(np.int64) * 2654435761)
            % 50021).astype(np.int32)
    blob, meta = encode_array(pa.array(toks), codec=RANK)
    back = decode_array(blob)
    assert back.type == pa.int32()
    assert np.array_equal(back.to_numpy(), toks)
