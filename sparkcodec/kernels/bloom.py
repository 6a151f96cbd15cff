"""Split-block bloom filter (SBBF) with vectorized xxhash64.

Parquet-compatible semantics mirroring the reference (reference:
src/bloom.js:14-213): 32-byte blocks, 8 salted bits per value derived from
the xxhash64 (seed 0) of the PLAIN-encoded value; exact-NDV sizing
``m = -8 * ndv / ln(1 - fpp^(1/8))`` rounded to blocks with a power-of-2
snap below 1024 bytes (parquet-mr compatible); builder collects distinct
hashes first and aborts beyond ``max_bytes``.

xxhash64 is implemented directly from the public xxHash specification
(Yann Collet, BSD) as a vectorized numpy kernel over fixed-stride byte
matrices -- no per-value Python.
"""

from __future__ import annotations

import math

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)

SALT = np.array([0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
                 0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5EC10E4E], dtype=np.uint32)

BLOCK_BYTES = 32
BITS_PER_BLOCK = 256


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    with np.errstate(over="ignore"):
        return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        acc = acc + lane * _P2
        acc = _rotl(acc, 31)
        return acc * _P1


def xxhash64_matrix(data: np.ndarray, lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    """xxhash64 of n byte strings given as a padded (n, max_len) uint8
    matrix with true lengths; vectorized across all n values.

    All values in one call must share the same padded width; bytes beyond
    ``lengths`` are ignored by masking per the spec's tail handling.
    Implemented for max_len <= 32 fast paths via python-level loops over
    BYTE POSITIONS (bounded by max_len), never over values.
    """
    n, width = data.shape
    seed64 = np.uint64(seed)
    lengths = lengths.astype(np.int64)
    h = np.empty(n, dtype=np.uint64)

    with np.errstate(over="ignore"):
        # values >= 32 bytes: accumulator lanes over 32-byte stripes
        long_mask = lengths >= 32
        if long_mask.any():
            li = np.flatnonzero(long_mask)
            acc1 = np.full(len(li), seed64 + _P1 + _P2, dtype=np.uint64)
            acc2 = np.full(len(li), seed64 + _P2, dtype=np.uint64)
            acc3 = np.full(len(li), seed64, dtype=np.uint64)
            acc4 = np.full(len(li), seed64 - _P1, dtype=np.uint64)
            sub = data[li]
            sub_len = lengths[li]
            max_stripes = int(sub_len.max()) // 32
            done = np.zeros(len(li), dtype=np.uint64)
            consumed = np.zeros(len(li), dtype=np.int64)
            for s in range(max_stripes):
                active = (sub_len - consumed) >= 32
                if not active.any():
                    break
                base = s * 32
                lanes = sub[:, base : base + 32].copy().view("<u8")
                a1 = _round(acc1, lanes[:, 0])
                a2 = _round(acc2, lanes[:, 1])
                a3 = _round(acc3, lanes[:, 2])
                a4 = _round(acc4, lanes[:, 3])
                acc1 = np.where(active, a1, acc1)
                acc2 = np.where(active, a2, acc2)
                acc3 = np.where(active, a3, acc3)
                acc4 = np.where(active, a4, acc4)
                consumed = np.where(active, consumed + 32, consumed)
            hl = (_rotl(acc1, 1) + _rotl(acc2, 7) + _rotl(acc3, 12) + _rotl(acc4, 18))
            for acc in (acc1, acc2, acc3, acc4):
                hl = (hl ^ _round(np.zeros_like(acc), acc)) * _P1 + _P4
            h_long = hl
        # short values: h = seed + P5
        h_all = np.full(n, seed64 + _P5, dtype=np.uint64)
        if long_mask.any():
            h_all[long_mask] = h_long
        consumed_all = np.where(long_mask, (lengths // 32) * 32, 0)
        h_cur = h_all + lengths.astype(np.uint64)

        # tail: 8-byte chunks
        remaining = lengths - consumed_all
        pos = consumed_all.copy()
        max_rem = int(remaining.max(initial=0))
        for _ in range(max_rem // 8 + 1):
            active = (lengths - pos) >= 8
            if not active.any():
                break
            lane = np.zeros(n, dtype=np.uint64)
            ai = np.flatnonzero(active)
            gather = pos[ai, None] + np.arange(8)
            lane_bytes = data[ai[:, None], gather].astype(np.uint64)
            lane[ai] = (lane_bytes << (np.arange(8, dtype=np.uint64) * np.uint64(8))).sum(
                axis=1, dtype=np.uint64)
            k1 = _round(np.zeros(n, dtype=np.uint64), lane)
            h_new = _rotl(h_cur ^ k1, 27) * _P1 + _P4
            h_cur = np.where(active, h_new, h_cur)
            pos = np.where(active, pos + 8, pos)
        # 4-byte chunk
        active = (lengths - pos) >= 4
        if active.any():
            ai = np.flatnonzero(active)
            gather = pos[ai, None] + np.arange(4)
            lane4 = (data[ai[:, None], gather].astype(np.uint64)
                     << (np.arange(4, dtype=np.uint64) * np.uint64(8))).sum(axis=1, dtype=np.uint64)
            upd = _rotl(h_cur[ai] ^ (lane4 * _P1), 23) * _P2 + _P3
            h_cur[ai] = upd
            pos = np.where(active, pos + 4, pos)
        # single bytes
        for _ in range(3):
            active = (lengths - pos) >= 1
            if not active.any():
                break
            ai = np.flatnonzero(active)
            b = data[ai, pos[ai]].astype(np.uint64)
            h_cur[ai] = _rotl(h_cur[ai] ^ (b * _P5), 11) * _P1
            pos = np.where(active, pos + 1, pos)
        # avalanche
        h_cur ^= h_cur >> np.uint64(33)
        h_cur *= _P2
        h_cur ^= h_cur >> np.uint64(29)
        h_cur *= _P3
        h_cur ^= h_cur >> np.uint64(32)
    return h_cur


def xxhash64_int64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """xxhash64 of PLAIN-encoded int64 values (8-byte LE), vectorized."""
    v = np.ascontiguousarray(values, dtype="<i8").view("u1").reshape(-1, 8)
    return xxhash64_matrix(v, np.full(len(v), 8, dtype=np.int64), seed)


def optimal_bytes(ndv: int, fpp: float = 0.01, max_bytes: int = 1 << 20) -> int:
    """Exact-NDV sizing with power-of-2 snap < 1024 B (reference:
    src/bloom.js:136-170)."""
    if ndv == 0:
        return BLOCK_BYTES
    m = -8.0 * ndv / math.log(1.0 - fpp ** (1.0 / 8.0))
    nbytes = int(m) // 8 + 1
    if nbytes < 1024:
        p = 1
        while p < nbytes:
            p <<= 1
        nbytes = p
    nbytes = (nbytes + BLOCK_BYTES - 1) // BLOCK_BYTES * BLOCK_BYTES
    return min(nbytes, max_bytes)


class SplitBlockBloom:
    def __init__(self, nbytes: int):
        if nbytes % BLOCK_BYTES:
            raise ValueError("size must be a multiple of 32 bytes")
        self.words = np.zeros(nbytes // 4, dtype=np.uint32)
        self.n_blocks = nbytes // BLOCK_BYTES

    def _positions(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = hashes.astype(np.uint64)
        block = ((h >> np.uint64(32)) * np.uint64(self.n_blocks)) >> np.uint64(32)
        key = h.astype(np.uint32)
        with np.errstate(over="ignore"):
            mul = key[:, None] * SALT[None, :]
        bit = (mul >> np.uint32(27)).astype(np.uint32)  # 8 bits in [0, 32)
        word_idx = block[:, None].astype(np.int64) * 8 + np.arange(8)
        return word_idx, bit

    def add_hashes(self, hashes: np.ndarray) -> None:
        word_idx, bit = self._positions(hashes)
        np.bitwise_or.at(self.words, word_idx.reshape(-1),
                         (np.uint32(1) << bit.reshape(-1)))

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        word_idx, bit = self._positions(hashes)
        need = np.uint32(1) << bit
        have = self.words[word_idx]
        return ((have & need) == need).all(axis=1)

    def to_bytes(self) -> bytes:
        return self.words.astype("<u4").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "SplitBlockBloom":
        f = cls(len(buf))
        f.words = np.frombuffer(buf, dtype="<u4").copy()
        return f


def build_bloom(hashes: np.ndarray, fpp: float = 0.01,
                max_bytes: int = 1 << 20) -> SplitBlockBloom | None:
    """Build from value hashes; exact-NDV sizing via the distinct set;
    returns None if the filter would exceed ``max_bytes`` (reference abort
    rule, src/bloom.js:113-124 analog)."""
    distinct = np.unique(hashes)
    nbytes = optimal_bytes(len(distinct), fpp, max_bytes + 1)
    if nbytes > max_bytes:
        return None
    f = SplitBlockBloom(nbytes)
    f.add_hashes(distinct)
    return f
