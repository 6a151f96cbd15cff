"""Column-chunk statistics: min/max/null_count with parquet semantics.

Rules mirrored from the reference:
  * NaNs are skipped when computing float min/max
    (reference: src/column.js:249-261).
  * Signed zero is normalized: min -> -0.0, max -> +0.0
    (reference: src/column.js:273-284).
  * Byte-array min/max compared by unsigned lexicographic order and
    truncated to 16 bytes -- min is a plain prefix, max is the prefix
    rounded UP (increment last non-0xFF byte, drop trailing 0xFF bytes,
    omitted entirely if all 0xFF); exactness flags emitted only when
    truncation happened (reference: src/unconvert.js:126-171, 261-272).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

TRUNCATE_LEN = 16


def _lex_arg(padded: np.ndarray, reducer) -> int:
    """Index of the lexicographic extreme row of a (n, cap) byte matrix."""
    cand = np.arange(len(padded))
    for c in range(padded.shape[1]):
        col = padded[cand, c]
        cand = cand[col == reducer(col)]
        if len(cand) == 1:
            break
    return int(cand[0])


@dataclass
class ChunkStats:
    n_values: int
    null_count: int
    min_value: object = None
    max_value: object = None
    is_min_exact: bool = True
    is_max_exact: bool = True


def truncate_min(b: bytes) -> tuple[bytes, bool]:
    if len(b) <= TRUNCATE_LEN:
        return b, True
    return b[:TRUNCATE_LEN], False


def truncate_max(b: bytes) -> tuple[bytes | None, bool]:
    if len(b) <= TRUNCATE_LEN:
        return b, True
    p = bytearray(b[:TRUNCATE_LEN])
    while p and p[-1] == 0xFF:
        p.pop()
    if not p:
        return None, False  # unrepresentable upper bound: omit
    p[-1] += 1
    return bytes(p), False


def numeric_stats(values: np.ndarray, n_logical: int) -> ChunkStats:
    """Stats over the null-stripped numeric values of a chunk."""
    null_count = n_logical - len(values)
    st = ChunkStats(n_values=n_logical, null_count=null_count)
    if len(values) == 0:
        return st
    if values.dtype.kind == "f":
        finite = values[~np.isnan(values)]
        if len(finite) == 0:
            return st
        mn = float(finite.min())
        mx = float(finite.max())
        if mn == 0.0:
            mn = -0.0
        if mx == 0.0:
            mx = 0.0
        st.min_value, st.max_value = mn, mx
    elif values.dtype.kind == "b":
        st.min_value, st.max_value = bool(values.min()), bool(values.max())
    else:
        st.min_value, st.max_value = int(values.min()), int(values.max())
    return st


def binary_stats(offsets: np.ndarray, data: np.ndarray, n_logical: int) -> ChunkStats:
    """Stats over null-stripped byte-array values given Arrow-style buffers.

    Min/max found without materializing Python objects for every value:
    candidates are reduced via numpy on a fixed-width prefix matrix, then
    the survivors compared exactly.
    """
    n = len(offsets) - 1
    st = ChunkStats(n_values=n_logical, null_count=n_logical - n)
    if n == 0:
        return st
    lengths = np.diff(offsets)
    cap = int(min(lengths.max(initial=0), TRUNCATE_LEN + 1))
    if cap == 0:
        st.min_value = st.max_value = b""
        return st
    padded = np.full((n, cap), -1, dtype=np.int16)  # -1 sorts before any byte
    gather = offsets[:-1, None] + np.arange(cap)
    valid = np.arange(cap)[None, :] < lengths[:, None]
    padded[valid] = data[np.minimum(gather, max(len(data) - 1, 0))][valid]
    # lexicographic argmin/argmax by column-wise candidate reduction
    mn_i = _lex_arg(padded, np.min)
    mx_i = _lex_arg(padded, np.max)
    # No tie-break beyond the cap is needed: the matrix holds TRUNCATE_LEN+1
    # bytes, so candidates that compare equal share a 17-byte prefix and
    # therefore produce identical 16-byte truncated stats.
    mn_b = bytes(data[offsets[mn_i] : offsets[mn_i + 1]])
    mx_b = bytes(data[offsets[mx_i] : offsets[mx_i + 1]])
    st.min_value, st.is_min_exact = truncate_min(mn_b)
    st.max_value, st.is_max_exact = truncate_max(mx_b)
    return st
