"""Dictionary encoding: distinct values + RLE/bit-packed hybrid indexes.

Mirrors the reference's RLE_DICTIONARY path (reference:
src/dictionary.js:72-166, src/datapage.js:47-53): the data block is a
uint8 bit width followed by a hybrid-encoded index stream at
bw = ceil(log2(len(dict))) (bw >= 1 so a single-entry dictionary still
round-trips).  The reference dedups byte arrays via FNV-1a hash buckets +
exact compare (src/dictionary.js:39-59); here pyarrow's hash-based
``dictionary_encode`` provides the same first-occurrence-order semantics
without per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bitpack import bit_width
from .rle import rle_hybrid_decode, rle_hybrid_encode


def factorize(values, kind: str) -> tuple[np.ndarray, object]:
    """(indexes int64, dictionary) in first-occurrence order.

    For numeric/bool ``kind`` the dictionary is a numpy array; for
    string/binary it is a pyarrow Array (so downstream encoders reuse its
    offsets buffer zero-copy).
    """
    if kind in ("string", "binary"):
        if isinstance(values, pa.Array):
            arr = values
        else:
            arr = pa.array(values)
        denc = pc.dictionary_encode(arr).combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return idx, denc.dictionary
    arr = pa.array(np.ascontiguousarray(values))
    denc = arr.dictionary_encode()
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return idx, denc.dictionary.to_numpy(zero_copy_only=False)


def dict_indexes_encode(indexes: np.ndarray, ndict: int) -> bytes:
    bw = max(1, bit_width(max(ndict - 1, 0)))
    return bytes([bw]) + rle_hybrid_encode(indexes.astype(np.uint64), bw)


def dict_indexes_decode(buf, n: int) -> np.ndarray:
    bw = buf[0]
    return rle_hybrid_decode(memoryview(buf)[1:], bw, n).astype(np.int64)
