"""Deterministic synthetic tokens table (FIXTURES.md F1).

Every value is a pure function of (seed, row index) via splitmix64 mixing,
so the table is identical regardless of partitioning, batch boundaries, or
cluster size -- the property FIXTURES.md F4(d) requires for
checkpoint-resume tests.  Generation is vectorized numpy inside
mapInArrow; no per-row Python, no driver-side data.

Schema (BASELINE.json input_hint): doc_id string, tokens array<int32>,
n_tok int32, source string.  Token ids Zipf(a=1.2)-ish in [0, 50257);
lengths lognormal(mu=5.5, sigma=1.2) clipped to [1, 8192]; source
categorical {web, books, code, wiki, forums} @ (.55,.1,.15,.1,.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB = 50257
SOURCES = np.array(["web", "books", "code", "wiki", "forums"])
SOURCE_CDF = np.cumsum([0.55, 0.10, 0.15, 0.10, 0.10])

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer; uint64 in -> uint64 out."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _M1) * _M2
        z ^= z >> np.uint64(30)
        z *= _M2
        z ^= z >> np.uint64(27)
        z *= _M3
        z ^= z >> np.uint64(31)
    return z


def _uniform(x: np.ndarray) -> np.ndarray:
    """deterministic U(0,1) from uint64 keys, never exactly 0."""
    return (_mix(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53) + 1e-16


def gen_rows(ids: np.ndarray, seed: int = 42) -> pa.RecordBatch:
    """Generate the F1 rows for the given row indexes (vectorized)."""
    n = len(ids)
    ids = ids.astype(np.uint64)
    base = np.uint64((seed * 0xD1B54A32D192ED03) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        # lengths: lognormal via Box-Muller on two per-row uniforms
        u1 = _uniform(base + ids * np.uint64(4))
        u2 = _uniform(base + ids * np.uint64(4) + np.uint64(1))
        z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
        lens = np.clip(np.exp(5.5 + 1.2 * z).astype(np.int64), 1, 8192)
        # source: categorical
        us = _uniform(base + ids * np.uint64(4) + np.uint64(2))
        src_idx = np.searchsorted(SOURCE_CDF, us)
        src_idx = np.minimum(src_idx, len(SOURCES) - 1)
        # tokens: Zipf(1.2)-ish via inverse CDF u^(-1/(a-1)), keyed by (row, pos)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        total = int(offsets[-1])
        row_of = np.repeat(ids, lens)
        pos = np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1], lens).astype(np.uint64)
        ut = _uniform(base ^ np.uint64(0xA5A5A5A5A5A5A5A5) + (row_of << np.uint64(13)) + pos)
        rank = np.minimum(ut ** (-1.0 / 0.2), 1e12).astype(np.int64)
        tokens = ((rank * np.int64(2654435761)) % VOCAB).astype(np.int32)

    srcs = SOURCES[src_idx]
    doc_ids = np.char.add(np.char.add(srcs, "-"), np.char.zfill(ids.astype("U12"), 12))
    tok_arr = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)), pa.array(tokens))
    return pa.RecordBatch.from_arrays(
        [pa.array(doc_ids.tolist(), type=pa.string()), tok_arr,
         pa.array(lens.astype(np.int32)), pa.array(srcs.tolist(), type=pa.string())],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


def synth_tokens(spark, n_rows: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed deterministic F1 table as a Spark DataFrame."""

    def gen(batches):
        for b in batches:
            ids = b.column(0).to_numpy()
            yield gen_rows(ids, seed)

    base = spark.range(0, n_rows, 1, num_partitions) if num_partitions else spark.range(n_rows)
    return base.mapInArrow(gen, "doc_id string, tokens array<int>, n_tok int, source string")
