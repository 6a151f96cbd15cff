"""HyperLogLog NDV sketches for chunk metadata.

Public-literature sketch (Flajolet, Fusy, Gandouet, Meunier: "HyperLogLog:
the analysis of a near-optimal cardinality estimation algorithm", AofA
2007) -- the mergeable distinct-count summary ORC/Iceberg-style table
formats carry per column.  The reference writer has no NDV metadata at
all (its dictionary rule re-samples NDV per page, src/dictionary.js:80);
a per-chunk sketch makes the dataset-level distinct count a METADATA-ONLY
scan: registers merge by elementwise max, so partition-local merges
combine map-side and the driver folds one 4 KiB blob per partition.

Hash domain: the engine's canonical value hashes
(:func:`sparkcodec.engine._column_hashes`, vectorized xxhash64 seed 0 of
the value's canonical bytes) -- the SAME hashes the per-chunk bloom
filters consume, so sketches add no extra hashing pass.

Determinism: the sketch is a pure function of the value set (max is
order-independent), so any partitioning/ordering of the corpus yields
byte-identical merged registers -- which is what makes an exact SQL
oracle possible (replay xxhash64 + bucket maxima in DuckDB; see
:func:`xxhash64_int64_sql` / :func:`hll_registers_oracle_sql`).

wire format: u8 p | m = 2**p register bytes (dense, no compression --
the chunk container's general compressor handles the zeros).
"""

from __future__ import annotations

import math

import numpy as np

HLL_P = 12                 # 4096 registers, ~1.04/sqrt(m) = 1.6% std error
_M = 1 << HLL_P
_REM_BITS = 64 - HLL_P     # 52 low bits feed the leading-zero count


def hll_sketch(hashes: np.ndarray, p: int = HLL_P) -> bytes:
    """Sketch a batch of uint64 value hashes."""
    m = 1 << p
    rem_bits = 64 - p
    reg = np.zeros(m, dtype=np.uint8)
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if len(h):
        bucket = (h >> np.uint64(rem_bits)).astype(np.int64)
        rem = h & np.uint64((1 << rem_bits) - 1)
        # rho = leading zeros of the rem_bits-wide remainder + 1
        #     = rem_bits - bit_length(rem) + 1   (rem == 0 -> rem_bits + 1)
        from .bitpack import bit_widths

        rho = (rem_bits + 1 - bit_widths(rem)).astype(np.uint8)
        np.maximum.at(reg, bucket, rho)
    return bytes([p]) + reg.tobytes()


def hll_registers(sketch: bytes) -> np.ndarray:
    p = sketch[0]
    m = 1 << p
    if len(sketch) != 1 + m:
        raise ValueError(f"corrupt HLL sketch: {len(sketch)} bytes for p={p}")
    return np.frombuffer(sketch, dtype=np.uint8, count=m, offset=1)


def hll_merge(*sketches: bytes) -> bytes:
    """Elementwise-max merge; associative and commutative."""
    if not sketches:
        return hll_sketch(np.empty(0, dtype=np.uint64))
    p = sketches[0][0]
    acc = np.array(hll_registers(sketches[0]), dtype=np.uint8)
    for s in sketches[1:]:
        if s[0] != p:
            raise ValueError(f"HLL precision mismatch: {s[0]} vs {p}")
        np.maximum(acc, hll_registers(s), out=acc)
    return bytes([p]) + acc.tobytes()


def hll_estimate(sketch: bytes) -> float:
    """Classic HLL estimator with the small-range linear-counting
    correction (the 52-bit rho domain never needs the 32-bit large-range
    correction)."""
    reg = hll_registers(sketch).astype(np.float64)
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-reg)))
    zeros = int(np.count_nonzero(reg == 0))
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


# ------------------------------------------------------------------ SQL
# DuckDB replay of the engine's vectorized xxhash64 (seed 0) over 8-byte
# little-endian int64 values -- the canonical hash of every integer-typed
# column (engine._column_hashes).  All arithmetic stays in HUGEINT mod
# 2**64; 64x64-bit products are split at 32 bits (a full product would
# overflow HUGEINT's 127-bit range); XORs round-trip through BIGINT
# two's complement where DuckDB's scalar xor() lives.

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_W = 1 << 64
_HI = 1 << 63
_B32 = 1 << 32


def _mul_const_sql(x: str, c: int) -> str:
    """(x * c) mod 2**64 with 32-bit limb splitting; x is a HUGEINT column
    expression in [0, 2**64), c a 64-bit constant."""
    ch, cl = c >> 32, c & (_B32 - 1)
    return (f"(((((({x}) // {_B32}) * {cl} + (({x}) % {_B32}) * {ch}) % {_B32})"
            f" * {_B32} + (({x}) % {_B32}) * {cl}) % {_W})")


def _rotl_sql(x: str, r: int) -> str:
    return f"((({x}) * {1 << r}) % {_W} + ({x}) // {1 << (64 - r)})"


def _xor_sql(a: str, b: str) -> str:
    sa = f"CAST(({a}) - (CASE WHEN ({a}) >= {_HI} THEN {_W} ELSE 0 END) AS BIGINT)"
    sb = f"CAST(({b}) - (CASE WHEN ({b}) >= {_HI} THEN {_W} ELSE 0 END) AS BIGINT)"
    x = f"xor({sa}, {sb})"
    return f"(CAST({x} AS HUGEINT) + (CASE WHEN {x} < 0 THEN {_W} ELSE 0 END))"


def xxhash64_int64_sql(source_sql: str, value_col: str = "v",
                       out_col: str = "h") -> str:
    """SQL producing ``(value_col, out_col)``: xxhash64 (seed 0) of each
    BIGINT value's 8-byte little-endian encoding, exactly matching
    :func:`sparkcodec.kernels.bloom.xxhash64_int64`.  ``source_sql`` is a
    query yielding a BIGINT column ``value_col``.  Each spec step is its
    own CTE stage, so expressions reference the previous stage's column
    instead of inlining (no exponential string blowup)."""
    v = value_col
    steps = [
        # u64 bit pattern of the two's-complement input
        f"CAST({v} AS HUGEINT) + (CASE WHEN {v} < 0 THEN {_W} ELSE 0 END)",
        # k1 = rotl(input * P2, 31) * P1
        lambda x: _mul_const_sql(x, _P2),
        lambda x: _rotl_sql(x, 31),
        lambda x: _mul_const_sql(x, _P1),
        # h = rotl((seed + P5 + 8) ^ k1, 27) * P1 + P4
        lambda x: _xor_sql(str((_P5 + 8) % _W), x),
        lambda x: _rotl_sql(x, 27),
        lambda x: f"({_mul_const_sql(x, _P1)} + {_P4}) % {_W}",
        # avalanche
        lambda x: _xor_sql(x, f"({x}) // {1 << 33}"),
        lambda x: _mul_const_sql(x, _P2),
        lambda x: _xor_sql(x, f"({x}) // {1 << 29}"),
        lambda x: _mul_const_sql(x, _P3),
        lambda x: _xor_sql(x, f"({x}) // {1 << 32}"),
    ]
    ctes = [f"xx0 AS (SELECT {v}, {steps[0]} AS x FROM ({source_sql}))"]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(f"xx{i} AS (SELECT {v}, {step('x')} AS x FROM xx{i-1})")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT {v}, x AS {out_col} FROM xx{len(steps) - 1}")


def hll_registers_oracle_sql(values_sql: str, value_col: str = "v",
                             p: int = HLL_P) -> str:
    """SQL yielding the nonzero HLL registers (bucket, register) for the
    DISTINCT BIGINT values of ``values_sql`` -- the exact replay of
    ``hll_sketch(engine-hashes)`` for an integer column, graded
    integer-exact (registers, not the float estimate, so no
    floating-point summation-order hazard)."""
    rem_bits = 64 - p
    rem_mod = 1 << rem_bits
    hashed = xxhash64_int64_sql(
        f"SELECT DISTINCT {value_col} FROM ({values_sql})", value_col)
    return f"""
        WITH hashes AS ({hashed}),
        parts AS (
          SELECT CAST(h // {rem_mod} AS INTEGER) AS bucket,
                 CAST(h % {rem_mod} AS BIGINT) AS rem
          FROM hashes
        )
        SELECT bucket,
               CAST(max(CASE WHEN rem = 0 THEN {rem_bits + 1}
                             ELSE {rem_bits} + 1 - length(bin(rem)) END)
                    AS INTEGER) AS register
        FROM parts
        GROUP BY bucket
    """
