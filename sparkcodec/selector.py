"""Codec auto-selector: sample a chunk, estimate encoded size per candidate
codec, pick the cheapest.

Generalizes the reference's single dictionary heuristic (sample the first
1000 values, use a dictionary iff NDV/sample <= 0.5 and the dictionary fits
the page budget -- reference: src/dictionary.js:80-85,113-124) and its
boolean-RLE auto-pick (reference: src/column.js:71) into a cost model over
{PLAIN, RLE, DICT, DELTA_BP, FOR, DELTA_FOR, BSS, DELTA_LENGTH, DELTA_BA,
FSST}.  Deterministic: a pure function of the first SAMPLE_N non-null
values, so checkpoint resume re-picks identical codecs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .kernels.bitpack import bit_widths

SAMPLE_N = 1000          # reference: src/dictionary.js:80
DICT_NDV_RATIO = 0.5     # reference: src/dictionary.js:85
DICT_MAX_BYTES = 1 << 20  # page-budget abort, reference: src/dictionary.js:113-114

# Sound lower bound on estimate_costs_binary's FSST entry
# (avg_len * (1 - gain) + 1.5): the measured gain is < 1 for any sample,
# so cost_FSST > 1.5 always.  When some other codec already costs <= this
# floor, the (expensive) FSST training probe cannot change the pick --
# ties break toward the lower codec id and FSST has the highest -- so the
# probe is skipped without ever altering codec selection.
FSST_COST_FLOOR = 1.5

# codec tags (stable wire ids, recorded in chunk headers and manifests)
PLAIN = 0
RLE = 1
DICT = 2
DELTA_BP = 3
FOR = 4
DELTA_FOR = 5
BSS = 6
DELTA_LENGTH = 7
DELTA_BA = 8
FSST = 9
RANK = 10  # frequency-ranked dictionary + byte-plane split (the reference's
           # "TODO: sort by frequency?" at src/dictionary.js:133, realized)
PFOR = 11  # patched frame-of-reference (public: Zukowski et al. ICDE 2006):
           # cost-optimal base width + exception side lists, so outliers
           # no longer force the whole chunk to the max width
DELTA_PFOR = 12  # PFOR over the zigzag deltas: near-monotonic streams with
                 # occasional huge jumps pack at the TYPICAL step width
ALP = 13  # adaptive lossless float compression (public: Afroozeh & Boncz
          # VLDB 2023): decimal doubles as PFOR-packed scaled ints, true
          # reals via left-bits dictionary / right-bits split (ALP-RD)

CODEC_NAMES = {
    PLAIN: "PLAIN",
    RLE: "RLE",
    DICT: "DICT",
    DELTA_BP: "DELTA_BP",
    FOR: "FOR",
    DELTA_FOR: "DELTA_FOR",
    BSS: "BSS",
    DELTA_LENGTH: "DELTA_LENGTH",
    DELTA_BA: "DELTA_BA",
    FSST: "FSST",
    RANK: "RANK",
    PFOR: "PFOR",
    DELTA_PFOR: "DELTA_PFOR",
    ALP: "ALP",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}


@dataclass
class SampleStats:
    n: int
    ndv_ratio: float
    mean_run: float
    for_bw: int          # bits(max - min)
    delta_bw: int        # bits(max zigzag delta)
    item_size: int
    avg_len: float = 0.0     # binary only
    avg_prefix: float = 0.0  # binary only
    top256_mass: float = 0.0  # fraction of sampled values among the 256 most
                              # frequent sampled values (skew probe for RANK)
    pfor_bpv: float = 64.0   # exact PFOR payload bits/value on the sample
    pfor_delta_bpv: float = 64.0  # same, over the zigzag deltas
    alp_bpv: float = 1e9     # exact ALP probe (floats only)


def _bw_of(x: int) -> int:
    return int(x).bit_length()


def sample_numeric(values: np.ndarray) -> SampleStats:
    s = values[:SAMPLE_N]
    n = len(s)
    if n == 0:
        return SampleStats(0, 1.0, 1.0, 64, 64, values.dtype.itemsize)
    if s.dtype.kind == "f":
        # bit-exact NDV/runs on the raw representation
        as_int = s.view(np.int64 if s.dtype.itemsize == 8 else np.int32).astype(np.int64)
    else:
        as_int = s.astype(np.int64)
    uniq, counts = np.unique(as_int, return_counts=True)
    ndv = len(uniq)
    top = np.sort(counts)[::-1][:256]
    top256 = float(top.sum() / n)
    runs = 1 + int(np.count_nonzero(as_int[1:] != as_int[:-1]))
    from .kernels.pfor import pfor_bits_per_value

    int_like = s.dtype.kind in ("i", "u", "b")
    with np.errstate(over="ignore"):
        span = int(as_int.max()) - int(as_int.min())
        for_bw = _bw_of(span if span >= 0 else (1 << 64) - 1)
        pfor_bpv, pfor_delta_bpv = 64.0, 64.0
        if n > 1:
            d = as_int[1:] - as_int[:-1]
            zz = ((d << 1) ^ (d >> 63)).view(np.uint64)
            delta_bw = int(bit_widths(np.array([zz.max()], dtype=np.uint64))[0])
            if int_like:  # PFOR is priced for int kinds only: skip on floats
                pfor_delta_bpv = pfor_bits_per_value(zz.view(np.int64))
        else:
            delta_bw = 0
            pfor_delta_bpv = 0.0
        if int_like:
            pfor_bpv = pfor_bits_per_value(as_int)
    alp_bpv = 1e9
    if s.dtype.kind == "f" and s.dtype.itemsize in (4, 8):
        from .kernels.alp import alp_bits_per_value

        alp_bpv = alp_bits_per_value(s)
    return SampleStats(n, ndv / n, n / runs, for_bw, delta_bw,
                       values.dtype.itemsize, top256_mass=top256,
                       pfor_bpv=pfor_bpv, pfor_delta_bpv=pfor_delta_bpv,
                       alp_bpv=alp_bpv)


def sample_binary(offsets: np.ndarray, data: np.ndarray) -> SampleStats:
    n_all = len(offsets) - 1
    n = min(n_all, SAMPLE_N)
    if n == 0:
        return SampleStats(0, 1.0, 1.0, 0, 0, 0)
    off = offsets[: n + 1]
    lengths = np.diff(off)
    avg_len = float(lengths.mean())
    # NDV estimate via (length, 8-byte prefix, 8-byte suffix) fingerprint --
    # cheap, vectorized, and collision-resistant enough for a cost model
    def _window_u64(starts: np.ndarray) -> np.ndarray:
        w = np.zeros((n, 8), dtype="u1")
        gather = starts[:, None] + np.arange(8)
        valid = np.arange(8)[None, :] < np.minimum(lengths, 8)[:, None]
        if data.size:
            w[valid] = data[np.minimum(gather, len(data) - 1)][valid]
        return np.ascontiguousarray(w).view("<u8").ravel()

    pre = _window_u64(off[:-1].astype(np.int64))
    suf = _window_u64(np.maximum(off[1:].astype(np.int64) - 8, off[:-1].astype(np.int64)))
    with np.errstate(over="ignore"):
        fp = (lengths.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
              ^ pre * np.uint64(0xC2B2AE3D27D4EB4F) ^ suf)
    ndv = len(np.unique(fp))
    runs = 1 + int(np.count_nonzero(fp[1:] != fp[:-1]))
    # mean shared prefix with previous value (for DELTA_BA estimate)
    from .kernels.strings import _common_prefix_lengths

    avg_prefix = float(_common_prefix_lengths(off, data).mean()) if n > 1 else 0.0
    return SampleStats(n, ndv / n, n / runs, 0, 0, 0, avg_len, avg_prefix)


def estimate_costs_numeric(st: SampleStats, dtype_kind: str,
                           n_total: int | None = None,
                           comp_ratio: float = 1.0,
                           bss_comp_ratio: float | None = None) -> dict[int, float]:
    """Estimated bytes per value for each candidate codec.  ``n_total`` is
    the true chunk length (one-time costs like dictionaries amortize over
    it, not over the sample).

    ``comp_ratio`` makes the model aware of the post-codec general
    compression stage (measured by probing the sample bytes with the
    default compressor): byte-aligned payloads (PLAIN, BSS) shrink by it,
    while bit-packed payloads (FOR/DELTA) are usually incompressible and
    keep their raw cost.  Without it the model systematically over-prices
    PLAIN+zstd against bit-packed codecs."""
    costs: dict[int, float] = {PLAIN: float(st.item_size) * comp_ratio}
    if st.n == 0:
        return costs
    n_total = n_total or st.n
    if dtype_kind in ("i", "u"):
        costs[FOR] = st.for_bw / 8 + 16 / max(st.n, 1)
        costs[DELTA_FOR] = st.delta_bw / 8 + 16 / max(st.n, 1)
        costs[DELTA_BP] = st.delta_bw / 8 + 5 / 128  # block headers; widths adapt downward
        # exact payload bits/value measured on the sample; ties lose to
        # FOR/DELTA_FOR (lower codec ids) so PFOR only wins when the
        # patch lists strictly pay for themselves
        costs[PFOR] = st.pfor_bpv / 8 + 16 / max(st.n, 1)
        costs[DELTA_PFOR] = st.pfor_delta_bpv / 8 + 16 / max(st.n, 1)
        if 8 < st.for_bw <= 22 and st.n >= SAMPLE_N and n_total >= 4 * SAMPLE_N:
            # frequency-ranked dict: low byte ~raw, high plane shrinks with
            # skew; dictionary stored once per chunk.  NDV extrapolated
            # sqrt-sublinearly from the sample, capped by the value span.
            ndv_sample = st.ndv_ratio * st.n
            ndv_est = min(float(1 << st.for_bw),
                          ndv_sample * (n_total / st.n) ** 0.5)
            hi_cost = max(0.12, (1.0 - st.top256_mass) * 1.0)
            costs[RANK] = 1.0 + hi_cost + ndv_est * 3.0 / n_total
        if st.mean_run >= 4:
            vbytes = max(1, (st.for_bw + 7) // 8)
            costs[RLE] = (2 + vbytes) / st.mean_run
    if dtype_kind == "f":
        # BSS exists to help the general compressor (exponent/mantissa
        # byte planes compress better than interleaved floats).  When the
        # caller measured the compressor on the BSS-TRANSFORMED sample,
        # use that exact ratio; otherwise credit the raw-byte ratio a bit
        if bss_comp_ratio is not None:
            costs[BSS] = float(st.item_size) * min(bss_comp_ratio, 1.0)
        else:
            costs[BSS] = float(st.item_size) * min(comp_ratio * 0.9, 1.0)
        # exact sample probe; ALP payloads are bit-packed so they get no
        # post-compression credit (consistent with FOR/PFOR pricing)
        costs[ALP] = st.alp_bpv / 8 + 32 / max(st.n, 1)
        if st.mean_run >= 4:
            costs[RLE] = (2 + st.item_size) / st.mean_run
    if dtype_kind == "b":
        costs[PLAIN] = 1 / 8
        costs[RLE] = 3 / st.mean_run if st.mean_run >= 16 else 1.0
    if st.ndv_ratio <= DICT_NDV_RATIO:
        ndv_est = max(1.0, st.ndv_ratio * st.n)
        idx_bits = max(1, _bw_of(int(ndv_est)))
        dict_bytes = ndv_est * st.item_size
        if dict_bytes <= DICT_MAX_BYTES:
            costs[DICT] = idx_bits / 8 * min(1.0, 2.0 / st.mean_run) + dict_bytes / max(st.n, 1)
    return costs


def estimate_costs_binary(st: SampleStats, fsst_gain: float | None = None) -> dict[int, float]:
    costs: dict[int, float] = {PLAIN: 4 + st.avg_len}
    if st.n == 0:
        return costs
    costs[DELTA_LENGTH] = st.avg_len + 1.2
    costs[DELTA_BA] = (st.avg_len - st.avg_prefix) + 2.4
    if st.ndv_ratio <= DICT_NDV_RATIO:
        ndv_est = max(1.0, st.ndv_ratio * st.n)
        idx_bits = max(1, _bw_of(int(ndv_est)))
        dict_bytes = ndv_est * (st.avg_len + 1.2)
        if dict_bytes <= DICT_MAX_BYTES:
            costs[DICT] = idx_bits / 8 * min(1.0, 2.0 / st.mean_run) + dict_bytes / max(st.n, 1)
    if fsst_gain is not None and fsst_gain > 0:
        costs[FSST] = st.avg_len * (1 - fsst_gain) + 1.5
    return costs


def pick(costs: dict[int, float]) -> int:
    # deterministic: min cost, ties broken by codec id
    return min(sorted(costs), key=lambda c: costs[c])
