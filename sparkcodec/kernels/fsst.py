"""FSST-style string/symbol compression (from the public FSST paper:
"FSST: Fast Random Access String Compression", Boncz, Neumann, Leis,
VLDB 2020).  Not present in the reference writer (its closest analog is
DELTA_BYTE_ARRAY prefix coding, reference: src/delta.js:307-364); required
by this repo's north rule.

Simplifications vs the paper (kept deliberately -- we own both ends):
  * symbol table trained by iterative greedy pair-merging on a bounded
    sample (the paper's gain heuristic, fewer iterations);
  * encode is greedy longest-match, vectorized: per-position candidate
    codes for all lengths 1..8 are found with uint64 window hashing +
    searchsorted, then the match path is walked with a frontier loop over
    strings (one vector op per emitted-code step, never per byte).

Wire format:
    uvarint n_strings
    u8 n_symbols | per symbol: u8 len, bytes
    uvarint len(code_lens_chunk) | DELTA_BINARY_PACKED per-string code bytes
    code stream (concatenated; code 255 = escape, next byte literal)
"""

from __future__ import annotations

import numpy as np

from .delta import delta_binary_pack, delta_binary_unpack
from .varint import read_uvarint, write_uvarint

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8
TRAIN_ITERS = 3
SAMPLE_BYTES = 1 << 16


def _windows_u64(data: np.ndarray) -> np.ndarray:
    """uint64 little-endian view of the 8-byte window at every position."""
    padded = np.concatenate([data, np.zeros(8, dtype="u1")])
    return np.lib.stride_tricks.sliding_window_view(padded, 8)[: len(data)].copy().view("<u8").ravel()


_LEN_MASKS = np.array([(1 << (8 * L)) - 1 for L in range(1, 9)], dtype=np.uint64)


def _sym_key(sym: bytes) -> int:
    return int.from_bytes(sym.ljust(8, b"\0"), "little") & int(_LEN_MASKS[len(sym) - 1])


class SymbolTable:
    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        self.lens = np.array([len(s) for s in symbols], dtype=np.int64)
        # per length: sorted key array + code array for searchsorted lookup
        self._by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for L in range(1, MAX_SYM_LEN + 1):
            codes = [i for i, s in enumerate(symbols) if len(s) == L]
            if not codes:
                continue
            keys = np.array([_sym_key(symbols[c]) for c in codes], dtype=np.uint64)
            order = np.argsort(keys)
            self._by_len[L] = (keys[order], np.array(codes, dtype=np.int16)[order])
        # direct-index tables for 1- and 2-byte symbols (-1 = no symbol):
        # a gather replaces the per-position binary search on the two hot
        # lengths (same membership semantics as the searchsorted path)
        self._lut1 = self._lut2 = None
        ent = self._by_len.get(1)
        if ent is not None:
            lut = np.full(256, -1, dtype=np.int16)
            lut[ent[0].astype(np.int64)] = ent[1]
            self._lut1 = lut
        ent = self._by_len.get(2)
        if ent is not None:
            lut = np.full(1 << 16, -1, dtype=np.int16)
            lut[ent[0].astype(np.int64)] = ent[1]
            self._lut2 = lut
        # 2-byte-prefix candidate mask for lengths 3..8 (bit L-3 set iff
        # some L-symbol starts with those two bytes): only positions whose
        # low 2 window bytes hit the mask can match, so the binary search
        # runs over that (usually small) candidate subset
        self._pref_mask = None
        if any(L in self._by_len for L in range(3, MAX_SYM_LEN + 1)):
            mask = np.zeros(1 << 16, dtype=np.uint8)
            for L in range(3, MAX_SYM_LEN + 1):
                ent = self._by_len.get(L)
                if ent is not None:
                    pref = (ent[0] & np.uint64(0xFFFF)).astype(np.int64)
                    mask[pref] |= np.uint8(1 << (L - 3))
            self._pref_mask = mask

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        for s in self.symbols:
            out.append(len(s))
            out.extend(s)
        return bytes(out)

    @staticmethod
    def deserialize(mv, pos: int) -> tuple["SymbolTable", int]:
        nsym = mv[pos]
        pos += 1
        syms = []
        for _ in range(nsym):
            sl = mv[pos]
            pos += 1
            syms.append(bytes(mv[pos : pos + sl]))
            pos += sl
        return SymbolTable(syms), pos


def _match_table(data: np.ndarray, table: SymbolTable,
                 win: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Per position: (code, match_len) of the longest symbol match,
    ignoring string boundaries (caller constrains lengths).  ``win`` is the
    cached :func:`_windows_u64` view (callers that match several times over
    the same buffer pass it to skip the 8x window copy)."""
    n = len(data)
    best_code = np.full(n, ESCAPE, dtype=np.int16)
    best_len = np.ones(n, dtype=np.int8)
    if n == 0:
        return best_code, best_len
    # L=1/2: direct LUT gathers (the hot lengths; identical verdicts to the
    # searchsorted membership test below)
    if table._lut1 is not None:
        codes1 = table._lut1[data]
        hit = codes1 >= 0
        best_code[hit] = codes1[hit]
    u16 = None
    if table._lut2 is not None or table._pref_mask is not None:
        u16 = data.astype(np.uint16)
        u16[:-1] |= data[1:].astype(np.uint16) << 8  # last position pads \0
    if table._lut2 is not None:
        codes2 = table._lut2[u16]
        hit = codes2 >= 0
        best_code[hit] = codes2[hit]
        best_len[hit] = 2
    if table._pref_mask is not None:
        if win is None:
            win = _windows_u64(data)
        pmask = table._pref_mask[u16]
        for L in range(3, MAX_SYM_LEN + 1):
            ent = table._by_len.get(L)
            if ent is None:
                continue
            keys, codes = ent
            cand = np.flatnonzero(pmask & np.uint8(1 << (L - 3)))
            if len(cand) == 0:
                continue
            masked = win[cand] & _LEN_MASKS[L - 1]
            idx = np.searchsorted(keys, masked)
            np.minimum(idx, len(keys) - 1, out=idx)
            hit = keys[idx] == masked
            sub = cand[hit]
            best_code[sub] = codes[idx[hit]]
            best_len[sub] = L
    return best_code, best_len


def _constrain_to_strings(best_code: np.ndarray, best_len: np.ndarray,
                          data: np.ndarray, offsets: np.ndarray,
                          table: SymbolTable,
                          win: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Clamp matches so they never cross a string boundary; where the
    longest match crosses, fall back to shorter lengths, else escape."""
    n = len(data)
    lens = np.diff(offsets)
    remaining = (np.repeat(offsets[1:], lens) - np.arange(n)).astype(np.int8 if n < 128 else np.int64)
    cross = best_len > remaining
    if not cross.any():
        return best_code, best_len
    # re-resolve crossing positions over decreasing lengths
    if win is None:
        win = _windows_u64(data)
    fix_idx = np.flatnonzero(cross)
    fixed_code = np.full(len(fix_idx), ESCAPE, dtype=np.int16)
    fixed_len = np.ones(len(fix_idx), dtype=np.int64)
    rem_fix = np.asarray(remaining, dtype=np.int64)[fix_idx]
    for L in range(MAX_SYM_LEN, 0, -1):
        ent = table._by_len.get(L)
        if ent is None:
            continue
        keys, codes = ent
        cand = (fixed_code == ESCAPE) & (rem_fix >= L) & (fixed_len <= L)
        if not cand.any():
            continue
        sub = fix_idx[cand]
        masked = win[sub] & _LEN_MASKS[L - 1]
        idx = np.searchsorted(keys, masked)
        idx_c = np.minimum(idx, len(keys) - 1)
        hit = keys[idx_c] == masked
        tgt = np.flatnonzero(cand)[hit]
        fixed_code[tgt] = codes[idx_c[hit]]
        fixed_len[tgt] = L
    best_code = best_code.copy()
    best_len = best_len.astype(np.int64).copy()
    best_code[fix_idx] = fixed_code
    best_len[fix_idx] = fixed_len
    return best_code, best_len


def _greedy_parse(offsets: np.ndarray, best_code: np.ndarray, best_len: np.ndarray):
    """Walk the greedy match path for every string concurrently.
    Returns (visited position index array, per-string code-byte counts)."""
    n_str = len(offsets) - 1
    n = len(best_code)
    visited = np.zeros(n, dtype=bool)
    cursors = offsets[:-1].astype(np.int64).copy()
    ends = offsets[1:].astype(np.int64)
    active = np.flatnonzero(cursors < ends)
    step_len = np.asarray(best_len, dtype=np.int64)
    while len(active):
        pos = cursors[active]
        visited[pos] = True
        cursors[active] = pos + step_len[pos]
        active = active[cursors[active] < ends[active]]
    vis_idx = np.flatnonzero(visited)
    is_esc = best_code[vis_idx] == ESCAPE
    out_w = np.where(is_esc, 2, 1).astype(np.int64)
    str_of = np.searchsorted(offsets[1:], vis_idx, side="right")
    counts = np.bincount(str_of, weights=out_w, minlength=n_str).astype(np.int64)
    return vis_idx, is_esc, out_w, counts


def train(offsets: np.ndarray, data: np.ndarray) -> SymbolTable:
    """Iterative greedy symbol-table training on a bounded sample."""
    # bound the sample
    cut = int(np.searchsorted(offsets, SAMPLE_BYTES, side="right"))
    cut = max(1, min(cut, len(offsets) - 1))
    s_off = offsets[: cut + 1].astype(np.int64)
    s_data = data[: int(s_off[-1])]

    # iteration 0: single-byte symbols by frequency (escapes cost 2 bytes)
    if len(s_data) == 0:
        return SymbolTable([])
    byte_counts = np.bincount(s_data, minlength=256)
    order = np.argsort(byte_counts)[::-1]
    symbols = [bytes([b]) for b in order[:MAX_SYMBOLS] if byte_counts[b] > 0]
    table = SymbolTable(symbols)

    s_win = _windows_u64(s_data)  # shared across iterations (8x-copy once)
    for _ in range(TRAIN_ITERS):
        bc, bl = _match_table(s_data, table, win=s_win)
        bc, bl = _constrain_to_strings(bc, bl, s_data, s_off, table, win=s_win)
        vis_idx, is_esc, _, _ = _greedy_parse(s_off, bc, bl)
        # count adjacent (code, code) pairs within strings
        codes_at = bc[vis_idx]
        lens_at = np.asarray(bl, dtype=np.int64)[vis_idx]
        str_of = np.searchsorted(s_off[1:], vis_idx, side="right")
        same_str = str_of[1:] == str_of[:-1]
        # candidate merged symbols: bytes of code i + code i+1, <= 8 bytes
        cand_gain: dict[bytes, int] = {}
        sym_bytes = table.symbols
        a = codes_at[:-1][same_str]
        b = codes_at[1:][same_str]
        pos_a = vis_idx[:-1][same_str]
        len_a = lens_at[:-1][same_str]
        len_b = lens_at[1:][same_str]
        ok = (a != ESCAPE) & (b != ESCAPE) & (len_a + len_b <= MAX_SYM_LEN)
        if ok.any():
            merged_len = (len_a + len_b)[ok]
            starts = pos_a[ok]
            win = s_win[starts] & _LEN_MASKS[np.minimum(merged_len, 8) - 1]
            if len(starts):
                # 1-D unique on (window, len) combined via index recovery --
                # axis-unique would sort a structured view, ~10x slower
                with np.errstate(over="ignore"):
                    combo = win * np.uint64(11) + merged_len.astype(np.uint64)
                _, first_idx, counts = np.unique(combo, return_index=True,
                                                 return_counts=True)
                # only the highest-count merge candidates can make the
                # 255-symbol table; cap the python loop accordingly
                top = np.argsort(counts)[-512:]
                for i, c in zip(first_idx[top], counts[top]):
                    L = int(merged_len[i])
                    sym = int(win[i]).to_bytes(8, "little")[:L]
                    cand_gain[sym] = cand_gain.get(sym, 0) + int(c) * (L - 1)
        # existing symbols' gains: saved bytes vs escaping every byte
        cur_counts = np.bincount(codes_at[codes_at != ESCAPE].astype(np.int64),
                                 minlength=len(sym_bytes))
        for i, s in enumerate(sym_bytes):
            cand_gain[s] = cand_gain.get(s, 0) + int(cur_counts[i]) * (2 * len(s) - 1)
        ranked = sorted(cand_gain.items(), key=lambda kv: (-kv[1], kv[0]))
        table = SymbolTable([s for s, _ in ranked[:MAX_SYMBOLS]])
    return table


def fsst_encode(offsets: np.ndarray, data: np.ndarray,
                table: SymbolTable | None = None) -> bytes:
    offsets = np.asarray(offsets, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype="u1")
    n_str = len(offsets) - 1
    if table is None:
        table = train(offsets, data)
    out = bytearray()
    write_uvarint(out, n_str)
    out.extend(table.serialize())
    if len(data) == 0 or n_str == 0:
        lc = delta_binary_pack(np.zeros(n_str, dtype=np.int64))
        write_uvarint(out, len(lc))
        out.extend(lc)
        return bytes(out)
    win = _windows_u64(data)
    bc, bl = _match_table(data, table, win=win)
    bc, bl = _constrain_to_strings(bc, bl, data, offsets, table, win=win)
    del win
    vis_idx, is_esc, out_w, counts = _greedy_parse(offsets, bc, bl)
    lc = delta_binary_pack(counts)
    write_uvarint(out, len(lc))
    out.extend(lc)
    # assemble code stream: per visited unit 1 byte (code) or 2 (escape+literal)
    total = int(out_w.sum())
    stream = np.empty(total, dtype="u1")
    starts = np.zeros(len(vis_idx), dtype=np.int64)
    np.cumsum(out_w[:-1], out=starts[1:])
    stream[starts] = np.where(is_esc, ESCAPE, bc[vis_idx]).astype("u1")
    esc_starts = starts[is_esc]
    stream[esc_starts + 1] = data[vis_idx[is_esc]]
    out.extend(stream.tobytes())
    return bytes(out)


def fsst_decode(buf) -> tuple[np.ndarray, np.ndarray]:
    mv = memoryview(buf)
    n_str, pos = read_uvarint(mv, 0)
    table, pos = SymbolTable.deserialize(mv, pos)
    lclen, pos = read_uvarint(mv, pos)
    counts = delta_binary_unpack(mv[pos : pos + lclen])
    pos += lclen
    stream = np.frombuffer(mv[pos:], dtype="u1")
    if len(stream) == 0:
        return np.zeros(n_str + 1, dtype=np.int64), np.zeros(0, dtype="u1")

    str_bounds = np.zeros(n_str + 1, dtype=np.int64)
    np.cumsum(counts, out=str_bounds[1:])

    # escape resolution: within a run of consecutive 0xFF bytes the parity
    # alternates escape/literal (a literal 0xFF can only follow an escape);
    # string starts force a run break since units never span strings
    is255 = stream == ESCAPE
    idx = np.arange(len(stream))
    run_start = is255 & np.concatenate([[True], ~is255[:-1]])
    starts_mask = np.zeros(len(stream), dtype=bool)
    starts_mask[str_bounds[:-1][str_bounds[:-1] < len(stream)]] = True
    run_start |= is255 & starts_mask
    ff = np.maximum.accumulate(np.where(run_start, idx, -1))
    in_run_pos = idx - ff
    is_escape = is255 & (in_run_pos % 2 == 0)
    is_literal_of_escape = np.zeros(len(stream), dtype=bool)
    esc_idx = np.flatnonzero(is_escape)
    is_literal_of_escape[np.minimum(esc_idx + 1, len(stream) - 1)] = True
    # units: every byte that is not a literal-of-escape emits output
    unit_mask = ~is_literal_of_escape
    unit_idx = np.flatnonzero(unit_mask)
    unit_codes = stream[unit_idx]
    unit_is_esc = is_escape[unit_idx]

    sym_lens = np.ones(256, dtype=np.int64)
    sym_mat = np.zeros((256, MAX_SYM_LEN), dtype="u1")
    for i, s in enumerate(table.symbols):
        sym_lens[i] = len(s)
        sym_mat[i, : len(s)] = np.frombuffer(s, dtype="u1")
    out_lens = np.where(unit_is_esc, 1, sym_lens[unit_codes])
    out_off = np.zeros(len(unit_idx) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_off[1:])
    total = int(out_off[-1])
    out = np.empty(total, dtype="u1")
    # symbols: gather rows of sym_mat
    sym_sel = np.flatnonzero(~unit_is_esc)
    if len(sym_sel):
        codes = unit_codes[sym_sel]
        L = sym_lens[codes]
        dst = np.repeat(out_off[sym_sel], L) + _ragged_arange(L)
        out[dst] = sym_mat[np.repeat(codes, L), _ragged_arange(L)]
    esc_sel = np.flatnonzero(unit_is_esc)
    if len(esc_sel):
        out[out_off[esc_sel]] = stream[unit_idx[esc_sel] + 1]

    # per-string output offsets: string boundaries (code-byte space) always
    # align with unit starts, so map them through searchsorted
    unit_at = np.searchsorted(unit_idx, str_bounds, side="left")
    return out_off[unit_at], out


def _ragged_arange(lengths: np.ndarray) -> np.ndarray:
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)


def fsst_sample_gain(offsets: np.ndarray, data: np.ndarray,
                     return_table: bool = False):
    """Fractional size reduction of FSST on a sample (None if no strings).
    With ``return_table`` also returns the trained SymbolTable for reuse."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n == 0 or offsets[-1] == 0:
        return (None, None) if return_table else None
    cut = max(1, min(int(np.searchsorted(offsets, SAMPLE_BYTES, side="right")), n))
    s_off = offsets[: cut + 1]
    s_data = np.ascontiguousarray(data[: int(s_off[-1])], dtype="u1")
    table = train(s_off, s_data)
    enc = fsst_encode(s_off, s_data, table=table)
    orig = int(s_off[-1]) + 2 * cut
    gain = 1.0 - len(enc) / max(orig, 1)
    return (gain, table) if return_table else gain
