"""From-scratch snappy block codec (compress AND decompress).

Reference parity: the reference ships its own snappy compressor
(reference: src/snappy.js:26-253, greedy hash-table matcher emitting the
standard literal/copy element stream).  This is the Python counterpart,
written from the PUBLIC snappy block format description:

* preamble: uncompressed length as a little-endian varint;
* elements: tag byte whose low 2 bits select the type --
  00 literal (length-1 in the high 6 bits; values 60..63 mean the
  length-1 is in the next 1..4 little-endian bytes),
  01 copy with 1-byte offset (length 4..11, offset < 2048: high 3 bits
  of the 11-bit offset live in tag bits 5..7),
  10 copy with 2-byte little-endian offset (length 1..64),
  11 copy with 4-byte little-endian offset.

The greedy matcher hashes 4-byte windows; long matches are emitted as a
run of <=64-byte copies, the same element split rule every snappy
implementation uses so any decoder accepts the stream.

This is the PARITY implementation: chunk compression defaults to
pyarrow-native codecs (zstd/snappy/lz4) for the hot path -- register
"snappy_py" via :func:`sparkcodec.chunk.register_compressor` to use this
one end-to-end.  Cross-validated both directions against pyarrow's
native snappy in tests/test_kernels.py.
"""

from __future__ import annotations

_MIN_MATCH = 4
_MAX_COPY_LEN = 64
_MAX_OFFSET1 = 2048  # 11-bit offset for the 1-byte-offset copy


def _emit_uvarint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        # the preamble is a 32-bit length: 5 varint bytes max (shift 28 is
        # the last valid continuation), so a 6th byte is malformed even if
        # the end-of-stream length check would also catch it (ADVICE r4)
        if shift >= 35:
            raise ValueError("malformed snappy length varint")


def _emit_literal(out: bytearray, data: bytes, start: int, length: int) -> None:
    n = length - 1
    if n < 60:
        out.append(n << 2)
    else:
        nbytes = (n.bit_length() + 7) // 8
        out.append((59 + nbytes) << 2)
        out.extend(n.to_bytes(nbytes, "little"))
    out.extend(data[start:start + length])


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # standard split rule: long matches become a run of <=64-byte copies;
    # emit 60 before the final piece so the remainder stays >=4 (the
    # 1-byte-offset form cannot encode lengths under 4)
    while length >= 68:
        out.append(2 | ((64 - 1) << 2))
        out.extend(offset.to_bytes(2, "little"))
        length -= 64
    if length > 64:
        out.append(2 | ((60 - 1) << 2))
        out.extend(offset.to_bytes(2, "little"))
        length -= 60
    if length < 12 and offset < _MAX_OFFSET1:
        out.append(1 | ((length - 4) << 2) | ((offset >> 8) << 5))
        out.append(offset & 0xFF)
    else:
        out.append(2 | ((length - 1) << 2))
        out.extend(offset.to_bytes(2, "little"))


def snappy_compress(data: bytes) -> bytes:
    """Snappy block-format compression (greedy hash-table matcher)."""
    data = bytes(data)
    n = len(data)
    if n >= 1 << 32:
        raise ValueError("snappy blocks are capped at 2^32-1 bytes; "
                         "split the input")
    out = bytearray()
    _emit_uvarint(out, n)
    if n == 0:
        return bytes(out)
    # hash table: last position of each 4-byte window hash.  Offsets are
    # unbounded within the block (the 4-byte-offset form exists), but we
    # cap at 65535 so every copy fits the 2-byte form -- the same choice
    # the reference makes (it never emits 4-byte offsets either).
    # keyed by the exact 4-byte window value (int), NOT Python hash() --
    # hash() is per-process randomized, and the output bytes must be
    # deterministic (retried tasks atomically replace files relying on
    # identical re-produced bytes)
    table: dict[int, int] = {}
    ip = 0
    lit_start = 0
    while ip + _MIN_MATCH <= n:
        key = int.from_bytes(data[ip:ip + _MIN_MATCH], "little")
        cand = table.get(key)
        table[key] = ip
        if cand is not None and ip - cand < 0x10000:
            if ip > lit_start:
                _emit_literal(out, data, lit_start, ip - lit_start)
            # extend the match
            mlen = _MIN_MATCH
            while ip + mlen < n and data[cand + mlen] == data[ip + mlen]:
                mlen += 1
            _emit_copy(out, ip - cand, mlen)
            # index a couple of positions inside the match so immediately
            # repeating patterns keep matching
            for j in range(ip + 1, min(ip + mlen, n - _MIN_MATCH + 1),
                           max(1, mlen // 4)):
                table[int.from_bytes(data[j:j + _MIN_MATCH], "little")] = j
            ip += mlen
            lit_start = ip
        else:
            ip += 1
    if lit_start < n:
        _emit_literal(out, data, lit_start, n - lit_start)
    return bytes(out)


def snappy_decompress(comp: bytes) -> bytes:
    """Snappy block-format decompression (all four element types)."""
    try:
        return _decompress(bytes(comp))
    except IndexError:
        raise ValueError("corrupt snappy stream: truncated element") from None


def _decompress(comp: bytes) -> bytes:
    want, pos = _read_uvarint(comp, 0)
    out = bytearray()
    n = len(comp)

    def take(k: int, at: int) -> bytes:
        # slicing silently shortens past the end: a truncated offset or
        # length field would misparse as a smaller value (and could even
        # "succeed" with wrong bytes) instead of raising
        if at + k > n:
            raise ValueError("corrupt snappy stream: truncated element")
        return comp[at:at + k]

    while pos < n:
        tag = comp[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                nbytes = length - 60
                length = int.from_bytes(take(nbytes, pos), "little") + 1
                pos += nbytes
            out += take(length, pos)
            pos += length
            continue
        if kind == 1:
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | comp[pos]
            pos += 1
        elif kind == 2:
            length = (tag >> 2) + 1
            offset = int.from_bytes(take(2, pos), "little")
            pos += 2
        else:
            length = (tag >> 2) + 1
            offset = int.from_bytes(take(4, pos), "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt snappy stream: bad copy offset")
        # overlapping copies replicate byte-by-byte (offset < length is
        # legal and is how snappy encodes runs)
        start = len(out) - offset
        for i in range(length):
            out.append(out[start + i])
    if len(out) != want:
        raise ValueError(
            f"corrupt snappy stream: decoded {len(out)} bytes, "
            f"preamble said {want}")
    return bytes(out)
