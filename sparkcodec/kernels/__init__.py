"""Pure-numpy encoding kernels (no Spark dependency)."""

from .bitpack import bit_width, bit_widths, pack_bits_lsb, unpack_bits_lsb
from .delta import (
    delta_binary_pack,
    delta_binary_unpack,
    delta_for_pack,
    delta_for_unpack,
    for_pack,
    for_unpack,
)
from .dictionary import dict_indexes_decode, dict_indexes_encode, factorize
from .plain import (
    arrow_binary_from_buffers,
    binary_buffers,
    plain_decode_binary,
    plain_decode_bool,
    plain_decode_numeric,
    plain_encode_binary,
    plain_encode_bool,
    plain_encode_numeric,
)
from .rle import rle_hybrid_decode, rle_hybrid_encode
from .strings import (
    byte_stream_split_decode,
    byte_stream_split_encode,
    delta_byte_array_decode,
    delta_byte_array_encode,
    delta_length_decode,
    delta_length_encode,
)
from .varint import read_uvarint, unzigzag, write_uvarint, zigzag
