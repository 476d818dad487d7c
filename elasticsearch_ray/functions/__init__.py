from .vbyte import (
    decode_postings,
    decode_tfs,
    delta_decode,
    delta_encode,
    encode_postings,
    encode_tfs,
    vbyte_decode,
    vbyte_encode,
    vbyte_encode_with_lengths,
    zlib_decode_postings,
    zlib_encode_postings,
)

__all__ = [
    "decode_postings",
    "decode_tfs",
    "delta_decode",
    "delta_encode",
    "encode_postings",
    "encode_tfs",
    "vbyte_decode",
    "vbyte_encode",
    "vbyte_encode_with_lengths",
    "zlib_decode_postings",
    "zlib_encode_postings",
]
