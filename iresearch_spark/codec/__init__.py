from iresearch_spark.codec.vbyte import vbyte_encode, vbyte_decode
from iresearch_spark.codec.bitpack import bitpack, bitunpack
from iresearch_spark.codec.postings import (
    PostingList,
    encode_postings,
    decode_postings,
    decode_skip,
    decode_blockmax,
    encode_positions,
    decode_positions_for,
)

__all__ = [
    "vbyte_encode",
    "vbyte_decode",
    "bitpack",
    "bitunpack",
    "PostingList",
    "encode_postings",
    "decode_postings",
    "decode_skip",
    "decode_blockmax",
    "encode_positions",
    "decode_positions_for",
]
