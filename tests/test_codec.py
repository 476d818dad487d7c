"""Codec round-trip + byte-compatibility with the reference encodings
(``selfindex_z1_simple_compression.py:18-83``,
``selfindex_z2_lib_compression.py:20-65``)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_ray.functions.vbyte import (
    decode_postings,
    decode_tfs,
    encode_postings,
    encode_tfs,
    ref_encode_delta,
    ref_zlib_encode_delta,
    vbyte_decode,
    vbyte_encode,
    zlib_decode_postings,
    zlib_encode_postings,
)

FIXED = [
    [0],
    [0, 1, 2],
    [5, 1000, 2**20, 2**30],
    [1],
    [127, 128, 129],
    [2**31 - 1, 2**31],
    list(range(100)),
]


def test_recorded_vectors_byte_compat():
    # reference semantics: 0 -> 0x80; 7-bit big-endian groups, high bit on
    # the LAST byte; delta with absolute first element
    assert vbyte_encode(np.array([0])) == b"\x80"
    assert vbyte_encode(np.array([1])) == b"\x81"
    assert vbyte_encode(np.array([127])) == b"\xff"
    assert vbyte_encode(np.array([128])) == b"\x01\x80"
    assert encode_postings(np.array([5, 1000, 2**20])) == ref_encode_delta(
        [5, 1000, 2**20]
    )


def test_fixed_round_trips():
    for case in FIXED:
        a = np.array(case, dtype=np.int64)
        enc = encode_postings(a)
        assert enc == ref_encode_delta(case)
        assert np.array_equal(decode_postings(enc), a)
        z = zlib_encode_postings(a)
        assert z == ref_zlib_encode_delta(case)
        assert np.array_equal(zlib_decode_postings(z), a)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=200)
)
def test_vbyte_roundtrip_property(values):
    a = np.array(values, dtype=np.int64)
    assert np.array_equal(vbyte_decode(vbyte_encode(a)), a)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**31 - 1),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
def test_postings_roundtrip_and_cross_codec_agreement(values):
    sorted_vals = np.array(sorted(values), dtype=np.int64)
    v = decode_postings(encode_postings(sorted_vals))
    z = zlib_decode_postings(zlib_encode_postings(sorted_vals))
    # z1-vs-z2 cross-agreement (reference ``verify_compression.py:104``)
    assert np.array_equal(v, z)
    assert np.array_equal(v, sorted_vals)


def test_tf_codec():
    tfs = np.array([1, 5, 1, 300, 2, 1], dtype=np.int64)
    assert np.array_equal(decode_tfs(encode_tfs(tfs)), tfs)


def test_compression_shrinks_dense_lists():
    # size-accounting invariant (reference ``verify_compression.py:24-27``)
    a = np.arange(0, 100_000, 7, dtype=np.int64)
    assert len(encode_postings(a)) < a.size * 8
