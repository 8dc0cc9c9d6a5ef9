"""Delta-varint postings codec (kernels/varint.py): round-trips,
boundaries, error paths, size formula, hypothesis sweep."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from paddleocr_spark.kernels.varint import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
    varint_len,
)


@pytest.mark.parametrize(
    "v,size",
    [
        (0, 1),
        (127, 1),
        (128, 2),
        (16383, 2),
        (16384, 3),
        (2097151, 3),
        (2097152, 4),
        (268435455, 4),
        (268435456, 5),
        ((1 << 35) - 1, 5),
    ],
)
def test_varint_boundaries(v, size):
    enc = varint_encode(v)
    assert len(enc) == size == varint_len(v)
    assert varint_decode(enc) == (v, size)


def test_varint_rejects_oversize_and_truncation():
    with pytest.raises(ValueError, match="5 bytes"):
        varint_decode(varint_encode(1 << 35))
    with pytest.raises(ValueError, match="truncated"):
        varint_decode(b"\x80")


def test_postings_roundtrip_and_small_gap_density():
    ids = [3, 4, 5, 100, 101, 5000, 1_000_000]
    blob = encode_postings(ids)
    assert decode_postings(blob) == ids
    # dense run costs 1 byte per posting
    dense = encode_postings(list(range(1000, 1100)))
    assert len(dense) == varint_len(1000) + 99


def test_postings_rejects_disorder():
    with pytest.raises(ValueError, match="strictly increasing"):
        encode_postings([5, 5])
    with pytest.raises(ValueError, match="strictly increasing"):
        encode_postings([5, 3])
    assert encode_postings([]) == b""
    assert decode_postings(b"") == []


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 34)),
        max_size=60,
        unique=True,
    )
)
def test_postings_roundtrip_property(ids):
    ids = sorted(ids)
    blob = encode_postings(ids)
    assert decode_postings(blob) == ids
    gaps = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])] if ids else []
    assert len(blob) == sum(varint_len(g) for g in gaps)


def test_varint_rejects_non_canonical_encoding():
    """decode must be the exact inverse of encode: b'\\x80\\x00' is a
    redundant-continuation spelling of 0 that encode never emits."""
    from paddleocr_spark.kernels.varint import varint_decode, varint_encode

    with pytest.raises(ValueError, match="non-canonical"):
        varint_decode(b"\x80\x00")
    with pytest.raises(ValueError, match="non-canonical"):
        varint_decode(b"\xff\x80\x00")
    # the canonical single-byte zero still decodes
    assert varint_decode(b"\x00") == (0, 1)
    # round-trip across the boundary values stays exact
    for v in (0, 1, 127, 128, 16383, 16384, 2**34 - 1):
        assert varint_decode(varint_encode(v)) == (v, len(varint_encode(v)))
