import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from project_gutenberg_full_text_search_spark.functions.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_simple():
    a = np.array([0, 1, 127, 128, 300, 2**20, 2**35, 2**63 - 1], dtype=np.uint64)
    assert (varint_decode(varint_encode(a)) == a).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_single_byte_values():
    a = np.arange(128, dtype=np.uint64)
    buf = varint_encode(a)
    assert len(buf) == 128  # all one-byte
    assert (varint_decode(buf) == a).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_property(xs):
    a = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(a)) == a).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True
    )
)
def test_delta_roundtrip_property(xs):
    a = np.array(sorted(xs), dtype=np.uint64)
    assert (delta_decode(delta_encode(a)) == a).all()


def test_delta_compression_is_small():
    # dense sorted ids → ~1 byte per id
    a = np.arange(10_000, dtype=np.uint64) * 3
    buf = delta_encode(a)
    assert len(buf) < 11_000
