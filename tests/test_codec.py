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


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_delta_encode_grouped_equals_per_group(groups):
    """delta_encode_grouped byte output ≡ concatenated per-group encodes."""
    from project_gutenberg_full_text_search_spark.functions.codec import (
        delta_encode_grouped,
    )

    groups = [sorted(g) for g in groups]
    flat = np.array([x for g in groups for x in g], dtype=np.uint64)
    starts = np.cumsum([0] + [len(g) for g in groups[:-1]]).astype(np.int64)
    buf, gs, ge = delta_encode_grouped(flat, starts)
    for g, s, e in zip(groups, gs.tolist(), ge.tolist()):
        assert buf[s:e] == delta_encode(np.array(g, dtype=np.uint64))


@settings(max_examples=50, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
    ).filter(lambda s: "'" not in s and "\\" not in s),
    st.integers(min_value=0, max_value=63),
)
def test_minhash_lane_hash_cross_engine_property(s, seed):
    """Python lane hash ≡ the generated DuckDB fragment for any string."""
    import duckdb

    from project_gutenberg_full_text_search_spark.functions.hashing import (
        minhash_hash_py,
        minhash_hash_sql,
    )

    frag = minhash_hash_sql(f"'{s}'", seed)
    assert duckdb.sql(f"SELECT {frag}").fetchone()[0] == minhash_hash_py(s, seed)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=16,
    ),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=5),
)
def test_hyperplane_bucket_cross_engine_property(vec, nbits, seed):
    """Python bucket ≡ the generated DuckDB bucket for any float vector
    (the order-stable chained-sum construction is what makes this hold)."""
    import duckdb

    from project_gutenberg_full_text_search_spark.operators.similarity import (
        hyperplane_bucket_py,
        hyperplane_bucket_sql,
        hyperplane_matrix,
    )

    planes = hyperplane_matrix(len(vec), nbits, seed)
    frag = hyperplane_bucket_sql("v", planes)
    lit = "[" + ", ".join(repr(float(np.float32(x))) for x in vec) + "]::DOUBLE[]"
    duck = duckdb.sql(f"SELECT {frag} FROM (SELECT {lit} AS v)").fetchone()[0]
    assert duck == hyperplane_bucket_py([float(np.float32(x)) for x in vec], planes)
