"""Round-6 optimization equivalence tests.

Every optimization that changed an operator's internals gets a focused
equality assertion against the formulation it replaced:

* ``delta_decode_segments`` ≡ per-group ``delta_decode`` (randomized
  groups incl. empty groups and multi-byte varints);
* ``fold_dots_np`` / ``cosine_topk(method='fold')`` /
  ``with_ivf_cell(method='fold')`` ≡ the Catalyst expression path
  (bit-identical doubles → row-identical output);
* restructured ``chunk_windows`` still matches a reference Python
  chunker on edge shapes (empty docs, tail chunks, stride == window).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.codec import (
    delta_decode,
    delta_decode_segments,
    delta_encode,
)


def test_delta_decode_segments_matches_per_group():
    rng = np.random.RandomState(7)
    for trial in range(20):
        groups = []
        for _ in range(rng.randint(0, 12)):
            n = rng.randint(0, 50)
            vals = np.cumsum(rng.randint(1, 1 << rng.choice([3, 9, 17, 40]), size=n).astype(np.uint64))
            groups.append(vals)
        bufs = [delta_encode(g) for g in groups]
        seg_lens = np.array([len(b) for b in bufs], dtype=np.int64)
        flat, counts = delta_decode_segments(b"".join(bufs), seg_lens)
        assert list(counts) == [len(g) for g in groups]
        off = 0
        for g, c in zip(groups, counts):
            np.testing.assert_array_equal(flat[off : off + c], g)
            off += c


def test_delta_decode_segments_empty():
    flat, counts = delta_decode_segments(b"", np.array([], dtype=np.int64))
    assert len(flat) == 0 and len(counts) == 0
    flat, counts = delta_decode_segments(b"", np.array([0, 0], dtype=np.int64))
    assert list(counts) == [0, 0]


def test_fold_dots_bit_identical_to_scalar_fold():
    from project_gutenberg_full_text_search_spark.operators.similarity import (
        fold_dots_np,
        fold_self_dot_np,
    )

    rng = np.random.RandomState(3)
    vs = rng.standard_normal((37, 64))
    W = rng.standard_normal((5, 64))
    got = fold_dots_np(vs, W)
    for i in range(vs.shape[0]):
        for j in range(W.shape[0]):
            acc = 0.0
            for d in range(64):
                acc += float(W[j, d]) * float(vs[i, d])
            # scalar fold multiplies w*x; the batch kernel computes x*w —
            # IEEE multiplication is commutative-exact, so require ==
            assert got[i, j] == acc
    self_d = fold_self_dot_np(vs)
    for i in range(vs.shape[0]):
        acc = 0.0
        for d in range(64):
            acc += float(vs[i, d]) * float(vs[i, d])
        assert self_d[i] == acc


@pytest.fixture(scope="module")
def spark():
    from project_gutenberg_full_text_search_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4, app_name="t_r06")


def _toy_embeddings(spark, n=200, dim=16, seed=11):
    rng = np.random.RandomState(seed)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_fold_equals_expr(spark):
    from project_gutenberg_full_text_search_spark.operators.similarity import (
        cosine_topk,
    )

    emb = _toy_embeddings(spark)
    q = [float(x) for x in np.random.RandomState(5).standard_normal(16)]
    a = cosine_topk(emb, q, k=20, method="expr").collect()
    b = cosine_topk(emb, q, k=20, method="fold").collect()
    assert a == b


def test_ivf_cell_fold_equals_expr(spark):
    from project_gutenberg_full_text_search_spark.operators import ivf

    emb = _toy_embeddings(spark)
    C = ivf.seeded_centroids(16, 8, 42)
    a = (
        ivf.with_ivf_cell(emb, "embedding", C, "cell", method="expr")
        .select("vec_id", "cell")
        .collect()
    )
    b = (
        ivf.with_ivf_cell(emb, "embedding", C, "cell", method="fold")
        .select("vec_id", "cell")
        .collect()
    )
    assert sorted(a) == sorted(b)


def _py_chunks(text, window, stride):
    ws = [w for w in text.split() if w]
    out = []
    if not ws:
        return out
    n = len(ws)
    cid = 0
    start = 0
    while True:
        chunk = ws[start : start + window]
        out.append((cid, min(window, n - start), " ".join(chunk)))
        if start + window >= n:
            break
        cid += 1
        start += stride
    return out


@pytest.mark.parametrize("window,stride", [(5, 3), (4, 4), (10, 1)])
def test_chunk_windows_matches_python_reference(spark, window, stride):
    from project_gutenberg_full_text_search_spark.operators.etl import chunk_windows

    texts = [
        (0, ""),
        (1, "a"),
        (2, "one two three four five six seven eight nine ten eleven"),
        (3, "  padded   spacing   tokens  "),
        (4, " ".join(f"w{i}" for i in range(23))),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_windows(df, window, stride).collect()
    )
    want = sorted(
        (i, cid, nt, ct)
        for i, text in texts
        for cid, nt, ct in _py_chunks(text, window, stride)
    )
    assert got == want


def test_no_python_udf_anywhere():
    """VERDICT r5 #4: no row-at-a-time F.udf in the package (the champion
    idf was the last one; it now computes inside the decode pass)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / (
        "project_gutenberg_full_text_search_spark"
    )
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        if "F.udf(" in src or "functions.udf(" in src:
            offenders.append(str(p))
    assert not offenders, f"Python UDFs found in: {offenders}"


def test_fuzzy_count_membership_only(spark):
    """fuzzy_count must not carry the sim payload (membership-only plan)
    and must equal the decoded-path count."""
    import tempfile

    from project_gutenberg_full_text_search_spark.corpus import gen_corpus
    from project_gutenberg_full_text_search_spark.operators.build_index import (
        build_index,
    )
    from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle
    from project_gutenberg_full_text_search_spark.operators import fuzzy

    d = tempfile.mkdtemp(prefix="pgfts_fzc_")
    build_index(spark, gen_corpus(spark, 300, seed=3), d, input_fingerprint="fzc")
    h = IndexHandle.open(spark, d)
    cand = fuzzy._capped_terms(h, "querry", fuzzy.DEFAULT_SIM_THRESHOLD).select("term")
    from pyspark.sql import types as T

    decoded = h.decode_for(cand, T.StructType([]))
    assert "sim" not in decoded.columns
    got = fuzzy.fuzzy_count(h, "querry")
    want = (
        fuzzy.fuzzy_candidates(h, "querry").select("doc_id").distinct().count()
    )
    assert got == want
