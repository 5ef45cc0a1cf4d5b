import json
import os
import shutil
import tempfile

import numpy as np
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.codec import (
    delta_decode,
    varint_decode,
)
from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle
from project_gutenberg_full_text_search_spark.operators.build_index import (
    build_index,
    tokenize_docs,
)


def test_corpus_determinism(small_corpus, small_corpus_pdf):
    got = small_corpus.orderBy("doc_id").toPandas()
    assert got["sha256"].tolist() == small_corpus_pdf["sha256"].tolist()
    assert got["repo"].tolist() == small_corpus_pdf["repo"].tolist()


def test_sha256_invariant(spark, small_corpus, index_dir):
    """Per-row invariant (BASELINE.json:15): engine-computed sha256(content)
    equals the generator's sha256, for every row, distributed."""
    from project_gutenberg_full_text_search_spark.operators.build_index import read_norms

    norms = read_norms(spark, index_dir)
    bad = norms.filter(F.col("sha256") != F.col("sha256_given")).count()
    assert bad == 0


def test_tokenize_docs_matches_oracle(spark, small_corpus, oracle):
    tk = tokenize_docs(small_corpus).toPandas()
    # doc 0: term→tf must equal oracle Counter
    d0 = tk[tk.doc_id == 0].set_index("term")["tf"].to_dict()
    assert d0 == dict(oracle.tf[0])
    dl0 = tk[tk.doc_id == 0]["dl"].iloc[0]
    assert dl0 == oracle.dl[0]


def test_stats(index_dir, oracle):
    stats = json.load(open(os.path.join(index_dir, "stats.json")))
    assert stats["N"] == oracle.N
    assert abs(stats["avgdl"] - oracle.avgdl) < 1e-9


def test_terms_df_matches_oracle(spark, index_dir, oracle):
    # merge-on-read: per-shard partial aggregates summed lazily
    terms = IndexHandle.open(spark, index_dir).terms().toPandas()
    got = terms.set_index("term")["df"].to_dict()
    assert got == dict(oracle.df)


def test_postings_roundtrip(spark, index_dir, oracle):
    """Decode every block of a hot term; union must equal oracle postings."""
    h = IndexHandle.open(spark, index_dir)
    term = "index"  # vocabulary rank 0 → hot
    rows = h.blocks_for([term]).collect()
    assert len(rows) >= 2  # multi-block (block_range=64, 300 docs, 2 shards)
    seen = {}
    for r in rows:
        ids = delta_decode(r["doc_ids_bin"])
        tfs = varint_decode(r["tfs_bin"])
        dls = varint_decode(r["dls_bin"])
        assert (np.diff(ids.astype(np.int64)) > 0).all()  # sorted within block
        for i, t, d in zip(ids, tfs, dls):
            assert i not in seen
            seen[int(i)] = (int(t), int(d))
    expect = {
        i: (oracle.tf[i][term], oracle.dl[i])
        for i in oracle.doc_ids
        if oracle.tf[i].get(term)
    }
    assert seen == expect


def test_positions_roundtrip(spark, index_dir, oracle):
    h = IndexHandle.open(spark, index_dir)
    term = "merge"
    dec = h.decode([term], with_positions=True).toPandas()
    for r in dec.itertuples(index=False):
        toks = oracle.tokens[r.doc_id]
        expect = [p for p, t in enumerate(toks) if t == term]
        assert list(r.positions) == expect


def test_resume_skips_completed_shards(spark, small_corpus):
    d = tempfile.mkdtemp(prefix="pgfts_resume_")
    try:
        build_index(spark, small_corpus, d, n_shards=2, input_fingerprint="fp1")
        m0 = json.load(open(os.path.join(d, "_checkpoints", "shard_0.json")))
        # rerun: same fingerprint → no rebuild (manifest timestamps unchanged)
        build_index(spark, small_corpus, d, n_shards=2, input_fingerprint="fp1")
        m1 = json.load(open(os.path.join(d, "_checkpoints", "shard_0.json")))
        assert m0["completed_at"] == m1["completed_at"]
        # changed fingerprint → rebuild
        build_index(spark, small_corpus, d, n_shards=2, input_fingerprint="fp2")
        m2 = json.load(open(os.path.join(d, "_checkpoints", "shard_0.json")))
        assert m2["completed_at"] != m1["completed_at"]
        assert m2["fingerprint"] == "fp2"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rebuild_clears_stale_layouts(spark, small_corpus):
    """A fingerprint-mismatch rebuild must clear stale norms/postings
    layouts: flat pre-shard norms parquet (format v1) breaks partition
    discovery, and leftover incremental shards from the old fingerprint
    would double-count into stats/terms."""
    from project_gutenberg_full_text_search_spark.operators.build_index import read_norms

    d = tempfile.mkdtemp(prefix="pgfts_stale_")
    try:
        build_index(spark, small_corpus, d, input_fingerprint="fpA")
        # simulate a v1 flat-layout leftover + a stale incremental shard
        small_corpus.limit(3).select("doc_id").write.mode("overwrite").parquet(
            os.path.join(d, "norms_flat_tmp")
        )
        for f in os.listdir(os.path.join(d, "norms_flat_tmp")):
            shutil.copy(
                os.path.join(d, "norms_flat_tmp", f),
                os.path.join(d, "norms", f),
            )
        os.makedirs(os.path.join(d, "postings", "shard=inc_99", "tbucket=0"))
        build_index(spark, small_corpus, d, input_fingerprint="fpB")
        n = read_norms(spark, d).count()
        assert n == small_corpus.count()
        assert not os.path.exists(os.path.join(d, "postings", "shard=inc_99"))
        stats = json.load(open(os.path.join(d, "stats.json")))
        assert stats["N"] == small_corpus.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_metrics_written(index_dir):
    m = json.load(open(os.path.join(index_dir, "_metrics", "summary.json")))
    assert m["n_docs"] == 300
    assert m["docs_per_sec"] > 0
    s0 = json.load(open(os.path.join(index_dir, "_metrics", "shard_0.json")))
    assert s0["postings"] > 0 and s0["compressed_bytes"] > 0
