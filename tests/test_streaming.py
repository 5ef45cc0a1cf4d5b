"""Incremental refresh: appended docs are searchable and rank-identical to
a full rebuild (the assert-ful analog of the reference's concurrent
refresh behavior, mv_books_dc.sql:502-514)."""

import os
import shutil
import tempfile

import pytest

from project_gutenberg_full_text_search_spark.corpus import DOCS_SCHEMA, gen_corpus
from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle, bm25_topk
from project_gutenberg_full_text_search_spark.operators.build_index import build_index
from project_gutenberg_full_text_search_spark.streaming import append_docs, stream_refresh


@pytest.fixture(scope="module")
def split_corpus(spark):
    full = gen_corpus(spark, 200, seed=42).cache()
    base = full.filter("doc_id < 120").cache()
    extra = full.filter("doc_id >= 120").cache()
    return full, base, extra


def _topk(spark, d, q="merge query", k=15):
    h = IndexHandle.open(spark, d)
    return bm25_topk(h, q, k=k).toPandas()


def test_batch_append_matches_full_rebuild(spark, split_corpus):
    full, base, extra = split_corpus
    d_inc = tempfile.mkdtemp(prefix="pgfts_inc_")
    d_full = tempfile.mkdtemp(prefix="pgfts_full_")
    try:
        build_index(spark, base, d_inc, input_fingerprint="base120")
        append_docs(spark, extra, d_inc, "inc_0")
        build_index(spark, full, d_full, input_fingerprint="full200")
        for q in ["merge query", "index", '"delta varint compression"', "uniq_150_0"]:
            a = _topk(spark, d_inc, q)
            b = _topk(spark, d_full, q)
            assert a.doc_id.tolist() == b.doc_id.tolist(), q
            assert a.score.tolist() == b.score.tolist(), q
    finally:
        shutil.rmtree(d_inc, ignore_errors=True)
        shutil.rmtree(d_full, ignore_errors=True)


def test_stream_refresh_available_now(spark, split_corpus):
    full, base, extra = split_corpus
    d = tempfile.mkdtemp(prefix="pgfts_stream_")
    drop = tempfile.mkdtemp(prefix="pgfts_drop_")
    ck = tempfile.mkdtemp(prefix="pgfts_ck_")
    try:
        build_index(spark, base, d, input_fingerprint="base120")
        extra.write.mode("overwrite").parquet(os.path.join(drop, "batch1"))
        q = stream_refresh(
            spark, os.path.join(drop, "batch1"), d, ck, schema=DOCS_SCHEMA
        )
        q.awaitTermination(120)
        # new-doc unique term now searchable
        hits = _topk(spark, d, "uniq_150_0", k=5)
        assert hits.doc_id.tolist() == [150]
        # restart with same checkpoint: no duplicate ingestion
        q2 = stream_refresh(
            spark, os.path.join(drop, "batch1"), d, ck, schema=DOCS_SCHEMA
        )
        q2.awaitTermination(120)
        h = IndexHandle.open(spark, d)
        assert h.stats["N"] == 200
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(drop, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_epoch_replay_idempotent(spark, split_corpus):
    """foreachBatch is at-least-once: re-running the same epoch (same
    shard label) must not duplicate norms rows or shift stats/scores."""
    full, base, extra = split_corpus
    d = tempfile.mkdtemp(prefix="pgfts_replay_")
    try:
        build_index(spark, base, d, input_fingerprint="base120")
        append_docs(spark, extra, d, "inc_0")
        h1 = IndexHandle.open(spark, d)
        n1, avgdl1 = h1.stats["N"], h1.stats["avgdl"]
        top1 = _topk(spark, d)
        # simulate a crash between write and checkpoint commit → replay
        append_docs(spark, extra, d, "inc_0")
        h2 = IndexHandle.open(spark, d)
        assert h2.stats["N"] == n1 == 200
        assert h2.stats["avgdl"] == avgdl1
        top2 = _topk(spark, d)
        assert top1.doc_id.tolist() == top2.doc_id.tolist()
        assert top1.score.tolist() == top2.score.tolist()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_incremental_epoch_is_shard_sized(spark, split_corpus):
    """Merge-on-read derived tables: an epoch writes ONLY its own shard's
    partial aggregates (terms/shard=<label>, trigram_terms/shard=<label>,
    _norms_stats/<label>.json) and leaves the base shard's files
    untouched — the 10^12-scale property that a refresh costs shard-sized
    work, not a corpus re-aggregation."""
    full, base, extra = split_corpus
    d = tempfile.mkdtemp(prefix="pgfts_mor_")
    try:
        build_index(spark, base, d, input_fingerprint="base120")
        base_terms_dir = os.path.join(d, "terms", "shard=0")
        assert os.path.isdir(base_terms_dir)
        before = {
            f: os.path.getmtime(os.path.join(base_terms_dir, f))
            for f in os.listdir(base_terms_dir)
        }
        append_docs(spark, extra, d, "inc_0")
        # epoch created its own shard partials...
        assert os.path.isdir(os.path.join(d, "terms", "shard=inc_0"))
        assert os.path.isdir(os.path.join(d, "trigram_terms", "shard=inc_0"))
        assert os.path.exists(os.path.join(d, "_norms_stats", "inc_0.json"))
        # ...and did not rewrite the base shard's term files
        after = {
            f: os.path.getmtime(os.path.join(base_terms_dir, f))
            for f in os.listdir(base_terms_dir)
        }
        assert before == after
        # merged stats are exact: N and avgdl match the full corpus
        h = IndexHandle.open(spark, d)
        assert h.stats["N"] == 200
        # merged term df: lazily-summed view equals a full rebuild's
        d_full = tempfile.mkdtemp(prefix="pgfts_mor_full_")
        try:
            build_index(spark, full, d_full, input_fingerprint="full200")
            inc_df = {
                r["term"]: r["df"] for r in h.terms().collect()
            }
            full_df = {
                r["term"]: r["df"]
                for r in IndexHandle.open(spark, d_full).terms().collect()
            }
            assert inc_df == full_df
        finally:
            shutil.rmtree(d_full, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pruning_safe_after_avgdl_drift(spark, split_corpus):
    """Block-max pruning must stay exact when appended docs shift avgdl:
    the per-block upper bound is derived from (max_tf, min_dl) with the
    refreshed avgdl, never from a build-time-frozen impact."""
    full, base, extra = split_corpus
    d = tempfile.mkdtemp(prefix="pgfts_drift_")
    try:
        build_index(spark, base, d, input_fingerprint="base120")
        append_docs(spark, extra, d, "inc_0")
        h = IndexHandle.open(spark, d)
        for q in ["merge query", "index", "index or query"]:
            pruned = bm25_topk(h, q, k=15, prune=True).toPandas()
            exact = bm25_topk(h, q, k=15, prune=False).toPandas()
            assert pruned.doc_id.tolist() == exact.doc_id.tolist(), q
            assert pruned.score.tolist() == exact.score.tolist(), q
    finally:
        shutil.rmtree(d, ignore_errors=True)
