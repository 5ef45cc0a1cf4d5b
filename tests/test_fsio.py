"""fsio: metadata IO on URI-scheme (Hadoop FileSystem) paths.

`file:/...` URIs exercise the exact same JVM FileSystem code path as
hdfs:// / s3a:// — resolved through the active session's Hadoop conf —
without needing a cluster, so these tests are the sandbox evidence that
an hdfs:// --index-dir works end to end (metadata next to the parquet,
resume manifests included), per the round-3 advisory.
"""

import os

import pytest
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.sources import fsio


def test_is_remote():
    assert fsio.is_remote("hdfs:///x/y")
    assert fsio.is_remote("s3a://bucket/key")
    assert fsio.is_remote("file:/tmp/x")
    assert not fsio.is_remote("/tmp/x")
    assert not fsio.is_remote("relative/path")


def test_json_roundtrip_file_uri(spark, tmp_path):
    base = f"file:{tmp_path}/meta"
    p = f"{base}/stats.json"
    assert fsio.read_json(p) is None
    fsio.write_json(p, {"a": 1, "nested": {"b": [1, 2]}})
    assert fsio.read_json(p) == {"a": 1, "nested": {"b": [1, 2]}}
    # overwrite is atomic-publish (tmp + rename), second write wins
    fsio.write_json(p, {"a": 2})
    assert fsio.read_json(p) == {"a": 2}
    # and the bytes actually landed under the local dir the URI names
    assert os.path.exists(str(tmp_path / "meta" / "stats.json"))
    # the publish consumed the temp file (rename, not copy-and-forget):
    # a left-behind .tmp would mean the atomic path silently failed
    assert not os.path.exists(str(tmp_path / "meta" / "stats.json.tmp"))


def test_write_json_overwrite_never_leaves_dest_missing(spark, tmp_path):
    """Atomic-publish contract: overwriting an existing manifest keeps
    the destination continuously readable — the FileContext OVERWRITE
    rename replaces in one metadata op (no delete-then-rename window
    where read_json would see 'no manifest' and redo work, ADVICE r4)."""
    p = f"file:{tmp_path}/m/manifest.json"
    fsio.write_json(p, {"epoch": 1})
    for epoch in range(2, 6):
        fsio.write_json(p, {"epoch": epoch})
        got = fsio.read_json(p)
        assert got is not None and got["epoch"] == epoch
    assert not os.path.exists(str(tmp_path / "m" / "manifest.json.tmp"))


def test_listdir_isdir_rmtree_file_uri(spark, tmp_path):
    base = f"file:{tmp_path}/idx"
    fsio.write_json(f"{base}/_checkpoints/shard_0.json", {"s": 0})
    fsio.write_json(f"{base}/_checkpoints/shard_1.json", {"s": 1})
    assert fsio.isdir(f"{base}/_checkpoints")
    assert not fsio.isdir(f"{base}/_checkpoints/shard_0.json")  # a file
    assert not fsio.isdir(f"{base}/nope")
    assert fsio.listdir(f"{base}/_checkpoints") == [
        "shard_0.json",
        "shard_1.json",
    ]
    fsio.rmtree(f"{base}/_checkpoints")
    assert not fsio.isdir(f"{base}/_checkpoints")
    fsio.rmtree(f"{base}/_checkpoints")  # ignore-missing, like shutil


def test_index_build_on_file_uri(spark, small_corpus, tmp_path):
    """Full build → open → query on a URI index dir: metadata (stats.json,
    checkpoints) must land NEXT TO the parquet, resume must skip shards,
    and query results must equal the plain-local-path index's."""
    from project_gutenberg_full_text_search_spark.operators.bm25 import (
        IndexHandle,
        bm25_topk,
    )
    from project_gutenberg_full_text_search_spark.operators.build_index import (
        build_index,
    )

    uri_dir = f"file:{tmp_path}/uri_idx"
    build_index(
        spark, small_corpus, uri_dir, n_shards=2, input_fingerprint="uri-v1"
    )
    # metadata is on the target filesystem, not a literal "file:" local dir
    local_mirror = str(tmp_path / "uri_idx")
    assert os.path.exists(os.path.join(local_mirror, "stats.json"))
    assert os.path.exists(
        os.path.join(local_mirror, "_checkpoints", "shard_0.json")
    )
    assert not os.path.exists("file:")  # the failure mode being prevented

    h = IndexHandle.open(spark, uri_dir)
    assert h.stats["N"] == small_corpus.count()
    got = bm25_topk(h, "merge query", k=10).toPandas()
    assert len(got) == 10

    # resume: same fingerprint → shards skipped (manifests honored via fsio)
    stats2 = build_index(
        spark, small_corpus, uri_dir, n_shards=2, input_fingerprint="uri-v1"
    )
    assert stats2["N"] == h.stats["N"]


def test_ann_index_on_file_uri(spark, tmp_path):
    """write_ann_index/_ann_meta.json round-trips through fsio on URIs."""
    import numpy as np
    import pandas as pd

    from project_gutenberg_full_text_search_spark.operators import similarity

    rng = np.random.RandomState(3)
    M = rng.standard_normal((120, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(len(M)), "embedding": [r.tolist() for r in M]}
        )
    )
    path = f"file:{tmp_path}/ann_uri"
    similarity.write_ann_index(emb, path, dim=16, nbits=6, seed=11)
    assert os.path.exists(str(tmp_path / "ann_uri" / "_ann_meta.json"))
    topk = similarity.ann_index_topk(spark, path, M[0].tolist(), k=3).toPandas()
    assert topk.vec_id.iloc[0] == 0 and topk.cos.iloc[0] == 1.0


def test_incremental_refresh_on_file_uri(spark, small_corpus, tmp_path):
    """append_docs on a URI index dir: the _norms_stats manifest and
    refreshed stats.json go through fsio, N/avgdl update correctly."""
    from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle
    from project_gutenberg_full_text_search_spark.operators.build_index import (
        build_index,
    )
    from project_gutenberg_full_text_search_spark.streaming.incremental import (
        append_docs,
    )

    uri_dir = f"file:{tmp_path}/inc_idx"
    base = small_corpus.filter(F.col("doc_id") < 250)
    extra = small_corpus.filter(F.col("doc_id") >= 250)
    build_index(spark, base, uri_dir, input_fingerprint="inc-base")
    n_base = IndexHandle.open(spark, uri_dir).stats["N"]

    append_docs(spark, extra, uri_dir, shard_label="inc_epoch1")
    h = IndexHandle.open(spark, uri_dir)
    assert h.stats["N"] == small_corpus.count() and n_base < h.stats["N"]
    # manifest landed on the target fs (visible via the local mirror)
    assert os.path.exists(
        str(tmp_path / "inc_idx" / "_norms_stats" / "inc_epoch1.json")
    )
    # replay idempotency through fsio paths too
    append_docs(spark, extra, uri_dir, shard_label="inc_epoch1")
    assert IndexHandle.open(spark, uri_dir).stats["N"] == h.stats["N"]
