"""Incremental index refresh — batch append + Structured Streaming driver.

The reference refreshes by rebuilding the whole materialized view
concurrently on a timer (tables/mv_books_dc.sql:502-514, README.md:80-91).
Ours is genuinely incremental: because the index is a set of posting
*segments* (disjoint doc batches concatenate freely — the same property
the block/shard build exploits), appending a new shard of posting blocks
for the new docs IS a refresh. Readers keep working throughout (new files
only become visible atomically per parquet commit).

- ``append_docs``: one batch of new docs → a new norms shard + a new
  postings shard, then refresh the small derived tables (stats, terms,
  trigram_terms).
- ``stream_refresh``: Structured Streaming file source →
  ``foreachBatch(append_docs)`` with checkpointing, so a crashed refresh
  resumes exactly-once per epoch.

Idempotency: foreachBatch is at-least-once, so BOTH writes of an epoch
(norms and postings) go to fixed per-shard paths with mode('overwrite') —
a replayed epoch rewrites its own shard instead of duplicating rows, which
would otherwise inflate N/avgdl and corrupt BM25 scores.

Scale notes: terms/trigram_terms are refreshed by a full re-aggregation
over postings metadata (term, n_docs, sum_tf — NOT the block payloads);
at 10^12-file scale this would move to a merge-on-read delta, which the
layout already permits (terms is derivable, never authoritative).
avgdl drift after a refresh is safe for block-max pruning: the query-time
upper bound is computed from per-block (max_tf, min_dl) with the CURRENT
stats.json avgdl (operators/bm25.py), never from a build-time-frozen
impact value.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.operators.build_index import (
    POSTINGS_SCHEMA,
    _encode_blocks_gen,
    block_key_expr,
    build_norms,
    ensure_doc_ids,
    read_norms,
    tbucket_col,
    tokenize_docs,
)
from project_gutenberg_full_text_search_spark.sources.tables import read_json, write_json


def refresh_derived(spark: SparkSession, index_dir: str) -> dict:
    """Recompute stats.json, terms/, trigram_terms/ from norms+postings."""
    from project_gutenberg_full_text_search_spark import BM25_B, BM25_K1
    from project_gutenberg_full_text_search_spark.functions.text import trigrams_col

    norms = read_norms(spark, index_dir)
    row = norms.agg(
        F.count("*").alias("N"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).collect()[0]
    old = read_json(os.path.join(index_dir, "stats.json")) or {}
    stats = {
        **old,
        "N": row["N"],
        "avgdl": float(row["avgdl"]),
        "total_tokens": row["total_tokens"],
        "k1": BM25_K1,
        "b": BM25_B,
    }
    from pyspark.sql import Observation

    base = os.path.join(index_dir, "postings")
    postings = spark.read.option("basePath", base).parquet(base)
    terms = postings.groupBy("term").agg(
        F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("cf")
    )
    t_obs = Observation("n_terms_refresh")
    terms.observe(t_obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "terms"))
    terms_df = spark.read.parquet(os.path.join(index_dir, "terms"))
    tri = (
        terms_df.select("term", "df", trigrams_col("term").alias("trigrams"))
        .withColumn("n_trigrams", F.size("trigrams"))
        .select("term", "df", "n_trigrams", F.explode("trigrams").alias("trigram"))
    )
    tri.write.mode("overwrite").parquet(os.path.join(index_dir, "trigram_terms"))
    stats["n_terms"] = t_obs.get["n"]
    write_json(os.path.join(index_dir, "stats.json"), stats)
    return stats


def append_docs(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    shard_label: str,
    text_col: str = "content",
    refresh: bool = True,
) -> None:
    """Append one batch of docs as a new postings shard + norms rows."""
    new_docs = ensure_doc_ids(new_docs)
    stats = read_json(os.path.join(index_dir, "stats.json"))
    if stats is None:
        raise FileNotFoundError(f"no base index at {index_dir} — build_index first")
    block_range = stats.get("block_range", 4096)
    norms = build_norms(new_docs, text_col)
    # overwrite into a fixed per-shard path (NOT append to the root): an
    # at-least-once epoch replay rewrites the same shard idempotently.
    norms.write.mode("overwrite").parquet(
        os.path.join(index_dir, "norms", f"shard={shard_label}")
    )

    tbucket_expr = tbucket_col()
    tokens = (
        tokenize_docs(new_docs, text_col)
        .withColumn("block_key", block_key_expr(block_range))
        .withColumn("tbucket", tbucket_expr)
    )
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    blocks = (
        tokens.repartition(n_part, "tbucket", "block_key")
        .sortWithinPartitions("tbucket", "term", "block_key", "doc_id")
        .drop("tbucket")
        .mapInPandas(_encode_blocks_gen(stats["avgdl"]), schema=POSTINGS_SCHEMA)
        .withColumn("tbucket", tbucket_expr)
    )
    out = os.path.join(index_dir, "postings", f"shard={shard_label}")
    (
        blocks.sortWithinPartitions("tbucket", "term", "block_key")
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(out)
    )
    if refresh:
        refresh_derived(spark, index_dir)


def stream_refresh(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "content",
    available_now: bool = True,
):
    """Structured Streaming refresh loop over a parquet drop directory.

    Each epoch appends a shard named ``inc_<epoch>``; the streaming
    checkpoint gives exactly-once epochs across restarts (the streaming
    analog of the build's _checkpoints manifests).
    """
    stream = spark.readStream.schema(schema).parquet(input_path)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_docs(
            spark, batch_df, index_dir, f"inc_{epoch_id}", text_col=text_col
        )

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    trigger = {"availableNow": True} if available_now else {"processingTime": "30 seconds"}
    return writer.trigger(**trigger).start()
