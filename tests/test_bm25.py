"""Rank-identity tests: distributed BM25 vs brute-force oracle.

The query matrix mirrors the reference smoke harness
(/root/reference/search/test.py:49-113): single term, AND, OR, NOT,
phrase, hot term, rare term, absent term, counts, pagination.
"""

import pandas as pd
import pytest

from project_gutenberg_full_text_search_spark.operators.bm25 import (
    IndexHandle,
    bm25_count,
    bm25_topk,
)

QUERIES = [
    "index",                      # hot single term
    "query merge",                # AND
    "index or query",             # OR
    "index -cache",               # NOT
    "uniq_5_0",                   # rare unique term
    "token block score",          # 3-way AND
    "merge or uniq_7_0",          # OR with rare
    '"merge sorted posting lists"',   # planted phrase
    '"block max wand"',           # phrase prefix of planted
    "zzz_not_in_corpus or index", # absent term in OR
    "def return",                 # lang keywords
]


@pytest.fixture(scope="module")
def handle(spark, index_dir):
    return IndexHandle.open(spark, index_dir)


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identity(handle, oracle, q):
    k = 25
    got = bm25_topk(handle, q, k=k).toPandas()
    exp = oracle.search(q, k=k)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist(), f"docs differ for {q!r}"
    assert got["score"].tolist() == pytest.approx(exp["score"].tolist(), abs=1e-4)


@pytest.mark.parametrize("q", ["index", "query merge", "index -cache", '"merge sorted posting lists"'])
def test_count_matches_oracle(handle, oracle, q):
    assert bm25_count(handle, q) == oracle.count(q)


def test_absent_term_empty(handle):
    assert bm25_topk(handle, "zzz_not_in_corpus", k=10).count() == 0


def test_pagination_slices_consistently(handle, oracle):
    q = "index merge"
    full = bm25_topk(handle, q, k=30).toPandas()
    page2 = bm25_topk(handle, q, k=10, offset=10).toPandas()
    assert page2["doc_id"].tolist() == full["doc_id"].tolist()[10:20]


@pytest.mark.parametrize("q", QUERIES)
def test_pruned_rank_identity(handle, oracle, q):
    """Block-max pruning must be invisible: forced-prune top-k equals the
    oracle exactly (same matrix as the unpruned test)."""
    got = bm25_topk(handle, q, k=15, prune=True).toPandas()
    exp = oracle.search(q, k=15)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist(), f"docs differ for {q!r}"
    assert got["score"].tolist() == pytest.approx(exp["score"].tolist(), abs=1e-4)


def test_pruned_pagination(handle, oracle):
    q = "index merge"
    full = bm25_topk(handle, q, k=30, prune=True).toPandas()
    page2 = bm25_topk(handle, q, k=10, offset=10, prune=True).toPandas()
    assert page2["doc_id"].tolist() == full["doc_id"].tolist()[10:20]


def test_determinism_across_runs(handle):
    q = "index or query"
    a = bm25_topk(handle, q, k=20).toPandas()
    b = bm25_topk(handle, q, k=20).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_blockagg_block_keys_dataframe_matches_list(handle, spark):
    """Restricting blockagg by a block_key DATAFRAME must equal the same
    restriction by a python list — regression for a partitioning hazard:
    Catalyst planned the semi join sort-merge (output hash-partitioned by
    block_key), elided the explicit repartition as redundant, then AQE
    swapped in a broadcast join at runtime, leaving NO exchange — gen's
    one-partition-per-block_key invariant broke and per-doc aggregation
    split into duplicate partial rows (found at 2M docs, 'merge or
    block'). The shipped fix forces a statically-planned broadcast semi
    join so the repartition always survives."""
    from pyspark.sql import functions as F

    from project_gutenberg_full_text_search_spark.operators.bm25 import (
        bm25_candidates_blockagg,
    )
    from project_gutenberg_full_text_search_spark.plans.parser import parse_websearch

    pq = parse_websearch("index or query")  # two hot terms, OR semantics
    keys_df = (
        handle.blocks_for(pq.positive_terms).select("block_key").distinct()
    )
    keys = [r["block_key"] for r in keys_df.collect()]
    via_df = (
        bm25_candidates_blockagg(handle, pq, block_keys=keys_df)
        .withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .toPandas()
    )
    via_list = (
        bm25_candidates_blockagg(handle, pq, block_keys=keys)
        .withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .toPandas()
    )
    # no duplicate per-doc rows (the failure mode was partial duplicates)
    assert via_df.doc_id.is_unique
    assert via_df.doc_id.tolist() == via_list.doc_id.tolist()
    assert via_df.score.tolist() == via_list.score.tolist()
    # and the plan actually retains an exchange above the semi join
    plan = (
        bm25_candidates_blockagg(handle, pq, block_keys=keys_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_postings_scan_partition_pruned_and_pushed(handle):
    """The GIN-analog access path must survive in the physical plan: the
    postings scan prunes to the query terms' tbucket PARTITIONS
    (PartitionFilters) and pushes the term membership filter into the
    parquet reader (PushedFilters → row-group min/max on the term-sorted
    files). A plan that reads all partitions for a 2-term query has lost
    the index."""
    from project_gutenberg_full_text_search_spark.plans.parser import parse_websearch

    from project_gutenberg_full_text_search_spark.operators.bm25 import (
        bm25_candidates,
    )

    plan = (
        bm25_candidates(handle, parse_websearch("merge query"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    i = plan.find("PartitionFilters: [")
    assert i >= 0, "postings scan lost its partition filter"
    pf = plan[i : plan.index("]", i) + 1]
    assert "tbucket" in pf and " IN " in pf, pf
    j = plan.find("PushedFilters: [")
    assert j >= 0
    pushed = plan[j : plan.index("]", j) + 1]
    assert "In(term" in pushed, pushed
