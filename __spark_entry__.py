"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship BM25 search over sf0.001 documents.
queries()        — operator registry (SURVEY.md §2 + pipeline ops); each
                   callable (spark, sf_dir) → DataFrame.
oracle_sql()     — DuckDB twins re-deriving the same semantics from first
                   principles (tokenize/BM25/trigram/minhash/simhash/cosine).

Registry lives in project_gutenberg_full_text_search_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from project_gutenberg_full_text_search_spark.entry_queries import (  # noqa: E402
    _documents,
    _index_for,
    build_registry,
)

_REGISTRY = None


def _registry():
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = build_registry()
    return _REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-25 for 'merge query' on sf0.001, with metadata."""
    from pyspark.sql import functions as F

    from project_gutenberg_full_text_search_spark.operators.bm25 import bm25_topk

    sf_dir = "/root/testdata/sf0.001"
    handle = _index_for(spark, sf_dir)
    top = bm25_topk(handle, "merge query", k=25)
    docs = _documents(spark, sf_dir)
    return (
        top.join(docs, "doc_id")
        .select("doc_id", "score", "lang", "source", "n_chars")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
