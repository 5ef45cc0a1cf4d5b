"""Trigram fuzzy search — the pg_trgm ``<%`` / ``word_similarity`` analog.

Reference behavior: ``:q <% text_col`` ordered by
``word_similarity(:q, col) DESC`` (search/full_text_search.py:141-143,
280-281), accelerated by GiST trigram indexes (mv_books_dc.sql:482-487).

Our semantics (documented deviation, identically implemented in the
oracle): a doc matches iff some *token* of the doc has padded-trigram
Jaccard similarity ≥ threshold with the query word; the doc's score is the
max such similarity. Default threshold 0.3 (pg_trgm similarity_threshold).

Execution is pure distributed DataFrame algebra — nothing is collected to
the driver (GIN/GiST index probes never touch the client either,
mv_books_dc.sql:472-487):

1. query word → padded trigram set Q (driver-side literal, tiny and fixed)
2. ``trigram_terms`` (vocabulary-sized) filtered to Q → per candidate term
   the share count c; Jaccard = c / (|Q| + n_trigrams − c); keep ≥ τ.
   Only terms sharing ≥1 trigram are ever touched (the index access path).
3. candidate (term, sim) DataFrame → broadcast-joined to the posting
   blocks (``IndexHandle.decode_for``) → per-doc max similarity. The
   candidate set stays on executors as a join payload — the plan is O(1)
   in candidate-vocabulary size (a source-code corpus has unbounded
   identifier vocabulary; a create_map-literal plan would OOM the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_gutenberg_full_text_search_spark.functions.text import word_trigrams
from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle

DEFAULT_SIM_THRESHOLD = 0.3
MAX_CANDIDATE_TERMS = 10_000
_SIM_PAYLOAD = T.StructType([T.StructField("sim", T.DoubleType(), False)])


def fuzzy_terms(
    handle: IndexHandle, word: str, threshold: float = DEFAULT_SIM_THRESHOLD
) -> DataFrame:
    """(term, sim) for vocabulary terms with trigram-Jaccard ≥ threshold."""
    q = sorted(word_trigrams(word.lower()))
    spark = handle.spark
    if not q:
        return spark.createDataFrame([], "term string, sim double")
    # handle.trigram_terms() dedups (trigram, term) across index shards —
    # the shared-count c must not double-count an edge carried by several
    # incremental epochs' vocabularies
    shared = (
        handle.trigram_terms()
        .filter(F.col("trigram").isin(q))
        .groupBy("term", "n_trigrams")
        .agg(F.count("*").alias("c"))
    )
    return (
        shared.withColumn(
            "sim",
            F.col("c") / (F.lit(len(q)) + F.col("n_trigrams") - F.col("c")),
        )
        .filter(F.col("sim") >= threshold)
        .select("term", "sim")
    )


def _capped_terms(handle: IndexHandle, word: str, threshold: float) -> DataFrame:
    """Candidate (term, sim), capped for pathological queries (e.g. 1-char
    words matching half the vocabulary — pg behavior for those is unusably
    broad anyway). The cap is a deterministic top-K (sim DESC, term ASC)
    computed on executors; only the broadcast exchange ships the rows."""
    cand = fuzzy_terms(handle, word, threshold)
    return cand.orderBy(F.desc("sim"), F.asc("term")).limit(MAX_CANDIDATE_TERMS)


def fuzzy_candidates(
    handle: IndexHandle,
    word: str,
    threshold: float = DEFAULT_SIM_THRESHOLD,
    round_digits: int = 4,
) -> DataFrame:
    """All matching docs, unsorted: (doc_id, sim = max over matching tokens)."""
    cand = _capped_terms(handle, word, threshold)
    decoded = handle.decode_for(cand, _SIM_PAYLOAD)
    return decoded.groupBy("doc_id").agg(
        F.round(F.max("sim"), round_digits).alias("sim")
    )


def fuzzy_search(
    handle: IndexHandle,
    word: str,
    threshold: float = DEFAULT_SIM_THRESHOLD,
    k: int = 25,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k (doc_id, sim), deterministic (sim desc, doc_id asc)."""
    return (
        fuzzy_candidates(handle, word, threshold, round_digits)
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )


def fuzzy_count(handle: IndexHandle, word: str, threshold: float = DEFAULT_SIM_THRESHOLD) -> int:
    cand = _capped_terms(handle, word, threshold)
    decoded = handle.decode_for(cand, _SIM_PAYLOAD)
    return decoded.select("doc_id").distinct().count()
