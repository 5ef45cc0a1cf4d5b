"""Trigram fuzzy search — the pg_trgm ``<%`` / ``word_similarity`` analog.

Reference behavior: ``:q <% text_col`` ordered by
``word_similarity(:q, col) DESC`` (search/full_text_search.py:141-143,
280-281), accelerated by GiST trigram indexes (mv_books_dc.sql:482-487).

Our semantics (documented deviation, identically implemented in the
oracle): a doc matches iff some *token* of the doc has padded-trigram
Jaccard similarity ≥ threshold with the query word; the doc's score is the
max such similarity. Default threshold 0.3 (pg_trgm similarity_threshold).

Execution is pure JVM DataFrame algebra — no UDF:

1. query word → padded trigram set Q (driver-side, tiny)
2. ``trigram_terms`` (vocabulary-sized) filtered to Q → per candidate term
   the share count c; Jaccard = c / (|Q| + n_trigrams − c); keep ≥ τ.
   Only terms sharing ≥1 trigram are ever touched (the index access path).
3. candidate terms (collected — bounded by vocabulary ∩ Q, typically
   hundreds) → partition-pruned posting decode → per-doc max similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.text import word_trigrams
from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle

DEFAULT_SIM_THRESHOLD = 0.3
MAX_CANDIDATE_TERMS = 10_000


def fuzzy_terms(
    handle: IndexHandle, word: str, threshold: float = DEFAULT_SIM_THRESHOLD
) -> DataFrame:
    """(term, sim) for vocabulary terms with trigram-Jaccard ≥ threshold."""
    q = sorted(word_trigrams(word.lower()))
    spark = handle.spark
    if not q:
        return spark.createDataFrame([], "term string, sim double")
    tri = spark.read.parquet(f"{handle.index_dir}/trigram_terms")
    shared = (
        tri.filter(F.col("trigram").isin(q))
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


def fuzzy_candidates(
    handle: IndexHandle,
    word: str,
    threshold: float = DEFAULT_SIM_THRESHOLD,
    round_digits: int = 4,
) -> DataFrame:
    """All matching docs, unsorted: (doc_id, sim = max over matching tokens)."""
    cand = fuzzy_terms(handle, word, threshold).collect()
    spark = handle.spark
    if not cand:
        return spark.createDataFrame([], "doc_id bigint, sim double")
    if len(cand) > MAX_CANDIDATE_TERMS:
        # pathological query (e.g. 1-char word): keep the best candidates —
        # matches pg behavior of such queries being unusably broad anyway.
        cand = sorted(cand, key=lambda r: -r["sim"])[:MAX_CANDIDATE_TERMS]
    sims = {r["term"]: float(r["sim"]) for r in cand}
    decoded = handle.decode(list(sims)).select("doc_id", "term")
    sim_expr = F.create_map(*[x for t, s in sims.items() for x in (F.lit(t), F.lit(s))])
    return (
        decoded.withColumn("sim_t", sim_expr.getItem(F.col("term")))
        .groupBy("doc_id")
        .agg(F.round(F.max("sim_t"), round_digits).alias("sim"))
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
    cand = fuzzy_terms(handle, word, threshold).collect()
    if not cand:
        return 0
    terms = [r["term"] for r in cand][:MAX_CANDIDATE_TERMS]
    return handle.decode(terms).select("doc_id").distinct().count()
