"""Substring (ILIKE '%q%') search with trigram prefilter.

Reference: CONTAINS search type builds ``text_col ILIKE '%q%'``
(search/full_text_search.py:144-146, 98-103) accelerated by GIN trigram
indexes (mv_books_dc.sql:472-477).

Spark plan: a sound trigram prefilter + exact verify.

  prefilter: lowercase the query, split into [a-z0-9_] fragments; every
  *interior* (unpadded) trigram of every fragment of length ≥3 must appear
  in the doc. Doc trigram membership is derived from the existing
  term-postings + trigram_terms tables — docs(g) = ∪_{term ⊇ g} docs(term)
  — i.e. the GIN trgm index is *virtual*, joined on demand instead of
  materialized. Sound because a substring hit means each query fragment is
  a substring of some token, so its interior trigrams are interior
  trigrams of that token.

  verify: join the candidate doc_ids back to the docs table (broadcast the
  candidates when small) and apply the exact `contains` filter — identical
  to the naive scan, but over a tiny candidate set.

No fragment ≥3 chars → fall back to the naive full scan (pg does the same:
trigram indexes need ≥3-char queries).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_gutenberg_full_text_search_spark.functions.text import word_trigrams
from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle

MAX_PREFILTER_TERMS = 50_000
_GS_PAYLOAD = T.StructType(
    [T.StructField("gs", T.ArrayType(T.StringType()), False)]
)
_MASK_PAYLOAD = T.StructType([T.StructField("gmask", T.LongType(), False)])


def _query_trigrams(q: str) -> set[str]:
    frags = [f for f in re.split("[^a-z0-9_]+", q.lower()) if len(f) >= 3]
    out: set[str] = set()
    for f in frags:
        out |= word_trigrams(f, pad=False)
    return out


def contains_candidates(handle: IndexHandle, q: str) -> DataFrame | None:
    """doc_ids that *may* contain q; None → prefilter unusable (full scan).

    The candidate (term → matched-trigram-set) mapping stays a DataFrame
    broadcast-joined to the posting blocks (``IndexHandle.decode_for``) —
    never collected, never inlined as plan literals: at source-code
    vocabulary sizes the literal formulation is a driver OOM and a
    multi-MB Catalyst plan.

    The cap/coverage gate is pure driver arithmetic over the handle's
    memoized trigram→df map (``IndexHandle.trigram_df`` — bounded ≤ ~50k
    entries by the trigram alphabet at any corpus size), so a CONTAINS
    query costs ONE candidate job, not a blocking vocabulary-stats job
    followed by the real one.  The cap bound Σ_g df(g) is an upper bound
    on the exact distinct-candidate-term count the old gate computed —
    strictly more conservative, never less sound.
    """
    gset = sorted(_query_trigrams(q))
    if not gset:
        return None
    spark = handle.spark
    dfmap = handle.trigram_df()
    if any(g not in dfmap for g in gset):
        # some query trigram occurs in no vocabulary term → no doc can match
        return spark.createDataFrame([], "doc_id bigint")
    if sum(dfmap[g] for g in gset) > MAX_PREFILTER_TERMS:
        return None
    matched = handle.trigram_terms().filter(F.col("trigram").isin(gset))
    # A doc qualifies iff for EVERY query trigram it contains at least one
    # term carrying that trigram. Coverage is tracked as a BITMASK (query
    # trigram i → bit i, folded per term then bit_or'd per doc): one
    # map-side-combinable aggregation per groupBy, where the former
    # count_distinct formulation planned a two-exchange distinct aggregate
    # and shuffled one row per (doc, trigram) instead of one long per doc.
    if len(gset) <= 62:
        bit = F.create_map(
            *[x for i, g in enumerate(gset) for x in (F.lit(g), F.lit(1 << i))]
        )
        cand = matched.groupBy("term").agg(
            F.bit_or(bit[F.col("trigram")]).alias("gmask")
        )
        decoded = handle.decode_for(cand, _MASK_PAYLOAD)
        return (
            decoded.groupBy("doc_id")
            .agg(F.bit_or("gmask").alias("m"))
            .filter(F.col("m") == (1 << len(gset)) - 1)
            .select("doc_id")
        )
    # >62 distinct query trigrams (a very long query): array formulation
    cand = matched.groupBy("term").agg(
        F.array_sort(F.collect_set("trigram")).alias("gs")
    )
    decoded = handle.decode_for(cand, _GS_PAYLOAD)
    return (
        decoded.select("doc_id", F.explode("gs").alias("g"))
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("ng"))
        .filter(F.col("ng") == len(gset))
        .select("doc_id")
    )


def contains_search(
    handle: IndexHandle,
    docs: DataFrame,
    q: str,
    text_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs rows whose text contains q (case-insensitive substring)."""
    verify = F.contains(F.lower(F.col(text_col)), F.lit(q.lower()))
    cands = contains_candidates(handle, q)
    if cands is None:
        return docs.filter(verify)
    # no broadcast hint: the candidate set is usually tiny (AQE converts
    # the semi-join to broadcast at runtime from its REAL size) but is
    # unbounded for a broad query — a forced broadcast is a driver OOM at
    # corpus scale.
    return docs.join(cands, id_col, "left_semi").filter(verify)


def contains_naive(docs: DataFrame, q: str, text_col: str = "content") -> DataFrame:
    """Reference-exact naive path (the oracle's formulation)."""
    return docs.filter(F.contains(F.lower(F.col(text_col)), F.lit(q.lower())))
