"""Substring (ILIKE '%q%') search with trigram prefilter.

Reference: CONTAINS search type builds ``text_col ILIKE '%q%'``
(search/full_text_search.py:144-146, 98-103) accelerated by GIN trigram
indexes (mv_books_dc.sql:472-477).

Spark plan: a sound trigram prefilter + exact verify.

  prefilter: lowercase the query, split into [a-z0-9_] fragments
  (the SAME character class the tokenizer splits on — text.py:28 — so
  every fragment of a true substring hit lies inside ONE token: interior
  fragments are bounded by the query's own non-alnum chars, the first/
  last fragment by the match edge). Therefore a term is a useful witness
  for fragment f only if its trigram set covers ALL of f's interior
  (unpadded) trigrams — a doc qualifies iff for EVERY fragment it
  contains ≥1 fully-covering term. Term trigram membership comes from
  the existing trigram_terms table — the GIN trgm index is *virtual*,
  joined on demand instead of materialized. Coverage-at-the-term-level
  is strictly tighter than the per-trigram union (docs(g) = ∪_{term ∋ g}
  docs(term) for each g independently): the decoded posting mass drops
  from Σ_g df(g) to Σ_f |{terms ⊇ G_f}| ≤ Σ_f min_{g∈G_f} df(g), and
  equally sound.

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
_FBITS_PAYLOAD = T.StructType([T.StructField("fbits", T.LongType(), False)])


def _query_trigrams(q: str) -> set[str]:
    frags = [f for f in re.split("[^a-z0-9_]+", q.lower()) if len(f) >= 3]
    out: set[str] = set()
    for f in frags:
        out |= word_trigrams(f, pad=False)
    return out


def _query_fragment_trigrams(q: str) -> list[frozenset[str]]:
    """Per-fragment interior trigram sets, exact-duplicate-deduped (two
    identical fragments impose the same coverage requirement)."""
    frags = [f for f in re.split("[^a-z0-9_]+", q.lower()) if len(f) >= 3]
    seen: set[frozenset[str]] = set()
    out: list[frozenset[str]] = []
    for f in frags:
        gs = frozenset(word_trigrams(f, pad=False))
        if gs and gs not in seen:
            seen.add(gs)
            out.append(gs)
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
    followed by the real one.  The cap bound Σ_f min_{g∈G_f} df(g) is an
    upper bound on the number of terms that can fully cover any fragment
    (a covering term carries every trigram of the fragment, so there are
    no more of them than the rarest trigram's df).
    """
    frags = _query_fragment_trigrams(q)
    gset = sorted(_query_trigrams(q))
    if not gset:
        return None
    spark = handle.spark
    dfmap = handle.trigram_df()
    if any(g not in dfmap for g in gset):
        # some query trigram occurs in no vocabulary term → no doc can match
        return spark.createDataFrame([], "doc_id bigint")
    # decode-mass gate: terms covering fragment f number ≤ min_{g∈G_f}
    # df(g) (they must carry EVERY trigram of f, so no more than the
    # rarest one's df) — a far tighter driver-arithmetic bound than the
    # old Σ_g df(g), so broad-but-coverable queries keep the index path
    # instead of falling back to a full scan.
    if sum(min(dfmap[g] for g in gs) for gs in frags) > MAX_PREFILTER_TERMS:
        return None
    total_bits = sum(len(gs) for gs in frags)
    if total_bits <= 62:
        # fragment-coverage path: one (fragment, trigram) bit per pair;
        # a term's tmask tells which fragments it FULLY covers (fbits);
        # a doc qualifies iff bit_or of its terms' fbits covers every
        # fragment. Both aggregations are map-side-combinable bit_or's.
        bit_of: dict[str, int] = {g: 0 for g in gset}
        frag_masks: list[int] = []
        off = 0
        for gs in frags:
            mask = 0
            for j, g in enumerate(sorted(gs)):
                bit_of[g] |= 1 << (off + j)
                mask |= 1 << (off + j)
            frag_masks.append(mask)
            off += len(gs)
        matched = handle.trigram_terms().filter(F.col("trigram").isin(gset))
        bitmap = F.create_map(
            *[x for g in gset for x in (F.lit(g), F.lit(bit_of[g]))]
        )
        fbits = F.lit(0)
        for fid, m in enumerate(frag_masks):
            fbits = fbits + F.when(
                F.col("tmask").bitwiseAND(F.lit(m)) == F.lit(m), F.lit(1 << fid)
            ).otherwise(F.lit(0))
        cand = (
            matched.groupBy("term")
            .agg(F.bit_or(bitmap[F.col("trigram")]).alias("tmask"))
            .withColumn("fbits", fbits.cast("long"))
            .filter(F.col("fbits") != 0)
            .select("term", "fbits")
        )
        decoded = handle.decode_for(cand, _FBITS_PAYLOAD)
        return (
            decoded.groupBy("doc_id")
            .agg(F.bit_or("fbits").alias("m"))
            .filter(F.col("m") == (1 << len(frags)) - 1)
            .select("doc_id")
        )
    # very long queries (> 62 fragment-trigram pairs): fall back to the
    # looser per-trigram union prefilter — every query trigram must appear
    # in the doc via SOME term (still sound, decodes more).
    matched = handle.trigram_terms().filter(F.col("trigram").isin(gset))
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
