"""Benchmark-contamination detection: n-token shingle overlap vs a
reference set.

The training-data-pipeline question "which corpus documents leak my
evaluation set?" reduces to: for each document, how many distinct
n-token shingles does it share with a (small) reference corpus — a
benchmark's test split, a held-out eval file. No reference-engine analog
(the reference is a search engine; this is the data-hygiene side of the
same shingle machinery dedup uses — operators/dedup.py:59).

Plan — designed so corpus-side work never shuffles at corpus scale:

- Both sides' shingles reduce to the 60-bit engine-portable md5 long
  (functions/hashing.py) before the join, so the key is 8 bytes instead
  of an n-token string. Hash collisions are bit-identical cross-engine
  (the DuckDB oracle hashes the same way), so oracle parity stays exact.
- The reference side is distinct-hashed — tiny by assumption (test sets
  are KBs–MBs against a 100 TB corpus) — and AQE broadcasts it from its
  real materialized size (repo policy: no forced broadcast hints).
- The corpus side explodes shingles WITHOUT a distinct — a per-doc
  distinct there would shuffle every (doc, shingle) pair in the corpus.
  ``shingles_expr`` already emits per-doc-distinct shingles, so after
  the broadcast join filters to hits, a plain map-side-combinable
  count(*) per doc IS the distinct overlap count. The only shuffle is
  over contaminated-doc hits, which is tiny when contamination is rare
  (and exactly the rows you care about when it is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.hashing import md5_long_col
from project_gutenberg_full_text_search_spark.functions.text import tokens_col
from project_gutenberg_full_text_search_spark.operators.dedup import shingles_expr


def ngram_overlap(
    docs: DataFrame,
    ref: DataFrame,
    n: int = 3,
    text_col: str = "content",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    min_overlap: int = 1,
) -> DataFrame:
    """(id_col, n_overlap) for every doc sharing ≥ min_overlap distinct
    n-token shingles with the reference set.

    Docs with fewer than n tokens produce no shingles and cannot appear
    (they cannot contain an n-gram of the reference). Output rows only
    for hits — the clean 99.99% of a corpus never leaves the map side.
    """
    ref_text_col = ref_text_col or text_col
    # tokens materialized per side: shingles_expr's HOF lambda would
    # otherwise re-run the regex tokenizer once per shingle (CodegenFallback,
    # no subexpression elimination) — measured 8-10x on this scan.
    ref_sh = (
        ref.withColumn("_toks", tokens_col(ref_text_col))
        .select(F.explode(shingles_expr(ref_text_col, n, toks=F.col("_toks"))).alias("sh"))
        .select(md5_long_col("sh").alias("sh_h"))
        .distinct()
    )
    doc_sh = (
        docs.withColumn("_toks", tokens_col(text_col))
        .select(
            F.col(id_col),
            F.explode(shingles_expr(text_col, n, toks=F.col("_toks"))).alias("sh"),
        )
        .select(id_col, md5_long_col("sh").alias("sh_h"))
    )
    hits = doc_sh.join(ref_sh, "sh_h")
    out = hits.groupBy(id_col).agg(F.count("*").alias("n_overlap"))
    if min_overlap > 1:
        out = out.filter(F.col("n_overlap") >= min_overlap)
    return out
