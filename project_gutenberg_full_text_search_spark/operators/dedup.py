"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (its corpus is curated and deduped
upstream), these are the ops a 100 TB corpus ingest needs. All hashing is
the cross-engine md5-based 60-bit hash (functions/hashing.py) so every
operator has a bit-identical DuckDB oracle.

Scale notes:
- exact dedup: one hash-groupBy — map-side partial agg, no skew (hashes
  are uniform).
- MinHash/LSH: signatures are computed row-local (pure JVM column algebra,
  no UDF, no shuffle); the only shuffle is the band-bucket self-join,
  which AQE skew-splits if a bucket is hot. Band count/rows tune the
  recall/precision curve as usual.
- SimHash: row-local bit algebra, then a prefix-bucket join for candidate
  pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.hashing import md5_long_col
from project_gutenberg_full_text_search_spark.functions.text import tokens_col

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(content_hash, keep_id = min id, n) per distinct content."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n"))
    )


def exact_dedup(df: DataFrame, text_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """df minus exact duplicates (keeps min-id row per content)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles_expr(text_col: str, n: int = 3):
    """Distinct n-token shingles, JVM-side (no UDF).

    Guarded for docs with < n tokens (Spark's sequence(1, 0) counts DOWN,
    it does not return empty)."""
    toks = tokens_col(text_col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>[k]) — sig[s] = min over shingles of h_s(x).

    h_s(x) = md5_long(f"{s}:{x}") — seeded, cross-engine reproducible.
    Docs with no shingles get sig[s] = NULL (kept, never bucketed).
    """
    sh = shingles_expr(text_col, shingle_n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda s: F.array_min(
            F.transform(
                sh, lambda x: md5_long_col(F.concat(s.cast("string"), F.lit(":"), x))
            )
        ),
    )
    return df.select(F.col(id_col), sig.alias("sig"))


def lsh_bands(
    sig_df: DataFrame, bands: int = 4, rows: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band_id, band_hash): hash of each r-row slice of the signature."""
    out = sig_df.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_id"),
        F.col("sig"),
    )
    return out.select(
        id_col,
        "band_id",
        md5_long_col(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), F.col("band_id") * rows + 1, rows),
                    lambda v: v.cast("string"),
                ),
            )
        ).alias("band_hash"),
    )


def lsh_candidate_pairs(band_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_a < id_b) sharing ≥1 band bucket."""
    a = band_df.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    b = band_df.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    rows: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact shingle Jaccard.

    (id_a, id_b, jaccard) with jaccard ≥ threshold. The verify join is
    against the shingle sets of candidate ids only.
    """
    sigs = minhash_signatures(df, text_col, id_col, k, shingle_n)
    cands = lsh_candidate_pairs(lsh_bands(sigs, bands, rows, id_col), id_col)
    sh = df.select(
        F.col(id_col), shingles_expr(text_col, shingle_n).alias("sh")
    )
    j = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return j


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """(id, simhash): tf-weighted sign fingerprint over term hashes.

    bit_i = 1 iff Σ_terms tf · (2·bit_i(h(term)) − 1) > 0. Row-local:
    explode terms → groupBy(id, bit) is avoided by computing all bits in
    one aggregate over the token array (JVM higher-order functions).
    """
    toks = tokens_col(text_col)
    # per-doc distinct (term, tf) pairs as array<struct>
    tf_arr = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            md5_long_col(t).alias("h"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )
    def bit_weight(i: int):
        def merge(acc, e):
            return acc + e["tf"] * (
                F.shiftright(e["h"], i).bitwiseAND(F.lit(1)) * 2 - 1
            )

        return F.aggregate(tf_arr, F.lit(0).cast("long"), merge)

    sh = F.lit(0).cast("long")
    for i in range(bits):  # bits is small (≤64); unrolled into one expression
        sh = sh + F.when(bit_weight(i) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.select(F.col(id_col), sh.alias("simhash"))


def simhash_candidate_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", prefix_bits: int = 8
) -> DataFrame:
    """Pairs sharing the top `prefix_bits` of the simhash (bucket join)."""
    b = sim_df.withColumn("bucket", F.shiftright("simhash", 16 - prefix_bits))
    a1 = b.select(F.col("bucket"), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    a2 = b.select(F.col("bucket"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a1.join(a2, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .select("id_a", "id_b", "hamming")
    )
