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

    Vectorized mapInPandas: one md5 per (shingle, seed) in a tight loop.
    (A pure higher-order-function formulation exists but nested lambdas
    fall out of whole-stage codegen and the string-built md5 chain is
    ~50× slower — measured, not guessed.)
    """
    import hashlib

    import pandas as pd

    from project_gutenberg_full_text_search_spark.functions.text import tokenize_str

    def gen(batches):
        for pdf in batches:
            sigs = []
            for text in pdf[text_col].tolist():
                toks = tokenize_str(text)
                shingles = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)
                    )
                )
                if not shingles:
                    sigs.append([None] * k)
                    continue
                sig = []
                for s in range(k):
                    pre = f"{s}:".encode()
                    sig.append(
                        min(
                            int(hashlib.md5(pre + x.encode()).hexdigest()[:15], 16)
                            for x in shingles
                        )
                    )
                sigs.append(sig)
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, sig array<long>"
    )


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

    bit_i = 1 iff sum over terms of tf * (2*bit_i(h(term)) - 1) > 0, with
    h = the cross-engine md5 hash. Implemented as a vectorized mapInPandas
    single pass (numpy terms-by-bits sign matrix per doc); the pure
    column-algebra formulation re-evaluates the token aggregation once per
    bit -- O(bits * tokens * terms) per row -- pathological on wide docs.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from project_gutenberg_full_text_search_spark.functions.text import tokenize_batch

    bit_idx = np.arange(bits, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            out = []
            for toks in tokenize_batch(pdf[text_col].tolist()):
                if len(toks) == 0:
                    out.append(0)
                    continue
                terms, counts = np.unique(toks, return_counts=True)
                hs = np.fromiter(
                    (int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in terms),
                    dtype=np.uint64,
                    count=len(terms),
                )
                signs = (((hs[:, None] >> bit_idx[None, :]) & 1) * 2).astype(np.int64) - 1
                w = (counts[:, None].astype(np.int64) * signs).sum(axis=0)
                out.append(int(((w > 0).astype(np.uint64) << bit_idx).sum()))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": pd.Series(out, dtype="int64")}
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, simhash long"
    )


def simhash_candidate_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", prefix_bits: int = 8, bits: int = 16
) -> DataFrame:
    """Pairs sharing the top `prefix_bits` of the `bits`-wide simhash
    (bucket join). `bits` must match the width passed to simhash()."""
    if not 0 < prefix_bits <= bits:
        raise ValueError(f"prefix_bits must be in (0, {bits}]")
    b = sim_df.withColumn("bucket", F.shiftright("simhash", bits - prefix_bits))
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
