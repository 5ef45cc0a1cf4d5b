"""Approximate-nearest-neighbor search over embedding columns.

Brute-force cosine top-k as the exact baseline (pure JVM column algebra —
zip_with/aggregate, no UDF), and a sign-bit LSH-bucketed variant as the
scale path: at 100 TB the bucket column partitions the corpus so a query
probes one bucket (plus optional neighbor buckets), turning a full scan
into a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine similarity — (id, cos) deterministic order."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine_sim_col(F.col(vec_col), q), round_digits).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def signbit_bucket_col(vec_col: Column, dims: list[int]) -> Column:
    """LSH bucket = integer of sign bits of the chosen dimensions.

    Deterministic and trivially oracle-able; at scale write the table
    partitioned by this column for partition-pruned probes.
    """
    bits = [
        F.when(F.element_at(vec_col, d + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, d in enumerate(dims)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


DEFAULT_LSH_DIMS = [0, 7, 14, 21, 28, 35, 42, 49]


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: list[int] | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's sign-bit bucket.

    Recall trades against the number of bucket bits (documented: single
    bucket probe; multi-probe of hamming-1 neighbors is a straightforward
    extension via isin()).
    """
    dims = dims or DEFAULT_LSH_DIMS
    qb = 0
    for i, d in enumerate(dims):
        if float(query_vec[d]) >= 0:
            qb |= 1 << i
    bucketed = emb.withColumn("_bucket", signbit_bucket_col(F.col(vec_col), dims))
    return cosine_topk(
        bucketed.filter(F.col("_bucket") == qb),
        query_vec,
        k,
        id_col,
        vec_col,
        round_digits,
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: list[int] | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, LSH-bucket-blocked.

    Only pairs within a shared sign-bit bucket are compared (the blocking
    that makes this sub-quadratic at scale).
    """
    dims = dims or DEFAULT_LSH_DIMS
    b = emb.select(
        F.col(id_col),
        F.col(vec_col),
        signbit_bucket_col(F.col(vec_col), dims).alias("_bucket"),
    )
    a1 = b.select("_bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    a2 = b.select("_bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a1.join(a2, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine_sim_col(F.col("v_a"), F.col("v_b")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
