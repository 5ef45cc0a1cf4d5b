"""Approximate-nearest-neighbor search over embedding columns.

Brute-force cosine top-k as the exact baseline (pure JVM column algebra —
zip_with/aggregate, no UDF), and a random-hyperplane LSH-bucketed variant
as the scale path: a seeded projection matrix gives ``nbits`` sign bits
per vector (SimHash-for-vectors), the corpus is written partitioned by
that bucket, and a query probes only the buckets within a small hamming
radius of its own (multi-probe) — turning a full scan into a
partition-pruned scan of ~C(nbits, ≤r)/2^nbits of the data.

Everything is seed-deterministic: the projection matrix regenerates from
(dim, nbits, seed) on any engine, and the bucket expression is built as a
left-to-right chained sum so Spark, DuckDB, and Python produce
bit-identical IEEE doubles → identical buckets (oracle-able end to end).

The legacy fixed-coordinate sign-bit bucketing (`signbit_bucket_col`)
remains for the cheap raw-coordinate variant, but raw coordinates are
usually correlated/unbalanced — random hyperplanes give unskewed buckets
and tunable width, so they are the default for ann_lsh_topk.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
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

DEFAULT_LSH_NBITS = 16
DEFAULT_LSH_SEED = 42
DEFAULT_PROBE_HAMMING = 2


def hyperplane_matrix(
    dim: int, nbits: int = DEFAULT_LSH_NBITS, seed: int = DEFAULT_LSH_SEED
) -> np.ndarray:
    """Seeded (nbits × dim) gaussian projection matrix — regenerates
    identically anywhere from (dim, nbits, seed); the seed is the only
    state the index needs to ship."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((nbits, dim))


def _plane_dot_col(vec_col: Column, row: np.ndarray) -> Column:
    """Left-to-right chained sum Σ_d w_d · v[d] — the SAME association
    order as the SQL/Python twins, so sign bits are bit-identical."""
    terms = (
        F.lit(float(w)) * F.element_at(vec_col, d + 1).cast("double")
        for d, w in enumerate(row)
    )
    return reduce(lambda acc, t: acc + t, terms)


def hyperplane_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    out = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        out = out + F.when(_plane_dot_col(vec_col, row) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return out.cast("long")


def hyperplane_bucket_py(vec, planes: np.ndarray) -> int:
    qb = 0
    for i, row in enumerate(planes):
        dot = reduce(
            lambda acc, t: acc + t,
            (float(w) * float(x) for w, x in zip(row, vec)),
        )
        if dot >= 0:
            qb |= 1 << i
    return qb


def hyperplane_bucket_sql(vec_expr: str, planes: np.ndarray) -> str:
    """DuckDB fragment computing the identical bucket (left-to-right sums)."""
    bits = []
    for i, row in enumerate(planes):
        dot = " + ".join(
            f"({float(w)!r} * {vec_expr}[{d + 1}]::DOUBLE)" for d, w in enumerate(row)
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")::BIGINT"


def probe_buckets(qb: int, nbits: int, radius: int) -> list[int]:
    """All buckets within hamming `radius` of qb (multi-probe set)."""
    from itertools import combinations

    out = [qb]
    for r in range(1, radius + 1):
        for flip in combinations(range(nbits), r):
            m = 0
            for f in flip:
                m |= 1 << f
            out.append(qb ^ m)
    return out


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = DEFAULT_LSH_NBITS,
    seed: int = DEFAULT_LSH_SEED,
    probe_hamming: int = DEFAULT_PROBE_HAMMING,
    bucket_col: str | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's multi-probe
    bucket set (all buckets within hamming ≤ probe_hamming of the query's
    random-hyperplane bucket).

    The probe set is enumerated driver-side (C(nbits, ≤r) ints) and
    applied with isin(), so on a table written partitioned by the bucket
    column this is a partition-pruned scan. Pass ``bucket_col`` to use a
    precomputed/stored bucket column instead of recomputing projections.
    """
    planes = hyperplane_matrix(len(query_vec), nbits, seed)
    qb = hyperplane_bucket_py(query_vec, planes)
    probes = probe_buckets(qb, nbits, probe_hamming)
    if bucket_col is None:
        emb = emb.withColumn("_bucket", hyperplane_bucket_col(F.col(vec_col), planes))
        bucket_col = "_bucket"
    return cosine_topk(
        emb.filter(F.col(bucket_col).isin(probes)),
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
    bands: int = 4,
    nbits_per_band: int = 8,
    seed: int = DEFAULT_LSH_SEED,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold — banded random-
    hyperplane blocking (the vector analog of MinHash band-LSH).

    Each band b hashes every vector into a 2^nbits_per_band-bucket table
    with its own seeded projection matrix; a pair is a candidate iff it
    collides in ANY band (OR-amplification: per-band collision prob for
    angle θ is (1−θ/π)^nbits, so recall at cos 0.95 with 4×8-bit bands is
    ~0.9 while the expected candidate set stays Σ_bands Σ_buckets n_b² —
    sub-quadratic for any non-degenerate distribution, and unskewed where
    raw-coordinate sign bits are not). Exact cosine verifies candidates.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    b_cols = [
        hyperplane_bucket_col(
            F.col(vec_col), hyperplane_matrix(dim, nbits_per_band, seed + i)
        ).alias(f"_b{i}")
        for i in range(bands)
    ]
    base = emb.select(F.col(id_col), F.col(vec_col), *b_cols)
    stacked = base.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"_b{i}") for i in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    a1 = stacked.select("band", "bucket", F.col(id_col).alias("id_a"))
    a2 = stacked.select("band", "bucket", F.col(id_col).alias("id_b"))
    cand = (
        a1.join(a2, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cosine_sim_col(F.col("v_a"), F.col("v_b")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
