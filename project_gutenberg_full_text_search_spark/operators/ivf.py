"""IVF (inverted-file) approximate-nearest-neighbor search.

The second scale path for embedding search, complementing the random-
hyperplane LSH in ``similarity.py``: a coarse quantizer of ``nlist``
unit-norm centroids partitions the corpus into Voronoi cells (argmax
cosine ≡ argmax dot for unit centroids), and a query scans only its
``nprobe`` nearest cells — the FAISS IndexIVFFlat strategy re-expressed
as DataFrame algebra (reference analog: the same "index narrows, exact
math verifies" role the GIN/GiST families play in mv_books_dc.sql).

Where LSH buckets are data-independent, IVF cells ADAPT to the corpus:
``train_centroids`` runs deterministic spherical k-means on a hash-
sampled slice (the standard IVF recipe — FAISS trains its quantizer on
a sample too), so clustered corpora get balanced cells where fixed
hyperplanes would skew.  ``seeded_centroids`` provides the data-
independent variant (unit gaussian directions) for oracle-able
deterministic runs.

Cross-engine determinism follows the hyperplane playbook
(similarity.py): per-centroid dot products are built as left-to-right
chained sums so Spark's codegen, DuckDB, and pure Python produce
bit-identical IEEE doubles → identical argmax cells; ties break to the
lowest cell index in every engine (numpy argmax, CASE chain order).
At production dims the engine path switches to one float64 matmul +
argmax per Arrow batch inside mapInPandas (O(1) plan nodes; cell can
differ from the expr path only for dots within rounding of a tie —
irrelevant for recall).
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.operators.similarity import (
    EXPR_NODE_BUDGET,
    cosine_topk,
)

DEFAULT_IVF_NLIST = 64
DEFAULT_IVF_NPROBE = 8
DEFAULT_IVF_SEED = 42
# FAISS-style training-sample budget: k-means quality saturates around a
# few hundred points per cell; sampling caps driver memory at
# nlist × sample_per_cell vectors regardless of corpus size.
DEFAULT_TRAIN_SAMPLE_PER_CELL = 256


def seeded_centroids(
    dim: int, nlist: int = DEFAULT_IVF_NLIST, seed: int = DEFAULT_IVF_SEED
) -> np.ndarray:
    """Data-independent quantizer: ``nlist`` unit-norm gaussian directions,
    regenerated identically anywhere from (dim, nlist, seed) — the seed is
    the only state a deterministic/oracle run needs to ship."""
    rng = np.random.RandomState(seed)
    c = rng.standard_normal((nlist, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_centroids(
    emb: DataFrame,
    dim: int,
    nlist: int = DEFAULT_IVF_NLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_IVF_SEED,
    sample_per_cell: int = DEFAULT_TRAIN_SAMPLE_PER_CELL,
    iters: int = 10,
) -> np.ndarray:
    """Deterministic spherical k-means over a hash-sampled slice →
    (nlist × dim) unit-norm centroids.

    Every source of nondeterminism is pinned: the sample is a pure
    function of the row id (hash_sample_col — stable under retries and
    repartitioning), rows are sorted by id before training, k-means++
    init uses a seeded RandomState, and the Lloyd iteration count is
    fixed.  Same input + same args → bit-identical centroids on any
    engine/cluster, so a quantizer trained once can be re-derived for
    verification instead of trusted as a blob.

    Driver memory is bounded by nlist × sample_per_cell vectors (the
    FAISS IndexIVF training recipe); the one count() job that sizes the
    sampling fraction is a bounded scalar aggregate.
    """
    from project_gutenberg_full_text_search_spark.operators.etl import hash_sample_col

    cap = nlist * sample_per_cell
    src = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    n = src.count()
    if n == 0:
        raise ValueError("cannot train IVF centroids on an empty table")
    if n > cap:
        # slight over-sample so hash jitter can't undershoot the cap badly
        src = src.filter(hash_sample_col("_id", min(1.0, 1.25 * cap / n), seed))
    rows = src.orderBy("_id").collect()
    X = np.stack([np.asarray(r._v, dtype=np.float64) for r in rows])[:cap]
    if X.shape[1] != dim:
        raise ValueError(f"embedding length != declared dim {dim}: got {X.shape[1]}")
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Xn = X / norms

    k = min(nlist, len(Xn))
    rng = np.random.RandomState(seed)
    # k-means++ init on cosine distance (1 - dot of unit vectors)
    centroids = np.empty((k, dim))
    centroids[0] = Xn[rng.randint(len(Xn))]
    d2 = np.maximum(1.0 - Xn @ centroids[0], 0.0)
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(Xn), 1.0 / len(Xn))
        centroids[i] = Xn[rng.choice(len(Xn), p=probs)]
        d2 = np.minimum(d2, np.maximum(1.0 - Xn @ centroids[i], 0.0))
    for _ in range(iters):
        assign = np.argmax(Xn @ centroids.T, axis=1)
        for i in range(k):
            members = Xn[assign == i]
            if len(members) == 0:
                continue  # empty cell keeps its old centroid — deterministic
            m = members.mean(axis=0)
            nm = np.linalg.norm(m)
            if nm > 0:
                centroids[i] = m / nm
    if k < nlist:
        # fewer sample rows than cells: pad with seeded directions so the
        # quantizer shape is always (nlist, dim) as declared
        pad = seeded_centroids(dim, nlist - k, seed + 1)
        centroids = np.vstack([centroids, pad])
    return centroids


def _dot_terms(vec_expr_col, row: np.ndarray) -> Column:
    """Left-to-right fold Σ_d w_d · v[d] via aggregate(zip_with(...)) —
    the fold's association ((0 + t₀) + t₁) + … is bit-identical to the
    SQL/Python twins' chained sums (0.0 + x ≡ x in IEEE), while keeping
    the expression tree shallow: a literal chained sum of 64 products
    nests 64 deep, and nlist of those inside one argmax blew past
    janino's method-size limit (observed at nlist=16 × dim=64)."""
    weights = F.array(*[F.lit(float(w)) for w in row])
    return F.aggregate(
        F.zip_with(weights, vec_expr_col, lambda w, x: w * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_dot_sql(vec_expr: str, row: np.ndarray) -> str:
    """DuckDB fragment for the identical chained-sum dot product."""
    return " + ".join(
        f"({float(w)!r} * {vec_expr}[{d + 1}]::DOUBLE)" for d, w in enumerate(row)
    )


def ivf_cell_py(vec, centroids: np.ndarray) -> int:
    """Pure-Python twin of the cell assignment (query-side routing)."""
    best_d, best_i = None, 0
    for i, row in enumerate(centroids):
        d = reduce(
            lambda acc, t: acc + t,
            (float(w) * float(x) for w, x in zip(row, vec)),
        )
        if best_d is None or d > best_d:
            best_d, best_i = d, i
    return best_i


def query_probe_cells(query_vec, centroids: np.ndarray, nprobe: int) -> list[int]:
    """The query's ``nprobe`` nearest cells, ranked by (dot DESC, cell ASC)
    with the same chained-sum dots as the SQL twin — bit-identical probe
    sets across engines."""
    dots = []
    for i, row in enumerate(centroids):
        d = reduce(
            lambda acc, t: acc + t,
            (float(w) * float(x) for w, x in zip(row, query_vec)),
        )
        dots.append((i, d))
    dots.sort(key=lambda t: (-t[1], t[0]))
    return [i for i, _ in dots[:nprobe]]


def with_ivf_cell(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    out_col: str = "_cell",
    method: str = "auto",
    expect_dim: int | None = None,
) -> DataFrame:
    """Append each row's Voronoi cell (argmax dot over unit centroids,
    ties → lowest index) as ``out_col``.

    method='expr'   — per-centroid chained-sum dot columns + greatest/CASE
                      argmax (bit-identical to the DuckDB/Python twins;
                      viable while nlist×dim fits the codegen budget).
    method='fold'   — the SAME left-to-right fold dots, batch-vectorized
                      in numpy inside mapInPandas (similarity.fold_dots_np
                      — one IEEE multiply+add per step in expression
                      order, never a BLAS matmul): bit-identical cells to
                      'expr' at any size, without the interpreted
                      per-row HOF evaluation 'expr' pays (Catalyst
                      ``aggregate``/``zip_with`` are CodegenFallback).
    method='pandas' — one ``batch @ centroids.T`` float64 matmul + argmax
                      per Arrow batch inside mapInPandas: O(1) plan nodes
                      at any dim (np.argmax also breaks ties low); dots
                      may differ from the fold twins within summation-
                      reorder rounding (irrelevant for recall).
    method='auto'   — 'fold' while nlist×dim ≤ EXPR_NODE_BUDGET else
                      'pandas'.

    ``expect_dim``: fail LOUDLY on rows whose vector length differs —
    a short vector would otherwise land in a cell probes never read
    (silent recall loss), same hazard as the LSH path.
    """
    nlist, dim = centroids.shape
    if method == "auto":
        # the argmax expression embeds the dot array twice (once for
        # array_max, once for array_position), hence the factor 2
        method = "fold" if 2 * nlist * dim <= EXPR_NODE_BUDGET else "pandas"
    if method == "expr":
        # argmax as array_position(arr, array_max(arr)): the dot array is
        # ONE expression (each chained-sum dot evaluated inside the array
        # constructor), and array_position returns the FIRST match —
        # lowest index on ties, same as numpy argmax and the SQL twin's
        # ascending CASE.  Materializing dots as named columns instead
        # would invite Catalyst's projection collapse to inline every dot
        # into every argmax comparison — an O(nlist²·dim) tree that blows
        # past codegen limits (observed at nlist=16 × dim=64).
        dots = F.array(*[_dot_terms(F.col(vec_col), row) for row in centroids])
        cell = (F.array_position(dots, F.array_max(dots)) - 1).cast("long")
        if expect_dim is not None:
            cell = F.when(F.size(F.col(vec_col)) == expect_dim, cell).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"embedding length != declared dim {expect_dim}: got "),
                        F.size(F.col(vec_col)).cast("string"),
                    )
                ).cast("long")
            )
        return df.withColumn(out_col, cell)

    from pyspark.sql.types import LongType, StructField, StructType

    if method not in ("fold", "pandas"):
        raise ValueError(f"unknown with_ivf_cell method {method!r}")
    schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])
    C = centroids.astype(np.float64)
    use_fold = method == "fold"

    def gen(batches):
        from project_gutenberg_full_text_search_spark.operators.similarity import (
            fold_dots_np,
        )

        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf[out_col] = np.array([], dtype=np.int64)
                yield pdf
                continue
            vs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if expect_dim is not None and vs.shape[1] != expect_dim:
                raise ValueError(
                    f"embedding length != declared dim {expect_dim}: "
                    f"got {vs.shape[1]}"
                )
            dots = fold_dots_np(vs, C) if use_fold else vs @ C.T
            pdf[out_col] = np.argmax(dots, axis=1).astype(np.int64)
            yield pdf

    return df.mapInPandas(gen, schema)


def ivf_cell_select_sql(
    table_sql: str,
    id_expr: str,
    vec_expr: str,
    centroids: np.ndarray,
    id_alias: str = "vec_id",
    vec_alias: str = "v",
    cell_alias: str = "cell",
) -> str:
    """DuckDB SELECT computing the identical cell per row: an inner layer
    evaluates each chained-sum dot ONCE as a column (mirroring the Spark
    expr path's dot-column select), a middle layer takes greatest(), and
    the outer CASE picks the lowest index hitting it — so the generated
    SQL is O(nlist·dim), not O(nlist²·dim)."""
    nlist = len(centroids)
    dots = ", ".join(
        f"({ivf_dot_sql(vec_expr, row)}) AS d{i}" for i, row in enumerate(centroids)
    )
    g = "greatest(" + ", ".join(f"d{i}" for i in range(nlist)) + ")"
    arms = " ".join(f"WHEN d{i} = g THEN {i}" for i in range(nlist))
    return (
        f"SELECT {id_alias}, {vec_alias}, (CASE {arms} END)::BIGINT AS {cell_alias} "
        f"FROM (SELECT *, {g} AS g FROM "
        f"(SELECT {id_expr} AS {id_alias}, {vec_expr}::DOUBLE[] AS {vec_alias}, "
        f"{dots} FROM {table_sql}))"
    )


def ann_ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    centroids: np.ndarray | None = None,
    nlist: int = DEFAULT_IVF_NLIST,
    nprobe: int = DEFAULT_IVF_NPROBE,
    seed: int = DEFAULT_IVF_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    round_digits: int = 4,
    method: str = "auto",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's ``nprobe``
    nearest Voronoi cells.

    The probe set is ``nprobe`` driver-side ints applied with isin(), so
    on a table written partitioned by the cell column (``write_ivf_index``)
    this is a partition-pruned scan of nprobe/nlist of the data.  With
    ``nprobe == nlist`` the result is exactly ``cosine_topk`` (every cell
    scanned) — the plumbing adds no approximation of its own.  Pass
    ``cell_col`` to use a precomputed/stored cell column, ``centroids``
    to use a trained quantizer (default: seeded data-independent one).
    """
    if centroids is None:
        centroids = seeded_centroids(len(query_vec), nlist, seed)
    probes = query_probe_cells(query_vec, centroids, nprobe)
    if cell_col is None:
        emb = with_ivf_cell(emb, vec_col, centroids, "_cell", method)
        cell_col = "_cell"
    return cosine_topk(
        emb.filter(F.col(cell_col).isin(probes)),
        query_vec,
        k,
        id_col,
        vec_col,
        round_digits,
    )


def write_ivf_index(
    emb: DataFrame,
    path: str,
    dim: int,
    centroids: np.ndarray | None = None,
    nlist: int = DEFAULT_IVF_NLIST,
    seed: int = DEFAULT_IVF_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    mode: str = "overwrite",
) -> dict:
    """Persist a cell-partitioned IVF index: parquet partitioned by the
    Voronoi cell, so probes become PARTITION-PRUNED scans of exactly the
    nprobe probed directories.  Directory fan-out is bounded by ``nlist``
    (default 64 — far below the LSH index's 2^nbits concern).

    The index is self-describing: (dim, nlist, seed) plus the FULL
    centroid matrix go to ``<path>/_ivf_meta.json`` — trained centroids
    are data-dependent, so unlike the LSH seed they must ship with the
    artifact (nlist × dim floats: a few hundred KB at production sizes,
    read once per query session).  Row vector lengths are validated
    against ``dim`` inside the assignment pass (no extra job).
    """
    import os

    if centroids is None:
        centroids = seeded_centroids(dim, nlist, seed)
    if centroids.shape[1] != dim:
        raise ValueError(
            f"centroid dim {centroids.shape[1]} != declared dim {dim}"
        )
    celled = with_ivf_cell(emb, vec_col, centroids, "cell", method, expect_dim=dim)
    celled.write.mode(mode).partitionBy("cell").parquet(path)
    meta = {
        "format": "ann-ivf-v1",
        "dim": dim,
        "nlist": int(centroids.shape[0]),
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "centroids": [[float(x) for x in row] for row in centroids],
    }
    from project_gutenberg_full_text_search_spark.sources.fsio import write_json

    write_json(os.path.join(path, "_ivf_meta.json"), meta)
    return meta


def read_ivf_index(spark, path: str) -> tuple[DataFrame, dict]:
    """Open a ``write_ivf_index`` artifact → (DataFrame with its ``cell``
    partition column, metadata dict with the centroid matrix)."""
    import os

    from project_gutenberg_full_text_search_spark.sources.fsio import read_json

    meta = read_json(os.path.join(path, "_ivf_meta.json"))
    if meta is None:
        raise FileNotFoundError(f"no IVF index metadata at {path}")
    return spark.read.parquet(path), meta


def ann_ivf_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = DEFAULT_IVF_NPROBE,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k against a persisted IVF index: the cell isin() filter lands
    on the partition column, so only the nprobe probed directories are
    scanned (PartitionFilters in the plan, no assignment recompute)."""
    df, meta = read_ivf_index(spark, path)
    if len(query_vec) != meta["dim"]:
        raise ValueError(f"query dim {len(query_vec)} != index dim {meta['dim']}")
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    return ann_ivf_topk(
        df,
        query_vec,
        k,
        centroids=centroids,
        nprobe=nprobe,
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
        cell_col="cell",
        round_digits=round_digits,
    )
