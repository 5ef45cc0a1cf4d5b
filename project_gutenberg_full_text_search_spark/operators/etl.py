"""Build-plane ETL operators — the MV-construction analogs.

The reference materializes one denormalized wide row per book from a
normalized star (tables/mv_books_dc.sql:32-133 scalar columns,
:196-430 the nested `dc` jsonb built from correlated subqueries + json
aggregation). These operators re-express that construction as grouped
struct-array aggregations (B2 string agg, B4 array agg, B11 nested-doc
construction) plus the ANALYZE analog (B18) and sorted-table writes
(B13) — each one shuffle per bridge table, dimension sides broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.sources.tables import write_json


def _agg_bridge(
    bridge: DataFrame,
    dim: DataFrame,
    name_col: str,
    out_arr: str,
    out_str: str | None = None,
) -> DataFrame:
    """bridge(fk_docs, fk_*) × dim(pk, name) → per-doc sorted struct array
    (+ optional ' | '-joined flat string, id-ordered like the MV's
    correlated string_agg, mv_books_dc.sql:43-47)."""
    fk = [c for c in bridge.columns if c != "fk_docs"][0]
    joined = bridge.join(F.broadcast(dim), bridge[fk] == dim["pk"])
    aggs = [
        F.array_sort(
            F.collect_list(F.struct(F.col("pk").alias("id"), F.col(name_col)))
        ).alias(out_arr)
    ]
    out = joined.groupBy("fk_docs").agg(*aggs)
    if out_str:
        out = out.withColumn(
            out_str,
            F.concat_ws(
                " | ", F.transform(F.col(out_arr), lambda s: s[name_col])
            ),
        )
    return out.withColumnRenamed("fk_docs", "doc_id")


def denormalize_docs_dc(
    doc_ids: DataFrame,
    subjects: DataFrame,
    bookshelves: DataFrame,
    mn_docs_subjects: DataFrame,
    mn_docs_bookshelves: DataFrame,
) -> DataFrame:
    """B11: assemble the nested document (dc struct) + flattened search
    strings from the normalized star — the Spark twin of the MV's
    json-aggregation subqueries (mv_books_dc.sql:196-430). Missing
    bridges become empty arrays/strings, as COALESCE does in the MV.

    Returns (doc_id, all_subjects, dc: struct<subjects, bookshelves>).
    """
    subj = _agg_bridge(
        mn_docs_subjects, subjects, "subject", "subjects_arr", "all_subjects"
    )
    shelf = _agg_bridge(
        mn_docs_bookshelves, bookshelves, "bookshelf", "bookshelves_arr"
    )
    empty_subj = F.array().cast("array<struct<id:bigint,subject:string>>")
    empty_shelf = F.array().cast("array<struct<id:bigint,bookshelf:string>>")
    return (
        doc_ids.select("doc_id")
        .join(subj, "doc_id", "left")
        .join(shelf, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("all_subjects", F.lit("")).alias("all_subjects"),
            F.struct(
                F.coalesce("subjects_arr", empty_subj).alias("subjects"),
                F.coalesce("bookshelves_arr", empty_shelf).alias("bookshelves"),
            ).alias("dc"),
        )
    )


def analyze_table(
    df: DataFrame, cols: list[str] | None = None, rsd: float = 0.05
) -> dict:
    """B18: the ANALYZE analog — per-column min/max/null-count/approx-NDV
    in ONE aggregation pass (HyperLogLog++ via approx_count_distinct,
    so a 100 TB table costs one scan, no exact-distinct shuffle).

    Returns {"n_rows": N, "columns": {col: {min, max, nulls, ndv}}}.
    """
    cols = cols or [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("long", "integer", "double", "float", "string", "date", "timestamp")
    ]
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__ndv"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    out = {"n_rows": row["__n"], "columns": {}}
    for c in cols:
        mn, mx = row[f"{c}__min"], row[f"{c}__max"]
        out["columns"][c] = {
            "min": mn.isoformat() if hasattr(mn, "isoformat") else mn,
            "max": mx.isoformat() if hasattr(mx, "isoformat") else mx,
            "nulls": row[f"{c}__nulls"],
            "ndv": row[f"{c}__ndv"],
        }
    return out


def write_sorted_table(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partitions: int | None = None,
    stats_path: str | None = None,
) -> None:
    """B13: the B-tree-index analog for columnar storage — range-partition
    then sort within partitions on the key columns before writing, so
    parquet row-group min/max statistics on those columns become a sorted
    sparse index: a point/range predicate prunes to O(1) row groups
    exactly like a B-tree descent (the reference's 8 B-tree indexes,
    mv_books_dc.sql:439-459, serve the same predicates). Optionally emits
    ANALYZE stats alongside.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    if stats_path:
        back = df.sparkSession.read.parquet(path)
        write_json(stats_path, analyze_table(back, cols=sort_cols))


def read_sorted_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path))


def hash_sample_col(id_col: str | F.Column, fraction: float, seed: int = 42):
    """Deterministic, engine-portable sampling predicate.

    keep iff md5_long('seed:' || id) % 1_000_000 < fraction·1_000_000 —
    unlike rand()-based sampling this is (a) reproducible across engines
    (the DuckDB oracle computes the identical predicate — see
    hash_sample_sql), (b) stable under repartitioning/retries (pure
    function of the row, not of task order), and (c) consistent across
    tables keyed by the same id (sampling docs and their embeddings with
    the same seed keeps them aligned). The standard trick for carving
    reproducible training-data subsets at any scale.
    """
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_col,
    )

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (seeded_hash_col(c.cast("string"), seed) % 1_000_000) < int(
        round(fraction * 1_000_000)
    )


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    return df.filter(hash_sample_col(id_col, fraction, seed))


def hash_sample_sql(id_expr: str, fraction: float, seed: int = 42) -> str:
    """DuckDB predicate selecting the identical sample."""
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_sql,
    )

    return (
        f"({seeded_hash_sql(f'{id_expr}::VARCHAR', seed)} % 1000000)"
        f" < {int(round(fraction * 1_000_000))}"
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-group deterministic hash sampling — the training-mix carver.

    Each group keeps its own fraction (unlisted groups keep `default`),
    decided by the same engine-portable md5 hash as `hash_sample`, so the
    result is reproducible, retry/repartition-stable, and cross-table
    aligned by id. The per-row threshold is a literal CASE on the group
    column — zero shuffle, zero join: a pure codegen'd filter that
    partition-prunes like any other predicate. This is how a 100 TB
    corpus gets re-weighted into a training mix (downsample the dominant
    language, keep all of a rare one) in a single scan.
    """
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_col,
    )

    thresh = None
    for g, frac in sorted(fractions.items()):
        v = F.lit(int(round(frac * 1_000_000)))
        cond = F.col(group_col) == F.lit(g)
        thresh = F.when(cond, v) if thresh is None else thresh.when(cond, v)
    default_lit = F.lit(int(round(default * 1_000_000)))
    thresh = default_lit if thresh is None else thresh.otherwise(default_lit)
    h = seeded_hash_col(F.col(id_col).cast("string"), seed)
    return df.filter((h % 1_000_000) < thresh)


def stratified_sample_sql(
    group_expr: str,
    id_expr: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: int = 42,
) -> str:
    """DuckDB predicate selecting the identical stratified sample."""
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_sql,
    )

    whens = " ".join(
        f"WHEN '{g}' THEN {int(round(frac * 1_000_000))}"
        for g, frac in sorted(fractions.items())
    )
    case = f"(CASE {group_expr} {whens} ELSE {int(round(default * 1_000_000))} END)"
    return f"({seeded_hash_sql(f'{id_expr}::VARCHAR', seed)} % 1000000) < {case}"


def group_cap_sample(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep at most `cap` rows per group, chosen by deterministic hash
    rank (row_number over the group ordered by (md5 hash, id)).

    Exact and reproducible: the survivors are a pure function of row
    content, not of task order, so retries/repartitioning cannot change
    them, and the same cap on two engines picks the same rows (DuckDB
    twin: QUALIFY row_number() OVER (PARTITION BY g ORDER BY hash, id)
    <= cap). One shuffle keyed by the group column; a group lands in a
    single task, so for groups ≫ cap at corpus scale pre-thin with
    `stratified_sample`/`hash_sample` first (the cap stays exact over
    the thinned set) or prefer pure-fraction stratification, which never
    shuffles.
    """
    from pyspark.sql import Window

    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_col,
    )

    h = seeded_hash_col(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shard`` (uniform md5-hash bucket) and a 0-based ``pos`` within the
    shard (ordered by hash, ties by id) — the reproducible random read
    order a training loader consumes.

    Why not ``ORDER BY rand()``: hash order is (a) a pure function of
    row id + seed, so retries/repartitioning/engines all agree (DuckDB
    twin: `shuffle_shards_sql`), and (b) shardable — no global sort.
    Scale shape: one shuffle keyed by shard (hash-uniform by
    construction, no skew) and a per-shard sort; pick ``n_shards`` so a
    shard fits a task (e.g. 100 TB / 16k shards ≈ 6 GB sorts of just
    (id, hash) pairs — the payload is re-joined by the loader, never
    sorted). Changing the seed reshuffles every epoch deterministically.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql import Window

    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_col,
    )

    h = seeded_hash_col(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.select(
            F.col(id_col),
            h.alias("_h"),
            (h % n_shards).cast("int").alias("shard"),
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


def shuffle_shards_sql(
    table: str, n_shards: int, id_col: str = "doc_id", seed: int = 42
) -> str:
    """DuckDB twin of :func:`shuffle_shards` (identical shard + pos)."""
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_sql,
    )

    h = seeded_hash_sql(f"{id_col}::VARCHAR", seed)
    return f"""SELECT {id_col},
               ({h} % {n_shards})::INT AS shard,
               (row_number() OVER (PARTITION BY ({h} % {n_shards})
                                   ORDER BY {h}, {id_col}) - 1)::BIGINT AS pos
        FROM {table}"""


def pack_token_budget(
    df: DataFrame,
    budget: int,
    text_col: str = "content",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixed-token-budget shard packing.

    Training-data prep ends with "write shards of ~N tokens each". This
    assigns every doc a (bucket, pack_id): docs hash into `n_buckets`
    independent streams, and within a bucket (ordered by id) a doc joins
    pack p when its cumulative token count lands in (p·budget,
    (p+1)·budget] — a window prefix-sum, so a pack closes as soon as the
    running total crosses the budget (packs overshoot by at most one
    doc, never undershoot by more than the next doc's length).

    Scale shape: the only shuffle is the window's partition-by-bucket —
    each bucket is a 1/n_buckets slice of the corpus, so no single-task
    bottleneck (a GLOBAL order-by window would serialize the corpus
    through one reducer); raise n_buckets to keep slices executor-sized.
    Deterministic and engine-portable end to end: bucket is the md5 hash
    of the id, order is the id, token count is the tokenizer's — the
    DuckDB twin reproduces every pack assignment bit-for-bit.
    """
    from pyspark.sql import Window

    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_col,
    )
    from project_gutenberg_full_text_search_spark.functions.text import doc_len_col

    bucket = (seeded_hash_col(F.col(id_col).cast("string"), seed) % n_buckets).cast(
        "int"
    )
    with_cols = df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        doc_len_col(text_col).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    pack = F.floor((F.greatest(cum, F.lit(1)) - 1) / budget).cast("long")
    return with_cols.withColumn("pack_id", pack)


def pack_token_budget_sql(
    table: str,
    budget: int,
    toks_len_expr: str,
    id_expr: str = "doc_id",
    n_buckets: int = 1024,
    seed: int = 42,
) -> str:
    """DuckDB twin producing identical (bucket, pack_id) assignments."""
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_sql,
    )

    h = seeded_hash_sql(f"{id_expr}::VARCHAR", seed)
    return f"""
WITH b AS (
  SELECT {id_expr} AS doc_id,
         ({h} % {n_buckets})::INT AS bucket,
         ({toks_len_expr})::BIGINT AS n_tokens
  FROM {table}
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM b
)
SELECT doc_id, bucket, n_tokens,
       floor((greatest(cum, 1) - 1) / {budget})::BIGINT AS pack_id
FROM c"""


def chunk_windows(
    df: DataFrame,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding token-window chunking — the context-window carver.

    Splits every document into ``window``-token chunks advancing by
    ``stride`` tokens (overlap = window - stride), the standard step
    between "cleaned corpus" and "model-ready sequences": LM training
    examples, embedding-model passages, retrieval windows. Emits
    (doc_id, chunk_id, n_tokens, chunk_text); the final chunk is the
    short tail (never padded), empty docs emit nothing.

    Scale shape: pure row-local column algebra — tokenize, compute the
    chunk count with integer arithmetic, explode a ``sequence``, slice —
    zero UDF, zero shuffle, so it pipelines inside the scan's codegen
    stage and the output is written without any exchange. The ~window/
    stride row fan-out happens inside the task, not across the wire.
    Reference analog: the per-doc text assembly that mv_books_dc.sql's
    tsvector build performs before indexing (reference mv_books_dc.sql),
    re-aimed at training-data prep.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # stride > window would skip tokens AND emit an empty trailing
        # chunk whenever stride divides into the tail; gap-sampling is a
        # different operator (hash_sample the chunks instead)
        raise ValueError("stride must be <= window (no-gap chunking)")
    # The token array is MATERIALIZED as a named column and the chunks are
    # built as a per-doc struct array BEFORE the explode. Two measured
    # traps in the naive explode(ids)-then-slice form (sf1.0, single
    # task): (1) the token array flows THROUGH the Generate, so every
    # chunk row re-serializes the whole ~doc-length array (3.5 s); (2) a
    # transform() lambda that closes over the un-materialized split
    # expression re-tokenizes per CHUNK (6.2 s — HOFs are CodegenFallback
    # with no subexpression elimination). Materialized-column +
    # transform-then-explode does the slicing row-locally and ships only
    # the chunk structs: 1.37 s same task — OPTIMIZATION_r06.md.
    toks = F.col("_toks")
    n = F.size(toks)
    # integer-exact chunk count (engine-portable, no float ceil):
    # 0 for empty docs, 1 while n <= window, else 1 + ceil((n-window)/stride)
    extra = F.floor(
        (n - F.lit(window) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= window, F.lit(1))
        .otherwise(F.lit(1) + extra)
    )
    chunk_struct_t = "array<struct<chunk_id:int,n_tokens:int,chunk_text:string>>"
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            # sequence(0, -1) would produce a DESCENDING sequence (Spark
            # defaults step to -1 when start > stop) — the when() guard
            # keeps the sequence non-empty
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.least(F.lit(window), n - i * stride).cast("int").alias("n_tokens"),
                F.array_join(F.slice(toks, i * stride + 1, window), " ").alias(
                    "chunk_text"
                ),
            ),
        ),
    ).otherwise(F.array().cast(chunk_struct_t))
    return (
        df.select(
            F.col(id_col),
            F.array_remove(F.split(F.col(text_col), r"\s+"), "").alias("_toks"),
        )
        .select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            F.col(id_col),
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


def chunk_windows_sql(
    table: str,
    window: int,
    stride: int,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin producing identical (doc_id, chunk_id, n_tokens,
    chunk_text) rows (list slice is 1-based inclusive-inclusive)."""
    w, s = window, stride
    return rf"""
WITH t AS (
  SELECT {id_expr} AS doc_id,
         list_filter(regexp_split_to_array({text_expr}, '\s+'), x -> x <> '') AS ws
  FROM {table}
),
c AS (
  SELECT doc_id, ws, len(ws) AS n,
         CASE WHEN len(ws) <= 0 THEN 0
              WHEN len(ws) <= {w} THEN 1
              ELSE 1 + CAST(floor((len(ws) - {w} + {s - 1})::DOUBLE / {s}) AS INT)
         END AS nc
  FROM t
),
e AS (SELECT doc_id, ws, n, unnest(range(nc)) AS cid FROM c)
SELECT doc_id,
       cid::INT AS chunk_id,
       least({w}, n - cid * {s})::INT AS n_tokens,
       array_to_string(ws[cid * {s} + 1 : cid * {s} + {w}], ' ') AS chunk_text
FROM e"""
