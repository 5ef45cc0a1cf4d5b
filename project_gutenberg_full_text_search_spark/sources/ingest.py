"""Raw-corpus ingestion: JSONL / CSV / text files → the canonical docs table.

The reference ingests from a Postgres catalog dump; a Spark training-data
pipeline ingests raw files. Every reader here lands on ONE canonical
schema — ``doc_id bigint, text string, lang string, source string,
n_chars bigint`` (the shape of the driver's ``documents`` table) — so the
whole operator surface (index build, dedup, quality gates, chunking,
packing) runs unchanged on ingested corpora.

Scale notes, per format:

- JSONL (``read_jsonl``): Spark's native json reader — plain ``.jsonl``
  splits by line across executors; ``.jsonl.gz`` is readable but gzip is
  NOT splittable (one task per file), so shard large gzipped corpora into
  many files upstream.
- CSV (``read_csv_docs``): native csv reader, splittable unless quoted
  newlines force ``multiLine`` (which is per-file, like gzip).
- One-doc-per-file text (``read_text_files``): ``wholetext`` — each task
  materializes whole files, so per-file size must fit executor memory;
  fine for document corpora, wrong for single multi-GB files.
- One-doc-per-line text (``read_text_lines``): fully splittable; the
  right shape for massive single-file corpora.

Synthesized ids (when the source has none) are ``xxhash64(text)`` —
deterministic under retries and repartitioning (a requirement everywhere
else in this engine; cf. the hash-sampling operator). Exact-duplicate
texts therefore collapse to one id, which downstream exact-dedup would do
anyway; pass ``id_col`` when distinct rows with equal text must survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA_DDL = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
_CANON_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def normalize_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    lang_col: str | None = None,
    source_col: str | None = None,
    source: str | None = None,
) -> DataFrame:
    """Project any row shape onto the canonical docs schema.

    ``source`` is a constant label (e.g. the dataset name); ``source_col``
    an existing column — exactly one may be given. Missing lang stays
    null. Rows with null/empty text are DROPPED (they carry nothing any
    downstream operator can use, and a null text would poison tokenizers).
    """
    if source is not None and source_col is not None:
        raise ValueError("pass source or source_col, not both")
    if text_col not in df.columns:
        raise ValueError(f"text column {text_col!r} not in {df.columns}")
    text = F.col(text_col).cast("string")
    out = df.filter(text.isNotNull() & (F.length(text) > 0))
    doc_id = (
        F.col(id_col).cast("bigint") if id_col else F.xxhash64(text)
    )
    lang = F.col(lang_col).cast("string") if lang_col else F.lit(None).cast("string")
    if source_col is not None:
        src = F.col(source_col).cast("string")
    else:
        src = F.lit(source).cast("string")
    return out.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        src.alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source: str | None = None,
) -> DataFrame:
    """One JSON object per line (``.jsonl`` / ``.jsonl.gz``) → canonical
    docs. ``source`` defaults to the originating file path (partition-
    pruned metadata column, no extra IO)."""
    raw = spark.read.json(path)
    if source is None:
        raw = raw.withColumn("_src_file", F.input_file_name())
        return normalize_docs(
            raw, text_field, id_col=id_field, lang_col=lang_field,
            source_col="_src_file",
        )
    return normalize_docs(
        raw, text_field, id_col=id_field, lang_col=lang_field, source=source
    )


def read_csv_docs(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source: str | None = None,
    header: bool = True,
    multi_line: bool = False,
) -> DataFrame:
    """CSV → canonical docs. ``multi_line=True`` only when text cells
    contain quoted newlines (costs splittability)."""
    raw = (
        spark.read.option("header", header)
        .option("multiLine", multi_line)
        .option("escape", '"')
        .csv(path)
    )
    if source is None:
        raw = raw.withColumn("_src_file", F.input_file_name())
        return normalize_docs(
            raw, text_field, id_col=id_field, lang_col=lang_field,
            source_col="_src_file",
        )
    return normalize_docs(
        raw, text_field, id_col=id_field, lang_col=lang_field, source=source
    )


def read_text_files(
    spark: SparkSession, path: str, source: str | None = None
) -> DataFrame:
    """One document per FILE (``wholetext``) → canonical docs; doc_id is
    the hash of the file path (stable across runs), source the file path."""
    raw = (
        spark.read.text(path, wholetext=True)
        .withColumn("_src_file", F.input_file_name())
        .withColumn("_fid", F.xxhash64(F.input_file_name()))
    )
    if source is None:
        return normalize_docs(
            raw, "value", id_col="_fid", source_col="_src_file"
        )
    return normalize_docs(raw, "value", id_col="_fid", source=source)


def read_text_lines(
    spark: SparkSession, path: str, source: str | None = None
) -> DataFrame:
    """One document per LINE → canonical docs (fully splittable; the shape
    for massive single-file corpora). doc_id = xxhash64(line)."""
    raw = spark.read.text(path)
    if source is None:
        raw = raw.withColumn("_src_file", F.input_file_name())
        return normalize_docs(raw, "value", source_col="_src_file")
    return normalize_docs(raw, "value", source=source)
