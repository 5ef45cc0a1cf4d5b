"""Table IO.

Parquet today; the reference design targets Iceberg tables (BASELINE.json
input_hint) — this sandbox has no Iceberg runtime jar, so every read/write
funnels through these two functions and the format is a config switch, not
a code change. Index tables are written sorted-within-partitions so parquet
row-group min/max stats give term-range pruning (the Spark analog of the
reference's B-tree/GIN index access paths, tables/mv_books_dc.sql:438-494).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMAT = os.environ.get("PGFTS_TABLE_FORMAT", "parquet")

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format(FORMAT).load(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.format(FORMAT).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def load_testdata(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables and register temp views."""
    out = {}
    for name in names or TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


# JSON metadata IO lives in fsio (local fast path + Hadoop FileSystem for
# hdfs://-style URIs); re-exported here because every operator imports it
# from this module.
from project_gutenberg_full_text_search_spark.sources.fsio import (  # noqa: E402,F401
    read_json,
    write_json,
)
