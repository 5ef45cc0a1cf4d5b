"""spark-submit entrypoint: build (or resume) the inverted index.

    spark-submit --py-files dist/pgfts.zip tools/build_job.py \
        --input  <table path or name>   # parquet dir or catalog table \
        --index-dir <output dir> \
        [--format parquet|iceberg] [--text-col content] \
        [--shards 16] [--block-range 4096] [--fingerprint <id>] \
        [--no-resume]

The job is cluster-agnostic: no master/parallelism is hardcoded — those
come from spark-submit (--master, --num-executors, ...), which is how the
N vs 4N executor scaling criterion is exercised on a real cluster. The
build is resumable per shard (atomic _checkpoints manifests); rerunning
the same command after a crash skips completed shards.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python tools/*_job.py` runs need the repo root importable;
# under spark-submit --py-files the shipped zip provides the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet path or catalog table name")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--format", default="parquet", help="parquet | iceberg | any DataSource")
    p.add_argument("--text-col", default="content")
    p.add_argument("--shards", type=int, default=1)
    p.add_argument("--block-range", type=int, default=4096)
    p.add_argument("--fingerprint", default=None, help="input lineage id (defaults to --input)")
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from project_gutenberg_full_text_search_spark.operators.build_index import build_index

    spark = SparkSession.builder.appName("pgfts-build").getOrCreate()
    try:
        if "/" in args.input or args.input.startswith("file:"):
            docs = spark.read.format(args.format).load(args.input)
        else:  # catalog table (e.g. an Iceberg table name)
            docs = spark.read.table(args.input)
        stats = build_index(
            spark,
            docs,
            args.index_dir,
            text_col=args.text_col,
            block_range=args.block_range,
            n_shards=args.shards,
            resume=not args.no_resume,
            input_fingerprint=args.fingerprint or args.input,
        )
        print(json.dumps(stats))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
