"""spark-submit entrypoint: run queries against a built index.

    spark-submit --py-files dist/pgfts.zip tools/query_job.py \
        --index-dir <dir> --query 'merge -cache' [--type fts|fuzzy|contains] \
        [--k 25] [--docs <path>]   # --docs required for contains verify

Prints one JSON line per result row (doc_id, score).
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
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--type", default="fts", choices=["fts", "fuzzy", "contains"])
    p.add_argument("--k", type=int, default=25)
    p.add_argument("--docs", default=None, help="docs parquet (contains verify)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle, bm25_topk
    from project_gutenberg_full_text_search_spark.operators.contains import contains_search
    from project_gutenberg_full_text_search_spark.operators.fuzzy import fuzzy_search

    spark = SparkSession.builder.appName("pgfts-query").getOrCreate()
    try:
        h = IndexHandle.open(spark, args.index_dir)
        if args.type == "fts":
            rows = bm25_topk(h, args.query, k=args.k).collect()
        elif args.type == "fuzzy":
            rows = fuzzy_search(h, args.query, k=args.k).collect()
        else:
            if not args.docs:
                raise SystemExit("--docs is required for contains (exact verify)")
            docs = spark.read.parquet(args.docs)
            rows = (
                contains_search(h, docs, args.query)
                .select("doc_id")
                .limit(args.k)
                .collect()
            )
        for r in rows:
            print(json.dumps(r.asDict()))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
