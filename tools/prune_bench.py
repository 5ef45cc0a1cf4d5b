"""Block-max pruning A/B at above-threshold posting mass.

`PRUNE_MIN_POSTINGS` (operators/bm25.py) decides when `bm25_topk` takes
the block-max pruned path. Below it, the pruned path's 2 extra serial
jobs lose to the vectorized full decode (measured at 50k docs, round 3);
this tool produces the OTHER half of the evidence — a corpus whose
hot-term query mass EXCEEDS the threshold, where pruning must win (or the
threshold is wrong). Results are recorded in BASELINE.md.

    python tools/prune_bench.py [--docs 2000000] [--length-scale 2.0]

Prints one JSON line:
    {"n_docs": ..., "queries": {q: {"mass": Σdf, "pruned_sec": ...,
     "unpruned_sec": ..., "speedup": ...}}}

The corpus/index live under /dev/shm and are reused across runs (resume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=2_000_000)
    p.add_argument("--length-scale", type=float, default=2.0)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--samples", type=int, default=2)
    args = p.parse_args()

    from project_gutenberg_full_text_search_spark.corpus import gen_corpus
    from project_gutenberg_full_text_search_spark.operators.bm25 import (
        PRUNE_MIN_POSTINGS,
        IndexHandle,
        bm25_topk,
    )
    from project_gutenberg_full_text_search_spark.operators.build_index import build_index
    from project_gutenberg_full_text_search_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=args.cpus,
                      app_name="prune_bench")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    docs_path = os.path.join(
        scratch, f"pgfts_prune_docs_{args.docs}_{args.length_scale}"
    )
    if not os.path.exists(docs_path):
        gen_corpus(
            spark, args.docs, seed=42, partitions=256,
            length_scale=args.length_scale,
        ).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    idx = os.path.join(scratch, f"pgfts_prune_idx_{args.docs}_{args.length_scale}")
    t0 = time.time()
    build_index(spark, docs, idx, resume=True,
                input_fingerprint=f"prune{args.docs}_{args.length_scale}")
    build_sec = time.time() - t0
    h = IndexHandle.open(spark, idx)

    queries = {
        "single_hot": "index",
        "and_hot2": "index query",
        "and_hot3": "index query token",
        "and_hot5": "index query token merge block",
        "or_hot3": "index or query or token",
        "phrase_hot": '"merge sorted posting"',
    }
    out = {"n_docs": args.docs, "threshold": PRUNE_MIN_POSTINGS,
           "build_sec": round(build_sec, 1), "queries": {}}
    for name, q in queries.items():
        from project_gutenberg_full_text_search_spark.plans.parser import parse_websearch

        pq = parse_websearch(q)
        mass = sum(h.term_stats(pq.positive_terms).values())
        rec = {"mass": mass, "above_threshold": mass >= PRUNE_MIN_POSTINGS}
        for mode, prune in (("pruned", True), ("unpruned", False)):
            bm25_topk(h, q, k=args.k, prune=prune).collect()  # warm
            samples = []
            for _ in range(args.samples):
                t = time.time()
                rows = bm25_topk(h, q, k=args.k, prune=prune).collect()
                samples.append(time.time() - t)
            rec[f"{mode}_sec"] = round(min(samples), 3)
            rec[f"{mode}_rows"] = len(rows)
        rec["speedup"] = round(rec["unpruned_sec"] / rec["pruned_sec"], 2)
        out["queries"][name] = rec
        print(f"# {name}: mass={mass} pruned={rec['pruned_sec']} "
              f"unpruned={rec['unpruned_sec']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
