"""BM25 ranked retrieval over the posting-block index.

Replaces the reference's ``tsvec @@ websearch_to_tsquery(...)`` match +
``ts_rank_cd`` ordering (search/full_text_search.py:137-140, 275-282) with
from-scratch BM25 (k1=1.2, b=0.75, north_star-mandated) over the block
postings built by operators/build_index.py.

Execution shape (all declarative except the vectorized block decode):

1. Partition-prune: postings filtered by ``tbucket`` (partition column) and
   ``term`` (parquet min/max) — only the query terms' blocks are read.
2. Optional block-max prune: for top-k queries, blocks whose best-possible
   score cannot reach the score floor of a greedy driver-side pass over
   block metadata are skipped before decoding (block-max WAND adapted to
   batch execution; see ``_prune_blocks``).
3. Vectorized decode (mapInPandas, numpy varint) → (doc_id, term, tf, dl
   [, positions]).
4. JVM-side scoring: score = idf(term) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl));
   per-doc aggregation with ``collect_set(term)`` for boolean-clause
   evaluation and a positions map for phrase adjacency — both evaluated as
   Catalyst expressions (``F.exists``/``array_contains``), no Python.
5. NOT terms: left-anti join on the negated terms' doc ids.
6. Top-k via ``orderBy(score desc, doc_id asc).limit(k)`` →
   TakeOrderedAndProject (per-partition heaps + single driver merge).

Determinism: scores are computed from exact integer (tf, df, dl) with one
float expression per (term,doc) and summed per doc; ties ordered by
(round(score,4) DESC, doc_id ASC) so rank output is stable across
partitionings and matches the DuckDB oracle.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from project_gutenberg_full_text_search_spark import BM25_B, BM25_K1
from project_gutenberg_full_text_search_spark.functions.codec import (
    delta_decode,
    varint_decode,
)
from project_gutenberg_full_text_search_spark.functions.hashing import md5_long_py
from project_gutenberg_full_text_search_spark.operators.build_index import N_TBUCKETS
from project_gutenberg_full_text_search_spark.plans.parser import ParsedQuery, parse_websearch
from project_gutenberg_full_text_search_spark.sources import fsio
from project_gutenberg_full_text_search_spark.sources.tables import read_json


def idf(N: int, df: int) -> float:
    """Lucene-style BM25 idf — strictly positive, matches the oracle SQL."""
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)
DECODED_POS_SCHEMA = T.StructType(
    DECODED_SCHEMA.fields + [T.StructField("positions", T.ArrayType(T.LongType()), False)]
)


@dataclass
class IndexHandle:
    spark: SparkSession
    index_dir: str
    stats: dict
    # per-handle df cache: a pruned top-k otherwise re-collects the same
    # ≤|query| df rows in three separate jobs (topk gate, prune metadata,
    # each blockagg). Consistent by construction: a handle is a snapshot
    # of one index state — after an incremental refresh callers re-open.
    _df_cache: dict = field(default_factory=dict)
    _trigram_df: dict | None = None
    # memoized SCAN DataFrames: spark.read.parquet builds a fresh
    # InMemoryFileIndex (a full file listing) per call — ~0.1-0.5 s of
    # pure overhead on every query against a many-file index, and worse on
    # object stores where LIST is a paged RPC. One relation per handle
    # reuses the resolved FileIndex across every query (plans are
    # immutable; the handle is a snapshot of one index state by contract).
    _scan_cache: dict = field(default_factory=dict)

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str) -> "IndexHandle":
        stats = read_json(os.path.join(index_dir, "stats.json"))
        if stats is None:
            raise FileNotFoundError(f"no index at {index_dir}")
        return cls(spark, index_dir, stats)

    def _scan(self, sub: str) -> DataFrame:
        df = self._scan_cache.get(sub)
        if df is None:
            base = os.path.join(self.index_dir, sub)
            df = self.spark.read.option("basePath", base).parquet(base)
            self._scan_cache[sub] = df
        return df

    def postings(self) -> DataFrame:
        return self._scan("postings")

    def norms(self) -> DataFrame:
        from project_gutenberg_full_text_search_spark.operators.build_index import read_norms

        return read_norms(self.spark, self.index_dir)

    def terms(self) -> DataFrame:
        """Global (term, df, cf) — MERGE-ON-READ over per-shard partial
        aggregates (terms/shard=<label>): the base build and every
        incremental epoch each write only their OWN shard's term stats
        (idempotent overwrite), and the global view is a lazy sum. For a
        flat legacy layout (no shard column) the groupBy is an identity.
        The per-term filter in term_stats still prunes each shard's
        term-sorted parquet via row-group min/max before the merge."""
        df = self._scan("terms")
        if "shard" in df.columns:
            df = df.drop("shard")
        return df.groupBy("term").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf")
        )

    def trigram_terms(self) -> DataFrame:
        """Distinct (trigram, term, n_trigrams) across shards — shards'
        vocabularies overlap, and fuzzy's shared-trigram counts must not
        double-count a (trigram, term) edge that several shards carry.
        Vocabulary-sized, so the distinct is cheap at any corpus scale;
        with a single shard (no overlap possible) it is skipped entirely
        — no extra shuffle on the common fuzzy/contains path."""
        base = os.path.join(self.index_dir, "trigram_terms")
        df = self._scan("trigram_terms")
        out = df.select("trigram", "term", "n_trigrams")
        try:
            n_shards = sum(
                1 for d in fsio.listdir(base) if d.startswith("shard=")
            )
        except Exception:  # unlistable filesystem → assume multi-shard
            n_shards = 2
        return out if n_shards <= 1 else out.distinct()

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        """df per term — tiny collect (≤ query width rows), parquet-pruned;
        memoized per handle (absent terms cached as 0, never re-queried)."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            raw = self._scan("terms")
            rows = (
                raw.filter(F.col("term").isin(missing))
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            found = {r["term"]: r["df"] for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in terms if self._df_cache[t]}

    def trigram_df(self) -> dict[str, int]:
        """trigram → number of vocabulary terms containing it, memoized.

        The trigram alphabet is [a-z0-9_ ] so the map is bounded at ~50k
        entries (≤ 38³) REGARDLESS of corpus size — a few MB of driver
        memory at 100 TB just like at sf0.001.  Loading it once per handle
        turns every CONTAINS prefilter gate into pure driver arithmetic
        instead of a blocking per-query Spark job over the vocabulary
        metadata (the round-2 contains_cross_token regression)."""
        if self._trigram_df is None:
            rows = (
                self.trigram_terms()
                .groupBy("trigram")
                .agg(F.count_distinct("term").alias("n"))
                .collect()
            )
            self._trigram_df = {r["trigram"]: r["n"] for r in rows}
        return self._trigram_df

    def blocks_for(self, terms: list[str]) -> DataFrame:
        """Partition-pruned scan of the query terms' posting blocks."""
        if not terms:
            return self.postings().limit(0)
        buckets = sorted({md5_long_py(t) % N_TBUCKETS for t in terms})
        return self.postings().filter(
            F.col("tbucket").isin(buckets) & F.col("term").isin(terms)
        )

    def decode(self, terms: list[str], with_positions: bool = False) -> DataFrame:
        """Blocks → (doc_id, term, tf, dl[, positions]); vectorized numpy."""
        blocks = self.blocks_for(terms)

        def gen(batches):
            for pdf in batches:
                outs = []
                for r in pdf.itertuples(index=False):
                    ids = delta_decode(r.doc_ids_bin).astype(np.int64)
                    tfs = varint_decode(r.tfs_bin).astype(np.int64)
                    dls = varint_decode(r.dls_bin).astype(np.int64)
                    d = {
                        "doc_id": ids,
                        "term": np.repeat(r.term, len(ids)),
                        "tf": tfs,
                        "dl": dls,
                    }
                    if with_positions:
                        from project_gutenberg_full_text_search_spark.functions.codec import (
                            delta_decode_segments,
                        )

                        lens = varint_decode(r.pos_len_bin).astype(np.int64)
                        flat, cnts = delta_decode_segments(r.pos_bin, lens)
                        flat = flat.astype(np.int64)
                        d["positions"] = np.split(flat, np.cumsum(cnts)[:-1])
                    outs.append(pd.DataFrame(d))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        schema = DECODED_POS_SCHEMA if with_positions else DECODED_SCHEMA
        cols = ["term", "doc_ids_bin", "tfs_bin", "dls_bin"] + (
            ["pos_bin", "pos_len_bin"] if with_positions else []
        )
        return blocks.select(*cols).mapInPandas(gen, schema=schema)

    def decode_for(self, cand: DataFrame, payload_schema: T.StructType) -> DataFrame:
        """Decode postings for candidate terms given as a DATAFRAME — the
        index probe for vocabulary-derived candidate sets (fuzzy/contains).

        ``cand`` carries a ``term`` column plus payload columns (declared in
        ``payload_schema``, e.g. the per-term similarity) that are repeated
        onto every decoded posting row. The candidate side is broadcast and
        joined on (tbucket, term), so nothing is ever collected to the
        Python driver and the plan size stays O(1) in the candidate count —
        unlike an isin()/create_map literal formulation, which at source-
        code-corpus vocabulary sizes (unbounded identifiers) is a driver
        OOM. tbucket is derived from term on the candidate side so the
        partitioned postings scan is prunable (DPP / runtime filters).

        Returns (doc_id, term, *payload).
        """
        pay_names = [f.name for f in payload_schema.fields]
        cand_b = F.broadcast(
            cand.select("term", *pay_names).withColumn(
                "tbucket",
                F.pmod(
                    F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"),
                    F.lit(N_TBUCKETS),
                ),
            )
        )
        blocks = self.postings().join(cand_b, ["tbucket", "term"])

        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("term", T.StringType(), False),
            ]
            + list(payload_schema.fields)
        )

        def gen(batches):
            for pdf in batches:
                outs = []
                for r in pdf.itertuples(index=False):
                    ids = delta_decode(r.doc_ids_bin).astype(np.int64)
                    d = {"doc_id": ids, "term": np.repeat(r.term, len(ids))}
                    for p in pay_names:
                        v = getattr(r, p)
                        d[p] = [v] * len(ids)
                    outs.append(pd.DataFrame(d))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return blocks.select("term", "doc_ids_bin", *pay_names).mapInPandas(
            gen, schema=out_schema
        )


def _clause_predicate(pq: ParsedQuery):
    """Catalyst boolean expression over (matched: array<string>, posmap)."""
    pred = F.lit(True)
    for c in pq.clauses:
        if c.kind == "term":
            pred = pred & F.array_contains(F.col("matched"), c.terms[0])
        elif c.kind == "or":
            any_term = F.lit(False)
            for t in c.terms:
                any_term = any_term | F.array_contains(F.col("matched"), t)
            pred = pred & any_term
        elif c.kind == "phrase":
            first_pos = F.coalesce(
                F.col("posmap").getItem(c.terms[0]), F.array().cast("array<bigint>")
            )
            pred = pred & F.exists(first_pos, lambda p: _phrase_rest(c, p))
    return pred


def _phrase_rest(clause, p):
    """positions(t_i) must contain p+i for every later phrase token."""
    cond = F.lit(True)
    for i, ti in enumerate(clause.terms[1:], start=1):
        arr = F.coalesce(F.col("posmap").getItem(ti), F.array().cast("array<bigint>"))
        cond = cond & F.array_contains(arr, p + F.lit(i))
    return cond


def bm25_candidates(
    handle: IndexHandle,
    pq: ParsedQuery,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """All matching docs with BM25 scores (pre-top-k): (doc_id, score).

    Scale path (``bm25_candidates_blockagg``): posting blocks are shuffled
    COMPRESSED, keyed by block_key (doc range) so every term's postings
    for a doc range co-locate; one vectorized pass per partition decodes,
    accumulates a doc×term score matrix, evaluates boolean clauses as
    bitmasks and phrase adjacency from positions — the shuffle moves ~1
    byte/posting instead of ~40 (decoded rows), and no row-level groupBy
    exists at all. Falls back to the row-aggregation formulation for >62
    distinct terms (bitmask width).
    """
    terms = pq.positive_terms
    if len(terms) + len(pq.neg_terms) <= 62:
        return bm25_candidates_blockagg(handle, pq, k1, b)
    return bm25_candidates_rowagg(handle, pq, k1, b)


def bm25_candidates_blockagg(
    handle: IndexHandle,
    pq: ParsedQuery,
    k1: float = BM25_K1,
    b: float = BM25_B,
    block_keys=None,
) -> DataFrame:
    """block_keys: optional list[int] or DataFrame(block_key) restricting
    the scored doc ranges (used by block-max pruning — scores within a
    range are exact because block_key = doc_id // block_range is the same
    for every term)."""
    import pandas as pd

    spark = handle.spark
    terms = pq.positive_terms
    if not terms:
        raise ValueError("empty positive query")
    N = handle.stats["N"]
    avgdl = handle.stats["avgdl"]
    all_terms = sorted(set(terms) | set(pq.neg_terms))
    dfs = handle.term_stats(all_terms)
    present = [t for t in all_terms if dfs.get(t)]
    pos_present = [t for t in present if t in set(terms)]
    if not pos_present:
        return spark.createDataFrame([], "doc_id bigint, score double")

    term_idx = {t: i for i, t in enumerate(present)}
    idfs = [idf(N, dfs[t]) if t in set(terms) else 0.0 for t in present]
    pos_bits = sum(1 << term_idx[t] for t in pos_present)
    neg_bits = sum(1 << term_idx[t] for t in pq.neg_terms if t in term_idx)
    clause_masks: list[int] = []  # OR-semantics masks, all must hit
    phrase_specs: list[list[int]] = []
    satisfiable = True
    for c in pq.clauses:
        if c.kind == "phrase":
            if any(t not in term_idx for t in c.terms):
                satisfiable = False
                break
            phrase_specs.append([term_idx[t] for t in c.terms])
            continue
        m = sum(1 << term_idx[t] for t in c.terms if t in term_idx)
        if m == 0:
            satisfiable = False
            break
        clause_masks.append(m)
    if not satisfiable:
        return spark.createDataFrame([], "doc_id bigint, score double")
    need_pos = bool(phrase_specs)
    phrase_term_ids = sorted({i for spec in phrase_specs for i in spec})

    blocks = handle.blocks_for(present)
    if block_keys is not None:
        if isinstance(block_keys, DataFrame):
            # EXPLICIT broadcast — load-bearing for correctness, not a perf
            # hint. Left to itself Catalyst plans a sort-merge semi join
            # whose output is hash-partitioned by block_key, judges the
            # repartition below REDUNDANT and elides it; AQE then swaps
            # the SMJ for a broadcast join at runtime, reverting the
            # stream to scan partitioning with no exchange left — and
            # gen's one-partition-per-block_key invariant silently breaks
            # (measured at 2M docs: duplicate doc_ids with partial
            # scores). A statically-planned broadcast join never
            # satisfies the distribution requirement, so the repartition
            # always survives. The key set is ≤ blocks-above-θ rows (one
            # long each); if a corpus ever produces a survivor set too big
            # to broadcast, pruning it wouldn't help anyway — callers
            # should pass prune=False there.
            blocks = blocks.join(F.broadcast(block_keys), "block_key", "left_semi")
        else:
            blocks = blocks.filter(F.col("block_key").isin([int(x) for x in block_keys]))

    # Block-range intersection pruning (exact, distributed): every doc
    # matching the query must carry ALL single-term clauses' terms and all
    # phrase terms, so only block_keys (doc ranges) where every required
    # term has a block can contain a match. For `rare_term AND hot_term`
    # this prunes the hot term's posting scan to the rare term's ranges
    # before any decode. Metadata-only aggregation: (term, block_key).
    required = sorted(
        {
            c.terms[0]
            for c in pq.clauses
            if c.kind == "term" and c.terms[0] in term_idx
        }
        | {t for c in pq.clauses if c.kind == "phrase" for t in c.terms}
    )
    # Selectivity gate (driver arithmetic, guide §3.2 "when selective"):
    # the intersection is a pure PREFILTER — skipping it never changes the
    # result, it only decodes blocks the boolean mask would drop anyway.
    # With doc-uniform terms the chance a 4096-doc range LACKS a required
    # term of document frequency d is ~exp(-d·block_range/N), so once the
    # RAREST required term has d·block_range ≥ 8N the expected prunable
    # fraction is < e⁻⁸ and the extra aggregation + semi-join shuffle
    # round is pure overhead (hot∧hot queries at any corpus size). The
    # rare∧hot case this pruning exists for (d·block_range ≪ N) always
    # takes it.
    min_req_df = min((dfs[t] for t in required if t in dfs), default=0)
    block_range = int(handle.stats.get("block_range", 4096))
    if len(required) >= 2 and min_req_df * block_range < 8 * N:
        allowed = (
            blocks.filter(F.col("term").isin(required))
            .groupBy("block_key")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == len(required))
            .select("block_key")
        )
        blocks = blocks.join(allowed, "block_key", "left_semi")

    cols = ["term", "block_key", "doc_ids_bin", "tfs_bin", "dls_bin"] + (
        ["pos_bin", "pos_len_bin"] if need_pos else []
    )
    n_part = max(8, spark.sparkContext.defaultParallelism)
    shuffled = blocks.select(*cols).repartition(n_part, "block_key")

    idx_b = {t: i for i, t in enumerate(present)}  # closure-safe copy
    idf_arr = list(idfs)

    def gen(batches):
        doc_parts = []  # (doc_ids, term_id, tf, dl)
        pos_store: dict[int, list] = {i: [] for i in phrase_term_ids}
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ti = idx_b[r.term]
                ids = delta_decode(r.doc_ids_bin).astype(np.int64)
                tfs = varint_decode(r.tfs_bin).astype(np.float64)
                dls = varint_decode(r.dls_bin).astype(np.float64)
                doc_parts.append((ids, ti, tfs, dls))
                if need_pos and ti in pos_store:
                    # ONE segmented decode of the whole block's position
                    # payload — the former per-doc delta_decode loop paid
                    # ~20 µs of numpy fixed cost per tiny list (1.6 s
                    # across a hot phrase's 77k postings)
                    from project_gutenberg_full_text_search_spark.functions.codec import (
                        delta_decode_segments,
                    )

                    lens = varint_decode(r.pos_len_bin).astype(np.int64)
                    flat, cnts = delta_decode_segments(r.pos_bin, lens)
                    pos_store[ti].append((ids, flat.astype(np.int64), cnts))
        if not doc_parts:
            return
        all_ids = np.concatenate([p[0] for p in doc_parts])
        uniq, inv = np.unique(all_ids, return_inverse=True)
        nT = len(present)
        score_mat = np.zeros((len(uniq), nT), dtype=np.float64)
        mask = np.zeros(len(uniq), dtype=np.int64)
        off = 0
        for ids, ti, tfs, dls in doc_parts:
            rows = inv[off : off + len(ids)]
            off += len(ids)
            contrib = (
                idf_arr[ti]
                * tfs
                * (k1 + 1.0)
                / (tfs + k1 * (1.0 - b + b * dls / avgdl))
            )
            score_mat[rows, ti] = contrib  # (term, doc) unique per block_key set
            mask[rows] |= 1 << ti
        ok = np.ones(len(uniq), dtype=bool)
        for m in clause_masks:
            ok &= (mask & m) != 0
        if neg_bits:
            ok &= (mask & neg_bits) == 0
        if phrase_specs:
            # flat (doc-row, position) KEY arrays per phrase term: one
            # adjacency check is then a single np.isin over the whole
            # partition instead of a Python loop of per-candidate-doc
            # isin calls (hot-word phrases have thousands of candidates).
            # KEY packs (row, pos) into one int64: rows < 2^30 partitions
            # of unique docs, positions < 2^33 tokens per doc.
            KEY = np.int64(1) << np.int64(33)
            empty_i64 = np.empty(0, dtype=np.int64)
            # per-term flat arrays: doc-row per position + packed key
            flat_rows: dict[int, np.ndarray] = {}
            flat_keys: dict[int, np.ndarray] = {}
            for ti, chunks in pos_store.items():
                r_parts, k_parts = [], []
                for ids, flat, cnts in chunks:
                    if not len(ids):
                        continue
                    rows = np.searchsorted(uniq, ids)
                    rrep = np.repeat(rows, cnts)
                    r_parts.append(rrep)
                    k_parts.append(rrep * KEY + flat)
                flat_rows[ti] = np.concatenate(r_parts) if r_parts else empty_i64
                flat_keys[ti] = np.concatenate(k_parts) if k_parts else empty_i64
            for spec in phrase_specs:
                # restrict every term's positions to docs that (a) passed
                # the boolean clauses so far and (b) carry ALL the phrase
                # terms — for hot-word phrases this shrinks the isin
                # inputs by orders of magnitude before any sorting
                req = 0
                for i in spec:
                    req |= 1 << i
                cand_mask = ok & ((mask & req) == req)
                good = flat_keys[spec[0]][cand_mask[flat_rows[spec[0]]]]
                for step, ti in enumerate(spec[1:], start=1):
                    if not len(good):
                        break
                    nxt = flat_keys[ti][cand_mask[flat_rows[ti]]]
                    good = good[np.isin(good + step, nxt)]
                ph_ok = np.zeros(len(uniq), dtype=bool)
                if len(good):
                    ph_ok[np.unique(good // KEY)] = True
                # phrase clause: adjacency implies the doc carries every
                # phrase term (positions only exist where the term occurs)
                ok &= ph_ok
        scores = score_mat.sum(axis=1)  # fixed term order → deterministic
        sel = np.nonzero(ok)[0]
        yield pd.DataFrame({"doc_id": uniq[sel], "score": scores[sel]})

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )
    return shuffled.mapInPandas(gen, schema=out_schema)


def bm25_candidates_rowagg(
    handle: IndexHandle,
    pq: ParsedQuery,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Row-aggregation formulation (decoded rows → groupBy(doc_id));
    semantically identical reference path, used for very wide queries."""
    terms = pq.positive_terms
    if not terms:
        raise ValueError("empty positive query")
    N = handle.stats["N"]
    avgdl = handle.stats["avgdl"]
    dfs = handle.term_stats(terms)
    idf_map = {t: idf(N, dfs.get(t, 0)) for t in terms}
    present = [t for t in terms if dfs.get(t)]
    if not present:
        return handle.spark.createDataFrame(
            [], "doc_id bigint, score double"
        )

    needs_pos = any(c.kind == "phrase" for c in pq.clauses)
    decoded = handle.decode(present, with_positions=needs_pos)

    idf_expr = F.create_map(
        *[x for t in present for x in (F.lit(t), F.lit(idf_map[t]))]
    )
    scored = decoded.withColumn(
        "score_t",
        idf_expr.getItem(F.col("term"))
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
    )
    aggs = [
        F.sum("score_t").alias("score"),
        F.collect_set("term").alias("matched"),
    ]
    if needs_pos:
        aggs.append(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("posmap")
        )
    per_doc = scored.groupBy("doc_id").agg(*aggs)
    per_doc = per_doc.filter(_clause_predicate(pq))

    if pq.neg_terms:
        neg_dfs = handle.term_stats(pq.neg_terms)
        neg_present = [t for t in pq.neg_terms if neg_dfs.get(t)]
        if neg_present:
            neg_docs = handle.decode(neg_present).select("doc_id").distinct()
            per_doc = per_doc.join(neg_docs, "doc_id", "left_anti")
    return per_doc.select("doc_id", "score")


# Block-max pruning trades 2 extra SERIAL jobs (metadata collect + seed
# scoring) for a smaller final decode. Whether that ever pays was MEASURED
# both below and above the old 5M-posting auto-threshold
# (tools/prune_bench.py; full numbers in BASELINE.md):
#
#   50k docs,  mass ~10^5-3·10^5: pruned 2.0-2.6 s vs unpruned 0.6-1.1 s
#   2M docs,   mass 6M (3-term AND): pruned 5.6 s vs unpruned 2.5 s
#   2M docs,   mass 10M (5-term AND): pruned 6.3 s vs unpruned 1.1 s
#
# Pruning loses at EVERY measured mass, and the reason is structural, not
# noise: with dense doc_ids and block_range 4096, a hot term's ~4k-doc
# blocks all contain near-identical (max_tf, min_dl) — the per-block upper
# bounds are uniform, θ from the seed blocks prunes ~0% of ranges, and the
# "pruned" run is the full run plus two serial jobs. Block-max WAND's win
# condition is score mass CONCENTRATED in few doc ranges; the batch
# engine's other pruning layers already capture the realistic sources of
# that concentration (AND queries intersect block ranges exactly before
# decoding — bm25_candidates_blockagg; tbucket/min-max pruning skips
# non-query terms entirely), so the residual blockmax win requires both
# per-block impact skew AND 10^8+ residual postings — plausible at
# 10^12-doc scale with fine-grained blocks, absent in every configuration
# this engine can measure. Auto-engage is therefore OFF (prune=None →
# unpruned); prune=True stays available and exact for corpora whose
# block-level impact distribution is genuinely skewed.
#
# PRUNE_MIN_POSTINGS documents the measured certain-loss floor for
# reference (kept for callers building their own engage heuristics);
# prune=True always forces the path — exactness is tested at any size,
# and the perf call is the caller's.
PRUNE_MIN_POSTINGS = 5_000_000


def bm25_topk_pruned_candidates(
    handle: IndexHandle,
    pq: ParsedQuery,
    K: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Block-max pruning (the batch adaptation of block-max WAND).

    Doc ranges are block-aligned across terms (block_key = doc_id //
    block_range), so: (1) an upper bound per range is Σ_t idf_t ·
    impact(max_tf, min_dl, avgdl_now) — BM25's tf-component is increasing
    in tf and decreasing in dl, so the bound holds for every posting in
    the block, and because it is evaluated with the CURRENT stats.json
    avgdl it stays valid after incremental refreshes shift avgdl (a
    build-time-frozen max_impact would not); (2) scoring restricted to a
    set of ranges is EXACT for every doc inside them. Algorithm:

      phase 0  metadata-only scan → per-range ub + doc count
      phase 1  score the highest-ub ranges covering ≥4K docs exactly
               (full clause/negation/phrase semantics) → θ = K-th score
      phase 2  survivors = ranges with ub ≥ θ; exact scoring over them.

    Safe: a doc outside the survivors has score ≤ its range's ub < θ.
    Negation/phrases only *remove* docs inside scored ranges, and θ is
    computed post-removal, so it is a valid lower bound on the final
    K-th score.
    """
    terms = pq.positive_terms
    N = handle.stats["N"]
    dfs = handle.term_stats(terms)
    present = [t for t in terms if dfs.get(t)]
    if not present:
        return handle.spark.createDataFrame([], "doc_id bigint, score double")
    idf_map = {t: idf(N, dfs[t]) for t in present}
    avgdl = handle.stats["avgdl"]
    meta = handle.blocks_for(present).select(
        "term", "block_key", "max_tf", "min_dl", "n_docs"
    )
    idf_expr = F.create_map(*[x for t in present for x in (F.lit(t), F.lit(idf_map[t]))])
    impact_ub = (F.col("max_tf") * (k1 + 1.0)) / (
        F.col("max_tf") + k1 * (1.0 - b + b * F.col("min_dl") / F.lit(avgdl))
    )
    ranges = meta.groupBy("block_key").agg(
        F.sum(idf_expr.getItem(F.col("term")) * impact_ub).alias("ub"),
        F.sum("n_docs").alias("nd"),
    )
    top_meta = ranges.orderBy(F.desc("ub"), F.asc("block_key")).limit(2048).collect()
    seed, covered = [], 0
    for r in top_meta:
        seed.append(r["block_key"])
        covered += r["nd"]
        if covered >= 4 * K:
            break
    phase1 = bm25_candidates_blockagg(handle, pq, k1, b, block_keys=seed)
    kth = (
        phase1.orderBy(F.desc("score"), F.asc("doc_id")).limit(K).collect()
    )
    if len(kth) < K:
        # seed ranges didn't yield K matches → θ unusable; score everything
        return bm25_candidates_blockagg(handle, pq, k1, b)
    theta = kth[-1]["score"]
    # final ranking orders by round(score, 4): keep every range whose ub
    # could still produce a doc that TIES the K-th rounded score (half a
    # rounding ulp below round(theta,4)); cutoff ≤ theta always, so this
    # only widens the survivor set.
    cutoff = round(theta, 4) - 5e-5
    survivors = ranges.filter(F.col("ub") >= F.lit(cutoff)).select("block_key")
    return bm25_candidates_blockagg(handle, pq, k1, b, block_keys=survivors)


def _rank_limit(
    cands: DataFrame, k: int, offset: int, round_digits: int
) -> DataFrame:
    """Shared ranking tail: round → (score desc, doc_id asc) → page slice.
    Used identically by the full path and the champion fast path so both
    produce row-for-row the same result for the same candidate scores."""
    ranked = (
        cands.withColumn("score", F.round(F.col("score"), round_digits))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(offset + k)
    )
    if offset:
        # top-(offset+k) already limited above — the window runs over ≤
        # offset+k rows on one partition, not the full corpus.
        ranked = (
            ranked.withColumn(
                "_rn",
                F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
            )
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    return ranked


def bm25_topk(
    handle: IndexHandle,
    query: str | ParsedQuery,
    k: int = 25,
    offset: int = 0,
    round_digits: int = 4,
    prune: bool | None = None,
    champions: bool | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) — deterministic (score desc, doc_id asc).

    champions=None (default) → AUTO: when the index carries a champion
    side table consistent with the live stats and the query has a
    provably-exact champion plan (single hot term within the boundary
    certificate, or all terms' lists complete — operators/champions.py),
    serve from it: one partition-pruned scan of ≤ C·|terms| side-table
    rows instead of decoding the full posting lists. champions=False
    disables. Exactness is structural (certificate or complete lists), so
    the result is row-identical to the full path either way.

    prune=None (default) → UNPRUNED: block-max pruning measured slower at
    every posting mass this engine can generate (see PRUNE_MIN_POSTINGS
    comment + BASELINE.md); the default path already prunes via tbucket
    partitions, parquet term min/max, and exact AND block-range
    intersection. prune=True forces the block-max path (exact, tested).
    """
    pq = parse_websearch(query) if isinstance(query, str) else query
    use_prune = bool(prune)
    if champions is not False and not use_prune:
        from project_gutenberg_full_text_search_spark.operators.champions import (
            champion_topk,
        )

        served = champion_topk(handle, pq, k, offset, round_digits)
        if served is not None:
            return served
    if use_prune and len(pq.positive_terms) + len(pq.neg_terms) <= 62:
        cands = bm25_topk_pruned_candidates(handle, pq, offset + k)
    else:
        cands = bm25_candidates(handle, pq)
    return _rank_limit(cands, k, offset, round_digits)


def bm25_match_docs(handle: IndexHandle, pq: ParsedQuery) -> DataFrame:
    """MEMBERSHIP-ONLY matching doc set: (doc_id), one row per match.

    The count/fast-count plan (VERDICT r4 #1): a COUNT needs the boolean/
    phrase semantics of ``bm25_candidates`` but none of its scoring — this
    plan decodes the query terms' postings and evaluates
    ``_clause_predicate`` with NO score column anywhere (asserted by
    tests/test_dsl.py::test_count_plan_has_no_scoring). Same pruning as
    the scoring path: tbucket partition pruning + parquet term min/max via
    ``blocks_for``, positions decoded only when a phrase clause needs
    them, and required-term absence short-circuits to an empty result
    without touching the postings at all.
    """
    terms = pq.positive_terms
    if not terms:
        raise ValueError("empty positive query")
    dfs = handle.term_stats(terms)
    present = {t for t in terms if dfs.get(t)}
    empty = handle.spark.createDataFrame([], "doc_id bigint")
    if not present:
        return empty
    # short-circuit unsatisfiable queries before any decode: a term
    # clause's term or any phrase token absent from the index → no doc
    # can match; an OR clause needs at least one present term
    for c in pq.clauses:
        need = c.terms if c.kind in ("term", "phrase") else []
        if any(t not in present for t in need):
            return empty
        if c.kind == "or" and not any(t in present for t in c.terms):
            return empty
    needs_pos = any(c.kind == "phrase" for c in pq.clauses)
    decoded = handle.decode(sorted(present), with_positions=needs_pos)
    aggs = [F.collect_set("term").alias("matched")]
    if needs_pos:
        aggs.append(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("posmap")
        )
    matched = (
        decoded.groupBy("doc_id")
        .agg(*aggs)
        .filter(_clause_predicate(pq))
        .select("doc_id")
    )
    if pq.neg_terms:
        neg_dfs = handle.term_stats(pq.neg_terms)
        neg_present = [t for t in pq.neg_terms if neg_dfs.get(t)]
        if neg_present:
            neg_docs = handle.decode(neg_present).select("doc_id").distinct()
            matched = matched.join(neg_docs, "doc_id", "left_anti")
    return matched


def bm25_count(handle: IndexHandle, query: str | ParsedQuery) -> int:
    """Match count (the reference's two-query execute: COUNT then fetch,
    full_text_search.py:316-330) — membership-only plan, no scoring."""
    pq = parse_websearch(query) if isinstance(query, str) else query
    return bm25_match_docs(handle, pq).count()
