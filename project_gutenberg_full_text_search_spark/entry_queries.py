"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Every operator family from SURVEY.md §2 gets a (queries, oracle_sql) pair
over the driver testdata tables (documents/embeddings/TPC-H). The oracle
SQL re-derives the same semantics from first principles in DuckDB —
tokenization, BM25, trigram similarity, MinHash/SimHash (via the
cross-engine md5 hash), cosine — so the driver's value-hash compare is a
real end-to-end correctness gate, not a row-count check.

Column names are aliased identically on both sides (the driver sorts
columns by name before hashing).
"""

from __future__ import annotations

import hashlib
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark import BM25_B, BM25_K1
from project_gutenberg_full_text_search_spark.functions.hashing import (
    MINHASH_MOD,
    md5_long_sql,
    minhash_lane_consts,
    seeded_hash_sql,
)
from project_gutenberg_full_text_search_spark.functions.text import (
    TOKEN_SPLIT_RE,
    word_trigrams,
)
from project_gutenberg_full_text_search_spark.operators import (
    dedup,
    ivf,
    similarity,
    temporal,
    textstats,
)
from project_gutenberg_full_text_search_spark.operators.bm25 import (
    IndexHandle,
    bm25_candidates,
    bm25_topk,
)
from project_gutenberg_full_text_search_spark.operators.build_index import build_index
from project_gutenberg_full_text_search_spark.operators.contains import contains_search
from project_gutenberg_full_text_search_spark.operators.fuzzy import fuzzy_search
from project_gutenberg_full_text_search_spark.plans.parser import parse_websearch

# ---------------------------------------------------------------------------
# index cache: one index per sf_dir per machine (resume-backed)
# ---------------------------------------------------------------------------

_IDX_LOCK = threading.Lock()
# handle cache: IndexHandle memoizes per-term df and the trigram→df map, so
# reusing ONE handle per index dir makes those warm lookups pure driver
# arithmetic across queries (a fresh handle per query would re-pay them).
# Safe because the resume-backed build is idempotent for a given sf_dir —
# the handle stays a snapshot of one immutable index state.
_IDX_HANDLES: dict[str, IndexHandle] = {}


def _index_for(spark: SparkSession, sf_dir: str) -> IndexHandle:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    idx_dir = os.path.join(
        os.environ.get("PGFTS_INDEX_CACHE", "/tmp/pgfts_index_cache"), tag
    )
    with _IDX_LOCK:
        cached = _IDX_HANDLES.get(idx_dir)
        if cached is not None and cached.spark is spark:
            return cached
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        build_index(
            spark,
            docs,
            idx_dir,
            text_col="text",
            resume=True,
            input_fingerprint=sf_dir,
        )
        handle = IndexHandle.open(spark, idx_dir)
        _IDX_HANDLES[idx_dir] = handle
        return handle


def _documents(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if spread:
        # single-file parquet → 1 input partition; heavy per-row operators
        # (minhash/simhash/profile) need the rows spread across cores.
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments
# ---------------------------------------------------------------------------

_TOKS = (
    f"list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')"
)

_BASE_CTES = f"""
tok AS (
  SELECT doc_id, t.tok AS term
  FROM documents, unnest({_TOKS}) AS t(tok)
),
tfx AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dlx AS (SELECT doc_id, len({_TOKS})::DOUBLE AS dl FROM documents),
stx AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, avg(dl) AS avgdl FROM dlx),
dfx AS (SELECT term, count(*)::DOUBLE AS df FROM tfx GROUP BY 1)
"""


def _adj_regex(terms: list[str]) -> str:
    sep = "[^a-z0-9_]+"
    body = sep.join(terms)
    return f"(^|[^a-z0-9_]){body}([^a-z0-9_]|$)"


def _bm25_oracle(query: str, k: int | None = 20, offset: int = 0, count_only: bool = False, extra_join: str = "", extra_where: str = "") -> str:
    """DuckDB SQL computing the engine's exact BM25 semantics for `query`."""
    pq = parse_websearch(query)
    terms = pq.positive_terms
    tlist = ", ".join(f"'{t}'" for t in terms)
    conds = []
    for c in pq.clauses:
        if c.kind == "term":
            conds.append(f"list_contains(mterms, '{c.terms[0]}')")
        elif c.kind == "or":
            ors = " OR ".join(f"list_contains(mterms, '{t}')" for t in c.terms)
            conds.append(f"({ors})")
        elif c.kind == "phrase":
            conds.append(
                "regexp_matches(lower(d.text), '" + _adj_regex(list(c.terms)) + "')"
            )
    neg = ""
    if pq.neg_terms:
        nlist = ", ".join(f"'{t}'" for t in pq.neg_terms)
        neg = f"AND sc.doc_id NOT IN (SELECT doc_id FROM tok WHERE term IN ({nlist}))"
    where = " AND ".join(conds) if conds else "TRUE"
    k1, b = BM25_K1, BM25_B
    sql = f"""
WITH {_BASE_CTES},
sc AS (
  SELECT tfx.doc_id,
         sum( ln(1 + (stx.n - dfx.df + 0.5) / (dfx.df + 0.5))
              * tfx.tf * ({k1} + 1)
              / (tfx.tf + {k1} * (1 - {b} + {b} * dlx.dl / stx.avgdl)) ) AS score,
         list(DISTINCT tfx.term) AS mterms
  FROM tfx
  JOIN dlx USING (doc_id) CROSS JOIN stx JOIN dfx USING (term)
  WHERE tfx.term IN ({tlist})
  GROUP BY tfx.doc_id
)
SELECT sc.doc_id AS doc_id, round(sc.score, 4) AS score
FROM sc JOIN documents d ON d.doc_id = sc.doc_id {extra_join}
WHERE {where} {neg} {extra_where}
"""
    if count_only:
        return f"SELECT count(*)::BIGINT AS cnt FROM ({sql})"
    return (
        sql
        + f"ORDER BY round(sc.score, 4) DESC, sc.doc_id ASC LIMIT {k} OFFSET {offset}"
    )


def _fts_query(query: str, k: int = 20, offset: int = 0):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        h = _index_for(spark, sf_dir)
        return bm25_topk(h, query, k=k, offset=offset)

    return fn


def _fuzzy_oracle(word: str, k: int = 25, threshold: float = 0.3) -> str:
    q = sorted(word_trigrams(word.lower()))
    qlist = ", ".join("'" + g.replace("'", "''") + "'" for g in q)
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM documents, unnest({_TOKS}) AS t(tok)
),
tri AS (
  SELECT doc_id, term,
         list_distinct(list_transform(range(1, len('  ' || term || ' ') - 1),
                                      i -> ('  ' || term || ' ')[i:i+2])) AS tg
  FROM tok
),
sim AS (
  SELECT doc_id,
         max(len(list_intersect(tg, [{qlist}]))::DOUBLE
             / ({len(q)} + len(tg) - len(list_intersect(tg, [{qlist}])))::DOUBLE) AS s
  FROM tri GROUP BY doc_id
)
SELECT doc_id, round(s, 4) AS sim FROM sim WHERE round(s, 4) >= {threshold}
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT {k}
"""


_MINHASH_K = 8


def _lane_values_sql(k: int) -> str:
    """VALUES table (seed, a, b) of the k md5-derived minhash lane consts."""
    a, b = minhash_lane_consts(k)
    return ", ".join(f"({s}, {int(a[s])}, {int(b[s])})" for s in range(k))


def _minhash_sig_cte(k: int) -> str:
    """CTEs sh/seeds/mh: per-(doc, seed) minhash over distinct shingles."""
    return f"""sh AS ({_SHINGLE_SQL}),
seeds AS (SELECT * FROM (VALUES {_lane_values_sql(k)}) t(seed, a, b)),
mh AS (
  SELECT doc_id, seed,
         list_min(list_transform(sh.shingles,
             x -> ((a::HUGEINT * {md5_long_sql('x')} + b) % {MINHASH_MOD})::BIGINT)) AS minhash
  FROM sh, seeds
)"""


_SHINGLE_SQL = f"""
SELECT doc_id,
       CASE WHEN len(toks) >= 3
            THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                              i -> array_to_string(toks[i:i+2], ' ')))
            ELSE [] END AS shingles
FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def build_registry():
    queries: dict = {}
    oracles: dict = {}

    def reg(name, fn, sql=None):
        queries[name] = fn
        if sql is not None:
            oracles[name] = sql

    # ---- FTS family (Q1/Q2/S5/S7 of SURVEY §2.2-2.3) ----
    for name, q in [
        ("fts_single_hot", "merge"),
        ("fts_and", "merge query"),
        ("fts_or", "scan or stream"),
        ("fts_not", "merge -slow"),
        ("fts_three_and", "sort table window"),
    ]:
        reg(name, _fts_query(q, k=20), _bm25_oracle(q, k=20))
    reg("fts_phrase", _fts_query('"table scan"', k=20), _bm25_oracle('"table scan"', k=20))
    reg("fts_page2", _fts_query("merge", k=10, offset=10), _bm25_oracle("merge", k=10, offset=10))

    def fts_count(spark, sf_dir):
        # membership-only count plan — no score column (VERDICT r4 #1)
        from project_gutenberg_full_text_search_spark.operators.bm25 import (
            bm25_match_docs,
        )

        h = _index_for(spark, sf_dir)
        return (
            bm25_match_docs(h, parse_websearch("merge query"))
            .agg(F.count("*").alias("cnt"))
        )

    reg("fts_count_and", fts_count, _bm25_oracle("merge query", count_only=True))

    def fts_filter_lang(spark, sf_dir):
        h = _index_for(spark, sf_dir)
        docs = _documents(spark, sf_dir)
        cands = bm25_candidates(h, parse_websearch("merge"))
        return (
            cands.join(docs.filter(F.col("lang") == "de"), "doc_id", "left_semi")
            .select("doc_id", F.round("score", 4).alias("score"))
            .orderBy(F.desc(F.round("score", 4)), F.asc("doc_id"))
            .limit(20)
        )

    reg(
        "fts_filter_lang",
        fts_filter_lang,
        _bm25_oracle("merge", k=20, extra_where="AND d.lang = 'de'"),
    )

    def fts_snippets(spark, sf_dir):
        # ts_headline analog: KWIC snippets with highlighted terms over
        # the AND-query top-10. Fetch shape matters at corpus scale: the
        # k result rows are COLLECTED (bounded by k, like every page
        # fetch) and re-enter as a pushed `doc_id IN (...)` parquet
        # filter — on a doc_id-sorted table (operators/etl.py B13
        # sorted-write) that is a row-group-pruned point fetch, not a
        # full scan joined down to k rows. Snippet algebra then touches
        # exactly k rows.
        from project_gutenberg_full_text_search_spark.operators.snippets import (
            snippets,
        )

        h = _index_for(spark, sf_dir)
        docs = _documents(spark, sf_dir)
        top_rows = bm25_topk(h, "merge query", k=10).collect()
        top = spark.createDataFrame(top_rows, "doc_id bigint, score double")
        fetched = docs.select("doc_id", "text").filter(
            F.col("doc_id").isin([r["doc_id"] for r in top_rows])
        )
        joined = fetched.join(F.broadcast(top), "doc_id")
        return (
            snippets(joined, ["merge", "query"])
            .select("doc_id", "score", "first_pos", "n_hits", "snippet")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    from project_gutenberg_full_text_search_spark.operators.snippets import (
        snippet_sql,
    )

    reg(
        "fts_snippets",
        fts_snippets,
        f"""SELECT t.doc_id, t.score, {snippet_sql("d.text", ["merge", "query"])}
FROM ({_bm25_oracle("merge query", k=10)}) t
JOIN documents d USING (doc_id)
ORDER BY t.score DESC, t.doc_id""",
    )

    # ---- fuzzy (Q3) ----
    def fz(word, k=25):
        def fn(spark, sf_dir):
            h = _index_for(spark, sf_dir)
            return fuzzy_search(h, word, k=k)

        return fn

    reg("fuzzy_typo", fz("querry"), _fuzzy_oracle("querry"))
    reg("fuzzy_prefixish", fz("strea"), _fuzzy_oracle("strea"))

    # ---- contains (Q4) ----
    def ct(q):
        def fn(spark, sf_dir):
            h = _index_for(spark, sf_dir)
            docs = _documents(spark, sf_dir)
            return contains_search(h, docs, q, text_col="text").select("doc_id")

        return fn

    for name, q in [("contains_word_frag", "tabl"), ("contains_cross_token", "fast key")]:
        reg(
            name,
            ct(q),
            f"SELECT doc_id FROM documents WHERE contains(lower(text), '{q}')",
        )

    # ---- metadata filters (Q6-Q12 analogs on documents) ----
    def doc_filters(spark, sf_dir):
        return (
            _documents(spark, sf_dir)
            .filter((F.col("lang") == "de") & (F.col("n_chars") >= 200) & (F.col("n_chars") <= 400))
            .select("doc_id", "lang", "n_chars")
        )

    reg(
        "filter_range_eq",
        doc_filters,
        "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'de' AND n_chars BETWEEN 200 AND 400",
    )

    def pk_inlist(spark, sf_dir):
        return (
            _documents(spark, sf_dir)
            .filter(F.col("doc_id").isin([3, 5, 8, 13, 21]))
            .select("doc_id", "source")
        )

    reg(
        "filter_pk_inlist",
        pk_inlist,
        "SELECT doc_id, source FROM documents WHERE doc_id IN (3, 5, 8, 13, 21)",
    )

    def order_topn(spark, sf_dir):
        return (
            _documents(spark, sf_dir)
            .orderBy(F.desc("n_chars"), F.asc("doc_id"))
            .select("doc_id", "n_chars")
            .limit(15)
        )

    reg(
        "order_nchars_top15",
        order_topn,
        "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 15",
    )

    # ---- facets / browse (A1-A4 analogs) ----
    def facet_sources(spark, sf_dir):
        return (
            _documents(spark, sf_dir)
            .groupBy("source")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("total_chars"))
            .orderBy(F.desc("n"), F.asc("source"))
            .limit(10)
        )

    reg(
        "facet_top_sources",
        facet_sources,
        """SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS total_chars
           FROM documents GROUP BY source ORDER BY n DESC, source ASC LIMIT 10""",
    )

    def facet_lang_of_matches(spark, sf_dir):
        h = _index_for(spark, sf_dir)
        docs = _documents(spark, sf_dir)
        # bm25_topk (not a hand-rolled sort over bm25_candidates): same
        # (round(score,4) desc, doc_id) top-100 semantics, but the topk
        # entrypoint auto-serves from champion lists when the query has an
        # exact champion plan — the facet then costs ONE side-table scan
        # plus the join/groupBy instead of a full posting decode.
        top = bm25_topk(h, "merge query", k=100).select("doc_id")
        return (
            docs.join(F.broadcast(top), "doc_id", "left_semi")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("lang"))
        )

    reg(
        "facet_lang_of_top_matches",
        facet_lang_of_matches,
        f"""WITH m AS ({_bm25_oracle("merge query", k=100)})
            SELECT d.lang AS lang, count(*)::BIGINT AS n
            FROM documents d JOIN m ON m.doc_id = d.doc_id
            GROUP BY d.lang ORDER BY n DESC, lang ASC""",
    )

    # ---- ETL plane (B2-B12 analogs on TPC-H tables) ----
    def etl_string_agg(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        n = _read(spark, sf_dir, "nation")
        return (
            c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.concat_ws(" | ", F.array_sort(F.collect_list("c_name"))).alias("names"),
                F.count("*").alias("n"),
            )
        )

    reg(
        "etl_string_agg",
        etl_string_agg,
        """SELECT n_name, string_agg(c_name, ' | ' ORDER BY c_name) AS names, count(*)::BIGINT AS n
           FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""",
    )

    def etl_array_agg(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        return c.groupBy("c_nationkey").agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segments")
        )

    reg(
        "etl_array_agg_distinct",
        etl_array_agg,
        """SELECT c_nationkey, array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
           FROM customer GROUP BY c_nationkey""",
    )

    def etl_exists_flag(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        o = _read(spark, sf_dir, "orders").select("o_custkey").distinct()
        return (
            c.join(o, c["c_custkey"] == o["o_custkey"], "left")
            .withColumn("has_order", F.col("o_custkey").isNotNull())
            .groupBy("has_order")
            .agg(F.count("*").alias("n"))
        )

    reg(
        "etl_exists_flag",
        etl_exists_flag,
        """SELECT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_order,
                  count(*)::BIGINT AS n
           FROM customer GROUP BY 1""",
    )

    def etl_minmax(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        return (
            c.filter(F.col("c_acctbal") > 0)
            .groupBy("c_mktsegment")
            .agg(
                F.round(F.max("c_acctbal"), 2).alias("max_bal"),
                F.round(F.min("c_acctbal"), 2).alias("min_bal"),
                F.count("*").alias("n"),
            )
        )

    reg(
        "etl_minmax_filtered",
        etl_minmax,
        """SELECT c_mktsegment, round(max(c_acctbal), 2) AS max_bal,
                  round(min(c_acctbal), 2) AS min_bal, count(*)::BIGINT AS n
           FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment""",
    )

    def etl_regex(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        return c.select(
            "c_custkey",
            F.regexp_replace(F.col("c_name"), "[0-9]+", "#").alias("name_masked"),
        )

    reg(
        "etl_regexp_replace",
        etl_regex,
        "SELECT c_custkey, regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked FROM customer",
    )

    def etl_case_when(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        bucket = (
            F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
        )
        return c.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))

    reg(
        "etl_case_when_buckets",
        etl_case_when,
        """SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low'
                       ELSE 'high' END AS bucket, count(*)::BIGINT AS n
           FROM customer GROUP BY 1""",
    )

    # ---- nested-doc construction (B11 analog: the dc-jsonb assembly of
    # mv_books_dc.sql:196-430 as grouped struct-array aggregation; output
    # serialized canonically — sorted "key:value" packs — so the value
    # hash is engine-neutral) ----
    def etl_nested_docs(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        o = _read(spark, sf_dir, "orders")
        packed = F.concat_ws(
            ":",
            F.col("o_orderkey").cast("string"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        )
        return (
            c.join(o, c["c_custkey"] == o["o_custkey"], "left")
            .groupBy("c_custkey")
            .agg(
                F.concat_ws(";", F.array_sort(F.collect_list(packed))).alias(
                    "orders_doc"
                ),
                F.count("o_orderkey").alias("n_orders"),
            )
        )

    reg(
        "etl_nested_doc_build",
        etl_nested_docs,
        """SELECT c_custkey,
                  coalesce(string_agg(o_orderkey::VARCHAR || ':' ||
                           round(o_totalprice * 100)::BIGINT::VARCHAR, ';'
                           ORDER BY o_orderkey::VARCHAR || ':' ||
                           round(o_totalprice * 100)::BIGINT::VARCHAR), '') AS orders_doc,
                  count(o_orderkey)::BIGINT AS n_orders
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey""",
    )

    # ---- ANALYZE analog (B18): one-pass table statistics ----
    def etl_analyze(spark, sf_dir):
        d = _documents(spark, sf_dir)
        return d.agg(
            F.count("*").alias("n_rows"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.count_distinct("lang").alias("ndv_lang"),
            F.count_distinct("source").alias("ndv_source"),
            F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
        )

    reg(
        "etl_analyze_stats",
        etl_analyze,
        """SELECT count(*)::BIGINT AS n_rows,
                  min(n_chars)::BIGINT AS min_chars,
                  max(n_chars)::BIGINT AS max_chars,
                  count(DISTINCT lang)::BIGINT AS ndv_lang,
                  count(DISTINCT source)::BIGINT AS ndv_source,
                  sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_lang
           FROM documents""",
    )

    # ---- classic pipelines (engine plumbing anchors) ----
    def tpch_q1(spark, sf_dir):
        l = _read(spark, sf_dir, "lineitem")
        return (
            l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    reg(
        "tpch_q1_pricing",
        tpch_q1,
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity), 2) AS sum_qty,
                  round(sum(l_extendedprice), 2) AS sum_base_price,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                  count(*)::BIGINT AS count_order
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2""",
    )

    def join3_revenue(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        o = _read(spark, sf_dir, "orders")
        l = _read(spark, sf_dir, "lineitem")
        # explicit broadcast hints (guide §3.1): we KNOW the filtered
        # customer side and the customer⋈orders output are dimension-
        # sized. Left to AQE-only conversion the initial SMJ plan
        # materializes a full hash-shuffle of lineitem before the runtime
        # rewrite kicks in — the hint removes that exchange outright
        # (1.31 s → 0.89 s at sf1.0; row-identical).
        co = F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")).join(
            o, c["c_custkey"] == o["o_custkey"]
        )
        return (
            F.broadcast(co)
            .join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy("o_orderkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10)
        )

    reg(
        "join3_top_revenue",
        join3_revenue,
        """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM customer JOIN orders ON c_custkey = o_custkey
                         JOIN lineitem ON o_orderkey = l_orderkey
           WHERE c_mktsegment = 'BUILDING'
           GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    )

    def events_daily(spark, sf_dir):
        e = _read(spark, sf_dir, "events")
        return (
            e.groupBy(
                F.to_date("ts").alias("day"), F.col("event_type")
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
            .orderBy("day", "event_type")
        )

    reg(
        "events_daily_rollup",
        events_daily,
        """SELECT ts::DATE AS day, event_type, count(*)::BIGINT AS n,
                  round(sum(value), 2) AS total
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    )

    # ---- dedup family ----
    def dd_exact(spark, sf_dir):
        return dedup.exact_dedup_groups(_documents(spark, sf_dir), "text")

    reg(
        "dedup_exact_groups",
        dd_exact,
        """SELECT md5(text) AS content_hash, min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n
           FROM documents GROUP BY 1""",
    )

    def dd_minhash(spark, sf_dir):
        sigs = dedup.minhash_signatures(
            _documents(spark, sf_dir, spread=True), "text", k=_MINHASH_K
        )
        return sigs.select(
            "doc_id",
            F.posexplode("sig").alias("seed", "minhash"),
        ).select("doc_id", F.col("seed").cast("int").alias("seed"), "minhash")

    reg(
        "dedup_minhash_sigs",
        dd_minhash,
        f"""WITH {_minhash_sig_cte(_MINHASH_K)}
            SELECT doc_id, seed::INT AS seed, minhash FROM mh""",
    )

    def dd_simhash(spark, sf_dir):
        return dedup.simhash(_documents(spark, sf_dir, spread=True), "text", bits=16)

    reg(
        "dedup_simhash16",
        dd_simhash,
        f"""WITH tok AS (SELECT doc_id, t.tok AS term FROM documents, unnest({_TOKS}) AS t(tok)),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
            h AS (SELECT doc_id, tf, {md5_long_sql('term')} AS hv FROM tf),
            bits AS (SELECT unnest(range(16)) AS i),
            w AS (SELECT doc_id, i, sum(tf * (((hv >> i) & 1) * 2 - 1)) AS wt FROM h, bits GROUP BY 1, 2),
            s AS (SELECT doc_id, sum(CASE WHEN wt > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
                  FROM w GROUP BY doc_id)
            -- LEFT JOIN from documents: a token-less doc gets simhash 0,
            -- matching the engine (which emits 0, not an absent row)
            SELECT d.doc_id AS doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
            FROM documents d LEFT JOIN s USING (doc_id)""",
    )

    def dd_pairs(spark, sf_dir):
        docs = _documents(spark, sf_dir, spread=True)
        return dedup.minhash_dedup_pairs(docs, "text", threshold=0.5)

    # full oracle twin of the LSH pipeline: lane minhashes → band hashes
    # (md5_long of the comma-joined 4-lane slice, identical to Spark's
    # concat_ws over slice()) → bucket self-join → exact-Jaccard verify.
    _jac = (
        "round(len(list_intersect(a.shingles, b.shingles))::DOUBLE"
        " / len(list_distinct(a.shingles || b.shingles))::DOUBLE, 4)"
    )
    _band_arg = (
        "array_to_string(list_transform(sig[band*4+1 : band*4+4],"
        " v -> v::VARCHAR), ',')"
    )
    reg(
        "dedup_minhash_pairs",
        dd_pairs,
        f"""WITH {_minhash_sig_cte(16)},
            sigs AS (SELECT doc_id, list(minhash ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, band, {md5_long_sql(_band_arg)} AS bh
              FROM sigs, (SELECT unnest(range(4)) AS band) bd
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bands x JOIN bands y
                ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
            )
            SELECT c.id_a AS id_a, c.id_b AS id_b, {_jac} AS jaccard
            FROM cand c JOIN sh a ON a.doc_id = c.id_a
                        JOIN sh b ON b.doc_id = c.id_b
            WHERE {_jac} >= 0.5""",
    )

    # ---- similarity search ----
    def _qvec(spark, sf_dir):
        row = (
            _read(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0]
        )
        return [float(x) for x in row["embedding"]]

    def ann_brute(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        return similarity.cosine_topk(emb, _qvec(spark, sf_dir), k=10)

    reg(
        "ann_cosine_top10",
        ann_brute,
        """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
           SELECT e.vec_id,
                  round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                        / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                           * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
           FROM embeddings e, q
           ORDER BY cos DESC, e.vec_id ASC LIMIT 10""",
    )

    def ann_buckets(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        return emb.select(
            "vec_id",
            similarity.signbit_bucket_col(
                F.col("embedding"), similarity.DEFAULT_LSH_DIMS
            ).alias("bucket"),
        )

    dims_sql = " + ".join(
        f"(CASE WHEN embedding[{d + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i, d in enumerate(similarity.DEFAULT_LSH_DIMS)
    )
    reg(
        "ann_lsh_buckets",
        ann_buckets,
        f"SELECT vec_id, ({dims_sql})::BIGINT AS bucket FROM embeddings",
    )

    def ann_lsh(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        # testdata embeddings are unclustered → small buckets; widen the
        # multi-probe radius so the demo returns a full k.
        return similarity.ann_lsh_topk(
            emb, _qvec(spark, sf_dir), k=5, probe_hamming=4
        )

    # exact DuckDB twin: the seeded hyperplane matrix regenerates the same
    # buckets (left-to-right sums → bit-identical doubles), and the
    # multi-probe set "hamming ≤ r of the query bucket" is one bit_count.
    _planes = similarity.hyperplane_matrix(64)
    _cosq = (
        "round(list_dot_product(b.v, q.qv)"
        " / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4)"
    )
    reg(
        "ann_lsh_top5",
        ann_lsh,
        f"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
            b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                         {similarity.hyperplane_bucket_sql('embedding', _planes)} AS bucket
                  FROM embeddings),
            qb AS (SELECT {similarity.hyperplane_bucket_sql('q.qv', _planes)} AS bucket FROM q)
            SELECT b.vec_id AS vec_id, {_cosq} AS cos
            FROM b, q, qb
            WHERE bit_count(xor(b.bucket, qb.bucket)) <= 4
            ORDER BY cos DESC, vec_id ASC LIMIT 5""",
    )

    # ---- persisted ANN index probe (partition-pruned multi-probe read;
    # same math as ann_lsh_top5 but served from a bucket-partitioned
    # parquet artifact written once per sf_dir — similarity.write_ann_index)
    def ann_index_probe(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        path = os.path.join(
            os.environ.get("PGFTS_INDEX_CACHE", "/tmp/pgfts_index_cache"),
            f"ann_{tag}",
        )
        with _IDX_LOCK:
            if not os.path.exists(os.path.join(path, "_ann_meta.json")):
                similarity.write_ann_index(
                    emb, path, dim=64, nbits=16, seed=similarity.DEFAULT_LSH_SEED
                )
        return similarity.ann_index_topk(
            spark, path, _qvec(spark, sf_dir), k=5, probe_hamming=4
        )

    reg(
        "ann_index_top5",
        ann_index_probe,
        # identical twin to ann_lsh_top5: the persisted bucket column is the
        # same seeded expression the SQL regenerates
        f"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
            b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                         {similarity.hyperplane_bucket_sql('embedding', _planes)} AS bucket
                  FROM embeddings),
            qb AS (SELECT {similarity.hyperplane_bucket_sql('q.qv', _planes)} AS bucket FROM q)
            SELECT b.vec_id AS vec_id, {_cosq} AS cos
            FROM b, q, qb
            WHERE bit_count(xor(b.bucket, qb.bucket)) <= 4
            ORDER BY cos DESC, vec_id ASC LIMIT 5""",
    )

    # ---- IVF ANN (second scale path: Voronoi cells + nprobe pruning) ----
    # seeded data-independent quantizer for the oracle entries; the trained
    # (k-means) quantizer is data-dependent and pytest-verified instead
    # (tests/test_pipeline_ops.py::test_ivf_trained_centroids_*)
    _IVF_C = ivf.seeded_centroids(64, 16, ivf.DEFAULT_IVF_SEED)
    _ivf_b = ivf.ivf_cell_select_sql("embeddings", "vec_id", "embedding", _IVF_C)
    # the query's probe ranking, derived independently in SQL: one chained-
    # sum dot per centroid (bit-identical to query_probe_cells' Python
    # reduce), ranked (dot DESC, cell ASC), top nprobe
    _ivf_qd = " UNION ALL ".join(
        f"SELECT {i} AS cell, ({ivf.ivf_dot_sql('q.qv', row)}) AS d FROM q"
        for i, row in enumerate(_IVF_C)
    )

    def ivf_cells(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        # method="fold": bit-identical cells to the "expr" oracle twin
        # (same left-to-right IEEE fold), computed batch-vectorized in
        # numpy instead of per-row interpreted HOF evaluation
        return ivf.with_ivf_cell(
            emb, "embedding", _IVF_C, "cell", method="fold"
        ).select("vec_id", "cell")

    reg(
        "ann_ivf_cells",
        ivf_cells,
        f"SELECT vec_id, cell FROM ({_ivf_b})",
    )

    def ivf_top5(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        return ivf.ann_ivf_topk(
            emb,
            _qvec(spark, sf_dir),
            k=5,
            centroids=_IVF_C,
            nprobe=4,
            method="fold",
        )

    _ivf_probe_sql = f"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
            b AS ({_ivf_b}),
            qd AS ({_ivf_qd}),
            probe AS (SELECT cell FROM qd ORDER BY d DESC, cell ASC LIMIT 4)
            SELECT b.vec_id AS vec_id, {_cosq} AS cos
            FROM b, q
            WHERE b.cell IN (SELECT cell FROM probe)
            ORDER BY cos DESC, vec_id ASC LIMIT 5"""

    reg("ann_ivf_top5", ivf_top5, _ivf_probe_sql)

    # persisted cell-partitioned IVF index probe (partition-pruned read;
    # same math as ann_ivf_top5 but served from a write_ivf_index artifact)
    def ivf_index_probe(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        path = os.path.join(
            os.environ.get("PGFTS_INDEX_CACHE", "/tmp/pgfts_index_cache"),
            f"ivf_{tag}",
        )
        with _IDX_LOCK:
            if not os.path.exists(os.path.join(path, "_ivf_meta.json")):
                ivf.write_ivf_index(
                    emb, path, dim=64, centroids=_IVF_C, method="fold"
                )
        return ivf.ann_ivf_index_topk(
            spark, path, _qvec(spark, sf_dir), k=5, nprobe=4
        )

    reg("ann_ivf_index_top5", ivf_index_probe, _ivf_probe_sql)

    # ---- text analysis ----
    def tp(spark, sf_dir):
        return textstats.text_profile(_documents(spark, sf_dir, spread=True), "text")

    markers_sql = {
        lang: "[" + ", ".join(f"'{m}'" for m in ms) + "]"
        for lang, ms in sorted(textstats.LANG_MARKERS.items())
    }
    score_exprs = ",\n".join(
        f"len(list_intersect(dtoks, {lst}))::INT AS score_{lang}"
        for lang, lst in markers_sql.items()
    )
    langs_sorted = sorted(textstats.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs_sorted) + ")"
    pred_chain = "CASE " + " ".join(
        f"WHEN score_{la} = {best} THEN '{la}'" for la in langs_sorted
    ) + " END"
    stop_list = "[" + ", ".join(f"'{s}'" for s in textstats.EN_STOPWORDS) + "]"
    reg(
        "text_profile",
        tp,
        f"""WITH b AS (
              SELECT doc_id, text, {_TOKS} AS toks,
                     list_distinct({_TOKS}) AS dtoks,
                     list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS wtoks
              FROM documents
            ), f AS (
              SELECT doc_id,
                     len(wtoks)::INT AS ws_tokens,
                     len(toks)::INT AS ident_tokens,
                     len(toks)::INT AS n_tokens,
                     (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                           / greatest(length(text), 1) AS punct_raw,
                     len(list_filter(toks, x -> list_contains({stop_list}, x)))::DOUBLE
                           / greatest(len(toks), 1) AS stop_raw,
                     CASE WHEN len(toks) BETWEEN 20 AND 10000 THEN 1.0 ELSE 0.0 END AS len_ok,
                     {score_exprs},
                     md5(array_to_string(list_sort(dtoks), ' ')) AS fingerprint
              FROM b
            )
            SELECT doc_id, ws_tokens, ident_tokens, n_tokens,
                   round(punct_raw, 4) AS punct_ratio, round(stop_raw, 4) AS stopword_ratio,
                   round(least(greatest(0.4 * len_ok + 0.3 * (1 - punct_raw) + 0.3 * stop_raw, 0.0), 1.0), 4) AS quality_score,
                   {", ".join(f"score_{la}" for la in langs_sorted)},
                   {pred_chain} AS lang_pred,
                   fingerprint
            FROM f""",
    )

    # ---- multimodal plumbing (decode stubbed; plumbing fully oracled) ----
    def mm(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators import multimodal

        media = multimodal.synthesize_media(spark, 60)
        feats = multimodal.extract_features(media, fake=True)
        return feats.select("media_id", "media_type", "n_bytes")

    # synthesize_media payloads are sha256-digest repeats: n_bytes and the
    # type rotation are closed-form, so the distributed extract pipeline's
    # selected columns have an exact DuckDB twin (feature VALUES determinism
    # is pytest-asserted; DuckDB lacks sha256 over BLOB to twin them in SQL).
    reg(
        "multimodal_features",
        mm,
        """SELECT i::BIGINT AS media_id,
                  CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
                  (32 * (1 + i % 5))::BIGINT AS n_bytes
           FROM range(60) t(i)""",
    )

    # ---- JSON extraction (B11 analog: nested-doc ops) ----
    def json_extract(spark, sf_dir):
        e = _read(spark, sf_dir, "events")
        return (
            e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("k").alias("sum_k"),
                F.max("k").alias("max_k"),
            )
        )

    reg(
        "etl_json_extract",
        json_extract,
        """SELECT event_type, count(*)::BIGINT AS n,
                  sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
                  max(json_extract_string(props, '$.k')::INT)::INT AS max_k
           FROM events GROUP BY event_type""",
    )

    # ---- split_part / trim (B6 MARC-subfield-parse analog) ----
    def split_part(spark, sf_dir):
        c = _read(spark, sf_dir, "customer")
        return c.select(
            "c_custkey",
            F.split(F.col("c_name"), "#")[0].alias("name_head"),
            F.element_at(F.split(F.col("c_name"), "#"), -1).alias("name_tail"),
            F.trim(F.col("c_mktsegment")).alias("seg"),
        )

    reg(
        "etl_split_part",
        split_part,
        """SELECT c_custkey, split_part(c_name, '#', 1) AS name_head,
                  split_part(c_name, '#', -1) AS name_tail,
                  trim(c_mktsegment) AS seg
           FROM customer""",
    )

    # ---- n-gram Jaccard near-dup pairs (exact, oracled, no cartesian:
    # inverted shingle self-join — see dedup.ngram_jaccard_pairs) ----
    def ngram_pairs(spark, sf_dir):
        docs = _documents(spark, sf_dir, spread=True)
        return dedup.ngram_jaccard_pairs(docs, "text", threshold=0.2)

    reg(
        "dedup_ngram_jaccard_pairs",
        ngram_pairs,
        f"""WITH sh AS ({_SHINGLE_SQL})
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                         / len(list_distinct(a.shingles || b.shingles))::DOUBLE, 4) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                        / len(list_distinct(a.shingles || b.shingles))::DOUBLE, 4) >= 0.2""",
    )

    # ---- stop-shingle-capped exact n-gram Jaccard (the 100 TB skew path:
    # shingles with df > cap are excluded from CANDIDATE GENERATION only;
    # surviving pairs verify with the exact Jaccard over full shingle sets)
    _NGRAM_CAP, _NGRAM_CAP_TH = 10, 0.05

    def ngram_capped(spark, sf_dir):
        docs = _documents(spark, sf_dir, spread=True)
        return dedup.ngram_jaccard_pairs(
            docs, "text", threshold=_NGRAM_CAP_TH, max_shingle_df=_NGRAM_CAP
        )

    _J_EXPR = (
        "round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE"
        " / len(list_distinct(sa.shingles || sb.shingles))::DOUBLE, 4)"
    )
    reg(
        "dedup_ngram_capped_pairs",
        ngram_capped,
        f"""WITH sh AS ({_SHINGLE_SQL}),
            ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
            keep AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= {_NGRAM_CAP}),
            kex AS (SELECT ex.doc_id, ex.g FROM ex JOIN keep USING (g)),
            cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                     FROM kex a JOIN kex b ON a.g = b.g AND a.doc_id < b.doc_id)
            SELECT cand.id_a AS id_a, cand.id_b AS id_b, {_J_EXPR} AS jaccard
            FROM cand
            JOIN sh sa ON sa.doc_id = cand.id_a
            JOIN sh sb ON sb.doc_id = cand.id_b
            WHERE {_J_EXPR} >= {_NGRAM_CAP_TH}""",
    )

    # ---- embedding near-dup pairs (banded hyperplane LSH, exact twin) ----
    _EMB_THRESH = 0.35
    _EMB_BANDS, _EMB_NBITS = 4, 8

    def emb_pairs(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        return similarity.embedding_neardup_pairs(
            emb,
            threshold=_EMB_THRESH,
            bands=_EMB_BANDS,
            nbits_per_band=_EMB_NBITS,
            dim=64,
        )

    _band_cols = ", ".join(
        similarity.hyperplane_bucket_sql(
            "embedding",
            similarity.hyperplane_matrix(
                64, _EMB_NBITS, similarity.DEFAULT_LSH_SEED + i
            ),
        )
        + f" AS b{i}"
        for i in range(_EMB_BANDS)
    )
    _band_union = " UNION ALL ".join(
        f"SELECT vec_id, v, {i} AS band, b{i} AS bucket FROM b"
        for i in range(_EMB_BANDS)
    )
    _cos_pair = (
        "round(list_dot_product(x.v, y.v)"
        " / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4)"
    )
    reg(
        "dedup_embedding_pairs",
        emb_pairs,
        f"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_band_cols}
                       FROM embeddings),
            s AS ({_band_union}),
            cand AS (
              SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
              FROM s l JOIN s r
                ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
            )
            SELECT c.id_a AS id_a, c.id_b AS id_b, {_cos_pair} AS cos
            FROM cand c JOIN b x ON x.vec_id = c.id_a JOIN b y ON y.vec_id = c.id_b
            WHERE {_cos_pair} >= {_EMB_THRESH}""",
    )

    # ---- window functions / per-group top-N (A6 analog) ----
    def window_topn(spark, sf_dir):
        from pyspark.sql.window import Window

        e = _read(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
        return (
            e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("event_type", "rn", "event_id", F.round("value", 4).alias("value"))
        )

    reg(
        "window_top5_per_type",
        window_topn,
        """SELECT event_type, rn, event_id, round(value, 4) AS value FROM (
             SELECT event_type, event_id, value,
                    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
             FROM events) WHERE rn <= 5""",
    )

    # ---- watermarked windowed rollup (batch twin of the streaming
    # operator — identical plan; streaming/operators.windowed_rollup) ----
    def win_rollup_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.streaming.operators import (
            windowed_rollup,
        )

        return windowed_rollup(_read(spark, sf_dir, "events"), window="1 day")

    reg(
        "events_windowed_rollup",
        win_rollup_q,
        """SELECT date_trunc('day', ts) AS win_start, event_type,
                  count(*)::BIGINT AS n,
                  round(sum(value), 4) AS sum_value,
                  round(avg(value), 4) AS avg_value
           FROM events GROUP BY 1, 2""",
    )

    # ---- stateful streaming exact-dedup, oracled (VERDICT r4 #5) ----
    # Runs the REAL applyInPandasWithState operator under
    # trigger(availableNow) over a file stream of documents plus
    # deterministic synthetic duplicates (every 7th doc re-emitted under
    # doc_id+1_000_000), then returns the sunk result as a batch frame.
    # maxFilesPerTrigger is set above the file count so the whole input
    # lands in ONE micro-batch — that makes batch_dupes a pure function
    # of the data (count(hash)-1 on the survivor) and the DuckDB
    # first-occurrence twin exact: survivor = min doc_id per content
    # hash (the operator's deterministic order_col choice).
    def stream_dedup_q(spark, sf_dir):
        import tempfile

        from project_gutenberg_full_text_search_spark.streaming.operators import (
            stream_dedup_exact,
        )

        docs = _documents(spark, sf_dir).select("doc_id", "text")
        src = docs.unionByName(
            docs.filter(F.col("doc_id") % 7 == 0).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000)
            )
        )
        root = tempfile.mkdtemp(prefix="pgfts_streamdd_")
        in_dir = os.path.join(root, "in")
        out_dir = os.path.join(root, "out")
        src.write.mode("overwrite").parquet(in_dir)
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1_000_000)
            .parquet(in_dir)
        )
        q = (
            stream_dedup_exact(stream, "text", order_col="doc_id")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(root, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).select(
            "doc_id",
            F.col("_content_hash").alias("content_hash"),
            "batch_dupes",
        )

    reg(
        "stream_dedup_exact",
        stream_dedup_q,
        """WITH src AS (
             SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
           ),
           r AS (
             SELECT doc_id, md5(text) AS content_hash,
                    count(*) OVER (PARTITION BY md5(text)) AS n,
                    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             FROM src
           )
           SELECT doc_id::BIGINT AS doc_id, content_hash,
                  (n - 1)::BIGINT AS batch_dupes
           FROM r WHERE rn = 1""",
    )

    # ---- PII/URL scrubbing (training-data redaction pass) ----
    def scrub_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators import scrub

        return scrub.scrub_text(_documents(spark, sf_dir), "text")

    from project_gutenberg_full_text_search_spark.operators.scrub import (
        scrub_count_sql,
        scrub_sql,
    )

    reg(
        "text_scrub_pii",
        scrub_q,
        f"""SELECT doc_id, {scrub_sql('text')} AS clean,
                   {', '.join(scrub_count_sql('text'))}
            FROM documents""",
    )

    # ---- near-dup clustering (connected components over minhash pairs)
    # + canonical-survivor selection — the "keep one doc per duplicate
    # group" step after any pair-producing dedup operator ----
    def neardup_clusters_q(spark, sf_dir):
        docs = _documents(spark, sf_dir, spread=True)
        pairs = dedup.minhash_dedup_pairs(docs, "text", threshold=0.5)
        return dedup.neardup_clusters(pairs)

    _cc_pairs_cte = f"""{_minhash_sig_cte(16)},
            sigs AS (SELECT doc_id, list(minhash ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, band, {md5_long_sql(_band_arg)} AS bh
              FROM sigs, (SELECT unnest(range(4)) AS band) bd
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bands x JOIN bands y
                ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
            ),
            pairs AS (
              SELECT c.id_a, c.id_b
              FROM cand c JOIN sh a ON a.doc_id = c.id_a
                          JOIN sh b ON b.doc_id = c.id_b
              WHERE {_jac} >= 0.5
            ),
            sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
            reach(id, label) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.a, r.label FROM sym s JOIN reach r ON s.b = r.id
            )"""
    reg(
        "dedup_neardup_clusters",
        neardup_clusters_q,
        f"""WITH RECURSIVE {_cc_pairs_cte}
            SELECT id AS doc_id, min(label)::BIGINT AS cluster
            FROM reach GROUP BY id""",
    )

    def canonical_q(spark, sf_dir):
        docs = _documents(spark, sf_dir, spread=True)
        pairs = dedup.minhash_dedup_pairs(docs, "text", threshold=0.5)
        clusters = dedup.neardup_clusters(pairs)
        return dedup.canonical_docs(_documents(spark, sf_dir), clusters)

    reg(
        "dedup_canonical_docs",
        canonical_q,
        f"""WITH RECURSIVE {_cc_pairs_cte},
            cl AS (SELECT id AS doc_id, min(label)::BIGINT AS cluster
                   FROM reach GROUP BY id)
            SELECT d.doc_id FROM documents d
            LEFT JOIN cl ON d.doc_id = cl.doc_id
            WHERE cl.doc_id IS NULL OR cl.doc_id = cl.cluster""",
    )

    # ---- deterministic hash sampling (reproducible subset carving) ----
    def sample_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.etl import hash_sample

        return hash_sample(_documents(spark, sf_dir), 0.1, seed=7).select(
            "doc_id", "lang", "n_chars"
        )

    from project_gutenberg_full_text_search_spark.operators.etl import hash_sample_sql

    reg(
        "sample_hash_10pct",
        sample_q,
        f"""SELECT doc_id, lang, n_chars FROM documents
            WHERE {hash_sample_sql('doc_id', 0.1, 7)}""",
    )

    # ---- stratified sampling (training-mix carving: per-group rates/caps) ----
    _STRAT_FRACS = {"en": 0.05, "zh": 0.4}

    def strat_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.etl import (
            stratified_sample,
        )

        return stratified_sample(
            _documents(spark, sf_dir), "lang", _STRAT_FRACS, default=0.2, seed=11
        ).select("doc_id", "lang")

    from project_gutenberg_full_text_search_spark.operators.etl import (
        stratified_sample_sql,
    )

    reg(
        "sample_stratified_lang",
        strat_q,
        f"""SELECT doc_id, lang FROM documents
            WHERE {stratified_sample_sql('lang', 'doc_id', _STRAT_FRACS, 0.2, 11)}""",
    )

    def cap_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.etl import (
            group_cap_sample,
        )

        return group_cap_sample(
            _documents(spark, sf_dir), "lang", 7, seed=11
        ).select("doc_id", "lang")

    reg(
        "sample_group_cap",
        cap_q,
        f"""SELECT doc_id, lang FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY {seeded_hash_sql("doc_id::VARCHAR", 11)}, doc_id) <= 7""",
    )

    # ---- token-budget shard packing (training-data shard assignment) ----
    def pack_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.etl import (
            pack_token_budget,
        )

        # spread=True: the single-file corpus otherwise tokenizes in ONE
        # scan task before the window shuffle (result-identical — bucket
        # and pack_id are pure row/window functions)
        return pack_token_budget(
            _documents(spark, sf_dir, spread=True), budget=500, text_col="text",
            n_buckets=8, seed=11,
        )

    from project_gutenberg_full_text_search_spark.operators.etl import (
        pack_token_budget_sql,
    )

    reg(
        "pack_token_shards",
        pack_q,
        pack_token_budget_sql(
            "documents", 500, f"len({_TOKS})", n_buckets=8, seed=11
        ),
    )

    # ---- benchmark-contamination detection (n-token shingle overlap vs a
    # reference set; ref = every 97th doc standing in for a test split) ----
    def contam_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.contamination import (
            ngram_overlap,
        )

        # the tiny ref side (1/97th) reads the file directly — spreading
        # it would pay a second full-corpus repartition exchange for ~500
        # rows of work; only the corpus side needs the cores
        ref = _documents(spark, sf_dir).filter(F.col("doc_id") % 97 == 0)
        rest = _documents(spark, sf_dir, spread=True).filter(
            F.col("doc_id") % 97 != 0
        )
        return ngram_overlap(rest, ref, n=3, text_col="text")

    reg(
        "contam_ngram_hits",
        contam_q,
        f"""WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            sh AS (
              SELECT doc_id, unnest(
                CASE WHEN len(toks) >= 3 THEN
                  list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
                ELSE [] END) AS s
              FROM t),
            h AS (SELECT doc_id, {md5_long_sql('s')} AS sh_h FROM sh),
            ref AS (SELECT DISTINCT sh_h FROM h WHERE doc_id % 97 = 0)
            SELECT h.doc_id AS doc_id, count(*)::BIGINT AS n_overlap
            FROM h JOIN ref USING (sh_h)
            WHERE h.doc_id % 97 <> 0
            GROUP BY h.doc_id""",
    )

    # ---- exact-substring passage duplication (Lee et al. 2022 analog) ----
    def hot_passages_q(spark, sf_dir):
        return dedup.hot_passages(
            _documents(spark, sf_dir, spread=True), "text", window=6, min_docs=2
        )

    reg(
        "dedup_hot_passages",
        hot_passages_q,
        r"""WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
              FROM documents),
            p AS (
              SELECT doc_id, unnest(
                CASE WHEN len(ws) >= 6 THEN
                  list_transform(range(1, len(ws) - 4),
                                 i -> array_to_string(ws[i:i+5], ' '))
                ELSE [] END) AS passage
              FROM w)
            SELECT passage, count(DISTINCT doc_id)::BIGINT AS n_docs,
                   count(*)::BIGINT AS n_occ
            FROM p GROUP BY passage HAVING count(DISTINCT doc_id) >= 2""",
    )

    # ---- int8 scalar quantization (embedding compression + quantized ANN) ----
    def int8_codes_q(spark, sf_dir):
        q = similarity.quantize_int8(_read(spark, sf_dir, "embeddings"))
        return q.select(
            "vec_id",
            F.round("scale", 4).alias("scale"),
            F.posexplode("codes").alias("pos", "code"),
        ).select("vec_id", "scale", F.col("pos").cast("int"), F.col("code").cast("int"))

    reg(
        "ann_int8_codes",
        int8_codes_q,
        """WITH m AS (
             SELECT vec_id, embedding::DOUBLE[] AS v,
                    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
             FROM embeddings)
           SELECT vec_id, round(amax, 4) AS scale,
                  (u.pos - 1)::INT AS pos, u.code::INT AS code
           FROM m, unnest(list_transform(range(1, len(v) + 1),
                i -> {pos: i,
                      code: CASE WHEN amax > 0
                                 THEN floor(v[i] / amax * 127 + 0.5)
                                 ELSE 0 END})) AS t(u)""",
    )

    def int8_top5_q(spark, sf_dir):
        emb = _read(spark, sf_dir, "embeddings")
        return similarity.ann_quantized_topk(emb, query_id=0, k=5)

    reg(
        "ann_int8_top5",
        int8_top5_q,
        """WITH m AS (
             SELECT vec_id,
                    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0
                         THEN list_transform(embedding::DOUBLE[],
                              x -> floor(x / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
                                         * 127 + 0.5)::BIGINT)
                         ELSE list_transform(embedding::DOUBLE[], x -> 0::BIGINT)
                    END AS c
             FROM embeddings),
           q AS (SELECT c AS qc FROM m WHERE vec_id = 0)
           SELECT m.vec_id AS vec_id,
                  round(list_sum(list_transform(range(1, len(m.c) + 1), i -> m.c[i] * q.qc[i]))
                        / (sqrt(list_sum(list_transform(m.c, x -> x * x))::DOUBLE)
                           * sqrt(list_sum(list_transform(q.qc, x -> x * x))::DOUBLE)),
                        4) AS cos_q
           FROM m, q
           WHERE round(list_sum(list_transform(range(1, len(m.c) + 1), i -> m.c[i] * q.qc[i]))
                        / (sqrt(list_sum(list_transform(m.c, x -> x * x))::DOUBLE)
                           * sqrt(list_sum(list_transform(q.qc, x -> x * x))::DOUBLE)),
                        4) IS NOT NULL
           ORDER BY cos_q DESC, vec_id ASC LIMIT 5""",
    )

    # ---- intra-doc repetition signals (Gopher-style quality filter) ----
    def repetition_q(spark, sf_dir):
        # impl="arrow": the shuffle-free single-pass scale path — asserted
        # row-identical to the declarative explode twin (which the oracle
        # SQL mirrors) in tests and by the oracle hash itself; measured
        # 3.0 s → 1.8 s at sf1.0 (two word-explosion shuffles removed)
        return textstats.repetition_profile(
            _documents(spark, sf_dir, spread=True), "text", impl="arrow"
        )

    reg(
        "text_repetition_profile",
        repetition_q,
        r"""WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
              FROM documents),
            wc AS (SELECT doc_id, g, count(*)::BIGINT AS c
                   FROM (SELECT doc_id, unnest(ws) AS g FROM w) GROUP BY 1, 2),
            wstat AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
                             count(*)::BIGINT AS nd, max(c) AS topw
                      FROM wc GROUP BY doc_id),
            bc AS (SELECT doc_id, g, count(*)::BIGINT AS c
                   FROM (SELECT doc_id, unnest(
                           CASE WHEN len(ws) >= 2 THEN
                             list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
                           ELSE [] END) AS g FROM w) GROUP BY 1, 2),
            bstat AS (SELECT doc_id, max(c) AS topb FROM bc GROUP BY doc_id)
            SELECT w.doc_id AS doc_id,
                   coalesce(n_words, 0)::BIGINT AS n_words,
                   round(coalesce(nd::DOUBLE / greatest(n_words, 1), 0.0), 4) AS distinct_word_ratio,
                   round(coalesce(topw::DOUBLE / greatest(n_words, 1), 0.0), 4) AS top_word_frac,
                   round(coalesce(topb::DOUBLE / greatest(n_words - 1, 1), 0.0), 4) AS top_bigram_frac
            FROM w LEFT JOIN wstat USING (doc_id) LEFT JOIN bstat USING (doc_id)""",
    )

    # ---- deterministic epoch shuffle (training read order) ----
    def shuffle_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.etl import (
            shuffle_shards,
        )

        return shuffle_shards(_documents(spark, sf_dir), n_shards=8, seed=13)

    from project_gutenberg_full_text_search_spark.operators.etl import (
        shuffle_shards_sql,
    )

    reg(
        "shuffle_train_order",
        shuffle_q,
        shuffle_shards_sql("documents", 8, seed=13),
    )

    # ---- Gopher document-quality gate (rule signals + keep verdict) ----
    def gopher_q(spark, sf_dir):
        return textstats.gopher_rules(_documents(spark, sf_dir, spread=True), "text")

    reg(
        "quality_gopher_rules",
        gopher_q,
        textstats.gopher_rules_sql("documents", "text"),
    )

    # ---- sliding context-window chunking (training-sequence carver) ----
    def chunk_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.etl import (
            chunk_windows,
        )

        # spread=True: row-local operator — without it the whole corpus
        # chunks inside one scan task (single-file parquet input)
        return chunk_windows(
            _documents(spark, sf_dir, spread=True), window=40, stride=30,
            text_col="text",
        )

    from project_gutenberg_full_text_search_spark.operators.etl import (
        chunk_windows_sql,
    )

    reg("chunk_sliding_windows", chunk_q, chunk_windows_sql("documents", 40, 30))

    # ---- cross-doc repeated-segment removal (corpus-adaptive, token-level
    # here: strips segments shared by >= 390 of the 500 docs — the
    # ubiquitous ~half of this corpus's vocabulary; line-level on '\n'
    # corpora is the same operator — covered in tests/test_pipeline_ops.py) ----
    def strip_hot_q(spark, sf_dir):
        return dedup.strip_hot_segments(
            _documents(spark, sf_dir, spread=True),
            "text",
            delim=" ",
            min_docs=390,
        )

    reg(
        "clean_hot_segments",
        strip_hot_q,
        dedup.strip_hot_segments_sql("documents", "' '", 390),
    )

    # ---- per-doc TF-IDF top-k keyword extraction ----
    def tfidf_q(spark, sf_dir):
        return textstats.tfidf_top_terms(
            _documents(spark, sf_dir, spread=True), k=5, text_col="text"
        )

    reg(
        "tfidf_top_terms",
        tfidf_q,
        f"""WITH tok AS (
              SELECT doc_id, t.tok AS term FROM documents, unnest({_TOKS}) AS t(tok)),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
                   FROM tok GROUP BY 1, 2),
            dfx AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            nx AS (SELECT count(*)::DOUBLE AS n FROM documents),
            sc AS (SELECT doc_id, term,
                          round(tf * (ln((n + 1) / (df + 1)) + 1), 4) AS score
                   FROM tf JOIN dfx USING (term), nx),
            r AS (SELECT doc_id, term, score,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, term ASC) AS rnk
                  FROM sc)
            SELECT doc_id, rnk::INT AS rnk, term, score FROM r WHERE rnk <= 5""",
    )

    # ---- composed end-to-end training-prep pipeline: exact-dedup
    # survivors -> cross-doc hot-segment cleanup -> deterministic 50%
    # hash sample -> 30-token chunking -> token-budget shard packing.
    # One registry entry proving the pipeline operators COMPOSE with
    # end-to-end hash equality (the DuckDB twin chains the same five
    # stages in one CTE pipeline). ----
    def pipeline_q(spark, sf_dir):
        from project_gutenberg_full_text_search_spark.operators.etl import (
            chunk_windows,
            hash_sample,
            pack_token_budget,
        )

        docs = _documents(spark, sf_dir, spread=True)
        surv = dedup.exact_dedup(docs, "text", "doc_id")
        clean = dedup.strip_hot_segments(surv, "text", delim=" ", min_docs=390)
        sampled = hash_sample(clean, 0.5, id_col="doc_id", seed=7)
        chunks = chunk_windows(sampled, window=30, stride=30, text_col="clean_text")
        with_uid = chunks.withColumn(
            "chunk_uid", F.col("doc_id") * F.lit(10000) + F.col("chunk_id")
        )
        packed = pack_token_budget(
            with_uid,
            budget=256,
            text_col="chunk_text",
            id_col="chunk_uid",
            n_buckets=8,
            seed=11,
        )
        return packed.select(
            F.expr("chunk_uid DIV 10000").cast("long").alias("doc_id"),
            (F.col("chunk_uid") % 10000).cast("int").alias("chunk_id"),
            "chunk_uid",
            "bucket",
            "n_tokens",
            "pack_id",
        )

    _CHUNK_TOKS = (
        "list_filter(regexp_split_to_array(lower(chunk_text), "
        f"'{TOKEN_SPLIT_RE}'), x -> x <> '')"
    )
    reg(
        "pipeline_train_prep",
        pipeline_q,
        rf"""WITH surv AS (
              SELECT d.* FROM documents d
              JOIN (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)) k
                ON d.doc_id = k.keep_id),
            s AS (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x <> '') AS segs
                  FROM surv),
            e AS (SELECT doc_id, segs, unnest(range(1, len(segs) + 1)) AS pos FROM s),
            e2 AS (SELECT doc_id, pos, segs[pos] AS seg FROM e),
            hot AS (SELECT seg FROM e2 GROUP BY seg
                    HAVING count(DISTINCT doc_id) >= 390),
            kept AS (SELECT doc_id, pos, seg FROM e2
                     WHERE seg NOT IN (SELECT seg FROM hot)),
            reb AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text
                    FROM kept GROUP BY doc_id),
            clean AS (SELECT s.doc_id, coalesce(reb.clean_text, '') AS clean_text
                      FROM s LEFT JOIN reb USING (doc_id)),
            samp AS (SELECT * FROM clean
                     WHERE ({seeded_hash_sql("doc_id::VARCHAR", 7)} % 1000000) < 500000),
            t AS (SELECT doc_id,
                         list_filter(regexp_split_to_array(clean_text, '\s+'),
                                     x -> x <> '') AS ws
                  FROM samp),
            c AS (SELECT doc_id, ws, len(ws) AS n,
                         CASE WHEN len(ws) <= 0 THEN 0
                              WHEN len(ws) <= 30 THEN 1
                              ELSE 1 + CAST(floor((len(ws) - 30 + 29)::DOUBLE / 30) AS INT)
                         END AS nc
                  FROM t),
            ech AS (SELECT doc_id, ws, unnest(range(nc)) AS cid FROM c),
            ch AS (SELECT doc_id, cid, doc_id * 10000 + cid AS chunk_uid,
                          array_to_string(ws[cid * 30 + 1 : cid * 30 + 30], ' ') AS chunk_text
                   FROM ech),
            pb AS (SELECT doc_id, cid, chunk_uid,
                          ({seeded_hash_sql("chunk_uid::VARCHAR", 11)} % 8)::INT AS bucket,
                          len({_CHUNK_TOKS})::BIGINT AS n_tokens
                   FROM ch),
            pc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY bucket ORDER BY chunk_uid
                                                 ROWS UNBOUNDED PRECEDING) AS cum
                   FROM pb)
            SELECT doc_id, cid::INT AS chunk_id, chunk_uid, bucket, n_tokens,
                   floor((greatest(cum, 1) - 1) / 256)::BIGINT AS pack_id
            FROM pc""",
    )

    # ---- temporal family: sessionize / as-of join / interval join ----
    def ev_sessionize(spark, sf_dir):
        # project to the four columns the rollup reads BEFORE the window:
        # the events schema carries props/event_type strings the session
        # window would otherwise drag through its shuffle + sort (guide
        # §2.3 "project before the exchange"; result-identical)
        e = _read(spark, sf_dir, "events").select(
            "user_id", "event_id", "ts", "value"
        )
        s = temporal.sessionize(
            e, key_col="user_id", ts_col="ts", gap_sec=7200, tiebreak_col="event_id"
        )
        return (
            s.groupBy("user_id", "session_seq")
            .agg(
                F.count("*").alias("n_events"),
                F.min("ts").alias("start_ts"),
                F.max("ts").alias("end_ts"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .orderBy("user_id", "session_seq")
        )

    reg(
        "events_sessionize",
        ev_sessionize,
        """WITH o AS (SELECT user_id, event_id, ts, value,
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_ts
                      FROM events),
           b AS (SELECT user_id, event_id, ts, value,
                        CASE WHEN prev_ts IS NULL
                                  OR epoch(ts - prev_ts) > 7200 THEN 1
                             ELSE 0 END AS brk
                 FROM o),
           s AS (SELECT user_id, ts, value,
                        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
                 FROM b)
           SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
                  min(ts) AS start_ts, max(ts) AS end_ts,
                  round(sum(value), 2) AS total_value
           FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    )

    def ev_asof(spark, sf_dir):
        e = _read(spark, sf_dir, "events")
        anchors = (
            e.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("pval"))
        )
        # the event_id filter commutes with the as-of join (it reads only
        # left-row columns, and each left row's match is independent of
        # other left rows) — applying it BEFORE the join sends 1/20th of
        # the left side through the union + window sort (guide §2.3)
        joined = temporal.asof_join(
            e.select("event_id", "user_id", "ts").filter(
                F.col("event_id") % 20 == 0
            ),
            anchors,
            "user_id",
        )
        return (
            joined
            .select(
                "event_id",
                "user_id",
                "ts",
                F.col("ts_asof").alias("last_purchase_ts"),
                F.round("pval", 2).alias("last_purchase_value"),
            )
            .orderBy("event_id")
        )

    reg(
        "events_asof_last_purchase",
        ev_asof,
        """WITH r AS (SELECT user_id, ts AS pts, max(value) AS pval
                      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
           SELECT e.event_id, e.user_id, e.ts,
                  r.pts AS last_purchase_ts,
                  round(r.pval, 2) AS last_purchase_value
           FROM events e ASOF LEFT JOIN r
             ON e.user_id = r.user_id AND e.ts >= r.pts
           WHERE e.event_id % 20 = 0
           ORDER BY e.event_id""",
    )

    _BANDS = [(1, 0.0, 100.0), (2, 100.0, 250.0), (3, 250.0, 500.0)]

    def ev_band_join(spark, sf_dir):
        e = _read(spark, sf_dir, "events")
        bands = spark.createDataFrame(
            _BANDS, "band_id int, lo double, hi double"
        )
        # binned strategy on purpose: the driver gate exercises the
        # large-interval-table scale path, not just the broadcast one
        j = temporal.interval_join(
            e.select("event_id", "value"),
            bands,
            "value",
            "lo",
            "hi",
            strategy="binned",
            bin_width=50.0,
        )
        return (
            j.groupBy("band_id")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .orderBy("band_id")
        )

    _band_values = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _BANDS)
    reg(
        "events_value_band_join",
        ev_band_join,
        f"""WITH bands(band_id, lo, hi) AS (VALUES {_band_values})
            SELECT band_id::INT AS band_id, count(*)::BIGINT AS n,
                   round(sum(value), 2) AS total_value
            FROM events JOIN bands ON value BETWEEN lo AND hi
            GROUP BY 1 ORDER BY 1""",
    )

    return queries, oracles
