"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure JVM column algebra (codegen'd, no UDF),
each with an exact DuckDB-SQL oracle twin in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.rounding import half_away_col
from project_gutenberg_full_text_search_spark.functions.text import tokens_col

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "los", "las", "es", "como"],
    "fr": ["le", "la", "les", "des", "est", "dans"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}
EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "is", "in", "it", "on", "for"]


def token_count_cols(text_col: str, toks: Column | None = None) -> list[Column]:
    """Whitespace token count + identifier-regex token count."""
    ws = F.size(F.array_remove(F.split(F.col(text_col), r"\s+"), ""))
    ident = F.size(tokens_col(text_col) if toks is None else toks)
    return [ws.alias("ws_tokens"), ident.alias("ident_tokens")]


def quality_cols(text_col: str, toks: Column | None = None) -> list[Column]:
    """Length / punctuation-ratio / stopword-ratio quality features + score.

    score = clamp01( 0.4·len_ok + 0.3·(1 − punct_ratio) + 0.3·stop_ratio )
    where len_ok = 1 if 20 ≤ n_tokens ≤ 10000.
    """
    toks = tokens_col(text_col) if toks is None else toks
    n = F.size(toks)
    n_chars = F.length(text_col)
    # punct count = length AFTER stripping [\w\s]+ RUNS: identical to the
    # former length-diff over per-char removal (both count exactly the
    # chars outside \w\s), but the regex engine sees ~one match per run of
    # normal text instead of one per punctuation char (regexp_count was
    # no better — Catalyst desugars it to size(regexp_extract_all(...)),
    # materializing an array element per matched char). Measured 2.5×
    # on the 50k-doc scan; equality asserted over the full corpus.
    punct = F.length(F.regexp_replace(F.col(text_col), r"[\w\s]+", ""))
    # raw (unrounded) ratios feed the score — rounding first would place the
    # score systematically on decimal .5 boundaries where Spark (HALF_UP on
    # decimal digits) and float-nearest engines disagree.
    punct_raw = punct / F.greatest(n_chars, F.lit(1))
    stop_raw = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / F.greatest(
        n, F.lit(1)
    )
    len_ok = F.when((n >= 20) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    # half_away_col, not F.round: these are integer ratios whose true
    # decimal value can land EXACTLY on the half grid (0.3*k/80 =
    # 37.5k/1e4) where Spark's shortest-repr half-up disagrees with the
    # DuckDB oracle's binary rounding — observed at sf0.1 (0.72625 ->
    # 0.7263 vs 0.7262). functions/rounding.py documents the semantics.
    score = half_away_col(
        F.least(
            F.greatest(
                0.4 * len_ok + 0.3 * (1 - punct_raw) + 0.3 * stop_raw, F.lit(0.0)
            ),
            F.lit(1.0),
        ),
        4,
    )
    return [
        n.alias("n_tokens"),
        half_away_col(punct_raw, 4).alias("punct_ratio"),
        half_away_col(stop_raw, 4).alias("stopword_ratio"),
        score.alias("quality_score"),
    ]


def langid_cols(text_col: str, toks: Column | None = None) -> list[Column]:
    """Heuristic language ID: distinct-token overlap with marker sets.

    predicted = lang with the max overlap count; ties broken by lang code
    ascending (deterministic, oracle-matched).
    """
    dtoks = F.array_distinct(tokens_col(text_col) if toks is None else toks)
    scores = {
        lang: F.size(F.array_intersect(dtoks, F.array(*[F.lit(m) for m in ms])))
        for lang, ms in sorted(LANG_MARKERS.items())
    }
    pred = F.lit("unknown")
    best = F.lit(-1)
    for lang in sorted(scores):  # ascending → later wins only on strictly greater
        pred = F.when(scores[lang] > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, scores[lang])
    out = [scores[lang].alias(f"score_{lang}") for lang in sorted(scores)]
    return out + [pred.alias("lang_pred")]


def fingerprint_col(text_col: str, toks: Column | None = None) -> Column:
    """Deterministic content fingerprint: md5 of the sorted distinct token
    set (robust to token order / duplication — a cheap near-dup key)."""
    return F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(tokens_col(text_col) if toks is None else toks)
            ),
        )
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "explode",
) -> DataFrame:
    """Gopher-style intra-document repetition signals (quality filtering).

    Per document: ``n_words``, ``distinct_word_ratio`` (distinct/total),
    ``top_word_frac`` (most frequent word's share), ``top_bigram_frac``
    (most frequent word-bigram's share of bigrams). High top-*-frac /
    low distinct-ratio marks boilerplate and generation loops — the
    repetition filters of Gopher (Rae et al. 2021 §A1.1) and the Dolma/
    RefinedWeb pipelines. Ratios rounded to 4 (oracle-matched).

    Two implementations, asserted identical in tests:

    * ``impl='explode'`` (default) — declarative two-level aggregation:
      explode words/bigrams, partial-aggregated ``groupBy(id, gram)``
      then ``groupBy(id)``. Catalyst/codegen end-to-end and the form the
      DuckDB oracle twins; the gram-keyed shuffles are uniform (doc_id
      salt is built into the key) so no skew at any corpus size.
    * ``impl='arrow'`` — single-pass, SHUFFLE-FREE ``mapInPandas``: the
      stats are per-row-computable, so at 100 TB one Arrow-batched scan
      beats shipping a ~10× row explosion through two shuffles. This is
      the scale path; the explode form is the oracle/verification path.
    """
    words = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    if impl == "arrow":
        import pandas as pd  # noqa: F401

        schema = (
            f"{id_col} long, n_words long, distinct_word_ratio double, "
            "top_word_frac double, top_bigram_frac double"
        )
        base = df.select(F.col(id_col), F.col(text_col))

        def gen(batches):
            import math
            from collections import Counter

            # DuckDB/engine-exact half-away rounding (ratios are
            # non-negative here): compare the true fractional part to
            # 0.5 instead of adding 0.5 (t+0.5 itself rounds when t sits
            # within half an ulp of the boundary) — matches
            # functions/rounding.half_away_py and the explode impl's
            # half_away_col
            def r4(x):
                t = x * 1e4
                f = math.floor(t)
                return (f + (1.0 if t - f >= 0.5 else 0.0)) / 1e4

            for pdf in batches:
                rows = []
                for i, t in zip(pdf[id_col], pdf[text_col]):
                    ws = [w for w in (t or "").split() if w]
                    n = len(ws)
                    wc = Counter(ws)
                    bc = Counter(zip(ws, ws[1:]))
                    rows.append(
                        (
                            i,
                            n,
                            r4(len(wc) / max(n, 1)),
                            r4(max(wc.values(), default=0) / max(n, 1)),
                            r4(max(bc.values(), default=0) / max(n - 1, 1)),
                        )
                    )
                import pandas as _pd

                yield _pd.DataFrame(
                    rows,
                    columns=[
                        id_col,
                        "n_words",
                        "distinct_word_ratio",
                        "top_word_frac",
                        "top_bigram_frac",
                    ],
                )

        return base.mapInPandas(gen, schema)

    base = df.select(F.col(id_col), words.alias("_ws"))
    n = F.size("_ws")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("_ws", i), F.element_at("_ws", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wstats = (
        base.select(F.col(id_col), F.explode("_ws").alias("g"))
        .groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_words"),
            F.count("*").alias("_nd"),
            F.max("count").alias("_topw"),
        )
    )
    bstats = (
        base.select(F.col(id_col), F.explode(bigrams).alias("g"))
        .groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_topb"))
    )
    nz = F.greatest(F.col("n_words"), F.lit(1))
    return (
        base.select(id_col)
        .join(wstats, id_col, "left")
        .join(bstats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            half_away_col(F.coalesce(F.col("_nd") / nz, F.lit(0.0)), 4).alias(
                "distinct_word_ratio"
            ),
            half_away_col(F.coalesce(F.col("_topw") / nz, F.lit(0.0)), 4).alias(
                "top_word_frac"
            ),
            half_away_col(
                F.coalesce(
                    F.col("_topb")
                    / F.greatest(F.col("n_words") - 1, F.lit(1)),
                    F.lit(0.0),
                ),
                4,
            ).alias("top_bigram_frac"),
        )
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 §A1.1) as a single
    shuffle-free column-algebra pass: per doc the raw signals plus a
    ``keep`` verdict ANDing every rule. The classic pre-training corpus
    gate (Gopher/MassiveText; reused by Dolma, RefinedWeb, FineWeb).

    Signals over whitespace words / newline lines:

    * ``n_words`` in [min_words, max_words]
    * ``mean_word_len`` in [min_mean_word_len, max_mean_word_len]
    * ``symbol_word_ratio`` (``#`` and non-overlapping ``...`` hits per
      word) <= max_symbol_word_ratio
    * ``alpha_word_ratio`` (words containing an ASCII letter) >=
      min_alpha_word_ratio
    * ``bullet_line_frac`` (lines starting ``-``/``*``/``•``) <=
      max_bullet_line_frac
    * ``ellipsis_line_frac`` (lines ending ``...``/``…``) <=
      max_ellipsis_line_frac
    * ``n_stopwords`` (distinct EN stopwords present, lowercased) >=
      min_stopwords

    Every rule compares RAW integer-ratio doubles (bit-identical across
    engines); the 4-digit rounding is display-only, so ``keep`` has an
    exact DuckDB twin (`gopher_rules_sql`). Scale shape: one narrow
    projection, no shuffle, no UDF — runs at parquet-scan speed at any
    corpus size and is the cheap first stage before the (shuffling)
    repetition_profile / dedup stages.
    """
    # MATERIALIZE the two splits once (same pattern text_profile uses):
    # ws feeds five rule expressions, three of them inputs to
    # higher-order-function lambdas. Codegen's subexpression elimination
    # happens to dedupe the repeated split subtrees today, but that is an
    # optimizer artifact of everything landing in one Project — a named
    # column makes single-evaluation STRUCTURAL (robust to the
    # expressions being split across operators or falling back to
    # interpreted eval). Measured perf-neutral at sf0.1 (±noise).
    ws = F.col("_ws")
    lines = F.col("_lines")
    n = F.size(ws)
    nz = F.greatest(n, F.lit(1))
    n_lines_z = F.greatest(F.size(lines), F.lit(1))
    char_sum = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_wl = char_sum / nz
    hash_hits = F.length(text_col) - F.length(
        F.expr(f"replace({text_col}, '#', '')")
    )
    ellipsis_hits = (
        F.length(text_col) - F.length(F.expr(f"replace({text_col}, '...', '')"))
    ) / 3
    symbol_ratio = (hash_hits + ellipsis_hits) / nz
    alpha_ratio = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))) / nz
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))) / n_lines_z
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
        / n_lines_z
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(ws, F.lower)),
            F.array(*[F.lit(s) for s in EN_STOPWORDS]),
        )
    )
    # raw signals materialize once here; `keep` then compares the RAW
    # doubles (columns, not re-evaluated lambda trees) and the final
    # select applies display rounding — each HOF runs exactly once/row
    raw = (
        df.withColumn("_ws", F.array_remove(F.split(F.col(text_col), r"\s+"), ""))
        .withColumn("_lines", F.split(F.col(text_col), r"\n"))
        .select(
            F.col(id_col),
            n.cast("long").alias("n_words"),
            mean_wl.alias("_mean_wl"),
            symbol_ratio.alias("_symbol_ratio"),
            alpha_ratio.alias("_alpha_ratio"),
            bullet_frac.alias("_bullet_frac"),
            ellipsis_frac.alias("_ellipsis_frac"),
            n_stop.cast("int").alias("n_stopwords"),
        )
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("_mean_wl") >= min_mean_word_len)
        & (F.col("_mean_wl") <= max_mean_word_len)
        & (F.col("_symbol_ratio") <= max_symbol_word_ratio)
        & (F.col("_alpha_ratio") >= min_alpha_word_ratio)
        & (F.col("_bullet_frac") <= max_bullet_line_frac)
        & (F.col("_ellipsis_frac") <= max_ellipsis_line_frac)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    # display rounding via half_away_col: same integer-ratio half-grid
    # hazard as quality_cols (keep itself compares RAW doubles)
    return raw.select(
        F.col(id_col),
        F.col("n_words"),
        half_away_col(F.col("_mean_wl"), 4).alias("mean_word_len"),
        half_away_col(F.col("_symbol_ratio"), 4).alias("symbol_word_ratio"),
        half_away_col(F.col("_alpha_ratio"), 4).alias("alpha_word_ratio"),
        half_away_col(F.col("_bullet_frac"), 4).alias("bullet_line_frac"),
        half_away_col(F.col("_ellipsis_frac"), 4).alias("ellipsis_line_frac"),
        F.col("n_stopwords"),
        keep.alias("keep"),
    )


def gopher_rules_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_stopwords: int = 2,
) -> str:
    """Exact DuckDB twin of :func:`gopher_rules` (same raw-double rule
    comparisons, same display rounding)."""
    stop_list = "[" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + "]"
    return rf"""WITH b AS (
          SELECT {id_col},
                 list_filter(regexp_split_to_array({text_col}, '\s+'), x -> x <> '') AS ws,
                 regexp_split_to_array({text_col}, '\n') AS lines,
                 (length({text_col}) - length(replace({text_col}, '#', '')))::DOUBLE AS hash_hits,
                 (length({text_col}) - length(replace({text_col}, '...', '')))::DOUBLE / 3 AS ell_hits
          FROM {table}),
        r AS (
          SELECT {id_col},
                 len(ws)::BIGINT AS n_words,
                 list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                     / greatest(len(ws), 1) AS mean_wl,
                 (hash_hits + ell_hits) / greatest(len(ws), 1) AS symbol_ratio,
                 len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                     / greatest(len(ws), 1) AS alpha_ratio,
                 len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]')))::DOUBLE
                     / greatest(len(lines), 1) AS bullet_frac,
                 len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$')))::DOUBLE
                     / greatest(len(lines), 1) AS ellipsis_frac,
                 len(list_intersect(list_distinct(list_transform(ws, x -> lower(x))),
                                    {stop_list}))::INT AS n_stop
          FROM b)
        SELECT {id_col},
               n_words,
               round(mean_wl, 4) AS mean_word_len,
               round(symbol_ratio, 4) AS symbol_word_ratio,
               round(alpha_ratio, 4) AS alpha_word_ratio,
               round(bullet_frac, 4) AS bullet_line_frac,
               round(ellipsis_frac, 4) AS ellipsis_line_frac,
               n_stop AS n_stopwords,
               (n_words >= {min_words} AND n_words <= {max_words}
                AND mean_wl >= {min_mean_word_len} AND mean_wl <= {max_mean_word_len}
                AND symbol_ratio <= {max_symbol_word_ratio}
                AND alpha_ratio >= {min_alpha_word_ratio}
                AND bullet_frac <= {max_bullet_line_frac}
                AND ellipsis_frac <= {max_ellipsis_line_frac}
                AND n_stop >= {min_stopwords}) AS keep
        FROM r"""


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass profile: all analysis columns together.

    Tokenization is MATERIALIZED once into an intermediate column and
    every feature expression references it: several of the features sit
    inside higher-order-function lambdas (filter/array_intersect), which
    fall outside whole-stage codegen's subexpression elimination — left
    implicit, the regex tokenizer would re-run per feature per row (~6×)."""
    toks = F.col("_toks")
    return (
        df.withColumn("_toks", tokens_col(text_col))
        .select(
            F.col(id_col),
            *token_count_cols(text_col, toks),
            *quality_cols(text_col, toks),
            *langid_cols(text_col, toks),
            fingerprint_col(text_col, toks).alias("fingerprint"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k distinguishing terms by smoothed TF-IDF.

    score = tf · (ln((N+1)/(df+1)) + 1), rounded to 4 — the classic
    keyword-extraction / corpus-exploration primitive (label a cluster,
    summarize a repo, build a lightweight doc signature). Emits
    (doc_id, rnk, term, score) with rnk 1..k ordered by (rounded score
    DESC, term ASC); ordering on the ROUNDED score keeps the ranking
    bit-stable across engines (raw-double ties broken lexically).

    Scale shape: two uniform-key shuffles (tf groupBy on (doc, term),
    df groupBy on term — both with map-side partials, so stopword-grade
    hot terms collapse before the exchange), corpus size N joined in as
    a broadcast single-row aggregate (no collect), and the top-k window
    partitions by doc_id — millions of small partitions, no global sort.
    The df join keys on term: its skew is bounded because the tf side
    is already (doc, term)-distinct, i.e. a term appears at most once
    per doc on the probe side.
    """
    from pyspark.sql import Window

    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n = df.select(F.count("*").cast("double").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", F.col("rnk").cast("int").alias("rnk"), "term", "score")
    )
