"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure JVM column algebra (codegen'd, no UDF),
each with an exact DuckDB-SQL oracle twin in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    # raw (unrounded) ratios feed the score — rounding first would place the
    # score systematically on decimal .5 boundaries where Spark (HALF_UP on
    # decimal digits) and float-nearest engines disagree.
    punct_raw = punct / F.greatest(n_chars, F.lit(1))
    stop_raw = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / F.greatest(
        n, F.lit(1)
    )
    len_ok = F.when((n >= 20) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = F.round(
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
        F.round(punct_raw, 4).alias("punct_ratio"),
        F.round(stop_raw, 4).alias("stopword_ratio"),
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
