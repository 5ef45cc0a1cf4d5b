"""Search-result snippets with term highlighting — the ``ts_headline``
analog for this engine.

The reference serves raw document rows and leaves excerpting to the
client (its PostgreSQL backend ships ``ts_headline`` but
``full_text_search.py`` never calls it); any real search UI needs the
"show a fragment around the match with the query terms emphasized"
step, so this engine provides it as a first-class operator.

Semantics (deterministic, engine-independent — bit-identical DuckDB twin
in ``entry_queries``):

* tokenize the document with THE ENGINE'S tokenizer (lowercase, split on
  ``[^a-z0-9_]+``, drop empties) so highlight hits agree exactly with
  what the index matched;
* ``first_pos`` = the smallest 1-based token index holding ANY query
  term (ties to the earliest term occurrence by construction);
* the snippet is the token window ``[first_pos - window,
  first_pos + window]`` clamped to the document, every token equal to a
  query term wrapped in ``start_tag``/``end_tag``, joined by single
  spaces. Lowercased tokens, not original spans: the snippet is the
  match EVIDENCE (what the index saw), stable across case/punctuation
  variants — the classic KWIC (keyword-in-context) form;
* ``n_hits`` = total query-term token occurrences in the whole document
  (the "...and 14 more matches" counter).

Docs where no query term occurs get a NULL ``first_pos``/``snippet``
(callers feeding FTS top-k rows never see one — every positive-clause
match has at least one positive term in its token stream; phrase-only
windows still contain the phrase's constituent terms).

Scale shape: one narrow projection over the (doc_id-joined) rows it is
given — no shuffle, no UDF, whole-stage-codegen column algebra, applied
AFTER top-k so it touches k rows, not the corpus. The token array is
materialized once per row (``_toks``) and every expression references
that column, the same single-evaluation pattern as
``textstats.text_profile``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.text import tokens_col

DEFAULT_WINDOW = 8
START_TAG = "<b>"
END_TAG = "</b>"


def _first_pos(toks: Column, terms: list[str]) -> Column:
    """Smallest 1-based index of any term (NULL when none occur).

    ``F.array_position`` returns 0 for "absent"; mapping 0 → NULL lets
    ``F.least`` (which skips NULLs) take the min over present terms only.
    """
    positions = [
        F.when(F.array_position(toks, t) > 0, F.array_position(toks, t))
        for t in terms
    ]
    if len(positions) == 1:
        return positions[0]
    return F.least(*positions)


def snippet_cols(
    text_col: str,
    terms: list[str],
    window: int = DEFAULT_WINDOW,
    start_tag: str = START_TAG,
    end_tag: str = END_TAG,
) -> list[Column]:
    """The three snippet columns (``first_pos``, ``n_hits``,
    ``snippet``) over a materialized ``_toks`` column — compose into a
    ``select`` after ``.withColumn("_toks", tokens_col(text_col))``."""
    toks = F.col("_toks")
    terms = sorted(set(terms))
    pos = _first_pos(toks, terms)
    start = F.greatest(F.lit(1), pos - window)
    length = pos + window - start + 1
    window_toks = F.slice(toks, start, length)
    is_term = lambda t: t.isin(terms)  # noqa: E731
    marked = F.transform(
        window_toks,
        lambda t: F.when(
            is_term(t), F.concat(F.lit(start_tag), t, F.lit(end_tag))
        ).otherwise(t),
    )
    return [
        pos.cast("int").alias("first_pos"),
        F.size(F.filter(toks, is_term)).cast("int").alias("n_hits"),
        F.when(pos.isNotNull(), F.concat_ws(" ", marked)).alias("snippet"),
    ]


def snippets(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    start_tag: str = START_TAG,
    end_tag: str = END_TAG,
) -> DataFrame:
    """Append ``first_pos`` / ``n_hits`` / ``snippet`` to ``df``.

    ``df`` is typically FTS top-k rows joined back to the documents
    table; every input column is preserved (minus ``text_col``'s helper
    token array). ``terms`` should be the query's positive terms,
    already engine-normalized (lowercase) — ``plans.parser`` output is.
    """
    keep = [c for c in df.columns]
    return (
        df.withColumn("_toks", tokens_col(text_col))
        .select(*keep, *snippet_cols(text_col, terms, window, start_tag, end_tag))
    )


def snippet_sql(
    text_expr: str,
    terms: list[str],
    window: int = DEFAULT_WINDOW,
    start_tag: str = START_TAG,
    end_tag: str = END_TAG,
) -> str:
    """DuckDB twin of :func:`snippet_cols`: a SQL fragment producing
    ``first_pos``, ``n_hits``, ``snippet`` from ``text_expr``. Embed in
    a SELECT over a CTE that exposes the document text."""
    terms = sorted(set(terms))
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = (
        "list_filter(regexp_split_to_array(lower("
        + text_expr
        + "), '[^a-z0-9_]+'), x -> x <> '')"
    )
    pos_list = ", ".join(f"list_position({toks}, '{t}')" for t in terms)
    # absent-term sentinel differs across DuckDB versions (NULL in recent
    # releases, 0 in older ones) — filter both so only real 1-based hits
    # compete; list_min over an empty list is NULL, matching Spark
    first_pos = (
        f"list_min(list_filter([{pos_list}], x -> x IS NOT NULL AND x > 0))"
    )
    start = f"greatest(1, {first_pos} - {window})"
    marked = (
        f"list_transform(array_slice({toks}, {start}, {first_pos} + {window}), "
        f"t -> CASE WHEN t IN ({tlist}) THEN '{start_tag}' || t || '{end_tag}' "
        "ELSE t END)"
    )
    return (
        f"{first_pos}::INT AS first_pos, "
        f"len(list_filter({toks}, t -> t IN ({tlist})))::INT AS n_hits, "
        f"CASE WHEN {first_pos} IS NOT NULL "
        f"THEN array_to_string({marked}, ' ') END AS snippet"
    )
