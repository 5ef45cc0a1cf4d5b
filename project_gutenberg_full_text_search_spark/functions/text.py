"""Tokenization + trigram extraction.

The Spark analog of PostgreSQL ``to_tsvector`` / ``pg_trgm`` (reference:
tables/mv_books_dc.sql:183,186-194 and 472-487) minus stemming (source-code
identifiers must not be stemmed).

Two implementations of the same tokenization:

- Column expressions (``tokens_col``) — pure JVM / whole-stage-codegen,
  used for doc_len and simple paths.
- numpy batch tokenizer (``tokenize_batch``) — used inside the index
  build's mapInPandas where we need (term, tf, positions) per doc without
  a (doc,term) shuffle. Arrow-batched; the per-doc np.unique is vectorized.

Both MUST agree exactly (tests/test_tokenizer.py) and must match the
DuckDB oracle expression in __spark_entry__.oracle_sql():
``regexp_split_to_array(lower(text), '[^a-z0-9_]+')`` minus empties.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Token = run of [a-z0-9_] after lowercasing. Identical regex usable in
# Spark, DuckDB, and Python `re`.
TOKEN_SPLIT_RE = "[^a-z0-9_]+"


def tokens_col(col: Column | str) -> Column:
    """Array<string> of tokens; JVM-side (codegen), no UDF.

    ``regexp_extract_all`` of token RUNS, not ``split`` on separator runs:
    findall-of-runs ≡ split-minus-empties (the same equivalence
    ``tokenize_str`` exploits), but Spark's StringSplit re-compiles its
    pattern per row via ``String.split`` while RegExpExtractAll caches the
    compiled Pattern — measured 8× on a 50k-doc scan (2.0 s → 0.27 s,
    OPTIMIZATION_r06.md). Exact-equality with ``tokenize_str`` stays
    covered by tests/test_tokenizer.py."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_FIND_RE), F.lit(0))


def doc_len_col(col: Column | str) -> Column:
    return F.size(tokens_col(col))


# findall of token runs ≡ split on separator runs minus empties, 1.5×
# faster (measured 45 vs 30 MB/s on corpus text) — same token stream.
TOKEN_FIND_RE = "[a-z0-9_]+"


def tokenize_str(s: str) -> list[str]:
    """Python twin of tokens_col (oracle / driver-side)."""
    import re

    return re.findall(TOKEN_FIND_RE, s.lower())


def tokenize_batch(texts) -> list[np.ndarray]:
    """Tokenize a batch of strings → list of string ndarrays."""
    import re

    pat = re.compile(TOKEN_FIND_RE)
    out = []
    for s in texts:
        out.append(np.asarray(pat.findall(s.lower()), dtype=object))
    return out


# ---------------------------------------------------------------------------
# Trigrams (pg_trgm semantics: per word, pad '  w ' then 3-grams; the
# padded set is what word_similarity uses).
# ---------------------------------------------------------------------------


def word_trigrams(word: str, pad: bool = True) -> set[str]:
    if not word:
        return set()
    w = f"  {word} " if pad else word
    if len(w) < 3:
        return set()
    return {w[i : i + 3] for i in range(len(w) - 2)}


def text_trigrams(text: str, pad: bool = True) -> set[str]:
    out: set[str] = set()
    for w in tokenize_str(text):
        out |= word_trigrams(w, pad)
    return out


def trigram_similarity(a: set[str], b: set[str]) -> float:
    """Jaccard similarity of trigram sets (pg_trgm ``similarity()``)."""
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def trigrams_col(col: Column | str, pad: bool = True) -> Column:
    """Array<string> of distinct trigrams of a single WORD column, JVM-side.

    Mirrors word_trigrams(); pads with two leading + one trailing space.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = F.concat(F.lit("  "), F.lower(c), F.lit(" ")) if pad else F.lower(c)
    return F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(w) - F.lit(2), F.lit(0))),
                lambda i: w.substr(i, F.lit(3)),
            ),
            lambda t: F.length(t) == 3,
        )
    )
