"""PII / URL scrubbing — the redaction pass of a training-data pipeline.

Pure JVM column algebra (chained ``regexp_replace`` inside whole-stage
codegen — no UDF, no shuffle, scales linearly with scanned bytes), with an
exact DuckDB-SQL twin so the driver's value-hash compare validates the
redacted text byte-for-byte.

Patterns are deliberately restricted to the regex subset with identical
semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
greedy quantifiers, alternation, ``\\b`` — no backreferences or
lookaround (RE2 has neither). Order is part of the contract (URLs first —
an email-looking userinfo inside a URL must redact as part of the URL,
not leave a dangling scheme).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_col(text_col: str | Column) -> Column:
    """Redacted text column: every rule applied in SCRUB_RULES order."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pat, repl in SCRUB_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_count_cols(text_col: str) -> list[Column]:
    """Per-rule match counts (on the ORIGINAL text — counts are
    pre-redaction occurrences, so url counts are not disturbed by email
    replacement and vice versa)."""
    return [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in SCRUB_RULES
    ]


def scrub_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, clean, n_url, n_email, n_ipv4) — one codegen'd projection."""
    return df.select(
        F.col(id_col),
        scrub_col(text_col).alias("clean"),
        *scrub_count_cols(text_col),
    )


def scrub_sql(text_expr: str) -> str:
    """DuckDB fragment producing the identical redacted text."""
    out = text_expr
    for _, pat, repl in SCRUB_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def scrub_count_sql(text_expr: str) -> list[str]:
    return [
        f"len(regexp_extract_all({text_expr}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in SCRUB_RULES
    ]


def scrub_py(text: str) -> str:
    """Pure-Python twin (re.sub, same rules in the same order) — used by
    the property tests to fuzz pattern portability across engines far
    faster than a Spark job per example.

    Cross-engine contract note: the three engines (Java regex / RE2 /
    Python re) agree on these patterns for ASCII text. ``\\b`` semantics
    differ around non-ASCII word characters (RE2's word boundary is
    ASCII-only; Python's is unicode-aware), so redaction of digits
    directly adjacent to non-ASCII letters may differ between engines —
    the patterns avoid every other divergent construct by design
    (no lookaround, no backreferences, greedy quantifiers only).
    """
    import re

    out = text
    for _, pat, repl in SCRUB_RULES:
        out = re.sub(pat, repl, out)
    return out
