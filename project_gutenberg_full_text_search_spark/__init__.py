"""project_gutenberg_full_text_search_spark — a PySpark-native full-text engine.

A from-scratch distributed inverted-index + BM25 (k1=1.2, b=0.75) engine with
trigram fuzzy / substring search, a chainable query DSL, facets, and
training-data-pipeline operators (dedup, ANN similarity, text analysis).

Semantics derive from zachjesus/Project-Gutenberg-Full-Text-Search (the
reference at /root/reference): PostgreSQL tsvector/pg_trgm behavior
re-expressed Spark-first — declarative DataFrame plans, vectorized
Arrow/pandas UDFs only where built-ins can't express the op, no per-row
Python in any hot path.

Layout
------
functions/   tokenization, trigram, varint codecs, cross-engine hashing
operators/   index build, BM25 scoring, fuzzy, contains, dedup, ANN, facets
plans/       websearch query parser + SearchQuery DSL + planner
sources/     table IO (parquet now, Iceberg-shaped), checkpoint manifests
streaming/   incremental index refresh (Structured Streaming)
opds/        OPDS 2.0 feed layer (search/browse/facets) + stdlib server
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
