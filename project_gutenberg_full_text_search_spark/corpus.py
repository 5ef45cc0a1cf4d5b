"""Deterministic synthetic source-code corpus generator.

Produces the engine's canonical input table (per BASELINE.json input_hint):

    docs(repo: string, path: string, commit: string, lang: string,
         content: string)

plus derived ``doc_id`` (dense long) and ``sha256`` (per-row invariant:
the engine re-computes sha256(content) and must match — asserted in
tests/test_index_build.py).

Design properties (FIXTURES.md §1):
- Seed-deterministic *per doc_id*: content of doc i depends only on
  (seed, i), never on partitioning or parallelism — the same corpus is
  produced at local[1] and local[32], which is what makes the corpus a
  stable oracle input and the scaling bench an apples-to-apples compare.
- Zipf vocabulary (~N_VOCAB terms): top terms appear in most docs
  (hot-term skew exercises the salted/range-split posting merge).
- Per-doc rare terms (``uniq_<i>_<j>``) for unique-hit queries.
- Planted phrases for phrase-query tests.
- Log-normal doc length (BM25 length normalization is exercised).
- Zipf repo sizes → a few huge repos (partition-skew exercise).

Generation is distributed: ``spark.range(n) → mapInPandas`` so a
10^12-row corpus would generate in parallel with no driver bottleneck.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

LANGS = ["py", "java", "c", "go", "js", "md"]
LANG_KEYWORDS = {
    "py": ["def", "class", "import", "return", "self"],
    "java": ["public", "static", "void", "class", "extends"],
    "c": ["struct", "static", "void", "sizeof", "typedef"],
    "go": ["func", "package", "interface", "defer", "chan"],
    "js": ["function", "const", "let", "async", "await"],
    "md": ["the", "and", "usage", "install", "example"],
}
PLANTED_PHRASES = [
    "merge sorted posting lists",
    "block max wand pruning",
    "delta varint compression",
]
N_VOCAB = 50_000
ZIPF_A = 1.2


def _vocab(n: int = N_VOCAB) -> list[str]:
    """Deterministic identifier-style vocabulary, rank 0 = hottest."""
    roots = [
        "index", "query", "token", "merge", "block", "score", "parse",
        "fetch", "cache", "shard", "chunk", "batch", "frame", "field",
        "value", "count", "table", "store", "graph", "node",
    ]
    out = []
    i = 0
    while len(out) < n:
        r = roots[i % len(roots)]
        out.append(f"{r}{i // len(roots)}" if i >= len(roots) else r)
        i += 1
    return out


_VOCAB_CACHE: list[str] | None = None


def get_vocab() -> list[str]:
    global _VOCAB_CACHE
    if _VOCAB_CACHE is None:
        _VOCAB_CACHE = _vocab()
    return _VOCAB_CACHE


def gen_doc(i: int, seed: int = 42, length_scale: float = 1.0) -> dict:
    """Generate doc i. Depends only on (seed, i, length_scale).

    ``length_scale`` multiplies the token-count distribution (default ~220
    tokens ≈ 1.3 KB). The scaling bench uses larger docs (~10 KB — typical
    real source-file size) so per-doc work dominates fixed per-task cost.
    """
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(0x9E3779B9) + np.uint64(i))
    vocab = get_vocab()
    n_orgs = 17
    # Zipf-ish repo assignment: low repo ids get many docs
    repo_id = int(rng.zipf(1.3)) % 97
    repo = f"org{repo_id % n_orgs}/repo{repo_id}"
    lang = LANGS[int(rng.integers(0, 36)) % len(LANGS)] if repo_id % 5 else "py"
    path = f"src/pkg{int(rng.integers(0, 40))}/mod{int(rng.integers(0, 30))}/file{i}.{lang}"
    commit = hashlib.sha1(f"{seed}:{repo}:{path}".encode()).hexdigest()
    # log-normal length 50..5000 tokens (× length_scale)
    n_tok = int(
        np.clip(np.exp(rng.normal(5.0, 0.9)) * length_scale, 50, 5000 * length_scale)
    )
    ranks = rng.zipf(ZIPF_A, size=n_tok) - 1
    words = [vocab[r % len(vocab)] for r in ranks]
    # lang keywords sprinkled in
    kw = LANG_KEYWORDS[lang]
    for j in range(0, n_tok, 37):
        words[j] = kw[j % len(kw)]
    # per-doc rare terms (unique-hit queries)
    for j in range(int(rng.integers(1, 4))):
        pos = int(rng.integers(0, n_tok))
        words[pos] = f"uniq_{i}_{j}"
    # planted phrase in ~5% of docs
    if rng.random() < 0.05:
        ph = PLANTED_PHRASES[i % len(PLANTED_PHRASES)].split()
        pos = int(rng.integers(0, max(1, n_tok - len(ph))))
        words[pos : pos + len(ph)] = ph
    # format as code-ish lines
    lines = []
    for s in range(0, len(words), 8):
        lines.append(" ".join(words[s : s + 8]))
    content = "\n".join(lines)
    return {
        "doc_id": i,
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "sha256": hashlib.sha256(content.encode()).hexdigest(),
    }


def gen_corpus_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation (tests, oracle). Same rows as the Spark path."""
    return pd.DataFrame([gen_doc(i, seed) for i in range(n_docs)])


# ---------------------------------------------------------------------------
# Metadata fixture (FIXTURES.md §4-5): the analog of mv_books_dc's scalar
# columns + dc jsonb (reference: tables/mv_books_dc.sql:32-133,196-430) so
# every reference filter method and facet has a test target.
# ---------------------------------------------------------------------------

LOCC_CODES = ["P", "PS", "PS12", "PQ", "Q", "QA", "QA76", "T", "TK", "B"]
ROLES = ["Author", "Illustrator", "Editor", "Translator"]
MEDIATYPES = ["text/html", "text/plain", "application/epub+zip", "application/x-mobipocket-ebook"]
ENCODINGS = ["utf-8", "us-ascii", "iso-8859-1"]
FILETYPES = ["epub3.images", "epub.images", "html", "cover.medium", "pdf.images", "index"]
N_SUBJECTS = 40
N_SHELVES = 15
N_AUTHORS = 60


def gen_meta_row(i: int, seed: int = 42) -> dict:
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(0xC2B2AE35) + np.uint64(i))
    vocab = get_vocab()
    n_auth = int(rng.integers(1, 4))
    author_ids = sorted(int(a) for a in rng.choice(N_AUTHORS, size=n_auth, replace=False))
    authors = [f"author_{a}" for a in author_ids]
    births = [1700 + (a * 7) % 250 for a in author_ids]
    n_subj = int(rng.integers(1, 5))
    subj_ids = sorted(int(s) for s in rng.choice(N_SUBJECTS, size=n_subj, replace=False))
    n_shelf = int(rng.integers(0, 3))
    shelf_ids = sorted(int(s) for s in rng.choice(N_SHELVES, size=n_shelf, replace=False))
    title_words = [vocab[int(r) % 200] for r in rng.integers(0, 200, size=3)]
    year_off = int(rng.integers(0, 9000))
    has_birthyear = rng.random() > 0.1
    return {
        "doc_id": i,
        "title": " ".join(title_words) + f" vol{i % 7}",
        "all_authors": " | ".join(authors),
        "all_subjects": " | ".join(f"subject_{s}" for s in subj_ids),
        "downloads": int(rng.zipf(1.4)) % 100_000,
        "release_date": (np.datetime64("1995-01-01") + np.timedelta64(year_off, "D")).astype("datetime64[D]").item(),
        "copyrighted": int(rng.random() < 0.2),
        "lang_codes": [LANGS[int(rng.integers(0, len(LANGS)))], "en"][: 1 + int(rng.random() < 0.3)],
        "is_audio": bool(rng.random() < 0.1),
        "max_author_birthyear": max(births) if has_birthyear else None,
        "min_author_birthyear": min(births) if has_birthyear else None,
        "max_author_deathyear": max(b + 70 for b in births) if has_birthyear else None,
        "min_author_deathyear": min(b + 70 for b in births) if has_birthyear else None,
        "locc_codes": sorted(
            {LOCC_CODES[int(c)] for c in rng.choice(len(LOCC_CODES), size=int(rng.integers(1, 3)))}
        ),
        "dc": {
            "creators": [
                {"id": a, "name": f"author_{a}", "role": ROLES[a % len(ROLES)]}
                for a in author_ids
            ],
            "subjects": [{"id": s, "subject": f"subject_{s}"} for s in subj_ids],
            "format": [
                {
                    "mediatype": MEDIATYPES[int(rng.integers(0, len(MEDIATYPES)))],
                    "encoding": ENCODINGS[int(rng.integers(0, len(ENCODINGS)))],
                    "filename": f"{i}-{j}.bin",
                    "extent": int(rng.integers(1000, 10_000_000)),
                    "filetype": FILETYPES[int(rng.integers(0, len(FILETYPES)))],
                    "hr_filetype": f"Format {j}",
                }
                for j in range(int(rng.integers(1, 4)))
            ],
            "bookshelves": [{"id": s, "bookshelf": f"shelf_{s}"} for s in shelf_ids],
            # OPDS-richness fields (reference crosswalks.py:59-206 reads
            # these from the Gutenberg dc jsonb; our fixture plants
            # deterministic analogs so the crosswalk parity is testable)
            "summary": [f"summary of doc {i}"] if rng.random() < 0.8 else [],
            "description": [f"note {i}a", f"note {i}b"][: int(rng.integers(0, 3))],
            "credits": [f"credit_{i % 11}"] if rng.random() < 0.5 else [],
            "marc": (
                [{"code": 508, "text": f"Updated: 2020-0{1 + i % 9}-15."}]
                if rng.random() < 0.6
                else []
            )
            + ([{"code": 908, "text": f"Reading level {i % 5}"}] if rng.random() < 0.3 else []),
            "rights": "Public domain in the USA." if i % 5 else None,
            "date": f"19{50 + i % 50}-01-01",
            "language": [{"code": LANGS[i % len(LANGS)]}],
        },
        "_subj_ids": subj_ids,
        "_shelf_ids": shelf_ids,
    }


META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("all_authors", T.StringType(), False),
        T.StructField("all_subjects", T.StringType(), False),
        T.StructField("downloads", T.LongType(), False),
        T.StructField("release_date", T.DateType(), False),
        T.StructField("copyrighted", T.IntegerType(), False),
        T.StructField("lang_codes", T.ArrayType(T.StringType()), False),
        T.StructField("is_audio", T.BooleanType(), False),
        T.StructField("max_author_birthyear", T.IntegerType(), True),
        T.StructField("min_author_birthyear", T.IntegerType(), True),
        T.StructField("max_author_deathyear", T.IntegerType(), True),
        T.StructField("min_author_deathyear", T.IntegerType(), True),
        T.StructField("locc_codes", T.ArrayType(T.StringType()), False),
        T.StructField(
            "dc",
            T.StructType(
                [
                    T.StructField(
                        "creators",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("name", T.StringType()),
                                    T.StructField("role", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "subjects",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("subject", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "format",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("mediatype", T.StringType()),
                                    T.StructField("encoding", T.StringType()),
                                    T.StructField("filename", T.StringType()),
                                    T.StructField("extent", T.LongType()),
                                    T.StructField("filetype", T.StringType()),
                                    T.StructField("hr_filetype", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "bookshelves",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("bookshelf", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField("summary", T.ArrayType(T.StringType())),
                    T.StructField("description", T.ArrayType(T.StringType())),
                    T.StructField("credits", T.ArrayType(T.StringType())),
                    T.StructField(
                        "marc",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("code", T.IntegerType()),
                                    T.StructField("text", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField("rights", T.StringType(), True),
                    T.StructField("date", T.StringType()),
                    T.StructField(
                        "language",
                        T.ArrayType(
                            T.StructType([T.StructField("code", T.StringType())])
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def gen_meta(spark: SparkSession, n_docs: int, seed: int = 42) -> dict[str, DataFrame]:
    """Meta table + dimension/bridge tables, all deterministic.

    Returns {"meta", "subjects", "bookshelves", "loccs",
    "mn_docs_subjects", "mn_docs_bookshelves"}.
    """
    rows = [gen_meta_row(i, seed) for i in range(n_docs)]
    bridge_s = [(r["doc_id"], s) for r in rows for s in r.pop("_subj_ids")]
    bridge_b = [(r["doc_id"], s) for r in rows for s in r.pop("_shelf_ids")]
    meta = spark.createDataFrame(rows, schema=META_SCHEMA)
    subjects = spark.createDataFrame(
        [(s, f"subject_{s}") for s in range(N_SUBJECTS)], "pk long, subject string"
    )
    shelves = spark.createDataFrame(
        [(s, f"shelf_{s}") for s in range(N_SHELVES)], "pk long, bookshelf string"
    )
    loccs = spark.createDataFrame(
        [(c, f"locc class {c}") for c in LOCC_CODES], "pk string, locc string"
    )
    return {
        "meta": meta,
        "subjects": subjects,
        "bookshelves": shelves,
        "loccs": loccs,
        "mn_docs_subjects": spark.createDataFrame(bridge_s, "fk_docs long, fk_subjects long"),
        "mn_docs_bookshelves": spark.createDataFrame(bridge_b, "fk_docs long, fk_bookshelves long"),
    }


def gen_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    length_scale: float = 1.0,
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas (Arrow-batched)."""
    parts = partitions or max(2, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_docs, 1, parts)

    def gen_batches(it):
        for pdf in it:
            yield pd.DataFrame(
                [gen_doc(int(i), seed, length_scale) for i in pdf["id"]]
            )

    return base.mapInPandas(gen_batches, schema=DOCS_SCHEMA)
