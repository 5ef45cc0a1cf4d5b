"""Raw-corpus ingestion readers → canonical docs schema."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from project_gutenberg_full_text_search_spark.sources.ingest import (
    DOCS_SCHEMA_DDL,
    normalize_docs,
    read_csv_docs,
    read_jsonl,
    read_text_files,
    read_text_lines,
)

CANON = ["doc_id", "text", "lang", "source", "n_chars"]


def _assert_canonical(df):
    assert df.columns == CANON
    types = dict(df.dtypes)
    assert types == {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    }


def test_read_jsonl_plain_and_gz(spark, tmp_path):
    rows = [
        {"id": 1, "body": "the quick brown fox", "language": "en"},
        {"id": 2, "body": "le renard brun", "language": "fr"},
        {"id": 3, "body": "", "language": "en"},  # empty text: dropped
        {"id": 4, "language": "de"},  # missing text: dropped
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    gz = tmp_path / "docs2.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        f.write(json.dumps({"id": 9, "body": "vom schnellen fuchs", "language": "de"}))

    df = read_jsonl(
        spark, str(p), text_field="body", id_field="id", lang_field="language",
        source="wiki",
    )
    _assert_canonical(df)
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == {1, 2}
    assert got[1]["text"] == "the quick brown fox"
    assert got[1]["lang"] == "en" and got[1]["source"] == "wiki"
    assert got[1]["n_chars"] == 19

    gz_df = read_jsonl(spark, str(gz), text_field="body", id_field="id")
    row = gz_df.collect()[0]
    assert row["doc_id"] == 9 and row["text"].startswith("vom")
    assert row["source"].endswith("docs2.jsonl.gz")  # default source = file


def test_read_csv_docs(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text('id,text,lang\n7,"hello, world",en\n8,plain,fr\n')
    df = read_csv_docs(spark, str(p), id_field="id", lang_field="lang", source="s")
    _assert_canonical(df)
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[7]["text"] == "hello, world" and got[8]["lang"] == "fr"


def test_read_text_files_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "corpus"
    os.makedirs(d)
    (d / "a.txt").write_text("alpha doc\nwith two lines")
    (d / "b.txt").write_text("beta doc")
    df = read_text_files(spark, str(d), source="files")
    _assert_canonical(df)
    texts = sorted(r["text"] for r in df.collect())
    assert texts == ["alpha doc\nwith two lines", "beta doc"]
    # ids are path hashes: stable across re-reads
    ids1 = sorted(r["doc_id"] for r in df.collect())
    ids2 = sorted(
        r["doc_id"] for r in read_text_files(spark, str(d), source="x").collect()
    )
    assert ids1 == ids2


def test_read_text_lines_and_dup_collapse(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("same line\nsame line\nother line\n")
    df = read_text_lines(spark, str(p), source="lines")
    _assert_canonical(df)
    rows = df.collect()
    assert len(rows) == 3
    ids = {r["text"]: r["doc_id"] for r in rows}
    # synthesized ids are text hashes: exact dups share an id
    assert len({r["doc_id"] for r in rows}) == 2
    assert ids["same line"] != ids["other line"]


def test_normalize_docs_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    with pytest.raises(ValueError, match="not in"):
        normalize_docs(df, text_col="body")
    with pytest.raises(ValueError, match="not both"):
        normalize_docs(df, source="a", source_col="text")


def test_ingested_corpus_feeds_the_engine(spark, tmp_path):
    # end-to-end: jsonl → canonical docs → index build → BM25 query
    from project_gutenberg_full_text_search_spark.operators.bm25 import (
        IndexHandle,
        bm25_topk,
    )
    from project_gutenberg_full_text_search_spark.operators.build_index import (
        build_index,
    )

    p = tmp_path / "c.jsonl"
    rows = [
        {"id": i, "body": f"document number {i} about {'spark' if i % 2 else 'ducks'}"}
        for i in range(30)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    docs = read_jsonl(spark, str(p), text_field="body", id_field="id", source="t")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, text_col="text", input_fingerprint="ingest-test")
    h = IndexHandle.open(spark, idx)
    hits = bm25_topk(h, "spark", k=5).collect()
    assert len(hits) == 5
    assert all(r["doc_id"] % 2 == 1 for r in hits)


def test_schema_ddl_matches_driver_documents_table(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    canon = spark.createDataFrame([], DOCS_SCHEMA_DDL)
    assert [f.name for f in canon.schema.fields] == df.columns
