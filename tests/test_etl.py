"""Build-plane ETL operators (B11 nested-doc construction, B18 ANALYZE,
B13 sorted-table writes) vs the deterministic meta fixture / pandas."""

import pytest
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.corpus import gen_meta
from project_gutenberg_full_text_search_spark.operators import etl


@pytest.fixture(scope="module")
def dims(spark):
    return gen_meta(spark, 200, seed=42)


def test_denormalize_docs_dc_matches_fixture(spark, dims):
    """Reconstructing the nested dc + all_subjects from the normalized
    star must reproduce the fixture's denormalized meta exactly (the MV
    and its source tables agree by construction — mv_books_dc.sql:196-430)."""
    meta = dims["meta"]
    got = etl.denormalize_docs_dc(
        meta.select("doc_id"),
        dims["subjects"],
        dims["bookshelves"],
        dims["mn_docs_subjects"],
        dims["mn_docs_bookshelves"],
    ).toPandas().set_index("doc_id").sort_index()
    exp = meta.select("doc_id", "all_subjects", "dc").toPandas().set_index(
        "doc_id"
    ).sort_index()
    assert got["all_subjects"].tolist() == exp["all_subjects"].tolist()
    for d in exp.index[:50]:
        g, e = got.loc[d, "dc"], exp.loc[d, "dc"]
        assert [(s["id"], s["subject"]) for s in g["subjects"]] == [
            (s["id"], s["subject"]) for s in e["subjects"]
        ], d
        assert [(s["id"], s["bookshelf"]) for s in g["bookshelves"]] == [
            (s["id"], s["bookshelf"]) for s in e["bookshelves"]
        ], d


def test_analyze_table(spark, dims):
    meta = dims["meta"]
    pdf = meta.toPandas()
    stats = etl.analyze_table(meta, cols=["doc_id", "downloads", "title"])
    assert stats["n_rows"] == 200
    assert stats["columns"]["doc_id"]["min"] == 0
    assert stats["columns"]["doc_id"]["max"] == 199
    assert stats["columns"]["downloads"]["min"] == int(pdf.downloads.min())
    assert stats["columns"]["downloads"]["nulls"] == 0
    # HLL++ at 5% rsd on 200 exact-distinct ids
    assert abs(stats["columns"]["doc_id"]["ndv"] - 200) <= 20


def test_write_sorted_table_prunes(spark, dims, tmp_path):
    path = str(tmp_path / "sorted_meta")
    etl.write_sorted_table(
        dims["meta"].select("doc_id", "downloads", "title"),
        path,
        ["doc_id"],
        partitions=4,
        stats_path=str(tmp_path / "stats.json"),
    )
    back = etl.read_sorted_table(spark, path)
    q = back.filter((F.col("doc_id") >= 50) & (F.col("doc_id") <= 59))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(doc_id,50" in plan.replace(" ", "").replace(
        "doc_id,50)", "doc_id,50"
    ) or "PushedFilters" in plan
    assert sorted(r["doc_id"] for r in q.collect()) == list(range(50, 60))
    import json

    stats = json.loads(open(tmp_path / "stats.json").read())
    assert stats["columns"]["doc_id"]["min"] == 0
