"""Fuzzy + contains vs oracle (reference matrix: test.py:61-113)."""

import pytest
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.operators.bm25 import IndexHandle
from project_gutenberg_full_text_search_spark.operators.contains import (
    contains_candidates,
    contains_naive,
    contains_search,
)
from project_gutenberg_full_text_search_spark.operators.fuzzy import (
    fuzzy_count,
    fuzzy_search,
    fuzzy_terms,
)

TYPOS = ["indx", "merg", "qurey", "blokc", "socre"]  # typos of vocab roots


@pytest.fixture(scope="module")
def handle(spark, index_dir):
    return IndexHandle.open(spark, index_dir)


@pytest.mark.parametrize("w", TYPOS)
def test_fuzzy_rank_identity(handle, oracle, w):
    got = fuzzy_search(handle, w, k=25).toPandas()
    exp = oracle.fuzzy(w, k=25)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist(), w
    assert got["sim"].tolist() == pytest.approx(exp["sim"].tolist(), abs=1e-4)


def test_fuzzy_exact_word_is_sim_1(handle, oracle):
    got = fuzzy_search(handle, "index", k=5).toPandas()
    assert (got["sim"] == 1.0).all()


def test_fuzzy_count(handle, oracle):
    w = "indx"
    exp = len(oracle.fuzzy(w, k=10**9))
    assert fuzzy_count(handle, w) == exp


def test_fuzzy_no_match(handle):
    assert fuzzy_search(handle, "zzqqxxy", k=5).count() == 0


@pytest.mark.parametrize("q", ["ndex", "merge sorted", "uniq_12", "qurey_zzz"])
def test_contains_matches_naive(handle, small_corpus, q):
    got = sorted(
        r["doc_id"] for r in contains_search(handle, small_corpus, q).select("doc_id").collect()
    )
    exp = sorted(
        r["doc_id"] for r in contains_naive(small_corpus, q).select("doc_id").collect()
    )
    assert got == exp, q


def test_contains_prefilter_is_sound_and_tight(handle, small_corpus):
    q = "uniq_12"
    cands = contains_candidates(handle, q)
    assert cands is not None
    cand_ids = {r["doc_id"] for r in cands.collect()}
    true_ids = {r["doc_id"] for r in contains_naive(small_corpus, q).select("doc_id").collect()}
    assert true_ids <= cand_ids  # sound
    # tight enough to be useful: candidates far below corpus size
    assert len(cand_ids) < 300


def test_contains_short_query_falls_back(handle, small_corpus):
    got = contains_search(handle, small_corpus, "xy")
    exp = contains_naive(small_corpus, "xy")
    assert got.count() == exp.count()
