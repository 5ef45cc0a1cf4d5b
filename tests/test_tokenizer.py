import pandas as pd
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.text import (
    text_trigrams,
    tokenize_str,
    tokens_col,
    trigram_similarity,
    trigrams_col,
    word_trigrams,
)
from project_gutenberg_full_text_search_spark.plans.parser import parse_websearch


def test_tokenize_basic():
    assert tokenize_str("Hello, World_1! foo-bar") == ["hello", "world_1", "foo", "bar"]
    assert tokenize_str("") == []
    assert tokenize_str("  --- ") == []


def test_tokens_col_matches_python(spark):
    texts = ["Hello, World!", "def foo(x): return x+1", "", "a  b\tc\nd", "CamelCase_id9"]
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    got = [r[0] for r in df.select(tokens_col("t")).collect()]
    assert got == [tokenize_str(t) for t in texts]


def test_word_trigrams_pg_style():
    # pg_trgm pads '  w' + 'w ' : 'cat' → {'  c', ' ca', 'cat', 'at '}
    assert word_trigrams("cat") == {"  c", " ca", "cat", "at "}
    assert word_trigrams("") == set()


def test_trigrams_col_matches_python(spark):
    words = ["cat", "index", "a", "xy"]
    df = spark.createDataFrame(pd.DataFrame({"w": words}))
    got = [set(r[0]) for r in df.select(trigrams_col("w")).collect()]
    assert got == [word_trigrams(w) for w in words]


def test_trigram_similarity():
    a, b = word_trigrams("index"), word_trigrams("indxe")
    assert 0 < trigram_similarity(a, b) < 1
    assert trigram_similarity(a, a) == 1.0


def test_parse_simple_and():
    pq = parse_websearch("alpha beta")
    assert [c.kind for c in pq.clauses] == ["term", "term"]
    assert pq.positive_terms == ["alpha", "beta"]
    assert pq.neg_terms == []


def test_parse_or_not_phrase():
    pq = parse_websearch('index or query -cache "merge sorted posting"')
    kinds = sorted(c.kind for c in pq.clauses)
    assert kinds == ["or", "phrase"]
    assert pq.neg_terms == ["cache"]
    or_clause = next(c for c in pq.clauses if c.kind == "or")
    assert set(or_clause.terms) == {"index", "query"}
    ph = next(c for c in pq.clauses if c.kind == "phrase")
    assert ph.terms == ("merge", "sorted", "posting")


def test_parse_dedup_and_case():
    pq = parse_websearch("Index INDEX index")
    assert len(pq.clauses) == 1
