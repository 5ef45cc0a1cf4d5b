"""KWIC snippet/highlight operator: windowing, tagging, DuckDB twin."""

import duckdb
import pandas as pd

from project_gutenberg_full_text_search_spark.operators.snippets import (
    snippet_sql,
    snippets,
)

DOCS = [
    # match mid-document: window clamps neither side
    (1, "a0 a1 a2 a3 a4 a5 a6 a7 a8 merge a9 b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"),
    # match at token 1: left edge clamps
    (2, "merge early tokens only"),
    # match at the last token: right edge clamps
    (3, "tail tokens then query"),
    # both terms; first_pos must be the EARLIEST of the two
    (4, "x query y z merge w"),
    # repeated terms: n_hits counts every occurrence
    (5, "merge Merge MERGE, query! noise"),
    # no term at all: NULL first_pos/snippet, zero hits
    (6, "nothing relevant here"),
    # punctuation/case folding matches the engine tokenizer
    (7, "pre (Merge) post"),
]
TERMS = ["merge", "query"]


def _spark_rows(spark, window=8):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    out = snippets(df, TERMS, window=window).orderBy("doc_id")
    return [r.asDict() for r in out.collect()]


def test_snippet_semantics(spark):
    rows = {r["doc_id"]: r for r in _spark_rows(spark)}

    # doc 1: first_pos is 1-based index 10; window 8 → tokens 2..18
    assert rows[1]["first_pos"] == 10
    assert rows[1]["snippet"].split(" ")[8] == "<b>merge</b>"
    assert rows[1]["snippet"].startswith("a1 a2")
    assert len(rows[1]["snippet"].split(" ")) == 17

    # doc 2: left clamp — window starts at token 1
    assert rows[2]["first_pos"] == 1
    assert rows[2]["snippet"] == "<b>merge</b> early tokens only"

    # doc 3: right clamp — nothing beyond the last token
    assert rows[3]["snippet"] == "tail tokens then <b>query</b>"

    # doc 4: earliest term wins; BOTH terms highlighted inside the window
    assert rows[4]["first_pos"] == 2
    assert rows[4]["snippet"] == "x <b>query</b> y z <b>merge</b> w"

    # doc 5: case-folded hits all counted
    assert rows[5]["n_hits"] == 4

    # doc 6: no match
    assert rows[6]["first_pos"] is None
    assert rows[6]["snippet"] is None
    assert rows[6]["n_hits"] == 0

    # doc 7: tokenizer strips punctuation before matching
    assert rows[7]["snippet"] == "pre <b>merge</b> post"


def test_snippet_duckdb_twin(spark):
    got = pd.DataFrame(_spark_rows(spark, window=3))[
        ["doc_id", "first_pos", "n_hits", "snippet"]
    ]
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    exp = con.execute(
        f"SELECT doc_id, {snippet_sql('text', TERMS, window=3)} "
        "FROM docs ORDER BY doc_id"
    ).df()
    assert got["first_pos"].astype("float").fillna(-1).tolist() == exp[
        "first_pos"
    ].astype("float").fillna(-1).tolist()
    assert got["n_hits"].tolist() == exp["n_hits"].tolist()
    assert got["snippet"].where(got["snippet"].notna(), None).tolist() == exp[
        "snippet"
    ].where(exp["snippet"].notna(), None).tolist()


def test_snippet_preserves_columns(spark):
    df = spark.createDataFrame(
        [(1, "merge here", 0.5)], "doc_id int, text string, score double"
    )
    out = snippets(df, ["merge"])
    assert out.columns == [
        "doc_id", "text", "score", "first_pos", "n_hits", "snippet",
    ]


def test_snippet_duckdb_fuzz_property():
    """Hypothesis fuzz: the DuckDB twin matches a pure-Python reference
    implementation (the spec) over adversarial text — punctuation runs,
    case variants, terms at both edges, repeated terms, empty docs. The
    Spark side is pinned to DuckDB by the batch test above and by the
    registry oracle at sf0.01; this property closes the triangle at
    hundreds of examples without a Spark job per example."""
    import re

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from project_gutenberg_full_text_search_spark.operators.snippets import (
        snippet_sql,
    )

    TERMS = sorted({"merge", "query"})
    WINDOW = 3

    def reference(text):
        toks = re.findall("[a-z0-9_]+", text.lower())
        hits = [i for i, t in enumerate(toks) if t in TERMS]
        n_hits = len(hits)
        if not hits:
            return None, n_hits, None
        pos = hits[0] + 1  # 1-based
        lo = max(1, pos - WINDOW)
        seg = toks[lo - 1 : pos + WINDOW]
        marked = [f"<b>{t}</b>" if t in TERMS else t for t in seg]
        return pos, n_hits, " ".join(marked)

    con = duckdb.connect()
    frag = st.sampled_from(
        ["merge", "Merge", "MERGE,", "query!", "(query)", "a", "b2",
         "_x", "--", "  ", ".", "\n", "", "mergequery", "merg", "uery"]
    )
    text_strategy = st.lists(
        st.one_of(
            frag,
            st.text(
                st.characters(min_codepoint=32, max_codepoint=126), max_size=6
            ),
        ),
        max_size=14,
    ).map(" ".join)

    @settings(max_examples=300, deadline=None)
    @given(text_strategy)
    def check(text):
        row = con.execute(
            f"SELECT {snippet_sql('t', TERMS, window=WINDOW)} "
            "FROM (SELECT ? AS t)",
            [text],
        ).fetchone()
        assert tuple(row) == reference(text), repr(text)

    check()
