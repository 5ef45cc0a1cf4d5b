"""OPDS feed layer vs the reference HTTP API semantics
(reference opds/opds.py: root nav :288-354, search :966-1069, pagination
links :105-139, facets :141-273, bookshelf/subject browse :358-962)."""

import json
import urllib.request

import pytest

from project_gutenberg_full_text_search_spark.api import FullTextSearch
from project_gutenberg_full_text_search_spark.constants import SearchField
from project_gutenberg_full_text_search_spark.corpus import gen_meta
from project_gutenberg_full_text_search_spark.opds import OpdsFeeds, parse_field
from project_gutenberg_full_text_search_spark.opds.feeds import serve


@pytest.fixture(scope="module")
def feeds(spark, small_corpus, index_dir):
    dims = gen_meta(spark, 300, seed=42)
    fts = FullTextSearch(
        spark,
        small_corpus,
        meta=dims["meta"],
        indexes={SearchField.CONTENT: index_dir},
        dims=dims,
    )
    return OpdsFeeds(fts)


def test_parse_field():
    from project_gutenberg_full_text_search_spark.constants import SearchType

    assert parse_field("fts_keyword") == (SearchField.BOOK, SearchType.FTS)
    assert parse_field("fuzzy_title") == (SearchField.TITLE, SearchType.FUZZY)
    assert parse_field("keyword") == (SearchField.BOOK, SearchType.FUZZY)
    assert parse_field("nonsense") == (SearchField.BOOK, SearchType.FUZZY)


def test_index_feed_navigation(feeds):
    feed = feeds.index()
    rels = {ln["rel"] for ln in feed["links"]}
    assert {"self", "start", "search"} <= rels
    titles = [n["title"] for n in feed["navigation"]]
    assert any("Bookshelf" in t for t in titles)
    assert any("LoCC" in t for t in titles)


def test_search_feed_envelope_facets_pagination(feeds):
    feed = feeds.search(query="merge query", field="fts_keyword", page=2, limit=5)
    md = feed["metadata"]
    assert md["currentPage"] == 2 and md["itemsPerPage"] == 5
    assert md["numberOfItems"] > 10
    assert len(feed["publications"]) == 5
    # publications are OPDS crosswalk dicts
    assert {"metadata", "links"} <= set(feed["publications"][0].keys())
    rels = {ln["rel"] for ln in feed["links"]}
    assert {"first", "previous"} <= rels  # page 2 → back-links
    assert "next" in rels or md["currentPage"] == md.get("totalPages", 10**9)
    facet_titles = {f["metadata"]["title"] for f in feed["facets"]}
    assert {"Sort By", "Copyright", "Format"} <= facet_titles
    # active facet carries rel: self; empty sort marks "Most Popular"
    # active (reference opds.py:155-160 `sort == "downloads" or not sort`)
    sort_group = next(f for f in feed["facets"] if f["metadata"]["title"] == "Sort By")
    active = [ln for ln in sort_group["links"] if ln.get("rel") == "self"]
    assert len(active) == 1 and active[0]["title"] == "Most Popular"
    rel_feed = feeds.search(
        query="merge query", field="fts_keyword", sort="relevance", limit=5
    )
    sg = next(f for f in rel_feed["facets"] if f["metadata"]["title"] == "Sort By")
    act = [ln for ln in sg["links"] if ln.get("rel") == "self"]
    assert len(act) == 1 and act[0]["title"] == "Relevance"
    # top-subjects facet present for a query'd search with dims
    assert "Top Subjects In Results" in facet_titles


def test_search_feed_filters_compose(feeds):
    all_ = feeds.search(query="merge", field="fts_keyword")["metadata"]["numberOfItems"]
    pd_ = feeds.search(query="merge", field="fts_keyword", copyrighted="false")[
        "metadata"
    ]["numberOfItems"]
    cr_ = feeds.search(query="merge", field="fts_keyword", copyrighted="true")[
        "metadata"
    ]["numberOfItems"]
    assert pd_ + cr_ == all_ and cr_ > 0


def test_bookshelves_nav_and_detail(feeds):
    nav = feeds.bookshelves()
    assert len(nav["navigation"]) == 15  # N_SHELVES in the fixture
    href = nav["navigation"][0]["href"]
    shelf_id = int(href.split("shelf_id=")[1])
    detail = feeds.bookshelves(shelf_id=str(shelf_id), limit=10)
    assert detail["metadata"]["numberOfItems"] > 0
    assert len(detail["publications"]) <= 10


def test_subjects_nav_and_detail(feeds):
    nav = feeds.subjects()
    assert len(nav["navigation"]) == 40  # N_SUBJECTS
    detail = feeds.subjects(subject_id="3", limit=10)
    assert detail["metadata"]["title"] == "subject_3"
    assert detail["metadata"]["numberOfItems"] > 0


def test_loccs_hierarchy_then_leaf(feeds):
    top = feeds.loccs()
    codes = {n["href"].split("locc=")[1] for n in top["navigation"]}
    assert codes == {"P", "Q", "T", "B"}
    # P has children → still navigation
    p = feeds.loccs(locc="P")
    assert "navigation" in p
    # PS12 is a leaf → publications listing
    leaf = feeds.loccs(locc="PS12", limit=5)
    assert "publications" in leaf
    assert leaf["metadata"]["numberOfItems"] > 0


def test_http_server_roundtrip(feeds):
    srv = serve(feeds.fts, host="127.0.0.1", port=0)
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/opds/") as r:
            root = json.loads(r.read())
        assert root["metadata"]["title"]
        url = (
            f"http://127.0.0.1:{port}/opds/search?query=merge"
            "&field=fts_keyword&limit=3"
        )
        with urllib.request.urlopen(url) as r:
            res = json.loads(r.read())
        assert len(res["publications"]) == 3
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/opds/nope") as r:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        srv.shutdown()
