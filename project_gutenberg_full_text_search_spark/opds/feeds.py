"""OPDS 2.0 feed layer — the engine-side reimplementation of the
reference's HTTP API (reference: opds/opds.py, 1194 LoC CherryPy app).

Framework-free by design: every endpoint is a method returning the feed
as a plain dict (the reference returns the same dicts through
``@cherrypy.tools.json_out``); ``serve()`` optionally exposes them over
stdlib ``http.server`` so no external web framework is required in this
environment. URL/param grammar, pagination-link shape, facet groups, and
navigation structure mirror the reference endpoint-for-endpoint:

    index()        ← opds.py:288-354   (root navigation catalog)
    search()       ← opds.py:966-1069  (search + facets + pagination)
    bookshelves()  ← opds.py:358-596   (curated groups → shelf detail)
    subjects()     ← opds.py:817-962   (subject list → subject detail)
    loccs()        ← opds.py:600-813   (LoCC hierarchy → leaf listing)

All heavy work is delegated to the FullTextSearch facade (and through it
the distributed index operators); this layer only builds dicts.
"""

from __future__ import annotations

from typing import Any, Callable
from urllib.parse import urlencode

from project_gutenberg_full_text_search_spark.constants import (
    Crosswalk,
    CuratedBookshelves,
    OrderBy,
    SearchField,
    SearchType,
    SortDirection,
)

OPDS_TYPE = "application/opds+json"
_VALID_SORTS = {"downloads", "relevance", "title", "author", "release_date", "random"}


def parse_field(field: str) -> tuple[SearchField, SearchType]:
    """'fts_title' → (TITLE, FTS); bare/unknown → (BOOK, FUZZY)
    (reference opds.py:25-37; 'keyword' aliases the whole-doc field)."""
    if field.startswith("fts_"):
        st, name = SearchType.FTS, field[4:]
    elif field.startswith("fuzzy_"):
        st, name = SearchType.FUZZY, field[6:]
    else:
        st, name = SearchType.FUZZY, field
    if name == "keyword":
        name = "book"
    if name not in {f.value for f in SearchField}:
        return SearchField.BOOK, SearchType.FUZZY
    return SearchField(name), st


def facet_link(href: str, title: str, is_active: bool) -> dict:
    """'rel: self' only when active, per OPDS 2.0 (reference opds.py:40-45)."""
    link = {"href": href, "type": OPDS_TYPE, "title": title}
    if is_active:
        link["rel"] = "self"
    return link


def url_with_params(path: str, params: dict) -> str:
    clean = {k: v for k, v in params.items() if v not in ("", None)}
    qs = urlencode(clean, doseq=True)
    return f"{path}?{qs}" if qs else path


def parse_pagination(page, limit, default_limit: int = 28) -> tuple[int, int]:
    """Clamp to page ≥ 1, 1 ≤ limit ≤ 100 (reference opds.py:55-60)."""
    try:
        return max(1, int(page)), max(1, min(100, int(limit)))
    except (ValueError, TypeError):
        return 1, default_limit


class OpdsFeeds:
    """Feed builders over a FullTextSearch facade."""

    def __init__(self, fts, base: str = "/opds"):
        self.fts = fts
        self.base = base

    # ------------------------------------------------------------------
    def _nav(self, href: str, title: str, rel: str = "subsection") -> dict:
        return {"href": href, "title": title, "type": OPDS_TYPE, "rel": rel}

    def index(self) -> dict:
        """Root catalog — navigation only (reference opds.py:288-354)."""
        b = self.base
        return {
            "metadata": {"title": "Full-Text Search Catalog"},
            "links": [
                {"rel": "self", "href": f"{b}/", "type": OPDS_TYPE},
                {"rel": "start", "href": f"{b}/", "type": OPDS_TYPE},
                {
                    "rel": "search",
                    "href": f"{b}/search{{?query}}",
                    "type": OPDS_TYPE,
                    "templated": True,
                },
            ],
            "navigation": [
                self._nav(f"{b}/search?field=fuzzy_keyword",
                          "Search Fuzzy (Typo-Tolerant, Slower)"),
                self._nav(
                    f"{b}/search?field=fts_keyword",
                    'Search FTS (Strict, Faster, operators: "quotes", or, -negate)',
                ),
                self._nav(f"{b}/bookshelves", "Browse by Bookshelf"),
                self._nav(f"{b}/loccs", "Browse by LoCC (Subject Classification)"),
                self._nav(f"{b}/subjects", "Browse by Subject"),
                self._nav(f"{b}/search?sort=downloads&sort_order=desc",
                          "Most Popular", "http://opds-spec.org/sort/popular"),
                self._nav(f"{b}/search?sort=release_date&sort_order=desc",
                          "Recently Added", "http://opds-spec.org/sort/new"),
                self._nav(f"{b}/search?sort=random", "Random",
                          "http://opds-spec.org/sort/random"),
            ],
        }

    # ------------------------------------------------------------------
    def _apply_filters(self, q, query, lang, copyrighted, audiobook,
                       field="keyword"):
        """Common filter grammar (reference opds.py:69-87)."""
        if query.strip():
            sf, st = parse_field(field)
            q.search(query, field=sf, search_type=st)
        if lang:
            q.lang(lang)
        if copyrighted == "true":
            q.copyrighted()
        elif copyrighted == "false":
            q.public_domain()
        if audiobook == "true":
            q.audiobook()
        elif audiobook == "false":
            q.text_only()
        return q

    def _apply_sort(self, q, sort, sort_order, has_query):
        """Sort grammar (reference opds.py:88-103)."""
        if sort in _VALID_SORTS:
            direction = (
                SortDirection.ASC
                if sort_order == "asc"
                else SortDirection.DESC if sort_order == "desc" else None
            )
            q.order_by(OrderBy(sort), direction)
        elif has_query:
            q.order_by(OrderBy.RELEVANCE)
        else:
            q.order_by(OrderBy.DOWNLOADS)
        return q

    def _append_pagination_links(
        self, links: list[dict], build_url: Callable[[int], str], result: dict
    ) -> None:
        """first/previous/next/last (reference opds.py:105-139)."""
        page, total_pages = result.get("page", 1), result.get("total_pages", 1)
        if page > 1:
            links.append({"rel": "first", "href": build_url(1), "type": OPDS_TYPE})
            links.append(
                {"rel": "previous", "href": build_url(page - 1), "type": OPDS_TYPE}
            )
        if page < total_pages:
            links.append(
                {"rel": "next", "href": build_url(page + 1), "type": OPDS_TYPE}
            )
            links.append(
                {"rel": "last", "href": build_url(total_pages), "type": OPDS_TYPE}
            )

    def _facets(self, url_fn, query, lang, copyrighted, audiobook, sort,
                sort_order, top_subjects=None) -> list[dict]:
        """Sort / Copyright / Format facet groups + optional top-subject
        group (reference opds.py:141-273)."""
        facets = [
            {
                "metadata": {"title": "Sort By"},
                "links": [
                    facet_link(url_fn(query, lang, copyrighted, audiobook,
                                      "downloads", "desc"),
                               "Most Popular", sort in ("downloads", "")),
                    facet_link(url_fn(query, lang, copyrighted, audiobook,
                                      "relevance", ""),
                               "Relevance", sort == "relevance"),
                    facet_link(url_fn(query, lang, copyrighted, audiobook,
                                      "title", "asc"),
                               "Title (A-Z)", sort == "title"),
                    facet_link(url_fn(query, lang, copyrighted, audiobook,
                                      "author", "asc"),
                               "Author (A-Z)", sort == "author"),
                    facet_link(url_fn(query, lang, copyrighted, audiobook,
                                      "random", ""),
                               "Random", sort == "random"),
                ],
            },
            {
                "metadata": {"title": "Copyright"},
                "links": [
                    facet_link(url_fn(query, lang, "", audiobook, sort, sort_order),
                               "All", copyrighted == ""),
                    facet_link(url_fn(query, lang, "false", audiobook, sort,
                                      sort_order),
                               "Public Domain", copyrighted == "false"),
                    facet_link(url_fn(query, lang, "true", audiobook, sort,
                                      sort_order),
                               "Copyrighted", copyrighted == "true"),
                ],
            },
            {
                "metadata": {"title": "Format"},
                "links": [
                    facet_link(url_fn(query, lang, copyrighted, "", sort, sort_order),
                               "All", audiobook == ""),
                    facet_link(url_fn(query, lang, copyrighted, "false", sort,
                                      sort_order),
                               "Text Books", audiobook == "false"),
                    facet_link(url_fn(query, lang, copyrighted, "true", sort,
                                      sort_order),
                               "Audiobooks", audiobook == "true"),
                ],
            },
        ]
        if top_subjects:
            facets.append(
                {
                    "metadata": {"title": "Top Subjects In Results"},
                    "links": [
                        self._nav(
                            url_with_params(f"{self.base}/subjects",
                                            {"subject_id": int(s["pk"])}),
                            f"{s['subject']} ({int(s['count'])})",
                        )
                        for s in top_subjects
                    ],
                }
            )
        return facets

    # ------------------------------------------------------------------
    def search(
        self,
        query: str = "",
        page: int = 1,
        limit: int = 28,
        field: str = "keyword",
        lang: str = "",
        copyrighted: str = "",
        audiobook: str = "",
        sort: str = "",
        sort_order: str = "",
        locc: str = "",
    ) -> dict:
        """Search feed with facets + pagination (reference opds.py:966-1069)."""
        page, limit = parse_pagination(page, limit)
        q = self.fts.query(crosswalk=Crosswalk.OPDS)
        self._apply_filters(q, query, lang, copyrighted, audiobook, field)
        self._apply_sort(q, sort, sort_order, bool(query.strip()))
        if locc:
            q.locc(locc)
        q[page, limit]
        result = self.fts.execute(q)

        top_subjects = None
        if (query.strip() or locc or lang) and getattr(self.fts, "dims", None):
            if "subjects" in self.fts.dims:
                q2 = self.fts.query()
                self._apply_filters(q2, query, lang, copyrighted, audiobook, field)
                self._apply_sort(q2, sort, sort_order, bool(query.strip()))
                if locc:
                    q2.locc(locc)
                top_subjects = [
                    r.asDict()
                    for r in self.fts.get_top_subjects_for_query(q2).collect()
                ]

        def url(p: int) -> str:
            return url_with_params(
                f"{self.base}/search",
                {
                    "query": query, "page": p, "limit": limit, "field": field,
                    "lang": lang, "copyrighted": copyrighted,
                    "audiobook": audiobook, "sort": sort,
                    "sort_order": sort_order, "locc": locc,
                },
            )

        def facet_url(qy, lng, cr, ab, srt, srt_ord) -> str:
            return url_with_params(
                f"{self.base}/search",
                {
                    "query": qy, "limit": limit, "field": field, "lang": lng,
                    "copyrighted": cr, "audiobook": ab, "sort": srt,
                    "sort_order": srt_ord, "locc": locc,
                },
            )

        feed = {
            "metadata": {
                "title": "Search Results",
                "numberOfItems": result["total"],
                "itemsPerPage": result["page_size"],
                "currentPage": result["page"],
            },
            "links": [
                {"rel": "self", "href": url(result["page"]), "type": OPDS_TYPE},
                {"rel": "start", "href": f"{self.base}/", "type": OPDS_TYPE},
                {"rel": "up", "href": f"{self.base}/", "type": OPDS_TYPE},
                {
                    "rel": "search",
                    "href": f"{self.base}/search?field={field}{{&query}}",
                    "type": OPDS_TYPE,
                    "templated": True,
                },
            ],
            "publications": result["results"],
            "facets": self._facets(
                facet_url, query, lang, copyrighted, audiobook, sort, sort_order,
                top_subjects,
            ),
        }
        self._append_pagination_links(feed["links"], url, result)
        return feed

    # ------------------------------------------------------------------
    def bookshelves(self, shelf_id: str = "", page: int = 1, limit: int = 28,
                    **search_params) -> dict:
        """Curated-group navigation → shelf detail (reference opds.py:358-596)."""
        if shelf_id:
            return self._dim_detail(
                "bookshelf", int(shelf_id), page, limit, **search_params
            )
        b = self.base
        rows = self.fts.all_bookshelves().collect()
        # curated genre label per shelf id, when one exists (reference
        # groups shelves by CuratedBookshelves categories, opds.py:533-596)
        genre_of = {
            pk: group.genre
            for group in CuratedBookshelves
            for pk, _ in group.shelves
        }
        navigation = [
            self._nav(
                url_with_params(f"{b}/bookshelves", {"shelf_id": int(r["pk"])}),
                (
                    f"{genre_of[int(r['pk'])]}: " if int(r["pk"]) in genre_of else ""
                )
                + f"{r['bookshelf']} ({int(r['count'])})",
            )
            for r in rows
        ]
        return {
            "metadata": {"title": "Bookshelves"},
            "links": [
                {"rel": "self", "href": f"{b}/bookshelves", "type": OPDS_TYPE},
                {"rel": "start", "href": f"{b}/", "type": OPDS_TYPE},
                {"rel": "up", "href": f"{b}/", "type": OPDS_TYPE},
            ],
            "navigation": navigation,
        }

    def subjects(self, subject_id: str = "", page: int = 1, limit: int = 28,
                 **search_params) -> dict:
        """Subject navigation → subject detail (reference opds.py:817-962)."""
        if subject_id:
            return self._dim_detail(
                "subject", int(subject_id), page, limit, **search_params
            )
        b = self.base
        rows = self.fts.all_subjects().collect()
        return {
            "metadata": {"title": "Subjects"},
            "links": [
                {"rel": "self", "href": f"{b}/subjects", "type": OPDS_TYPE},
                {"rel": "start", "href": f"{b}/", "type": OPDS_TYPE},
                {"rel": "up", "href": f"{b}/", "type": OPDS_TYPE},
            ],
            "navigation": [
                self._nav(
                    url_with_params(f"{b}/subjects", {"subject_id": int(r["pk"])}),
                    f"{r['subject']} ({int(r['count'])})",
                )
                for r in rows
            ],
        }

    def loccs(self, locc: str = "", page: int = 1, limit: int = 28,
              **search_params) -> dict:
        """LoCC hierarchy browse → leaf listing (reference opds.py:600-813).

        A node with children renders navigation; a leaf renders the books
        filtered by the locc prefix."""
        b = self.base
        kids = self.fts.locc_children(locc or None).collect()
        if kids:
            return {
                "metadata": {"title": f"LoCC {locc}" if locc else "LoCC Classes"},
                "links": [
                    {
                        "rel": "self",
                        "href": url_with_params(f"{b}/loccs", {"locc": locc}),
                        "type": OPDS_TYPE,
                    },
                    {"rel": "start", "href": f"{b}/", "type": OPDS_TYPE},
                    {"rel": "up", "href": f"{b}/", "type": OPDS_TYPE},
                ],
                "navigation": [
                    self._nav(
                        url_with_params(f"{b}/loccs", {"locc": r["pk"]}),
                        f"{r['pk']} — {r['locc']}",
                    )
                    for r in kids
                ],
            }
        # leaf: book listing under this prefix
        page, limit = parse_pagination(page, limit)
        q = self.fts.query(crosswalk=Crosswalk.OPDS)
        self._apply_filters(
            q,
            search_params.get("query", ""),
            search_params.get("lang", ""),
            search_params.get("copyrighted", ""),
            search_params.get("audiobook", ""),
        )
        self._apply_sort(
            q, search_params.get("sort", ""), search_params.get("sort_order", ""),
            bool(search_params.get("query", "").strip()),
        )
        if locc:
            q.locc(locc)
        q[page, limit]
        result = self.fts.execute(q)

        def url(p: int) -> str:
            return url_with_params(f"{b}/loccs", {"locc": locc, "page": p,
                                                  "limit": limit})

        feed = {
            "metadata": {
                "title": f"LoCC {locc}",
                "numberOfItems": result["total"],
                "itemsPerPage": result["page_size"],
                "currentPage": result["page"],
            },
            "links": [
                {"rel": "self", "href": url(result["page"]), "type": OPDS_TYPE},
                {"rel": "start", "href": f"{b}/", "type": OPDS_TYPE},
                {"rel": "up", "href": f"{b}/loccs", "type": OPDS_TYPE},
            ],
            "publications": result["results"],
        }
        self._append_pagination_links(feed["links"], url, result)
        return feed

    # ------------------------------------------------------------------
    def _dim_detail(self, kind: str, pk: int, page: int, limit: int,
                    **search_params) -> dict:
        """Shelf/subject detail listing (reference opds.py:418-531, 870-962)."""
        b = self.base
        page, limit = parse_pagination(page, limit)
        q = self.fts.query(crosswalk=Crosswalk.OPDS)
        self._apply_filters(
            q,
            search_params.get("query", ""),
            search_params.get("lang", ""),
            search_params.get("copyrighted", ""),
            search_params.get("audiobook", ""),
        )
        self._apply_sort(
            q, search_params.get("sort", ""), search_params.get("sort_order", ""),
            bool(search_params.get("query", "").strip()),
        )
        if kind == "bookshelf":
            q.bookshelf_id(pk)
            path, key = f"{b}/bookshelves", "shelf_id"
            title = f"Bookshelf {pk}"
        else:
            q.subject_id(pk)
            path, key = f"{b}/subjects", "subject_id"
            row = self.fts.subject(pk)
            title = row["subject"] if row else f"Subject {pk}"
        q[page, limit]
        result = self.fts.execute(q)

        def url(p: int) -> str:
            return url_with_params(path, {key: pk, "page": p, "limit": limit})

        feed = {
            "metadata": {
                "title": title,
                "numberOfItems": result["total"],
                "itemsPerPage": result["page_size"],
                "currentPage": result["page"],
            },
            "links": [
                {"rel": "self", "href": url(result["page"]), "type": OPDS_TYPE},
                {"rel": "start", "href": f"{b}/", "type": OPDS_TYPE},
                {"rel": "up", "href": path, "type": OPDS_TYPE},
            ],
            "publications": result["results"],
        }
        self._append_pagination_links(feed["links"], url, result)
        return feed


def serve(fts, host: str = "127.0.0.1", port: int = 8080, base: str = "/opds"):
    """Optional stdlib HTTP server over the feeds (no web framework in
    this environment — the reference uses CherryPy, opds/opds.py:1147+).
    Returns the ThreadingHTTPServer; call .shutdown() to stop."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    feeds = OpdsFeeds(fts, base)
    routes: dict[str, Callable[..., dict[str, Any]]] = {
        f"{base}/": lambda **kw: feeds.index(),
        f"{base}": lambda **kw: feeds.index(),
        f"{base}/search": feeds.search,
        f"{base}/bookshelves": feeds.bookshelves,
        f"{base}/subjects": feeds.subjects,
        f"{base}/loccs": feeds.loccs,
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            u = urlparse(self.path)
            fn = routes.get(u.path.rstrip("/") or f"{base}/")
            if fn is None and u.path in (f"{base}/", base):
                fn = routes[f"{base}/"]
            if fn is None:
                self.send_error(404)
                return
            params = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                body = json.dumps(fn(**params)).encode()
            except Exception as e:  # noqa: BLE001 — surface as HTTP 500
                self.send_error(500, str(e))
                return
            self.send_response(200)
            self.send_header("Content-Type", OPDS_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet test runs
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
