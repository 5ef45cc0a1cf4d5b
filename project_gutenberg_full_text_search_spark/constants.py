"""Enum surface — reference parity.

Mirrors /root/reference/search/constants.py:25-70 (SearchType,
SearchField, OrderBy, SortDirection, Crosswalk, FileType, Encoding) with
code-corpus field additions (CONTENT/PATH/REPO per SURVEY.md §1.3 — the
analog of BOOK/TITLE/... for source code).
"""

from __future__ import annotations

from enum import Enum


class SearchType(str, Enum):
    FTS = "fts"
    FUZZY = "fuzzy"
    CONTAINS = "contains"


class SearchField(str, Enum):
    # reference fields (full_text_search.py:29-37)
    BOOK = "book"          # → whole-doc text (our: content)
    TITLE = "title"
    AUTHOR = "author"
    SUBJECT = "subject"
    BOOKSHELF = "bookshelf"
    SUBTITLE = "subtitle"
    ATTRIBUTE = "attribute"
    # code-corpus fields
    CONTENT = "content"
    PATH = "path"
    REPO = "repo"


class OrderBy(str, Enum):
    RELEVANCE = "relevance"
    DOWNLOADS = "downloads"
    TITLE = "title"
    AUTHOR = "author"
    RELEASE_DATE = "release_date"
    RANDOM = "random"


class SortDirection(str, Enum):
    ASC = "asc"
    DESC = "desc"


class Crosswalk(str, Enum):
    FULL = "full"
    MINI = "mini"
    PG = "pg"
    OPDS = "opds"
    CUSTOM = "custom"


class FileType(str, Enum):
    HTML = "text/html"
    PLAIN = "text/plain"
    EPUB = "application/epub+zip"
    MOBI = "application/x-mobipocket-ebook"


class Encoding(str, Enum):
    ASCII = "us-ascii"
    UTF8 = "utf-8"
    LATIN1 = "iso-8859-1"
    WINDOWS1252 = "windows-1252"
