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


# ---------------------------------------------------------------------------
# Catalog enums — reference parity for the (code, label) surfaces that
# lang()/locc() callers and OPDS browse use (reference constants.py:73-230,
# 232-310). Built functionally from compact code→label maps: the values are
# public catalog data (ISO 639 codes, Library of Congress main classes,
# Project Gutenberg curated-bookshelf ids); the representation is ours.
# ---------------------------------------------------------------------------

_LANGUAGE_LABELS = {
    "en": "English", "af": "Afrikaans", "ale": "Aleut", "ang": "Old English",
    "ar": "Arabic", "arp": "Arapaho", "bg": "Bulgarian", "bgs": "Basa Banyumasan",
    "bo": "Tibetan", "br": "Breton", "brx": "Bodo", "ca": "Catalan",
    "ceb": "Cebuano", "cs": "Czech", "csb": "Kashubian", "cy": "Welsh",
    "da": "Danish", "de": "German", "el": "Greek", "enm": "Middle English",
    "eo": "Esperanto", "es": "Spanish", "et": "Estonian", "fa": "Persian",
    "fi": "Finnish", "fr": "French", "fur": "Friulian", "fy": "Western Frisian",
    "ga": "Irish", "gl": "Galician", "gla": "Scottish Gaelic",
    "grc": "Ancient Greek", "hai": "Haida", "he": "Hebrew", "hu": "Hungarian",
    "ia": "Interlingua", "ilo": "Iloko", "is": "Icelandic", "it": "Italian",
    "iu": "Inuktitut", "ja": "Japanese", "kha": "Khasi", "kld": "Klamath-Modoc",
    "ko": "Korean", "la": "Latin", "lt": "Lithuanian", "mi": "Māori",
    "myn": "Mayan Languages", "nah": "Nahuatl", "nai": "North American Indian",
    "nap": "Neapolitan", "nav": "Navajo", "nl": "Dutch", "no": "Norwegian",
    "oc": "Occitan", "oji": "Ojibwa", "pl": "Polish", "pt": "Portuguese",
    "rmq": "Romani", "ro": "Romanian", "ru": "Russian", "sa": "Sanskrit",
    "sco": "Scots", "sl": "Slovenian", "sr": "Serbian", "sv": "Swedish",
    "te": "Telugu", "tl": "Tagalog", "yi": "Yiddish", "zh": "Chinese",
}

_LOCC_LABELS = {
    "A": "General Works", "B": "Philosophy, Psychology, Religion",
    "C": "History: Auxiliary Sciences",
    "D": "History: General and Eastern Hemisphere", "E": "History: America",
    "F": "History: America (Local)",
    "G": "Geography, Anthropology, Recreation", "H": "Social Sciences",
    "J": "Political Science", "K": "Law", "L": "Education", "M": "Music",
    "N": "Fine Arts", "P": "Language and Literature", "Q": "Science",
    "R": "Medicine", "S": "Agriculture", "T": "Technology",
    "U": "Military Science", "V": "Naval Science",
    "Z": "Bibliography, Library Science",
}


class _CodeLabel(Enum):
    """(code, label) enum base with the reference's accessor surface."""

    @property
    def code(self) -> str:
        return self.value[0]

    @property
    def label(self) -> str:
        return self.value[1]


Language = _CodeLabel(
    "Language", {c.upper(): (c, lb) for c, lb in _LANGUAGE_LABELS.items()}
)
Language.__doc__ = "Catalog languages (reference constants.py:73-150)."

LoCCMainClass = _CodeLabel(
    "LoCCMainClass", {c: (c, lb) for c, lb in _LOCC_LABELS.items()}
)
LoCCMainClass.__doc__ = (
    "Library of Congress main classes (reference constants.py:156-186)."
)

_CURATED_SHELVES = {
    "LITERATURE": ("Literature", (
        (644, "Adventure"), (654, "American Literature"),
        (653, "British Literature"), (652, "French Literature"),
        (651, "German Literature"), (650, "Russian Literature"),
        (649, "Classics of Literature"), (643, "Biographies"),
        (645, "Novels"), (634, "Short Stories"), (637, "Poetry"),
        (642, "Plays/Films/Dramas"), (639, "Romance"),
        (638, "Science-Fiction & Fantasy"),
        (640, "Crime, Thrillers & Mystery"),
        (646, "Mythology, Legends & Folklore"), (641, "Humour"),
        (636, "Children & Young Adult Reading"), (633, "Literature - Other"),
    )),
    "SCIENCE_TECHNOLOGY": ("Science & Technology", (
        (671, "Engineering & Technology"), (672, "Mathematics"),
        (667, "Science - Physics"), (668, "Science - Chemistry/Biochemistry"),
        (669, "Science - Biology"),
        (670, "Science - Earth/Agricultural/Farming"),
        (673, "Research Methods/Statistics/Info Sys"),
        (685, "Environmental Issues"),
    )),
    "HISTORY": ("History", (
        (656, "History - American"), (657, "History - British"),
        (658, "History - European"), (659, "History - Ancient"),
        (660, "History - Medieval/Middle Ages"),
        (661, "History - Early Modern (c. 1450-1750)"),
        (662, "History - Modern (1750+)"), (663, "History - Religious"),
        (664, "History - Royalty"), (665, "History - Warfare"),
        (666, "History - Schools & Universities"), (655, "History - Other"),
        (686, "Archaeology & Anthropology"),
    )),
    "SOCIAL_SCIENCES_SOCIETY": ("Social Sciences & Society", (
        (695, "Business/Management"), (696, "Economics"),
        (689, "Law & Criminology"), (690, "Gender & Sexuality Studies"),
        (688, "Psychiatry/Psychology"), (693, "Sociology"), (694, "Politics"),
        (701, "Parenthood & Family Relations"),
        (700, "Old Age & the Elderly"),
    )),
    "ARTS_CULTURE": ("Arts & Culture", (
        (675, "Art"), (674, "Architecture"), (677, "Music"), (676, "Fashion"),
        (698, "Journalism/Media/Writing"), (687, "Language & Communication"),
        (647, "Essays, Letters & Speeches"),
    )),
    "RELIGION_PHILOSOPHY": ("Religion & Philosophy", (
        (692, "Religion/Spirituality"), (691, "Philosophy & Ethics"),
    )),
    "LIFESTYLE_HOBBIES": ("Lifestyle & Hobbies", (
        (678, "Cooking & Drinking"), (680, "Sports/Hobbies"),
        (679, "How To ..."), (648, "Travel Writing"),
        (683, "Nature/Gardening/Animals"), (703, "Sexuality & Erotica"),
    )),
    "HEALTH_MEDICINE": ("Health & Medicine", (
        (681, "Health & Medicine"), (682, "Drugs/Alcohol/Pharmacology"),
        (684, "Nutrition"),
    )),
    "EDUCATION_REFERENCE": ("Education & Reference", (
        (697, "Encyclopedias/Dictionaries/Reference"),
        (704, "Teaching & Education"),
        (702, "Reports & Conference Proceedings"), (699, "Journals"),
    )),
}


class _GenreShelves(Enum):
    @property
    def genre(self) -> str:
        return self.value[0]

    @property
    def shelves(self) -> tuple:
        return self.value[1]


CuratedBookshelves = _GenreShelves("CuratedBookshelves", _CURATED_SHELVES)
CuratedBookshelves.__doc__ = (
    "Curated bookshelf groups (reference constants.py:192-310)."
)
