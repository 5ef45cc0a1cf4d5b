"""Output projections (crosswalks) — reference parity.

Mirrors /root/reference/search/crosswalks.py: FULL (8-16), MINI (19-26),
PG (29-56), OPDS (59-206), CUSTOM hook (full_text_search.py:351-364),
dispatch (209-214). Like the reference, these are driver-side row→dict
transforms over the collected top-k page (≤100 rows — never distributed).
"""

from __future__ import annotations

import html
import re
from collections.abc import Callable

from project_gutenberg_full_text_search_spark.constants import Crosswalk

_MARC_RE = re.compile(r"\$[a-z0-9]", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")


def strip_marc_subfields(s: str) -> str:
    """MARC $a/$b/... marker removal (reference helpers.py:33-41)."""
    return _MARC_RE.sub(" ", s)


def normalize_text(s: str) -> str:
    """Whitespace collapse + HTML unescape (reference helpers.py:44-53)."""
    return _WS_RE.sub(" ", html.unescape(s)).strip()


def format_value(v):
    if isinstance(v, str):
        return normalize_text(strip_marc_subfields(v))
    if isinstance(v, dict):
        return {k: format_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [format_value(x) for x in v]
    return v


def _dc(row) -> dict:
    dc = row["dc"] if "dc" in row.__fields__ else None
    return dc.asDict(recursive=True) if dc is not None else {}


def full_crosswalk(row) -> dict:
    return format_value(
        {
            "doc_id": row["doc_id"],
            "title": row["title"],
            "author": row["all_authors"],
            "downloads": row["downloads"],
            "dc": _dc(row),
        }
    )


def mini_crosswalk(row) -> dict:
    return format_value(
        {
            "id": row["doc_id"],
            "title": row["title"],
            "author": row["all_authors"],
            "downloads": row["downloads"],
        }
    )


def pg_crosswalk(row) -> dict:
    dc = _dc(row)
    return format_value(
        {
            "id": row["doc_id"],
            "title": row["title"],
            "authors": [
                {"name": c.get("name"), "role": c.get("role")}
                for c in dc.get("creators") or []
            ],
            "subjects": [s.get("subject") for s in dc.get("subjects") or []],
            "bookshelves": [b.get("bookshelf") for b in dc.get("bookshelves") or []],
            "formats": {
                f.get("mediatype"): f.get("filename") for f in dc.get("format") or []
            },
            "download_count": row["downloads"],
        }
    )


def opds_crosswalk(row) -> dict:
    dc = _dc(row)
    fmts = dc.get("format") or []
    # format-preference fallback chain (reference crosswalks.py:145-177)
    pref = ["application/epub+zip", "text/html", "text/plain"]
    acq = next(
        (f for m in pref for f in fmts if f.get("mediatype") == m),
        fmts[0] if fmts else None,
    )
    return format_value(
        {
            "metadata": {
                "title": row["title"],
                "author": [c.get("name") for c in dc.get("creators") or []],
                "identifier": f"urn:doc:{row['doc_id']}",
                "subject": [s.get("subject") for s in dc.get("subjects") or []],
            },
            "links": (
                [
                    {
                        "rel": "http://opds-spec.org/acquisition",
                        "href": acq.get("filename"),
                        "type": acq.get("mediatype"),
                    }
                ]
                if acq
                else []
            ),
        }
    )


_DISPATCH: dict[Crosswalk, Callable] = {
    Crosswalk.FULL: full_crosswalk,
    Crosswalk.MINI: mini_crosswalk,
    Crosswalk.PG: pg_crosswalk,
    Crosswalk.OPDS: opds_crosswalk,
}


def apply_crosswalk(cw: Crosswalk, rows, custom: Callable | None = None) -> list[dict]:
    if cw == Crosswalk.CUSTOM:
        if custom is None:
            raise ValueError("CUSTOM crosswalk requires set_custom_transformer")
        return [custom(r) for r in rows]
    fn = _DISPATCH[cw]
    return [fn(r) for r in rows]
