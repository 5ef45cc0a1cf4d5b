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


OPDS_BASE_URL = "/files/"  # href prefix for relative filenames
AUTHOR_URL = "/authors/{id}"  # author-identifier template
DOC_URL = "/docs/{id}"  # readable-page fallback


def _abs_href(fn: str) -> str:
    if fn.startswith(("http://", "https://")):
        return fn
    return OPDS_BASE_URL + fn.lstrip("/")


def opds_crosswalk(row) -> dict:
    """OPDS 2.0 publication — full reference parity
    (reference crosswalks.py:59-206): schema.org metadata, author with
    identifier URL, marc-508 `modified`, assembled HTML description
    (summary / notes / credits / marc-908 reading level / rights /
    downloads), bookshelf collections, filetype-preference acquisition
    link with guaranteed fallback, and a cover images block."""
    dc = _dc(row)
    is_audio = bool(row["is_audio"]) if "is_audio" in row.__fields__ else False

    metadata = {
        "@type": "http://schema.org/Book",
        "identifier": f"urn:doc:{row['doc_id']}",
        "title": row["title"],
        "language": ((dc.get("language") or [{}])[0] or {}).get("code") or "en",
    }

    creators = dc.get("creators") or []
    if creators and creators[0].get("name"):
        p = creators[0]
        author = {"name": p["name"], "sortAs": p["name"]}
        if p.get("id") is not None:
            author["identifier"] = AUTHOR_URL.format(id=p["id"])
        metadata["author"] = author

    if dc.get("date"):
        metadata["published"] = dc["date"]

    # marc 508 "Updated: <date>." → modified (reference :81-90)
    for m in dc.get("marc") or []:
        if m.get("code") == 508 and "Updated:" in (m.get("text") or ""):
            tail = m["text"].split("Updated:")[1].strip().split()
            if tail:
                modified = tail[0].rstrip(".")
                if modified:
                    metadata["modified"] = modified
            break

    # description assembly (reference :92-115)
    desc_parts = []
    if summary := (dc.get("summary") or [None])[0]:
        desc_parts.append(summary)
    if notes := dc.get("description"):
        desc_parts.append(f"Notes: {'; '.join(notes)}")
    if credits_ := (dc.get("credits") or [None])[0]:
        desc_parts.append(f"Credits: {credits_}")
    for m in dc.get("marc") or []:
        if m.get("code") == 908 and m.get("text"):
            desc_parts.append(f"Reading Level: {m['text']}")
            break
    if rights := dc.get("rights"):
        desc_parts.append(f"Rights: {rights}")
    if "downloads" in row.__fields__:
        desc_parts.append(f"Downloads: {row['downloads']}")
    if desc_parts:
        metadata["description"] = (
            "<p>" + "</p><p>".join(html.escape(p) for p in desc_parts) + "</p>"
        )

    if subjects := [s.get("subject") for s in dc.get("subjects") or [] if s.get("subject")]:
        metadata["subject"] = subjects

    collections = [
        {"name": b["bookshelf"], "identifier": f"/bookshelves/{b.get('id', '')}"}
        for b in dc.get("bookshelves") or []
        if b.get("bookshelf")
    ]
    if collections:
        metadata["belongsTo"] = {"collection": collections}

    # acquisition link: filetype-preference chain w/ audiobook branch
    # (reference :119-155), then a guaranteed readable fallback (:157-163)
    fmts = dc.get("format") or []
    target = "index" if is_audio else "epub3.images"
    fallbacks = (
        ["html"]
        if is_audio
        else ["epub.images", "epub.noimages", "kindle.images", "pdf.images", "pdf.noimages", "html"]
    )
    links = []
    for try_ft in [target] + fallbacks:
        for f in fmts:
            fn = f.get("filename")
            if not fn or (f.get("filetype") or "").strip().lower() != try_ft:
                continue
            link = {
                "rel": "http://opds-spec.org/acquisition/open-access",
                "href": _abs_href(fn),
                "type": (f.get("mediatype") or "").strip() or "application/epub+zip",
            }
            if f.get("extent"):
                link["length"] = f["extent"]
            if f.get("hr_filetype"):
                link["title"] = f["hr_filetype"]
            links.append(link)
            break
        if links:
            break
    if not links:
        links.append(
            {
                "rel": "http://opds-spec.org/acquisition/open-access",
                "href": DOC_URL.format(id=row["doc_id"]),
                "type": "text/html",
            }
        )

    result = {"metadata": format_value(metadata), "links": links}

    # cover images block (reference :167-183): prefer cover.medium
    images = []
    for f in fmts:
        ft, fn = f.get("filetype") or "", f.get("filename")
        if fn and ("cover.medium" in ft or ("cover" in ft and not images)):
            images.append({"href": _abs_href(fn), "type": "image/jpeg"})
            if "cover.medium" in ft:
                break
    if images:
        result["images"] = images
    return result


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
