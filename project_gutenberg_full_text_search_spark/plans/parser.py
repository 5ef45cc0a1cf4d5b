"""websearch-style query parser.

Semantics follow PostgreSQL ``websearch_to_tsquery`` as used by the
reference (search/full_text_search.py:137-140; syntax documented at
reference README.md:149-164):

    alpha beta          → alpha AND beta
    "alpha beta"        → phrase (adjacent positions, in order)
    alpha or beta       → OR group (case-insensitive 'or')
    alpha -beta         → alpha AND NOT beta
    -"alpha beta"       → NOT phrase is downgraded to NOT-terms (pg treats
                          negated phrases as negated ANDs; we negate terms)

The result is a tiny logical plan (AND of clauses + negated terms) — the
engine's IR, in place of the reference's raw SQL-fragment lists
(full_text_search.py:67-76).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from project_gutenberg_full_text_search_spark.functions.text import tokenize_str


@dataclass(frozen=True)
class Clause:
    kind: str  # "term" | "or" | "phrase"
    terms: tuple[str, ...]


@dataclass
class ParsedQuery:
    clauses: list[Clause] = field(default_factory=list)
    neg_terms: list[str] = field(default_factory=list)

    @property
    def positive_terms(self) -> list[str]:
        """Deduped, sorted — the scoring term set (each term scores once)."""
        out: set[str] = set()
        for c in self.clauses:
            out.update(c.terms)
        return sorted(out)

    @property
    def is_empty(self) -> bool:
        return not self.clauses and not self.neg_terms


_TOKEN_RE = re.compile(r'-?"[^"]*"|\S+')


def parse_websearch(q: str) -> ParsedQuery:
    raw = _TOKEN_RE.findall(q or "")
    items: list[tuple[str, object]] = []  # ("clause", Clause) | ("neg", [terms]) | ("or",)
    for tok in raw:
        neg = tok.startswith("-") and len(tok) > 1
        body = tok[1:] if neg else tok
        if body.lower() == "or" and not neg:
            items.append(("or", None))
            continue
        if body.startswith('"') and body.endswith('"'):
            terms = tokenize_str(body[1:-1])
            if not terms:
                continue
            if neg:
                items.append(("neg", terms))
            elif len(terms) == 1:
                items.append(("clause", Clause("term", (terms[0],))))
            else:
                items.append(("clause", Clause("phrase", tuple(terms))))
        else:
            terms = tokenize_str(body)
            if not terms:
                continue
            if neg:
                items.append(("neg", terms))
            else:
                for t in terms:
                    items.append(("clause", Clause("term", (t,))))

    # fold OR: a clause followed by ('or', clause) merges into an OR group.
    pq = ParsedQuery()
    i = 0
    while i < len(items):
        kind, val = items[i]
        if kind == "neg":
            pq.neg_terms.extend(val)
            i += 1
            continue
        if kind == "or":  # dangling 'or' with no left operand
            i += 1
            continue
        # val is a Clause; greedily absorb `or X` to the right
        group = list(val.terms) if val.kind != "phrase" else None
        cur = val
        while (
            i + 2 < len(items) + 1
            and i + 1 < len(items)
            and items[i + 1][0] == "or"
            and i + 2 < len(items)
            and items[i + 2][0] == "clause"
        ):
            nxt: Clause = items[i + 2][1]
            if cur.kind == "phrase" or nxt.kind == "phrase":
                # pg flattens OR over phrases; we keep it simple: phrases
                # don't join OR groups — treat as separate AND clauses.
                break
            group = sorted(set((group or list(cur.terms)) + list(nxt.terms)))
            cur = Clause("or", tuple(group))
            i += 2
        pq.clauses.append(cur)
        i += 1
    # dedupe identical clauses (e.g. repeated terms)
    seen = set()
    uniq = []
    for c in pq.clauses:
        key = (c.kind, c.terms)
        if key not in seen:
            seen.add(key)
            uniq.append(c)
    pq.clauses = uniq
    pq.neg_terms = sorted(set(pq.neg_terms))
    return pq
