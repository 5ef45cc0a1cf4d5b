"""Single-node brute-force oracle scorer (pure pandas/numpy).

The golden reference for the distributed engine (SURVEY.md §5): exact
tokenization-identical BM25 (k1=1.2, b=0.75), exact boolean/phrase
semantics, ties broken (score DESC, doc_id ASC). The Spark engine must be
rank-identical to this on every test query — the assert-ful replacement
for the reference's eyeball smoke harness (search/test.py:18-38).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from project_gutenberg_full_text_search_spark import BM25_B, BM25_K1
from project_gutenberg_full_text_search_spark.functions.text import (
    text_trigrams,
    tokenize_str,
    trigram_similarity,
    word_trigrams,
)
from project_gutenberg_full_text_search_spark.plans.parser import ParsedQuery, parse_websearch


class OracleIndex:
    def __init__(self, docs: pd.DataFrame, text_col: str = "content", id_col: str = "doc_id"):
        self.doc_ids = docs[id_col].tolist()
        self.tokens = {
            i: tokenize_str(t) for i, t in zip(self.doc_ids, docs[text_col].tolist())
        }
        self.tf = {i: Counter(tk) for i, tk in self.tokens.items()}
        self.dl = {i: len(tk) for i, tk in self.tokens.items()}
        self.N = len(self.doc_ids)
        self.avgdl = sum(self.dl.values()) / self.N if self.N else 0.0
        self.df: Counter = Counter()
        for c in self.tf.values():
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.N - d + 0.5) / (d + 0.5))

    def _matches(self, pq: ParsedQuery, doc_id) -> bool:
        tf = self.tf[doc_id]
        for t in pq.neg_terms:
            if tf.get(t):
                return False
        toks = self.tokens[doc_id]
        for c in pq.clauses:
            if c.kind == "term":
                if not tf.get(c.terms[0]):
                    return False
            elif c.kind == "or":
                if not any(tf.get(t) for t in c.terms):
                    return False
            elif c.kind == "phrase":
                n = len(c.terms)
                ok = any(
                    toks[p : p + n] == list(c.terms)
                    for p in range(len(toks) - n + 1)
                    if toks[p] == c.terms[0]
                )
                if not ok:
                    return False
        return True

    def score(self, pq: ParsedQuery, doc_id) -> float:
        tf = self.tf[doc_id]
        dl = self.dl[doc_id]
        s = 0.0
        for t in pq.positive_terms:
            f = tf.get(t, 0)
            if f:
                s += (
                    self.idf(t)
                    * f
                    * (BM25_K1 + 1.0)
                    / (f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                )
        return s

    def search(self, query: str, k: int = 25, round_digits: int = 4) -> pd.DataFrame:
        pq = parse_websearch(query)
        rows = [
            (i, round(self.score(pq, i), round_digits))
            for i in self.doc_ids
            if self._matches(pq, i)
        ]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return pd.DataFrame(rows[:k], columns=["doc_id", "score"])

    def count(self, query: str) -> int:
        pq = parse_websearch(query)
        return sum(1 for i in self.doc_ids if self._matches(pq, i))

    # ---- fuzzy (pg_trgm word_similarity analog) ----
    def fuzzy(self, word: str, threshold: float = 0.3, k: int = 25) -> pd.DataFrame:
        q = word_trigrams(word.lower())
        rows = []
        for i in self.doc_ids:
            best = 0.0
            for t in self.tf[i].keys():
                sim = trigram_similarity(q, word_trigrams(t))
                if sim > best:
                    best = sim
            if best >= threshold:
                rows.append((i, round(best, 4)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return pd.DataFrame(rows[:k], columns=["doc_id", "sim"])
