"""Single-document in-RAM index — "percolator"-style match scoring.

Parity with the reference ``memory`` package
(/root/reference/memory/index.go:117-319): index one document's fields,
search returns the relevance score of the (only) doc, 0.0 when it does not
match. Its golden constant — TermQuery on a 2-token field scoring
0.13076457 (memory/index_test.go:56-64) — is pinned in our unit tests as
the scoring-conformance anchor.
"""

from __future__ import annotations

import numpy as np

from .analysis import StandardAnalyzer
from .search.query import (
    BooleanQuery,
    BoostQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)
from .search.scorer import BM25Scorer, idf


class MemoryIndex:
    def __init__(self, analyzer: StandardAnalyzer | None = None, k1=1.2, b=0.75):
        self.analyzer = analyzer or StandardAnalyzer()
        self.k1, self.b = k1, b
        self.fields: dict[str, dict] = {}

    def add_field(self, name: str, text: str, analyzer=None) -> None:
        doc = (analyzer or self.analyzer).analyze(text)
        postings: dict[str, list[int]] = {}
        for t, p in zip(doc.terms, doc.positions):
            postings.setdefault(t, []).append(int(p))
        self.fields[name] = {"postings": postings, "norm": doc.norm}

    def search(self, query: Query, field: str = None) -> float:
        """Score of the single doc for ``query`` (0.0 if no match)."""
        q = query.rewrite()
        matched, score = self._eval(q)
        return score if matched else 0.0

    def _field(self, name: str) -> dict:
        return self.fields.get(name, {"postings": {}, "norm": 0})

    def _scorer(self, field: str) -> BM25Scorer:
        f = self._field(field)
        # single-doc collection stats: docCount=1, sumTTF=norm
        return BM25Scorer(1, f["norm"], k1=self.k1, b=self.b)

    def _eval(self, q: Query, boost: float = 1.0) -> tuple[bool, float]:
        if isinstance(q, TermQuery):
            f = self._field(q.field)
            plist = f["postings"].get(q.term)
            if not plist:
                return False, 0.0
            sc = self._scorer(q.field)
            w = sc.weight(1, boost)
            return True, float(
                sc.score(w, np.array([len(plist)]), np.array([f["norm"] & 0xFF]))[0]
            )
        if isinstance(q, BoostQuery):
            return self._eval(q.query, boost * q.boost)
        if isinstance(q, MatchAllDocsQuery):
            return True, boost
        if isinstance(q, PhraseQuery):
            f = self._field(q.field)
            plists = [f["postings"].get(t) for t in q.terms]
            if any(p is None for p in plists):
                return False, 0.0
            cand = set(plists[0])
            for i, pl in enumerate(plists[1:], start=1):
                cand = {c for c in cand if c + i in set(pl)}
            if not cand:
                return False, 0.0
            sc = self._scorer(q.field)
            w = boost * sum(idf(1, 1) for _ in q.terms)
            return True, float(
                sc.score(w, np.array([len(cand)]), np.array([f["norm"] & 0xFF]))[0]
            )
        if isinstance(q, BooleanQuery):
            total = 0.0
            matched_any = False
            should_matched = 0
            for c in q.clauses:
                m, s = self._eval(c.query, boost)
                if c.occur is Occur.MUST:
                    if not m:
                        return False, 0.0
                    total += s
                    matched_any = True
                elif c.occur is Occur.FILTER:
                    if not m:
                        return False, 0.0
                    matched_any = True
                elif c.occur is Occur.MUST_NOT:
                    if m:
                        return False, 0.0
                elif c.occur is Occur.SHOULD:
                    if m:
                        total += s
                        should_matched += 1
            has_required = any(
                c.occur in (Occur.MUST, Occur.FILTER) for c in q.clauses
            )
            n_should = sum(1 for c in q.clauses if c.occur is Occur.SHOULD)
            if should_matched < q.minimum_should_match:
                return False, 0.0
            if not has_required and n_should and should_matched == 0:
                return False, 0.0
            return (matched_any or should_matched > 0), total
        raise TypeError(f"unsupported query: {q!r}")
