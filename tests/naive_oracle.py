"""Independent single-process exhaustive-scoring reference engine.

Pure-Python dict-based implementation used only by tests: the distributed
Ray pipeline must be rank-identical (docIDs and float64 scores) to this
oracle (SURVEY.md §5 'Oracle'). Shares only the analyzer (itself golden-
tested) — indexing, stats and scoring are implemented independently.
"""

from __future__ import annotations

import math

from itertools import product

from lucene_go_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    DocIdRangeQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
)

LENGTH_TABLE = list(range(256))


class NaiveEngine:
    def __init__(self, texts, analyzer, k1=1.2, b=0.75):
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.norms: list[int] = []
        for doc_id, text in enumerate(texts):
            if text is None:
                self.norms.append(0)
                continue
            d = analyzer.analyze(text)
            self.norms.append(d.norm)
            for t, p in zip(d.terms, d.positions):
                self.postings.setdefault(t, {}).setdefault(doc_id, []).append(int(p))
        self.max_doc = len(self.norms)
        self.doc_count = sum(1 for n in self.norms if n > 0)
        self.sum_ttf = sum(self.norms)
        self.avgdl = self.sum_ttf / self.doc_count if self.doc_count else 0.0
        self.cache = [
            1.0 / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / self.avgdl))
            if self.avgdl
            else 0.0
            for i in range(256)
        ]

    def idf(self, df):
        return math.log(1.0 + (float(self.doc_count - df) + 0.5) / (float(df) + 0.5))

    def _score(self, weight, freq, norm):
        ninv = self.cache[norm & 0xFF]
        return weight - weight / (1.0 + float(freq) * ninv)

    def _eval(self, q, boost=1.0, need_scores=True) -> dict[int, float]:
        if isinstance(q, TermQuery):
            pl = self.postings.get(q.term, {})
            if not need_scores:
                return {d: 0.0 for d in pl}
            w = boost * self.idf(len(pl))
            return {
                d: self._score(w, len(ps), self.norms[d]) for d, ps in pl.items()
            }
        if isinstance(q, BoostQuery):
            return self._eval(q.query, boost * q.boost, need_scores)
        if isinstance(q, MatchAllDocsQuery):
            return {d: boost for d in range(self.max_doc)}
        if isinstance(q, ConstantScoreQuery):
            return {
                d: boost * q.boost for d in self._eval(q.query, 0.0, False)
            }
        if isinstance(q, DocIdRangeQuery):
            lo, hi = max(0, q.lo), min(self.max_doc - 1, q.hi)
            return {d: boost for d in range(lo, hi + 1)}
        if isinstance(q, (TermInSetQuery, PrefixQuery, TermRangeQuery)):
            if isinstance(q, TermInSetQuery):
                terms = [t for t in q.terms if t in self.postings]
            elif isinstance(q, PrefixQuery):
                terms = [t for t in self.postings if t.startswith(q.prefix)]
            else:
                terms = [
                    t
                    for t in self.postings
                    if (q.lower < t or (q.include_lower and t == q.lower))
                    and (t < q.upper or (q.include_upper and t == q.upper))
                ]
            docs = set()
            for t in terms:
                docs |= set(self.postings[t])
            return {d: boost for d in docs}
        if isinstance(q, DisjunctionMaxQuery):
            evs = [self._eval(d, boost, need_scores) for d in q.disjuncts]
            out: dict[int, float] = {}
            for d in set().union(*[set(e) for e in evs]) if evs else set():
                ss = [e[d] for e in evs if d in e]
                out[d] = max(ss) + q.tie_breaker * (sum(ss) - max(ss))
            return out
        if isinstance(q, PhraseQuery):
            plists = [self.postings.get(t) for t in q.terms]
            if any(p is None for p in plists):
                return {}
            docs = set(plists[0])
            for p in plists[1:]:
                docs &= set(p)
            w = boost * sum(self.idf(len(self.postings.get(t, {}))) for t in q.terms)
            out = {}
            for d in docs:
                cand = set(plists[0][d])
                for i, p in enumerate(plists[1:], start=1):
                    cand = {c for c in cand if c + i in set(p[d])}
                if cand:
                    out[d] = (
                        self._score(w, len(cand), self.norms[d])
                        if need_scores
                        else 0.0
                    )
            return out
        if isinstance(q, SpanNearQuery):
            # independent check: EXHAUSTIVE enumeration of occurrence
            # combinations per anchor (the engine uses a greedy
            # minimal-successor chain / window-cover counting instead).
            # An OR-clause's per-doc occurrence list is the merged union
            # of its alternatives; every alternative term contributes idf.
            def clause_postings(t):
                if isinstance(t, str):
                    return self.postings.get(t)
                merged: dict = {}
                for alt in t:
                    for d, ps in self.postings.get(alt, {}).items():
                        merged.setdefault(d, []).extend(ps)
                return {d: sorted(ps) for d, ps in merged.items()} or None

            plists = [clause_postings(t) for t in q.terms]
            if any(p is None for p in plists):
                return {}
            docs = set(plists[0])
            for p in plists[1:]:
                docs &= set(p)
            all_terms = [
                t
                for c in q.terms
                for t in ((c,) if isinstance(c, str) else c)
            ]
            w = boost * sum(
                self.idf(len(self.postings.get(t, {}))) for t in all_terms
            )
            n = len(q.terms)
            out = {}
            for d in docs:
                freq = 0
                for a in plists[0][d]:
                    hit = False
                    for combo in product(*(p[d] for p in plists[1:])):
                        chain = (a, *combo)
                        if len(set(chain)) < n:
                            continue
                        if q.in_order and any(
                            chain[i] >= chain[i + 1] for i in range(n - 1)
                        ):
                            continue
                        if max(chain) - min(chain) <= q.slop + (n - 1):
                            hit = True
                            break
                    freq += hit
                if freq:
                    out[d] = (
                        self._score(w, freq, self.norms[d]) if need_scores else 0.0
                    )
            return out
        if isinstance(q, SpanNotQuery):
            pl = self.postings.get(q.include, {})
            ex = self.postings.get(q.exclude, {})
            w = boost * self.idf(len(pl))
            out = {}
            for d, ps in pl.items():
                eps = ex.get(d, [])
                freq = sum(
                    1
                    for p in ps
                    if not any(p - q.pre <= e <= p + q.post for e in eps)
                )
                if freq:
                    out[d] = (
                        self._score(w, freq, self.norms[d]) if need_scores else 0.0
                    )
            return out
        if isinstance(q, SpanFirstQuery):
            pl = self.postings.get(q.term, {})
            w = boost * self.idf(len(pl))
            out = {}
            for d, ps in pl.items():
                freq = sum(1 for p in ps if p < q.end)
                if freq:
                    out[d] = (
                        self._score(w, freq, self.norms[d]) if need_scores else 0.0
                    )
            return out
        if isinstance(q, BooleanQuery):
            must = [c.query for c in q.clauses if c.occur is Occur.MUST]
            should = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
            filt = [c.query for c in q.clauses if c.occur is Occur.FILTER]
            must_not = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
            must_ev = [self._eval(c, boost, need_scores) for c in must]
            should_ev = [self._eval(c, boost, need_scores) for c in should]
            if must or filt:
                base = None
                for ev in must_ev + [self._eval(c, 0.0, False) for c in filt]:
                    base = set(ev) if base is None else base & set(ev)
                if should_ev and q.minimum_should_match > 0:
                    base = {
                        d
                        for d in base
                        if sum(1 for ev in should_ev if d in ev)
                        >= q.minimum_should_match
                    }
                out = {d: 0.0 for d in base}
                for ev in must_ev:
                    for d in out:
                        out[d] += ev[d]
                for ev in should_ev:
                    for d in out:
                        if d in ev:
                            out[d] += ev[d]
            else:
                counts: dict[int, int] = {}
                out = {}
                for ev in should_ev:
                    for d, s in ev.items():
                        out[d] = out.get(d, 0.0) + s
                        counts[d] = counts.get(d, 0) + 1
                if q.minimum_should_match > 1:
                    out = {
                        d: s
                        for d, s in out.items()
                        if counts[d] >= q.minimum_should_match
                    }
            for c in must_not:
                ev = self._eval(c, 0.0, False)
                out = {d: s for d, s in out.items() if d not in ev}
            return out
        raise TypeError(q)

    def search(self, query, k):
        """[(doc_id, score)] in (score desc, doc_id asc) order, top k."""
        scored = self._eval(query.rewrite())
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k], len(scored)
