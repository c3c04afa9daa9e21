"""Query tree — the relational surface of the engine (SURVEY.md §2.9).

Dataclass analogue of the reference Query/Weight tree:
- TermQuery (/root/reference/core/search/termquery.go:35-277)
- BooleanQuery with MUST/SHOULD/FILTER/MUST_NOT, minimumShouldMatch and
  maxClauseCount=1024 (/root/reference/core/search/booleanquery.go:13-26)
- BoostQuery (multiplies weight boost, boostquery.go)
- MatchAllDocsQuery (matchalldocsquery.go)
- PhraseQuery: absent in the reference (positions are indexed but spans/ is
  a stub — spans.go:1-40); semantics defined here: exact adjacency on
  analyzer positions, phrase freq scored through BM25 with summed idf.

``rewrite`` performs the reference's BooleanQuery normalizations
(booleanquery.go:75-421): single-clause flattening and duplicate
FILTER/MUST_NOT removal.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

MAX_CLAUSE_COUNT = 1024  # booleanquery.go:13-15


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    FILTER = "FILTER"
    MUST_NOT = "MUST_NOT"


class Query:
    def rewrite(self) -> "Query":
        return self


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    field: str | None = None  # None = the index default (text) field


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    """Matches nothing — what the reference's BooleanQuery rewrite emits
    for degenerate shapes (pure-negative query, required-and-excluded
    clause, MUST_NOT MatchAll; booleanquery.go:95,157,161)."""

    reason: str = ""


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float = 1.0

    def rewrite(self) -> Query:
        inner = self.query.rewrite()
        if isinstance(inner, BoostQuery):
            return BoostQuery(inner.query, self.boost * inner.boost)
        if inner is self.query:
            return self
        return BoostQuery(inner, self.boost)


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Every matching doc scores ``boost`` (reference ConstantScoreQuery,
    /root/reference/core/search/ — skeletal there; semantics from Lucene)."""

    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(clause scores) + tie_breaker * sum(other clause scores)
    (reference DisjunctionMaxQuery is skeletal; semantics from Lucene)."""

    disjuncts: tuple
    tie_breaker: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "disjuncts", tuple(self.disjuncts))


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """Constant-score membership in a term set (reference TermInSetQuery is
    skeletal; Lucene semantics: matches any doc containing any set term,
    scored as a constant)."""

    terms: tuple
    field: str | None = None  # None = the index default (text) field

    def __post_init__(self):
        object.__setattr__(self, "terms", tuple(sorted(set(self.terms))))


@dataclass(frozen=True)
class PrefixQuery(Query):
    """Constant-score over all terms with the given prefix (reference
    PrefixQuery is a stub, prefixquery.go; Lucene default
    CONSTANT_SCORE_REWRITE semantics). Term expansion happens in the
    searcher against the merged term dictionary."""

    prefix: str
    field: str | None = None  # None = the index default (text) field


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """Constant-score over terms in [lower, upper] byte order (reference
    TermRangeQuery is a stub; Lucene constant-score semantics)."""

    lower: str
    upper: str
    include_lower: bool = True
    include_upper: bool = True
    field: str | None = None  # None = the index default (text) field


@dataclass(frozen=True)
class WildcardQuery(Query):
    """Constant-score over dictionary terms matching a glob pattern
    (``*`` = any run, ``?`` = one char) — the reference's WildcardQuery
    surface (/root/reference/core/search/automatonquery.go,
    multitermquery.go) whose impl only panics there. Expansion: seek the
    longest literal prefix in the term dictionary, regex-filter the
    candidates, union postings (CONSTANT_SCORE_REWRITE); a leading
    wildcard with a literal suffix (``*foo``) seeks the reversed suffix
    in the merged index's reversed-term dictionary (global/revdict, the
    ReversedWildcardFilter technique) instead of scanning the whole
    field dictionary; only patterns with NO literal text on either end
    (``*``, ``?*``) still scan. Expansion is capped at
    MAX_CLAUSE_COUNT."""

    pattern: str
    field: str | None = None  # None = the index default (text) field


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """Constant-score over dictionary terms within ``max_edits`` Levenshtein
    edits of ``term`` (reference FuzzyQuery surface is a panicking
    automaton stub; expansion semantics from Lucene: maxEdits <= 2,
    ``prefix_length`` leading chars must match exactly, capped at
    MAX_CLAUSE_COUNT)."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    field: str | None = None  # None = the index default (text) field


@dataclass(frozen=True)
class RegexpQuery(Query):
    """Constant-score over dictionary terms fully matching a regular
    expression — the reference's RegexpQuery surface
    (/root/reference/core/search/automatonquery.go, multitermquery.go),
    whose automaton impl only panics there. Expansion: seek the longest
    literal prefix of the pattern in the term dictionary, filter the
    candidates with a compiled full-match, union postings
    (CONSTANT_SCORE_REWRITE). Accepted syntax is the RE2/Python common
    subset (char classes, alternation, repetition, anchored implicitly
    at both ends like Lucene's RegExp). Capped at MAX_CLAUSE_COUNT."""

    pattern: str
    field: str | None = None  # None = the index default (text) field


@dataclass(frozen=True)
class NumericInSetQuery(Query):
    """Matches docs whose doc-values ``field`` equals ANY of ``values`` —
    the PointInSetQuery analogue
    (/root/reference/core/search/pointinsetquery.go:1) over the docmap
    doc-values column instead of a BKD tree: per-segment [min, max] zone
    maps prune segments whose range misses the set envelope, then a
    vectorized ``np.isin``. Constant-scored (typically a FILTER clause)."""

    field: str
    values: tuple

    def __post_init__(self):
        object.__setattr__(
            self, "values", tuple(sorted({int(v) for v in self.values}))
        )


@dataclass(frozen=True)
class NumericBoxQuery(Query):
    """Conjunctive 2-D range over two doc-values fields with COMBINED
    zone-map pruning — the lat/lon bounding-box analogue
    (/root/reference/core/document/latlon.go): a segment is read only if
    BOTH dimensions' [min, max] zones overlap the box (the BKD 2-D cell
    skip at segment granularity), then one fused vectorized mask. For
    geo data, encode degrees as micro-degree int64 (round(deg * 1e7)) in
    a docvalue column; the box is then integers like any other."""

    field_x: str
    lo_x: int
    hi_x: int
    field_y: str
    lo_y: int
    hi_y: int


@dataclass(frozen=True)
class RangeFieldQuery(Query):
    """Per-doc INTERVAL query — the RangeFieldQuery / *RangeSlowRangeQuery
    family (/root/reference/core/query/rangefieldquery.go:10-42,
    longrangeslowrangequery.go:16-50): each doc stores a range
    [dv_{field}_lo, dv_{field}_hi] (an ``IndexConfig.range_fields`` entry)
    and matches by ``relation`` against the query interval [lo, hi]:

      intersects: d_lo <= hi AND d_hi >= lo
      within:     d_lo >= lo AND d_hi <= hi
      contains:   d_lo <= lo AND d_hi >= hi
      crosses:    intersects AND NOT within AND NOT contains

    (the reference's QueryType.Matches per-dim contract; concrete
    relations there are doc-comment skeletons — these are the standard
    Lucene RangeField.QueryType semantics). Docs with a null range never
    match. Constant-scored; zone maps prune per relation before any
    value column is read."""

    field: str
    lo: int
    hi: int
    relation: str = "intersects"

    _RELATIONS = ("intersects", "within", "contains", "crosses")

    def __post_init__(self):
        if self.relation not in self._RELATIONS:
            raise ValueError(
                f"relation {self.relation!r} not in {self._RELATIONS}"
            )
        if self.lo > self.hi:
            raise ValueError("query range lo > hi")


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """Matches docs that HAVE the field (reference
    DocValuesFieldExistsQuery, skeletal there; Lucene semantics:
    constant-score over docs with a value). Evaluated from the doc-values
    validity mask for docvalue fields, else as the union of the field's
    postings (keyword / analyzed fields)."""

    field: str


@dataclass(frozen=True)
class NumericRangeQuery(Query):
    """Matches docs whose doc-values field lies in [lo, hi] (inclusive,
    null never matches) — the value-backed PointRangeQuery
    (/root/reference/core/search/pointrangequery.go:1-445). Evaluated
    against the docmap doc-values column with per-segment min/max zone-map
    pruning; constant-scored (typically a FILTER clause)."""

    field: str
    lo: int
    hi: int


@dataclass(frozen=True)
class DocIdRangeQuery(Query):
    """Matches global docIDs in [lo, hi] — the engine's zone-map analogue of
    the reference PointRangeQuery over a sorted numeric key
    (/root/reference/core/search/pointrangequery.go); typically used as a
    FILTER clause."""

    lo: int
    hi: int


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple
    field: str | None = None  # None = the index default (text) field

    def __post_init__(self):
        object.__setattr__(self, "terms", tuple(self.terms))


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Positional proximity query — the spans surface the reference
    DECLARES but never implements (`/root/reference/core/search/spans/
    spans.go` + `spancollector.go` are interface-only stubs, 62 LoC, no
    concrete Spans); semantics follow Lucene's SpanNearQuery over the
    positions stream this index already stores for PhraseQuery.

    A document matches when one occurrence of every term can be chosen
    with at most ``slop`` intervening positions between the first and
    last chosen occurrence (window width - n_terms <= slop; slop=0 with
    in_order=True degenerates to PhraseQuery). ``in_order`` additionally
    requires the chosen occurrences to appear in clause order (strictly
    increasing positions). freq = number of first-term occurrences that
    anchor at least one qualifying window; scored like PhraseQuery
    (weight = summed per-term idf, BM25 over anchor freq with the first
    term's norms).

    Both orders support any clause count, including repeated terms
    (a repeated term must be covered by that many DISTINCT occurrence
    positions — the unordered matcher enforces the multiplicity via a
    per-distinct-term window count, which by Hall's condition is exactly
    when a distinct-position selection exists).

    A clause may also be a TUPLE of alternative terms — the
    SpanOrQuery-inside-SpanNearQuery composition (Lucene's common spans
    shape): the clause matches at any occurrence of any alternative, and
    every alternative term contributes its idf to the weight (Lucene
    builds the SpanWeight from ALL term contexts). Both orders accept
    arbitrary alternative sets, including overlapping non-identical
    ones — the unordered matcher checks anchor-forced
    system-of-distinct-representatives existence via deficiency Hall
    over group-closed clause subsets (searcher._eval_span_near)."""

    terms: tuple
    slop: int = 0
    in_order: bool = True
    field: str | None = None

    def __post_init__(self):
        object.__setattr__(
            self,
            "terms",
            tuple(
                t if isinstance(t, str) else tuple(dict.fromkeys(t))
                for t in self.terms
            ),
        )
        if self.slop < 0:
            raise ValueError("slop must be >= 0")


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """SpanNot analogue (Lucene SpanNotQuery with pre/post): matches
    occurrences of ``include`` whose position p has NO occurrence of
    ``exclude`` in [p - pre, p + post]. pre=post=0 is the token-span
    overlap case (a no-op for distinct terms since one position holds one
    token — pass pre/post to express "not near"). freq = qualifying
    include occurrences; scored like a positional TermQuery on ``include``
    (the exclude clause contributes no weight, as in Lucene)."""

    include: str
    exclude: str
    pre: int = 0
    post: int = 0
    field: str | None = None

    def __post_init__(self):
        if self.pre < 0 or self.post < 0:
            raise ValueError("pre/post must be >= 0")


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """SpanFirst analogue: matches docs where ``term`` occurs at a
    position strictly below ``end`` (spans ending within the first
    ``end`` positions). freq = number of qualifying occurrences; scored
    like a positional TermQuery (idf weight, BM25 over qualifying freq)."""

    term: str
    end: int
    field: str | None = None


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple
    minimum_should_match: int = 0

    def __post_init__(self):
        object.__setattr__(self, "clauses", tuple(self.clauses))
        if len(self.clauses) > MAX_CLAUSE_COUNT:
            raise ValueError(f"too many clauses: {len(self.clauses)} > {MAX_CLAUSE_COUNT}")

    @staticmethod
    def build(
        must=(), should=(), filter=(), must_not=(), minimum_should_match: int = 0
    ) -> "BooleanQuery":
        clauses = (
            [BooleanClause(_as_query(q), Occur.MUST) for q in must]
            + [BooleanClause(_as_query(q), Occur.SHOULD) for q in should]
            + [BooleanClause(_as_query(q), Occur.FILTER) for q in filter]
            + [BooleanClause(_as_query(q), Occur.MUST_NOT) for q in must_not]
        )
        return BooleanQuery(tuple(clauses), minimum_should_match)

    def rewrite(self) -> Query:
        """The reference's full rewrite pipeline (booleanquery.go:74-330),
        run to fixpoint: single-clause flattening, clause rewrite,
        FILTER/MUST_NOT dedup, required-and-excluded detection
        (MatchNoDocsQuery), MatchAll/duplicate FILTER removal,
        FILTER∩SHOULD promotion to MUST, and SHOULD/MUST boost-sum
        dedup. Each modifying rule returns the rebuilt query's own
        rewrite, so chains converge (every rule strictly shrinks the
        clause list or promotes occurs monotonically)."""
        clauses = [BooleanClause(c.query.rewrite(), c.occur) for c in self.clauses]
        msm = self.minimum_should_match

        # 1. single-clause optimizations (booleanquery.go:80-100)
        if len(clauses) == 1:
            c = clauses[0]
            if msm == 1 and c.occur is Occur.SHOULD:
                return c.query
            if msm == 0:
                if c.occur in (Occur.SHOULD, Occur.MUST):
                    return c.query
                if c.occur is Occur.FILTER:
                    return BoostQuery(ConstantScoreQuery(c.query), 0.0)
                if c.occur is Occur.MUST_NOT:
                    return MatchNoDocsQuery("pure negative BooleanQuery")

        # 2. dedup FILTER and MUST_NOT clauses (clauseSets semantics)
        seen, out = set(), []
        for c in clauses:
            if c.occur in (Occur.FILTER, Occur.MUST_NOT):
                key = (c.occur, c.query)
                if key in seen:
                    continue
                seen.add(key)
            out.append(c)
        if len(out) != len(clauses):
            return BooleanQuery(tuple(out), msm).rewrite()
        clauses = out

        musts = [c.query for c in clauses if c.occur is Occur.MUST]
        filters = {c.query for c in clauses if c.occur is Occur.FILTER}
        must_nots = {c.query for c in clauses if c.occur is Occur.MUST_NOT}
        shoulds = [c.query for c in clauses if c.occur is Occur.SHOULD]

        # 3. required-and-excluded / prohibited MatchAll (go:146-166)
        for q in must_nots:
            if q in filters:
                return MatchNoDocsQuery(
                    "FILTER or MUST clause also in MUST_NOT"
                )
            if isinstance(q, MatchAllDocsQuery):
                return MatchNoDocsQuery("MUST_NOT clause is MatchAllDocsQuery")

        # 4. drop FILTER clauses that are MatchAll (when other filters or
        #    musts exist) or that duplicate MUST clauses (go:167-214)
        if filters:
            kept = set(filters)
            if len(filters) > 1 or musts:
                kept = {q for q in kept if not isinstance(q, MatchAllDocsQuery)}
            kept -= set(musts)
            if kept != filters:
                rebuilt = [c for c in clauses if c.occur is not Occur.FILTER]
                rebuilt += [BooleanClause(q, Occur.FILTER) for q in sorted(
                    kept, key=repr
                )]
                return BooleanQuery(tuple(rebuilt), msm).rewrite()

        # 5. FILTER clauses that are also SHOULD: promote the SHOULD to
        #    MUST, drop the FILTER copy, decrement msm (go:216-252)
        inter = filters & set(shoulds)
        if inter:
            rebuilt = []
            new_msm = msm
            for c in clauses:
                if c.query in inter:
                    if c.occur is Occur.SHOULD:
                        rebuilt.append(BooleanClause(c.query, Occur.MUST))
                        new_msm -= 1
                    # the FILTER copy is dropped
                    elif c.occur is not Occur.FILTER:
                        rebuilt.append(c)
                else:
                    rebuilt.append(c)
            return BooleanQuery(tuple(rebuilt), max(0, new_msm)).rewrite()

        # 6./7. boost-sum dedup of SHOULD (msm<=1) and MUST (go:255-330)
        for occ, cond in ((Occur.SHOULD, msm <= 1), (Occur.MUST, True)):
            group = [c.query for c in clauses if c.occur is occ]
            if not group or not cond:
                continue
            summed: dict = {}
            order: list = []
            for q in group:
                b = 1.0
                while isinstance(q, BoostQuery):
                    b *= q.boost
                    q = q.query
                if q not in summed:
                    order.append(q)
                summed[q] = summed.get(q, 0.0) + b
            if len(summed) != len(group):
                rebuilt = [c for c in clauses if c.occur is not occ]
                for q in order:
                    b = summed[q]
                    rebuilt.append(
                        BooleanClause(
                            BoostQuery(q, b) if b != 1.0 else q, occ
                        )
                    )
                return BooleanQuery(tuple(rebuilt), msm).rewrite()

        if clauses == list(self.clauses):
            return self
        return BooleanQuery(tuple(clauses), msm)


def _as_query(q) -> Query:
    if isinstance(q, Query):
        return q
    if isinstance(q, str):
        return TermQuery(q)
    raise TypeError(f"not a query: {q!r}")
