from .query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    DocIdRangeQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
)
from .scorer import BM25Scorer, LENGTH_TABLE
from .searcher import IndexSearcher, TopDocs

__all__ = [
    "BooleanClause",
    "BooleanQuery",
    "BoostQuery",
    "ConstantScoreQuery",
    "DisjunctionMaxQuery",
    "DocIdRangeQuery",
    "PrefixQuery",
    "TermInSetQuery",
    "TermRangeQuery",
    "MatchAllDocsQuery",
    "Occur",
    "PhraseQuery",
    "Query",
    "TermQuery",
    "BM25Scorer",
    "LENGTH_TABLE",
    "IndexSearcher",
    "TopDocs",
]
