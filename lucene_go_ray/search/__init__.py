from .query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)
from .scorer import BM25Scorer, LENGTH_TABLE
from .searcher import IndexSearcher, TopDocs

__all__ = [
    "BooleanClause",
    "BooleanQuery",
    "BoostQuery",
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
