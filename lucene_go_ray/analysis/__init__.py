from .analyzer import (
    GO_WHITESPACE_CHARS,
    DEFAULT_STOP_WORDS,
    GO_WHITESPACE_CLASS,
    AnalyzedDoc,
    KeywordAnalyzer,
    StandardAnalyzer,
    WhitespaceAnalyzer,
)

__all__ = [
    "DEFAULT_STOP_WORDS",
    "GO_WHITESPACE_CLASS",
    "AnalyzedDoc",
    "KeywordAnalyzer",
    "StandardAnalyzer",
    "WhitespaceAnalyzer",
]
