"""Analyzer goldens: reference standard.Tokenizer + LowerCase + Stop semantics
(/root/reference/core/analysis/standard/tokenizer.go:144-175,
 filteringtokenfilter.go:37-66)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_go_ray.analysis import (
    DEFAULT_STOP_WORDS,
    KeywordAnalyzer,
    StandardAnalyzer,
    WhitespaceAnalyzer,
)


@pytest.fixture
def an():
    return StandardAnalyzer()


def test_raw_split_empties(an):
    # maximal-run-between-single-whitespace semantics, empties preserved
    assert an.tokenize_raw("a  b") == ["a", "", "b"]
    assert an.tokenize_raw(" a") == ["", "a"]
    assert an.tokenize_raw("a ") == ["a", ""]
    assert an.tokenize_raw("") == [""]
    assert an.tokenize_raw("a\t\n b") == ["a", "", "", "b"]


def test_unicode_whitespace(an):
    # NBSP / ideographic space are Go unicode.IsSpace
    assert an.tokenize_raw("a b") == ["a", "b"]
    assert an.tokenize_raw("a　b") == ["a", "b"]
    # but ASCII control chars 0x1c-0x1f are NOT (Python isspace would say yes)
    assert an.tokenize_raw("a\x1cb") == ["a\x1cb"]


def test_lowercase_and_stopwords(an):
    d = an.analyze("The THE the Fox")
    assert d.terms == ["fox"]
    assert d.positions.tolist() == [3]
    assert d.norm == 1


def test_position_gaps(an):
    # stopwords accumulate position increments onto the next kept token:
    # position == index in the full token stream
    d = an.analyze("quick the brown of of fox")
    assert d.terms == ["quick", "brown", "fox"]
    assert d.positions.tolist() == [0, 2, 5]
    assert d.norm == 3


def test_offsets_reference_quirk(an):
    # start of token i = sum(bytes(tok_j) + bytes(delim_j) + 1) for j < i
    # (the fast++ off-by-one per delimiter, tokenizer.go:168-170)
    d = an.analyze("some text")
    assert d.starts.tolist() == [0, 6]  # 4 bytes + 1 delim + 1 quirk
    assert d.ends.tolist() == [4, 10]


def test_all_stopwords_norm_zero(an):
    d = an.analyze("the of to")
    assert d.terms == []
    assert d.norm == 0


def test_empty_text_one_empty_token(an):
    # "" -> [""] and "" is not a stopword -> indexed, norm 1
    d = an.analyze("")
    assert d.terms == [""]
    assert d.norm == 1


def test_analyze_column_matches_row_api(an):
    texts = [
        "The quick  brown the fox",
        None,
        "",
        "x y",
        "the of",
        "CJK 　 text",
    ]
    out = an.analyze_column(pa.array(texts))
    # rebuild per-doc from flattened
    for i, t in enumerate(texts):
        mask = out["doc_idx"] == i
        got_terms = [
            out["terms"][j].as_py() for j in np.flatnonzero(mask)
        ]
        got_pos = out["positions"][mask].tolist()
        if t is None:
            assert got_terms == [] and out["norms"][i] == 0
        else:
            d = an.analyze(t)
            assert got_terms == d.terms, t
            assert got_pos == d.positions.tolist(), t
            assert out["norms"][i] == d.norm


def test_whitespace_analyzer():
    wa = WhitespaceAnalyzer()
    d = wa.analyze("The THE fox")
    assert d.terms == ["The", "THE", "fox"]


def test_keyword_analyzer():
    ka = KeywordAnalyzer()
    d = ka.analyze("Hello World")
    assert d.terms == ["Hello World"]
    assert d.positions.tolist() == [0]
    out = ka.analyze_column(pa.array(["a b", None, "c"]))
    assert out["terms"].to_pylist() == ["a b", "c"]
    assert out["norms"].tolist() == [1, 0, 1]


def test_default_stop_words_is_classic_lucene():
    assert "the" in DEFAULT_STOP_WORDS and "with" in DEFAULT_STOP_WORDS
    assert len(DEFAULT_STOP_WORDS) == 33


def test_custom_analyzer_chain():
    """Composable tokenizer+filter chain: map filters rewrite, keep filters
    drop with position accumulation; vectorized path == row path."""
    import pyarrow as pa

    from lucene_go_ray.analysis.analyzer import (
        ASCIIFoldingFilter,
        CustomAnalyzer,
        LengthFilter,
    )

    an = CustomAnalyzer(
        lowercase=True,
        stop_words=frozenset({"the"}),
        map_filters=(ASCIIFoldingFilter(),),
        keep_filters=(LengthFilter(min_len=2, max_len=8),),
    )
    d = an.analyze("The Café e RÉSUMÉ extraordinarily x yz")
    assert d.terms == ["cafe", "resume", "yz"]
    # positions keep full-stream indexes (dropped tokens accumulate)
    assert d.positions.tolist() == [1, 3, 6]
    out = an.analyze_column(
        pa.array(["The Café e RÉSUMÉ extraordinarily x yz", None, "ab the"])
    )
    assert out["terms"].to_pylist() == ["cafe", "resume", "yz", "ab"]
    assert out["doc_idx"].tolist() == [0, 0, 0, 2]
    assert out["norms"].tolist() == [3, 0, 1]
