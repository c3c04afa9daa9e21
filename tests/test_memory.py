"""Golden-score conformance: the reference memory-index constant
(/root/reference/memory/index_test.go:56-64)."""

import pytest

from lucene_go_ray.analysis import StandardAnalyzer
from lucene_go_ray.memory import MemoryIndex
from lucene_go_ray.search.query import BooleanQuery, PhraseQuery, TermQuery


@pytest.fixture
def idx():
    m = MemoryIndex(analyzer=StandardAnalyzer(stop_words=frozenset()))
    m.add_field("f1", "some text")
    return m


def test_golden_bm25_constant(idx):
    # 1-doc index, 2-token field, tf=1, k1=1.2 b=0.75 => 0.13076457
    assert idx.search(TermQuery("text", field="f1")) == pytest.approx(
        0.13076457, abs=1e-8
    )
    assert idx.search(TermQuery("some", field="f1")) == pytest.approx(
        0.13076457, abs=1e-8
    )
    assert idx.search(TermQuery("some text", field="f1")) == 0.0


def test_boolean_and_phrase(idx):
    q = BooleanQuery.build(
        must=[TermQuery("some", field="f1"), TermQuery("text", field="f1")]
    )
    assert idx.search(q) == pytest.approx(2 * 0.13076457, abs=1e-7)
    assert idx.search(PhraseQuery(("some", "text"), field="f1")) > 0
    assert idx.search(PhraseQuery(("text", "some"), field="f1")) == 0.0
