"""SpanNearQuery / SpanFirstQuery vs the exhaustive oracle.

The engine's ordered path is a greedy minimal-successor chain and its
unordered path a fixed-width window cover with anchor-forced deficiency
Hall counts over group-closed clause subsets — arbitrary, possibly
overlapping OR-alternative sets (searcher.py:_eval_span_near); the oracle here
enumerates every occurrence combination per anchor (naive_oracle.py) —
agreement is evidence both reductions are sound.
"""

import os

import pyarrow.parquet as pq
import pytest

from lucene_go_ray.analysis import StandardAnalyzer
from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.search import IndexSearcher, PhraseQuery
from lucene_go_ray.search.query import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
)

from .naive_oracle import NaiveEngine

CFG = IndexConfig(
    target_partition_rows=100,
    chunk_docs=96,
    block_size=32,
)


@pytest.fixture(scope="module")
def built(tmp_path_factory, sf_dir):
    index_dir = str(tmp_path_factory.mktemp("spanidx"))
    src = os.path.join(sf_dir, "documents.parquet")
    build_index([src], index_dir, CFG)
    texts = pq.read_table(src, columns=["text"])["text"].to_pylist()
    oracle = NaiveEngine(
        texts, StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase)
    )
    return IndexSearcher(index_dir), oracle


def _assert_identical(s, oracle, q):
    ev = s._apply_live(s._eval(q, 1.0, True))
    exp = oracle._eval(q)
    got = dict(zip(ev.docs.tolist(), ev.scores.tolist()))
    assert set(got) == set(exp), (q, len(got), len(exp))
    for d, sc in got.items():
        assert sc == pytest.approx(exp[d], rel=1e-12, abs=1e-12), (q, d)


SPAN_CASES = [
    (("batch", "scan"), 0, True),
    (("batch", "scan"), 2, True),
    (("spark", "merge"), 4, True),
    (("sort", "merge", "batch"), 6, True),
    (("sort", "merge", "batch"), 1, True),
    (("spark", "window"), 0, False),
    (("spark", "window"), 3, False),
    (("window", "spark"), 3, False),
    (("spark", "spark"), 5, True),  # repeated term: distinct occurrences
    (("spark", "spark"), 5, False),
    # unordered beyond 2 terms: the minimal-cover regime (window-cover
    # matcher with Hall-condition multiplicity counts)
    (("sort", "merge", "batch"), 6, False),
    (("sort", "merge", "batch"), 2, False),
    (("spark", "spark", "window"), 4, False),  # repeated + mixed
    (("sort", "merge", "batch", "scan"), 9, False),
    # OR-clauses (SpanOr-inside-SpanNear): tuple entries are alternatives
    ((("batch", "scan"), "merge"), 3, True),
    (("sort", ("merge", "batch"), "scan"), 6, True),
    ((("spark", "window"), ("sort", "merge")), 4, False),  # disjoint sets
    ((("spark", "window"), ("spark", "window")), 5, False),  # identical sets
    ((("batch", "scan"), ("batch", "scan"), "merge"), 7, True),
]


@pytest.mark.parametrize("terms,slop,in_order", SPAN_CASES)
def test_span_near_score_identical(built, terms, slop, in_order):
    s, oracle = built
    _assert_identical(s, oracle, SpanNearQuery(terms, slop=slop, in_order=in_order))


def test_span_slop0_ordered_equals_phrase(built):
    """slop=0 + in_order degenerates to PhraseQuery: same docs, same
    scores (both use the summed-idf weight and first-term norms)."""
    s, _ = built
    terms = ("batch", "scan")
    sp = s._apply_live(s._eval(SpanNearQuery(terms, slop=0, in_order=True), 1.0, True))
    ph = s._apply_live(s._eval(PhraseQuery(terms), 1.0, True))
    assert sp.docs.tolist() == ph.docs.tolist()
    assert sp.scores.tolist() == pytest.approx(ph.scores.tolist(), rel=1e-12)


def test_span_unordered_doc_set_symmetric(built):
    """Unordered matching is symmetric in the DOC SET (freq counts the
    first clause's anchors, so scores may differ with order)."""
    s, _ = built
    a = s._apply_live(
        s._eval(SpanNearQuery(("spark", "window"), slop=3, in_order=False), 1.0, True)
    )
    b = s._apply_live(
        s._eval(SpanNearQuery(("window", "spark"), slop=3, in_order=False), 1.0, True)
    )
    assert set(a.docs.tolist()) == set(b.docs.tolist())


@pytest.mark.parametrize("term,end", [("spark", 1), ("spark", 5), ("batch", 12)])
def test_span_first_score_identical(built, term, end):
    s, oracle = built
    _assert_identical(s, oracle, SpanFirstQuery(term, end))


@pytest.mark.parametrize(
    "inc,exc,pre,post",
    [
        ("spark", "window", 0, 0),
        ("spark", "window", 2, 2),
        ("spark", "window", 5, 0),
        ("batch", "scan", 0, 3),
        ("spark", "zzzznotaterm", 1, 1),  # absent exclude: all occurrences
    ],
)
def test_span_not_score_identical(built, inc, exc, pre, post):
    s, oracle = built
    _assert_identical(s, oracle, SpanNotQuery(inc, exc, pre=pre, post=post))


def test_span_not_validation():
    with pytest.raises(ValueError):
        SpanNotQuery("a", "b", pre=-1)


def test_span_near_missing_term_empty(built):
    s, _ = built
    ev = s._apply_live(
        s._eval(SpanNearQuery(("spark", "zzzznotaterm"), slop=9), 1.0, True)
    )
    assert len(ev.docs) == 0


def test_span_near_validation():
    with pytest.raises(ValueError):
        SpanNearQuery(("a", "b"), slop=-1)
    # arbitrary alternative sets are accepted in BOTH orders since the
    # round-4 anchor-forced Hall matcher (overlapping ones used to raise)
    SpanNearQuery((("a", "b"), "a"), slop=1, in_order=True)
    SpanNearQuery((("a", "b"), "a"), slop=1, in_order=False)
    SpanNearQuery((("a", "b"), ("b", "c")), slop=1, in_order=False)
    SpanNearQuery((("a", "b"), ("c", "d")), slop=1, in_order=False)
    SpanNearQuery((("a", "b"), ("b", "a")), slop=1, in_order=False)


def test_span_near_random_dense_vocab(tmp_path):
    """Stress the window-cover matcher where it is hardest: a 6-token
    vocabulary so every doc is saturated with repeats and near-misses,
    random clause lists (with repeats) at every slop, BOTH orders, vs the
    exhaustive combination oracle."""
    import random

    import pyarrow as pa

    rng = random.Random(1234)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
        for _ in range(150)
    ]
    src = str(tmp_path / "dense.parquet")
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}), src
    )
    index_dir = str(tmp_path / "idx")
    build_index([src], index_dir, CFG)
    s = IndexSearcher(index_dir)
    oracle = NaiveEngine(
        texts, StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase)
    )
    or_groups = [("aa", "bb"), ("cc", "dd"), ("ee", "ff")]
    for _ in range(60):
        n = rng.randint(2, 4)
        slop = rng.randint(0, 6)
        in_order = rng.random() < 0.5
        if rng.random() < 0.4:  # OR-clause mix
            if rng.random() < 0.5:  # arbitrary (overlapping) sets
                terms = tuple(
                    tuple(rng.sample(vocab, rng.randint(2, 3)))
                    if rng.random() < 0.6
                    else rng.choice(vocab)
                    for _ in range(n)
                )
            else:  # disjoint-or-identical groups (the old fast shape)
                terms = tuple(rng.choice(or_groups) for _ in range(n))
        else:
            terms = tuple(rng.choice(vocab) for _ in range(n))
        _assert_identical(
            s, oracle, SpanNearQuery(terms, slop=slop, in_order=in_order)
        )


def test_span_unordered_overlapping_anchor_forced(tmp_path):
    """Overlapping alternative sets: the anchor position is SPENT on
    clause 0, so with clauses ({aa,bb}, {aa}) and a doc holding one aa
    and one bb, the aa occurrence cannot anchor (clause 1 needs it) but
    the bb occurrence can — freq 1, not 2. A doc with aa only (no bb)
    must not match at all. Regression for the anchor-forced deficiency
    Hall tightening (plain window counts would pass both anchors)."""
    import pyarrow as pa

    texts = ["aa bb", "aa cc", "aa aa cc", "bb cc"]
    src = str(tmp_path / "ov.parquet")
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}), src
    )
    index_dir = str(tmp_path / "idx")
    build_index([src], index_dir, CFG)
    s = IndexSearcher(index_dir)
    oracle = NaiveEngine(
        texts,
        StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase),
    )
    q = SpanNearQuery((("aa", "bb"), "aa"), slop=3, in_order=False)
    _assert_identical(s, oracle, q)
    got = s._eval(q, 1.0, False)
    # doc 0: bb anchors (aa spent on clause 1); doc 2: two aa's — one
    # anchors, the other satisfies clause 1; docs 1 & 3: no distinct pair
    assert got.docs.tolist() == [0, 2]
    # three-way overlap through a middle group: ({aa,bb},{bb,cc},{cc,aa})
    q3 = SpanNearQuery(
        (("aa", "bb"), ("bb", "cc"), ("cc", "aa")), slop=5, in_order=False
    )
    _assert_identical(s, oracle, q3)


def test_span_highlight_terms(built):
    """highlight_terms surfaces span terms (incl. OR alternatives; the
    SpanNot exclude clause never highlights)."""
    s, _ = built
    assert s.highlight_terms(
        SpanNearQuery((("batch", "scan"), "merge"), slop=3)
    ) == ["batch", "scan", "merge"]
    assert s.highlight_terms(SpanFirstQuery("spark", 5)) == ["spark"]
    assert s.highlight_terms(SpanNotQuery("spark", "window", pre=1)) == ["spark"]


def test_span_near_topk_searchable(built):
    """Spans run through the normal search()/top-k collector path."""
    s, oracle = built
    q = SpanNearQuery(("batch", "scan"), slop=2, in_order=True)
    td = s.search(q, 10)
    exp = sorted(oracle._eval(q).items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert td.doc_ids.tolist() == [d for d, _ in exp]
