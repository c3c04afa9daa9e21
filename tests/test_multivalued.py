"""Multi-valued fields: position increment gap between values
(Analyzer.GetPositionIncrementGap, /root/reference/core/analysis/
analyzer.go:123-125, applied per value instance in
defaultindexingchain.go:830-840).

A list<string> text column analyzes each value in sequence; the position
counter ends a value at its RAW stream length (trailing dropped stopwords
still advance it, via End()'s accumulated increments) and then adds the
configured gap. Norms sum kept tokens across values."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.analysis import StandardAnalyzer
from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.search import IndexSearcher, PhraseQuery, TermQuery


def _col(a, lists):
    return a.analyze_column(pa.array(lists, type=pa.list_(pa.string())))


def test_positions_concatenate_with_gap_zero():
    a = StandardAnalyzer(stop_words=frozenset())
    out = _col(a, [["alpha beta", "gamma delta"]])
    assert out["terms"].to_pylist() == ["alpha", "beta", "gamma", "delta"]
    # reference default gap 0: the second value continues the raw stream
    assert out["positions"].tolist() == [0, 1, 2, 3]
    assert out["norms"].tolist() == [4]
    assert out["raw_counts"].tolist() == [4]


def test_positions_with_gap():
    a = StandardAnalyzer(stop_words=frozenset(), position_increment_gap=100)
    out = _col(a, [["alpha beta", "gamma", "delta"]])
    assert out["positions"].tolist() == [0, 1, 102, 203]
    assert out["norms"].tolist() == [4]


def test_trailing_stopword_still_advances_counter():
    """End() adds the dropped-token increments before the gap, so a value
    ending in stopwords starts the next value further out."""
    a = StandardAnalyzer(position_increment_gap=10)
    out = _col(a, [["alpha the the", "beta"]])
    assert out["terms"].to_pylist() == ["alpha", "beta"]
    # value 0 raw length 3 => beta at 3 + 10
    assert out["positions"].tolist() == [0, 13]
    assert out["norms"].tolist() == [2]


def test_null_value_and_null_row():
    a = StandardAnalyzer(stop_words=frozenset(), position_increment_gap=7)
    out = a.analyze_column(
        pa.array(
            [["alpha", None, "beta"], None, [], ["gamma"]],
            type=pa.list_(pa.string()),
        )
    )
    assert out["terms"].to_pylist() == ["alpha", "beta", "gamma"]
    # the null VALUE has no token stream: no raw tokens, but the gap is
    # still applied per value boundary => beta at 1 + 7 + 0 + 7
    assert out["positions"].tolist() == [0, 15, 0]
    assert out["norms"].tolist() == [2, 0, 0, 1]
    assert out["doc_idx"].tolist() == [0, 0, 3]


def test_matches_row_at_a_time_concat():
    """Multi path == analyzing the values row-at-a-time with manual bases."""
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "the", "gamma", "of", "delta"]
    docs = [
        [" ".join(rng.choice(words, rng.integers(1, 6))) for _ in range(rng.integers(1, 4))]
        for _ in range(50)
    ]
    gap = 100
    a = StandardAnalyzer(position_increment_gap=gap)
    out = _col(a, docs)
    exp_terms, exp_pos, exp_doc = [], [], []
    for d, values in enumerate(docs):
        base = 0
        for v in values:
            ad = a.analyze(v)
            exp_terms += ad.terms
            exp_pos += (ad.positions + base).tolist()
            exp_doc += [d] * len(ad.terms)
            base += len(a.tokenize_raw(v)) + gap
    assert out["terms"].to_pylist() == exp_terms
    assert out["positions"].tolist() == exp_pos
    assert out["doc_idx"].tolist() == exp_doc


def test_offsets_concatenate_across_values():
    """Cross-value offsets: a value ends the offset counter at the
    reported START of its last raw token (the tokenizer EOF branch sets
    SetOffset(slow, slow+0), standard/tokenizer.go:40-46); the next value
    starts at that plus GetOffsetGap (default 1,
    defaultindexingchain.go:833-841)."""
    a = StandardAnalyzer(stop_words=frozenset())
    out = a.analyze_column(
        pa.array([["ab cd", "ef"]], type=pa.list_(pa.string())),
        emit_offsets=True,
    )
    # value 0: ab(0,2) cd(4,6) — quirk start 3+1; final slow = 4
    # value 1 base = 4 + gap(1) = 5: ef(5,7)
    assert out["terms"].to_pylist() == ["ab", "cd", "ef"]
    assert out["starts"].tolist() == [0, 4, 5]
    assert out["ends"].tolist() == [2, 6, 7]


def test_offsets_null_value_advances_by_gap_only():
    a = StandardAnalyzer(stop_words=frozenset(), offset_gap=10)
    out = a.analyze_column(
        pa.array([["ab", None, "cd"]], type=pa.list_(pa.string())),
        emit_offsets=True,
    )
    # value 0 final slow = 0 (its only raw token starts at 0); null value
    # has no stream (final 0) but the per-value gap still applies
    assert out["starts"].tolist() == [0, 0 + 10 + 0 + 10]
    assert out["ends"].tolist() == [2, 22]


def test_offsets_match_row_at_a_time_concat():
    """Vectorized multi path == per-value analyze() + manual offset bases
    (incl. multi-byte text, trailing whitespace, empty values)."""
    from lucene_go_ray.analysis.analyzer import _SPLIT_RE

    rng = np.random.default_rng(5)
    words = ["alpha", "béta", "the", "gamma", "of", "δelta", ""]
    docs = []
    for _ in range(40):
        vals = []
        for _ in range(rng.integers(1, 4)):
            v = " ".join(rng.choice(words, rng.integers(1, 6)))
            if rng.random() < 0.3:
                v += " "  # trailing whitespace: empty final raw token
            vals.append(v)
        docs.append(vals)
    gap_p, gap_o = 100, 7
    a = StandardAnalyzer(position_increment_gap=gap_p, offset_gap=gap_o)
    out = a.analyze_column(
        pa.array(docs, type=pa.list_(pa.string())), emit_offsets=True
    )
    exp_starts, exp_ends = [], []
    for values in docs:
        obase = 0
        for v in values:
            ad = a.analyze(v)
            exp_starts += (ad.starts + obase).tolist()
            exp_ends += (ad.ends + obase).tolist()
            raw = _SPLIT_RE.split(v)
            last_start = len(v.encode()) - len(raw[-1].encode())
            obase += last_start + (len(raw) - 1) + gap_o
    assert out["starts"].tolist() == exp_starts
    assert out["ends"].tolist() == exp_ends


def test_index_multivalued_offsets_roundtrip(tmp_path):
    """End-to-end: offsets stream over a multi-valued column; retrieval
    returns the cross-value byte offsets."""
    docs = [["alpha beta", "gamma beta"], ["beta"]]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, type=pa.list_(pa.string())),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    index_dir = str(tmp_path / "index")
    cfg = IndexConfig(
        target_partition_rows=2,
        block_size=32,
        stop_words=(),
        index_offsets=True,
        offset_gap=1,
    )
    build_index([src], index_dir, cfg)
    s = IndexSearcher(index_dir)
    # doc 0: value0 "alpha beta" -> alpha(0,5) beta(7,11); final slow 7
    # value1 base = 7+1=8 -> gamma(8,13) beta(15,19)
    starts, ends = s.term_offsets("beta", 0)
    assert starts == [7, 15]
    assert ends == [11, 19]
    starts, ends = s.term_offsets("beta", 1)
    assert (starts, ends) == ([0], [4])


@pytest.fixture(scope="module")
def mv_index(tmp_path_factory):
    """Index over a multi-valued text column, gap=100."""
    docs = [
        ["alpha beta", "gamma delta"],  # phrase "beta gamma" spans values
        ["alpha beta gamma", "delta"],  # contiguous within one value
        ["beta", "gamma"],
        ["epsilon"],
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, type=pa.list_(pa.string())),
        }
    )
    d = tmp_path_factory.mktemp("mvidx")
    src = str(d / "docs.parquet")
    pq.write_table(t, src)
    index_dir = str(d / "index")
    cfg = IndexConfig(
        target_partition_rows=2,
        block_size=32,
        position_increment_gap=100,
        stop_words=(),
    )
    build_index([src], index_dir, cfg)
    return IndexSearcher(index_dir)


def test_index_multivalued_phrase_gap(mv_index):
    s = mv_index
    # "beta gamma" is adjacent only inside doc 1's first value; in doc 0 it
    # spans the value join (positions 1 and 102) and must NOT match
    td = s.search(PhraseQuery(("beta", "gamma")), 10)
    assert td.doc_ids.tolist() == [1]
    # terms from any value match, freq sums across values
    td = s.search(TermQuery("gamma"), 10)
    assert sorted(td.doc_ids.tolist()) == [0, 1, 2]
    df, ttf = s.term_statistics("beta")
    assert (df, ttf) == (3, 3)


def test_index_multivalued_norms(mv_index, tmp_path):
    """Norm = kept tokens across ALL values: docs 0 and 1 both have 4, so
    the same single-occurrence term scores identically in both."""
    s = mv_index
    td = s.search(TermQuery("alpha"), 10)
    assert sorted(td.doc_ids.tolist()) == [0, 1]
    assert td.scores[0] == td.scores[1]
    import os

    import pyarrow.parquet as pq_

    norms = []
    for p in sorted(os.listdir(os.path.join(s.index_dir, "segments"))):
        if p.startswith("p="):
            t = pq_.read_table(
                os.path.join(s.index_dir, "segments", p, "docmap.parquet"),
                columns=["norm"],
            )
            norms += t["norm"].to_pylist()
    assert norms == [4, 4, 2, 1]


@pytest.fixture(scope="module")
def mv_off_index(tmp_path_factory):
    """Multi-valued index with offsets AND a position gap — the case the
    offsets-mode highlighter used to refuse (quirk + gap accumulations)."""
    docs = [
        ["alpha beta gamma", "beta delta", "omega beta"],
        ["beta"],
        ["gamma delta", None, "alpha beta"],
        ["plain value no hits"],
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, type=pa.list_(pa.string())),
        }
    )
    d = tmp_path_factory.mktemp("mvoff")
    src = str(d / "docs.parquet")
    pq.write_table(t, src)
    index_dir = str(d / "index")
    cfg = IndexConfig(
        target_partition_rows=2,
        block_size=32,
        position_increment_gap=50,
        offset_gap=3,
        stop_words=(),
        index_offsets=True,
    )
    build_index([src], index_dir, cfg)
    return IndexSearcher(index_dir), docs


def test_match_regions_multivalued(mv_off_index):
    """Index-resolved (value, start, end) regions land exactly on the
    term's bytes in every value, gaps and quirk inverted."""
    s, docs = mv_off_index
    for doc_id, values in enumerate(docs):
        for term in ("alpha", "beta", "gamma", "delta", "omega"):
            regions = s.match_regions(doc_id, [term])
            expect = []
            for vi, v in enumerate(values):
                if v is None:
                    continue
                start = 0
                for tok in v.split(" "):
                    if tok == term:
                        expect.append((vi, start, start + len(tok)))
                    start += len(tok) + 1
            assert [(v, a, b) for v, a, b, _, _ in regions] == expect, (
                doc_id,
                term,
            )


def test_highlight_offsets_mode_multivalued_byte_identical(mv_off_index):
    """VERDICT item 6 'done' bar: offsets-mode snippets on multi-valued
    fields are byte-identical to re-analyze-mode snippets."""
    from lucene_go_ray.search.highlight import highlight

    s, docs = mv_off_index
    for doc_id in range(len(docs)):
        for terms in (["beta"], ["alpha", "gamma"], ["beta", "delta"]):
            a = highlight(s, doc_id, terms, use_offsets=False)
            b = highlight(s, doc_id, terms, use_offsets=True)
            assert a == b, (doc_id, terms)


def test_matches_api(mv_off_index):
    """Matches / MatchesIterator analogue: disjunction-merged, position
    ordered, with per-value actual offsets."""
    s, docs = mv_off_index
    from lucene_go_ray.search.query import BooleanQuery

    m = s.matches(BooleanQuery.build(should=["beta", "omega"]), 0)
    assert [r["term"] for r in m] == ["beta", "beta", "omega", "beta"]
    assert [r["position"] for r in m] == sorted(r["position"] for r in m)
    # every region's bytes equal its term in its value
    for r in m:
        v = docs[0][r["value_index"]]
        assert v[r["start_offset"] : r["end_offset"]] == r["term"]
    # no match -> None (MATCH_NONE)
    assert s.matches(TermQuery("zzz_absent"), 0) is None
