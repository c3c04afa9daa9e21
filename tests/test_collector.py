"""Pluggable Collector/CollectorManager (core/search/collector.go:1 +
the CollectorManager sharding contract of indexsearcher.go:295-361):
built-in managers must agree with the hardwired search paths and with
independent python recounts, single-collector and Ray-sharded alike."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.analysis import StandardAnalyzer
from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.search import (
    BooleanQuery,
    IndexSearcher,
    NumericHistogramCollectorManager,
    TermQuery,
    TopDocsCollectorManager,
    TotalHitCountCollectorManager,
)

from .naive_oracle import NaiveEngine

CFG = IndexConfig(
    target_partition_rows=120,  # several segments on 500 docs
    docvalue_fields=("n_chars", "doc_id"),
    keyword_fields=("lang",),  # facet tests count over this field
)


@pytest.fixture(scope="module")
def built_dv(tmp_path_factory, sf_dir):
    index_dir = str(tmp_path_factory.mktemp("coll_idx"))
    src = os.path.join(sf_dir, "documents.parquet")
    build_index([src], index_dir, CFG)
    t = pq.read_table(src, columns=["text", "n_chars"])
    texts = t["text"].to_pylist()
    oracle = NaiveEngine(
        texts, StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase)
    )
    return IndexSearcher(index_dir), oracle, t["n_chars"].to_pylist()


def _queries(oracle):
    terms = sorted(
        t for t, pl in oracle.postings.items() if 20 <= len(pl) <= 400 and t
    )[:3]
    qs = [TermQuery(t) for t in terms]
    if len(terms) >= 2:
        qs.append(
            BooleanQuery.build(should=[TermQuery(terms[0]), TermQuery(terms[1])])
        )
    return qs


def test_total_hit_count_manager(built_dv):
    s, oracle, _ = built_dv
    for q in _queries(oracle):
        want = s.search(q, k=10).total_hits
        assert s.search_with_collector(q, TotalHitCountCollectorManager()) == want
        assert (
            s.search_with_collector_sharded(
                q, TotalHitCountCollectorManager(), num_shards=5
            )
            == want
        )


def test_topdocs_manager_rank_identical(built_dv):
    s, oracle, _ = built_dv
    for q in _queries(oracle):
        ref = s.search(q, k=10)
        for runner in (
            lambda: s.search_with_collector(q, TopDocsCollectorManager(10)),
            lambda: s.search_with_collector_sharded(
                q, TopDocsCollectorManager(10), num_shards=4
            ),
        ):
            td = runner()
            assert td.doc_ids.tolist() == ref.doc_ids.tolist()
            assert td.scores.tolist() == ref.scores.tolist()
            assert td.total_hits == ref.total_hits


def test_histogram_manager_matches_recount(built_dv):
    s, oracle, n_chars = built_dv
    lo, hi, n = 0, 500, 8
    for q in _queries(oracle):
        if not isinstance(q, TermQuery):
            continue
        match = sorted(oracle.postings[q.term])
        vals = np.array([n_chars[d] for d in match], dtype=np.int64)
        want = np.bincount(
            np.clip((vals - lo) * n // (hi - lo), 0, n - 1), minlength=n
        )
        for shards in (1, 6):
            t = (
                s.search_with_collector(
                    q, NumericHistogramCollectorManager("n_chars", lo, hi, n)
                )
                if shards == 1
                else s.search_with_collector_sharded(
                    q,
                    NumericHistogramCollectorManager("n_chars", lo, hi, n),
                    num_shards=shards,
                )
            )
            got = np.zeros(n, np.int64)
            got[t["bucket"].to_numpy()] = t["cnt"].to_numpy()
            assert got.tolist() == want.tolist(), (q.term, shards)


def test_top_field_collector_vs_brute_force(built_dv):
    """TopFieldCollector (topfieldcollector.go / sortfield.go): top-k of
    the query's hit set ordered by dv comparators, single- and
    multi-field, both directions, sharded and not — vs a brute-force sort
    of the full oracle match set."""
    from lucene_go_ray.search import SortField, TopFieldCollectorManager

    s, oracle, n_chars = built_dv
    for q in _queries(oracle):
        if not isinstance(q, TermQuery):
            continue
        match = sorted(oracle.postings[q.term])
        for fields in (
            [("n_chars", True)],
            [("n_chars", False)],
            [("n_chars", True), ("doc_id", True)],
        ):
            keyf = lambda d: tuple(
                (-(n_chars[d] if f == "n_chars" else d))
                if rev
                else (n_chars[d] if f == "n_chars" else d)
                for f, rev in fields
            ) + (d,)
            want = sorted(match, key=keyf)[:10]
            for shards in (1, 5):
                mgr = TopFieldCollectorManager(
                    [SortField(f, reverse=r) for f, r in fields], 10
                )
                t = (
                    s.search_with_collector(q, mgr)
                    if shards == 1
                    else s.search_with_collector_sharded(q, mgr, num_shards=shards)
                )
                assert t["doc_id"].to_pylist() == want, (q.term, fields, shards)
                assert t["rank"].to_pylist() == list(range(1, len(want) + 1))
                got_vals = t[fields[0][0]].to_pylist()
                assert got_vals == [
                    n_chars[d] if fields[0][0] == "n_chars" else d for d in want
                ]


def test_top_field_collector_missing_values_sort_last(tmp_path):
    """Docs whose sort field is null rank after all valued docs under BOTH
    directions (SortField missing-value policy), with docID tiebreak."""
    import pyarrow as pa

    from lucene_go_ray.search import SortField, TopFieldCollectorManager

    src = str(tmp_path / "docs.parquet")
    n = 12
    score = [None if i % 3 == 0 else (i * 7) % 50 for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["alpha beta"] * n),
                "score": pa.array(score, pa.int64()),
            }
        ),
        src,
    )
    index_dir = str(tmp_path / "idx")
    build_index([src], index_dir, IndexConfig(
        target_partition_rows=5, docvalue_fields=("score",)
    ))
    s = IndexSearcher(index_dir)
    for rev in (True, False):
        mgr = TopFieldCollectorManager([SortField("score", reverse=rev)], n)
        t = s.search_with_collector(TermQuery("alpha"), mgr)
        valued = [i for i in range(n) if score[i] is not None]
        missing = [i for i in range(n) if score[i] is None]
        want = sorted(
            valued, key=lambda d: (-score[d] if rev else score[d], d)
        ) + missing
        assert t["doc_id"].to_pylist() == want, rev
        assert t["score"].to_pylist() == [score[d] for d in want]


def test_custom_user_collector(built_dv):
    """A from-scratch user subclass (score-sum + doc-count) works through
    both entry points — the actual extension contract."""
    from lucene_go_ray.search import Collector, CollectorManager

    class SumCollector(Collector):
        def __init__(self):
            self.n, self.total = 0, 0.0

        def collect(self, docs, scores):
            self.n += len(docs)
            self.total += float(scores.sum())

    class SumManager(CollectorManager):
        def new_collector(self):
            return SumCollector()

        def reduce(self, cs):
            return (sum(c.n for c in cs), sum(c.total for c in cs))

    s, oracle, _ = built_dv
    q = _queries(oracle)[0]
    scored = oracle._eval(q)
    want_n, want_sum = len(scored), sum(scored.values())
    for got in (
        s.search_with_collector(q, SumManager()),
        s.search_with_collector_sharded(q, SumManager(), num_shards=3),
    ):
        assert got[0] == want_n
        assert got[1] == pytest.approx(want_sum, rel=1e-9)


def test_facet_counts_vs_oracle(built_dv, sf_dir):
    """FacetCountsCollectorManager (facets-module analogue): top-N stored
    keyword value counts over a query's hit set == an independent recount
    (NaiveEngine match set joined to the parquet column)."""
    from collections import Counter

    from lucene_go_ray.search import FacetCountsCollectorManager

    s, oracle, _ = built_dv
    langs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )["lang"].to_pylist()
    for q in _queries(oracle):
        got = s.search_with_collector_sharded(
            q, FacetCountsCollectorManager("lang", top_n=5)
        )
        exp = Counter(langs[d] for d in oracle._eval(q) if langs[d] is not None)
        top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert got["value"].to_pylist() == [v for v, _ in top], q
        assert got["cnt"].to_pylist() == [n for _, n in top], q
    # absent term: empty facet table
    empty = s.search_with_collector_sharded(
        TermQuery("zzznotaterm"), FacetCountsCollectorManager("lang")
    )
    assert empty.num_rows == 0
