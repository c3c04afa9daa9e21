"""BooleanQuery rewrite pipeline — the reference's rule set
(booleanquery.go:74-330) run to fixpoint: single-clause flattening,
FILTER/MUST_NOT dedup, required-and-excluded detection, MatchAll /
duplicate FILTER removal, FILTER∩SHOULD promotion, boost-sum dedup."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_go_ray.search import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    TermQuery,
)
from lucene_go_ray.search.query import BooleanClause, Occur


def _bq(**kw):
    return BooleanQuery.build(**kw)


def test_single_clause_optimizations():
    t = TermQuery("a")
    assert _bq(must=["a"]).rewrite() == t
    assert _bq(should=["a"]).rewrite() == t
    assert _bq(should=["a"], minimum_should_match=1).rewrite() == t
    # single FILTER -> zero-boost constant score (go:92-93)
    r = _bq(filter=[t]).rewrite()
    assert r == BoostQuery(ConstantScoreQuery(t), 0.0)
    # pure negative -> MatchNoDocs (go:95)
    assert isinstance(_bq(must_not=["a"]).rewrite(), MatchNoDocsQuery)


def test_required_and_excluded_is_match_none():
    t = TermQuery("a")
    r = BooleanQuery.build(
        must=["b"], filter=[t], must_not=[t]
    ).rewrite()
    assert isinstance(r, MatchNoDocsQuery)
    # MUST_NOT MatchAll kills the query (go:161)
    r = BooleanQuery(
        (
            BooleanClause(TermQuery("b"), Occur.MUST),
            BooleanClause(MatchAllDocsQuery(), Occur.MUST_NOT),
        )
    ).rewrite()
    assert isinstance(r, MatchNoDocsQuery)


def test_filter_cleanup_rules():
    a, b = TermQuery("a"), TermQuery("b")
    # FILTER duplicating MUST is dropped (go:191-197)
    r = BooleanQuery(
        (
            BooleanClause(a, Occur.MUST),
            BooleanClause(a, Occur.FILTER),
            BooleanClause(b, Occur.MUST_NOT),
        )
    ).rewrite()
    assert isinstance(r, BooleanQuery)
    assert (a, Occur.FILTER) not in [(c.query, c.occur) for c in r.clauses]
    # MatchAll FILTER dropped when a MUST exists (go:174-188)
    r = BooleanQuery(
        (
            BooleanClause(a, Occur.MUST),
            BooleanClause(MatchAllDocsQuery(), Occur.FILTER),
        )
    ).rewrite()
    assert r == a  # filter gone, then single-MUST flattening kicks in


def test_filter_should_promotion():
    a, b = TermQuery("a"), TermQuery("b")
    r = BooleanQuery(
        (
            BooleanClause(a, Occur.SHOULD),
            BooleanClause(a, Occur.FILTER),
            BooleanClause(b, Occur.SHOULD),
        ),
        minimum_should_match=1,
    ).rewrite()
    # a promoted to MUST, its FILTER copy dropped, msm decremented
    assert isinstance(r, BooleanQuery)
    occs = {(c.query, c.occur) for c in r.clauses}
    assert (a, Occur.MUST) in occs and (b, Occur.SHOULD) in occs
    assert (a, Occur.FILTER) not in occs and (a, Occur.SHOULD) not in occs
    assert r.minimum_should_match == 0


def test_boost_sum_dedup():
    a, b = TermQuery("a"), TermQuery("b")
    # duplicate SHOULD clauses sum boosts (go:255-293)
    r = BooleanQuery(
        (
            BooleanClause(a, Occur.SHOULD),
            BooleanClause(a, Occur.SHOULD),
            BooleanClause(b, Occur.MUST_NOT),
        )
    ).rewrite()
    assert isinstance(r, BooleanQuery)
    sh = [c.query for c in r.clauses if c.occur is Occur.SHOULD]
    assert sh == [BoostQuery(a, 2.0)]
    # duplicate MUST with nested boosts (go:296-330)
    r = BooleanQuery(
        (
            BooleanClause(BoostQuery(a, 3.0), Occur.MUST),
            BooleanClause(a, Occur.MUST),
            BooleanClause(b, Occur.SHOULD),
        )
    ).rewrite()
    mu = [c.query for c in r.clauses if c.occur is Occur.MUST]
    assert mu == [BoostQuery(a, 4.0)]
    # msm > 1 disables SHOULD dedup (go:255)
    r = BooleanQuery(
        (
            BooleanClause(a, Occur.SHOULD),
            BooleanClause(a, Occur.SHOULD),
            BooleanClause(b, Occur.SHOULD),
        ),
        minimum_should_match=2,
    ).rewrite()
    sh = [c.query for c in r.clauses if c.occur is Occur.SHOULD]
    assert sh == [a, a, b]


def test_rewritten_queries_search_end_to_end(tmp_path):
    """Degenerate shapes run through a real index: boosted dedup scores
    2x a single SHOULD; pure-negative and required-and-excluded return
    zero hits; MatchAll FILTER is a no-op."""
    from lucene_go_ray.index import IndexConfig, build_index
    from lucene_go_ray.search import IndexSearcher

    docs = ["alpha beta", "alpha gamma", "beta gamma", "delta"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index([src], idx, IndexConfig(target_partition_rows=2, stop_words=()))
    s = IndexSearcher(idx)
    a = TermQuery("alpha")
    single = s.search(a, 10)
    doubled = s.search(
        BooleanQuery(
            (BooleanClause(a, Occur.SHOULD), BooleanClause(a, Occur.SHOULD))
        ),
        10,
    )
    assert doubled.doc_ids.tolist() == single.doc_ids.tolist()
    assert np.allclose(doubled.scores, 2.0 * single.scores)
    assert s.search(_bq(must_not=["alpha"]), 10).total_hits == 0
    assert (
        s.search(
            BooleanQuery.build(must=["beta"], filter=[a], must_not=[a]), 10
        ).total_hits
        == 0
    )
    with_filter = s.search(
        BooleanQuery(
            (
                BooleanClause(a, Occur.MUST),
                BooleanClause(MatchAllDocsQuery(), Occur.FILTER),
            )
        ),
        10,
    )
    assert with_filter.doc_ids.tolist() == single.doc_ids.tolist()
    assert np.allclose(with_filter.scores, single.scores)
