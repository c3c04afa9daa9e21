"""Numeric doc-values field updates + soft deletes
(/root/reference/core/index/docvaluesfieldupdates.go,
pendingsoftdeletes.go): generation-stamped overlay, newest-write-wins,
visible to every dv consumer, consumed by expungeDeletes, and
soft-delete recoverability."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index import (
    IndexConfig,
    build_index,
    soft_delete_by_query,
    soft_undelete,
    update_numeric_docvalues,
    update_numeric_docvalues_by_query,
)
from lucene_go_ray.index.compact import expunge_deletes
from lucene_go_ray.index.dv_updates import load_dv_updates
from lucene_go_ray.search import IndexSearcher, TermQuery
from lucene_go_ray.search.query import NumericRangeQuery

N = 40
CFG = IndexConfig(target_partition_rows=10, docvalue_fields=("score",))


def _build(tmp_path):
    src = str(tmp_path / "docs.parquet")
    texts = [f"alpha beta w{i}" if i % 2 else f"alpha gamma w{i}" for i in range(N)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N), pa.int64()),
                "text": pa.array(texts),
                "score": pa.array([i * 10 for i in range(N)], pa.int64()),
            }
        ),
        src,
    )
    index_dir = str(tmp_path / "idx")
    build_index([src], index_dir, CFG)
    return index_dir


def test_dv_update_visible_to_all_consumers(tmp_path):
    index_dir = _build(tmp_path)
    # move doc 3's score far OUTSIDE every segment's built zone map:
    # a stale-zone prune would lose it (the _dv_zone widening is the fix)
    update_numeric_docvalues(index_dir, "score", [3, 17], [100_000, 100_001])
    s = IndexSearcher(index_dir)
    vals, valid = s.dv_values(np.array([2, 3, 17], np.int64), "score")
    assert vals.tolist() == [20, 100_000, 100_001]
    assert valid.all()
    hits = s._numeric_range_docs("score", 99_999, 200_000)
    assert hits.tolist() == [3, 17]
    # old values are gone from range matching
    assert 3 not in s._numeric_range_docs("score", 25, 35).tolist()
    # field-sorted top-k sees the update too (TopFieldCollector gather)
    from lucene_go_ray.search import SortField, TopFieldCollectorManager

    t = s.search_with_collector(
        TermQuery("alpha"), TopFieldCollectorManager([SortField("score", True)], 2)
    )
    assert t["doc_id"].to_pylist() == [17, 3]


def test_dv_update_newest_generation_wins(tmp_path):
    index_dir = _build(tmp_path)
    update_numeric_docvalues(index_dir, "score", [5], [111])
    update_numeric_docvalues(index_dir, "score", [5, 6], [222, 333])
    # duplicate ids within one call: LAST write wins there as well
    update_numeric_docvalues(index_dir, "score", [7, 7], [1, 2])
    s = IndexSearcher(index_dir)
    vals, _ = s.dv_values(np.array([5, 6, 7], np.int64), "score")
    assert vals.tolist() == [222, 333, 2]


def test_dv_update_by_query(tmp_path):
    index_dir = _build(tmp_path)
    n = update_numeric_docvalues_by_query(
        index_dir, TermQuery("gamma"), "score", 7
    )
    assert n == N // 2
    s = IndexSearcher(index_dir)
    hits = s._numeric_range_docs("score", 7, 7)
    assert hits.tolist() == [i for i in range(N) if i % 2 == 0]


def test_soft_delete_and_undelete(tmp_path):
    index_dir = _build(tmp_path)
    n = soft_delete_by_query(index_dir, NumericRangeQuery("score", 0, 95))
    assert n == 10
    s = IndexSearcher(index_dir)
    td = s.search(TermQuery("alpha"), N)
    assert set(td.doc_ids.tolist()) == set(range(10, N))
    # stats still count soft-deleted docs (liveDocs semantics)
    assert s.stats["doc_count"] == N
    # the retention reader sees everything
    s_all = IndexSearcher(index_dir, include_soft_deleted=True)
    assert len(s_all.search(TermQuery("alpha"), N).doc_ids) == N
    # resurrect half of them: newer generation, value 0
    soft_undelete(index_dir, list(range(5)))
    s2 = IndexSearcher(index_dir)
    assert set(s2.search(TermQuery("alpha"), N).doc_ids.tolist()) == (
        set(range(5)) | set(range(10, N))
    )


def test_expunge_consumes_updates_and_soft_deletes(tmp_path):
    index_dir = _build(tmp_path)
    update_numeric_docvalues(index_dir, "score", [12, 13], [90_000, 90_001])
    soft_delete_by_query(index_dir, NumericRangeQuery("score", 100, 140))
    # the soft-delete query sees the UPDATED values, so 12/13 (now 90k)
    # are not in [100, 140]: soft-deleted = {10, 11, 14}
    res = expunge_deletes(index_dir)
    assert res["docs_expunged"] == 3
    # soft-deleted docs are physically dead: even the retention reader
    # no longer sees them (they were consumed, not retained)
    s_all = IndexSearcher(index_dir, include_soft_deleted=True)
    docs = set(s_all.search(TermQuery("alpha"), N).doc_ids.tolist())
    assert docs == set(range(N)) - {10, 11, 14}
    # stats refreshed (post-merge behavior)
    assert s_all.stats["doc_count"] == N - 3
    # updated dv values were BAKED into the rewritten segment (12, 13 are
    # in the partition [10, 20) that got rewritten) and the overlay rows
    # for that range were dropped
    upd = load_dv_updates(index_dir)
    assert "score" not in upd or not (
        ((upd["score"][0] >= 10) & (upd["score"][0] < 20)).any()
    )
    s = IndexSearcher(index_dir)
    assert s._numeric_range_docs("score", 89_999, 95_000).tolist() == [12, 13]
    vals, valid = s.dv_values(np.array([12, 13], np.int64), "score")
    assert vals.tolist() == [90_000, 90_001] and valid.all()
    # zone maps were refreshed: the baked value is findable with NO
    # overlay left (i.e. pruning uses the rewritten dv_ranges)
    m = s.manifest.partitions
    p1 = next(p for p in m if int(p["doc_base"]) == 10)
    assert p1["dv_ranges"]["score"][1] >= 90_001


def test_dv_update_survives_unrelated_expunge(tmp_path):
    """Updates in partitions the compaction does NOT rewrite stay in the
    overlay and keep applying."""
    index_dir = _build(tmp_path)
    update_numeric_docvalues(index_dir, "score", [35], [77_777])
    from lucene_go_ray.index.deletes import delete_by_query

    delete_by_query(index_dir, NumericRangeQuery("score", 0, 5))
    expunge_deletes(index_dir)
    s = IndexSearcher(index_dir)
    assert s._numeric_range_docs("score", 77_000, 78_000).tolist() == [35]
    upd = load_dv_updates(index_dir)
    assert 35 in upd["score"][0].tolist()
