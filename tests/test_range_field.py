"""RangeFieldQuery (per-doc interval, relation semantics) — the
core/query/rangefieldquery.go + *rangeslowrangequery.go analogue.

Checks every relation against a brute-force pandas recompute over a
synthetic table that includes NULL interval sources (null => doc has no
range => never matches, the reference's "no doc values" behavior) and
enough partitions that the relation-specific zone-map pruning actually
engages."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.search import (
    BooleanQuery,
    IndexSearcher,
    RangeFieldQuery,
    TermQuery,
)

CFG = IndexConfig(
    target_partition_rows=60,  # ~7 segments => zone maps differ per segment
    chunk_docs=96,
    block_size=32,
    docvalue_fields=("n_chars",),
    range_fields=(("span", "lo_src", "hi_src"),),
)

N = 400


@pytest.fixture(scope="module")
def rf(tmp_path_factory):
    rng = np.random.default_rng(11)
    # intervals clustered by docID so per-segment zone maps are tight and
    # pruning is observable (docIDs are assigned in row order)
    base = np.sort(rng.integers(0, 1000, N))
    width = rng.integers(0, 200, N)
    a = base.astype("int64")
    b = (base + width).astype("int64")
    swap = rng.random(N) < 0.5  # source order must not matter (min/max)
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    null_mask = rng.random(N) < 0.07
    lo_src = pa.array(
        [None if m else int(v) for m, v in zip(null_mask, a2)], pa.int64()
    )
    words = ["alpha", "beta", "gamma"]
    text = [
        " ".join(rng.choice(words, rng.integers(3, 9))) for _ in range(N)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(N, dtype=np.int64)),
            "text": pa.array(text),
            "n_chars": pa.array([len(x) for x in text], pa.int64()),
            "lo_src": lo_src,
            "hi_src": pa.array(b2),
        }
    )
    d = tmp_path_factory.mktemp("rfidx")
    src = str(d / "docs.parquet")
    pq.write_table(t, src)
    index_dir = str(d / "index")
    build_index([src], index_dir, CFG)
    valid = ~null_mask
    lo = np.minimum(a2, b2)
    hi = np.maximum(a2, b2)
    return IndexSearcher(index_dir), valid, lo, hi


def _expect(valid, lo, hi, qlo, qhi, relation):
    inter = (lo <= qhi) & (hi >= qlo)
    within = (lo >= qlo) & (hi <= qhi)
    contains = (lo <= qlo) & (hi >= qhi)
    m = {
        "intersects": inter,
        "within": within,
        "contains": contains,
        "crosses": inter & ~within & ~contains,
    }[relation]
    return np.flatnonzero(valid & m).tolist()


@pytest.mark.parametrize("relation", ["intersects", "within", "contains", "crosses"])
@pytest.mark.parametrize("qlo,qhi", [(200, 450), (0, 2000), (990, 1010), (1500, 1600)])
def test_relation_matches_bruteforce(rf, relation, qlo, qhi):
    s, valid, lo, hi = rf
    got = s.search(RangeFieldQuery("span", qlo, qhi, relation), N)
    assert got.doc_ids.tolist() == _expect(valid, lo, hi, qlo, qhi, relation)


def test_zone_pruning_engages(rf):
    """A query interval beyond every per-segment zone reads no dv columns."""
    s, *_ = rf
    s._dv_cache.clear()
    td = s.search(RangeFieldQuery("span", 10**6, 10**6 + 5, "intersects"), N)
    assert td.total_hits == 0
    assert not s._dv_cache  # every segment zone-pruned before any read
    # and a narrow interval touches only the overlapping segments
    td = s.search(RangeFieldQuery("span", 0, 50, "intersects"), N)
    touched = {pid for (pid, _f) in s._dv_cache}
    assert td.total_hits > 0
    assert len(touched) < len(s.manifest.partitions)


def test_filtered_scored_query(rf):
    """Scored text MUST + RangeField FILTER: scores global, docs clipped."""
    s, valid, lo, hi = rf
    allowed = set(_expect(valid, lo, hi, 200, 450, "intersects"))
    base = s.search(TermQuery("alpha"), N)
    q = BooleanQuery.build(
        must=[TermQuery("alpha")],
        filter=[RangeFieldQuery("span", 200, 450, "intersects")],
    )
    td = s.search(q, N)
    exp = [
        (d, sc)
        for d, sc in zip(base.doc_ids.tolist(), base.scores.tolist())
        if d in allowed
    ]
    assert td.doc_ids.tolist() == [d for d, _ in exp]
    assert td.scores.tolist() == pytest.approx([sc for _, sc in exp], rel=1e-12)


def test_bad_relation_and_inverted_query_range():
    with pytest.raises(ValueError):
        RangeFieldQuery("span", 0, 10, "overlaps")
    with pytest.raises(ValueError):
        RangeFieldQuery("span", 10, 0, "intersects")
