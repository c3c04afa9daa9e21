"""Lead-with-rarest conjunction (searcher.py:_lead_conjunction —
ConjunctionDISI semantics, /root/reference/core/search/conjunctiondisi.go):
rank identity vs the exhaustive path, exact total_hits, real block
skipping on df-skewed clauses, cache compatibility with the sweep."""

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.search import BooleanQuery, IndexSearcher, TermQuery

CFG = IndexConfig(
    target_partition_rows=400,
    chunk_docs=512,
    block_size=32,  # small blocks so skew produces many skippable blocks
)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    """800 docs: 'common' in every doc (25 blocks at block_size=32),
    'often' in half, 'rare' in ~2.5%, so rare AND common should touch
    <= 20 of common's blocks."""
    rng = random.Random(99)
    texts = []
    for i in range(800):
        toks = ["common"] * rng.randint(1, 3)
        if i % 2 == 0:
            toks += ["often"] * rng.randint(1, 2)
        if rng.random() < 0.025:
            toks.append("rare")
        toks += [f"filler{rng.randint(0, 200)}" for _ in range(rng.randint(3, 9))]
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    tmp = tmp_path_factory.mktemp("leadconj")
    src = str(tmp / "docs.parquet")
    pq.write_table(pa.table({"doc_id": list(range(len(texts))), "text": texts}), src)
    index_dir = str(tmp / "idx")
    build_index([src], index_dir, CFG)
    return IndexSearcher(index_dir)


CASES = [
    (["rare", "common"], 10),
    (["rare", "common"], 100),
    (["rare", "often", "common"], 10),
    (["often", "common"], 10),  # low skew: still exact when forced
    (["rare", "rare"], 5),  # duplicate clause collapses via rewrite
]


@pytest.mark.parametrize("terms,k", CASES)
def test_lead_conjunction_rank_identical(built, terms, k):
    s = built
    q = BooleanQuery.build(must=terms).rewrite()
    exh = s.search(q, k, prune=False)
    led = s._try_pruned(q, k, lead_conjunction=True)
    if led is None:  # rewrite collapsed to a single term: not a conjunction
        assert len(set(terms)) == 1
        return
    assert led.doc_ids.tolist() == exh.doc_ids.tolist()
    assert led.scores.tolist() == pytest.approx(exh.scores.tolist(), rel=0, abs=0)
    # the lead path computes the full conjunction: total_hits is EXACT
    assert led.total_hits == exh.total_hits
    assert s.last_prune_stats["mode"] == "and_lead"


def test_lead_conjunction_skips_blocks(built):
    s = built
    q = BooleanQuery.build(must=["rare", "common"]).rewrite()
    s._try_pruned(q, 10, lead_conjunction=True)
    st = s.last_prune_stats
    assert st["mode"] == "and_lead"
    assert st["blocks_skipped"] > 0, st
    # df('rare') ~20 candidates against 25+ 'common' blocks: most skip
    assert st["blocks_skipped"] >= st["blocks_total"] // 4, st


def test_lead_conjunction_empty_intersection(built):
    s = built
    # 'rare' docs all contain 'common', none contain a filler absent
    # from every rare doc is hard to guarantee; use a missing term
    q = BooleanQuery.build(must=["rare", "zzznotaterm"]).rewrite()
    td = s.search(q, 10, prune=True)
    assert len(td.doc_ids) == 0 and td.total_hits == 0


def test_lead_conjunction_after_sweep_cache(built):
    """The lead path shares the sweep's per-(row, block) cache keys —
    running the forced sweep first must not corrupt the lead result."""
    s = built
    q = BooleanQuery.build(must=["rare", "common"]).rewrite()
    swept = s._try_pruned(q, 10, min_postings=0, lead_conjunction=False)
    led = s._try_pruned(q, 10, lead_conjunction=True)
    exh = s.search(q, 10, prune=False)
    assert led.doc_ids.tolist() == exh.doc_ids.tolist()
    assert led.scores.tolist() == pytest.approx(exh.scores.tolist(), rel=0, abs=0)
    if swept is not None:
        assert swept.doc_ids.tolist() == exh.doc_ids.tolist()


def test_lead_conjunction_respects_deletes(built):
    s = built
    q = BooleanQuery.build(must=["rare", "common"]).rewrite()
    base = s._try_pruned(q, 10, lead_conjunction=True)
    assert len(base.doc_ids) > 0
    victim = int(base.doc_ids[0])
    try:
        s.deleted = np.asarray([victim], dtype=np.int64)
        led = s._try_pruned(q, 10, lead_conjunction=True)
        exh = s.search(q, 10, prune=False)
        assert victim not in led.doc_ids.tolist()
        assert led.doc_ids.tolist() == exh.doc_ids.tolist()
        assert led.scores.tolist() == pytest.approx(
            exh.scores.tolist(), rel=0, abs=0
        )
    finally:
        s.deleted = np.empty(0, dtype=np.int64)


def test_lead_conjunction_blob_io_skipping(tmp_path):
    """The lead path preads ONLY the big term's touched blocks from the
    blob side file — fewer bytes than the exhaustive full-stream read
    (same invariant as test_pruned_blob_io_skipping, for conjunctions)."""
    from lucene_go_ray.index.codec import BlobFile
    from lucene_go_ray.pipelines import corpus

    src = str(tmp_path / "bursty.parquet")
    corpus.synthesize_bursty_corpus(20_000, src)
    index_dir = str(tmp_path / "idx")
    build_index([src], index_dir, IndexConfig())
    vocab = corpus._vocabulary(10_000)
    rare = vocab[4000]
    q = BooleanQuery.build(must=["web", rare]).rewrite()

    def blob_bytes(s):
        return sum(bf.bytes_read for bf in s.postings._bf_cache.values())

    s1 = IndexSearcher(index_dir)
    a = s1.search(q, 10, prune=False)
    read_ex = blob_bytes(s1)
    s2 = IndexSearcher(index_dir)
    led = s2._try_pruned(q, 10, lead_conjunction=True)
    read_led = blob_bytes(s2)
    assert led is not None
    assert a.doc_ids.tolist() == led.doc_ids.tolist()
    assert a.scores.tolist() == led.scores.tolist()
    assert s2.last_prune_stats["blocks_skipped"] > 0
    assert 0 < read_led < read_ex


def test_lead_conjunction_sharded_parity(built):
    """Doc-range sharding through the FORCED lead path (what a shard
    worker does: set _doc_range, call _try_pruned, merge): the merged
    per-range results must equal unsharded exhaustive bit-for-bit. This
    is the lead + _doc_range interaction — the auto floor (200k) never
    engages on this corpus, so the in-process force is the only way to
    exercise it. A default-guard search_sharded run rides along as the
    fallback-path parity check."""
    s = built
    q = BooleanQuery.build(must=["rare", "common"]).rewrite()
    exh = s.search(q, 100, prune=False)
    max_doc = s.manifest.max_doc
    for shards in (2, 3):
        bounds = np.linspace(0, max_doc, shards + 1).astype(np.int64)
        docs, scores = [], []
        for i in range(shards):
            try:
                s._doc_range = (int(bounds[i]), int(bounds[i + 1]) - 1)
                td = s._try_pruned(q, 100, lead_conjunction=True)
                assert s.last_prune_stats["mode"] == "and_lead"
            finally:
                s._doc_range = None
            docs.append(td.doc_ids)
            scores.append(td.scores)
        order = np.lexsort(
            (np.concatenate(docs), -np.concatenate(scores))
        )[:100]
        merged_docs = np.concatenate(docs)[order]
        merged_scores = np.concatenate(scores)[order]
        assert merged_docs.tolist() == exh.doc_ids.tolist(), shards
        assert merged_scores.tolist() == pytest.approx(
            exh.scores.tolist(), rel=0, abs=0
        )
    td = s.search_sharded(q, 10, num_shards=2, prune=True)
    assert td.doc_ids.tolist() == exh.doc_ids.tolist()[:10]


def test_lead_conjunction_salted_multichunk_parity(tmp_path_factory, sf_dir):
    """Force the lead path on an index whose hot terms are SALTED across
    groups and whose partitions split into multiple chunk rows — the
    multi-row rows_per_term regime (per-row candidate slicing + block
    lookup must respect disjoint row spans)."""
    import os
    import random

    index_dir = str(tmp_path_factory.mktemp("leadsalt"))
    cfg = IndexConfig(
        target_partition_rows=100,
        chunk_docs=96,
        block_size=32,
        hot_term_doc_freq=80,  # forces salt groups for common terms
        salt_group_partitions=2,
    )
    build_index([os.path.join(sf_dir, "documents.parquet")], index_dir, cfg)
    s = IndexSearcher(index_dir)
    # pick common terms (salted => multiple rows) and rare partners
    vocab = sorted(
        (sum(r["doc_freq"] for r in s._term_rows(t)), t)
        for t in ("spark", "window", "batch", "scan", "sort", "merge", "data")
        if s._term_rows(t)
    )
    rng = random.Random(5)
    terms = [t for _, t in vocab]
    for _ in range(12):
        pick = rng.sample(terms, rng.randint(2, 3))
        q = BooleanQuery.build(must=pick).rewrite()
        exh = s.search(q, 10, prune=False)
        led = s._try_pruned(q, 10, lead_conjunction=True)
        assert led is not None
        assert led.doc_ids.tolist() == exh.doc_ids.tolist(), pick
        assert led.scores.tolist() == pytest.approx(
            exh.scores.tolist(), rel=0, abs=0
        ), pick
        assert led.total_hits == exh.total_hits, pick
    # sanity: at least one probed term really is multi-row (salted/chunked)
    assert any(len(s._term_rows(t)) > 1 for t in terms)


def test_lead_conjunction_auto_engage_floor(built):
    """At 800 docs the postings volume is far below the 200k floor, so the
    default path must NOT engage the lead conjunction (auto returns None
    from the heuristic and falls through)."""
    s = built
    q = BooleanQuery.build(must=["rare", "common"]).rewrite()
    s.last_prune_stats = None
    s.search(q, 10, prune=True)
    st = s.last_prune_stats
    assert st is None or st["mode"] != "and_lead"
