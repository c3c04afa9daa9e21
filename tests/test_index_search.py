"""End-to-end: distributed build + merged-index search must be
rank-identical (docIDs and float64 scores) to the exhaustive oracle."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.analysis import StandardAnalyzer
from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.search import (
    BooleanQuery,
    IndexSearcher,
    MatchAllDocsQuery,
    PhraseQuery,
    TermQuery,
)

from .naive_oracle import NaiveEngine

CFG = IndexConfig(
    target_partition_rows=100,  # force multiple partitions on 500 docs
    chunk_docs=96,  # force multi-chunk terms
    block_size=32,  # force multiple blocks per chunk
    hot_term_doc_freq=80,  # force salting of common terms
    salt_group_partitions=2,
)


@pytest.fixture(scope="module")
def built(tmp_path_factory, sf_dir):
    index_dir = str(tmp_path_factory.mktemp("idx"))
    src = os.path.join(sf_dir, "documents.parquet")
    manifest = build_index([src], index_dir, CFG)
    texts = pq.read_table(src, columns=["text"])["text"].to_pylist()
    oracle = NaiveEngine(
        texts, StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase)
    )
    return index_dir, manifest, oracle, texts


def _common_terms(oracle, lo, hi):
    out = sorted(
        t for t, pl in oracle.postings.items() if lo <= len(pl) <= hi and t
    )
    if not out:  # fall back to the lowest-df terms available
        out = sorted((len(pl), t) for t, pl in oracle.postings.items() if t)
        out = [t for _, t in out[:5]]
    return out


def _assert_rank_identical(td, expected, total):
    got = list(zip(td.doc_ids.tolist(), td.scores.tolist()))
    exp = [(d, pytest.approx(s, rel=1e-12, abs=1e-12)) for d, s in expected]
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == es, (gd, gs)
    assert td.total_hits == total


def test_manifest_stats(built):
    index_dir, manifest, oracle, texts = built
    assert manifest.max_doc == len(texts)
    assert manifest.doc_count == oracle.doc_count
    assert manifest.sum_total_term_freq == oracle.sum_ttf
    assert manifest.sum_doc_freq == sum(len(pl) for pl in oracle.postings.values())


def test_term_statistics(built):
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    for t in list(oracle.postings)[:50]:
        df, ttf = s.term_statistics(t)
        assert df == len(oracle.postings[t])
        assert ttf == sum(len(ps) for ps in oracle.postings[t].values())
    assert s.term_statistics("nonexistent-term-xyz") == (0, 0)


def test_term_queries_rank_identical(built):
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    hot = _common_terms(oracle, 80, 10**9)[:5]
    mid = _common_terms(oracle, 10, 79)[:5]
    rare = _common_terms(oracle, 1, 3)[:3]
    for t in hot + mid + rare:
        for k in (1, 10, 1000):
            exp, total = oracle.search(TermQuery(t), k)
            _assert_rank_identical(s.search(TermQuery(t), k), exp, total)


def test_absent_term_empty(built):
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    td = s.search(TermQuery("zzz-absent"), 10)
    assert len(td.doc_ids) == 0 and td.total_hits == 0


def test_boolean_queries_rank_identical(built):
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    terms = _common_terms(oracle, 20, 10**9)
    t1, t2, t3 = terms[0], terms[len(terms) // 2], terms[-1]
    rare = _common_terms(oracle, 1, 5)[0]
    cases = [
        BooleanQuery.build(must=[t1, t2]),
        BooleanQuery.build(must=[t1, t2, t3]),
        BooleanQuery.build(must=[t1, rare]),
        BooleanQuery.build(should=[t1, t2, t3]),
        BooleanQuery.build(should=[t1, rare]),
        BooleanQuery.build(must=[t1], must_not=[t2]),
        BooleanQuery.build(must=[t1], should=[t2, t3]),
        BooleanQuery.build(should=[t1, t2, t3], minimum_should_match=2),
        BooleanQuery.build(filter=[t1], should=[t2]),
        BooleanQuery.build(must=[t1, "zzz-absent"]),
    ]
    for q in cases:
        for k in (10, 100):
            exp, total = oracle.search(q, k)
            _assert_rank_identical(s.search(q, k), exp, total)


def test_phrase_queries_rank_identical(built):
    index_dir, _, oracle, texts = built
    s = IndexSearcher(index_dir)
    # pick real adjacent bigrams/trigrams from the corpus
    an = StandardAnalyzer(stop_words=CFG.stop_set())
    d0 = an.analyze(texts[0])
    bigram = None
    trigram = None
    for i in range(len(d0.terms) - 2):
        if d0.positions[i + 1] == d0.positions[i] + 1 and d0.terms[i]:
            bigram = (d0.terms[i], d0.terms[i + 1])
            if d0.positions[i + 2] == d0.positions[i] + 2:
                trigram = (d0.terms[i], d0.terms[i + 1], d0.terms[i + 2])
                break
    assert bigram
    cases = [PhraseQuery(bigram)]
    if trigram:
        cases.append(PhraseQuery(trigram))
    # present-but-not-adjacent: reversed bigram likely not adjacent everywhere
    cases.append(PhraseQuery((bigram[1], bigram[0])))
    cases.append(PhraseQuery(("zzz-absent", bigram[0])))
    for q in cases:
        exp, total = oracle.search(q, 50)
        _assert_rank_identical(s.search(q, 50), exp, total)


def test_match_all(built):
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    exp, total = oracle.search(MatchAllDocsQuery(), 20)
    _assert_rank_identical(s.search(MatchAllDocsQuery(), 20), exp, total)


def _force_wand(monkeypatch):
    """Disable every adaptive engage guard so the pruned body runs on
    test-sized corpora (threshold, UB-spread, k-gate, bail-out)."""
    import lucene_go_ray.search.searcher as searcher_mod

    monkeypatch.setattr(searcher_mod, "WAND_MIN_POSTINGS", 0)
    monkeypatch.setattr(searcher_mod, "WAND_TERM_MIN_POSTINGS", 0)
    monkeypatch.setattr(searcher_mod, "WAND_AND_MIN_POSTINGS", 0)
    monkeypatch.setattr(searcher_mod, "WAND_MIN_UB_SPREAD", 0.0)
    monkeypatch.setattr(searcher_mod, "WAND_MAX_K", 10**9)
    monkeypatch.setattr(searcher_mod, "WAND_BAIL_FACTOR", 10**9)
    monkeypatch.setattr(searcher_mod, "WAND_AND_MIN_SKIP", 0.0)


def test_pruned_equals_exhaustive(built, monkeypatch):
    """Force the WAND interval body to actually run (the adaptive engage
    guards would otherwise bypass it for test-sized corpora)."""
    _force_wand(monkeypatch)
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    hot = _common_terms(oracle, 50, 10**9)[:3]
    mid = _common_terms(oracle, 5, 30)[:3]
    for t in hot + mid:
        for k in (1, 5, 20):
            a = s.search(TermQuery(t), k, prune=False)
            b = s.search(TermQuery(t), k, prune=True)
            assert a.doc_ids.tolist() == b.doc_ids.tolist()
            assert a.scores.tolist() == b.scores.tolist()
    q = BooleanQuery.build(should=hot + mid)
    a = s.search(q, 10, prune=False)
    b = s.search(q, 10, prune=True)
    assert a.doc_ids.tolist() == b.doc_ids.tolist()
    assert a.scores.tolist() == b.scores.tolist()
    # block-max AND: pure conjunctions take the pruned path too
    and_cases = [
        BooleanQuery.build(must=[hot[0], hot[1]]),
        BooleanQuery.build(must=[hot[0], mid[0]]),
        BooleanQuery.build(must=[hot[0], hot[1], hot[2]]),
        BooleanQuery.build(must=[hot[0], "zzz-absent"]),
    ]
    for q in and_cases:
        for k in (1, 5, 20):
            a = s.search(q, k, prune=False)
            b = s.search(q, k, prune=True)
            assert a.doc_ids.tolist() == b.doc_ids.tolist(), q
            assert a.scores.tolist() == b.scores.tolist(), q
    stats = s.last_prune_stats
    assert stats["mode"] == "and"
    assert stats["blocks_total"] > 0
    assert stats["intervals_visited"] > 0  # the pruned body really ran
    assert stats["blocks_touched"] + stats["blocks_skipped"] == stats["blocks_total"]


def test_sharded_pruned_with_shared_theta(built, monkeypatch):
    """search_sharded(prune=True) with the cross-shard theta accumulator is
    rank-identical to exhaustive search for OR and AND queries."""
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    hot = _common_terms(oracle, 50, 10**9)[:3]
    mid = _common_terms(oracle, 5, 30)[:2]
    queries = [
        TermQuery(hot[0]),
        BooleanQuery.build(should=hot + mid),
        BooleanQuery.build(must=[hot[0], hot[1]]),
    ]
    for q in queries:
        ref = s.search(q, 10)
        for shards in (2, 5):
            got = s.search_sharded(
                q, 10, num_shards=shards, prune=True, wand_min_postings=0
            )
            assert got.doc_ids.tolist() == ref.doc_ids.tolist(), (q, shards)
            assert got.scores.tolist() == ref.scores.tolist(), (q, shards)


def test_pruned_tie_heavy_rank_identical(tmp_path, monkeypatch):
    """Score-tie stress for the pruned path: a corpus where most docs give
    bit-identical BM25 scores (equal freq, equal norm), so interval upper
    bounds equal theta everywhere. The pruned top-k must still return the
    docID-ascending winners among the ties — this is the ub==theta
    early-exit case (an interval bounded at exactly theta may hold a
    smaller-docID doc that outranks the current kth hit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _force_wand(monkeypatch)

    n = 400
    # every doc: "alpha beta" (identical freq/norm => identical scores);
    # sprinkle a few high-tf docs so the heap fills with a HIGHER score
    # first and theta lands exactly on the tie plateau afterwards
    texts = ["alpha beta" for _ in range(n)]
    for d in (37, 251, 389):
        texts[d] = "alpha alpha alpha beta"
    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(src),
    )
    cfg = IndexConfig(
        target_partition_rows=100,
        chunk_docs=96,
        block_size=32,
        hot_term_doc_freq=10**9,
    )
    index_dir = str(tmp_path / "idx")
    build_index([str(src)], index_dir, cfg)
    s = IndexSearcher(index_dir)
    oracle = NaiveEngine(
        texts, StandardAnalyzer(stop_words=cfg.stop_set(), lowercase=cfg.lowercase)
    )
    for q in (
        TermQuery("alpha"),
        BooleanQuery.build(should=["alpha", "beta"]),
    ):
        for k in (1, 5, 10, 50):
            exp, total = oracle.search(q, k)
            a = s.search(q, k, prune=False)
            b = s.search(q, k, prune=True)
            _assert_rank_identical(a, exp, total)
            assert a.doc_ids.tolist() == b.doc_ids.tolist(), (q, k)
            assert a.scores.tolist() == b.scores.tolist(), (q, k)
    assert s.last_prune_stats["intervals_visited"] > 0  # body really ran


def test_lookup_keys(built):
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    t = _common_terms(oracle, 20, 10**9)[0]
    td = s.search(TermQuery(t), 5, with_keys=True)
    # corpus key column is doc_id and input is doc_id-ordered => key == docID
    assert td.keys == td.doc_ids.tolist()


def test_resume_skips_completed_partitions(built, tmp_path):
    index_dir, manifest, oracle, _ = built
    # simulate a crashed build: copy index, delete manifest + one segment
    crash_dir = str(tmp_path / "crash")
    shutil.copytree(index_dir, crash_dir)
    os.remove(os.path.join(crash_dir, "manifest.json"))
    segs = sorted(os.listdir(os.path.join(crash_dir, "segments")))
    victim = os.path.join(crash_dir, "segments", segs[1])
    shutil.rmtree(victim)
    shutil.rmtree(os.path.join(crash_dir, "global"))
    src = manifest.partitions[0]["path"]
    m2 = build_index([src], crash_dir, CFG)
    assert m2.max_doc == manifest.max_doc
    s2 = IndexSearcher(crash_dir)
    t = _common_terms(oracle, 20, 10**9)[0]
    exp, total = oracle.search(TermQuery(t), 10)
    _assert_rank_identical(s2.search(TermQuery(t), 10), exp, total)


def test_multiterm_and_dismax_rank_identical(built):
    """Prefix / term-range / term-in-set expansion, constant-score,
    dismax and docID-range filter vs the exhaustive oracle."""
    from lucene_go_ray.search.query import (
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        DocIdRangeQuery,
        PrefixQuery,
        TermInSetQuery,
        TermRangeQuery,
    )

    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    common = _common_terms(oracle, 20, 400)
    t1, t2 = common[0], common[-1]
    queries = [
        PrefixQuery(t1[:2]),
        TermRangeQuery(t1[:1], t2[:1] + "\U0010ffff"),
        TermInSetQuery((t1, t2, "no-such-term")),
        ConstantScoreQuery(TermQuery(t1), boost=2.5),
        DisjunctionMaxQuery((TermQuery(t1), TermQuery(t2)), tie_breaker=0.3),
        BooleanQuery.build(must=[TermQuery(t1)], filter=[DocIdRangeQuery(50, 300)]),
    ]
    for q in queries:
        td = s.search(q, 15)
        expected, total = oracle.search(q, 15)
        _assert_rank_identical(td, expected, total)


def test_search_after_paging(built):
    """SearchAfter page 2 == slice [k:2k] of a double-size search."""
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    t = _common_terms(oracle, 30, 400)[0]
    q = TermQuery(t)
    full = s.search(q, 20)
    page1 = s.search(q, 10)
    after = (float(page1.scores[-1]), int(page1.doc_ids[-1]))
    page2 = s.search_after(q, after, 10)
    assert page2.doc_ids.tolist() == full.doc_ids[10:20].tolist()
    assert page2.scores.tolist() == full.scores[10:20].tolist()


def test_explain_matches_search_scores(built):
    """explain(query, doc).value == the doc's score in search results."""
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    t1, t2 = _common_terms(oracle, 20, 400)[0], _common_terms(oracle, 20, 400)[-1]
    for q in (TermQuery(t1), BooleanQuery.build(should=[t1, t2])):
        td = s.search(q, 5)
        for d, sc in zip(td.doc_ids, td.scores):
            ex = s.explain(q, int(d))
            assert ex["value"] == sc
    missing = s.explain(TermQuery("no-such-term-xyz"), 0)
    assert missing["value"] == 0.0


def test_merge_resume_skips_completed_buckets(built, tmp_path, monkeypatch):
    """A crashed merge resumes bucket-by-bucket: finished bucket files are
    kept byte-identical, only missing buckets re-run, and the resumed
    index is rank-identical to the oracle."""
    import glob as _glob

    from lucene_go_ray.index.build import build_index as _build
    from lucene_go_ray.index.manifest import load_manifest
    from lucene_go_ray.index.merge import merge_index

    index_dir, manifest, oracle, _ = built
    crash_dir = str(tmp_path / "mcrash")
    shutil.copytree(index_dir, crash_dir)
    shutil.rmtree(os.path.join(crash_dir, "global"))
    m = load_manifest(crash_dir)
    from lucene_go_ray.index import IndexConfig

    cfg = IndexConfig(**{**dict(m.config), "stop_words": tuple(m.config["stop_words"])})

    monkeypatch.setenv("LGR_MERGE_FAIL_BUCKET", "2")
    with pytest.raises(Exception):
        merge_index(crash_dir, m, cfg)
    tmp_postings = os.path.join(crash_dir, "global.tmp", "postings")
    done_before = {
        os.path.basename(p): os.path.getmtime(p)
        for p in _glob.glob(os.path.join(tmp_postings, "bucket-*.parquet"))
    }
    assert os.path.isdir(os.path.join(crash_dir, "global.tmp"))

    monkeypatch.delenv("LGR_MERGE_FAIL_BUCKET")
    m = load_manifest(crash_dir)
    merge_index(crash_dir, m, cfg)
    final_postings = os.path.join(crash_dir, "global", "postings")
    for name, mtime in done_before.items():
        assert os.path.getmtime(os.path.join(final_postings, name)) == mtime

    s2 = IndexSearcher(crash_dir)
    t = _common_terms(oracle, 20, 10**9)[0]
    exp, total = oracle.search(TermQuery(t), 10)
    _assert_rank_identical(s2.search(TermQuery(t), 10), exp, total)


def test_search_sharded_rank_identical(built):
    """Doc-range-sharded parallel evaluation == single-process search."""
    index_dir, _, oracle, _ = built
    s = IndexSearcher(index_dir)
    common = _common_terms(oracle, 20, 400)
    t1, t2 = common[0], common[-1]
    from lucene_go_ray.search.query import PhraseQuery as _PQ

    queries = [
        TermQuery(t1),
        BooleanQuery.build(should=[t1, t2]),
        BooleanQuery.build(must=[t1], must_not=[t2]),
        MatchAllDocsQuery(),
        _PQ((t1, t2)),
    ]
    for q in queries:
        ref = s.search(q, 12)
        for shards in (1, 3, 7):
            got = s.search_sharded(q, 12, num_shards=shards)
            assert got.doc_ids.tolist() == ref.doc_ids.tolist(), (q, shards)
            assert got.scores.tolist() == ref.scores.tolist(), (q, shards)
            assert got.total_hits == ref.total_hits, (q, shards)


def test_term_vectors_roundtrip(tmp_path_factory, sf_dir):
    """Term vectors (FieldType.StoreTermVectors parity): per-doc (term,
    freq, positions) read back from the tvec side table must equal an
    independent per-doc analyzer recount, for the text field and a
    keyword field, across segment boundaries."""
    cfg = IndexConfig(
        target_partition_rows=150,
        keyword_fields=("lang",),
        index_term_vectors=True,
    )
    index_dir = str(tmp_path_factory.mktemp("tvec_idx"))
    src = os.path.join(sf_dir, "documents.parquet")
    build_index([src], index_dir, cfg)
    s = IndexSearcher(index_dir)
    t = pq.read_table(src, columns=["doc_id", "text", "lang"])
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    an = StandardAnalyzer(stop_words=cfg.stop_set(), lowercase=cfg.lowercase)
    for d in (0, 1, 149, 150, 151, len(texts) - 1):  # straddle segments
        tv = s.term_vector(d, field="text")
        # independent recount: analyze one doc in python
        toks = an.analyze_column(pa.array([texts[d]]))
        terms = toks["terms"].to_pylist()
        pos = toks["positions"].tolist()
        exp: dict[str, list[int]] = {}
        for term, p in zip(terms, pos):
            exp.setdefault(term, []).append(p)
        got = {
            term: plist
            for term, plist in zip(
                tv["term"].to_pylist(), tv["positions"].to_pylist()
            )
        }
        assert got == exp, d
        freqs = dict(zip(tv["term"].to_pylist(), tv["freq"].to_pylist()))
        assert freqs == {k: len(v) for k, v in exp.items()}, d
        # terms sorted within the doc
        assert tv["term"].to_pylist() == sorted(exp)
        # keyword field: one verbatim term, freq 1, position 0
        kv = s.term_vector(d, field="lang")
        if langs[d] is None:
            assert kv.num_rows == 0
        else:
            assert kv["term"].to_pylist() == [langs[d]]
            assert kv["freq"].to_pylist() == [1]
            assert kv["positions"].to_pylist() == [[0]]
        # full (all-fields) vector covers both fields
        full = s.term_vector(d)
        assert set(full["field"].to_pylist()) <= {"text", "lang"}
        assert full.num_rows == tv.num_rows + kv.num_rows


def test_pruned_blob_io_skipping(tmp_path, monkeypatch):
    """v7 meta/blob split: block skipping is an I/O-level win, not just a
    decode-level one — the pruned path preads ONLY the visited blocks'
    byte ranges from the bucket .blob side file, while exhaustive reads
    each term row's whole stream region. Coalescing is disabled here so
    bytes_read counts exactly the visited ranges."""
    from lucene_go_ray.index.codec import BlobFile
    from lucene_go_ray.pipelines import corpus

    _force_wand(monkeypatch)
    monkeypatch.setattr(BlobFile, "COALESCE_GAP", 0)
    src = str(tmp_path / "bursty.parquet")
    corpus.synthesize_bursty_corpus(20_000, src)
    index_dir = str(tmp_path / "idx")
    build_index([src], index_dir, IndexConfig())
    q = TermQuery("web")

    def blob_bytes(s):
        return sum(bf.bytes_read for bf in s.postings._bf_cache.values())

    s1 = IndexSearcher(index_dir)
    a = s1.search(q, 10, prune=False)
    read_ex = blob_bytes(s1)
    s2 = IndexSearcher(index_dir)
    b = s2.search(q, 10, prune=True)
    read_pr = blob_bytes(s2)
    assert a.doc_ids.tolist() == b.doc_ids.tolist()
    assert a.scores.tolist() == b.scores.tolist()
    st = s2.last_prune_stats
    assert st is not None and st["blocks_skipped"] > 0
    assert 0 < read_pr < read_ex
    # and the parquet meta rows carry offsets, not stream bytes
    meta_keys = set(s2._term_rows("web")[0])
    assert {"docs_off", "freqs_off", "norms_off", "pos_off", "blob_end"} <= meta_keys


def test_highlight_modes_agree(tmp_path):
    """Both highlighter modes (re-analyze vs offsets-stream) produce the
    SAME fragments, with hits tagged at actual byte offsets (multi-byte
    text included)."""
    import pyarrow as pa

    docs = [
        "alpha béta gamma delta alpha zzz yyy xxx www vvv alpha béta end",
        "nothing relevant here at all",
        "café alpha café",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(
        [src],
        idx,
        IndexConfig(
            target_partition_rows=2, block_size=32, stop_words=(),
            index_offsets=True,
        ),
    )
    s = IndexSearcher(idx)
    for use_offsets in (False, True):
        frags = s.highlight(
            0, ["alpha", "béta"], window=20, use_offsets=use_offsets
        )
        assert frags, use_offsets
        assert "<b>alpha</b>" in frags[0]
        assert "<b>béta</b>" in frags[0]
    assert s.highlight(0, ["alpha"], use_offsets=False) == s.highlight(
        0, ["alpha"], use_offsets=True
    )
    assert s.highlight(1, ["alpha"]) == []
    f2 = s.highlight(2, ["alpha"], window=10)
    assert f2 and "<b>alpha</b>" in f2[0] and "café" in f2[0]
