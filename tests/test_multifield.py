"""Multi-field indexing, numeric doc-values ranges, tombstone deletes and
incremental add/update — round-2 surfaces checked against independently
computed expectations (raw pandas over the source table + the NaiveEngine
text oracle)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.analysis import StandardAnalyzer
from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.index.build import add_documents, update_documents
from lucene_go_ray.index.deletes import delete_by_term, load_deleted
from lucene_go_ray.search import (
    BooleanQuery,
    IndexSearcher,
    NumericRangeQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_go_ray.search.scorer import BM25Scorer

from .naive_oracle import NaiveEngine

CFG = IndexConfig(
    target_partition_rows=100,
    chunk_docs=96,
    block_size=32,
    hot_term_doc_freq=80,  # lang=en is hot => exercises keyword salting
    salt_group_partitions=2,
    keyword_fields=("lang", "source"),
    docvalue_fields=("n_chars", "doc_id"),
)


@pytest.fixture(scope="module")
def mf(tmp_path_factory, sf_dir):
    index_dir = str(tmp_path_factory.mktemp("mfidx"))
    src = os.path.join(sf_dir, "documents.parquet")
    manifest = build_index([src], index_dir, CFG)
    raw = pq.read_table(src).to_pandas()
    oracle = NaiveEngine(
        raw["text"].tolist(),
        StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase),
    )
    return index_dir, manifest, raw, oracle


def _text_term(oracle, lo=20, hi=200):
    return sorted(
        t for t, pl in oracle.postings.items() if lo <= len(pl) <= hi and t
    )[0]


def test_keyword_term_statistics(mf):
    index_dir, _, raw, _ = mf
    s = IndexSearcher(index_dir)
    for fld in ("lang", "source"):
        for val, cnt in raw[fld].value_counts().items():
            assert s.term_statistics(str(val), fld=fld) == (cnt, cnt), (fld, val)
    assert s.term_statistics("zz", fld="lang") == (0, 0)
    assert s.term_statistics("en", fld="nosuchfield") == (0, 0)


def test_per_field_collection_stats(mf):
    index_dir, manifest, raw, _ = mf
    for fld in ("lang", "source"):
        n = int(raw[fld].notna().sum())
        fs = manifest.field_stats[fld]
        assert fs == {
            "doc_count": n,
            "sum_total_term_freq": n,
            "sum_doc_freq": n,
        }
    s = IndexSearcher(index_dir)
    assert s.scorer_for("lang").doc_count == int(raw["lang"].notna().sum())
    assert s.scorer_for("lang").avgdl == 1.0


def test_keyword_topk_scores_and_ties(mf):
    """All matches of one keyword term score identically (freq=1, norm=1,
    per-field stats) and rank by docID asc."""
    index_dir, _, raw, _ = mf
    s = IndexSearcher(index_dir)
    val = raw["lang"].value_counts().index[-1]  # least common value
    expect_docs = raw.index[raw["lang"] == val].tolist()
    df = len(expect_docs)
    sc = BM25Scorer(int(raw["lang"].notna().sum()), int(raw["lang"].notna().sum()),
                    k1=CFG.k1, b=CFG.b)
    w = sc.weight(df)
    expected_score = float(
        sc.score(w, np.array([1.0]), np.array([1], dtype=np.int64))[0]
    )
    td = s.search(TermQuery(str(val), field="lang"), 10)
    assert td.total_hits == df
    assert td.doc_ids.tolist() == expect_docs[:10]
    assert all(x == expected_score for x in td.scores.tolist())


def test_mixed_field_boolean(mf):
    """text MUST + lang FILTER == oracle text scores restricted to the
    lang doc set (scores from GLOBAL text stats, untouched by the filter)."""
    index_dir, _, raw, oracle = mf
    s = IndexSearcher(index_dir)
    t = _text_term(oracle)
    val = str(raw["lang"].value_counts().index[0])
    lang_docs = set(raw.index[raw["lang"] == val].tolist())
    q = BooleanQuery.build(
        must=[TermQuery(t)], filter=[TermQuery(val, field="lang")]
    )
    ranked, _ = oracle.search(TermQuery(t), len(raw))
    exp = [(d, sc) for d, sc in ranked if d in lang_docs][:10]
    td = s.search(q, 10)
    assert td.doc_ids.tolist() == [d for d, _ in exp]
    assert td.scores.tolist() == pytest.approx([sc for _, sc in exp], rel=1e-12)


def test_keyword_prefix_expansion(mf):
    index_dir, _, raw, _ = mf
    s = IndexSearcher(index_dir)
    td = s.search(PrefixQuery("", field="lang"), len(raw))
    assert td.total_hits == int(raw["lang"].notna().sum())
    terms = s.postings.expand_terms("lang", "", "\U0010ffff")
    assert terms == sorted(raw["lang"].dropna().unique().tolist())


def test_numeric_range_filter(mf):
    index_dir, _, raw, oracle = mf
    s = IndexSearcher(index_dir)
    lo, hi = int(raw["n_chars"].quantile(0.25)), int(raw["n_chars"].quantile(0.75))
    in_range = set(
        raw.index[(raw["n_chars"] >= lo) & (raw["n_chars"] <= hi)].tolist()
    )
    t = _text_term(oracle)
    q = BooleanQuery.build(
        must=[TermQuery(t)], filter=[NumericRangeQuery("n_chars", lo, hi)]
    )
    ranked, _ = oracle.search(TermQuery(t), len(raw))
    exp = [(d, sc) for d, sc in ranked if d in in_range][:10]
    td = s.search(q, 10)
    assert td.doc_ids.tolist() == [d for d, _ in exp]
    assert td.scores.tolist() == pytest.approx([sc for _, sc in exp], rel=1e-12)
    # empty + full ranges
    assert s.count(NumericRangeQuery("n_chars", 10**9, 2 * 10**9)) == 0
    assert s.count(NumericRangeQuery("n_chars", 0, 10**9)) == len(raw)


def test_numeric_in_set(mf):
    """PointInSetQuery analogue: doc-values membership with zone-map
    segment pruning, vs a raw-pandas expectation."""
    from lucene_go_ray.search import NumericInSetQuery

    index_dir, _, raw, oracle = mf
    s = IndexSearcher(index_dir)
    values = tuple(sorted(raw["n_chars"].dropna().unique()[:5].tolist()))
    exp = sorted(raw.index[raw["n_chars"].isin(values)].tolist())
    td = s.search(NumericInSetQuery("n_chars", values), len(raw))
    assert td.doc_ids.tolist() == exp
    # empty set / disjoint set
    assert s.count(NumericInSetQuery("n_chars", ())) == 0
    assert s.count(NumericInSetQuery("n_chars", (10**9, 10**9 + 5))) == 0
    # as a FILTER on a scored term (constant-score filter never rescores)
    t = _text_term(oracle)
    ranked, _ = oracle.search(TermQuery(t), len(raw))
    in_set = set(exp)
    expected = [(d, sc) for d, sc in ranked if d in in_set][:10]
    q = BooleanQuery.build(
        must=[TermQuery(t)], filter=[NumericInSetQuery("n_chars", values)]
    )
    td = s.search(q, 10)
    assert td.doc_ids.tolist() == [d for d, _ in expected]
    assert td.scores.tolist() == pytest.approx(
        [sc for _, sc in expected], rel=1e-12
    )


def test_numeric_box(mf):
    """2-D box (lat/lon analogue): combined zone-map pruning over two
    doc-values dims, vs raw pandas."""
    from lucene_go_ray.search import NumericBoxQuery

    index_dir, _, raw, _ = mf
    s = IndexSearcher(index_dir)
    lo_x, hi_x = int(raw["n_chars"].quantile(0.3)), int(raw["n_chars"].quantile(0.8))
    lo_y, hi_y = 10, int(len(raw) * 0.6)
    exp = sorted(
        raw.index[
            (raw["n_chars"] >= lo_x)
            & (raw["n_chars"] <= hi_x)
            & (raw.index >= lo_y)
            & (raw.index <= hi_y)
        ].tolist()
    )
    q = NumericBoxQuery("n_chars", lo_x, hi_x, "doc_id", lo_y, hi_y)
    td = s.search(q, len(raw))
    assert td.doc_ids.tolist() == exp
    # a box whose y-range misses every zone prunes all segments
    assert s.count(NumericBoxQuery("n_chars", lo_x, hi_x, "doc_id", 10**9, 2 * 10**9)) == 0


def test_wildcard_and_fuzzy_expansion(mf):
    """WildcardQuery / FuzzyQuery dictionary expansion vs a python-side
    recomputation over the oracle's full vocabulary."""
    import re

    from lucene_go_ray.search import FuzzyQuery, WildcardQuery
    from lucene_go_ray.search.searcher import _within_edits

    index_dir, _, raw, oracle = mf
    s = IndexSearcher(index_dir)
    vocab = sorted(t for t in oracle.postings if t)
    base = _text_term(oracle)
    # wildcard: first char + '*' + last char, plus a '?' variant
    for pattern in (base[0] + "*" + base[-1], base[0] + "?" + base[2:], "*" + base[-2:]):
        rx = re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern)
        )
        exp_terms = [t for t in vocab if rx.fullmatch(t)]
        exp_docs = sorted({d for t in exp_terms for d in oracle.postings.get(t, {})})
        td = s.search(WildcardQuery(pattern), len(raw))
        assert td.doc_ids.tolist() == exp_docs, pattern
        assert all(sc == 1.0 for sc in td.scores.tolist())
    # fuzzy: every vocab term within 1 edit of base (prefix 1), and edits=2
    for edits, plen in ((1, 1), (2, 0)):
        exp_terms = [
            t
            for t in vocab
            if t[:plen] == base[:plen] and _within_edits(base, t, edits)
        ]
        exp_docs = sorted({d for t in exp_terms for d in oracle.postings.get(t, {})})
        td = s.search(FuzzyQuery(base, edits, plen), len(raw))
        assert td.doc_ids.tolist() == exp_docs, (edits, plen)
    # levenshtein helper sanity
    assert _within_edits("spark", "spark", 0)
    assert _within_edits("spark", "spork", 1)
    assert not _within_edits("spark", "spoon", 2)
    assert _within_edits("spark", "park", 1)


def test_regexp_expansion(mf):
    """RegexpQuery dictionary expansion vs a python-side recomputation
    over the oracle's full vocabulary (full-match semantics, constant
    score — Lucene RegExp anchors both ends)."""
    import re

    from lucene_go_ray.search import RegexpQuery

    index_dir, _, raw, oracle = mf
    s = IndexSearcher(index_dir)
    vocab = sorted(t for t in oracle.postings if t)
    base = _text_term(oracle)
    # literal-prefix pattern, a class pattern, and a no-prefix alternation
    patterns = (
        base[0] + "[a-z]+",
        re.escape(base),
        f"({re.escape(base)}|{re.escape(vocab[0])})",
    )
    for pattern in patterns:
        rx = re.compile(pattern, re.DOTALL)
        exp_terms = [t for t in vocab if rx.fullmatch(t)]
        exp_docs = sorted({d for t in exp_terms for d in oracle.postings.get(t, {})})
        td = s.search(RegexpQuery(pattern), len(raw))
        assert td.doc_ids.tolist() == exp_docs, pattern
        assert all(sc == 1.0 for sc in td.scores.tolist())
    # substring (unanchored) patterns must NOT match: full-match only
    assert s.count(RegexpQuery(base[1:-1])) == 0 or base[1:-1] in vocab


def test_regexp_nonprefix_factor_pruning(mf):
    """A regexp with NO literal prefix must not fullmatch the whole
    vocabulary: the mandatory literal factor (here the inner run of
    '[a-z]*<mid>[a-z]*') prunes candidates vectorized BEFORE the Python
    loop (automatontermsenum.go intent via _regexp_literals +
    _factor_prune), and the hit set still matches brute force."""
    import re

    from lucene_go_ray.search import RegexpQuery

    index_dir, _, raw, oracle = mf
    s = IndexSearcher(index_dir)
    vocab = sorted(t for t in oracle.postings if t)
    base = _text_term(oracle)
    mid = base[1:-1]  # inner factor, not a prefix
    pattern = f"[a-z]*{re.escape(mid)}[a-z]*"
    rx = re.compile(pattern, re.DOTALL)
    exp_terms = [t for t in vocab if rx.fullmatch(t)]
    exp_docs = sorted({d for t in exp_terms for d in oracle.postings.get(t, {})})
    td = s.search(RegexpQuery(pattern), len(raw))
    assert td.doc_ids.tolist() == exp_docs
    st = s.last_expand_stats
    assert st["path"] == "scan+factor"
    n_contain = sum(1 for t in vocab if mid in t)
    assert st["candidates"] == n_contain
    assert st["candidates"] < len(vocab) / 2, (st, len(vocab))


def test_numeric_range_sharded(mf):
    index_dir, _, raw, oracle = mf
    s = IndexSearcher(index_dir)
    lo, hi = int(raw["n_chars"].quantile(0.4)), int(raw["n_chars"].quantile(0.9))
    t = _text_term(oracle)
    q = BooleanQuery.build(
        must=[TermQuery(t)], filter=[NumericRangeQuery("n_chars", lo, hi)]
    )
    ref = s.search(q, 12)
    got = s.search_sharded(q, 12, num_shards=3)
    assert got.doc_ids.tolist() == ref.doc_ids.tolist()
    assert got.scores.tolist() == ref.scores.tolist()


@pytest.fixture()
def del_index(mf, tmp_path):
    """A private copy of the multi-field index for destructive tests."""
    index_dir, _, raw, oracle = mf
    d = str(tmp_path / "delidx")
    shutil.copytree(index_dir, d)
    return d, raw, oracle


def test_delete_by_keyword_term(del_index):
    d, raw, oracle = del_index
    val = str(raw["lang"].value_counts().index[-1])
    gone = set(raw.index[raw["lang"] == val].tolist())
    n = delete_by_term(d, val, fld="lang")
    assert n == len(gone)
    assert delete_by_term(d, val, fld="lang") == 0  # idempotent
    s = IndexSearcher(d)
    t = _text_term(oracle)
    # scores keep using FULL (pre-delete) stats — liveDocs semantics
    ranked, total = oracle.search(TermQuery(t), len(raw))
    exp = [(doc, sc) for doc, sc in ranked if doc not in gone]
    td = s.search(TermQuery(t), 10)
    assert td.doc_ids.tolist() == [doc for doc, _ in exp[:10]]
    assert td.scores.tolist() == pytest.approx([sc for _, sc in exp[:10]], rel=1e-12)
    assert s.count(TermQuery(t)) == len(exp)
    assert s.count(TermQuery(val, field="lang")) == 0


def test_deletes_survive_remerge(del_index):
    from lucene_go_ray.index.manifest import load_manifest
    from lucene_go_ray.index.merge import merge_index

    d, raw, oracle = del_index
    val = str(raw["lang"].value_counts().index[-1])
    delete_by_term(d, val, fld="lang")
    before = load_deleted(d)
    shutil.rmtree(os.path.join(d, "global"))
    m = load_manifest(d)
    cfgd = dict(m.config)
    for k in ("stop_words", "keyword_fields", "docvalue_fields"):
        cfgd[k] = tuple(cfgd.get(k, ()))
    merge_index(d, m, IndexConfig(**cfgd))
    after = load_deleted(d)
    assert np.array_equal(before, after)
    s = IndexSearcher(d)
    assert s.count(TermQuery(val, field="lang")) == 0


def test_expunge_deletes(del_index):
    """expungeDeletes (indexwriter.go:399-422 delete GC): after compaction
    the overlay is consumed, collection/field stats exclude the deleted
    docs, scores re-rank under the REFRESHED stats, docIDs stay stable,
    and dense paths (match-all) still exclude the dead docs via the
    per-segment liveDocs file."""
    from lucene_go_ray.index.compact import expunge_deletes, segment_dead_ords
    from lucene_go_ray.index.manifest import load_manifest
    from lucene_go_ray.search import MatchAllDocsQuery

    d, raw, oracle = del_index
    val = str(raw["lang"].value_counts().index[-1])
    gone = set(raw.index[raw["lang"] == val].tolist())
    delete_by_term(d, val, fld="lang")
    m0 = load_manifest(d)
    res = expunge_deletes(d)
    assert res["docs_expunged"] == len(gone)
    assert res["tombstones_left"] == 0
    assert load_deleted(d).size == 0  # overlay consumed into segment .liv
    # post-expunge oracle: the same corpus with deleted docs' text blanked
    # (positional docIDs preserved — stats genuinely exclude the dead docs)
    texts = [None if i in gone else t for i, t in enumerate(raw["text"].tolist())]
    an = StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase)
    oracle2 = NaiveEngine(texts, an)
    m1 = load_manifest(d)
    assert m1.max_doc == m0.max_doc  # docID space never shrinks
    assert m1.doc_count == oracle2.doc_count < m0.doc_count
    assert m1.sum_total_term_freq == oracle2.sum_ttf
    # per-field stats refreshed: the deleted lang value is gone
    assert m1.field_stats["lang"]["doc_count"] == int(
        (raw["lang"].notna() & ~raw.index.isin(list(gone))).sum()
    )
    s = IndexSearcher(d)
    t = _text_term(oracle)
    exp, total = oracle2.search(TermQuery(t), 10)
    td = s.search(TermQuery(t), 10)
    assert td.doc_ids.tolist() == [doc for doc, _ in exp]
    assert td.scores.tolist() == pytest.approx([sc for _, sc in exp], rel=1e-12)
    assert td.total_hits == total
    assert s.count(TermQuery(val, field="lang")) == 0
    # dense evaluation paths exclude the dead docs via segment liveDocs
    assert s.count(MatchAllDocsQuery()) == len(raw) - len(gone)
    # the consumed tombstones moved into the touched segments' dead files
    n_dead = sum(
        len(segment_dead_ords(d, int(p["pid"]))) for p in m1.partitions
    )
    assert n_dead == len(gone)
    # idempotent: nothing pending => no rewrites
    assert expunge_deletes(d)["partitions_rewritten"] == 0
    # a second delete+expunge round composes with the first (prior dead
    # ords are preserved in the rewritten segments)
    val2 = str(raw["lang"].value_counts().index[-2])
    gone2 = set(raw.index[raw["lang"] == val2].tolist())
    delete_by_term(d, val2, fld="lang")
    res2 = expunge_deletes(d)
    assert res2["docs_expunged"] == len(gone2)
    s2 = IndexSearcher(d)
    assert s2.count(TermQuery(val, field="lang")) == 0
    assert s2.count(TermQuery(val2, field="lang")) == 0
    assert s2.count(MatchAllDocsQuery()) == len(raw) - len(gone) - len(gone2)
    m2 = load_manifest(d)
    texts2 = [
        None if (i in gone or i in gone2) else t
        for i, t in enumerate(raw["text"].tolist())
    ]
    assert m2.doc_count == NaiveEngine(texts2, an).doc_count


def test_gc_index(del_index):
    """Orphan GC (indexfiledeleter.go surface): each crash-leftover class is
    planted, the sweep removes exactly those, live state stays searchable,
    and an unfinished merge's tmp dir (resume asset) is preserved."""
    from lucene_go_ray.index.compact import gc_index
    from lucene_go_ray.index.manifest import load_manifest

    d, raw, oracle = del_index
    # plant every orphan class
    os.makedirs(os.path.join(d, "global.old", "postings"), exist_ok=True)
    open(os.path.join(d, "global.old", "stats.json"), "w").write("{}")
    os.makedirs(os.path.join(d, "global.tmp"), exist_ok=True)
    os.makedirs(os.path.join(d, "segments", ".tmp-p=00099-1234"), exist_ok=True)
    os.makedirs(os.path.join(d, "segments", "p=00000.old-777"), exist_ok=True)
    os.makedirs(os.path.join(d, "deletes"), exist_ok=True)
    open(os.path.join(d, "deletes", ".del-dead.parquet.tmp"), "w").write("x")
    res = gc_index(d)
    assert sorted(res["removed"]) == [
        "deletes/.del-dead.parquet.tmp",
        "global.old",
        "global.tmp",
        "segments/.tmp-p=00099-1234",
        "segments/p=00000.old-777",
    ]
    # live state untouched and searchable
    t = _text_term(oracle)
    exp, total = oracle.search(TermQuery(t), 10)
    td = IndexSearcher(d).search(TermQuery(t), 10)
    assert td.doc_ids.tolist() == [doc for doc, _ in exp]
    # an unfinished merge (manifest.merged False) keeps its tmp dir
    m = load_manifest(d)
    m.merged = False
    from lucene_go_ray.index.manifest import save_manifest

    save_manifest(d, m)
    os.makedirs(os.path.join(d, "global.tmp"), exist_ok=True)
    res2 = gc_index(d)
    assert "global.tmp" not in res2["removed"]
    assert os.path.isdir(os.path.join(d, "global.tmp"))


def _write_extra_docs(path: str, start_id: int, texts: list[str]):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(start_id, start_id + n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["xx"] * n),
                "source": pa.array(["appended"] * n),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        path,
    )


def test_add_documents(del_index, tmp_path):
    d, raw, _ = del_index
    texts = [f"appended fresh document number {i} searchterm" for i in range(25)]
    extra = str(tmp_path / "extra.parquet")
    _write_extra_docs(extra, 10_000, texts)
    m2 = add_documents(d, [extra])
    assert m2.max_doc == len(raw) + 25
    s = IndexSearcher(d)
    # new docs searchable, docIDs appended after all old docs
    td = s.search(TermQuery("searchterm"), 30)
    assert td.total_hits == 25
    assert td.doc_ids.min() >= len(raw)
    # combined-corpus oracle: stats now include the appended docs
    an = StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase)
    oracle2 = NaiveEngine(raw["text"].tolist() + texts, an)
    t = _text_term(oracle2)
    exp, total = oracle2.search(TermQuery(t), 10)
    td = s.search(TermQuery(t), 10)
    assert td.doc_ids.tolist() == [doc for doc, _ in exp]
    assert td.scores.tolist() == pytest.approx([sc for _, sc in exp], rel=1e-12)
    assert td.total_hits == total
    # appended keyword values are indexed too
    assert s.count(TermQuery("appended", field="source")) == 25


def test_update_documents(del_index, tmp_path):
    """UpdateDocument semantics: tombstone matches, append replacements;
    stats include BOTH old (tombstoned) and new docs until rebuild."""
    d, raw, _ = del_index
    val = str(raw["lang"].value_counts().index[-1])
    gone = set(raw.index[raw["lang"] == val].tolist())
    texts = [f"replacement doc {i} for {val}" for i in range(len(gone))]
    extra = str(tmp_path / "upd.parquet")
    _write_extra_docs(extra, 20_000, texts)
    update_documents(d, TermQuery(val, field="lang"), [extra])
    s = IndexSearcher(d)
    assert s.count(TermQuery(val, field="lang")) == 0
    assert s.count(TermQuery("replacement")) == len(gone)
    an = StandardAnalyzer(stop_words=CFG.stop_set(), lowercase=CFG.lowercase)
    oracle2 = NaiveEngine(raw["text"].tolist() + texts, an)
    t = _text_term(oracle2)
    ranked, _ = oracle2.search(TermQuery(t), len(raw) + len(texts))
    exp = [(doc, sc) for doc, sc in ranked if doc not in gone][:10]
    td = s.search(TermQuery(t), 10)
    assert td.doc_ids.tolist() == [doc for doc, _ in exp]
    assert td.scores.tolist() == pytest.approx([sc for _, sc in exp], rel=1e-12)


def test_offsets_roundtrip(tmp_path, sf_dir):
    """index_offsets=True stores the per-occurrence byte-offset stream;
    retrieved offsets are exactly the analyzer's quirk-faithful offsets
    (slow/fast counters incl. the +1-per-delimiter drift)."""
    src = os.path.join(sf_dir, "documents.parquet")
    cfg = IndexConfig(
        target_partition_rows=100, index_offsets=True, hot_term_doc_freq=10**9
    )
    index_dir = str(tmp_path / "offidx")
    build_index([src], index_dir, cfg)
    s = IndexSearcher(index_dir)
    raw = pq.read_table(src, columns=["doc_id", "text"]).to_pandas()
    an = StandardAnalyzer(stop_words=cfg.stop_set(), lowercase=cfg.lowercase)
    checked = 0
    for d in range(0, len(raw), 37):
        doc = an.analyze(raw["text"][d])
        if not doc.terms:
            continue
        term = doc.terms[len(doc.terms) // 2]
        sel = [j for j, t in enumerate(doc.terms) if t == term]
        starts, ends = s.term_offsets(term, int(raw["doc_id"][d]))
        assert starts == [int(doc.starts[j]) for j in sel], (d, term)
        assert ends == [int(doc.ends[j]) for j in sel], (d, term)
        checked += 1
    assert checked > 5
    # absent term / absent stream behavior
    assert s.term_offsets("zz-absent-term", int(raw["doc_id"][0])) == ([], [])


def test_document_retrieval(mf):
    """reader.Document parity: full stored row for sampled global docIDs,
    straight from the source parquet via the manifest lineage."""
    index_dir, _, raw, _ = mf
    s = IndexSearcher(index_dir)
    for d in (0, 123, 250, 499):
        doc = s.document(d)
        assert doc["doc_id"] == int(raw["doc_id"][d])
        assert doc["text"] == raw["text"][d]
        assert doc["lang"] == raw["lang"][d]
    partial = s.document(42, columns=["lang", "n_chars"])
    assert set(partial) == {"lang", "n_chars"}
    with pytest.raises(IndexError):
        s.document(10**9)


def test_nrt_unmerged_reader_rank_identical(tmp_path, sf_dir, mf):
    """NRT reader (IndexWriter.GetReader surface): an UN-merged commit is
    searchable directly over segments and rank-identical to the merged
    index — term, boolean, phrase, prefix, keyword-field and stats."""
    from lucene_go_ray.search import PhraseQuery

    index_dir, _, raw, oracle = mf
    merged = IndexSearcher(index_dir)
    nrt_dir = str(tmp_path / "nrtidx")
    src = os.path.join(sf_dir, "documents.parquet")
    build_index([src], nrt_dir, CFG, merge=False)
    s = IndexSearcher(nrt_dir)
    assert s.nrt
    band = sorted(
        t for t, pl in oracle.postings.items() if 20 <= len(pl) <= 1000 and t
    )
    t1, t2 = band[0], band[-1]
    val = str(raw["lang"].value_counts().index[-1])
    queries = [
        TermQuery(t1),
        BooleanQuery.build(should=[t1, t2]),
        BooleanQuery.build(must=[t1], must_not=[t2]),
        PhraseQuery((t1, t2)),
        PrefixQuery(t1[:2]),
        TermQuery(val, field="lang"),
        BooleanQuery.build(
            must=[TermQuery(t1)], filter=[NumericRangeQuery("n_chars", 100, 400)]
        ),
    ]
    for q in queries:
        a = merged.search(q, 15)
        b = s.search(q, 15)
        assert a.doc_ids.tolist() == b.doc_ids.tolist(), q
        assert a.scores.tolist() == b.scores.tolist(), q
        assert a.total_hits == b.total_hits, q
    assert s.term_statistics(t1) == merged.term_statistics(t1)
    assert s.term_statistics(val, fld="lang") == merged.term_statistics(
        val, fld="lang"
    )
    assert s.expand_terms("lang", "", "\U0010ffff") == merged.expand_terms(
        "lang", "", "\U0010ffff"
    )


def test_classic_similarity_rank(tmp_path, sf_dir):
    """Pluggable Similarity registry: an index searched under
    similarity='classic' scores by TF-IDF (independent recompute), while
    the same postings under 'bm25' keep the golden semantics."""
    import math

    src = os.path.join(sf_dir, "documents.parquet")
    cfg = IndexConfig(target_partition_rows=200, similarity="classic")
    index_dir = str(tmp_path / "clidx")
    build_index([src], index_dir, cfg)
    s = IndexSearcher(index_dir)
    raw = pq.read_table(src, columns=["doc_id", "text"]).to_pandas()
    an = StandardAnalyzer(stop_words=cfg.stop_set(), lowercase=cfg.lowercase)
    # independent recompute for one mid-df term
    from collections import Counter

    docs = {}
    doc_count = 0
    for i, t in zip(raw["doc_id"], raw["text"]):
        terms = an.analyze(t).terms
        if terms:
            doc_count += 1
        docs[int(i)] = Counter(terms)
    term = sorted(
        t
        for t in {w for c in docs.values() for w in c}
        if 20 <= sum(1 for c in docs.values() if t in c) <= 200 and t
    )[0]
    df = sum(1 for c in docs.values() if term in c)
    idf2 = (1.0 + math.log(doc_count / (df + 1.0))) ** 2
    expected = []
    for i, c in docs.items():
        if term in c:
            length = sum(c.values()) & 0xFF
            expected.append(
                (i, idf2 * math.sqrt(c[term]) / math.sqrt(max(length, 1)))
            )
    expected.sort(key=lambda x: (-x[1], x[0]))
    td = s.search(TermQuery(term), 10)
    assert td.doc_ids.tolist() == [i for i, _ in expected[:10]]
    assert td.scores.tolist() == pytest.approx(
        [sc for _, sc in expected[:10]], rel=1e-12
    )


def test_field_exists_query(tmp_path):
    """FieldExistsQuery (DocValuesFieldExistsQuery semantics): docs with
    nulls in keyword / doc-values columns are excluded."""
    from lucene_go_ray.search import FieldExistsQuery

    n = 120
    langs = [None if i % 3 == 0 else ("en" if i % 2 else "fr") for i in range(n)]
    nchars = [None if i % 5 == 0 else 100 + i for i in range(n)]
    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array([f"alpha doc number {i}" for i in range(n)]),
                "lang": pa.array(langs, type=pa.string()),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array(nchars, type=pa.int64()),
            }
        ),
        str(src),
    )
    index_dir = str(tmp_path / "idx")
    build_index([str(src)], index_dir, CFG)
    s = IndexSearcher(index_dir)
    have_lang = [i for i in range(n) if langs[i] is not None]
    have_nc = [i for i in range(n) if nchars[i] is not None]
    td = s.search(FieldExistsQuery("lang"), n)
    assert td.doc_ids.tolist() == have_lang
    td = s.search(FieldExistsQuery("n_chars"), n)
    assert td.doc_ids.tolist() == have_nc
    # as a FILTER on a scored text query
    q = BooleanQuery.build(
        must=[TermQuery("alpha")], filter=[FieldExistsQuery("lang")]
    )
    td = s.search(q, n)
    assert td.doc_ids.tolist() == have_lang  # all docs match 'alpha'
    assert s.count(FieldExistsQuery("nosuchfield")) == 0
