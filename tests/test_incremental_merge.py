"""Incremental (tiered) merge: fold only the delta segments' buckets into
the existing global index (index/merge.py:incremental_merge_index;
MergePolicy contract /root/reference/core/index/mergepolicy.go:134-334).

Checks: (1) search parity — the folded index returns exactly the same
docIDs, scores, and term stats as a FULL build over the combined corpus;
(2) locality — buckets with no delta terms are hardlinked, never
rewritten; (3) crash-resume — an injected per-bucket failure leaves a
resumable tmp dir and re-entry completes without redoing finished
buckets; (4) the size-tiered plan_merge policy."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index.build import add_documents, build_index
from lucene_go_ray.index.config import IndexConfig
from lucene_go_ray.index.manifest import load_manifest
from lucene_go_ray.index.merge import (
    incremental_merge_index,
    plan_merge,
)
from lucene_go_ray.search import IndexSearcher, TermQuery
from lucene_go_ray.search.query import BooleanQuery, PhraseQuery

CFG = IndexConfig(target_partition_rows=120, hot_term_doc_freq=10**9)


def _write_docs(path: str, rows: list[tuple[int, str]]):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("incmerge")
    src = os.path.join(root, "base.parquet")
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    pq.write_table(docs, src)
    delta = os.path.join(root, "delta.parquet")
    # small vocabulary on purpose: the fold should touch ONLY the buckets
    # these terms (plus a handful of shared words) hash to
    _write_docs(
        delta,
        [
            (10_000 + i, f"zqfold delta document number{i % 3} zqfold")
            for i in range(40)
        ],
    )
    base_dir = os.path.join(root, "baseidx")
    build_index([src], base_dir, CFG)
    return str(src), str(delta), str(base_dir), str(root)


def _inodes(gdir: str) -> dict:
    out = {}
    for sub in ("postings", "revdict"):
        d = os.path.join(gdir, sub)
        for f in os.listdir(d):
            if f.startswith("bucket-"):
                out[f"{sub}/{f}"] = os.stat(os.path.join(d, f)).st_ino
    return out


def test_incremental_fold_parity_and_locality(corpus, tmp_path):
    src, delta, base_dir, root = corpus
    d = str(tmp_path / "inc")
    shutil.copytree(base_dir, d)
    before = _inodes(os.path.join(d, "global"))

    m = add_documents(d, [delta], merge="incremental")
    assert m.merged

    # --- locality: untouched buckets are the SAME inode (hardlink) ---
    after = _inodes(os.path.join(d, "global"))
    assert set(after) >= set(before)
    same = [f for f in before if after.get(f) == before[f]]
    changed = [f for f in before if after.get(f) != before[f]]
    # the tiny delta vocabulary must leave most buckets untouched
    assert len(same) > len(changed) > 0

    # --- parity: identical to a FULL build over the combined corpus ---
    full_dir = str(tmp_path / "full")
    build_index([src, delta], full_dir, CFG)
    si, sf = IndexSearcher(d), IndexSearcher(full_dir)
    assert si.stats["doc_count"] == sf.stats["doc_count"]
    assert si.stats["sum_total_term_freq"] == sf.stats["sum_total_term_freq"]
    for q in (
        TermQuery("zqfold"),
        TermQuery("number1"),
        TermQuery("spark"),
        BooleanQuery.build(must=["delta", "document"]),
        BooleanQuery.build(should=["zqfold", "spark"]),
        PhraseQuery(["delta", "document"]),
    ):
        ti, tf = si.search(q, 50), sf.search(q, 50)
        assert ti.doc_ids.tolist() == tf.doc_ids.tolist(), q
        assert ti.scores.tolist() == pytest.approx(
            tf.scores.tolist(), rel=1e-12
        )
        assert ti.total_hits == tf.total_hits
    for t in ("zqfold", "delta", "spark", "number2"):
        assert si.term_statistics(t) == sf.term_statistics(t), t

    # --- CheckIndex holds on the folded index (incl. the blob
    # row-order-contiguity invariant: fold re-lays regions in merged
    # row order) ---
    from lucene_go_ray.index.check import check_index

    rep = check_index(d)
    assert rep["ok"], rep["problems"]

    # --- folding the same index again is a no-op (no new pids) ---
    m2 = incremental_merge_index(
        d, load_manifest(d), IndexConfig.from_dict(m.config)
    )
    assert m2.merged


def test_incremental_resume_after_bucket_crash(corpus, tmp_path):
    src, delta, base_dir, root = corpus
    d = str(tmp_path / "crash")
    shutil.copytree(base_dir, d)
    os.environ["LGR_INC_FAIL_BUCKET"] = "0"  # every touched bucket fails
    try:
        with pytest.raises(Exception):
            add_documents(d, [delta], merge="incremental")
    finally:
        del os.environ["LGR_INC_FAIL_BUCKET"]
    # segments committed, fold staged: tmp dir with the epoch marker kept
    assert os.path.isdir(os.path.join(d, "global.inc"))
    assert os.path.exists(os.path.join(d, "global.inc", "inc_epoch.json"))
    m = load_manifest(d)
    assert not m.merged
    # re-entry resumes the SAME epoch and completes
    m = incremental_merge_index(d, m, IndexConfig.from_dict(m.config))
    assert m.merged and not os.path.isdir(os.path.join(d, "global.inc"))
    s = IndexSearcher(d)
    assert s.count(TermQuery("zqfold")) == 40

    full_dir = str(tmp_path / "full2")
    build_index([src, delta], full_dir, CFG)
    sf = IndexSearcher(full_dir)
    ti, tf = s.search(TermQuery("zqfold"), 50), sf.search(TermQuery("zqfold"), 50)
    assert ti.doc_ids.tolist() == tf.doc_ids.tolist()
    assert ti.scores.tolist() == pytest.approx(tf.scores.tolist(), rel=1e-12)


def test_plan_merge_tiers(corpus, tmp_path):
    src, delta, base_dir, root = corpus
    d = str(tmp_path / "plan")
    shutil.copytree(base_dir, d)
    m = load_manifest(d)
    cfg = IndexConfig.from_dict(m.config)
    assert plan_merge(d, m, cfg) == "incremental"
    # growth past tiered_growth_ratio forces a full re-merge
    gpath = os.path.join(d, "global", "stats.json")
    with open(gpath) as f:
        stats = json.load(f)
    stats["full_merge_doc_count"] = max(1, m.doc_count // 4)
    with open(gpath, "w") as f:
        json.dump(stats, f)
    assert plan_merge(d, m, cfg) == "full"
    # pre-lineage index (no merged_pids): full
    stats.pop("merged_pids")
    stats["full_merge_doc_count"] = m.doc_count
    with open(gpath, "w") as f:
        json.dump(stats, f)
    assert plan_merge(d, m, cfg) == "full"


def test_incremental_fold_with_salted_hot_terms(corpus, tmp_path):
    """Delta rows for a term that is HOT in the base epoch must fold into
    the salted (term, salt) groups queries probe — the fold reuses the
    base hot set, and new pids map to new (or shared) salt groups."""
    src, delta, base_dir, root = corpus
    d = str(tmp_path / "hot")
    # base with a tiny hot threshold so common terms get salted
    cfg = IndexConfig(
        target_partition_rows=120, hot_term_doc_freq=50,
        salt_group_partitions=2,
    )
    build_index([src], d, cfg)
    with open(os.path.join(d, "global", "stats.json")) as f:
        assert json.load(f)["hot_terms"], "test needs a non-empty hot set"
    add_documents(d, [delta], merge="incremental")
    full_dir = str(tmp_path / "hotfull")
    build_index([src, delta], full_dir, cfg)
    si, sf = IndexSearcher(d), IndexSearcher(full_dir)
    for t in ("spark", "zqfold", "delta", "number0"):
        assert si.term_statistics(t) == sf.term_statistics(t), t
        ti, tf = si.search(TermQuery(t), 60), sf.search(TermQuery(t), 60)
        assert ti.doc_ids.tolist() == tf.doc_ids.tolist(), t
        assert ti.scores.tolist() == pytest.approx(
            tf.scores.tolist(), rel=1e-12
        )


def test_incremental_fold_preserves_tombstones(corpus, tmp_path):
    """Tombstones written before an incremental fold keep filtering hits
    after it (liveDocs are an overlay; the fold never touches them)."""
    from lucene_go_ray.index.deletes import delete_by_query

    src, delta, base_dir, root = corpus
    d = str(tmp_path / "del")
    shutil.copytree(base_dir, d)
    s0 = IndexSearcher(d)
    victim = int(s0.search(TermQuery("spark"), 1).doc_ids[0])
    n_del = delete_by_query(d, TermQuery("spark"))
    assert n_del > 0
    add_documents(d, [delta], merge="incremental")
    s = IndexSearcher(d)
    assert s.count(TermQuery("spark")) == 0
    assert victim not in s.search(TermQuery("zqfold"), 60).doc_ids.tolist()
    assert s.count(TermQuery("zqfold")) == 40


def test_double_incremental_fold(corpus, tmp_path):
    """Two successive folds: the second continues chunk_id sequences on
    groups the FIRST fold already extended, and stays parity-exact with
    one full build over all three corpora."""
    src, delta, base_dir, root = corpus
    delta2 = os.path.join(str(tmp_path), "delta2.parquet")
    _write_docs(
        delta2,
        [(20_000 + i, f"zqfold again wave2 token{i % 2}") for i in range(30)],
    )
    d = str(tmp_path / "twice")
    shutil.copytree(base_dir, d)
    add_documents(d, [delta], merge="incremental")
    add_documents(d, [delta2], merge="incremental")
    full_dir = str(tmp_path / "full3")
    build_index([src, delta, delta2], full_dir, CFG)
    si, sf = IndexSearcher(d), IndexSearcher(full_dir)
    for t in ("zqfold", "wave2", "token1", "delta", "spark"):
        assert si.term_statistics(t) == sf.term_statistics(t), t
        ti, tf = si.search(TermQuery(t), 100), sf.search(TermQuery(t), 100)
        assert ti.doc_ids.tolist() == tf.doc_ids.tolist(), t
        assert ti.scores.tolist() == pytest.approx(
            tf.scores.tolist(), rel=1e-12
        )
    from lucene_go_ray.index.check import check_index

    rep = check_index(d)
    assert rep["ok"], rep["problems"]


def test_dv_updates_survive_incremental_fold(tmp_path):
    """Numeric dv-update overlays (generation files, applied at dv load)
    keep applying after an incremental fold — the fold touches postings
    buckets only, never docmaps or overlay files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_go_ray.index.dv_updates import update_numeric_docvalues
    from lucene_go_ray.search.collector import (
        SortField,
        TopFieldCollectorManager,
    )

    n = 80
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(
                    [f"word{i % 5} shared" for i in range(n)], pa.string()
                ),
                "score_dv": pa.array([i * 10 for i in range(n)], pa.int64()),
            }
        ),
        src,
    )
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        target_partition_rows=30,
        hot_term_doc_freq=10**9,
        docvalue_fields=("score_dv",),
    )
    build_index([src], d, cfg)
    update_numeric_docvalues(d, "score_dv", np.array([3]), np.array([99999]))
    delta = str(tmp_path / "delta.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([900, 901], pa.int64()),
                "text": pa.array(["shared fresh", "shared fresh"], pa.string()),
                "score_dv": pa.array([1, 2], pa.int64()),
            }
        ),
        delta,
    )
    add_documents(d, [delta], merge="incremental")
    s = IndexSearcher(d)
    t = s.search_with_collector_sharded(
        TermQuery("shared"),
        TopFieldCollectorManager([SortField("score_dv", reverse=True)], 1),
    )
    # the overlaid value (99999 on doc 3) still wins the sort post-fold
    assert t["doc_id"].to_pylist() == [3]
    assert t["score_dv"].to_pylist() == [99999]
