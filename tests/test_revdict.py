"""Reversed-term dictionary (global/revdict): leading-wildcard expansion
as a suffix seek instead of a full-vocabulary scan.

Checks: rev-path results are identical to a brute-force vocabulary scan,
the reversed path actually engages (last_expand_stats), hit docs match
the equivalent term union, and NRT (unmerged) indexes fall back to the
forward scan with identical results."""

import os

import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.search import IndexSearcher, TermInSetQuery, WildcardQuery

CFG = IndexConfig(
    target_partition_rows=100,
    chunk_docs=96,
    block_size=32,
    merge_buckets=8,
)


@pytest.fixture(scope="module")
def idx(tmp_path_factory, sf_dir):
    index_dir = str(tmp_path_factory.mktemp("revidx"))
    src = os.path.join(sf_dir, "documents.parquet")
    build_index([src], index_dir, CFG)
    s = IndexSearcher(index_dir)
    vocab = s.expand_terms("text", "", "\U0010ffff")
    return s, vocab


def _brute(vocab, pattern):
    import re

    rx = re.compile(
        "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern
        ),
        re.DOTALL,
    )
    return sorted(t for t in vocab if rx.fullmatch(t))


@pytest.mark.parametrize("pattern", ["*er", "*w", "*r?er", "*zzz"])
def test_leading_wildcard_matches_bruteforce(idx, pattern):
    s, vocab = idx
    assert s.revdict is not None
    expanded = s._expand_wildcard("text", pattern)
    assert sorted(expanded) == _brute(vocab, pattern)
    # the literal suffix is longer than the (empty) literal prefix in all
    # these patterns, so the reversed dictionary must serve the seek
    assert s.last_expand_stats["path"] == "rev"


def test_both_ends_wild_scans_forward(idx):
    """`*a*` has no literal text on either end — nothing to seek, full
    forward scan is the only correct plan (as in Lucene)."""
    s, vocab = idx
    assert sorted(s._expand_wildcard("text", "*a*")) == _brute(vocab, "*a*")
    assert s.last_expand_stats["path"] == "fwd"


def test_trailing_wildcard_still_forward(idx):
    s, vocab = idx
    assert sorted(s._expand_wildcard("text", "s*")) == _brute(vocab, "s*")
    assert s.last_expand_stats["path"] == "fwd"


def test_rev_candidates_pruned(idx):
    """The suffix seek must consider fewer candidates than the vocabulary
    (row-group stats can't isolate single terms at this tiny scale, but a
    narrow suffix must beat the full scan the fallback would do)."""
    s, vocab = idx
    s._expand_wildcard("text", "*ery")
    assert s.last_expand_stats["candidates"] <= len(vocab)


def test_hits_equal_term_union(idx):
    s, vocab = idx
    terms = _brute(vocab, "*er")
    assert len(terms) >= 2
    a = s.search(WildcardQuery("*er"), 1000)
    b = s.search(TermInSetQuery(tuple(terms)), 1000)
    assert a.doc_ids.tolist() == b.doc_ids.tolist()
    assert a.scores.tolist() == b.scores.tolist()


def test_nrt_fallback(tmp_path_factory, sf_dir):
    """An unmerged (NRT) commit has no revdict — expansion falls back to
    the per-segment forward scan with identical results."""
    index_dir = str(tmp_path_factory.mktemp("revnrt"))
    src = os.path.join(sf_dir, "documents.parquet")
    build_index([src], index_dir, CFG, merge=False)
    s = IndexSearcher(index_dir)
    assert s.nrt and s.revdict is None
    vocab = s.expand_terms("text", "", "\U0010ffff")
    assert sorted(s._expand_wildcard("text", "*er")) == _brute(vocab, "*er")
    assert s.last_expand_stats["path"] == "fwd"
