"""Second registered postings format (VByte) — the codec SPI is a real
plug-in slot: an index built with ``codec_name="vbyte128"`` flows through
the SAME build / merge / search machinery and is rank-identical to the
default ``for128`` format (the reference's named-codec resolution,
codecs/simpletext/codec.go)."""

import os

import numpy as np
import pytest

from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.index import codec as c
from lucene_go_ray.index import codec_vbyte as vb
from lucene_go_ray.search import BooleanQuery, IndexSearcher, PhraseQuery, TermQuery


def test_vbyte_kernel_roundtrip():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(0, 2**50, 5000).astype(np.uint64),
            np.zeros(10, np.uint64),
            np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**63], np.uint64),
        ]
    )
    buf, nb = vb.vbyte_encode(vals)
    assert int(nb.sum()) == len(buf)
    assert np.array_equal(vb.vbyte_decode(buf), vals)
    # empty stream
    b2, n2 = vb.vbyte_encode(np.zeros(0, np.uint64))
    assert len(b2) == 0 and len(vb.vbyte_decode(b2)) == 0


@pytest.fixture(scope="module")
def rand_postings():
    rng = np.random.default_rng(11)
    T = 40
    counts = rng.integers(1, 400, T)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    docs = np.concatenate(
        [np.sort(rng.choice(100000, cnt, replace=False)) for cnt in counts]
    ).astype(np.int64)
    freqs = rng.integers(1, 300, offsets[-1]).astype(np.int64)
    norms = rng.integers(0, 256, offsets[-1]).astype(np.uint8)
    pos = np.concatenate(
        [np.sort(rng.choice(5000, f, replace=False)) for f in freqs]
    ).astype(np.int64)
    return docs, freqs, norms, offsets, pos


def test_vbyte_encode_matches_for128_metadata_and_roundtrips(rand_postings):
    docs, freqs, norms, offsets, pos = rand_postings
    e1 = c.encode_postings_many(docs, freqs, norms, offsets, pos)
    e2 = vb.encode_postings_many(docs, freqs, norms, offsets, pos)
    # stats + block-max metadata are format-independent and must agree
    for k in ("doc_freq", "total_term_freq", "first_doc", "last_doc"):
        assert np.array_equal(e1[k], e2[k]), k
    for k in ("block_last", "block_max_freq", "block_min_norm", "norms_blob"):
        assert e1[k] == e2[k], k
    d_docs, d_freqs, d_norms, d_off = vb.decode_postings_many(
        e2["doc_freq"],
        e2["docs_blob"],
        e2["doc_widths"],
        e2["freqs_blob"],
        e2["freq_widths"],
        e2["norms_blob"],
    )
    assert np.array_equal(d_docs, docs)
    assert np.array_equal(d_freqs, freqs)
    assert np.array_equal(d_norms, norms)
    assert np.array_equal(
        vb.decode_positions_many(e2["pos_blob"], e2["pos_width"], d_freqs, d_off),
        pos,
    )


def test_vbyte_row_decode_and_selective_blocks(rand_postings):
    docs, freqs, norms, offsets, pos = rand_postings
    e1 = c.encode_postings_many(docs, freqs, norms, offsets, pos)
    e2 = vb.encode_postings_many(docs, freqs, norms, offsets, pos)
    ti = 3
    row = {k: v[ti] for k, v in e2.items()}
    row1 = {k: v[ti] for k, v in e1.items()}
    s, e = offsets[ti], offsets[ti + 1]
    rd, rf, rn = vb.decode_docs_freqs_norms(row)
    assert np.array_equal(rd, docs[s:e])
    assert np.array_equal(rf, freqs[s:e])
    assert np.array_equal(np.asarray(rn), norms[s:e])
    pstart = int(freqs[:s].sum())
    pend = pstart + int(freqs[s:e].sum())
    assert np.array_equal(vb.decode_positions(row, rf), pos[pstart:pend])
    nblocks = (int(e - s) + c.BLOCK_SIZE - 1) // c.BLOCK_SIZE
    for bids in ([0], [nblocks - 1], list(range(0, nblocks, 2))):
        a = vb.decode_row_blocks(row, np.array(bids))
        b = c.decode_row_blocks(row1, np.array(bids))
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), bids


# ---------------------------------------------------------------------------
# end-to-end: same corpus, two codecs, identical search results
# ---------------------------------------------------------------------------

_CFG_KW = dict(
    target_partition_rows=100,
    chunk_docs=96,
    block_size=32,
    hot_term_doc_freq=80,
    salt_group_partitions=2,
)


@pytest.fixture(scope="module")
def two_codec_indexes(tmp_path_factory, sf_dir):
    src = os.path.join(sf_dir, "documents.parquet")
    dirs = {}
    for name in ("for128", "vbyte128"):
        d = str(tmp_path_factory.mktemp(f"idx_{name}"))
        build_index([src], d, IndexConfig(codec_name=name, **_CFG_KW))
        dirs[name] = d
    return dirs


def test_vbyte_index_rank_identical(two_codec_indexes):
    a = IndexSearcher(two_codec_indexes["for128"])
    b = IndexSearcher(two_codec_indexes["vbyte128"])
    assert b.cfg.codec_name == "vbyte128"  # persisted through the manifest
    queries = [
        TermQuery("scan"),
        TermQuery("window"),
        BooleanQuery.build(must=["window", "join"]),
        BooleanQuery.build(should=["scan", "merge", "query"]),
        BooleanQuery.build(should=["scan", "merge"], must_not=["window"]),
        PhraseQuery(["window", "join"]),
    ]
    for q in queries:
        ra = a.search(q, 20)
        rb = b.search(q, 20)
        assert ra.doc_ids.tolist() == rb.doc_ids.tolist(), q
        assert ra.scores.tolist() == rb.scores.tolist(), q
        assert ra.total_hits == rb.total_hits, q


def test_vbyte_pruned_equals_exhaustive(two_codec_indexes, monkeypatch):
    """The block-max WAND path decodes vbyte blocks selectively and stays
    rank-identical (decode_row_blocks / block_metadata via the registry)."""
    import lucene_go_ray.search.searcher as sm

    monkeypatch.setattr(sm, "WAND_MIN_POSTINGS", 0)
    monkeypatch.setattr(sm, "WAND_TERM_MIN_POSTINGS", 0)
    monkeypatch.setattr(sm, "WAND_AND_MIN_POSTINGS", 0)
    monkeypatch.setattr(sm, "WAND_MIN_UB_SPREAD", 0.0)
    monkeypatch.setattr(sm, "WAND_MAX_K", 10**9)
    monkeypatch.setattr(sm, "WAND_BAIL_FACTOR", 10**9)
    monkeypatch.setattr(sm, "WAND_AND_MIN_SKIP", 0.0)
    s = IndexSearcher(two_codec_indexes["vbyte128"])
    for q in (
        TermQuery("scan"),
        BooleanQuery.build(should=["scan", "merge", "query"]),
        BooleanQuery.build(must=["window", "join"]),
    ):
        for k in (1, 5, 20):
            ex = s.search(q, k, prune=False)
            pr = s.search(q, k, prune=True)
            assert ex.doc_ids.tolist() == pr.doc_ids.tolist(), (q, k)
            assert ex.scores.tolist() == pr.scores.tolist(), (q, k)
    stats = s.last_prune_stats
    assert stats["intervals_visited"] > 0  # the pruned body really ran


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=400
    )
)
def test_vbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf, nb = vb.vbyte_encode(arr)
    assert int(nb.sum()) == len(buf)
    assert np.array_equal(vb.vbyte_decode(buf), arr)
    # stream is self-delimiting: exactly len(vals) terminator bytes
    assert int((np.asarray(buf) < 0x80).sum()) == len(vals)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),  # gap to next doc
            st.integers(min_value=1, max_value=300),  # freq
        ),
        min_size=1,
        max_size=500,
    ),
    st.integers(min_value=0, max_value=255),
)
def test_vbyte_postings_roundtrip_property(rows, norm_seed):
    gaps = np.array([g for g, _ in rows], dtype=np.int64)
    docs = np.cumsum(gaps + 1) - 1  # strictly increasing, may start at 0
    freqs = np.array([f for _, f in rows], dtype=np.int64)
    norms = ((docs * 31 + norm_seed) % 256).astype(np.uint8)
    offsets = np.array([0, len(docs)], dtype=np.int64)
    enc = vb.encode_postings_many(docs, freqs, norms, offsets)
    d, f, n, off = vb.decode_postings_many(
        enc["doc_freq"], enc["docs_blob"], enc["doc_widths"],
        enc["freqs_blob"], enc["freq_widths"], enc["norms_blob"],
    )
    assert np.array_equal(d, docs)
    assert np.array_equal(f, freqs)
    assert np.array_equal(n, norms)
    # selective decode of every single block matches slices of the full
    row = {k: v[0] if isinstance(v, list) else v[0] for k, v in enc.items()}
    nblocks = (len(docs) + c.BLOCK_SIZE - 1) // c.BLOCK_SIZE
    for b in range(nblocks):
        dd, ff, nn, cnts = vb.decode_row_blocks(dict(row), np.array([b]))
        lo, hi = b * c.BLOCK_SIZE, min((b + 1) * c.BLOCK_SIZE, len(docs))
        assert np.array_equal(dd, docs[lo:hi]), b
        assert np.array_equal(ff, freqs[lo:hi]), b
        assert np.array_equal(np.asarray(nn), norms[lo:hi]), b
