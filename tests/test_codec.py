"""FOR codec round-trips (reference test model: packed-ints round-trips,
core/util/packed/blockpacked_test.go)."""

import numpy as np
import pytest

from lucene_go_ray.index.codec import (
    bitpack,
    bitunpack,
    block_metadata,
    decode_docs_freqs_norms,
    decode_positions,
    encode_postings,
)


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 20, 31, 40])
def test_bitpack_roundtrip(width):
    rng = np.random.default_rng(42 + width)
    n = 1000
    vals = rng.integers(0, 2**width if width else 1, size=n, dtype=np.uint64)
    assert np.array_equal(bitunpack(bitpack(vals, width), width, n), vals)


def _random_postings(rng, n_docs, max_doc, max_freq=7):
    docs = np.sort(rng.choice(max_doc, size=n_docs, replace=False)).astype(np.int64)
    freqs = rng.integers(1, max_freq + 1, size=n_docs).astype(np.int64)
    norms8 = rng.integers(0, 256, size=n_docs).astype(np.uint8)
    pos = []
    for f in freqs:
        pos.append(np.sort(rng.choice(10_000, size=f, replace=False)))
    positions = np.concatenate(pos).astype(np.int64)
    return docs, freqs, norms8, positions


@pytest.mark.parametrize("n_docs", [1, 127, 128, 129, 1000])
def test_postings_roundtrip(n_docs):
    rng = np.random.default_rng(7 + n_docs)
    docs, freqs, norms8, positions = _random_postings(rng, n_docs, 1_000_000)
    blob = encode_postings(docs, freqs, norms8, positions)
    row = blob.to_row()
    d, f, n8 = decode_docs_freqs_norms(row)
    assert np.array_equal(d, docs)
    assert np.array_equal(f, freqs)
    assert np.array_equal(n8, norms8)
    p = decode_positions(row, f)
    assert np.array_equal(p, positions)


def test_block_metadata_bounds():
    rng = np.random.default_rng(3)
    docs, freqs, norms8, positions = _random_postings(rng, 1000, 1_000_000)
    row = encode_postings(docs, freqs, norms8, positions).to_row()
    last, maxf, minn = block_metadata(row)
    assert last[-1] == docs[-1]
    for b in range(len(last)):
        lo, hi = b * 128, min((b + 1) * 128, len(docs))
        assert maxf[b] == freqs[lo:hi].max()
        assert minn[b] == norms8[lo:hi].min()
        assert last[b] == docs[hi - 1]


def test_doc_zero_first():
    docs = np.array([0, 5], dtype=np.int64)
    freqs = np.array([1, 2], dtype=np.int64)
    norms8 = np.array([3, 4], dtype=np.uint8)
    row = encode_postings(docs, freqs, norms8, None).to_row()
    d, f, _ = decode_docs_freqs_norms(row)
    assert d.tolist() == [0, 5]


def test_batch_encode_matches_single_and_roundtrips():
    from lucene_go_ray.index.codec import (
        decode_positions_many,
        decode_postings_many,
        encode_postings_many,
    )

    rng = np.random.default_rng(0)
    T = 120
    all_docs, all_freqs, all_norms, all_pos, offs = [], [], [], [], [0]
    for _ in range(T):
        n = int(rng.integers(1, 300))
        docs = np.sort(rng.choice(50000, size=n, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 9, size=n).astype(np.int64)
        norms = rng.integers(0, 256, size=n).astype(np.uint8)
        pos = np.concatenate(
            [np.sort(rng.choice(5000, size=int(f), replace=False)) for f in freqs]
        ).astype(np.int64)
        all_docs.append(docs)
        all_freqs.append(freqs)
        all_norms.append(norms)
        all_pos.append(pos)
        offs.append(offs[-1] + n)
    docs = np.concatenate(all_docs)
    freqs = np.concatenate(all_freqs)
    norms = np.concatenate(all_norms)
    pos = np.concatenate(all_pos)
    offs = np.array(offs, dtype=np.int64)

    enc = encode_postings_many(docs, freqs, norms, offs, pos)
    # byte-identical to the single-term encoder on sampled terms
    for t in range(0, T, 17):
        lo, hi = offs[t], offs[t + 1]
        ps = int(freqs[:lo].sum())
        pe = ps + int(freqs[lo:hi].sum())
        row = encode_postings(
            docs[lo:hi], freqs[lo:hi], norms[lo:hi], pos[ps:pe]
        ).to_row()
        for k, v in row.items():
            got = enc[k][t]
            got = int(got) if hasattr(got, "item") else got
            assert got == v, (t, k)
    # batch round-trip
    d2, f2, n2, off2 = decode_postings_many(
        enc["doc_freq"],
        enc["docs_blob"],
        enc["doc_widths"],
        enc["freqs_blob"],
        enc["freq_widths"],
        enc["norms_blob"],
    )
    assert np.array_equal(off2, offs)
    assert np.array_equal(d2, docs)
    assert np.array_equal(f2, freqs)
    assert np.array_equal(n2, norms)
    p2 = decode_positions_many(enc["pos_blob"], enc["pos_width"], f2, off2)
    assert np.array_equal(p2, pos)
    # row-wise decoder reads batch-encoded rows
    for t in range(0, T, 29):
        row = {k: enc[k][t] for k in enc}
        dd, ff, _ = decode_docs_freqs_norms(row)
        lo, hi = offs[t], offs[t + 1]
        assert np.array_equal(dd, docs[lo:hi])
        assert np.array_equal(ff, freqs[lo:hi])


def test_decode_row_blocks_matches_full_decode():
    """Selective (lazy WAND) block decode == slices of the full decode."""
    import numpy as np

    from lucene_go_ray.index.codec import (
        decode_docs_freqs_norms,
        decode_row_blocks,
        encode_postings,
    )

    rng = np.random.default_rng(11)
    docs = np.unique(rng.integers(0, 300_000, 9000)).astype(np.int64)
    freqs = rng.integers(1, 200, len(docs)).astype(np.int64)
    norms8 = rng.integers(0, 256, len(docs)).astype(np.uint8)
    row = encode_postings(docs, freqs, norms8, None, block=128).to_row()
    row["doc_freq"] = len(docs)
    fd, ff, fn = decode_docs_freqs_norms(row, 128)
    assert (fd == docs).all() and (ff == freqs).all() and (fn == norms8).all()
    nb = (len(docs) + 127) // 128
    for sel in ([0], [nb - 1], [2, 5, 6], [0, nb - 1], list(range(nb))):
        d2, f2, n2, cnts = decode_row_blocks(row, np.array(sel), 128)
        idx = np.concatenate(
            [np.arange(b * 128, min(len(docs), (b + 1) * 128)) for b in sorted(set(sel))]
        )
        assert (d2 == docs[idx]).all()
        assert (f2 == freqs[idx]).all()
        assert (n2 == norms8[idx]).all()
        assert cnts.sum() == len(idx)


def test_codec_registry_roundtrip():
    """The named-codec SPI (reference codecs/simpletext/codec.go registers
    "SimpleText" by name; readers resolve the name from segment metadata).
    The built-in format resolves, an unknown name fails loudly, and the
    name recorded in a manifest round-trips through IndexConfig."""
    from lucene_go_ray.index.codec import (
        PostingsCodec,
        encode_postings_many,
        get_codec,
        register_codec,
    )
    from lucene_go_ray.index.config import IndexConfig

    c = get_codec("for128")
    assert c.encode_postings_many is encode_postings_many

    with pytest.raises(KeyError, match="unknown postings codec"):
        get_codec("no-such-codec")

    # config default carries the name; manifest dict round-trip keeps it
    cfg = IndexConfig()
    assert cfg.codec_name == "for128"
    from dataclasses import asdict

    assert IndexConfig.from_dict(asdict(cfg)).codec_name == "for128"
    # manifests written before the registry existed (no codec_name key)
    # resolve to the built-in format
    d = asdict(cfg)
    d.pop("codec_name")
    assert IndexConfig.from_dict(d).codec_name == "for128"

    # third-party registration round-trips by name
    register_codec(
        PostingsCodec(
            name="test-alt",
            encode_postings_many=encode_postings_many,
            decode_postings_many=c.decode_postings_many,
            decode_positions_many=c.decode_positions_many,
            decode_docs_freqs_norms=c.decode_docs_freqs_norms,
            decode_row_blocks=c.decode_row_blocks,
            decode_positions=c.decode_positions,
            block_metadata=c.block_metadata,
        )
    )
    assert get_codec("test-alt").name == "test-alt"
