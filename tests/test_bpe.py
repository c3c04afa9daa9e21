"""Distributed BPE trainer vs a pure-Python sequential oracle — identical
merge tables (left, right, count) with the (count desc, left, right)
tie-break and greedy non-overlapping application."""

import os
import re
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from lucene_go_ray.analysis import GO_WHITESPACE_CHARS
from lucene_go_ray.pipelines import bpe

_SPLIT = "[" + GO_WHITESPACE_CHARS + "]"


def _oracle_merges(sf_dir, num_merges, min_pair_count=2):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    wc: Counter = Counter()
    for s in t["text"].to_pylist():
        wc.update(x.lower() for x in re.split(_SPLIT, s))
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(num_merges):
        pc_: Counter = Counter()
        for w, syms in vocab.items():
            c = wc[w]
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += c
        if not pc_:
            break
        (bl, br), bc = min(
            pc_.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if bc < min_pair_count:
            break
        merges.append((bl, br, bc))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == bl and syms[i + 1] == br:
                    out.append(bl + br)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_train_bpe_matches_sequential_oracle(sf_dir):
    got = bpe.train_bpe(sf_dir, num_merges=15)
    eng = list(
        zip(
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["pair_count"].to_pylist(),
        )
    )
    assert eng == _oracle_merges(sf_dir, 15)
    assert len(eng) == 15
    # later merges build on earlier ones: some merged symbol recurs
    syms = {l + r for l, r, _ in eng}
    assert any(l in syms or r in syms for l, r, _ in eng[1:])


def test_train_bpe_distributed_path_identical(sf_dir):
    """The >driver_word_limit fallback (two Ray passes per merge) and the
    default driver-side loop produce the same merge table bit-for-bit."""
    local = bpe.train_bpe(sf_dir, num_merges=8)
    dist = bpe.train_bpe(sf_dir, num_merges=8, driver_word_limit=0)
    assert local.equals(dist)


def test_greedy_merge_mask_overlap_runs():
    # "aaaa" -> candidates at 0,1,2 -> greedy picks 0 and 2
    cand = np.array([True, True, True])
    assert bpe._greedy_merge_mask(cand).tolist() == [True, False, True]
    # run of 2 -> pick first only; isolated -> picked
    cand = np.array([True, True, False, True])
    assert bpe._greedy_merge_mask(cand).tolist() == [True, False, False, True]
    assert bpe._greedy_merge_mask(np.zeros(3, bool)).sum() == 0


def test_encode_counts_matches_sequential(sf_dir):
    """encode_counts applies the merge table in rank order, greedy per
    merge — per-doc subword counts equal a sequential per-word recompute."""
    import pyarrow.parquet as pq

    m = bpe.train_bpe(sf_dir, num_merges=12)
    ms = list(zip(m["left"].to_pylist(), m["right"].to_pylist()))
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    cache: dict = {}

    def seg_len(word):
        if word not in cache:
            syms = list(word)
            for bl, br in ms:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == bl
                        and syms[i + 1] == br
                    ):
                        out.append(bl + br)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = len(syms)
        return cache[word]

    expect = {
        d: sum(seg_len(x.lower()) for x in re.split(_SPLIT, s))
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    got = bpe.encode_counts(sf_dir, m).to_pandas()
    assert dict(zip(got["doc_id"], got["n_subwords"])) == expect
    # merges compress: fewer subwords than characters, more than tokens
    n_tok = {
        d: len(re.split(_SPLIT, s))
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    assert all(expect[d] >= n_tok[d] for d in expect)
    assert sum(expect.values()) < sum(
        sum(len(x) for x in re.split(_SPLIT, s))
        for s in t["text"].to_pylist()
    )


def test_train_bpe_separator_safe_symbols(tmp_path):
    """Symbols containing U+001F (a non-whitespace control char that
    survives tokenization) must not corrupt pair keys or the recovered
    merge table — pairs are keyed by (left code, right code), never by a
    joined string."""
    import pyarrow as pa

    p = tmp_path / "sep"
    p.mkdir()
    # '\x1f' inside words; repeated so pairs clear min_pair_count
    docs = ["a\x1fb a\x1fb a\x1fb", "a\x1fb xx xx", "xx a\x1fb"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
            }
        ),
        p / "documents.parquet",
    )
    got = bpe.train_bpe(str(p), num_merges=4)
    eng = list(
        zip(
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["pair_count"].to_pylist(),
        )
    )
    assert eng == _oracle_merges(str(p), 4)
    assert all(l != "" for l, _, _ in eng)  # no corrupted empty-left merge
