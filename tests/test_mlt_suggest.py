"""MoreLikeThis + prefix suggest vs brute-force parquet recomputes."""

import math
import os
import re
from collections import Counter

import pyarrow.parquet as pq

from lucene_go_ray.analysis import DEFAULT_STOP_WORDS, GO_WHITESPACE_CHARS
from lucene_go_ray.pipelines import fulltext

_SPLIT = "[" + GO_WHITESPACE_CHARS + "]"


def _toks(text):
    return [
        t
        for t in (x.lower() for x in re.split(_SPLIT, text))
        if t not in DEFAULT_STOP_WORDS
    ]


def test_mlt_interesting_terms_and_hits(sf_dir):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    df: Counter = Counter()
    for s in docs.values():
        df.update(set(_toks(s)))
    N = len(docs)
    src = Counter(_toks(docs[42]))
    scored = sorted(
        (
            (-round(f * math.log(1 + (N - df[w] + 0.5) / (df[w] + 0.5)), 6), w)
            for w, f in src.items()
        )
    )
    terms = [w for _, w in scored[:5]]
    got = fulltext.topk_mlt(sf_dir, 42, n_terms=5, k=10).to_pandas()
    assert len(got) == 10
    # every hit contains at least one selected term; the source doc ranks
    # (it matches all selected terms at max tf)
    hit_ids = set(got["doc_id"])
    for d in hit_ids:
        assert set(_toks(docs[d])) & set(terms)
    assert 42 in hit_ids


def test_suggest_terms_order(sf_dir):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    df: Counter = Counter()
    for s in t["text"].to_pylist():
        df.update(set(_toks(s)))
    expect = sorted(
        ((w, c) for w, c in df.items() if w.startswith("s")),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = fulltext.suggest_terms(sf_dir, "s", k=10).to_pandas()
    assert list(zip(got["term"], got["doc_freq"])) == expect
