"""Posting payloads (hasPayload prox surface,
/root/reference/core/index/freqproxtermswriterperfield.go:124-218):
the vectorized payload stream must agree per occurrence with a
row-at-a-time oracle over the raw text — including case-folded and
multi-byte tokens, where the payload (raw UTF-8 byte length) is NOT
derivable from the analyzed term."""

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.analysis import GO_WHITESPACE_CLASS
from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.index.payloads import payload_values
from lucene_go_ray.search import IndexSearcher

DOCS = [
    "Alpha beta ALPHA gamma alpha",  # case variants, same byte length
    "béta CAFÉ café naïve beta",  # multi-byte: béta(5B) vs beta(4B)
    "alpha  beta",  # double space -> empty token quirk
    "the and alpha of",  # stopwords dropped from the stream
    "Über ÜBER über beta alpha über",  # Ü is 2 bytes either case
    "",
]
STOPS = ("the", "and", "of")


def _oracle(term: str):
    """{doc_id: [raw byte length per kept occurrence, in order]}"""
    out = {}
    for d, text in enumerate(DOCS):
        vals = []
        for tok in re.split(GO_WHITESPACE_CLASS, text):
            low = tok.lower()
            if low in STOPS:
                continue
            if low == term:
                vals.append(len(tok.encode("utf-8")))
        if vals:
            out[d] = vals
    return out


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("payloads")
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        src,
    )
    idx = str(tmp / "idx")
    build_index(
        [src],
        idx,
        IndexConfig(
            target_partition_rows=2,  # multiple segments
            block_size=32,
            stop_words=STOPS,
            payload_kind="token_bytes",
        ),
    )
    return IndexSearcher(idx)


@pytest.mark.parametrize("term", ["alpha", "beta", "béta", "café", "über"])
def test_term_payloads_match_oracle(built, term):
    exp = _oracle(term)
    max_doc = built.manifest.max_doc
    got = {
        d: v
        for d in range(max_doc)
        if (v := built.term_payloads(term, d))
    }
    assert got == exp


def test_multibyte_not_derivable_from_term(built):
    # béta occurs once (doc 1): 5 bytes, while the analyzed term "béta"
    # would also be 5 — but CAFÉ/café: É is 2 bytes in both cases, so
    # every occurrence is 5 bytes; über row has 5-byte tokens for a
    # 5-byte term. The case-shape check: doc 0 'alpha' x3 all 5 bytes.
    assert built.term_payloads("café", 1) == [5, 5]
    assert built.term_payloads("alpha", 0) == [5, 5, 5]


def test_empty_token_quirk(built):
    # "alpha  beta" (doc 2) emits an empty token between the two spaces;
    # its payload is 0 bytes and it is a posting of term ""
    assert built.term_payloads("", 2) == [0]


def test_absent_doc_and_absent_stream(built, tmp_path):
    assert built.term_payloads("alpha", 5) == []  # empty doc
    src = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0]), "text": pa.array(["x"])}), src
    )
    idx = str(tmp_path / "noidx")
    build_index([src], idx, IndexConfig(target_partition_rows=2))
    s = IndexSearcher(idx)
    with pytest.raises(FileNotFoundError):
        s.term_payloads("x", 0)


def test_unknown_payload_kind_raises():
    with pytest.raises(ValueError, match="unknown payload_kind"):
        payload_values("nope", {})


def test_payload_stats_pipeline(built, tmp_path_factory):
    """payload_stats streams the side tables and must agree with the
    per-occurrence oracle's digests."""
    from lucene_go_ray.pipelines.fulltext import payload_stats

    tmp = tmp_path_factory.mktemp("payload_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        str(tmp / "documents.parquet"),
    )
    cfg = IndexConfig(
        target_partition_rows=2,
        block_size=32,
        stop_words=STOPS,
        payload_kind="token_bytes",
    )
    df = payload_stats(str(tmp), "alpha", cfg=cfg).to_pandas()
    exp = _oracle("alpha")
    got = {
        int(r.doc_id): (int(r.freq), int(r.sum_payload),
                        int(r.min_payload), int(r.max_payload))
        for r in df.itertuples()
    }
    assert got == {
        d: (len(v), sum(v), min(v), max(v)) for d, v in exp.items()
    }
