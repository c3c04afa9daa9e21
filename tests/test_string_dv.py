"""String/binary doc-values (SORTED / SORTED_SET / BINARY — the reference
dv reader's remaining types, codecs/simpletext/docvaluesreader.go:129,326):
sort-by-string parity vs a python oracle, SORTED_SET (list<string>) facet
counts, and BINARY per-doc payload roundtrip."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index.build import build_index
from lucene_go_ray.index.config import IndexConfig
from lucene_go_ray.search import (
    DvFacetCountsCollectorManager,
    IndexSearcher,
    SortField,
    TermQuery,
    TopFieldCollectorManager,
)

TAGS = [["alpha"], ["alpha", "beta"], ["beta"], [], ["gamma", "alpha"]]


@pytest.fixture(scope="module")
def sdv_index(tmp_path_factory):
    root = tmp_path_factory.mktemp("sdv")
    n = 60
    rows = {
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(
            [f"common token{i % 7} filler" for i in range(n)], pa.string()
        ),
        "label": pa.array(
            [None if i % 13 == 0 else f"lab{(i * 7) % 11:02d}" for i in range(n)],
            pa.string(),
        ),
        "tags": pa.array([TAGS[i % len(TAGS)] for i in range(n)],
                         pa.list_(pa.string())),
        "blob": pa.array(
            [None if i % 9 == 0 else bytes([i % 251, 7, i % 5]) for i in range(n)],
            pa.binary(),
        ),
    }
    src = os.path.join(root, "docs.parquet")
    pq.write_table(pa.table(rows), src)
    d = os.path.join(root, "idx")
    cfg = IndexConfig(
        target_partition_rows=17,
        hot_term_doc_freq=10**9,
        string_docvalue_fields=("label", "tags", "blob"),
    )
    build_index([src], d, cfg)
    return d, rows


def test_sort_by_string_dv(sdv_index):
    d, rows = sdv_index
    s = IndexSearcher(d)
    labels = rows["label"].to_pylist()
    for reverse in (False, True):
        t = s.search_with_collector_sharded(
            TermQuery("common"),
            TopFieldCollectorManager([SortField("label", reverse=reverse)], 15),
            num_shards=4,
        )
        # python oracle: (missing last, value asc/desc, docID asc)
        key = sorted(
            range(len(labels)),
            key=lambda i: (
                labels[i] is None,
                (
                    tuple(-b for b in labels[i].encode())
                    if reverse and labels[i] is not None
                    else (labels[i] or "")
                ),
                i,
            ),
        )[:15]
        assert t["doc_id"].to_pylist() == key
        assert t["label"].to_pylist() == [labels[i] for i in key]


def test_sorted_set_facet_counts(sdv_index):
    d, rows = sdv_index
    s = IndexSearcher(d)
    t = s.search_with_collector_sharded(
        TermQuery("common"), DvFacetCountsCollectorManager("tags", 10)
    )
    tags = rows["tags"].to_pylist()
    expect: dict = {}
    for lst in tags:
        for v in set(lst):
            expect[v] = expect.get(v, 0) + 1
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(t["value"].to_pylist(), t["cnt"].to_pylist())) == top


def test_string_dv_facet_equals_postings_facet():
    """On the gate corpus the dv facet path and the postings facet path
    return the identical table."""
    from lucene_go_ray.pipelines import fulltext

    sf = "/root/testdata/sf0.001"
    a = fulltext.facet_counts(sf, "spark", "lang", 10)
    b = fulltext.facet_counts(sf, "spark", "lang", 10, use_dv=True)
    assert a.equals(b)


def test_binary_dv_roundtrip(sdv_index):
    d, rows = sdv_index
    s = IndexSearcher(d)
    docs = np.arange(len(rows["blob"]), dtype=np.int64)
    vals, valid = s.sdv_values(docs, "blob")
    blobs = rows["blob"].to_pylist()
    for i, b in enumerate(blobs):
        if b is None:
            assert not valid[i]
        else:
            assert valid[i] and vals[i] == b
