"""Synthetic corpus: determinism + the per-url byte-identical extraction
invariant (north rule; input_hint's ``extract(html) == text`` contract)."""

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_go_ray.pipelines import corpus


def test_extract_text_inverts_wrapper():
    texts = [
        "hello world",
        "",
        "multi\nline\ttext and  runs",
        "日本語 テキスト 😀 éé",
        "embedded </body></html> suffix inside",
        "<html><body>embedded prefix",
    ]
    html = pa.array(
        [(corpus.HTML_PREFIX + t + corpus.HTML_SUFFIX).encode() for t in texts],
        type=pa.binary(),
    )
    assert corpus.extract_text(html).to_pylist() == texts


def test_corpus_deterministic_and_invariant(tmp_path):
    d1 = tmp_path / "c1"
    d2 = tmp_path / "c2"
    p1 = corpus.synthesize_corpus(500, str(d1), seed=7)
    p2 = corpus.synthesize_corpus(500, str(d2), seed=7)
    t1 = pq.read_table(p1[0])
    t2 = pq.read_table(p2[0])
    assert t1.equals(t2)  # byte-stable regeneration
    assert t1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    # distributed invariant check over the Ray pipeline
    assert corpus.check_extraction_invariant(p1) == 500


def test_invariant_check_catches_corruption(tmp_path):
    paths = corpus.synthesize_corpus(50, str(tmp_path / "c"), seed=7)
    t = pq.read_table(paths[0])
    bad_text = t["text"].to_pylist()
    bad_text[3] = bad_text[3] + " CORRUPTED"
    t = t.set_column(
        t.schema.get_field_index("text"),
        "text",
        pa.array(bad_text, type=pa.large_string()),
    )
    pq.write_table(t, paths[0])
    import pytest
    import ray.exceptions

    with pytest.raises(Exception):
        corpus.check_extraction_invariant(paths)


def test_sort_corpus_index_sorting(tmp_path, sf_dir):
    """Index-sorting pre-pass: docIDs of an index built over the sorted
    corpus follow the sort key (IndexSorter semantics, Dataset-first)."""
    import os

    import pyarrow.parquet as pq

    from lucene_go_ray.index import IndexConfig, build_index
    from lucene_go_ray.pipelines.corpus import sort_corpus
    from lucene_go_ray.search import IndexSearcher

    src = os.path.join(sf_dir, "documents.parquet")
    out = str(tmp_path / "sorted")
    paths = sort_corpus([src], out, by="n_chars")
    assert len(paths) >= 1
    vals = []
    for p in paths:
        vals.extend(pq.read_table(p, columns=["n_chars"])["n_chars"].to_pylist())
    assert vals == sorted(vals)  # global order across shard files
    index_dir = str(tmp_path / "idx")
    build_index(paths, index_dir, IndexConfig(target_partition_rows=200))
    s = IndexSearcher(index_dir)
    n = s.manifest.max_doc
    assert n == len(vals)
    # docID order == sort-key order: sample docs via stored-field retrieval
    sampled = [s.document(d, columns=["n_chars"])["n_chars"] for d in range(0, n, 97)]
    assert sampled == sorted(sampled)
