"""lucene_go_ray — a Ray-Data-native inverted-index + BM25 search engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference lucene-go engine (/root/reference, geange/lucene-go), expressed
Ray-Data-first:

- tokenize/analyze: stateless vectorized ``map_batches`` over zero-copy
  Arrow batches (``lucene_go_ray.analysis``)
- per-partition segment posting lists: stateful actor-pool indexers
  (``lucene_go_ray.index.build``)
- global inverted index: groupby-term shuffle merge with FOR-compressed
  doc-delta/tf blocks and per-block block-max metadata
  (``lucene_go_ray.index.merge``, ``lucene_go_ray.index.codec``)
- top-k BM25 (k1=1.2, b=0.75) term / boolean / phrase queries with
  block-max WAND pruning (``lucene_go_ray.search``)
- training-data pipeline extras: dedup, similarity search, text stats,
  multimodal plumbing (``lucene_go_ray.pipelines``)

No function in this package calls ``ray.init()`` — the surrounding
driver / test fixture / CLI owns the Ray session.
"""

__version__ = "0.1.0"
