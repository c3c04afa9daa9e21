"""User-pluggable Collector / CollectorManager.

The reference surface is ``core/search/collector.go:1`` (Collector /
LeafCollector with per-doc ``Collect(docID)`` callbacks) and the
CollectorManager sharding contract of
``core/search/indexsearcher.go:295-361`` (one collector per leaf slice,
then ``reduce``). Re-expressed for the Ray/numpy execution model:

- ``Collector.collect(docs, scores)`` receives the shard's ENTIRE
  candidate arrays (global docIDs, sorted, live-doc filtered) in one
  vectorized call — the batch analogue of Lucene's per-doc loop. A
  python per-doc callback would be the slowest construct in the engine;
  the array contract keeps custom collectors as fast as the built-ins.
- ``Collector.set_context(searcher)`` runs before collection and gives
  access to doc-values / norms / stored keys — the LeafReaderContext
  analogue. ``finish()`` must drop that reference (collectors travel
  back from Ray workers by pickle).
- ``CollectorManager.new_collector()`` + ``reduce(collectors)`` shard
  exactly as the reference: searcher.search_with_collector() runs one
  collector; search_with_collector_sharded() runs one per disjoint
  docID range as parallel Ray tasks and reduces on the driver.

The built-in top-k / count / paging reducers in searcher.py remain the
fast path; these classes are the extension point for everything else
(facets, histograms, dv aggregates, early-termination experiments).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class Collector:
    """Per-shard collection state. Subclass and override ``collect``."""

    #: set False when scores are not needed — the evaluator then skips
    #: BM25 scoring entirely (ConstantScore semantics), like Lucene's
    #: ScoreMode.COMPLETE_NO_SCORES.
    needs_scores: bool = True

    def set_context(self, searcher) -> None:
        """Called once before collection with the (shard-local) searcher —
        the LeafReaderContext analogue. Default keeps no reference."""

    def collect(self, docs: np.ndarray, scores: np.ndarray | None) -> None:
        """Vectorized collection: ``docs`` are sorted global docIDs (live
        docs only); ``scores`` is aligned float64 or None when
        ``needs_scores`` is False."""
        raise NotImplementedError

    def finish(self) -> None:
        """Called after collection; must drop any searcher reference so
        the collector can be pickled back from a Ray worker."""


class CollectorManager:
    """Factory + reducer over per-shard collectors."""

    def new_collector(self) -> Collector:
        raise NotImplementedError

    def reduce(self, collectors: list[Collector]):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# built-ins
# ---------------------------------------------------------------------------


class TotalHitCountCollector(Collector):
    """Match counting without scoring — totalhitcountcollector.go."""

    needs_scores = False

    def __init__(self) -> None:
        self.total = 0

    def collect(self, docs, scores) -> None:
        self.total += len(docs)


class TotalHitCountCollectorManager(CollectorManager):
    def new_collector(self) -> TotalHitCountCollector:
        return TotalHitCountCollector()

    def reduce(self, collectors) -> int:
        return int(sum(c.total for c in collectors))


class TopDocsCollector(Collector):
    """Top-k by (score desc, docID asc), state bounded to k entries —
    topscoredoccollector.go semantics under the array contract."""

    def __init__(self, k: int) -> None:
        self.k = int(k)
        self.docs = np.empty(0, np.int64)
        self.scores = np.empty(0, np.float64)
        self.total = 0

    def collect(self, docs, scores) -> None:
        self.total += len(docs)
        d = np.concatenate([self.docs, docs])
        s = np.concatenate([self.scores, scores])
        order = np.lexsort((d, -s))[: self.k]
        self.docs, self.scores = d[order], s[order]


class TopDocsCollectorManager(CollectorManager):
    def __init__(self, k: int) -> None:
        self.k = int(k)

    def new_collector(self) -> TopDocsCollector:
        return TopDocsCollector(self.k)

    def reduce(self, collectors):
        from .searcher import TopDocs

        docs = np.concatenate([c.docs for c in collectors])
        scores = np.concatenate([c.scores for c in collectors])
        order = np.lexsort((docs, -scores))[: self.k]
        return TopDocs(
            doc_ids=docs[order],
            scores=scores[order],
            total_hits=int(sum(c.total for c in collectors)),
        )


class SortField:
    """Comparator spec for field-sorted top-K — the SortField surface
    (/root/reference/core/search/sortfield.go, fieldvaluehitqueue.go):
    order by a numeric doc-values field, ascending or ``reverse`` (desc).
    Docs missing the field sort LAST under both orders; the final
    tiebreak is always global docID ascending (shardIndex/doc order of
    topfieldcollector.go)."""

    def __init__(self, field: str, reverse: bool = False) -> None:
        self.field, self.reverse = field, bool(reverse)

    def __repr__(self) -> str:  # pragma: no cover
        return f"SortField({self.field!r}, reverse={self.reverse})"


def _sort_order(docs, per_field, sort_fields):
    """Indices sorting (docs, [(vals, valid)]) by the SortField chain then
    docID asc; missing-last. np.lexsort: LAST key is primary, so emit
    (docs, vkey_n, inv_n, ..., vkey_1, inv_1). String/binary dv columns
    (object dtype) are rank-encoded per sort — the in-memory analogue of
    comparing SORTED dv ordinals (docvaluesreader.go:129): np.unique gives
    each present value its lexicographic rank, which sorts identically to
    the values and negates cleanly for ``reverse``."""
    keys = [docs]
    for sf, (vals, valid) in zip(reversed(sort_fields), reversed(per_field)):
        inv = ~valid
        if vals.dtype == object:
            v = np.zeros(len(vals), np.int64)
            if valid.any():
                _, codes = np.unique(
                    np.asarray(vals[valid], dtype=object), return_inverse=True
                )
                v[valid] = codes
        else:
            v = np.where(valid, vals, 0)
        keys.append(-v if sf.reverse else v)
        keys.append(inv)
    return np.lexsort(tuple(keys))


class TopFieldCollector(Collector):
    """Top-k of the match set ordered by SortField comparators — the
    TopFieldCollector surface (/root/reference/core/search/
    topfieldcollector.go, ~500 LoC of comparator/queue machinery) under
    the vectorized array contract: gather each sort field's doc values
    for the incoming candidate block, merge with the bounded k-entry
    state, keep the k best. No scoring (ScoreMode.COMPLETE_NO_SCORES)."""

    needs_scores = False

    def __init__(self, sort_fields: list[SortField], k: int) -> None:
        self.sort_fields = list(sort_fields)
        self.k = int(k)
        self.docs = np.empty(0, np.int64)
        self.vals = [np.empty(0, np.int64) for _ in self.sort_fields]
        self.valid = [np.empty(0, bool) for _ in self.sort_fields]
        self.total = 0
        self._searcher = None
        # resolved at set_context so reduce() can build the right column
        # TYPE even when zero docs matched (an empty int64 init array must
        # not flip a string-dv column's schema by hit count)
        self.is_string = [False] * len(self.sort_fields)

    def set_context(self, searcher) -> None:
        self._searcher = searcher
        sdv = getattr(searcher, "string_dv_fields", ())
        self.is_string = [sf.field in sdv for sf in self.sort_fields]

    def collect(self, docs, scores) -> None:
        self.total += len(docs)
        d = np.concatenate([self.docs, docs])
        per_field = []
        for i, sf in enumerate(self.sort_fields):
            if sf.field in getattr(self._searcher, "string_dv_fields", ()):
                v, ok = self._searcher.sdv_values(docs, sf.field)
            else:
                v, ok = self._searcher.dv_values(docs, sf.field)
            per_field.append(
                (
                    np.concatenate([self.vals[i], v]),
                    np.concatenate([self.valid[i], ok]),
                )
            )
        order = _sort_order(d, per_field, self.sort_fields)[: self.k]
        self.docs = d[order]
        self.vals = [v[order] for v, _ in per_field]
        self.valid = [ok[order] for _, ok in per_field]

    def finish(self) -> None:
        self._searcher = None


class TopFieldCollectorManager(CollectorManager):
    """Sharded field-sorted top-K; ``reduce`` returns a pyarrow table
    (rank, doc_id, one nullable int64 column per sort field)."""

    def __init__(self, sort_fields: list[SortField], k: int) -> None:
        self.sort_fields = list(sort_fields)
        self.k = int(k)

    def new_collector(self) -> TopFieldCollector:
        return TopFieldCollector(self.sort_fields, self.k)

    def reduce(self, collectors) -> pa.Table:
        docs = np.concatenate([c.docs for c in collectors])
        per_field = [
            (
                np.concatenate([c.vals[i] for c in collectors]),
                np.concatenate([c.valid[i] for c in collectors]),
            )
            for i in range(len(self.sort_fields))
        ]
        order = _sort_order(docs, per_field, self.sort_fields)[: self.k]
        cols: dict[str, pa.Array] = {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(docs[order]),
        }
        is_string = [
            any(c.is_string[i] for c in collectors)
            for i in range(len(self.sort_fields))
        ]
        for i, (sf, (vals, valid)) in enumerate(
            zip(self.sort_fields, per_field)
        ):
            if is_string[i]:
                vlist = [
                    v if ok else None
                    for v, ok in zip(vals[order], valid[order])
                ]
                col = pa.array(vlist)
                if pa.types.is_null(col.type) or len(vlist) == 0:
                    col = col.cast(pa.string())
                cols[sf.field] = col
            else:
                cols[sf.field] = pa.array(
                    vals[order], type=pa.int64(), mask=~valid[order]
                )
        t = pa.table(cols)
        t = t.replace_schema_metadata(
            {b"total_hits": str(sum(c.total for c in collectors)).encode()}
        )
        return t


class NumericHistogramCollector(Collector):
    """Histogram of a doc-values field over the matching docs — the
    custom-Collector exemplar (a facet/range-aggregation collector):
    bucket = clip(((v - lo) * n_buckets) // (hi - lo), 0, n_buckets-1),
    docs with a null dv value are skipped. No scoring needed."""

    needs_scores = False

    def __init__(self, field: str, lo: int, hi: int, n_buckets: int) -> None:
        self.field, self.lo, self.hi, self.n = field, lo, hi, int(n_buckets)
        self.counts = np.zeros(self.n, np.int64)
        self._searcher = None

    def set_context(self, searcher) -> None:
        self._searcher = searcher

    def collect(self, docs, scores) -> None:
        vals, valid = self._searcher.dv_values(docs, self.field)
        v = vals[valid]
        b = np.clip((v - self.lo) * self.n // (self.hi - self.lo), 0, self.n - 1)
        self.counts += np.bincount(b, minlength=self.n)

    def finish(self) -> None:
        self._searcher = None


class NumericHistogramCollectorManager(CollectorManager):
    def __init__(self, field: str, lo: int, hi: int, n_buckets: int) -> None:
        self.args = (field, int(lo), int(hi), int(n_buckets))

    def new_collector(self) -> NumericHistogramCollector:
        return NumericHistogramCollector(*self.args)

    def reduce(self, collectors) -> pa.Table:
        n = self.args[3]
        counts = np.zeros(n, np.int64)
        for c in collectors:
            counts += c.counts
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(counts[nz]),
            }
        )


class FacetCountsCollector(Collector):
    """Facet counting over a KEYWORD field (the facets-module analogue —
    absent from the reference core, standard Lucene tooling): value ->
    hit count over the match set, computed postings-side (one sorted
    membership count per distinct field value — keyword cardinality is
    small; loops never touch rows)."""

    needs_scores = False

    def __init__(self, field: str) -> None:
        self.field = field
        self.counts: dict = {}
        self._searcher = None

    def set_context(self, searcher) -> None:
        self._searcher = searcher

    def collect(self, docs, scores) -> None:
        for v, c in self._searcher.field_value_counts(docs, self.field).items():
            self.counts[v] = self.counts.get(v, 0) + c

    def finish(self) -> None:
        self._searcher = None


class FacetCountsCollectorManager(CollectorManager):
    """Sharded facet counts; ``reduce`` returns (value, cnt) for the
    ``top_n`` values ordered by (cnt desc, value asc)."""

    def __init__(self, field: str, top_n: int = 10) -> None:
        self.field = field
        self.top_n = int(top_n)

    def new_collector(self) -> FacetCountsCollector:
        return FacetCountsCollector(self.field)

    def reduce(self, collectors) -> pa.Table:
        merged: dict = {}
        for c in collectors:
            for v, n in c.counts.items():
                merged[v] = merged.get(v, 0) + n
        top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[: self.top_n]
        return pa.table(
            {
                "value": pa.array([v for v, _ in top], pa.string()),
                "cnt": pa.array([n for _, n in top], pa.int64()),
            }
        )


class DvFacetCountsCollector(Collector):
    """Facet counting off STRING DOC-VALUES (SORTED / SORTED_SET,
    docvaluesreader.go:129,326) instead of postings: gather the hit
    block's sdv column, count each value — a list-valued (SORTED_SET)
    doc contributes one count per distinct element, like Lucene's
    SortedSetDocValuesFacetCounts. Chosen over the postings walk when
    the field has dv but no postings, or when hit sets are small
    relative to the field's dictionary."""

    needs_scores = False

    def __init__(self, field: str) -> None:
        self.field = field
        self.counts: dict = {}
        self._searcher = None

    def set_context(self, searcher) -> None:
        self._searcher = searcher

    def collect(self, docs, scores) -> None:
        vals, valid = self._searcher.sdv_values(docs, self.field)
        for v in vals[valid]:
            if isinstance(v, list):
                for e in set(v):
                    self.counts[e] = self.counts.get(e, 0) + 1
            else:
                self.counts[v] = self.counts.get(v, 0) + 1

    def finish(self) -> None:
        self._searcher = None


class DvFacetCountsCollectorManager(FacetCountsCollectorManager):
    """Sharded dv-side facet counts; same (value, cnt) reduce contract as
    the postings-side manager."""

    def new_collector(self) -> DvFacetCountsCollector:
        return DvFacetCountsCollector(self.field)
