"""Dataset-native full-text pipelines over a (doc_id, text) parquet table.

These are the SQL-checkable surfaces of the engine (driver correctness
gate): term statistics, collection statistics, norms, and top-k BM25
queries over the merged inverted index. Each has an exactly matching
DuckDB oracle in ``__ray_entry__.oracle_sql``.

Design: per-batch *partial* aggregation inside ``map_batches`` (pyarrow
group_by over the flattened token table — no Python rows), then a small
``groupby().aggregate(Sum)`` shuffle over (term, partial) rows — the
pre-combine pattern that keeps the all-to-all exchange proportional to
vocabulary size, not token count.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis import StandardAnalyzer
from ..index import IndexConfig, build_index
from ..search import IndexSearcher
from ..search.searcher import query_from_descriptor

_GATE_CFG = IndexConfig(
    target_partition_rows=2000,
    hot_term_doc_freq=100_000,
    chunk_docs=131_072,
    keyword_fields=("lang", "source"),
    # SORTED string dv (sortable + dv-facetable) alongside the keyword
    # postings — the two representations coexist like Lucene's
    # StringField + SortedDocValuesField on one logical field
    string_docvalue_fields=("lang", "source"),
    # doc_id doubles as the second dimension of the 2-D box gate
    # (NumericBoxQuery, the lat/lon analogue)
    docvalue_fields=("n_chars", "doc_id"),
    # RangeField gate surface: each doc's interval spans its two numeric
    # attributes, [min(doc_id, n_chars), max(doc_id, n_chars)]
    range_fields=(("span", "doc_id", "n_chars"),),
    # per-doc term vectors stored at build (FieldType.StoreTermVectors
    # parity surface; gate entry `term_vectors` reads them back)
    index_term_vectors=True,
    # per-occurrence payload stream (hasPayload prox surface; gate entry
    # `payload_stats` reads it back, oracle recomputes via octet_length)
    payload_kind="token_bytes",
)


def _analyzer(cfg: IndexConfig = _GATE_CFG) -> StandardAnalyzer:
    return StandardAnalyzer(stop_words=cfg.stop_set(), lowercase=cfg.lowercase)


def _doc_table(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


# --------------------------------------------------------------------------
# token-level aggregates (pure Dataset pipelines, no index required)
# --------------------------------------------------------------------------


_ANALYZER_CACHE: dict[tuple, StandardAnalyzer] = {}


def _cached_analyzer(stop_words: tuple, lowercase: bool) -> StandardAnalyzer:
    """Per-worker-process analyzer cache: analyzer construction is cheap
    (~1 ms) so these stages run as plain task functions — an actor pool's
    multi-second spin-up would dominate at gate scale; the cache still
    gives once-per-worker setup semantics."""
    key = (stop_words, lowercase)
    a = _ANALYZER_CACHE.get(key)
    if a is None:
        a = StandardAnalyzer(stop_words=frozenset(stop_words), lowercase=lowercase)
        _ANALYZER_CACHE[key] = a
    return a


class _TokenPartials:
    """map_batches stage: batch of (doc_id, text) -> per-batch partial
    (term, doc_freq, total_term_freq) rows."""

    def __init__(self, stop_words=None, lowercase=True):
        self.analyzer = _cached_analyzer(tuple(stop_words or ()), lowercase)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.analyzer.analyze_column(batch["text"])
        t = pa.table(
            {
                "term": out["terms"],
                "doc_idx": pa.array(out["doc_idx"], type=pa.int32()),
            }
        )
        per_doc = t.group_by(["term", "doc_idx"]).aggregate([("doc_idx", "count")])
        per_term = per_doc.group_by("term").aggregate(
            [("doc_idx", "count"), ("doc_idx_count", "sum")]
        )
        return pa.table(
            {
                "term": per_term["term"].cast(pa.string()),
                "doc_freq": per_term["doc_idx_count"].cast(pa.int64()),
                "total_term_freq": per_term["doc_idx_count_sum"].cast(pa.int64()),
            }
        )


def term_stats(sf_dir: str, cfg: IndexConfig = _GATE_CFG):
    """Global (term, doc_freq, total_term_freq) — the term dictionary stats."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(_doc_table(sf_dir), columns=["doc_id", "text"])
    stops, lc = tuple(cfg.stop_words), cfg.lowercase

    def _partials(batch: pa.Table) -> pa.Table:
        return _TokenPartials(stops, lc)(batch)

    partial = ds.map_batches(_partials, batch_format="pyarrow")
    return partial.groupby("term").aggregate(
        Sum("doc_freq", alias_name="doc_freq"),
        Sum("total_term_freq", alias_name="total_term_freq"),
    )


def doc_norms(sf_dir: str, cfg: IndexConfig = _GATE_CFG):
    """(doc_id, norm) for every doc with at least one kept token."""
    import ray.data

    an = _analyzer(cfg)

    def _norms(batch: pa.Table) -> pa.Table:
        out = an.analyze_column(batch["text"])
        norms = out["norms"]
        keep = norms > 0
        return pa.table(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)[keep],
                "norm": pa.array(norms[keep], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(_doc_table(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(_norms, batch_format="pyarrow")


def collection_stats(sf_dir: str, cfg: IndexConfig = _GATE_CFG) -> pa.Table:
    """One row: (max_doc, doc_count, sum_total_term_freq, sum_doc_freq) —
    CollectionStatistics semantics (indexsearcher.go:438-481)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    an = _analyzer(cfg)

    def _partial(batch: pa.Table) -> pa.Table:
        out = an.analyze_column(batch["text"])
        norms = out["norms"]
        t = pa.table(
            {
                "term": out["terms"],
                "doc_idx": pa.array(out["doc_idx"], type=pa.int32()),
            }
        )
        n_postings = t.group_by(["term", "doc_idx"]).aggregate([]).num_rows
        return pa.table(
            {
                "max_doc": pa.array([batch.num_rows], type=pa.int64()),
                "doc_count": pa.array([int((norms > 0).sum())], type=pa.int64()),
                "sum_total_term_freq": pa.array([int(norms.sum())], type=pa.int64()),
                "sum_doc_freq": pa.array([n_postings], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(_doc_table(sf_dir), columns=["doc_id", "text"])
    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            c: pa.array([int(parts[c].sum())], type=pa.int64())
            for c in ["max_doc", "doc_count", "sum_total_term_freq", "sum_doc_freq"]
        }
    )


# --------------------------------------------------------------------------
# top-k BM25 over the merged index (cached per sf_dir)
# --------------------------------------------------------------------------


def _search_past_rounded_ties(s, q, k: int, round_to: int, margin: int = 200):
    """Fetch top hits until the LAST fetched rounded score strictly drops
    below the kth rounded score (or all hits are in hand). Re-ranking in the
    rounded domain is then exact: no doc outside the fetched window can tie
    into the top-k, however wide the rounded tie group straddling the
    cutoff is."""
    fetch = k + margin
    while True:
        td = s.search(q, fetch)
        scores6 = np.round(td.scores, round_to)
        n = len(scores6)
        if n < fetch or n <= k or scores6[-1] < scores6[k - 1]:
            return td, scores6
        fetch *= 4

_searcher_cache: dict[object, IndexSearcher] = {}


def get_searcher(sf_dir: str, cfg: IndexConfig = _GATE_CFG) -> IndexSearcher:
    # cache key includes the config: two calls with different IndexConfigs
    # (codec_name, range_fields, ...) must not share a searcher
    key = (os.path.abspath(sf_dir), repr(cfg))
    s = _searcher_cache.get(key)
    if s is not None:
        return s
    src = _doc_table(sf_dir)
    from ..index.codec import INDEX_FORMAT_VERSION

    tag = hashlib.md5(
        f"{key}:{os.path.getmtime(src)}:{cfg}:v{INDEX_FORMAT_VERSION}".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join("/tmp/lgr_gate_index", tag)
    from ..index.manifest import load_manifest

    m = load_manifest(index_dir)
    if m is None or not m.merged:
        build_index([src], index_dir, cfg)
    s = IndexSearcher(index_dir)
    _searcher_cache[key] = s
    return s


def topk(
    sf_dir: str,
    kind: str,
    clauses: list[str],
    k: int = 10,
    *,
    round_to: int = 6,
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Top-k as (rank, doc_id, score) with scores rounded to ``round_to``
    decimals and rank order (rounded score desc, doc_id asc) — the rounding
    makes the cross-engine (numpy vs DuckDB) comparison robust to 1-ulp
    libm differences in ln(); rank-identity at full float64 precision is
    asserted against the exhaustive oracle in pytest instead."""
    s = get_searcher(sf_dir, cfg)
    q = query_from_descriptor(kind, clauses)
    td, scores6 = _search_past_rounded_ties(s, q, k, round_to)
    order = np.lexsort((td.doc_ids, -scores6))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(td.doc_ids[order]),
            "score": pa.array(scores6[order], type=pa.float64()),
        }
    )


def term_vectors(
    sf_dir: str, modulus: int = 97, cfg: IndexConfig = _GATE_CFG
):
    """Sampled per-document term vectors (doc_id % modulus == 0) of the
    text field as (doc_id, term, freq) — the reader.GetTermVector batch
    surface. Streams the per-segment doc-major tvec side tables (one read
    task per segment, field filter pushed to the parquet scan); the text
    is never re-analyzed. Requires ``index_term_vectors=True`` (on in the
    gate config)."""
    import ray.data

    s = get_searcher(sf_dir, cfg)
    text_col = cfg.text_column
    segs = [
        {
            "path": os.path.join(
                s.index_dir, "segments", f"p={int(p['pid']):05d}", "tvec.parquet"
            ),
            "doc_base": int(p["doc_base"]),
        }
        for p in s.manifest.partitions
    ]

    def _read_seg(batch: pa.Table) -> pa.Table:
        outs = []
        for path, base in zip(
            batch["path"].to_pylist(), batch["doc_base"].to_pylist()
        ):
            t = pq.read_table(
                path,
                columns=["ord", "term", "freq"],
                filters=[("field", "=", text_col)],
            )
            doc_id = t["ord"].to_numpy(zero_copy_only=False).astype(np.int64) + base
            keep = doc_id % modulus == 0
            outs.append(
                pa.table(
                    {
                        "doc_id": pa.array(doc_id[keep]),
                        "term": t["term"]
                        .combine_chunks()
                        .cast(pa.string())
                        .filter(pa.array(keep)),
                        "freq": pa.array(
                            t["freq"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)[keep]
                        ),
                    }
                )
            )
        return pa.concat_tables(outs)

    return ray.data.from_items(segs).map_batches(
        _read_seg, batch_format="pyarrow", batch_size=4
    )


def payload_stats(
    sf_dir: str, term: str, cfg: IndexConfig = _GATE_CFG
):
    """Per-doc digest of one term's posting payloads as
    (doc_id, freq, sum_payload, min_payload, max_payload) — the
    PayloadAttribute read surface over the segment-local payload side
    tables (index/payloads.py; hasPayload prox bit,
    /root/reference/core/index/freqproxtermswriterperfield.go:124-218).
    Streams one read task per segment with the term filter pushed to the
    parquet scan (term-sorted side table => row-group stats prune);
    per-list aggregation is np.reduceat over the flattened list column —
    no per-row loop. Requires ``IndexConfig.payload_kind`` (on in the
    gate config: "token_bytes", the raw pre-lowercase token's UTF-8 byte
    length)."""
    import ray.data

    s = get_searcher(sf_dir, cfg)
    segs = [
        {
            "path": os.path.join(
                s.index_dir,
                "segments",
                f"p={int(p['pid']):05d}",
                "payloads.parquet",
            ),
            "doc_base": int(p["doc_base"]),
        }
        for p in s.manifest.partitions
    ]

    def _read_seg(batch: pa.Table) -> pa.Table:
        outs = []
        for path, base in zip(
            batch["path"].to_pylist(), batch["doc_base"].to_pylist()
        ):
            if not os.path.exists(path):  # segment with zero postings
                continue
            t = pq.read_table(path, filters=[("term", "=", term)])
            if t.num_rows == 0:
                continue
            lists = t["payloads"].combine_chunks()
            offs = lists.offsets.to_numpy(zero_copy_only=False)
            # flatten() yields exactly the window [offs[0], offs[-1]) of
            # the values buffer, so rebase the reduceat segment starts
            vals = lists.flatten().to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            starts = (offs[:-1] - offs[0]).astype(np.int64)
            freq = np.diff(offs)
            outs.append(
                pa.table(
                    {
                        "doc_id": pa.array(
                            t["ord"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)
                            + base
                        ),
                        "freq": pa.array(freq.astype(np.int64)),
                        "sum_payload": pa.array(
                            np.add.reduceat(vals, starts)
                        ),
                        "min_payload": pa.array(
                            np.minimum.reduceat(vals, starts)
                        ),
                        "max_payload": pa.array(
                            np.maximum.reduceat(vals, starts)
                        ),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "freq": pa.array([], type=pa.int64()),
                    "sum_payload": pa.array([], type=pa.int64()),
                    "min_payload": pa.array([], type=pa.int64()),
                    "max_payload": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    return ray.data.from_items(segs).map_batches(
        _read_seg, batch_format="pyarrow", batch_size=4
    )


def dv_histogram(
    sf_dir: str,
    term: str,
    field: str = "n_chars",
    lo: int = 0,
    hi: int = 500,
    n_buckets: int = 10,
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Histogram of a numeric doc-values field over the docs matching a
    term — exercises the user-pluggable CollectorManager surface
    (/root/reference/core/search/collector.go:1) end-to-end: sharded
    collection over disjoint docID ranges as Ray tasks, driver-side
    reduce. Returns (bucket, cnt) for non-empty buckets, bucket-sorted."""
    from ..search import NumericHistogramCollectorManager, TermQuery

    s = get_searcher(sf_dir, cfg)
    mgr = NumericHistogramCollectorManager(field, lo, hi, n_buckets)
    return s.search_with_collector_sharded(TermQuery(term), mgr)


def field_term_stats(
    sf_dir: str, field: str = "lang", cfg: IndexConfig = _GATE_CFG
) -> pa.Table:
    """Per-term stats of one keyword field: the per-field terms dictionary
    walk (expand over the field's key range) + TermStates accumulation —
    multi-field parity surface (fieldinfos.go / per-field FSTs)."""
    s = get_searcher(sf_dir, cfg)
    terms = s.expand_terms(field, "", "\U0010ffff")
    stats = [s.term_statistics(t, fld=field) for t in terms]
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "doc_freq": pa.array([d for d, _ in stats], type=pa.int64()),
            "total_term_freq": pa.array([t for _, t in stats], type=pa.int64()),
        }
    )


def topk_after_delete(
    sf_dir: str,
    kind: str,
    clauses: list[str],
    k: int = 10,
    *,
    del_field: str = "lang",
    del_value: str = "de",
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Delete-by-term then top-k: tombstones filter hits at collect time
    while collection statistics still count the deleted docs (liveDocs
    semantics, indexwriter.go:399-422 + index/deletes.py). The deleted
    index is a cached copy of the gate index, so the base index stays
    pristine for every other entry."""
    import shutil

    from ..index.deletes import delete_by_term

    base = get_searcher(sf_dir, cfg)
    ddir = base.index_dir + f"_del_{del_field}_{del_value}"
    s = _searcher_cache.get(ddir)
    if s is None:
        if not os.path.isdir(ddir):
            tmp = ddir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(base.index_dir, tmp)
            delete_by_term(tmp, del_value, fld=del_field)
            os.replace(tmp, ddir)
        s = IndexSearcher(ddir)
        _searcher_cache[ddir] = s
    q = query_from_descriptor(kind, clauses)
    td, scores6 = _search_past_rounded_ties(s, q, k, 6)
    order = np.lexsort((td.doc_ids, -scores6))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(td.doc_ids[order]),
            "score": pa.array(scores6[order], type=pa.float64()),
        }
    )


def topk_after_incremental(
    sf_dir: str,
    kind: str,
    clauses: list[str],
    k: int = 10,
    *,
    app_field: str = "lang",
    app_value: str = "fr",
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Append a deterministic delta corpus (the ``app_field==app_value``
    docs re-added, in doc_id order) via add_documents with the
    INCREMENTAL merge path — only the buckets containing the delta's
    terms are folded; everything else is hardlinked from the base epoch
    (index/merge.py:incremental_merge_index; MergePolicy contract
    /root/reference/core/index/mergepolicy.go:134-334) — then run top-k
    over the grown index. Appended docs get docIDs max_doc + seq, which
    the SQL oracle replays as count(*) + row_number() - 1. Runs on a
    cached private copy of the gate index."""
    import shutil

    import pyarrow.parquet as pq

    from ..index.build import add_documents

    base = get_searcher(sf_dir, cfg)
    ddir = base.index_dir + f"_inc_{app_field}_{app_value}"
    s = _searcher_cache.get(ddir)
    if s is None:
        if not os.path.isdir(ddir):
            tmp = ddir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(base.index_dir, tmp)
            src = os.path.join(sf_dir, "documents.parquet")
            t = pq.read_table(src)
            mask = pc.equal(t[app_field], app_value)
            delta = t.filter(mask).sort_by("doc_id")
            delta_path = ddir + "_delta.parquet"
            pq.write_table(delta, delta_path)
            add_documents(tmp, [delta_path], merge="incremental")
            os.replace(tmp, ddir)
        s = IndexSearcher(ddir)
        _searcher_cache[ddir] = s
    q = query_from_descriptor(kind, clauses)
    td, scores6 = _search_past_rounded_ties(s, q, k, 6)
    order = np.lexsort((td.doc_ids, -scores6))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(td.doc_ids[order]),
            "score": pa.array(scores6[order], type=pa.float64()),
        }
    )


def topk_after_expunge(
    sf_dir: str,
    kind: str,
    clauses: list[str],
    k: int = 10,
    *,
    del_field: str = "lang",
    del_value: str = "es",
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Delete-by-term, then expungeDeletes, then top-k: unlike
    ``topk_after_delete`` (overlay liveDocs, stats still count the dead),
    the compacted index has REFRESHED collection statistics — scores match
    an index built without the deleted docs (indexwriter.go:399-422 delete
    GC via index/compact.py). Runs on a cached private copy of the gate
    index."""
    import shutil

    from ..index.compact import expunge_deletes
    from ..index.deletes import delete_by_term

    base = get_searcher(sf_dir, cfg)
    ddir = base.index_dir + f"_exp_{del_field}_{del_value}"
    s = _searcher_cache.get(ddir)
    if s is None:
        if not os.path.isdir(ddir):
            tmp = ddir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(base.index_dir, tmp)
            delete_by_term(tmp, del_value, fld=del_field)
            expunge_deletes(tmp)
            os.replace(tmp, ddir)
        s = IndexSearcher(ddir)
        _searcher_cache[ddir] = s
    q = query_from_descriptor(kind, clauses)
    td, scores6 = _search_past_rounded_ties(s, q, k, 6)
    order = np.lexsort((td.doc_ids, -scores6))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(td.doc_ids[order]),
            "score": pa.array(scores6[order], type=pa.float64()),
        }
    )


def topk_after_dv_update(
    sf_dir: str,
    term: str,
    nr_field: str = "n_chars",
    nr_lo: int = 150,
    nr_hi: int = 350,
    k: int = 10,
    *,
    upd_field: str = "lang",
    upd_value: str = "fr",
    new_value: int = 999,
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Numeric doc-values update then a dv-filtered top-k: docs matching
    ``upd_field = upd_value`` get ``nr_field := new_value`` via the
    generation-stamped overlay (docvaluesfieldupdates.go semantics,
    index/dv_updates.py), so the numeric-range FILTER sees the UPDATED
    values while BM25 stats/scoring are untouched. Runs on a cached
    private copy of the gate index."""
    import shutil

    from ..index.dv_updates import update_numeric_docvalues_by_query
    from ..search.query import TermQuery

    base = get_searcher(sf_dir, cfg)
    ddir = base.index_dir + f"_dvu_{upd_field}_{upd_value}_{new_value}"
    s = _searcher_cache.get(ddir)
    if s is None:
        if not os.path.isdir(ddir):
            tmp = ddir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(base.index_dir, tmp)
            update_numeric_docvalues_by_query(
                tmp, TermQuery(upd_value, field=upd_field), nr_field, new_value
            )
            os.replace(tmp, ddir)
        s = IndexSearcher(ddir)
        _searcher_cache[ddir] = s
    q = query_from_descriptor(
        "numeric_range", [term, nr_field, str(nr_lo), str(nr_hi)]
    )
    td, scores6 = _search_past_rounded_ties(s, q, k, 6)
    order = np.lexsort((td.doc_ids, -scores6))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(td.doc_ids[order]),
            "score": pa.array(scores6[order], type=pa.float64()),
        }
    )


def term_doc_count(sf_dir: str, term: str, cfg: IndexConfig = _GATE_CFG) -> pa.Table:
    """Total hit count for a term query (TotalHitCountCollector)."""
    s = get_searcher(sf_dir, cfg)
    from ..search.query import TermQuery

    return pa.table(
        {"total_hits": pa.array([s.count(TermQuery(term))], type=pa.int64())}
    )


def field_exists_count(
    sf_dir: str, fld: str, cfg: IndexConfig = _GATE_CFG
) -> pa.Table:
    """Hit count of FieldExistsQuery(fld) — the docsWithField bitmap path
    (no dictionary expansion; see searcher._has_field_docs)."""
    s = get_searcher(sf_dir, cfg)
    from ..search.query import FieldExistsQuery

    return pa.table(
        {"total_hits": pa.array([s.count(FieldExistsQuery(fld))], type=pa.int64())}
    )


def sorted_topn_norms(sf_dir: str, n: int = 20, cfg: IndexConfig = _GATE_CFG):
    """Field-sorted top-N (the TopFieldCollector surface,
    /root/reference/core/search/topfieldcollector.go): docs ordered by
    field-length norm desc then doc_id asc — a Dataset ``sort`` + ``limit``
    (distributed ordered-limit, no full materialization)."""
    ds = doc_norms(sf_dir, cfg)
    return ds.sort(["norm", "doc_id"], descending=[True, False]).limit(n)


def topk_sort_field(
    sf_dir: str,
    term: str,
    fields: list[tuple[str, bool]] = (("n_chars", True),),
    k: int = 10,
    num_shards: int = 8,
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Top-K hits of THIS query ordered by SortField comparators over
    doc-values (field desc/asc, missing last, docID tiebreak) — the
    TopFieldCollector surface (/root/reference/core/search/
    topfieldcollector.go, sortfield.go) run as a sharded
    CollectorManager, NOT a whole-dataset sort: only the query's match
    set is gathered, k rows per shard travel back."""
    from ..search import SortField, TermQuery, TopFieldCollectorManager

    s = get_searcher(sf_dir, cfg)
    mgr = TopFieldCollectorManager(
        [SortField(f, reverse=r) for f, r in fields], k
    )
    return s.search_with_collector_sharded(TermQuery(term), mgr, num_shards)


def topk_paged(
    sf_dir: str,
    kind: str,
    clauses: list[str],
    page: int = 2,
    page_size: int = 10,
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Page ``page`` of the rounded-score ranking (SearchAfter paging,
    /root/reference/core/search/indexsearcher.go:223-262). Ranking is done
    in the rounded-score domain like every gate top-k (full-precision
    ``IndexSearcher.search_after`` paging is asserted in pytest)."""
    s = get_searcher(sf_dir, cfg)
    q = query_from_descriptor(kind, clauses)
    td, scores6 = _search_past_rounded_ties(s, q, page * page_size, 6, margin=400)
    order = np.lexsort((td.doc_ids, -scores6))
    sel = order[(page - 1) * page_size : page * page_size]
    return pa.table(
        {
            "rank": pa.array(
                np.arange((page - 1) * page_size + 1,
                          (page - 1) * page_size + 1 + len(sel), dtype=np.int64)
            ),
            "doc_id": pa.array(td.doc_ids[sel]),
            "score": pa.array(scores6[sel], type=pa.float64()),
        }
    )


def facet_counts(
    sf_dir: str,
    term: str,
    field: str = "lang",
    top_n: int = 10,
    cfg: IndexConfig = _GATE_CFG,
    *,
    use_dv: bool = False,
) -> pa.Table:
    """Top-N facet counts of a stored keyword field over the docs matching
    ``term`` — the facets-module analogue (absent from the reference core)
    as a sharded CollectorManager run. Returns (value, cnt) ordered by
    (cnt desc, value asc). ``use_dv=True`` counts off the SORTED /
    SORTED_SET string doc-values column (docvaluesreader.go:129,326)
    instead of walking the keyword postings — same result, different
    access path (dv gather per hit block vs one membership count per
    dictionary value)."""
    from ..search import (
        DvFacetCountsCollectorManager,
        FacetCountsCollectorManager,
        TermQuery,
    )

    s = get_searcher(sf_dir, cfg)
    mgr_cls = DvFacetCountsCollectorManager if use_dv else FacetCountsCollectorManager
    return s.search_with_collector_sharded(
        TermQuery(term), mgr_cls(field, top_n)
    )


def topk_mlt(
    sf_dir: str,
    doc_id: int,
    n_terms: int = 5,
    k: int = 10,
    *,
    min_term_freq: int = 0,
    min_doc_freq: int = 0,
    round_to: int = 6,
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """MoreLikeThisQuery analogue (the Lucene queries-module feature —
    absent from the reference core): pick the source document's top
    ``n_terms`` terms by tf*idf from its STORED term vector (no
    re-analysis), then run the SHOULD query they form. Term selection
    uses the rounded tf*idf with a (score desc, term asc) tie-break so
    DuckDB reproduces the exact same interesting-term set; result rows
    are the usual (rank, doc_id, score).

    INTENTIONAL divergence from Lucene MoreLikeThis defaults: interesting
    terms are scored with the engine's BM25 idf (ln(1+(N-n+0.5)/(n+0.5)))
    rather than classic idf (log(N/(df+1))+1), and the frequency gates
    default OFF so the gate oracle stays a pure closed-form SQL replay.
    Lucene's defaults (minTermFreq=2, minDocFreq=5, maxQueryTerms=25)
    are available via ``min_term_freq`` / ``min_doc_freq`` / ``n_terms``."""
    import math

    from ..search.query import BooleanQuery

    s = get_searcher(sf_dir, cfg)
    tv = s.term_vector(int(doc_id), field=cfg.text_column)
    N = float(s.stats["doc_count"])
    scored = []
    for term, freq in zip(tv["term"].to_pylist(), tv["freq"].to_pylist()):
        if freq < min_term_freq:
            continue
        df, _ = s.term_statistics(term)
        if df < min_doc_freq:
            continue
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        scored.append((round(freq * idf, round_to), term))
    scored.sort(key=lambda x: (-x[0], x[1]))
    terms = [t for _, t in scored[:n_terms]]
    q = BooleanQuery.build(should=terms)
    td, scores6 = _search_past_rounded_ties(s, q, k, round_to)
    order = np.lexsort((td.doc_ids, -scores6))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(td.doc_ids[order]),
            "score": pa.array(scores6[order], type=pa.float64()),
        }
    )


def suggest_terms(
    sf_dir: str,
    prefix: str,
    k: int = 10,
    *,
    cfg: IndexConfig = _GATE_CFG,
) -> pa.Table:
    """Prefix autocomplete (Lucene suggest-module analogue): the top-k
    dictionary terms with ``prefix``, ranked by (doc_freq desc, term asc).
    Candidate terms AND their doc_freqs come from ONE batched range-index
    scan (``expand_terms_stats``) over the merged chunk metadata — a
    common one-character prefix costs the same row-group pass as its
    expansion, not O(dictionary) per-term probes."""
    s = get_searcher(sf_dir, cfg)
    stats = s.expand_terms_stats(
        cfg.text_column, prefix, prefix + "\U0010ffff"
    )
    terms = np.asarray(stats["term"].to_pylist(), dtype=object)
    dfs = stats["doc_freq"].to_numpy(zero_copy_only=False)
    order = np.lexsort((terms, -dfs))[:k]
    return pa.table(
        {
            "term": pa.array(terms[order].tolist(), pa.string()),
            "doc_freq": pa.array(dfs[order], pa.int64()),
        }
    )
