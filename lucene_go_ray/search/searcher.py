"""Top-k BM25 search over the merged global index.

The query-side graft of the reference's IndexSearcher
(/root/reference/core/search/indexsearcher.go:204-397):

- collection statistics are global (summed across all partitions at build
  finalize — the searcher-side summation of indexsearcher.go:438-481 done
  once instead of per query);
- term lookup is a range-index probe + row-group read (the FST seek,
  termquery.go:194-218, at file granularity);
- boolean evaluation uses sorted-docID array algebra: intersection =
  ConjunctionDISI leapfrog (conjunctiondisi.go:17-33), union =
  DisjunctionSumScorer, difference = ReqExclScorer, req+opt =
  ReqOptSumScorer — all as vectorized numpy set operations;
- top-k: score desc, docID asc on ties (topscoredoccollector.go:92-101);
- optional block-max pruning (``prune=True``) skips postings blocks whose
  impact upper bound cannot reach the current kth score — rank-identical to
  exhaustive evaluation by construction (the working version of the
  reference's stubbed WANDScorer, wandscorer.go:30-32).

Two distributed paths:
- ``search_batch``: a Dataset of queries through a ``SearcherActor`` pool —
  the query-throughput path (each actor caches the term range index and the
  hot file handles);
- ``search`` on the driver reads only the postings rows its terms need —
  at most a few row groups per term — never the whole index.
"""

from __future__ import annotations

import bisect
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..index.codec import (
    INDEX_FORMAT_VERSION,
    KEY_SEP,
    get_codec,
    posting_key,
)
from ..index.config import IndexConfig
from ..index.manifest import load_manifest
from ..index.merge import term_buckets
from .query import (
    MAX_CLAUSE_COUNT,
    BooleanQuery,
    FieldExistsQuery,
    BoostQuery,
    MatchNoDocsQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    DocIdRangeQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    NumericBoxQuery,
    NumericInSetQuery,
    NumericRangeQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RangeFieldQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    RegexpQuery,
    WildcardQuery,
)
from .scorer import BM25Scorer, idf, make_scorer


# Postings volume below which exhaustive evaluation beats block-max WAND.
# numpy-vectorized exhaustive scoring of a small term is single-digit ms
# warm; the pruned path's fixed cost (interval construction + batched
# sweep, ~0.8 ms measured on a 31-block term) only amortizes once the
# candidate postings volume is large. Since round 3's batched sweep the
# floor is 100k postings (was 2M for the per-interval python sweep).
#
# Round 4: the floor is MODE/K-AWARE, from the clean-window grid in
# BASELINE.md ("block-max WAND, batched sweep" table):
#   - multi-term OR wins from 100k postings at every measured size (the
#     batched aggregation beats one giant unique+select even with ~0%
#     skippable blocks)            -> WAND_MIN_POSTINGS
#   - single term: k=10 loses at df 101k (0.7x), parity at 203k, wins at
#     406k (1.5x); k=100 measured 0.97x at 203k in the round-4 clean
#     window and 1.4x at 406k      -> WAND_TERM_MIN_POSTINGS = 250k
#     (all k — an earlier 1.5x k=100 reading at df 101k did not
#     reproduce, so the conservative shared floor stands)
#   - pure AND (the interval SWEEP) never beat the exhaustive
#     intersect-first path on balanced conjunctions at any measured size
#     (0.90-0.93x, adaptive bail's bounded waste)
#                                  -> WAND_AND_MIN_POSTINGS = 1M
#     df-SKEWED conjunctions take the lead-with-rarest path below
#     instead (measured 1.7-3.5x, bench and_skew_k10)
# A df-FRACTION guard (engage at f*doc_count) was considered and
# rejected by the same data: df = 0.4*doc_count LOSES at 250k docs and
# WINS 1.5x at 1M docs — the fraction is scale-invariant on self-similar
# corpora while the sweep's fixed cost is absolute, so absolute postings
# volume is the correct engage variable.
WAND_MIN_POSTINGS = 100_000
WAND_TERM_MIN_POSTINGS = 250_000
WAND_AND_MIN_POSTINGS = 1_000_000

# Lead-with-rarest conjunction (ConjunctionDISI semantics,
# /root/reference/core/search/conjunctiondisi.go — the leapfrog where the
# rarest iterator drives advance()): decode the rarest term's postings
# fully, then for every other term decode ONLY the blocks that contain a
# candidate docID. Skipping here scales with DF SKEW (independent of the
# score distribution the block-max sweep needs), so it engages exactly
# where the sweep's AND mode measured 0.90-0.93x: engage when the
# candidate set is expected to touch at most this fraction of the other
# terms' blocks (touch <= min(df_lead, blocks_j) per term j), with a
# postings-volume floor below which exhaustive decode is already cheap.
LEAD_CONJ_MIN_POSTINGS = 200_000
LEAD_CONJ_MAX_TOUCH_FRAC = 0.5

# Legacy pre-sweep spread guard of the round-2 python sweep — NO LONGER
# READ. Measured with the batched sweep: a 3-hot-term OR with ~0% skippable
# blocks still ran 27% FASTER pruned than exhaustive (the batched
# aggregation beats one giant unique+select), so rejecting low-spread
# queries up front loses wins. Kept as a constant because test fixtures
# monkeypatch it.
WAND_MIN_UB_SPREAD = 1.25

# Adaptive AND-mode bail: exhaustive conjunction is fast (intersect first,
# score the intersection only), so pruned AND only pays when blocks really
# skip. Once the heap first fills (real theta known), if fewer than this
# fraction of the REMAINING intervals fall below theta, fall back to
# exhaustive — wasted work is bounded by the first small batches.
WAND_AND_MIN_SKIP = 0.25

# Third engage guard: skipping depends on theta = the kth score — a deep
# cutoff (k in the hundreds) sits low in the score distribution, so most
# intervals stay competitive and pruning mostly degenerates to exhaustive
# plus overhead. The batched sweep bounds that overhead (the old python
# sweep took 11.8 s on a k=1000 hot-term OR; the batched one is within
# ~2x of exhaustive), so the gate is 512 (was 128).
WAND_MAX_K = 512

# Legacy bail-out knob of the per-interval python sweep (round 2). The
# batched sweep's worst case is already ~exhaustive-with-overhead, so no
# bail is needed; kept (unused) because test fixtures monkeypatch it.
WAND_BAIL_FACTOR = 4

# Merged-index META columns (v7 meta/blob split): the parquet rows hold
# only metadata + byte offsets into the bucket's .blob side file; packed
# streams are pread lazily (whole regions for exhaustive decode, visited
# blocks only under WAND — codec.row_blob / row_blob_gather). There is no
# pos/no-pos distinction at the parquet read anymore: position BYTES are
# never in parquet, and the pos_off/blob_end columns are a few int64s.
_META_COLUMNS = [
    "field",
    "term",
    "salt",
    "chunk_id",
    "doc_freq",
    "total_term_freq",
    "first_doc",
    "last_doc",
    "doc_widths",
    "freq_widths",
    "block_last",
    "block_max_freq",
    "block_min_norm",
    "pos_width",
    "docs_off",
    "freqs_off",
    "norms_off",
    "pos_off",
    "blob_end",
]

# Per-SEGMENT term tables (NRT path) still store streams inline — segments
# are small and short-lived; column pruning drops the position blob there.
_NO_POS_COLUMNS_SEGMENT = [
    "field",
    "term",
    "doc_freq",
    "total_term_freq",
    "first_doc",
    "last_doc",
    "docs_blob",
    "doc_widths",
    "freqs_blob",
    "freq_widths",
    "norms_blob",
    "block_last",
    "block_max_freq",
    "block_min_norm",
]


@dataclass
class TopDocs:
    doc_ids: np.ndarray  # int64, rank order
    scores: np.ndarray  # float64, rank order
    total_hits: int
    keys: list | None = None  # stored key per hit (when requested)

    def to_table(self) -> pa.Table:
        cols = {
            "rank": pa.array(np.arange(1, len(self.doc_ids) + 1, dtype=np.int64)),
            "doc_id": pa.array(self.doc_ids),
            "score": pa.array(self.scores),
        }
        if self.keys is not None:
            cols["key"] = pa.array(self.keys)
        return pa.table(cols)


@dataclass
class _Scored:
    """Evaluation result: parallel sorted-by-doc arrays."""

    docs: np.ndarray  # int64 sorted unique
    scores: np.ndarray | None  # float64 aligned with docs (None for filters)


class _RangeIndex:
    """(field, term) -> candidate (file, row_group) lookup over the merged
    postings.

    Two pruning predicates per row group: the combined posting-key range
    [key_min, key_max] AND the merge-bucket range [bucket_min, bucket_max].
    The caller passes the key's possible bucket ids (computable from
    crc32(key) x its possible salts, index/merge.py:term_buckets), so a
    lookup touches O(1) row groups — the per-field FST seek of the
    reference (/root/reference/codecs/simpletext/fieldsreader.go:290) at
    row-group granularity, with no driver-side vocabulary."""

    def __init__(self, dir_path: str):
        t = pq.read_table(dir_path + "_index.parquet")
        self.files = t["file"].to_pylist()
        self.row_groups = t["row_group"].to_numpy(zero_copy_only=False)
        self.key_min = np.asarray(t["key_min"].to_pylist(), dtype=object)
        self.key_max = np.asarray(t["key_max"].to_pylist(), dtype=object)
        self.bucket_min = t["bucket_min"].to_numpy(zero_copy_only=False)
        self.bucket_max = t["bucket_max"].to_numpy(zero_copy_only=False)
        self.dir_path = dir_path
        self._pf_cache: dict[str, pq.ParquetFile] = {}
        self._bf_cache: dict[str, object] = {}

    def candidates(
        self, key: str, buckets: list[int] | None = None
    ) -> list[tuple[str, int]]:
        mask = (self.key_min <= key) & (key <= self.key_max)
        if buckets is not None:
            bmask = np.zeros(len(mask), dtype=bool)
            for b in buckets:
                bmask |= (self.bucket_min <= b) & (b <= self.bucket_max)
            mask &= bmask
        return [
            (self.files[i], int(self.row_groups[i])) for i in np.flatnonzero(mask)
        ]

    def _file(self, fname: str) -> pq.ParquetFile:
        pf = self._pf_cache.get(fname)
        if pf is None:
            pf = pq.ParquetFile(os.path.join(self.dir_path, fname))
            self._pf_cache[fname] = pf
        return pf

    def expand_terms(self, fld: str, lo: str, hi: str) -> list[str]:
        """All of ``fld``'s dictionary terms in [lo, hi] (byte order): the
        MultiTermQuery expansion seek. Reads ONLY the field+term columns of
        overlapping row groups; bucket files are hash-scattered so a range
        scan touches many row groups, but those columns alone are a tiny
        fraction of each (postings blobs are never read)."""
        klo, khi = posting_key(fld, lo), posting_key(fld, hi)
        mask = (self.key_min <= khi) & (klo <= self.key_max)
        terms: set[str] = set()
        for i in np.flatnonzero(mask):
            t = self._file(self.files[i]).read_row_group(
                int(self.row_groups[i]), columns=["field", "term"]
            )
            t = t.filter(pc.equal(t["field"], fld))
            terms.update(
                x for x in t["term"].to_pylist() if lo <= x <= hi
            )
        return sorted(terms)

    def expand_terms_stats(self, fld: str, lo: str, hi: str) -> pa.Table:
        """(term, doc_freq) for all of ``fld``'s dictionary terms in
        [lo, hi] — the ``expand_terms`` seek with the doc_freq column read
        in the SAME row-group pass and summed per term (a term's salted
        groups may span row groups). One scan, zero per-term probes."""
        klo, khi = posting_key(fld, lo), posting_key(fld, hi)
        mask = (self.key_min <= khi) & (klo <= self.key_max)
        parts = []
        for i in np.flatnonzero(mask):
            t = self._file(self.files[i]).read_row_group(
                int(self.row_groups[i]),
                columns=["field", "term", "doc_freq"],
            )
            t = t.filter(
                pc.and_(
                    pc.equal(t["field"], fld),
                    pc.and_(
                        pc.greater_equal(t["term"], lo),
                        pc.less_equal(t["term"], hi),
                    ),
                )
            )
            if len(t):
                parts.append(t.select(["term", "doc_freq"]))
        if not parts:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "doc_freq": pa.array([], pa.int64())}
            )
        agg = (
            pa.concat_tables(parts)
            .group_by("term")
            .aggregate([("doc_freq", "sum")])
        )
        return agg.rename_columns(["term", "doc_freq"])

    def read_term_rows(
        self,
        fld: str,
        term: str,
        columns: list[str] | None = None,
        buckets: list[int] | None = None,
    ) -> pa.Table:
        tables = []
        for fname, rg in self.candidates(posting_key(fld, term), buckets):
            t = self._file(fname).read_row_group(rg, columns=columns)
            t = t.filter(
                pc.and_(pc.equal(t["field"], fld), pc.equal(t["term"], term))
            )
            if len(t):
                # source file per row, so callers can bind the matching
                # .blob side file (a term's salted groups may span buckets)
                tables.append(
                    t.append_column(
                        "_file", pa.array([fname] * len(t), type=pa.string())
                    )
                )
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    def blob_file(self, fname: str):
        """Shared pread handle on a bucket's .blob side file (meta/blob
        split, index format v7): one fd + I/O counters per file per
        process."""
        bf = self._bf_cache.get(fname)
        if bf is None:
            from ..index.codec import BlobFile

            bf = BlobFile(
                os.path.join(self.dir_path, fname[: -len(".parquet")] + ".blob")
            )
            self._bf_cache[fname] = bf
        return bf


class IndexSearcher:
    def __init__(self, index_dir: str, *, include_soft_deleted: bool = False):
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        if self.manifest is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
        self.cfg = IndexConfig.from_dict(self.manifest.config)
        # resolve the postings format recorded at build time by NAME (the
        # reader side of the reference's named-codec SPI — segment metadata
        # names the codec, codecs/simpletext/codec.go registers it); an
        # index written by an unregistered codec fails loudly here instead
        # of mis-decoding blobs
        self.codec = get_codec(self.cfg.codec_name)
        # NRT mode (the IndexWriter.GetReader surface,
        # /root/reference/core/index/indexwriter.go:829): an UN-merged
        # commit is searchable directly over its segments — term lookups
        # probe every segment's term table (row-group stats prune by the
        # (field, term) sort) and decoded docIDs are offset by docBase.
        # Global statistics come from the manifest, so ranking is identical
        # to post-merge search; the merged index is the THROUGHPUT path
        # (O(1) bucket probes instead of O(P) segment probes).
        self.nrt = not self.manifest.merged
        if self.nrt:
            self.stats = {
                "max_doc": self.manifest.max_doc,
                "doc_count": self.manifest.doc_count,
                "sum_total_term_freq": self.manifest.sum_total_term_freq,
                "sum_doc_freq": self.manifest.sum_doc_freq,
                "field_stats": self.manifest.field_stats,
                "hot_terms": [],
                "format_version": INDEX_FORMAT_VERSION,
            }
        else:
            gdir = os.path.join(index_dir, "global")
            with open(os.path.join(gdir, "stats.json")) as f:
                self.stats = json.load(f)
        fv = self.stats.get("format_version", 1)
        if fv != INDEX_FORMAT_VERSION:
            raise RuntimeError(
                f"index format v{fv} != engine v{INDEX_FORMAT_VERSION}; rebuild"
            )
        # per-field scorers: each indexed field has its own
        # CollectionStatistics (doc_count, avgdl) exactly as
        # indexsearcher.go:438-481 computes them per field name
        self.default_field = self.cfg.text_column
        sim = getattr(self.cfg, "similarity", "bm25")
        self.scorer = make_scorer(
            sim,
            self.stats["doc_count"],
            self.stats["sum_total_term_freq"],
            self.cfg.k1,
            self.cfg.b,
        )
        self._scorers = {self.default_field: self.scorer}
        for f_name, fs in self.stats.get("field_stats", {}).items():
            self._scorers[f_name] = make_scorer(
                sim,
                fs["doc_count"],
                fs["sum_total_term_freq"],
                self.cfg.k1,
                self.cfg.b,
            )
        self.postings = (
            None if self.nrt else _RangeIndex(os.path.join(gdir, "postings"))
        )
        # reversed-term dictionary (leading-wildcard suffix seeks); absent
        # in NRT mode and in pre-v6 indexes — expansion then falls back to
        # the forward full-range scan
        self.revdict = None
        if not self.nrt and os.path.exists(
            os.path.join(gdir, "revdict_index.parquet")
        ):
            self.revdict = _RangeIndex(os.path.join(gdir, "revdict"))
        self._doc_bases = [int(p["doc_base"]) for p in self.manifest.partitions]
        self._pids = [int(p["pid"]) for p in self.manifest.partitions]
        self._docmap_cache: dict[int, pa.Table] = {}
        self._postings_cache: dict[tuple, tuple] = {}
        # when set, every leaf evaluation restricts to this inclusive
        # global-docID range (sharded single-query path, search_sharded)
        self._doc_range: tuple[int, int] | None = None
        self._rows_cache: dict[tuple, list[dict]] = {}
        self._block_cache: dict[str, dict] = {}  # term -> {flat block -> (docs, scores)}
        self._dv_cache: dict[tuple, tuple] = {}  # (pid, field) -> (vals, valid)
        # tombstone overlay (liveDocs): sorted deleted global docIDs,
        # applied ONCE at collect time (root of the evaluation) — never
        # inside clause evaluation, so boolean set algebra is unaffected
        # and stats keep counting deleted docs exactly like the reference
        # until segments are rewritten (index/deletes.py).
        from ..index.deletes import load_deleted

        self.deleted = load_deleted(index_dir)
        # compacted segments carry their own liveDocs complement
        # (dead.parquet, the .liv file — index/compact.py): those docs are
        # already gone from postings/stats, but the dense evaluation paths
        # (match-all, docID range, doc-values scans over the docmap) still
        # need them filtered, so union them into the same collect-time set.
        seg_dead = [
            p for p in self.manifest.partitions if p.get("num_deleted", 0)
        ]
        if seg_dead:
            from ..index.compact import segment_dead_ords

            arrs = [self.deleted] + [
                segment_dead_ords(index_dir, int(p["pid"]))
                + int(p["doc_base"])
                for p in seg_dead
            ]
            self.deleted = np.unique(np.concatenate(arrs))
        # numeric doc-values update overlay (docvaluesfieldupdates.go) +
        # soft deletes (pendingsoftdeletes.go): newest generation per
        # (field, doc_id) overlays the segment dv columns at column-load
        # time (_dv_column); soft-deleted docs join the collect-time
        # filter unless this reader was opened include_soft_deleted=True
        # (the retention / NRT reader). Zone pruning is disabled for
        # updated fields — their manifest dv_ranges may be stale.
        from ..index.dv_updates import SOFT_DELETES_FIELD, load_dv_updates

        self._dv_upd = load_dv_updates(index_dir)
        soft = self._dv_upd.get(SOFT_DELETES_FIELD)
        if soft is not None and not include_soft_deleted:
            sd_ids, sd_vals = soft
            self.deleted = np.unique(
                np.concatenate([self.deleted, sd_ids[sd_vals == 1]])
            )
        # string/binary doc-values registry (SORTED/SORTED_SET/BINARY)
        self.string_dv_fields = frozenset(
            getattr(self.cfg, "string_docvalue_fields", ()) or ()
        )
        # direct bucket probe state (mirror of the merge shuffle keying)
        self._hot_set = frozenset(self.stats.get("hot_terms", ()))
        self._num_buckets = self.cfg.merge_buckets
        self._hot_salts = sorted(
            {pid // self.cfg.salt_group_partitions for pid in self._pids}
        )

    def scorer_for(self, fld: str | None) -> BM25Scorer:
        f_name = fld or self.default_field
        s = self._scorers.get(f_name)
        if s is None:  # unindexed field: empty stats => zero scores
            s = make_scorer(
                getattr(self.cfg, "similarity", "bm25"),
                0, 0, self.cfg.k1, self.cfg.b,
            )
            self._scorers[f_name] = s
        return s

    def _term_buckets(self, fkey: str) -> list[int]:
        """The only merge buckets that can hold this posting key's rows."""
        salts = self._hot_salts if fkey in self._hot_set else [-1]
        return sorted(
            set(term_buckets([fkey] * len(salts), salts, self._num_buckets).tolist())
        )

    # ---------------- term access ----------------

    def term_statistics(
        self, term: str, fld: str | None = None
    ) -> tuple[int, int]:
        """(doc_freq, total_term_freq): exact global stats = sum of the
        term's merged chunk rows' metadata (column-pruned read; the
        TermStates accumulation of termstates.go:52-93 done at lookup)."""
        f_name = fld or self.default_field
        rows = self._rows_cache.get((f_name, term, False))
        if rows is None:
            rows = self._rows_cache.get((f_name, term, True))
        if rows is not None:
            return (
                sum(r["doc_freq"] for r in rows),
                sum(r["total_term_freq"] for r in rows),
            )
        if self.nrt:
            rows = self._term_rows(term, fld=fld)
            return (
                sum(r["doc_freq"] for r in rows),
                sum(r["total_term_freq"] for r in rows),
            )
        t = self.postings.read_term_rows(
            f_name,
            term,
            columns=["field", "term", "doc_freq", "total_term_freq"],
            buckets=self._term_buckets(posting_key(f_name, term)),
        )
        if t.num_rows == 0:
            return 0, 0
        return (
            int(pc.sum(t["doc_freq"]).as_py()),
            int(pc.sum(t["total_term_freq"]).as_py()),
        )

    def _term_rows(
        self, term: str, fld: str | None = None, with_positions: bool = False
    ) -> list[dict]:
        """Chunk rows for a term, cached; position blobs (the dominant bytes
        for hot terms) are only read when the query actually needs them."""
        f_name = fld or self.default_field
        key = (f_name, term, with_positions)
        rows = self._rows_cache.get(key)
        if rows is None and not with_positions:
            rows = self._rows_cache.get((f_name, term, True))  # superset ok
        if rows is None:
            if self.nrt:
                rows = self._nrt_term_rows(f_name, term, with_positions)
            else:
                # v7 meta rows carry no streams — positions resolve to the
                # same meta read; the pos bytes are pread on demand
                t = self.postings.read_term_rows(
                    f_name,
                    term,
                    columns=_META_COLUMNS,
                    buckets=self._term_buckets(posting_key(f_name, term)),
                )
                rows = (
                    sorted(t.to_pylist(), key=lambda r: r["first_doc"])
                    if t.num_rows
                    else []
                )
                for r in rows:
                    r["_blob_file"] = self.postings.blob_file(r.pop("_file"))
            self._rows_cache[key] = rows
        return rows

    def _nrt_term_rows(
        self, f_name: str, term: str, with_positions: bool
    ) -> list[dict]:
        """Unmerged-commit term lookup: probe every segment's term table
        (filter pushdown prunes row groups by the (field, term) sort).
        Row docIDs are segment-local — first/last_doc are rebased here and
        ``doc_base`` is attached for the post-decode offset."""
        cols = None if with_positions else _NO_POS_COLUMNS_SEGMENT
        rows: list[dict] = []
        for p in self.manifest.partitions:
            path = os.path.join(
                self.index_dir, "segments", f"p={int(p['pid']):05d}",
                "terms.parquet",
            )
            t = pq.read_table(
                path,
                columns=cols,
                filters=[("field", "=", f_name), ("term", "=", term)],
            )
            base = int(p["doc_base"])
            for r in t.to_pylist():
                r["doc_base"] = base
                r["first_doc"] = int(r["first_doc"]) + base
                r["last_doc"] = int(r["last_doc"]) + base
                rows.append(r)
        return sorted(rows, key=lambda r: r["first_doc"])

    def term_postings(
        self, term: str, fld: str | None = None, with_positions: bool = False
    ) -> dict | None:
        key = (fld or self.default_field, term, with_positions, self._doc_range)
        if key in self._postings_cache:
            return self._postings_cache[key]
        # shared decoded-postings map (object store, set by the batch-query
        # driver): heavy terms are decoded ONCE cluster-wide and read here
        # zero-copy instead of once per worker that mentions them
        shared = getattr(self, "_shared_postings", None)
        if shared is not None and self._doc_range is None:
            fkey = posting_key(fld or self.default_field, term)
            ref = shared.get(fkey)
            if ref is not None:
                import ray as _r

                p = _r.get(ref)  # zero-copy numpy views over plasma
                if p is not None and (not with_positions or "positions" in p):
                    self._postings_cache[key] = p
                    return p
        rows = self._term_rows(term, fld=fld, with_positions=with_positions)
        if self._doc_range is not None:
            # chunk-level pruning: a shard decodes ONLY the chunk rows whose
            # [first_doc, last_doc] overlaps its doc range
            lo, hi = self._doc_range
            rows = [r for r in rows if r["last_doc"] >= lo and r["first_doc"] <= hi]
        if not rows:
            self._postings_cache[key] = None
            return None
        parts = [
            self.codec.decode_docs_freqs_norms(r, self.cfg.block_size)
            for r in rows
        ]
        out = {
            # NRT rows decode segment-LOCAL docIDs; doc_base rebases them
            # (merged rows carry no doc_base — already global)
            "docs": np.concatenate(
                [p[0] + r.get("doc_base", 0) for p, r in zip(parts, rows)]
            ),
            "freqs": np.concatenate([p[1] for p in parts]),
            "norms8": np.concatenate([p[2] for p in parts]),
        }
        if with_positions:
            out["positions"] = np.concatenate(
                [
                    self.codec.decode_positions(r, p[1])
                    for r, p in zip(rows, parts)
                ]
            )
        if self._doc_range is not None:
            lo, hi = self._doc_range
            a = int(np.searchsorted(out["docs"], lo))
            b = int(np.searchsorted(out["docs"], hi + 1))
            if with_positions:
                poff = np.concatenate([[0], np.cumsum(out["freqs"])])
                out["positions"] = out["positions"][poff[a] : poff[b]]
            out["docs"] = out["docs"][a:b]
            out["freqs"] = out["freqs"][a:b]
            out["norms8"] = out["norms8"][a:b]
        self._postings_cache[key] = out
        return out

    # ---------------- public API ----------------

    def _apply_live_docs(self, docs: np.ndarray) -> np.ndarray:
        """Drop tombstoned docIDs (both arrays sorted)."""
        if len(self.deleted) == 0 or len(docs) == 0:
            return docs
        return docs[~_membership(docs, self.deleted).astype(bool)]

    def _apply_live(self, s: _Scored) -> _Scored:
        if len(self.deleted) == 0 or len(s.docs) == 0:
            return s
        keep = ~_membership(s.docs, self.deleted).astype(bool)
        return _Scored(
            s.docs[keep], s.scores[keep] if s.scores is not None else None
        )

    def count(self, query: Query) -> int:
        s = self._eval(query.rewrite(), 1.0, need_scores=False)
        return len(self._apply_live_docs(s.docs))

    def search(
        self,
        query: Query,
        k: int = 10,
        *,
        prune: bool = False,
        with_keys: bool = False,
    ) -> TopDocs:
        query = query.rewrite()
        if prune:
            pruned = self._try_pruned(query, k)
            if pruned is not None:
                if with_keys:
                    pruned.keys = self.lookup_keys(pruned.doc_ids)
                return pruned
        s = self._apply_live(self._eval(query, 1.0, need_scores=True))
        td = _topk(s, k)
        if with_keys:
            td.keys = self.lookup_keys(td.doc_ids)
        return td

    def search_after(
        self, query: Query, after: tuple[float, int] | None, k: int = 10
    ) -> TopDocs:
        """Paging: top-k hits strictly after ``(score, doc_id)`` in
        (score desc, docID asc) order — PagingTopScoreDocCollector
        (/root/reference/core/search/topscoredoccollector.go:235+,
        indexsearcher.go:223-262)."""
        s = self._apply_live(self._eval(query.rewrite(), 1.0, need_scores=True))
        if after is not None:
            a_score, a_doc = after
            keep = (s.scores < a_score) | ((s.scores == a_score) & (s.docs > a_doc))
            s = _Scored(s.docs[keep], s.scores[keep])
        return _topk(s, k)

    def search_sharded(
        self,
        query: Query,
        k: int = 10,
        num_shards: int = 8,
        *,
        prune: bool = False,
        wand_min_postings: int | None = None,
    ) -> TopDocs:
        """Single-query evaluation sharded over disjoint global-docID ranges
        as parallel Ray tasks, then a driver top-k merge — the leaf-slice
        CollectorManager (/root/reference/core/search/indexsearcher.go:295-361)
        distributed. This is the scale path for one query whose posting
        lists exceed one worker: each shard reads + decodes ONLY the chunk
        rows overlapping its range (chunk-level pruning in term_postings),
        so per-task memory is bounded by range size, not term df.
        Rank-identical to ``search`` (asserted in tests)."""
        import ray

        max_doc = self.manifest.max_doc
        num_shards = max(1, min(num_shards, max_doc))
        bounds = np.linspace(0, max_doc, num_shards + 1).astype(np.int64)
        q = query.rewrite()
        # shared min-competitive accumulator across shards (perf-only,
        # rank-preserving: shards drop only docs STRICTLY below the global
        # kth-best-so-far — maxscoreaccumulator.go distributed)
        theta_handle = (
            _ThetaAccumulator.remote() if prune and num_shards > 1 else None
        )
        futs = [
            _search_shard.remote(
                self.index_dir, q, int(bounds[i]), int(bounds[i + 1]) - 1, k,
                prune, wand_min_postings, theta_handle,
            )
            for i in range(num_shards)
            if bounds[i + 1] > bounds[i]
        ]
        parts = ray.get(futs)
        docs = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))  # exact: ranges are disjoint
        td = _topk(_Scored(docs, scores), k)
        td.total_hits = total
        return td

    def search_with_collector(self, query: Query, manager):
        """Run a user CollectorManager over the match set — the pluggable
        Collector surface (/root/reference/core/search/collector.go:1):
        one collector, vectorized ``collect(docs, scores)`` on the full
        live-filtered candidate arrays, then ``manager.reduce``."""
        q = query.rewrite()
        c = manager.new_collector()
        c.set_context(self)
        s = self._apply_live(self._eval(q, 1.0, need_scores=c.needs_scores))
        c.collect(s.docs, s.scores)
        c.finish()
        return manager.reduce([c])

    def search_with_collector_sharded(
        self, query: Query, manager, num_shards: int = 8
    ):
        """CollectorManager sharded over disjoint global-docID ranges as
        parallel Ray tasks (the leaf-slice contract of
        /root/reference/core/search/indexsearcher.go:295-361): each task
        builds one collector via ``manager.new_collector()``, collects its
        range, and ships the collector's state back for
        ``manager.reduce`` on the driver. Managers and collectors must be
        picklable; ``finish()`` drops searcher references first."""
        import ray

        max_doc = self.manifest.max_doc
        num_shards = max(1, min(num_shards, max_doc))
        bounds = np.linspace(0, max_doc, num_shards + 1).astype(np.int64)
        q = query.rewrite()
        futs = [
            _collect_shard.remote(
                self.index_dir, q, int(bounds[i]), int(bounds[i + 1]) - 1, manager
            )
            for i in range(num_shards)
            if bounds[i + 1] > bounds[i]
        ]
        return manager.reduce(ray.get(futs))

    def dv_values(self, docs: np.ndarray, fld: str) -> tuple[np.ndarray, np.ndarray]:
        """(values:int64, valid:bool) of a doc-values field aligned with
        ``docs`` (sorted global docIDs) — the collector-facing NumericDocValues
        gather: one cached per-segment column read, vectorized ords."""
        vals = np.zeros(len(docs), np.int64)
        valid = np.zeros(len(docs), bool)
        for i, p in enumerate(self.manifest.partitions):
            base, n = self._doc_bases[i], int(p["num_docs"])
            a = int(np.searchsorted(docs, base))
            b = int(np.searchsorted(docs, base + n))
            if a == b:
                continue
            v, ok = self._dv_column(self._pids[i], fld)
            ords = docs[a:b] - base
            vals[a:b] = v[ords]
            valid[a:b] = ok[ords]
        return vals, valid

    def field_value_counts(self, docs: np.ndarray, fld: str) -> dict:
        """value -> count of a KEYWORD field over ``docs`` (sorted global
        docIDs) — the facet-collector gather, postings-based like Lucene's
        facets-over-doc-sets: walk the field's term dictionary once, then
        one sorted-membership count per distinct value (keyword-field
        cardinality is small; never a per-row loop). The per-worker
        postings cache makes repeated collect batches cheap."""
        out: dict = {}
        if len(docs) == 0:
            return out
        for v in self.expand_terms(fld, "", "\U0010ffff"):
            p = self.term_postings(v, fld=fld)
            if p is None or len(p["docs"]) == 0:
                continue
            c = int(_membership(docs, p["docs"]).sum())
            if c:
                out[v] = out.get(v, 0) + c
        return out

    def explain(self, query: Query, doc_id: int) -> dict:
        """Score breakdown for one document — the reference's
        ``Weight.Explain`` surface (/root/reference/core/search/termquery.go,
        similaritybm25.go Explain methods), as a nested dict:
        ``{value, description, details: [...]}``; value == 0 with
        'no matching term' when the doc does not match."""
        q = query.rewrite()
        return self._explain(q, 1.0, int(doc_id))

    def _explain(self, q: Query, boost: float, doc: int) -> dict:
        if isinstance(q, BoostQuery):
            return self._explain(q.query, boost * q.boost, doc)
        if isinstance(q, MatchNoDocsQuery):
            return {
                "value": 0.0,
                "description": f"MatchNoDocsQuery({q.reason!r})",
            }
        if isinstance(q, TermQuery):
            p = self.term_postings(q.term, fld=q.field)
            f_name = q.field or self.default_field
            if p is None:
                return {"value": 0.0, "description": f"no term {q.term!r}"}
            i = int(np.searchsorted(p["docs"], doc))
            if i >= len(p["docs"]) or p["docs"][i] != doc:
                return {
                    "value": 0.0,
                    "description": f"no matching term {q.term!r} in doc {doc}",
                }
            df, _ = self.term_statistics(q.term, fld=q.field)
            scorer = self.scorer_for(q.field)
            w = scorer.weight(df, boost)
            freq = float(p["freqs"][i])
            norm8 = int(p["norms8"][i])
            val = float(scorer.score(w, np.array([freq]), np.array([norm8]))[0])
            return {
                "value": val,
                "description": f"weight({f_name}:{q.term} in {doc}) [BM25]",
                "details": [
                    {
                        "value": boost * 1.0 if boost != 1.0 else 1.0,
                        "description": f"boost {boost}",
                    },
                    {
                        "value": idf(df, scorer.doc_count),
                        "description": f"idf, n={df}, N={scorer.doc_count}",
                    },
                    {
                        "value": freq,
                        "description": "freq, occurrences of term within document",
                    },
                    {
                        "value": float(norm8),
                        "description": "norm & 0xFF (doc length, wrapped)",
                    },
                    {"value": scorer.avgdl, "description": "avgdl"},
                ],
            }
        # generic: evaluate and gather the doc's score; per-clause details
        ev = self._eval(q, boost, need_scores=True)
        i = int(np.searchsorted(ev.docs, doc))
        matched = i < len(ev.docs) and ev.docs[i] == doc
        out = {
            "value": float(ev.scores[i]) if matched else 0.0,
            "description": f"{type(q).__name__}"
            + ("" if matched else f": no match for doc {doc}"),
        }
        if isinstance(q, BooleanQuery):
            out["details"] = [
                self._explain(c.query, boost, doc)
                for c in q.clauses
                if c.occur in (Occur.MUST, Occur.SHOULD)
            ]
        elif isinstance(q, DisjunctionMaxQuery):
            out["details"] = [self._explain(d, boost, doc) for d in q.disjuncts]
        return out

    def lookup_keys(self, doc_ids: np.ndarray) -> list:
        """Stored-key retrieval: global docID -> (partition, ord) -> docmap row
        (the reader.Document stored-fields visit, SURVEY.md §2.4)."""
        keys = []
        for d in doc_ids:
            d = int(d)
            i = bisect.bisect_right(self._doc_bases, d) - 1
            pid = self._pids[i]
            dm = self._docmap_cache.get(pid)
            if dm is None:
                dm = pq.read_table(
                    os.path.join(
                        self.index_dir, "segments", f"p={pid:05d}", "docmap.parquet"
                    ),
                    columns=["key"],
                )
                self._docmap_cache[pid] = dm
            keys.append(dm["key"][d - self._doc_bases[i]].as_py())
        return keys

    def expand_terms(self, fld: str, lo: str, hi: str) -> list[str]:
        """Dictionary terms of ``fld`` in [lo, hi]: range-index probe on the
        merged index, per-segment term-table scan in NRT mode."""
        if not self.nrt:
            return self.postings.expand_terms(fld, lo, hi)
        terms: set[str] = set()
        for p in self.manifest.partitions:
            path = os.path.join(
                self.index_dir, "segments", f"p={int(p['pid']):05d}",
                "terms.parquet",
            )
            t = pq.read_table(
                path,
                columns=["field", "term"],
                filters=[
                    ("field", "=", fld),
                    ("term", ">=", lo),
                    ("term", "<=", hi),
                ],
            )
            terms.update(t["term"].to_pylist())
        return sorted(terms)

    def expand_terms_stats(self, fld: str, lo: str, hi: str) -> pa.Table:
        """(term, doc_freq) for dictionary terms in [lo, hi], read in ONE
        pass over the same row groups ``expand_terms`` touches (merged
        range-index probe, or per-segment scans in NRT mode) — no
        per-candidate ``term_statistics`` round-trips."""
        if not self.nrt:
            return self.postings.expand_terms_stats(fld, lo, hi)
        parts = []
        for p in self.manifest.partitions:
            path = os.path.join(
                self.index_dir, "segments", f"p={int(p['pid']):05d}",
                "terms.parquet",
            )
            t = pq.read_table(
                path,
                columns=["field", "term", "doc_freq"],
                filters=[
                    ("field", "=", fld),
                    ("term", ">=", lo),
                    ("term", "<=", hi),
                ],
            )
            if len(t):
                parts.append(t.select(["term", "doc_freq"]))
        if not parts:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "doc_freq": pa.array([], pa.int64())}
            )
        return (
            pa.concat_tables(parts)
            .group_by("term")
            .aggregate([("doc_freq", "sum")])
            .rename_columns(["term", "doc_freq"])
        )

    def document(self, doc_id: int, columns: list[str] | None = None) -> dict:
        """Full stored-document retrieval — the ``reader.Document(docID)``
        all-stored-fields visit (/root/reference/core/index/indexreader.go,
        codecs/simpletext/storedfieldsreader.go): global docID ->
        (partition, ord) via the manifest lineage, then ONE source-parquet
        row read (row-group pruned, column-pruned). The source files are
        the stored-fields store — nothing is duplicated into the index."""
        d = int(doc_id)
        if not 0 <= d < self.manifest.max_doc:
            raise IndexError(f"doc_id {d} out of range")
        i = bisect.bisect_right(self._doc_bases, d) - 1
        p = self.manifest.partitions[i]
        ord_ = d - self._doc_bases[i]
        pf = pq.ParquetFile(p["path"])
        md = pf.metadata
        row = int(p["row_start"]) + ord_
        base = 0
        for rg in list(p["row_groups"]):
            n = md.row_group(int(rg)).num_rows
            if base + n > row:
                t = pf.read_row_group(int(rg), columns=columns)
                return {
                    c: t[c][row - base].as_py() for c in t.column_names
                }
            base += n
        raise IndexError(f"doc_id {d}: ord {ord_} beyond partition rows")

    def term_offsets(self, term: str, doc_id: int) -> tuple[list, list]:
        """(starts, ends) byte offsets of ``term``'s occurrences in one doc
        (highlighting surface; requires an index built with
        ``index_offsets=True``). Reads only the doc's segment's offsets
        side table, term-pruned by parquet row-group statistics."""
        d = int(doc_id)
        i = bisect.bisect_right(self._doc_bases, d) - 1
        pid = self._pids[i]
        ord_ = d - self._doc_bases[i]
        path = os.path.join(
            self.index_dir, "segments", f"p={pid:05d}", "offsets.parquet"
        )
        if not os.path.exists(path):
            raise FileNotFoundError(
                "offsets stream absent — build with IndexConfig(index_offsets=True)"
            )
        t = pq.read_table(
            path, filters=[("term", "=", term), ("ord", "=", ord_)]
        )
        if t.num_rows == 0:
            return [], []
        return t["starts"][0].as_py(), t["ends"][0].as_py()

    def _value_bases(self, doc_id: int) -> tuple[np.ndarray, np.ndarray]:
        """(pos_bases, off_bases) of each VALUE of a multi-valued text doc
        — the stream counters at each value's start (persisted at build
        for index_offsets indexes). Single-valued docs (no table) are one
        value at base 0."""
        d = int(doc_id)
        i = bisect.bisect_right(self._doc_bases, d) - 1
        pid = self._pids[i]
        ord_ = d - self._doc_bases[i]
        path = os.path.join(
            self.index_dir, "segments", f"p={pid:05d}", "value_bases.parquet"
        )
        if not os.path.exists(path):
            z = np.zeros(1, dtype=np.int64)
            return z, z
        t = pq.read_table(path, filters=[("ord", "=", ord_)])
        if t.num_rows == 0:
            z = np.zeros(1, dtype=np.int64)
            return z, z
        return (
            np.asarray(t["pos_base"][0].as_py(), dtype=np.int64),
            np.asarray(t["off_base"][0].as_py(), dtype=np.int64),
        )

    def match_regions(
        self, doc_id: int, terms
    ) -> list[tuple[int, int, int, int]]:
        """(value_idx, actual_start, actual_end, position) of every
        occurrence of ``terms`` in one doc, resolved ENTIRELY from the
        index (positions postings + offsets stream + value bases) — the
        MatchesIterator offset surface (/root/reference/core/search/
        matches.go, termmatchesiterator.go) for single- AND multi-valued
        fields. Inversion of the tokenizer quirk (reported start = actual
        + full-stream token index, tokenizer.go:168-170) per value:
        value j = rightmost pos_base <= position; within-value index
        p = position - pos_base[j]; actual = reported - off_base[j] - p.

        Tuples are (value, start, end, position, term) — one pass reads
        the doc's value-bases table ONCE for the whole term set."""
        out: list[tuple[int, int, int, int, str]] = []
        pos_bases = off_bases = None
        for t in sorted(set(terms)):
            starts, ends = self.term_offsets(t, doc_id)
            if not starts:
                continue
            post = self.term_postings(t, with_positions=True)
            if post is None:
                continue
            docs = post["docs"]
            i = int(np.searchsorted(docs, doc_id))
            if i >= len(docs) or docs[i] != doc_id:
                continue
            if pos_bases is None:
                pos_bases, off_bases = self._value_bases(doc_id)
            freqs = post["freqs"]
            pstart = int(freqs[:i].sum())
            f = int(freqs[i])
            pos = post["positions"][pstart : pstart + f].astype(np.int64)
            vj = np.searchsorted(pos_bases, pos, side="right") - 1
            p_in = pos - pos_bases[vj]
            s = np.asarray(starts, dtype=np.int64) - off_bases[vj] - p_in
            e = np.asarray(ends, dtype=np.int64) - off_bases[vj] - p_in
            out.extend(
                (int(v), int(a), int(b), int(p), t)
                for v, a, b, p in zip(vj, s, e, pos)
            )
        out.sort(key=lambda r: (r[0], r[1], r[3]))
        return out

    def matches(self, query: Query, doc_id: int) -> list[dict] | None:
        """Per-hit match introspection — the Matches / MatchesIterator API
        (/root/reference/core/search/matches.go, termmatchesiterator.go,
        disjunctionmatchesiterator.go): the DEFAULT-field terms the
        rewritten query matches on (same term source as the highlighter),
        each occurrence in ``doc_id`` as {term, position, start_offset,
        end_offset, value_index}, disjunction-merged in position order.
        Offsets are actual per-value byte offsets (None when the index
        was built without ``index_offsets``). Returns None when the query
        matches nothing in this doc (MatchesUtils.MATCH_NONE)."""
        terms = set(self.highlight_terms(query))
        have_offsets = os.path.exists(
            os.path.join(
                self.index_dir,
                "segments",
                f"p={self._pids[0]:05d}",
                "offsets.parquet",
            )
        )
        rows: list[dict] = []
        if have_offsets:
            # ONE match_regions pass for the whole term set (value bases
            # and per-term postings each read once)
            regs = sorted(
                self.match_regions(doc_id, terms),
                key=lambda r: (r[3], r[4]),
            )
            for v, a, b, p, t in regs:
                rows.append(
                    {
                        "term": t,
                        "position": int(p),
                        "start_offset": int(a),
                        "end_offset": int(b),
                        "value_index": int(v),
                    }
                )
        else:
            for t in sorted(terms):
                post = self.term_postings(t, with_positions=True)
                if post is None:
                    continue
                docs = post["docs"]
                i = int(np.searchsorted(docs, doc_id))
                if i >= len(docs) or docs[i] != doc_id:
                    continue
                freqs = post["freqs"]
                pstart = int(freqs[:i].sum())
                for p in post["positions"][pstart : pstart + int(freqs[i])]:
                    rows.append(
                        {
                            "term": t,
                            "position": int(p),
                            "start_offset": None,
                            "end_offset": None,
                            "value_index": None,
                        }
                    )
            rows.sort(key=lambda r: (r["position"], r["term"]))
        return rows or None

    def term_payloads(self, term: str, doc_id: int) -> list[int]:
        """Per-occurrence payload values of ``term`` in one doc, in
        positions-stream occurrence order — the PayloadAttribute read
        surface (/root/reference/core/index/freqproxtermswriterperfield.go
        :124-218 hasPayload prox bit; see index/payloads.py). Requires an
        index built with ``IndexConfig.payload_kind`` set. Reads only the
        doc's segment's payloads side table, term-pruned by parquet
        row-group statistics."""
        d = int(doc_id)
        i = bisect.bisect_right(self._doc_bases, d) - 1
        pid = self._pids[i]
        ord_ = d - self._doc_bases[i]
        path = os.path.join(
            self.index_dir, "segments", f"p={pid:05d}", "payloads.parquet"
        )
        if not os.path.exists(path):
            raise FileNotFoundError(
                "payload stream absent — build with IndexConfig(payload_kind=...)"
            )
        t = pq.read_table(
            path, filters=[("term", "=", term), ("ord", "=", ord_)]
        )
        if t.num_rows == 0:
            return []
        return t["payloads"][0].as_py()

    def highlight_terms(self, query: Query) -> list[str]:
        """The DEFAULT-text-field terms a query actually matches on,
        collected after rewrite — what a highlighter should mark. Literal
        terms come from TermQuery/PhraseQuery/TermInSetQuery; expansion
        queries (prefix/range/wildcard/fuzzy/regexp) contribute their
        dictionary expansions; MUST_NOT clauses and non-text queries
        (numeric/range/exists/docID) contribute nothing."""
        out: list[str] = []
        seen: set[str] = set()

        def is_text(f) -> bool:
            return f is None or f == self.default_field

        def add(ts) -> None:
            for t in ts:
                if t not in seen:
                    seen.add(t)
                    out.append(t)

        def walk(q: Query) -> None:
            if isinstance(q, TermQuery) and is_text(q.field):
                add([q.term])
            elif isinstance(q, PhraseQuery) and is_text(q.field):
                add(q.terms)
            elif isinstance(q, TermInSetQuery) and is_text(q.field):
                add(q.terms)
            elif isinstance(q, PrefixQuery) and is_text(q.field):
                add(self.expand_terms(
                    self.default_field, q.prefix, q.prefix + "\U0010ffff"
                ))
            elif isinstance(q, TermRangeQuery) and is_text(q.field):
                add(self.expand_terms(self.default_field, q.lower, q.upper))
            elif isinstance(q, WildcardQuery) and is_text(q.field):
                add(self._expand_wildcard(self.default_field, q.pattern))
            elif isinstance(q, RegexpQuery) and is_text(q.field):
                add(self._expand_regexp(self.default_field, q.pattern))
            elif isinstance(q, FuzzyQuery) and is_text(q.field):
                add(self._expand_fuzzy(
                    self.default_field, q.term, q.max_edits, q.prefix_length
                ))
            elif isinstance(q, SpanNearQuery) and is_text(q.field):
                add(
                    t
                    for c in q.terms
                    for t in ((c,) if isinstance(c, str) else c)
                )
            elif isinstance(q, SpanFirstQuery) and is_text(q.field):
                add([q.term])
            elif isinstance(q, SpanNotQuery) and is_text(q.field):
                add([q.include])  # the exclude clause never matches text
            elif isinstance(q, (BoostQuery, ConstantScoreQuery)):
                walk(q.query)
            elif isinstance(q, DisjunctionMaxQuery):
                for d in q.disjuncts:
                    walk(d)
            elif isinstance(q, BooleanQuery):
                for c in q.clauses:
                    if c.occur is not Occur.MUST_NOT:
                        walk(c.query)

        walk(query.rewrite())
        return out

    def highlight(self, doc_id: int, terms, **kw) -> list[str]:
        """Snippet extraction around query-term hits (see
        search/highlight.py — re-analyze mode by default, offsets-stream
        mode with ``use_offsets=True``)."""
        from .highlight import highlight as _hl

        return _hl(self, doc_id, terms, **kw)

    def term_vector(
        self, doc_id: int, field: str | None = None
    ) -> pa.Table:
        """One document's term vector — ``reader.GetTermVector(docID,
        field)`` (/root/reference/core/index/indexreader.go; stored when
        FieldType.StoreTermVectors is set, fieldtype.go:10-25). Returns
        (field, term, freq, positions) sorted by (field, term); requires
        an index built with ``index_term_vectors=True``. Reads only the
        doc's segment's tvec side table, ord-pruned by parquet row-group
        statistics."""
        d = int(doc_id)
        i = bisect.bisect_right(self._doc_bases, d) - 1
        pid = self._pids[i]
        ord_ = d - self._doc_bases[i]
        path = os.path.join(
            self.index_dir, "segments", f"p={pid:05d}", "tvec.parquet"
        )
        if not os.path.exists(path):
            raise FileNotFoundError(
                "term vectors absent — build with "
                "IndexConfig(index_term_vectors=True)"
            )
        filters = [("ord", "=", ord_)]
        if field is not None:
            filters.append(("field", "=", field))
        t = pq.read_table(path, filters=filters)
        return t.drop_columns(["ord"])

    # ---------------- doc-values range evaluation --------------------------

    def _dv_column(self, pid: int, fld: str) -> tuple[np.ndarray, np.ndarray]:
        """(values:int64, valid:bool) for one segment's doc-values column,
        cached per (pid, field)."""
        key = (pid, fld)
        cached = self._dv_cache.get(key)
        if cached is None:
            t = pq.read_table(
                os.path.join(
                    self.index_dir, "segments", f"p={pid:05d}", "docmap.parquet"
                ),
                columns=[f"dv_{fld}"],
            )
            arr = t[f"dv_{fld}"].combine_chunks()
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
            vals = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            upd = self._dv_upd.get(fld)
            if upd is not None:
                # overlay the newest-generation updates for this segment's
                # docID range (docvaluesfieldupdates.go applied at read)
                i = self._pids.index(pid)
                base = self._doc_bases[i]
                u_ids, u_vals = upd
                a = int(np.searchsorted(u_ids, base))
                b = int(np.searchsorted(u_ids, base + len(vals)))
                if a < b:
                    vals = vals.copy()
                    valid = valid.copy()
                    ords = u_ids[a:b] - base
                    vals[ords] = u_vals[a:b]
                    valid[ords] = True
            cached = (vals, valid)
            self._dv_cache[key] = cached
        return cached

    def _sdv_column(self, pid: int, fld: str) -> tuple[np.ndarray, np.ndarray]:
        """(values:object ndarray, valid:bool) for one segment's
        string/binary/set doc-values column (SORTED / SORTED_SET / BINARY,
        /root/reference/codecs/simpletext/docvaluesreader.go:129,326),
        cached per (pid, field). Values are python str / bytes / list."""
        key = ("s", pid, fld)
        cached = self._dv_cache.get(key)
        if cached is None:
            t = pq.read_table(
                os.path.join(
                    self.index_dir, "segments", f"p={pid:05d}", "docmap.parquet"
                ),
                columns=[f"sdv_{fld}"],
            )
            arr = t[f"sdv_{fld}"].combine_chunks()
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
            vals = np.asarray(arr.to_pylist(), dtype=object)
            cached = (vals, valid)
            self._dv_cache[key] = cached
        return cached

    def sdv_values(self, docs: np.ndarray, fld: str) -> tuple[np.ndarray, np.ndarray]:
        """(values:object, valid:bool) of a string/binary doc-values field
        aligned with ``docs`` (sorted global docIDs) — the SortedDocValues
        / BinaryDocValues gather; per-segment column read, cached."""
        vals = np.empty(len(docs), object)
        valid = np.zeros(len(docs), bool)
        for i, p in enumerate(self.manifest.partitions):
            base, n = self._doc_bases[i], int(p["num_docs"])
            a = int(np.searchsorted(docs, base))
            b = int(np.searchsorted(docs, base + n))
            if a == b:
                continue
            v, ok = self._sdv_column(self._pids[i], fld)
            ords = docs[a:b] - base
            vals[a:b] = v[ords]
            valid[a:b] = ok[ords]
        return vals, valid

    def _dv_zone(self, p, fld: str):
        """Segment zone range for pruning, widened by the dv-update
        overlay's value envelope when ``fld`` has pending updates (the
        manifest range may be stale for updated docs; the envelope keeps
        pruning sound without a rebuild). None = no recorded range."""
        zr = (p.get("dv_ranges") or {}).get(fld)
        upd = self._dv_upd.get(fld)
        if zr is not None and upd is not None and len(upd[1]):
            return [
                min(int(zr[0]), int(upd[1].min())),
                max(int(zr[1]), int(upd[1].max())),
            ]
        return zr

    def _numeric_range_docs(self, fld: str, lo: int, hi: int) -> np.ndarray:
        """Sorted global docIDs whose doc-values ``fld`` ∈ [lo, hi].

        Two pruning levels before any value is read: the sharded doc range
        (search_sharded) and the per-segment min/max zone map recorded at
        build (manifest dv_ranges) — the BKD cell-level skip of
        pointrangequery.go, at segment granularity. Only overlapping
        segments' docmap columns are read (and cached)."""
        rlo, rhi = self._doc_range or (0, self.manifest.max_doc - 1)
        out = []
        for p in self.manifest.partitions:
            base, n = int(p["doc_base"]), int(p["num_docs"])
            if base + n - 1 < rlo or base > rhi:
                continue
            zr = self._dv_zone(p, fld)
            if zr is None or zr[1] < lo or zr[0] > hi:
                continue
            vals, valid = self._dv_column(int(p["pid"]), fld)
            mask = valid & (vals >= lo) & (vals <= hi)
            a = max(0, rlo - base)
            b = min(n, rhi - base + 1)
            if a > 0 or b < n:
                m2 = np.zeros(n, dtype=bool)
                m2[a:b] = mask[a:b]
                mask = m2
            ords = np.flatnonzero(mask)
            if len(ords):
                out.append(base + ords.astype(np.int64))
        if not out:
            return np.empty(0, np.int64)
        return np.concatenate(out)  # pid-ordered bases => globally sorted

    def _segment_mask_docs(self, mask_fn) -> np.ndarray:
        """Shared per-segment scan: ``mask_fn(p) -> bool array | None``
        produces each partition's match mask (None = zone-pruned); doc-range
        clipping and global-docID assembly are common to every doc-values
        query (range / set / box / exists)."""
        rlo, rhi = self._doc_range or (0, self.manifest.max_doc - 1)
        out = []
        for p in self.manifest.partitions:
            base, n = int(p["doc_base"]), int(p["num_docs"])
            if base + n - 1 < rlo or base > rhi:
                continue
            mask = mask_fn(p)
            if mask is None:
                continue
            a = max(0, rlo - base)
            b = min(n, rhi - base + 1)
            if a > 0 or b < n:
                m2 = np.zeros(n, dtype=bool)
                m2[a:b] = mask[a:b]
                mask = m2
            ords = np.flatnonzero(mask)
            if len(ords):
                out.append(base + ords.astype(np.int64))
        if not out:
            return np.empty(0, np.int64)
        return np.concatenate(out)  # pid-ordered bases => globally sorted

    def _numeric_set_docs(self, fld: str, values: tuple) -> np.ndarray:
        """PointInSetQuery analogue: docs whose doc-values ``fld`` is in
        ``values`` (sorted ints). Zone maps prune segments whose [min, max]
        misses the set ENVELOPE; matching is one vectorized np.isin.
        Reference surface: /root/reference/core/search/pointinsetquery.go:1
        (337 LoC of BKD traversal; the docmap column + zone map replace the
        tree)."""
        if not values:
            return np.empty(0, np.int64)
        varr = np.asarray(values, dtype=np.int64)
        vmin, vmax = int(varr[0]), int(varr[-1])

        def mask_fn(p):
            zr = self._dv_zone(p, fld)
            if zr is None or zr[1] < vmin or zr[0] > vmax:
                return None
            vals, valid = self._dv_column(int(p["pid"]), fld)
            return valid & np.isin(vals, varr)

        return self._segment_mask_docs(mask_fn)

    def _numeric_box_docs(self, q: NumericBoxQuery) -> np.ndarray:
        """2-D box (lat/lon analogue, /root/reference/core/document/latlon.go):
        a segment is read only when BOTH dimensions' zone maps overlap the
        box — the BKD 2-D cell skip at segment granularity — then one fused
        vectorized mask over the two docmap columns."""

        def mask_fn(p):
            zx, zy = self._dv_zone(p, q.field_x), self._dv_zone(p, q.field_y)
            if zx is None or zx[1] < q.lo_x or zx[0] > q.hi_x:
                return None
            if zy is None or zy[1] < q.lo_y or zy[0] > q.hi_y:
                return None
            vx, okx = self._dv_column(int(p["pid"]), q.field_x)
            vy, oky = self._dv_column(int(p["pid"]), q.field_y)
            return (
                okx & oky
                & (vx >= q.lo_x) & (vx <= q.hi_x)
                & (vy >= q.lo_y) & (vy <= q.hi_y)
            )

        return self._segment_mask_docs(mask_fn)

    def _range_field_docs(self, q: RangeFieldQuery) -> np.ndarray:
        """RangeFieldQuery evaluation (core/query/rangefieldquery.go
        semantics) over the dv_{field}_lo / dv_{field}_hi docmap columns.

        Relation-specific zone pruning before any value read (the BKD
        Relation.CELL_OUTSIDE_QUERY skip at segment granularity):
          intersects/crosses: skip if every d_lo > hi or every d_hi < lo
          within:             skip if every d_lo < lo or every d_hi > hi
          contains:           skip if every d_lo > lo or every d_hi < hi
        """
        flo, fhi = f"{q.field}_lo", f"{q.field}_hi"

        def mask_fn(p):
            zlo, zhi = self._dv_zone(p, flo), self._dv_zone(p, fhi)
            if zlo is None or zhi is None:
                return None
            if q.relation in ("intersects", "crosses"):
                if zlo[0] > q.hi or zhi[1] < q.lo:
                    return None
            elif q.relation == "within":
                if zlo[1] < q.lo or zhi[0] > q.hi:
                    return None
            else:  # contains
                if zlo[0] > q.lo or zhi[1] < q.hi:
                    return None
            dlo, ok_lo = self._dv_column(int(p["pid"]), flo)
            dhi, ok_hi = self._dv_column(int(p["pid"]), fhi)
            ok = ok_lo & ok_hi
            inter = (dlo <= q.hi) & (dhi >= q.lo)
            if q.relation == "intersects":
                return ok & inter
            within = (dlo >= q.lo) & (dhi <= q.hi)
            if q.relation == "within":
                return ok & within
            contains = (dlo <= q.lo) & (dhi >= q.hi)
            if q.relation == "contains":
                return ok & contains
            return ok & inter & ~within & ~contains  # crosses

        return self._segment_mask_docs(mask_fn)

    def _has_field_docs(self, fld: str) -> np.ndarray:
        """FieldExists via the per-segment ``hf_<field>`` docmap bitmap
        (text: >=1 surviving token; keyword: non-null), cached like a
        doc-values column."""

        def mask_fn(p):
            pid = int(p["pid"])
            key = (pid, f"__hf__{fld}")
            cached = self._dv_cache.get(key)
            if cached is None:
                t = pq.read_table(
                    os.path.join(
                        self.index_dir, "segments", f"p={pid:05d}",
                        "docmap.parquet",
                    ),
                    columns=[f"hf_{fld}"],
                )
                mask = (
                    t[f"hf_{fld}"]
                    .combine_chunks()
                    .fill_null(False)
                    .to_numpy(zero_copy_only=False)
                    .astype(bool)
                )
                cached = (mask, mask)
                self._dv_cache[key] = cached
            return cached[0]

        return self._segment_mask_docs(mask_fn)

    def _factor_prune(
        self, cands: list[str], factors: list[str], skip: str = ""
    ) -> list[str]:
        """Vectorized required-literal-factor pruning before the Python
        ``fullmatch`` loop: every match must CONTAIN each mandatory
        literal factor, so one Arrow ``match_substring`` pass per factor
        (longest two) cuts the candidate list to the factor hits — the
        trigram/factor prefilter of automaton-intersected terms enums
        (/root/reference/core/index/automatontermsenum.go intent).
        ``skip`` drops the factor already consumed by the range seek."""
        use = sorted(
            (f for f in factors if f and f != skip), key=len, reverse=True
        )[:2]
        if not use or not cands:
            return cands
        arr = pa.array(cands, type=pa.large_string())
        mask = pc.match_substring(arr, use[0])
        for f in use[1:]:
            mask = pc.and_(mask, pc.match_substring(arr, f))
        return arr.filter(mask).to_pylist()

    def _expand_wildcard(self, f_name: str, pattern: str) -> list[str]:
        """Dictionary expansion for WildcardQuery: seek the longest literal
        prefix, regex-filter candidates (only ``*``/``?`` are wild, the
        Lucene wildcard alphabet), cap at maxClauseCount=1024
        (/root/reference/core/search/booleanquery.go:13-15)."""
        import re

        cut = len(pattern)
        for ch in "*?":
            i = pattern.find(ch)
            if i != -1:
                cut = min(cut, i)
        prefix = pattern[:cut]
        rx = re.compile(
            "".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in pattern
            ),
            re.DOTALL,
        )
        # literal suffix after the LAST wildcard: when longer than the
        # literal prefix and the reversed dictionary exists, seek the
        # reversed suffix there (a leading-wildcard pattern like `*foo`
        # otherwise degrades to a full-vocabulary scan — the classic
        # ReversedWildcardFilter trick; reversing each hit restores the
        # original term)
        last = max(pattern.rfind("*"), pattern.rfind("?"))
        suffix = pattern[last + 1:] if last != -1 else ""
        factors = [r for r in re.split(r"[*?]+", pattern) if r]
        if self.revdict is not None and len(suffix) > len(prefix):
            rsuf = suffix[::-1]
            cands = [
                t[::-1]
                for t in self.revdict.expand_terms(
                    f_name, rsuf, rsuf + "\U0010ffff"
                )
            ]
            cands = self._factor_prune(cands, factors, skip=suffix)
            self.last_expand_stats = {"path": "rev", "candidates": len(cands)}
        else:
            cands = self.expand_terms(f_name, prefix, prefix + "\U0010ffff")
            cands = self._factor_prune(cands, factors, skip=prefix)
            self.last_expand_stats = {"path": "fwd", "candidates": len(cands)}
        terms = [t for t in cands if rx.fullmatch(t)]
        if len(terms) > MAX_CLAUSE_COUNT:
            raise ValueError(
                f"wildcard {pattern!r} expands to {len(terms)} terms "
                f"> maxClauseCount={MAX_CLAUSE_COUNT}"
            )
        return terms

    def _expand_regexp(self, f_name: str, pattern: str) -> list[str]:
        """Dictionary expansion for RegexpQuery, automaton-bounded in the
        sense of Lucene's CompiledAutomaton seek
        (/root/reference/core/index/automatontermsenum.go,
        core/util/automaton/ — the reference's impl panics): the parsed
        pattern yields its mandatory literal runs (prefix / suffix /
        inner factors, _regexp_literals), then

        1. literal prefix        -> forward dictionary range seek,
        2. else literal suffix   -> reversed-dictionary range seek,
        3. else                  -> full term range,

        and in every case the remaining mandatory factors prune the
        candidates VECTORIZED (match_substring) before the Python
        ``fullmatch`` loop — a non-prefix pattern like ``[a-z]*ar[kt]``
        fullmatches only the terms containing ``ar``, not the whole
        vocabulary. Capped at maxClauseCount=1024."""
        import re

        prefix, suffix, factors = _regexp_literals(pattern)
        rx = re.compile(pattern, re.DOTALL)
        if prefix:
            cands = self.expand_terms(f_name, prefix, prefix + "\U0010ffff")
            cands = self._factor_prune(cands, factors, skip=prefix)
            path = "fwd"
        elif self.revdict is not None and suffix:
            rsuf = suffix[::-1]
            cands = [
                t[::-1]
                for t in self.revdict.expand_terms(
                    f_name, rsuf, rsuf + "\U0010ffff"
                )
            ]
            cands = self._factor_prune(cands, factors, skip=suffix)
            path = "rev"
        else:
            cands = self.expand_terms(f_name, "", "\U0010ffff")
            cands = self._factor_prune(cands, factors)
            path = "scan+factor" if factors else "scan"
        self.last_expand_stats = {"path": path, "candidates": len(cands)}
        terms = [t for t in cands if rx.fullmatch(t)]
        if len(terms) > MAX_CLAUSE_COUNT:
            raise ValueError(
                f"regexp {pattern!r} expands to {len(terms)} terms "
                f"> maxClauseCount={MAX_CLAUSE_COUNT}"
            )
        return terms

    def _expand_fuzzy(
        self, f_name: str, term: str, max_edits: int, prefix_length: int
    ) -> list[str]:
        """Dictionary expansion for FuzzyQuery: candidates share the first
        ``prefix_length`` chars (dictionary range seek), then a bounded
        Levenshtein filter (length pre-filter + early-abort DP — the
        edit-distance automaton of the reference's panicking FuzzyQuery,
        done by expansion). Capped at maxClauseCount=1024."""
        prefix = term[:prefix_length]
        cands = self.expand_terms(f_name, prefix, prefix + "\U0010ffff")
        terms = [
            t for t in cands if _within_edits(term, t, max_edits)
        ]
        if len(terms) > MAX_CLAUSE_COUNT:
            raise ValueError(
                f"fuzzy {term!r}~{max_edits} expands to {len(terms)} terms "
                f"> maxClauseCount={MAX_CLAUSE_COUNT}"
            )
        return terms

    # ---------------- evaluation (exhaustive, rank-authoritative) ----------

    def _eval(self, q: Query, boost: float, need_scores: bool) -> _Scored:
        if isinstance(q, TermQuery):
            p = self.term_postings(q.term, fld=q.field)
            if p is None:
                return _Scored(np.empty(0, np.int64), np.empty(0))
            if not need_scores:
                return _Scored(p["docs"], None)
            df, _ = self.term_statistics(q.term, fld=q.field)
            scorer = self.scorer_for(q.field)
            w = scorer.weight(df, boost)
            return _Scored(p["docs"], scorer.score(w, p["freqs"], p["norms8"]))
        if isinstance(q, BoostQuery):
            return self._eval(q.query, boost * q.boost, need_scores)
        if isinstance(q, MatchNoDocsQuery):
            return _Scored(np.empty(0, np.int64),
                           np.empty(0) if need_scores else None)
        if isinstance(q, MatchAllDocsQuery):
            lo, hi = self._doc_range or (0, self.manifest.max_doc - 1)
            lo, hi = max(0, lo), min(self.manifest.max_doc - 1, hi)
            _check_dense_range(hi - lo + 1)
            docs = np.arange(lo, hi + 1, dtype=np.int64)
            return _Scored(docs, np.full(len(docs), boost) if need_scores else None)
        if isinstance(q, ConstantScoreQuery):
            ev = self._eval(q.query, 0.0, False)
            return _Scored(
                ev.docs,
                np.full(len(ev.docs), boost * q.boost) if need_scores else None,
            )
        if isinstance(q, NumericRangeQuery):
            docs = self._numeric_range_docs(q.field, int(q.lo), int(q.hi))
            return _Scored(docs, np.full(len(docs), boost) if need_scores else None)
        if isinstance(q, FieldExistsQuery):
            if q.field in tuple(self.cfg.docvalue_fields):
                # full-range zone scan = the validity mask itself
                docs = self._numeric_range_docs(
                    q.field, -(2**62), 2**62
                )
            elif q.field == self.default_field or q.field in tuple(
                self.cfg.keyword_fields
            ):
                # per-segment has-field bitmap in the docmap (docsWithField);
                # replaces the round-2 full-dictionary expansion, which was
                # catastrophic on a web-scale text field
                docs = self._has_field_docs(q.field)
            else:
                docs = np.empty(0, np.int64)  # field never indexed
            return _Scored(docs, np.full(len(docs), boost) if need_scores else None)
        if isinstance(q, NumericInSetQuery):
            docs = self._numeric_set_docs(q.field, q.values)
            return _Scored(docs, np.full(len(docs), boost) if need_scores else None)
        if isinstance(q, RangeFieldQuery):
            docs = self._range_field_docs(q)
            return _Scored(docs, np.full(len(docs), boost) if need_scores else None)
        if isinstance(q, NumericBoxQuery):
            docs = self._numeric_box_docs(q)
            return _Scored(docs, np.full(len(docs), boost) if need_scores else None)
        if isinstance(q, WildcardQuery):
            f_name = q.field or self.default_field
            terms = self._expand_wildcard(f_name, q.pattern)
            return self._eval_term_union(terms, q.field, boost, need_scores)
        if isinstance(q, RegexpQuery):
            f_name = q.field or self.default_field
            terms = self._expand_regexp(f_name, q.pattern)
            return self._eval_term_union(terms, q.field, boost, need_scores)
        if isinstance(q, FuzzyQuery):
            f_name = q.field or self.default_field
            terms = self._expand_fuzzy(
                f_name, q.term, int(q.max_edits), int(q.prefix_length)
            )
            return self._eval_term_union(terms, q.field, boost, need_scores)
        if isinstance(q, DocIdRangeQuery):
            rlo, rhi = self._doc_range or (0, self.manifest.max_doc - 1)
            lo = max(0, int(q.lo), rlo)
            hi = min(self.manifest.max_doc - 1, int(q.hi), rhi)
            _check_dense_range(hi - lo + 1)
            docs = np.arange(lo, max(lo, hi + 1), dtype=np.int64)
            return _Scored(docs, np.full(len(docs), boost) if need_scores else None)
        if isinstance(q, TermInSetQuery):
            return self._eval_term_union(list(q.terms), q.field, boost, need_scores)
        if isinstance(q, PrefixQuery):
            f_name = q.field or self.default_field
            terms = self.expand_terms(f_name, q.prefix, q.prefix + "\U0010ffff")
            return self._eval_term_union(terms, q.field, boost, need_scores)
        if isinstance(q, TermRangeQuery):
            f_name = q.field or self.default_field
            terms = self.expand_terms(f_name, q.lower, q.upper)
            if not q.include_lower:
                terms = [t for t in terms if t != q.lower]
            if not q.include_upper:
                terms = [t for t in terms if t != q.upper]
            return self._eval_term_union(terms, q.field, boost, need_scores)
        if isinstance(q, DisjunctionMaxQuery):
            evs = [self._eval(d, boost, need_scores) for d in q.disjuncts]
            evs = [e for e in evs if len(e.docs)]
            if not evs:
                return _Scored(np.empty(0, np.int64), np.empty(0))
            base = np.unique(np.concatenate([e.docs for e in evs]))
            if not need_scores:
                return _Scored(base, None)
            # running max + sum per doc (O(sum of clause postings) memory,
            # not a dense n_disjuncts x n_docs matrix — a hot-term dismax
            # would otherwise allocate n_clauses x the posting list)
            mx = np.full(len(base), -np.inf)
            sm = np.zeros(len(base), dtype=np.float64)
            matched = np.zeros(len(base), dtype=bool)
            for e in evs:
                pos = np.searchsorted(base, e.docs)
                np.maximum.at(mx, pos, e.scores)
                sm[pos] += e.scores
                matched[pos] = True
            mx[~matched] = 0.0
            scores = mx + q.tie_breaker * (sm - mx)
            return _Scored(base, scores)
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(q, boost, need_scores)
        if isinstance(q, SpanNearQuery):
            return self._eval_span_near(q, boost, need_scores)
        if isinstance(q, SpanFirstQuery):
            return self._eval_span_first(q, boost, need_scores)
        if isinstance(q, SpanNotQuery):
            return self._eval_span_not(q, boost, need_scores)
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q, boost, need_scores)
        raise TypeError(f"unsupported query: {q!r}")

    def _eval_term_union(
        self, terms: list[str], fld: str | None, boost: float, need_scores: bool
    ) -> _Scored:
        """Constant-score union of the terms' postings (MultiTermQuery
        CONSTANT_SCORE_REWRITE — every matching doc scores ``boost``)."""
        docs_list = []
        for t in terms:
            p = self.term_postings(t, fld=fld)
            if p is not None:
                docs_list.append(p["docs"])
        if not docs_list:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        docs = np.unique(np.concatenate(docs_list))
        return _Scored(docs, np.full(len(docs), boost) if need_scores else None)

    def _eval_phrase(self, q: PhraseQuery, boost: float, need_scores: bool) -> _Scored:
        if not q.terms:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        plists = [
            self.term_postings(t, fld=q.field, with_positions=True)
            for t in q.terms
        ]
        if any(p is None for p in plists):
            return _Scored(np.empty(0, np.int64), np.empty(0))
        # conjunction on docs
        docs = plists[0]["docs"]
        for p in plists[1:]:
            docs = _intersect_sorted(docs, p["docs"])
        if len(docs) == 0:
            return _Scored(docs, np.empty(0))
        # phrase positions: candidate = pos of term0; survive if pos+i present
        # in term i's positions for the same doc. Keys are packed as
        # (candidate-local doc ordinal)*BIG + position — NOT global docID —
        # so the int64 packing never overflows at 10^12-doc scale (ordinals
        # are bounded by this query's conjunction size, not max_doc).
        BIG = np.int64(1) << 32
        cand = _doc_pos_keys(plists[0], docs, BIG)  # keys ord*BIG + pos
        for i, p in enumerate(plists[1:], start=1):
            keys_i = _doc_pos_keys(p, docs, BIG)
            cand = cand[np.isin(cand + i, keys_i, assume_unique=True)]
            if len(cand) == 0:
                break
        match_docs_all = docs[(cand // BIG).astype(np.int64)]
        mdocs, freqs = np.unique(match_docs_all, return_counts=True)
        if not need_scores:
            return _Scored(mdocs, None)
        # weight: boost * sum of per-term idfs (IdfExplainV1 semantics)
        scorer = self.scorer_for(q.field)
        w = boost * float(
            sum(
                idf(self.term_statistics(t, fld=q.field)[0], scorer.doc_count)
                for t in q.terms
            )
        )
        # norms from the first term's postings at the matching docs
        p0 = plists[0]
        norms8 = p0["norms8"][np.searchsorted(p0["docs"], mdocs)]
        return _Scored(mdocs, scorer.score(w, freqs.astype(np.float64), norms8))

    def _span_scored(
        self,
        terms: tuple,
        fld: str | None,
        norms8: np.ndarray,
        mdocs: np.ndarray,
        freqs: np.ndarray,
        boost: float,
        need_scores: bool,
    ) -> _Scored:
        """Shared span scoring (PhraseQuery shape): weight = boost x summed
        per-term idf (ALL alternative terms contribute, as in Lucene's
        SpanWeight term-context collection), BM25 over the span freq with
        ``norms8`` aligned to ``mdocs``."""
        if not need_scores:
            return _Scored(mdocs, None)
        scorer = self.scorer_for(fld)
        w = boost * float(
            sum(
                idf(self.term_statistics(t, fld=fld)[0], scorer.doc_count)
                for t in terms
            )
        )
        return _Scored(mdocs, scorer.score(w, freqs.astype(np.float64), norms8))

    def _eval_span_near(
        self, q: SpanNearQuery, boost: float, need_scores: bool
    ) -> _Scored:
        """Proximity matching over the positions stream (SpanNearQuery —
        the reference's spans module is an interface stub,
        spans/spans.go; semantics documented on the query class).

        Ordered: greedy minimal-successor chain per anchor — for each
        occurrence of term 0, take the smallest strictly-greater position
        of term 1, then of term 2, ... The greedy end is minimal over all
        increasing chains, so the anchor matches iff the greedy chain
        fits the window (exchange argument). One searchsorted per term —
        no per-doc loop.

        Unordered (any clause count, repeated terms, arbitrary —
        possibly overlapping — OR-alternative sets): a fixed window
        width W = slop + n - 1 bounds any qualifying selection, and an
        optimal window's left edge aligns with some occurrence — so
        candidate windows are [p, p+W] for every occurrence p of any
        clause term. Window validity for a given anchor is an
        anchor-forced system-of-distinct-representatives check,
        evaluated as deficiency Hall over group-closed clause subsets
        (details inline in the unordered branch). An anchor matches iff
        some valid window start lies in [anchor-W, anchor] (clamped to
        the doc's ordinal block). Everything is searchsorted over the
        packed key space — no per-doc loop."""
        n = len(q.terms)
        if n == 0:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        # each clause is one term or a tuple of OR-alternatives
        # (SpanOr-inside-SpanNear); a clause with no surviving alternative
        # kills the conjunction
        alts = [(t,) if isinstance(t, str) else t for t in q.terms]
        cl_named: list[list[tuple[str, dict]]] = []
        for a in alts:
            ps = [
                (t, p)
                for t in a
                if (p := self.term_postings(t, fld=q.field, with_positions=True))
                is not None and len(p["docs"])
            ]
            if not ps:
                return _Scored(np.empty(0, np.int64), np.empty(0))
            cl_named.append(ps)
        cl_plists: list[list[dict]] = [[p for _, p in ps] for ps in cl_named]
        docs = None
        for ps in cl_plists:
            u = (
                ps[0]["docs"]
                if len(ps) == 1
                else np.unique(np.concatenate([p["docs"] for p in ps]))
            )
            docs = u if docs is None else _intersect_sorted(docs, u)
            if len(docs) == 0:
                return _Scored(docs, np.empty(0))
        BIG = np.int64(1) << 32

        def _clause_keys(ps: list[dict]) -> np.ndarray:
            if len(ps) == 1:  # docs is a subset of this single list's docs
                return _doc_pos_keys(ps[0], docs, BIG)
            parts = []
            for p in ps:
                m = _membership(docs, p["docs"]).astype(bool)
                if not m.any():
                    continue
                sub = _doc_pos_keys(p, docs[m], BIG)
                # remap the subset ordinals into the shared docs space
                full = np.flatnonzero(m)
                parts.append(full[sub // BIG] * BIG + sub % BIG)
            # alternatives are distinct terms, so (doc, pos) keys are
            # disjoint across parts — sort merges them
            return np.sort(np.concatenate(parts))

        if n == 1 or q.in_order:
            keys = [_clause_keys(ps) for ps in cl_plists]
            anchors = keys[0]
        if n == 1:
            matched = anchors
        elif q.in_order:
            cur = anchors
            ok = np.ones(len(cur), dtype=bool)
            for ki in keys[1:]:
                idx = np.searchsorted(ki, cur, side="right")
                valid = idx < len(ki)
                nxt = ki[np.minimum(idx, len(ki) - 1)]
                valid &= (nxt // BIG) == (cur // BIG)
                ok &= valid
                cur = np.where(ok, nxt, cur)
                if not ok.any():
                    break
            # same ordinal block, so the key delta IS the position delta
            matched = anchors[ok & ((cur - anchors) <= q.slop + (n - 1))]
        else:
            # Unordered with arbitrary (possibly overlapping) OR-clause
            # alternative sets. An anchor a (occurrence of a clause-0
            # alternative) matches iff some window [p, p+W] with
            # p in [a-W, a] admits a system of distinct representatives
            # (one distinct position per clause, drawn from that clause's
            # alternatives) that assigns a to clause 0. Positions are
            # unique per doc, so forced-anchor SDR existence is exactly
            # deficiency Hall over group-closed clause subsets S (groups =
            # clauses with identical alternative sets, interchangeable
            # neighborhoods): count of in-window occurrences of S's term
            # union >= S's clause count, +1 for subsets NOT containing
            # clause 0's group whose term union contains the anchor's term
            # (the anchor position is spent on clause 0). Constraints
            # decompose across term-disjoint subsets (counts are
            # additive), so only subsets within one connected component of
            # the group-overlap graph can bind. Disjoint-or-identical
            # alternative sets — the common case — reduce to singleton
            # subsets with no tightening (the round-3 fast path).
            W = np.int64(q.slop + (n - 1))
            gsets: list[frozenset] = []
            gmult: list[int] = []
            gidx: dict = {}
            for a in alts:
                g = frozenset(a)
                if g in gidx:
                    gmult[gidx[g]] += 1
                else:
                    gidx[g] = len(gsets)
                    gsets.append(g)
                    gmult.append(1)
            g0 = gidx[frozenset(alts[0])]
            # per-distinct-term keys in the shared docs ordinal space
            tkeys: dict[str, np.ndarray] = {}
            for named in cl_named:
                for t, p in named:
                    if t in tkeys:
                        continue
                    m = _membership(docs, p["docs"]).astype(bool)
                    if not m.any():
                        tkeys[t] = np.empty(0, np.int64)
                        continue
                    sub = _doc_pos_keys(p, docs[m], BIG)
                    full = np.flatnonzero(m)
                    tkeys[t] = full[sub // BIG] * BIG + sub % BIG

            _mcache: dict[frozenset, np.ndarray] = {}

            def _merged(ts: frozenset) -> np.ndarray:
                got = _mcache.get(ts)
                if got is None:
                    arrs = [tkeys[t] for t in ts if len(tkeys.get(t, ()))]
                    # distinct terms never share a position, so the
                    # concatenation has no duplicate keys
                    got = (
                        np.sort(np.concatenate(arrs))
                        if arrs
                        else np.empty(0, np.int64)
                    )
                    _mcache[ts] = got
                return got

            parent = list(range(len(gsets)))

            def _find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for i in range(len(gsets)):
                for j in range(i + 1, len(gsets)):
                    if gsets[i] & gsets[j]:
                        parent[_find(i)] = _find(j)
            comps: dict[int, list[int]] = {}
            for i in range(len(gsets)):
                comps.setdefault(_find(i), []).append(i)
            # (in-window count source, demand, contains clause-0's group,
            #  term union) per non-empty group-closed subset
            constraints: list[tuple[np.ndarray, int, bool, frozenset]] = []
            for comp in comps.values():
                if len(comp) > 16:
                    raise NotImplementedError(
                        "unordered span_near: %d overlapping OR-clause "
                        "groups need 2^%d Hall subsets"
                        % (len(comp), len(comp))
                    )
                for mask in range(1, 1 << len(comp)):
                    S = [
                        comp[i] for i in range(len(comp)) if mask >> i & 1
                    ]
                    T = frozenset().union(*(gsets[g] for g in S))
                    constraints.append(
                        (_merged(T), sum(gmult[g] for g in S), g0 in S, T)
                    )
            starts = _merged(frozenset(tkeys))
            s_hi = np.minimum(starts + W, (starts // BIG) * BIG + BIG - 1)
            cnts = [
                np.searchsorted(ks, s_hi, side="right")
                - np.searchsorted(ks, starts, side="left")
                for ks, _, _, _ in constraints
            ]
            base = np.ones(len(starts), dtype=bool)
            for c, (_, dem, _, _) in zip(cnts, constraints):
                base &= c >= dem
            parts = []
            for t in gsets[g0]:
                a_t = tkeys.get(t)
                if a_t is None or len(a_t) == 0:
                    continue
                valid = base
                for c, (_, dem, has_g0, T) in zip(cnts, constraints):
                    if not has_g0 and t in T:
                        valid = valid & (c >= dem + 1)
                vstarts = starts[valid]
                lo_a = np.maximum(a_t - W, (a_t // BIG) * BIG)
                l = np.searchsorted(vstarts, lo_a, side="left")
                r = np.searchsorted(vstarts, a_t, side="right")
                parts.append(a_t[r > l])
            matched = (
                np.concatenate(parts) if parts else np.empty(0, np.int64)
            )
        if len(matched) == 0:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        uo, freqs = np.unique(matched // BIG, return_counts=True)
        mdocs = docs[uo]
        # norms are per-doc: fill from whichever clause-0 alternative holds
        # the doc (every matched doc is in clause 0's union)
        norms_docs = np.zeros(len(docs), dtype=cl_plists[0][0]["norms8"].dtype)
        for p in cl_plists[0]:
            m = _membership(docs, p["docs"]).astype(bool)
            if m.any():
                norms_docs[m] = p["norms8"][
                    np.searchsorted(p["docs"], docs[m])
                ]
        all_terms = tuple(t for a in alts for t in a)
        return self._span_scored(
            all_terms, q.field, norms_docs[uo], mdocs, freqs, boost,
            need_scores,
        )

    def _eval_span_first(
        self, q: SpanFirstQuery, boost: float, need_scores: bool
    ) -> _Scored:
        """SpanFirstQuery: occurrences at position < end (span end
        position <= end in Lucene terms). freq = qualifying occurrences."""
        p = self.term_postings(q.term, fld=q.field, with_positions=True)
        if p is None or len(p["docs"]) == 0:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        BIG = np.int64(1) << 32
        keys = _doc_pos_keys(p, p["docs"], BIG)
        qual = keys[(keys % BIG) < q.end]
        if len(qual) == 0:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        counts = np.bincount(
            (qual // BIG).astype(np.int64), minlength=len(p["docs"])
        )
        sel = counts > 0
        mdocs = p["docs"][sel]
        return self._span_scored(
            (q.term,), q.field, p["norms8"][sel], mdocs, counts[sel],
            boost, need_scores,
        )

    def _eval_span_not(
        self, q: SpanNotQuery, boost: float, need_scores: bool
    ) -> _Scored:
        """SpanNotQuery: include occurrences with no exclude occurrence in
        [p - pre, p + post]. Exclude keys are rebuilt in the INCLUDE doc
        ordinal space (only for docs both terms share — include-only docs
        qualify wholesale), then each include occurrence checks its window
        with two searchsorteds. No per-doc loop."""
        pi = self.term_postings(q.include, fld=q.field, with_positions=True)
        if pi is None or len(pi["docs"]) == 0:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        pe = self.term_postings(q.exclude, fld=q.field, with_positions=True)
        BIG = np.int64(1) << 32
        ikeys = _doc_pos_keys(pi, pi["docs"], BIG)
        if pe is None or len(pe["docs"]) == 0:
            qual = ikeys
        else:
            docs_both = _intersect_sorted(pi["docs"], pe["docs"])
            if len(docs_both) == 0:
                qual = ikeys
            else:
                bkeys = _doc_pos_keys(pe, docs_both, BIG)
                # remap both-doc ordinals into include-doc ordinals
                # (monotone, so the key array stays sorted)
                ord_inc = np.searchsorted(pi["docs"], docs_both)
                ekeys = ord_inc[bkeys // BIG] * BIG + bkeys % BIG
                blk = (ikeys // BIG) * BIG
                lo = np.maximum(ikeys - np.int64(q.pre), blk)
                hi = np.minimum(ikeys + np.int64(q.post), blk + BIG - 1)
                l = np.searchsorted(ekeys, lo, side="left")
                r = np.searchsorted(ekeys, hi, side="right")
                qual = ikeys[r == l]
        if len(qual) == 0:
            return _Scored(np.empty(0, np.int64), np.empty(0))
        counts = np.bincount(
            (qual // BIG).astype(np.int64), minlength=len(pi["docs"])
        )
        sel = counts > 0
        return self._span_scored(
            (q.include,), q.field, pi["norms8"][sel], pi["docs"][sel],
            counts[sel], boost, need_scores,
        )

    def _eval_bool(self, q: BooleanQuery, boost: float, need_scores: bool) -> _Scored:
        must = [c.query for c in q.clauses if c.occur is Occur.MUST]
        should = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
        filt = [c.query for c in q.clauses if c.occur is Occur.FILTER]
        must_not = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
        msm = q.minimum_should_match

        must_ev = [self._eval(c, boost, need_scores) for c in must]
        should_ev = [self._eval(c, boost, need_scores) for c in should]
        filt_ev = [self._eval(c, 0.0, False) for c in filt]

        if must or filt:
            base = None
            for ev in [*must_ev, *filt_ev]:
                base = ev.docs if base is None else _intersect_sorted(base, ev.docs)
            # minimumShouldMatch over SHOULD memberships
            if should_ev and msm > 0:
                cnt = np.zeros(len(base), dtype=np.int32)
                for ev in should_ev:
                    cnt += _membership(base, ev.docs)
                base = base[cnt >= msm]
            scores = None
            if need_scores:
                scores = np.zeros(len(base), dtype=np.float64)
                for ev in must_ev:  # sum MUST scores (clause order)
                    pos = np.searchsorted(ev.docs, base)
                    scores += ev.scores[pos]
                for ev in should_ev:  # ReqOptSum: add SHOULD where present
                    scores += _gather_scores(base, ev)
        else:
            # pure disjunction (+ optional msm)
            if not should_ev:
                return _Scored(np.empty(0, np.int64), np.empty(0))
            all_docs = np.concatenate([ev.docs for ev in should_ev])
            base, inv_counts = np.unique(all_docs, return_counts=True)
            if msm > 1:
                base = base[inv_counts >= msm]
            scores = None
            if need_scores:
                scores = np.zeros(len(base), dtype=np.float64)
                for ev in should_ev:
                    scores += _gather_scores(base, ev)

        for c in must_not:
            ev = self._eval(c, 0.0, False)
            keep = ~_membership(base, ev.docs).astype(bool)
            base = base[keep]
            if scores is not None:
                scores = scores[keep]
        return _Scored(base, scores)

    # ---------------- block-max pruned path (perf; rank-identical) ---------

    def _ensure_scored_blocks(
        self, cache: dict, ri: int, row: dict, locals_, scorer, w: float
    ) -> None:
        """Decode + score any missing blocks of one postings row into the
        shared per-term block cache. THE cache-entry contract for both the
        block-max sweep and the lead conjunction: ``cache[(ri, local)] =
        (docs, scores)`` for that block, where ``ri`` is the row's index
        in the term's first_doc-sorted row list and ``local`` the block's
        index within the row."""
        missing = [int(lb) for lb in locals_ if (ri, int(lb)) not in cache]
        if not missing:
            return
        docs_b, freqs_b, norms_b, cnts = self.codec.decode_row_blocks(
            row, np.asarray(missing, dtype=np.int32), self.cfg.block_size
        )
        scores_b = scorer.score(w, freqs_b, norms_b)
        off = 0
        for lb, c in zip(missing, cnts):
            cache[(ri, lb)] = (
                docs_b[off : off + int(c)],
                scores_b[off : off + int(c)],
            )
            off += int(c)

    def _lead_conjunction(
        self, tqs: list, rows_per_term: list, k: int, *, force: bool = False
    ) -> TopDocs | None:
        """Candidate-driven conjunction: lead with the rarest term
        (ConjunctionDISI, /root/reference/core/search/conjunctiondisi.go —
        the rarest iterator drives advance()), decode its postings fully,
        then for each other term (ascending df, so candidates shrink
        fastest) decode ONLY the blocks containing a candidate docID via
        block-range pread. Exact — the full conjunction is computed, so
        the result is rank-identical to exhaustive by construction and
        ``total_hits`` is exact (unlike the sweep's lower bound). Returns
        None when the engage heuristic predicts insufficient skipping."""
        dfs = [sum(int(r["doc_freq"]) for r in rows) for rows in rows_per_term]
        t_order = np.argsort(np.asarray(dfs), kind="stable")
        lead = int(t_order[0])
        bs = self.cfg.block_size
        n_blocks = [
            sum(max(1, -(-int(r["doc_freq"]) // bs)) for r in rows)
            for rows in rows_per_term
        ]
        if not force:
            if sum(dfs) < LEAD_CONJ_MIN_POSTINGS:
                return None
            touch = sum(min(dfs[lead], n_blocks[int(t)]) for t in t_order[1:])
            tot = sum(n_blocks[int(t)] for t in t_order[1:])
            if tot == 0 or touch > LEAD_CONJ_MAX_TOUCH_FRAC * tot:
                return None
        tq0 = tqs[lead]
        p0 = self.term_postings(tq0.term, fld=tq0.field)
        if p0 is None or len(p0["docs"]) == 0:
            return TopDocs(np.empty(0, np.int64), np.empty(0), 0)
        cand = self._apply_live_docs(p0["docs"])
        scorer0 = self.scorer_for(tq0.field)
        w0 = scorer0.weight(self.term_statistics(tq0.term, fld=tq0.field)[0])
        sc0 = scorer0.score(w0, p0["freqs"].astype(np.float64), p0["norms8"])
        # per-clause (docs, scores) for the final sum; terms are VISITED in
        # df order (fastest candidate shrink) but SUMMED in clause order —
        # float addition is not associative, and clause-order summation is
        # what makes scores bit-identical to the exhaustive path
        per_term: list = [None] * len(tqs)
        per_term[lead] = (p0["docs"], sc0)
        blocks_total = sum(n_blocks)
        blocks_touched = n_blocks[lead]  # lead decodes all its blocks
        for t in t_order[1:]:
            if len(cand) == 0:
                break
            ti = int(t)
            tq = tqs[ti]
            scorer = self.scorer_for(tq.field)
            w = scorer.weight(self.term_statistics(tq.term, fld=tq.field)[0])
            cache = self._block_cache.setdefault(
                posting_key(tq.field or self.default_field, tq.term), {}
            )
            got: list[tuple[np.ndarray, np.ndarray]] = []
            for ri, r in enumerate(rows_per_term[ti]):
                # candidates inside this row's doc span (rows are
                # first_doc-sorted with disjoint spans)
                a = int(np.searchsorted(cand, int(r["first_doc"])))
                b = int(np.searchsorted(cand, int(r["last_doc"]), side="right"))
                if a == b:
                    continue
                last, _maxf, _minn = self.codec.block_metadata(r)
                bidx = np.unique(np.searchsorted(last, cand[a:b])).astype(
                    np.int32
                )
                blocks_touched += len(bidx)
                self._ensure_scored_blocks(cache, ri, r, bidx, scorer, w)
                got.extend(cache[(ri, int(lb))] for lb in bidx.tolist())
            if not got:
                cand = cand[:0]
                break
            # per-row spans disjoint + ascending, block ids ascending per
            # row -> the concatenation is docID-sorted
            dcat = np.concatenate([g[0] for g in got])
            scat = np.concatenate([g[1] for g in got])
            pos = np.searchsorted(dcat, cand)
            hit = (pos < len(dcat)) & (
                dcat[np.minimum(pos, len(dcat) - 1)] == cand
            )
            cand = cand[hit]
            per_term[ti] = (dcat, scat)
        scores = np.zeros(len(cand), dtype=np.float64)
        if len(cand):
            for dcat, scat in per_term:  # clause order (see note above)
                scores += scat[np.searchsorted(dcat, cand)]
        self.last_prune_stats = {
            "mode": "and_lead",
            "blocks_total": int(blocks_total),
            "blocks_touched": int(blocks_touched),
            "blocks_skipped": int(blocks_total - blocks_touched),
            "intervals_total": 0,
            "intervals_visited": 0,
        }
        td = _topk(_Scored(cand, scores), k)
        td.total_hits = int(len(cand))
        return td

    def _lead_then_publish(self, td: TopDocs, k: int, theta_put) -> TopDocs:
        """Publish this shard's kth score to the cross-shard accumulator
        (the lead path is exact and needs no theta itself, but other
        shards' sweeps can adopt it)."""
        if theta_put is not None and len(td.scores) >= k:
            theta_put(float(td.scores[-1]))
        return td

    def _try_pruned(
        self,
        q: Query,
        k: int,
        *,
        min_postings: int | None = None,
        lead_conjunction: bool | None = None,
        theta_get=None,
        theta_put=None,
    ) -> TopDocs | None:
        """Block-max pruned top-k for TermQuery, pure-OR and pure-AND
        BooleanQuery of terms.

        Interval-at-a-time variant: elementary doc intervals get an upper
        bound from the overlapping per-term block maxima (summed — the
        WANDScorer/BlockMaxConjunctionScorer bound,
        /root/reference/core/search/blockmaxconjunctionscorer.go); intervals
        are visited in descending bound order and evaluation stops when the
        bound cannot beat the current kth score. For AND, intervals not
        covered by EVERY term are skipped outright (no conjunction match can
        exist there), and in-interval evaluation is a sorted intersection.
        Skipped work never changes the result (upper-bound pruning only).

        ``theta_get``/``theta_put`` plug in a cross-shard min-competitive
        accumulator (maxscoreaccumulator.go semantics): a shard may adopt a
        LARGER theta published by other shards (docs strictly below it can
        never reach the global top-k) and publishes its own improvements.
        Per-call ``self.last_prune_stats`` records measured skipping."""
        if self.nrt:
            return None  # segment block metadata is local; NRT is exhaustive
        mode = "or"
        tqs = _pure_or_terms(q)
        if tqs is None:
            tqs = _pure_and_terms(q)
            mode = "and"
        if tqs is None:
            return None
        terms = [tq.term for tq in tqs]
        rows_per_term = [self._term_rows(tq.term, fld=tq.field) for tq in tqs]
        if all(not r for r in rows_per_term) or (
            mode == "and" and any(not r for r in rows_per_term)
        ):
            return TopDocs(np.empty(0, np.int64), np.empty(0), 0)
        # the explicit wand_min_postings knob pins the SWEEP (tests force
        # it to exercise interval pruning); the lead path auto-engages only
        # at default floors, or explicitly via lead_conjunction=True
        if (
            mode == "and"
            and len(tqs) >= 2
            and (
                lead_conjunction is True
                or (lead_conjunction is None and min_postings is None)
            )
        ):
            led = self._lead_conjunction(
                tqs, rows_per_term, k, force=lead_conjunction is True
            )
            if led is not None:
                return self._lead_then_publish(led, k, theta_put)
        # Adaptive engage: the interval bookkeeping costs O(total blocks)
        # per query up front, so pruning only pays off once the candidate
        # postings volume is large (exactly when it matters at web scale).
        total_df = sum(r["doc_freq"] for rows in rows_per_term for r in rows)
        floor = min_postings
        if floor is None:  # mode-aware defaults (see constants above)
            if mode == "and":
                floor = WAND_AND_MIN_POSTINGS
            elif len(tqs) == 1:
                floor = WAND_TERM_MIN_POSTINGS
            else:
                floor = WAND_MIN_POSTINGS
        if total_df < floor:
            return None
        if min_postings is None and k > WAND_MAX_K:
            return None
        scorers = [self.scorer_for(tq.field) for tq in tqs]
        weights = [
            sc.weight(self.term_statistics(tq.term, fld=tq.field)[0])
            for sc, tq in zip(scorers, tqs)
        ]
        # flat per-term block tables (rows are first_doc-sorted and salt
        # groups cover disjoint doc ranges, so each term's block starts are
        # ascending) — decode is LAZY: only blocks whose interval is
        # actually visited are ever read (codec.decode_row_blocks)
        rlo, rhi = self._doc_range or (0, self.manifest.max_doc - 1)
        term_blocks = []
        starts_all, ends_all, ubs_all = [], [], []
        for ti, rows in enumerate(rows_per_term):
            t_starts, t_ends, t_row, t_local = [], [], [], []
            for ri, r in enumerate(rows):
                last, maxf, minn = self.codec.block_metadata(r)
                first = np.empty(len(last), dtype=np.int64)
                first[0] = r["first_doc"]
                first[1:] = last[:-1] + 1
                ub = scorers[ti].max_block_score(weights[ti], maxf, minn)
                keep = (last >= rlo) & (first <= rhi)  # shard doc-range prune
                if not keep.any():
                    continue
                lidx = np.flatnonzero(keep).astype(np.int32)
                t_starts.append(np.maximum(first[keep], rlo))
                t_ends.append(np.minimum(last[keep], rhi))
                t_row.append(np.full(len(lidx), ri, dtype=np.int32))
                t_local.append(lidx)
                ubs_all.append(ub[keep])
            ts = np.concatenate(t_starts) if t_starts else np.empty(0, np.int64)
            te = np.concatenate(t_ends) if t_ends else np.empty(0, np.int64)
            rowv = np.concatenate(t_row) if t_row else np.empty(0, np.int32)
            localv = np.concatenate(t_local) if t_local else np.empty(0, np.int32)
            term_blocks.append(
                {
                    "starts": ts,
                    "ends": te,
                    "row": rowv,
                    "local": localv,
                    # precomputed cache keys: one tuple per flat block (the
                    # int()/zip per-batch conversions were a measured cost)
                    "keys": list(zip(rowv.tolist(), localv.tolist())),
                    "rows": rows,
                    # per-term block cache persists across queries
                    "cache": self._block_cache.setdefault(
                        posting_key(tqs[ti].field or self.default_field, terms[ti]),
                        {},
                    ),
                }
            )
            starts_all.append(ts)
            ends_all.append(te)
        starts = np.concatenate(starts_all)
        ends = np.concatenate(ends_all)
        ubs = np.concatenate(ubs_all)
        # elementary intervals
        bps = np.unique(np.concatenate([starts, ends + 1]))
        ivl_starts = bps[:-1]
        diff = np.zeros(len(bps), dtype=np.float64)
        np.add.at(diff, np.searchsorted(bps, starts), ubs)
        np.add.at(diff, np.searchsorted(bps, ends + 1), -ubs)
        ivl_ub = np.cumsum(diff)[:-1]
        if mode == "and":
            # coverage pruning: a conjunction can only match where EVERY
            # term has a block (per-term block spans are disjoint, so each
            # term contributes coverage exactly once per interval)
            covd = np.zeros(len(bps), dtype=np.int64)
            for tb in term_blocks:
                np.add.at(covd, np.searchsorted(bps, tb["starts"]), 1)
                np.add.at(covd, np.searchsorted(bps, tb["ends"] + 1), -1)
            eligible = np.flatnonzero(np.cumsum(covd)[:-1] == len(tqs))
        else:
            eligible = np.arange(len(ivl_ub))
        order = eligible[np.argsort(-ivl_ub[eligible], kind="stable")]

        # Batched descending-bound sweep: intervals are consumed in
        # geometrically growing batches, and EVERYTHING inside a batch is
        # numpy — block gathering (range-union via a coverage diff array),
        # doc->interval membership (one searchsorted against bps), score
        # aggregation (unique + add.at for OR, sorted intersection for AND).
        # Python cost is O(#batches + #blocks decoded), not O(#intervals):
        # the per-interval bookkeeping that made the old sweep lose to
        # exhaustive on flat-tf corpora (the round-2 'python interval
        # sweep' finding) is gone. Theta tightens between batches, so the
        # skipped tail is within one batch of the one-at-a-time sweep.
        n_terms = len(terms)
        visited_mask = [
            np.zeros(len(tb["starts"]), dtype=bool) for tb in term_blocks
        ]
        total_hits = 0
        heap_docs = np.empty(0, np.int64)
        heap_scores = np.empty(0, np.float64)
        theta = -np.inf
        have_global_theta = False
        intervals_visited = 0
        and_bail_checked = False
        in_batch = np.zeros(len(ivl_starts), dtype=bool)
        pos = 0
        batch_n = max(32, 2 * k)
        while pos < len(order):
            if theta_get is not None:
                g = float(theta_get())
                if g > theta:
                    theta = g
                    have_global_theta = True
            take = order[pos : pos + batch_n]
            exhausted = False
            # Strict inequality: an interval whose upper bound EQUALS theta
            # can still contain a doc scoring exactly theta with a smaller
            # docID than the current kth hit — under the (score desc, docID
            # asc) contract that doc belongs in the top-k, so ub==theta
            # intervals remain competitive and must be evaluated.
            if len(heap_docs) >= k or have_global_theta:
                # bounds in `take` are descending; keep the ub >= theta prefix
                keep_n = int(
                    np.searchsorted(-ivl_ub[take], -theta, side="right")
                )
                if keep_n < len(take):
                    take = take[:keep_n]
                    exhausted = True  # every later interval is < theta too
                if len(take) == 0:
                    break
            intervals_visited += len(take)
            los = ivl_starts[take]
            his = bps[take + 1] - 1
            in_batch[take] = True
            per_term: list[tuple[np.ndarray, np.ndarray]] = []
            for ti in range(n_terms):
                tb = term_blocks[ti]
                # union of per-interval block ranges via a coverage diff
                b0 = np.searchsorted(tb["ends"], los)
                b1 = np.searchsorted(tb["starts"], his, side="right")
                cover = np.zeros(len(tb["starts"]) + 1, dtype=np.int64)
                np.add.at(cover, b0, 1)
                np.add.at(cover, b1, -1)
                need = np.flatnonzero(np.cumsum(cover)[:-1] > 0)
                visited_mask[ti][need] = True
                # cache keys are (row, local block) — stable across
                # queries AND shard doc-ranges (flat indices are not:
                # range pruning renumbers them per query)
                cache = tb["cache"]
                keys = tb["keys"]
                need_l = need.tolist()
                missing = [fb for fb in need_l if keys[fb] not in cache]
                if missing:
                    by_row: dict[int, list[int]] = {}
                    for fb in missing:
                        by_row.setdefault(keys[fb][0], []).append(fb)
                    for ri, fbs in by_row.items():
                        self._ensure_scored_blocks(
                            cache, ri, tb["rows"][ri], tb["local"][fbs],
                            scorers[ti], weights[ti],
                        )
                if len(need_l) == 0:
                    per_term.append(
                        (np.empty(0, np.int64), np.empty(0, np.float64))
                    )
                    continue
                got = [cache[keys[fb]] for fb in need_l]
                dcat = np.concatenate([g[0] for g in got])
                scat = np.concatenate([g[1] for g in got])
                if n_terms == 1 and self._doc_range is None:
                    # single term: elementary intervals ARE this term's
                    # block spans, so `need` == exactly the batch's blocks
                    # and every decoded doc is in a batch interval — the
                    # membership filter is the identity
                    per_term.append((dcat, scat))
                    continue
                # keep only docs whose elementary interval is in this batch
                # (per-term block spans are disjoint & ascending, so dcat is
                # sorted — required by the AND intersection below); blocks
                # straddling a shard doc-range boundary decode docs outside
                # [bps[0], bps[-1]) — drop them before the interval lookup
                m = (dcat >= bps[0]) & (dcat < bps[-1])
                iidx = np.searchsorted(bps, dcat[m], side="right") - 1
                m2 = in_batch[iidx]
                per_term.append((dcat[m][m2], scat[m][m2]))
            in_batch[take] = False
            udocs = None
            if mode == "and":
                if all(len(td) for td, _ in per_term):
                    udocs = per_term[0][0]
                    for d, _ in per_term[1:]:
                        udocs = _intersect_sorted(udocs, d)
                        if len(udocs) == 0:
                            break
                if udocs is not None and len(udocs):
                    sc = np.zeros(len(udocs), dtype=np.float64)
                    for d, s in per_term:
                        sc += s[np.searchsorted(d, udocs)]
                else:
                    udocs = None
            elif n_terms == 1:
                udocs, sc = per_term[0]
                if len(udocs) == 0:
                    udocs = None
            else:
                cat = np.concatenate([td for td, _ in per_term])
                if len(cat):
                    udocs, inv = np.unique(cat, return_inverse=True)
                    sc = np.zeros(len(udocs), dtype=np.float64)
                    np.add.at(sc, inv, np.concatenate([ts for _, ts in per_term]))
            if udocs is not None and len(udocs):
                if len(self.deleted):
                    keep = ~_membership(udocs, self.deleted).astype(bool)
                    udocs, sc = udocs[keep], sc[keep]
                total_hits += len(udocs)
                heap_docs = np.concatenate([heap_docs, udocs])
                heap_scores = np.concatenate([heap_scores, sc])
                if len(heap_docs) > k:
                    heap_docs, heap_scores = _select_topk(
                        heap_docs, heap_scores, k
                    )
                if len(heap_docs) >= k:
                    local_theta = float(heap_scores.min())
                    if local_theta > theta:
                        theta = local_theta
                        if theta_put is not None:
                            theta_put(theta)
            if exhausted:
                break
            pos += batch_n
            batch_n = min(batch_n * 2, 8192)
            if (
                mode == "and"
                and not and_bail_checked
                and min_postings is None
                and WAND_AND_MIN_SKIP > 0
                and len(heap_docs) >= k
            ):
                and_bail_checked = True
                # adaptive AND bail (see WAND_AND_MIN_SKIP): with theta now
                # real, count how many remaining intervals it can skip
                rest = order[pos:]
                if len(rest):
                    competitive = int(
                        np.searchsorted(-ivl_ub[rest], -theta, side="right")
                    )
                    if (len(rest) - competitive) < WAND_AND_MIN_SKIP * len(rest):
                        return None  # exhaustive conjunction is cheaper
        self.last_prune_stats = {
            "mode": mode,
            "blocks_total": int(len(starts)),
            "blocks_touched": int(sum(int(v.sum()) for v in visited_mask)),
            "blocks_skipped": int(
                len(starts) - sum(int(v.sum()) for v in visited_mask)
            ),
            "intervals_total": int(len(order)),
            "intervals_visited": int(intervals_visited),
        }
        ordf = np.lexsort((heap_docs, -heap_scores))
        # NOTE: total_hits under pruning is a lower bound (GREATER_THAN_OR_EQUAL
        # relation, as in the reference collector under early termination).
        return TopDocs(heap_docs[ordf][:k], heap_scores[ordf][:k], total_hits)

    # ---------------- distributed batch search ----------------

    def search_batch_dataset(
        self,
        queries: list[dict],
        k: int = 10,
        concurrency: int | None = None,
        prune: bool = False,
        route_stats: bool = False,
    ):
        """Evaluate a batch of query descriptors as a Ray Data pipeline.

        ``queries``: [{"qid": int, "kind": "term|bool_and|bool_or|bool_not|phrase",
        "clauses": [str, ...], "k": int?}]. Returns a Dataset of
        (qid, rank, doc_id, score) rows.

        ``route_stats=True`` appends one telemetry row per route group
        (qid = -1 - route, rank = queries in the group, doc_id = route,
        score = group wall seconds) so callers (bench.py) can report
        route p50/p99 and catch route-packing stragglers without a side
        channel; filter ``qid < 0`` before using results.
        """
        import ray
        import ray.data

        n = concurrency or max(
            1, min(len(queries), int(ray.cluster_resources().get("CPU", 4)))
        )
        # Term-affinity routing: hash-partition queries by their primary
        # term so EVERY query on a given (Zipf-hot) term lands in exactly
        # one reduce task — the hot posting list is decoded once
        # cluster-wide instead of once per actor. Workers keep a
        # module-level searcher cache (Ray reuses worker processes), so
        # decoded postings persist across groups scheduled on one worker.
        import zlib

        routed = []
        # Many small groups per slot: a route is the affinity unit (one
        # term's queries -> one route -> one worker decode), so routes must
        # be FINE-grained enough that the heaviest term's route is a small
        # fraction of a worker's fair share — measured on the Zipf query
        # batch, 4 routes/slot left one 37 s straggler route dominating an
        # 8-worker run; 16/slot packs within ~10% of fair share.
        n_routes = n * 16
        # With the shared pre-decode stage on (default), EVERY distinct
        # clause term's postings sit in the object store and all workers
        # read them zero-copy — term affinity no longer saves decodes, it
        # only concentrates a hot term's whole query load on one route.
        # Measured (2000 Zipf queries, 32 cpus): qid-spread routing holds
        # throughput within noise of affinity while halving the route
        # tail (p99 ~1.0 s -> ~0.2-0.35 s, max 1.6 -> 0.6). Affinity
        # remains the right call when shared decode is disabled (each
        # route then decodes its own terms once). LGR_ROUTE_SPREAD=0/1
        # overrides either way.
        use_shared = os.environ.get("LGR_SHARED_DECODE", "1") != "0"
        spread_env = os.environ.get("LGR_ROUTE_SPREAD")
        spread = use_shared if spread_env is None else spread_env == "1"
        for q in queries:
            if spread:
                routed.append({**q, "_route": int(q["qid"]) % n_routes})
                continue
            clauses = [str(c) for c in q.get("clauses", ())]
            # Affinity key = the HOTTEST clause (known from the merge-time
            # hot-term estimate — zero extra I/O), not merely the first:
            # a Zipf-head term shows up as a secondary clause across many
            # queries, and routing those to one worker means its postings
            # are decoded once cluster-wide instead of once per route that
            # happens to mention it (measured: 8 workers did ~1.5x the
            # 2-worker total work before this).
            primary = clauses[0] if clauses else ""
            for c in clauses:
                if posting_key(self.default_field, c) in self._hot_set:
                    primary = c
                    break
            routed.append(
                {**q, "_route": zlib.crc32(primary.encode()) % n_routes}
            )
        ds = ray.data.from_items(routed)

        index_dir = self.index_dir
        # ---- shared decode stage: distinct heavy clause terms are decoded
        # once (parallel tasks), their arrays live in the object store, and
        # every query worker reads them zero-copy. Removes the per-worker
        # re-decode of Zipf-head terms that otherwise inflates total work
        # as workers are added (measured 1.5x at 8 workers).
        distinct = sorted(
            {
                str(c)
                for q in queries
                for c in q.get("clauses", ())
            }
        )
        # positions are only worth pre-decoding for terms phrase queries
        # will actually position-match (the pos stream dominates decode cost)
        phrase_terms = {
            str(c)
            for q in queries
            if str(q.get("kind")) == "phrase"
            for c in q.get("clauses", ())
        }
        shared_map: dict = {}
        if os.environ.get("LGR_SHARED_DECODE", "1") != "0":
            n_chunks = max(1, min(len(distinct), n * 2))
            pre_futs = [
                _predecode_terms.remote(
                    index_dir,
                    distinct[i::n_chunks],  # round-robin: spreads Zipf head
                    sorted(phrase_terms),
                )
                for i in range(n_chunks)
            ]
            for d in ray.get(pre_futs):
                shared_map.update(d)

        def _search_group(batch: pa.Table) -> pa.Table:
            # Arrow in, Arrow out: per-QUERY python dispatch (the work unit),
            # per-HIT output assembled as numpy arrays — no pandas rows.
            import time as _time

            _t0 = _time.perf_counter()
            s = _worker_searcher(index_dir)
            s._shared_postings = shared_map
            qids, ranks, docs, scores = [], [], [], []
            for row in batch.to_pylist():
                q = query_from_descriptor(row["kind"], list(row["clauses"]))
                kk = int(row["k"]) if row.get("k") is not None else k
                td = s.search(q, kk, prune=prune)
                m = len(td.doc_ids)
                qids.append(np.full(m, int(row["qid"]), dtype=np.int64))
                ranks.append(np.arange(1, m + 1, dtype=np.int64))
                docs.append(td.doc_ids)
                scores.append(td.scores)
            if not qids:
                qids = [np.empty(0, np.int64)]
                ranks = [np.empty(0, np.int64)]
                docs = [np.empty(0, np.int64)]
                scores = [np.empty(0, np.float64)]
            if os.environ.get("LGR_QUERY_TRACE"):
                routes = sorted(set(batch["_route"].to_pylist()))
                print(
                    f"[route {routes}] n={batch.num_rows} "
                    f"secs={_time.perf_counter() - _t0:.2f} pid={os.getpid()}",
                    flush=True,
                )
            if route_stats:
                route = int(batch["_route"][0].as_py())
                qids.append(np.array([-1 - route], dtype=np.int64))
                ranks.append(np.array([batch.num_rows], dtype=np.int64))
                docs.append(np.array([route], dtype=np.int64))
                scores.append(
                    np.array([_time.perf_counter() - _t0], dtype=np.float64)
                )
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(qids)),
                    "rank": pa.array(np.concatenate(ranks)),
                    "doc_id": pa.array(np.concatenate(docs).astype(np.int64)),
                    "score": pa.array(
                        np.concatenate(scores).astype(np.float64)
                    ),
                }
            )

        return ds.groupby("_route").map_groups(
            _search_group, batch_format="pyarrow", num_cpus=1
        )


def _regexp_literals(pattern: str) -> tuple[str, str, list[str]]:
    """(prefix, suffix, mandatory_factors) of a regular expression: the
    literal character runs every match MUST contain, derived from the
    stdlib parse tree (top-level sequence only — alternations/classes
    conservatively contribute nothing). ``prefix``/``suffix`` are the
    runs anchored at the pattern's start/end (usable as dictionary range
    seeks); ``factors`` lists all runs (usable as contains-prefilters).
    This is the literal-factor extraction of trigram-index regexp
    matching (Cox, "Regular Expression Matching with a Trigram Index",
    public) applied to a sorted term dictionary."""
    try:
        import re._parser as sre  # py >= 3.11
    except ImportError:  # pragma: no cover
        import sre_parse as sre
    try:
        tree = sre.parse(pattern)
    except Exception:
        return "", "", []
    runs: list[list] = []  # [text, anchored_at_start, anchored_at_end]
    cur: list[str] = []
    cur_at_start = True

    def flush(at_end: bool = False) -> None:
        nonlocal cur, cur_at_start
        if cur:
            runs.append(["".join(cur), cur_at_start, at_end])
        cur = []
        cur_at_start = False  # anything after the first token is unanchored

    broke = False
    for op, av in tree:
        if op is sre.LITERAL:
            cur.append(chr(av))
            continue
        if op in (sre.MAX_REPEAT, sre.MIN_REPEAT):
            lo, hi, sub = av
            items = list(sub)
            if (
                int(lo) >= 1
                and len(items) == 1
                and items[0][0] is sre.LITERAL
            ):
                cur.append(chr(items[0][1]) * min(int(lo), 8))
                if lo == hi:  # exact count: the run continues unbroken
                    continue
        flush()
        broke = True
    flush(at_end=True)
    if not runs:
        return "", "", []
    prefix = runs[0][0] if runs[0][1] else ""
    suffix = runs[-1][0] if runs[-1][2] else ""
    if len(runs) == 1 and not broke:
        # fully literal pattern: the single run is both anchors
        prefix = suffix = runs[0][0]
    return prefix, suffix, [r[0] for r in runs]


def _within_edits(a: str, b: str, k: int) -> bool:
    """Levenshtein(a, b) <= k, with length pre-filter and early-abort DP
    (row minimum > k terminates). Dictionary-expansion scale only — never
    a per-posting hot path."""
    if abs(len(a) - len(b)) > k:
        return False
    if a == b:
        return True
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        mn = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if cur[j] < mn:
                mn = cur[j]
        if mn > k:
            return False
        prev = cur
    return prev[-1] <= k


def query_from_descriptor(kind: str, clauses: list[str]) -> Query:
    kind = str(kind)
    clauses = [str(c) for c in clauses]
    if kind == "term":
        return TermQuery(clauses[0])
    if kind == "bool_and":
        return BooleanQuery.build(must=clauses)
    if kind == "bool_or":
        return BooleanQuery.build(should=clauses)
    if kind == "bool_not":
        return BooleanQuery.build(must=clauses[:1], must_not=clauses[1:])
    if kind == "phrase":
        return PhraseQuery(tuple(clauses))
    if kind == "match_all":
        return MatchAllDocsQuery()
    if kind == "prefix":
        return PrefixQuery(clauses[0])
    if kind == "term_range":
        return TermRangeQuery(clauses[0], clauses[1])
    if kind == "term_set":
        return TermInSetQuery(tuple(clauses))
    if kind == "dismax":
        return DisjunctionMaxQuery(tuple(TermQuery(c) for c in clauses))
    if kind == "constant":
        return ConstantScoreQuery(TermQuery(clauses[0]))
    if kind == "range_filter":
        # clauses = [term, lo, hi]: scored term MUST + docID-range FILTER
        return BooleanQuery.build(
            must=[TermQuery(clauses[0])],
            filter=[DocIdRangeQuery(int(clauses[1]), int(clauses[2]))],
        )
    if kind == "field_term":
        # clauses = [field, term]: keyword-field term query
        return TermQuery(clauses[1], field=clauses[0])
    if kind == "field_mixed":
        # clauses = [text_term, field, value]: scored text MUST + keyword FILTER
        return BooleanQuery.build(
            must=[TermQuery(clauses[0])],
            filter=[TermQuery(clauses[2], field=clauses[1])],
        )
    if kind == "numeric_range":
        # clauses = [term, field, lo, hi]: scored MUST + doc-values FILTER
        return BooleanQuery.build(
            must=[TermQuery(clauses[0])],
            filter=[
                NumericRangeQuery(clauses[1], int(clauses[2]), int(clauses[3]))
            ],
        )
    if kind == "wildcard":
        return WildcardQuery(clauses[0])
    if kind == "fuzzy":
        # clauses = [term, max_edits, prefix_length]
        return FuzzyQuery(clauses[0], int(clauses[1]), int(clauses[2]))
    if kind == "regexp":
        return RegexpQuery(clauses[0])
    if kind == "numeric_set":
        # clauses = [term, field, v1, v2, ...]: scored MUST + set FILTER
        return BooleanQuery.build(
            must=[TermQuery(clauses[0])],
            filter=[
                NumericInSetQuery(clauses[1], tuple(int(v) for v in clauses[2:]))
            ],
        )
    if kind == "numeric_box":
        # clauses = [term, fx, lox, hix, fy, loy, hiy]: scored MUST + 2-D box
        return BooleanQuery.build(
            must=[TermQuery(clauses[0])],
            filter=[
                NumericBoxQuery(
                    clauses[1], int(clauses[2]), int(clauses[3]),
                    clauses[4], int(clauses[5]), int(clauses[6]),
                )
            ],
        )
    if kind == "range_field":
        # clauses = [term, field, lo, hi, relation]: scored MUST +
        # per-doc-interval FILTER (RangeFieldQuery relation semantics)
        return BooleanQuery.build(
            must=[TermQuery(clauses[0])],
            filter=[
                RangeFieldQuery(
                    clauses[1], int(clauses[2]), int(clauses[3]), clauses[4]
                )
            ],
        )
    if kind == "span_near":
        # clauses = [slop, in_order(0/1), term1, term2, ...]; a term with
        # '|' is an OR-clause of alternatives (SpanOr-inside-SpanNear)
        return SpanNearQuery(
            tuple(
                tuple(c.split("|")) if "|" in c else c for c in clauses[2:]
            ),
            slop=int(clauses[0]),
            in_order=bool(int(clauses[1])),
        )
    if kind == "span_first":
        # clauses = [term, end]
        return SpanFirstQuery(clauses[0], int(clauses[1]))
    if kind == "span_not":
        # clauses = [include, exclude, pre, post]
        return SpanNotQuery(
            clauses[0], clauses[1], pre=int(clauses[2]), post=int(clauses[3])
        )
    if kind == "field_exists":
        return FieldExistsQuery(clauses[0])
    raise ValueError(f"unknown query kind {kind!r}")


def _lazy_search_shard(
    index_dir: str,
    query,
    lo: int,
    hi: int,
    k: int,
    prune: bool = False,
    wand_min_postings: int | None = None,
    theta_handle=None,
):
    """One doc-range shard of a sharded query: top-k within [lo, hi].

    With ``prune``, the block-max path runs per shard; a shared
    ``_ThetaAccumulator`` lets every shard adopt the best kth-score seen
    anywhere (total_hits then becomes a lower bound, as under any
    early-terminating collector)."""
    import ray as _r

    s = _worker_searcher(index_dir)
    s._doc_range = (lo, hi)  # tasks run one-at-a-time per worker process
    try:
        td = None
        if prune:
            theta_get = theta_put = None
            if theta_handle is not None:
                theta_get = lambda: _r.get(theta_handle.get.remote())  # noqa: E731
                theta_put = lambda v: theta_handle.update.remote(v)  # noqa: E731
            td = s._try_pruned(
                query, k,
                min_postings=wand_min_postings,
                theta_get=theta_get,
                theta_put=theta_put,
            )
        if td is None:
            ev = s._apply_live(s._eval(query, 1.0, need_scores=True))
            td = _topk(ev, k)
    finally:
        s._doc_range = None
    return td.doc_ids, td.scores, td.total_hits


def _lazy_collect_shard(index_dir: str, query, lo: int, hi: int, manager):
    """One doc-range shard of a CollectorManager run: collect [lo, hi]
    into a fresh collector and return it (picklable state only)."""
    s = _worker_searcher(index_dir)
    s._doc_range = (lo, hi)
    try:
        c = manager.new_collector()
        c.set_context(s)
        ev = s._apply_live(s._eval(query, 1.0, need_scores=c.needs_scores))
        c.collect(ev.docs, ev.scores)
        c.finish()
    finally:
        s._doc_range = None
    return c


# decoration does not require an active Ray session; only .remote() does
import ray as _ray  # noqa: E402

_search_shard = _ray.remote(num_cpus=1)(_lazy_search_shard)
_collect_shard = _ray.remote(num_cpus=1)(_lazy_collect_shard)


def _lazy_predecode_terms(
    index_dir: str, terms: list[str], phrase_terms: list[str]
) -> dict:
    """Decode a chunk of distinct query terms' postings and publish each
    heavy term's arrays to the object store; returns
    {posting_key: ObjectRef}. Positions are included only for terms that
    phrase queries will match (the pos stream dominates decode cost).
    Light terms (below the cutoff) are skipped — per-worker decode of
    those is cheaper than a plasma round trip."""
    import ray as _r

    s = _worker_searcher(index_dir)
    pset = set(phrase_terms)
    out = {}
    for t in terms:
        df, _ = s.term_statistics(t)
        if df < _PREDECODE_MIN_DF:
            continue
        p = s.term_postings(t, with_positions=t in pset)
        if p is not None:
            out[posting_key(s.default_field, t)] = _r.put(p)
    return out


_PREDECODE_MIN_DF = 20_000

_predecode_terms = _ray.remote(num_cpus=1)(_lazy_predecode_terms)


@_ray.remote(num_cpus=0)
class _ThetaAccumulator:
    """Cross-shard min-competitive score accumulator (the distributed
    MaxScoreAccumulator, /root/reference/core/search/maxscoreaccumulator.go):
    monotonically keeps the best kth-score published by any shard."""

    def __init__(self):
        self.theta = -float("inf")

    def update(self, v: float) -> float:
        if v > self.theta:
            self.theta = v
        return self.theta

    def get(self) -> float:
        return self.theta


_WORKER_SEARCHERS: dict[str, "IndexSearcher"] = {}


def _worker_searcher(index_dir: str) -> "IndexSearcher":
    """Per-worker-process searcher cache for map_groups query tasks: Ray
    reuses worker processes across tasks, so the loaded range index and
    decoded-postings caches survive from group to group."""
    s = _WORKER_SEARCHERS.get(index_dir)
    if s is None:
        s = IndexSearcher(index_dir)
        _WORKER_SEARCHERS[index_dir] = s
    return s


class SearcherActor:
    """Actor-pool stage for query throughput: index state loaded once per
    actor (__init__), each __call__ evaluates a batch of queries."""

    def __init__(self, index_dir: str, k: int = 10, prune: bool = False):
        self.searcher = IndexSearcher(index_dir)
        self.k = k
        self.prune = prune

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for row in batch.to_pylist():
            q = query_from_descriptor(row["kind"], list(row["clauses"]))
            k = int(row["k"]) if row.get("k") is not None else self.k
            td = self.searcher.search(q, k, prune=self.prune)
            m = len(td.doc_ids)
            qids.append(np.full(m, int(row["qid"]), dtype=np.int64))
            ranks.append(np.arange(1, m + 1, dtype=np.int64))
            docs.append(td.doc_ids)
            scores.append(td.scores)
        if not qids:
            qids = [np.empty(0, np.int64)]
            ranks = [np.empty(0, np.int64)]
            docs = [np.empty(0, np.int64)]
            scores = [np.empty(0, np.float64)]
        return pa.table(
            {
                "qid": pa.array(np.concatenate(qids)),
                "rank": pa.array(np.concatenate(ranks)),
                "doc_id": pa.array(np.concatenate(docs).astype(np.int64)),
                "score": pa.array(np.concatenate(scores).astype(np.float64)),
            }
        )


# Largest dense docID range a single evaluation may materialize (1 GiB of
# int64). MatchAll / DocIdRange over a 10^12-doc index would allocate TBs
# on one process — at that scale the query must run through search_sharded
# (each shard materializes only its doc range).
_MAX_DENSE_DOCS = 128 * 1024 * 1024


def _check_dense_range(n: int) -> None:
    if n > _MAX_DENSE_DOCS:
        raise ValueError(
            f"dense docID range of {n} docs exceeds the single-process cap "
            f"({_MAX_DENSE_DOCS}); evaluate via search_sharded so each shard "
            "materializes only its own doc range"
        )


# ---------------- sorted-array algebra helpers ----------------


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.empty(0, np.int64)
    if len(b) < len(a):
        a, b = b, a
    pos = np.searchsorted(b, a)
    pos[pos == len(b)] = len(b) - 1
    return a[b[pos] == a]


def _membership(base: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """1 where base ∈ docs else 0 (both sorted unique)."""
    if len(base) == 0 or len(docs) == 0:
        return np.zeros(len(base), dtype=np.int32)
    pos = np.searchsorted(docs, base)
    pos[pos == len(docs)] = len(docs) - 1
    return (docs[pos] == base).astype(np.int32)


def _gather_scores(base: np.ndarray, ev: _Scored) -> np.ndarray:
    out = np.zeros(len(base), dtype=np.float64)
    if len(ev.docs) == 0 or len(base) == 0:
        return out
    pos = np.searchsorted(ev.docs, base)
    pos_c = np.minimum(pos, len(ev.docs) - 1)
    hit = ev.docs[pos_c] == base
    out[hit] = ev.scores[pos_c[hit]]
    return out


def _doc_pos_keys(p: dict, docs: np.ndarray, BIG: np.int64) -> np.ndarray:
    """(local_ord*BIG + position) keys for postings restricted to ``docs``.

    The ordinal is the doc's index within ``docs`` (the conjunction
    candidate set), so the packed key stays well inside int64 regardless of
    global docID magnitude; callers map ordinals back via ``docs[key//BIG]``.
    """
    sel = np.searchsorted(p["docs"], docs)
    freqs = p["freqs"]
    starts = np.zeros(len(p["docs"]), dtype=np.int64)
    starts[1:] = np.cumsum(freqs)[:-1]
    # flatten selected docs' position ranges
    reps = freqs[sel]
    doc_rep = np.repeat(np.arange(len(docs), dtype=np.int64), reps)
    base_rep = np.repeat(starts[sel], reps)
    within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    pos = p["positions"][base_rep + within]
    return doc_rep * BIG + pos


def _pure_and_terms(q: Query):
    """TermQuery list for a pure-AND (all-MUST) query of >=2 terms, else
    None (single MUST rewrites to TermQuery and takes the OR path)."""
    if isinstance(q, BooleanQuery):
        tqs = []
        for c in q.clauses:
            if c.occur is not Occur.MUST or not isinstance(c.query, TermQuery):
                return None
            tqs.append(c.query)
        return tqs if len(tqs) >= 2 else None
    return None


def _pure_or_terms(q: Query):
    """TermQuery list for a pure-OR (or single-term) query, else None."""
    if isinstance(q, TermQuery):
        return [q]
    if isinstance(q, BooleanQuery):
        if q.minimum_should_match > 1:
            return None
        tqs = []
        for c in q.clauses:
            if c.occur is not Occur.SHOULD or not isinstance(c.query, TermQuery):
                return None
            tqs.append(c.query)
        return tqs or None
    return None


def _select_topk(
    docs: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Exact (score desc, docID asc) top-k over UNORDERED candidates via
    partition-select — O(n) instead of the O(n log n) lexsort (the pruned
    sweep's per-batch heap update feeds tens of thousands of candidates).
    Ties at the kth score are broken by ascending docID explicitly (the
    docs array is not sorted here, unlike _topk's fast path)."""
    n = len(docs)
    if n <= k:
        return docs, scores
    kth = np.partition(scores, n - k)[n - k]
    gt = np.flatnonzero(scores > kth)
    eq = np.flatnonzero(scores == kth)
    take = k - len(gt)
    if take < len(eq):
        eq = eq[np.argsort(docs[eq], kind="stable")[:take]]
    idx = np.concatenate([gt, eq])
    return docs[idx], scores[idx]


def _topk(s: _Scored, k: int) -> TopDocs:
    """Exact top-k, (score desc, docID asc): partition-select the kth score
    then rank only the O(k) candidates — no full sort of the scored array.
    docs are ascending, so among kth-score ties the first occurrences are
    the docID-ascending winners."""
    n = len(s.docs)
    if n == 0:
        return TopDocs(np.empty(0, np.int64), np.empty(0), 0)
    if n > 4 * k:
        kth = np.partition(s.scores, n - k)[n - k]
        gt = np.flatnonzero(s.scores > kth)
        eq = np.flatnonzero(s.scores == kth)[: k - len(gt)]
        idx = np.concatenate([gt, eq])
        order = np.lexsort((s.docs[idx], -s.scores[idx]))[:k]
        idx = idx[order]
        return TopDocs(s.docs[idx], s.scores[idx], n)
    order = np.lexsort((s.docs, -s.scores))[:k]
    return TopDocs(s.docs[order], s.scores[order], n)
