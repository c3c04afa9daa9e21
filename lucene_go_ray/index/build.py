"""Distributed index build: partition planning + stateful segment indexers.

The Ray-Data graft of the reference write path
(IndexWriter.AddDocument → DWPT → flush, SURVEY.md §3.1):

- one *partition descriptor* per input shard (file / row-group range),
  planned driver-side from parquet **metadata only** (no data read) so that
  global docIDs are deterministic: docBase = prefix sum of partition row
  counts in (sorted file, row-group) order — the composite-reader docBase
  stitching (/root/reference/core/index/standarddirectoryreader.go:48);
- a ``ray.data.Dataset`` over the descriptors feeds a ``SegmentIndexer``
  actor pool via ``map_batches`` — each actor is the analogue of a
  DocumentsWriterPerThread (documentswriterflushcontrol.go:65-79): it reads
  its shard (column-pruned), analyzes, builds in-RAM postings, and flushes
  one self-contained segment (docmap + terms + packed postings);
- segments are committed with temp-dir + atomic rename (idempotent retries,
  mirroring pending_segments_N → segments_N, segmentinfos.go:258-259), and a
  manifest with per-partition lineage + metrics enables resume: a re-run
  skips every partition whose committed segment exists.

Scale notes: at 10^12 docs the descriptor table is ~10^6-10^7 rows (tiny);
all heavy data flows worker→disk inside the actors, never through the
driver. The only driver-side materialization is the manifest row stream.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis import StandardAnalyzer
from .codec import get_codec
from .config import IndexConfig
from .manifest import (
    Manifest,
    PartitionInfo,
    finalize_partitions,
    load_manifest,
    save_manifest,
)

SEGMENT_DIR = "segments"


def segment_path(index_dir: str, pid: int) -> str:
    return os.path.join(index_dir, SEGMENT_DIR, f"p={pid:05d}")


def plan_partitions(paths: list[str], target_rows: int) -> list[PartitionInfo]:
    """Pack row groups of the (sorted) input files into ~target_rows partitions.

    Metadata-only: reads parquet footers, never data. A row group larger than
    2x target is split into row ranges (the reading task slices after a
    single row-group read).
    """
    parts: list[PartitionInfo] = []
    pid = 0
    for path in sorted(paths):
        md = pq.ParquetFile(path).metadata
        pending_rgs: list[int] = []
        pending_rows = 0
        pending_bytes = 0

        def flush_pending():
            nonlocal pid, pending_rgs, pending_rows, pending_bytes
            if pending_rgs:
                parts.append(
                    PartitionInfo(
                        pid=pid,
                        path=path,
                        row_groups=list(pending_rgs),
                        row_start=0,
                        num_docs=pending_rows,
                        input_bytes=pending_bytes,
                    )
                )
                pid += 1
                pending_rgs, pending_rows, pending_bytes = [], 0, 0

        for rg in range(md.num_row_groups):
            rows = md.row_group(rg).num_rows
            nbytes = md.row_group(rg).total_byte_size
            if rows > 2 * target_rows:
                flush_pending()
                # split one big row group into row ranges
                nsplit = (rows + target_rows - 1) // target_rows
                base = 0
                for s in range(nsplit):
                    n = min(target_rows, rows - base)
                    parts.append(
                        PartitionInfo(
                            pid=pid,
                            path=path,
                            row_groups=[rg],
                            row_start=base,
                            num_docs=n,
                            input_bytes=nbytes // nsplit,
                        )
                    )
                    pid += 1
                    base += n
            else:
                if pending_rows and pending_rows + rows > target_rows:
                    flush_pending()
                pending_rgs.append(rg)
                pending_rows += rows
                pending_bytes += nbytes
        flush_pending()
    return parts


class SegmentIndexer:
    """Actor-pool stage: descriptor batch in → manifest rows out.

    Stateful setup (analyzer tables, config) happens once in ``__init__``;
    each ``__call__`` builds whole segments. All token-level work is
    vectorized (arrow split/lower/is_in + numpy lexsort/run-length)."""

    def __init__(self, index_dir: str, cfg_dict: dict):
        self.index_dir = index_dir
        self.cfg = IndexConfig.from_dict(cfg_dict)
        self.analyzer = StandardAnalyzer(
            stop_words=self.cfg.stop_set(),
            lowercase=self.cfg.lowercase,
            position_increment_gap=self.cfg.position_increment_gap,
            offset_gap=self.cfg.offset_gap,
        )
        self.codec = get_codec(self.cfg.codec_name)

    # -- core: one partition -> one segment on disk ------------------------
    def build_segment(self, part: dict) -> dict:
        t0 = time.perf_counter()
        # normalize descriptor values (numpy scalars from the batch)
        part = {
            "pid": int(part["pid"]),
            "path": str(part["path"]),
            "row_groups": [int(x) for x in part["row_groups"]],
            "row_start": int(part["row_start"]),
            "num_docs": int(part["num_docs"]),
            "input_bytes": int(part.get("input_bytes", 0)),
            # expungeDeletes rebuild: local ords whose content is dropped
            # from postings/stats (docmap rows & docBases stay — stable IDs)
            "dead_ords": sorted(
                int(x)
                for x in (
                    [] if part.get("dead_ords") is None else part["dead_ords"]
                )
            ),
            "replace": bool(part.get("replace", False)),
        }
        cfg = self.cfg
        pf = pq.ParquetFile(part["path"])
        cols = [cfg.key_column, cfg.text_column]
        range_srcs = tuple(c for rf in cfg.range_fields for c in rf[1:])
        for extra in (
            tuple(cfg.keyword_fields)
            + tuple(cfg.docvalue_fields)
            + tuple(getattr(cfg, "string_docvalue_fields", ()))
            + range_srcs
        ):
            if extra not in cols:
                cols.append(extra)
        table = pf.read_row_groups(list(part["row_groups"]), columns=cols)
        if part["row_start"] or len(table) != part["num_docs"]:
            table = table.slice(part["row_start"], part["num_docs"])
        n_docs = len(table)

        # ---- expungeDeletes (indexwriter.go:399-422 delete GC surface):
        # blank the dead rows' indexed content BEFORE analysis, so postings,
        # norms, per-field stats, dv zone maps and has-field bitmaps are all
        # rebuilt without them, while the physical row (and hence every
        # surviving doc's ord / global docID) stays put — the immutable-ID
        # analogue of Lucene's segment-rewriting expunge.
        dead_ords = np.asarray(part["dead_ords"], dtype=np.int64)
        if len(dead_ords):
            alive = np.ones(n_docs, dtype=bool)
            alive[dead_ords] = False
            keep = pa.array(alive)
            for name in table.column_names:
                if name == cfg.key_column:
                    continue  # keys stay retrievable (Lucene stored fields
                    # of deleted docs remain until the file is dropped)
                col = table[name].combine_chunks()
                table = table.set_column(
                    table.schema.get_field_index(name),
                    name,
                    pc.if_else(keep, col, pa.scalar(None, type=col.type)),
                )

        tok = self.analyzer.analyze_column(
            table[cfg.text_column],
            emit_offsets=cfg.index_offsets or cfg.payload_kind is not None,
        )
        norms = tok["norms"]  # int64 per doc
        doc_idx = tok["doc_idx"].astype(np.int64)
        positions = tok["positions"].astype(np.int64)

        # term interning (BytesHash analogue): arrow dictionary encode
        dict_arr = tok["terms"].dictionary_encode()
        term_ids = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = dict_arr.dictionary.to_pylist()
        # UTF-8 byte-order term sort (byteshash.go:138 semantics; python str
        # sort == codepoint order == UTF-8 byte order for valid unicode)
        order = np.argsort(np.asarray(vocab, dtype=object), kind="stable")
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[order] = np.arange(len(vocab))
        sorted_vocab = [vocab[i] for i in order]
        term_ids = rank[term_ids]

        # sort tokens by (term, doc, position); analyze output is already
        # doc-then-position ordered, so a stable sort on term_id suffices
        perm = np.argsort(term_ids, kind="stable")
        t_sorted = term_ids[perm]
        d_sorted = doc_idx[perm]
        p_sorted = positions[perm]

        # run-length over (term, doc) -> postings
        if len(t_sorted):
            change = np.empty(len(t_sorted), dtype=bool)
            change[0] = True
            change[1:] = (t_sorted[1:] != t_sorted[:-1]) | (
                d_sorted[1:] != d_sorted[:-1]
            )
            starts = np.flatnonzero(change)
            freqs_all = np.diff(np.append(starts, len(t_sorted)))
            post_term = t_sorted[starts]
            post_doc = d_sorted[starts]
            tchange = np.empty(len(post_term), dtype=bool)
            tchange[0] = True
            tchange[1:] = post_term[1:] != post_term[:-1]
            tstarts = np.flatnonzero(tchange)
            tcounts = np.diff(np.append(tstarts, len(post_term)))
        else:
            starts = freqs_all = post_term = post_doc = np.empty(0, np.int64)
            tstarts = tcounts = np.empty(0, np.int64)

        norms8 = (norms & 0xFF).astype(np.uint8)
        n_terms = len(tstarts)
        if n_terms:
            term_offsets = np.append(tstarts, len(post_doc)).astype(np.int64)
            enc = self.codec.encode_postings_many(
                post_doc,
                freqs_all,
                norms8[post_doc],
                term_offsets,
                p_sorted if cfg.index_positions else None,
                block=cfg.block_size,
            )
        else:
            enc = None

        # ---- keyword fields: StringField semantics (stringfield.go:20-41)
        # one verbatim term per non-null doc, freq 1, position 0, norm 1 —
        # same postings codec under the (field, term) key
        pid = int(part["pid"])
        field_tables = [_enc_to_terms_table(enc, cfg.text_column, sorted_vocab, pid)]
        field_stats: dict = {}
        for kf in sorted(cfg.keyword_fields):
            kt, kstats = self._keyword_field_table(table, kf, pid)
            field_tables.append(kt)
            field_stats[kf] = kstats
        # fields sorted by name, terms sorted within => rows ordered by the
        # combined (field, term) posting key
        field_tables.sort(key=lambda t: t["field"][0].as_py() if len(t) else "")

        # ---- doc-values columns + zone maps ----
        dv_cols: dict[str, pa.Array] = {}
        dv_ranges: dict = {}
        for dvf in cfg.docvalue_fields:
            col = table[dvf].combine_chunks()
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())  # epoch micros
            else:
                col = col.cast(pa.int64())
            dv_cols[f"dv_{dvf}"] = col
            mm = pc.min_max(col).as_py()
            if mm["min"] is not None:
                dv_ranges[dvf] = [int(mm["min"]), int(mm["max"])]
        # String/binary doc-values (SORTED / SORTED_SET / BINARY,
        # docvaluesreader.go:129,326): stored verbatim as sdv_{f} docmap
        # columns — parquet dictionary-encodes low-cardinality strings, so
        # the on-disk shape is the per-segment ordinal table of the
        # reference without a separate dict file.
        sdv_cols: dict[str, pa.Array] = {}
        for sdf in getattr(cfg, "string_docvalue_fields", ()):
            sdv_cols[f"sdv_{sdf}"] = table[sdf].combine_chunks()

        # RangeField intervals (core/query/rangefieldquery.go analogue):
        # lo/hi derived element-wise so min<=max holds by construction
        # (the reference's verifyAndEncode invariant, longrange.go:15-39);
        # skip_nulls=False => a doc with either source null has NO range.
        for rf in cfg.range_fields:
            name, col_a, col_b = rf[0], rf[1], rf[2]
            a = table[col_a].combine_chunks().cast(pa.int64())
            b = table[col_b].combine_chunks().cast(pa.int64())
            lo = pc.min_element_wise(a, b, skip_nulls=False)
            hi = pc.max_element_wise(a, b, skip_nulls=False)
            for suffix, col in (("lo", lo), ("hi", hi)):
                dv_cols[f"dv_{name}_{suffix}"] = col
                mm = pc.min_max(col).as_py()
                if mm["min"] is not None:
                    dv_ranges[f"{name}_{suffix}"] = [
                        int(mm["min"]),
                        int(mm["max"]),
                    ]

        # ---- write segment (tmp dir + atomic rename) ----
        final_dir = segment_path(self.index_dir, pid)
        tmp_dir = os.path.join(
            self.index_dir, SEGMENT_DIR, f".tmp-p={pid:05d}-{os.getpid()}"
        )
        os.makedirs(tmp_dir, exist_ok=True)
        # has-field validity bitmaps (FieldExistsQuery's docsWithField,
        # /root/reference/core/search — DocValuesFieldExistsQuery semantics):
        # one bool column per indexed field, so exists-lookups are a docmap
        # column scan instead of a full term-dictionary expansion. Text
        # field: >=1 surviving (non-stopped) token == >=1 posting; keyword
        # fields: non-null value (null indexes nothing).
        hf_cols: dict[str, pa.Array] = {
            f"hf_{cfg.text_column}": pa.array(norms > 0)
        }
        for kf in sorted(cfg.keyword_fields):
            hf_cols[f"hf_{kf}"] = pc.is_valid(table[kf].combine_chunks())
        docmap = pa.table(
            {
                "ord": pa.array(np.arange(n_docs, dtype=np.int64)),
                "key": table[cfg.key_column],
                "norm": pa.array(norms),
                **dv_cols,
                **sdv_cols,
                **hf_cols,
            }
        )
        pq.write_table(docmap, os.path.join(tmp_dir, "docmap.parquet"))
        if len(dead_ords):
            # the segment's liveDocs complement (segmentreader.go liveDocs /
            # the .liv file): sorted local ords expunged from this segment.
            # Searchers union (doc_base + these) into the collect-time filter.
            pq.write_table(
                pa.table({"ord": pa.array(dead_ords, type=pa.int64())}),
                os.path.join(tmp_dir, "dead.parquet"),
            )
        terms_table = pa.concat_tables(field_tables)
        pq.write_table(terms_table, os.path.join(tmp_dir, "terms.parquet"))
        if cfg.index_offsets and len(t_sorted):
            # segment-local offsets side table (one row per (term, ord)
            # posting, occurrence offsets as list columns, term-sorted so
            # parquet row-group stats prune term lookups). Never shuffled:
            # highlighting resolves global docID -> (segment, ord) first.
            occ_offsets = np.zeros(len(post_doc) + 1, dtype=np.int64)
            np.cumsum(freqs_all, out=occ_offsets[1:])
            s_sorted = tok["starts"].astype(np.int32)[perm]
            e_sorted = tok["ends"].astype(np.int32)[perm]
            vocab_arr = np.asarray(sorted_vocab, dtype=object)
            off_table = pa.table(
                {
                    "term": pa.array(
                        vocab_arr[post_term].tolist(), type=pa.large_string()
                    ),
                    "ord": pa.array(post_doc.astype(np.int32)),
                    "starts": pa.LargeListArray.from_arrays(
                        occ_offsets, pa.array(s_sorted, type=pa.int32())
                    ),
                    "ends": pa.LargeListArray.from_arrays(
                        occ_offsets, pa.array(e_sorted, type=pa.int32())
                    ),
                }
            )
            pq.write_table(
                off_table,
                os.path.join(tmp_dir, "offsets.parquet"),
                row_group_size=65536,
            )
        if cfg.index_offsets and "value_doc" in tok:
            # multi-valued text column: per-(doc, value) stream bases —
            # the inversion table mapping a stored quirk offset back to
            # (value index, actual byte offset). One list row per doc;
            # single-valued fields need no table (base is always 0).
            vdoc = tok["value_doc"].astype(np.int64)
            vb_counts = np.bincount(vdoc, minlength=n_docs).astype(np.int64)
            vb_offs = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(vb_counts, out=vb_offs[1:])
            pq.write_table(
                pa.table(
                    {
                        "ord": pa.array(np.arange(n_docs, dtype=np.int64)),
                        "pos_base": pa.LargeListArray.from_arrays(
                            vb_offs, pa.array(tok["value_pos_base"], pa.int64())
                        ),
                        "off_base": pa.LargeListArray.from_arrays(
                            vb_offs, pa.array(tok["value_off_base"], pa.int64())
                        ),
                    }
                ),
                os.path.join(tmp_dir, "value_bases.parquet"),
            )

        if cfg.payload_kind is not None and len(t_sorted):
            # per-occurrence payload side table (hasPayload prox surface,
            # freqproxtermswriterperfield.go:124-218 — see index/payloads):
            # same (term, ord) + list-column layout as the offsets stream,
            # values aligned with occurrence order of the positions stream
            from .payloads import payload_values

            pay_sorted = payload_values(cfg.payload_kind, tok)[perm]
            pay_offsets = np.zeros(len(post_doc) + 1, dtype=np.int64)
            np.cumsum(freqs_all, out=pay_offsets[1:])
            vocab_arr_p = np.asarray(sorted_vocab, dtype=object)
            pay_table = pa.table(
                {
                    "term": pa.array(
                        vocab_arr_p[post_term].tolist(), type=pa.large_string()
                    ),
                    "ord": pa.array(post_doc.astype(np.int32)),
                    "payloads": pa.LargeListArray.from_arrays(
                        pay_offsets, pa.array(pay_sorted, type=pa.int32())
                    ),
                }
            )
            pq.write_table(
                pay_table,
                os.path.join(tmp_dir, "payloads.parquet"),
                row_group_size=65536,
            )

        if cfg.index_term_vectors:
            self._write_term_vectors(
                tmp_dir, table, post_term, post_doc, freqs_all, p_sorted,
                sorted_vocab,
            )

        info = PartitionInfo(
            pid=pid,
            path=part["path"],
            row_groups=list(part["row_groups"]),
            row_start=int(part["row_start"]),
            num_docs=n_docs,
            num_terms=n_terms,
            sum_total_term_freq=int(norms.sum()),
            sum_doc_freq=int(len(starts)),
            doc_count=int((norms > 0).sum()),
            build_secs=time.perf_counter() - t0,
            input_bytes=int(part.get("input_bytes", 0)),
            field_stats=field_stats,
            dv_ranges=dv_ranges,
            num_deleted=len(dead_ords),
        )
        with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
            json.dump(asdict(info), f)
        if part["replace"] and os.path.exists(final_dir):
            # compaction rewrite: retire the old segment dir, promote the new
            # one. A crash between the two renames leaves no final dir, which
            # the resumable planner treats as "not built" and rebuilds; the
            # retired dir is swept by the orphan GC (cli clean).
            import shutil

            trash = final_dir + f".old-{os.getpid()}"
            os.replace(final_dir, trash)
            os.replace(tmp_dir, final_dir)
            shutil.rmtree(trash, ignore_errors=True)
        elif os.path.exists(final_dir):  # lost a race with a retry — keep winner
            import shutil

            shutil.rmtree(tmp_dir)
        else:
            os.replace(tmp_dir, final_dir)
        return asdict(info)

    def _write_term_vectors(
        self,
        tmp_dir: str,
        table: pa.Table,
        post_term: np.ndarray,
        post_doc: np.ndarray,
        freqs_all: np.ndarray,
        p_sorted: np.ndarray,
        sorted_vocab: list,
    ) -> None:
        """Per-document term vectors (FieldType.StoreTermVectors semantics,
        /root/reference/core/document/fieldtype.go:10-25; the simpletext
        codec's term-vector writer is the reference store): one row per
        (doc, field, term) with freq + positions, the doc-major transpose
        of the postings. Rows sorted (ord, field, term) so parquet
        row-group stats prune single-doc retrievals; derivation is pure
        array transposition of the already-built term-major postings — the
        analyzer never runs twice."""
        cfg = self.cfg
        fields_sorted = sorted({cfg.text_column, *cfg.keyword_fields})
        frank_of = {f: i for i, f in enumerate(fields_sorted)}

        parts: list[pa.Table] = []
        # text field: transpose postings (term-major -> doc-major)
        occ = np.zeros(len(post_doc) + 1, dtype=np.int64)
        np.cumsum(freqs_all, out=occ[1:])
        vocab_arr = np.asarray(sorted_vocab, dtype=object)
        parts.append(
            pa.table(
                {
                    "ord": pa.array(post_doc.astype(np.int32)),
                    "field": pa.array(
                        [cfg.text_column] * len(post_doc), type=pa.string()
                    ),
                    "term": pa.array(
                        vocab_arr[post_term].tolist()
                        if len(post_doc)
                        else [],
                        type=pa.large_string(),
                    ),
                    "freq": pa.array(freqs_all.astype(np.int32)),
                    "positions": pa.LargeListArray.from_arrays(
                        occ, pa.array(p_sorted.astype(np.int32))
                    ),
                    "_frank": pa.array(
                        np.full(len(post_doc), frank_of[cfg.text_column], np.int32)
                    ),
                    "_trank": pa.array(post_term.astype(np.int64)),
                }
            )
        )
        # keyword fields: one verbatim term per non-null doc, freq 1, pos 0
        for kf in sorted(cfg.keyword_fields):
            col = table[kf].combine_chunks().cast(pa.large_string())
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            ords = np.flatnonzero(valid).astype(np.int32)
            vals = col.drop_null()
            denc = vals.dictionary_encode()
            ids = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            kvocab = denc.dictionary.to_pylist()
            korder = np.argsort(np.asarray(kvocab, dtype=object), kind="stable")
            krank = np.empty(len(kvocab), dtype=np.int64)
            krank[korder] = np.arange(len(kvocab))
            n = len(ords)
            parts.append(
                pa.table(
                    {
                        "ord": pa.array(ords),
                        "field": pa.array([kf] * n, type=pa.string()),
                        "term": vals.cast(pa.large_string()),
                        "freq": pa.array(np.ones(n, np.int32)),
                        "positions": pa.LargeListArray.from_arrays(
                            np.arange(n + 1, dtype=np.int64),
                            pa.array(np.zeros(n, np.int32)),
                        ),
                        "_frank": pa.array(np.full(n, frank_of[kf], np.int32)),
                        "_trank": pa.array(krank[ids]),
                    }
                )
            )
        tv = pa.concat_tables(parts)
        perm = np.lexsort(
            (
                tv["_trank"].to_numpy(zero_copy_only=False),
                tv["_frank"].to_numpy(zero_copy_only=False),
                tv["ord"].to_numpy(zero_copy_only=False),
            )
        )
        tv = tv.take(pa.array(perm)).drop_columns(["_frank", "_trank"])
        pq.write_table(
            tv, os.path.join(tmp_dir, "tvec.parquet"), row_group_size=65536
        )

    def _keyword_field_table(
        self, table: pa.Table, kf: str, pid: int
    ) -> tuple[pa.Table, dict]:
        """Postings rows + stats partial for one keyword field: each non-null
        doc contributes exactly one (value, doc) posting with freq 1 and
        norm 1 (single-token doc ⇒ per-field avgdl == 1)."""
        cfg = self.cfg
        arr = table[kf].combine_chunks().cast(pa.string())
        de = arr.dictionary_encode()
        codes = de.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        vocab = de.dictionary.to_pylist()
        order = np.argsort(np.asarray(vocab, dtype=object), kind="stable")
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[order] = np.arange(len(vocab))
        sorted_vocab = [vocab[i] for i in order]
        valid = np.flatnonzero(codes >= 0)
        n_valid = len(valid)
        if n_valid:
            ranks = rank[codes[valid]]
            perm = np.argsort(ranks, kind="stable")  # docs ascend within term
            post_doc = valid[perm].astype(np.int64)
            r_sorted = ranks[perm]
            tchange = np.empty(n_valid, dtype=bool)
            tchange[0] = True
            tchange[1:] = r_sorted[1:] != r_sorted[:-1]
            tstarts = np.flatnonzero(tchange)
            term_offsets = np.append(tstarts, n_valid).astype(np.int64)
            used_vocab = [sorted_vocab[r] for r in r_sorted[tstarts]]
            enc = self.codec.encode_postings_many(
                post_doc,
                np.ones(n_valid, dtype=np.int64),
                np.ones(n_valid, dtype=np.uint8),
                term_offsets,
                np.zeros(n_valid, dtype=np.int64)
                if cfg.index_positions
                else None,
                block=cfg.block_size,
            )
        else:
            enc, used_vocab = None, []
        stats = {
            "doc_count": int(n_valid),
            "sum_total_term_freq": int(n_valid),
            "sum_doc_freq": int(n_valid),
        }
        return _enc_to_terms_table(enc, kf, used_vocab, pid), stats

    def __call__(self, batch: dict) -> dict:
        out: list[dict] = []
        n = len(batch["pid"])
        for i in range(n):
            part = {k: batch[k][i] for k in batch}
            out.append(self.build_segment(part))
        return {"info": np.array([json.dumps(r) for r in out], dtype=object)}


def _enc_to_terms_table(
    enc: dict | None, fld: str, sorted_vocab: list[str], pid: int
) -> pa.Table:
    n = len(sorted_vocab) if enc is not None else 0
    cols: dict[str, pa.Array] = {}
    for name, t in _TERMS_SCHEMA:
        if name == "field":
            cols[name] = pa.array([fld] * n, type=t)
        elif name == "term":
            cols[name] = pa.array(sorted_vocab[:n], type=t)
        elif name == "pid":
            cols[name] = pa.array(np.full(n, pid, dtype=np.int32), type=t)
        else:
            vals = enc[name] if enc is not None else []
            cols[name] = pa.array(vals, type=t)
    return pa.table(cols)


_TERMS_SCHEMA = [
    ("field", pa.string()),
    ("term", pa.large_string()),
    ("pid", pa.int32()),
    ("doc_freq", pa.int64()),
    ("total_term_freq", pa.int64()),
    ("first_doc", pa.int64()),
    ("last_doc", pa.int64()),
    ("docs_blob", pa.large_binary()),
    ("doc_widths", pa.large_binary()),
    ("freqs_blob", pa.large_binary()),
    ("freq_widths", pa.large_binary()),
    ("norms_blob", pa.large_binary()),
    ("block_last", pa.large_binary()),
    ("block_max_freq", pa.large_binary()),
    ("block_min_norm", pa.large_binary()),
    ("pos_blob", pa.large_binary()),
    ("pos_width", pa.int32()),
]
_TERMS_SCHEMA_NAMES = [n for n, _ in _TERMS_SCHEMA]


def _completed_pids(index_dir: str) -> dict[int, PartitionInfo]:
    seg_root = os.path.join(index_dir, SEGMENT_DIR)
    done: dict[int, PartitionInfo] = {}
    if not os.path.isdir(seg_root):
        return done
    for name in os.listdir(seg_root):
        if not name.startswith("p="):
            continue
        meta = os.path.join(seg_root, name, "meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                info = PartitionInfo(**json.load(f))
            done[info.pid] = info
    return done


def build_index(
    input_paths: list[str] | str,
    index_dir: str,
    cfg: IndexConfig | None = None,
    *,
    concurrency: int | None = None,
    merge: bool = True,
) -> Manifest:
    """Build (or resume) the full index: segments, then the global merge.

    Resumable: completed segments (committed via atomic rename) are skipped;
    the manifest is only written once every planned partition exists.
    """
    import ray
    import ray.data

    cfg = cfg or IndexConfig()
    t_start = time.perf_counter()
    if isinstance(input_paths, str):
        input_paths = _expand_paths(input_paths)
    parts = plan_partitions(input_paths, cfg.target_partition_rows)
    done = _completed_pids(index_dir)
    todo = [p for p in parts if p.pid not in done]
    os.makedirs(os.path.join(index_dir, SEGMENT_DIR), exist_ok=True)

    if todo:
        for info in _run_segment_builds(index_dir, cfg, todo, concurrency):
            done[info.pid] = info

    t_segments = time.perf_counter()
    manifest = finalize_partitions([done[p.pid] for p in parts])
    manifest.config = asdict(cfg)
    manifest.metrics = {
        "segments_wall_seconds": round(t_segments - t_start, 3),
        "partitions_built_this_run": len(todo),
        "partitions_resumed": len(parts) - len(todo),
        "sum_partition_build_seconds": round(
            sum(p["build_secs"] for p in manifest.partitions), 3
        ),
        "input_bytes": int(sum(p["input_bytes"] for p in manifest.partitions)),
    }
    save_manifest(index_dir, manifest)

    if merge:
        from .merge import merge_index

        t_merge = time.perf_counter()
        manifest = merge_index(index_dir, manifest, cfg)
        manifest.metrics["merge_wall_seconds"] = round(
            time.perf_counter() - t_merge, 3
        )
        manifest.metrics["docs_per_second"] = round(
            manifest.max_doc / max(1e-9, time.perf_counter() - t_start), 1
        )
        save_manifest(index_dir, manifest)
    return manifest


def _run_segment_builds(
    index_dir: str,
    cfg: IndexConfig,
    todo: list,
    concurrency: int | None,
    *,
    from_descriptors: bool = False,
) -> list[PartitionInfo]:
    """Actor-pool build of the given partitions. ``todo`` is a list of
    PartitionInfo, or (``from_descriptors``) raw descriptor dicts that may
    carry the expunge keys (dead_ords, replace)."""
    import ray
    import ray.data

    n_actors = concurrency or max(
        1, min(len(todo), int(ray.cluster_resources().get("CPU", 4)))
    )
    items = todo if from_descriptors else [asdict(p) for p in todo]
    ds = ray.data.from_items(items)
    infos = ds.map_batches(
        SegmentIndexer,
        fn_constructor_kwargs={"index_dir": index_dir, "cfg_dict": asdict(cfg)},
        batch_size=1,
        concurrency=n_actors,
        num_cpus=1,
    ).take_all()
    return [PartitionInfo(**json.loads(row["info"])) for row in infos]


def add_documents(
    index_dir: str,
    new_paths: list[str] | str,
    *,
    concurrency: int | None = None,
    merge: str = "auto",
) -> Manifest:
    """Append documents to an existing index — the IndexWriter.AddDocuments
    + Commit surface (/root/reference/core/index/indexwriter.go:424-447) for
    an already-committed index.

    New input files are planned into fresh partitions numbered AFTER every
    existing pid, so existing partitions keep their docBases (tombstones
    stay valid) and new docs get globally larger docIDs — exactly the
    reference's monotone docID assignment across commits.

    ``merge`` selects the MergePolicy behaviour (the reference's
    mergepolicy.go:134-334 contract): ``"auto"`` applies the size-tiered
    decision (plan_merge — incremental fold of only the new segments'
    buckets while growth since the last full merge is small, full
    re-shuffle past cfg.tiered_growth_ratio), ``"incremental"`` /
    ``"full"`` force a path, ``"none"`` commits the segments unmerged
    (searchable via NRT)."""
    from .merge import incremental_merge_index, merge_index, plan_merge

    manifest = load_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest in {index_dir}; build first")
    cfg = IndexConfig.from_dict(manifest.config)
    if isinstance(new_paths, str):
        new_paths = _expand_paths(new_paths)
    existing = [PartitionInfo(**p) for p in manifest.partitions]
    offset = 1 + max((p.pid for p in existing), default=-1)
    new_parts = plan_partitions(new_paths, cfg.target_partition_rows)
    for p in new_parts:
        p.pid += offset
    done = _completed_pids(index_dir)
    todo = [p for p in new_parts if p.pid not in done]
    built = {p.pid: p for p in existing}
    built.update({p.pid: done[p.pid] for p in new_parts if p.pid in done})
    for info in _run_segment_builds(index_dir, cfg, todo, concurrency):
        built[info.pid] = info
    manifest = finalize_partitions(list(built.values()))
    manifest.config = asdict(cfg)
    manifest.merged = False
    save_manifest(index_dir, manifest)
    if merge == "none":
        return manifest
    if merge == "auto":
        merge = plan_merge(index_dir, manifest, cfg)
    if merge == "incremental":
        manifest = incremental_merge_index(index_dir, manifest, cfg)
    elif merge == "full":
        manifest = merge_index(index_dir, manifest, cfg)
    else:
        raise ValueError(f"unknown merge mode {merge!r}")
    save_manifest(index_dir, manifest)
    return manifest


def update_documents(
    index_dir: str,
    delete_query,
    new_paths: list[str] | str,
    *,
    concurrency: int | None = None,
) -> Manifest:
    """Atomic-intent delete+add — IndexWriter.UpdateDocument semantics
    (/root/reference/core/index/indexwriter.go:399-422): tombstone every doc
    matching ``delete_query``, then append the replacement documents.
    Collection statistics keep counting tombstoned docs (liveDocs
    semantics) until their partitions are rebuilt."""
    from .deletes import delete_by_query

    delete_by_query(index_dir, delete_query)
    return add_documents(index_dir, new_paths, concurrency=concurrency)


def _expand_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]
