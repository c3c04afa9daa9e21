"""Global posting merge: groupby-term shuffle of per-partition segments.

Replaces both the reference's (unimplemented) SegmentMerger
(/root/reference/core/index/segmentmerger.go:17-29) and its composite-reader
multi-segment search with an explicit Ray Data shuffle:

1. a tiny ``groupby(term)`` aggregate over per-segment term *stats* rows
   (term, doc_freq, ttf — no blobs) produces the global term-statistics
   table (the TermStates / CollectionStatistics source,
   /root/reference/core/index/termstates.go:52-93) and identifies *hot*
   terms (Zipfian web-text skew);

2. the full segment term rows (with packed posting blobs — already
   partial-aggregated, so at most P rows per term) are salted —
   ``salt = pid // salt_group_partitions`` for hot terms, 0 otherwise — and
   shuffled with ``groupby(term, salt).map_groups``; each group concatenates
   its partitions' postings in docBase order (global docIDs stay sorted
   because salt groups are contiguous pid ranges) and re-encodes them into
   FOR-compressed chunk rows of at most ``chunk_docs`` postings with fresh
   block-max metadata;

3. a metadata-only pass over the written files builds the term→(file,
   row-group) range index — the file-granularity analogue of the FST term
   dictionary (/root/reference/codecs/simpletext/fieldsreader.go:155-236).

The salting bounds the largest reduce group to
``salt_group_partitions × target_partition_rows`` postings regardless of how
hot a term is, which is what makes the shuffle safe at 10^12 docs.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import decode_docs_freqs_norms, decode_positions, encode_postings
from .config import IndexConfig
from .manifest import Manifest, save_manifest

GLOBAL_DIR = "global"


def _global_dir(index_dir: str) -> str:
    return os.path.join(index_dir, GLOBAL_DIR)


def merge_index(index_dir: str, manifest: Manifest, cfg: IndexConfig) -> Manifest:
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    seg_glob = os.path.join(index_dir, "segments")
    seg_files = sorted(
        os.path.join(seg_glob, d, "terms.parquet")
        for d in os.listdir(seg_glob)
        if d.startswith("p=")
    )
    gdir = _global_dir(index_dir)
    if os.path.isdir(gdir):
        shutil.rmtree(gdir)  # merge is cheap relative to build; redo atomically
    tmp_gdir = gdir + ".tmp"
    if os.path.isdir(tmp_gdir):
        shutil.rmtree(tmp_gdir)
    os.makedirs(os.path.join(tmp_gdir, "term_stats"))
    os.makedirs(os.path.join(tmp_gdir, "postings"))

    # ---- pass 1: global term stats (small rows; the only full-vocab shuffle)
    stats_ds = (
        ray.data.read_parquet(seg_files, columns=["term", "doc_freq", "total_term_freq"])
        .groupby("term")
        .aggregate(
            Sum("doc_freq", alias_name="doc_freq"),
            Sum("total_term_freq", alias_name="total_term_freq"),
        )
    )
    stats_ds = stats_ds.materialize()
    stats_ds.write_parquet(os.path.join(tmp_gdir, "term_stats"))
    hot_terms = set(
        r["term"]
        for r in stats_ds.filter(
            lambda row: row["doc_freq"] > cfg.hot_term_doc_freq
        ).take_all()
    )

    # ---- pass 2: postings merge shuffle ----
    doc_bases = {int(p["pid"]): int(p["doc_base"]) for p in manifest.partitions}
    hot_ref = ray.put(hot_terms)
    bases_ref = ray.put(doc_bases)
    group_size = cfg.salt_group_partitions
    chunk_docs = cfg.chunk_docs
    block = cfg.block_size
    index_positions = cfg.index_positions

    def add_salt(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        pids = batch["pid"].to_numpy(zero_copy_only=False)
        terms = batch["term"].to_pylist()
        salt = np.array(
            [pid // group_size if t in hot else -1 for t, pid in zip(terms, pids)],
            dtype=np.int32,
        )
        return batch.append_column("salt", pa.array(salt, type=pa.int32()))

    def merge_group(group: pa.Table) -> pa.Table:
        bases = ray.get(bases_ref)
        order = np.argsort(group["pid"].to_numpy(zero_copy_only=False), kind="stable")
        rows = [
            {k: group[k][int(i)].as_py() for k in group.column_names} for i in order
        ]
        term = rows[0]["term"]
        salt = rows[0]["salt"]
        all_docs, all_freqs, all_norms, all_pos = [], [], [], []
        for r in rows:
            docs, freqs, norms8 = decode_docs_freqs_norms(r, block)
            docs = docs + bases[int(r["pid"])]
            all_docs.append(docs)
            all_freqs.append(freqs)
            all_norms.append(norms8)
            if index_positions:
                all_pos.append(decode_positions(r, freqs))
        docs = np.concatenate(all_docs)
        freqs = np.concatenate(all_freqs)
        norms8 = np.concatenate(all_norms)
        pos = np.concatenate(all_pos) if index_positions else None
        pos_starts = np.zeros(len(docs), dtype=np.int64)
        if len(docs):
            pos_starts[1:] = np.cumsum(freqs)[:-1]
        out_rows = []
        for ci, lo in enumerate(range(0, len(docs), chunk_docs)):
            hi = min(lo + chunk_docs, len(docs))
            p = None
            if pos is not None:
                p_lo = pos_starts[lo]
                p_hi = pos_starts[hi - 1] + freqs[hi - 1]
                p = pos[p_lo:p_hi]
            blob = encode_postings(
                docs[lo:hi], freqs[lo:hi], norms8[lo:hi], p, block=block
            )
            row = blob.to_row()
            row["term"] = term
            row["salt"] = int(salt)
            row["chunk_id"] = ci
            out_rows.append(row)
        cols = {k: [r[k] for r in out_rows] for k in out_rows[0]}
        return pa.table(
            {
                name: pa.array(cols[name], type=t)
                for name, t in _MERGED_SCHEMA
                if name in cols
            }
        )

    (
        ray.data.read_parquet(seg_files)
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby(["term", "salt"])
        .map_groups(merge_group, batch_format="pyarrow")
        .write_parquet(os.path.join(tmp_gdir, "postings"))
    )

    # ---- pass 3: metadata-only term range indexes ----
    for sub in ("term_stats", "postings"):
        _build_range_index(os.path.join(tmp_gdir, sub))

    with open(os.path.join(tmp_gdir, "stats.json"), "w") as f:
        json.dump(
            {
                "max_doc": manifest.max_doc,
                "doc_count": manifest.doc_count,
                "sum_total_term_freq": manifest.sum_total_term_freq,
                "sum_doc_freq": manifest.sum_doc_freq,
                "hot_terms": sorted(hot_terms),
            },
            f,
        )
    os.replace(tmp_gdir, gdir)
    manifest.merged = True
    save_manifest(index_dir, manifest)
    return manifest


_MERGED_SCHEMA = [
    ("term", pa.large_string()),
    ("salt", pa.int32()),
    ("chunk_id", pa.int32()),
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


def _build_range_index(dir_path: str) -> None:
    """(file, row_group, term_min, term_max, num_rows) per row group.

    Exact min/max are computed from the term column itself (a single small
    column read) rather than parquet footer statistics, which may be
    truncated for long terms."""
    import pyarrow.compute as pc

    rows = []
    for fname in sorted(os.listdir(dir_path)):
        if not fname.endswith(".parquet"):
            continue
        fpath = os.path.join(dir_path, fname)
        pf = pq.ParquetFile(fpath)
        for rg in range(pf.metadata.num_row_groups):
            terms = pf.read_row_group(rg, columns=["term"])["term"]
            if len(terms) == 0:
                continue
            mm = pc.min_max(terms).as_py()
            rows.append(
                {
                    "file": fname,
                    "row_group": rg,
                    "term_min": mm["min"],
                    "term_max": mm["max"],
                    "num_rows": len(terms),
                }
            )
    table = pa.table(
        {
            "file": pa.array([r["file"] for r in rows]),
            "row_group": pa.array([r["row_group"] for r in rows], type=pa.int32()),
            "term_min": pa.array([r["term_min"] for r in rows], type=pa.large_string()),
            "term_max": pa.array([r["term_max"] for r in rows], type=pa.large_string()),
            "num_rows": pa.array([r["num_rows"] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(table, dir_path + "_index.parquet")
