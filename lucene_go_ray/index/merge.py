"""Global posting merge: groupby-term shuffle of per-partition segments.

Replaces both the reference's (unimplemented) SegmentMerger
(/root/reference/core/index/segmentmerger.go:17-29) and its composite-reader
multi-segment search with an explicit Ray Data shuffle:

1. *hot* terms (Zipfian web-text skew) are estimated from a strided sample
   of per-segment term-stats columns — no full-vocab shuffle; global term
   statistics (the TermStates source, /root/reference/core/index/termstates.go:52-93)
   are recovered at query time by summing merged chunk-row metadata;

2. the full segment term rows (with packed posting blobs — already
   partial-aggregated, so at most P rows per term) are salted —
   ``salt = pid // salt_group_partitions`` for hot terms, -1 otherwise —
   keyed by ``bucket = hash(term, salt)`` and exchanged with an explicit
   TWO-PHASE FILE SHUFFLE (map: write parquet hive-partitioned by bucket;
   reduce: one task per bucket reads only its directory) — no in-memory
   all-to-all, both phases plain parallel map stages over files, which is
   the shape that survives 100 TB. Each reduce task concatenates every
   (term, salt) group's partitions in docBase order (global docIDs stay
   sorted because salt groups are contiguous pid ranges) and re-encodes
   ALL its groups in one vectorized pass (codec.encode_postings_many) into
   FOR-compressed chunk rows of at most ``chunk_docs`` postings with fresh
   block-max metadata, written term-sorted as ``bucket-NNNNN.parquet``;

3. the reduce tasks also return per-row-group (term_min, term_max, bucket)
   metadata, assembled into the term→(file, row-group) range index — the
   file-granularity analogue of the FST term dictionary
   (/root/reference/codecs/simpletext/fieldsreader.go:155-236); lookups
   probe it by the SAME bucket hash (term_buckets), touching O(1) row
   groups per term.

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

import pyarrow.compute as pc

from .codec import (
    INDEX_FORMAT_VERSION,
    KEY_SEP,
    _seg_local_idx,
    get_codec,
)
from .config import IndexConfig
from .manifest import Manifest, save_manifest

GLOBAL_DIR = "global"

# Row-group sizing for merged postings files: the row group is the unit of
# a term-lookup read, so its BYTE size is what bounds lookup read
# amplification — a fixed row count lets dense corpora blow a "few-MB"
# budget by 10x (measured: 4096 rows x ~6 KB/term = ~24 MB per probe on an
# 800k-doc corpus, which flattened query-path scaling). Cap both.
POSTINGS_ROW_GROUP_ROWS = 4096
POSTINGS_ROW_GROUP_BYTES = 2 << 20


def _postings_rg_rows(table: pa.Table) -> int:
    """Rows per row group targeting POSTINGS_ROW_GROUP_BYTES (positions
    included in the estimate; lookups that skip the pos columns read even
    less), clamped to [64, POSTINGS_ROW_GROUP_ROWS]."""
    if table.num_rows == 0:
        return POSTINGS_ROW_GROUP_ROWS
    avg = max(1, table.nbytes // table.num_rows)
    return int(
        np.clip(POSTINGS_ROW_GROUP_BYTES // avg, 64, POSTINGS_ROW_GROUP_ROWS)
    )


def _global_dir(index_dir: str) -> str:
    return os.path.join(index_dir, GLOBAL_DIR)


def merge_index(index_dir: str, manifest: Manifest, cfg: IndexConfig) -> Manifest:
    import ray
    import ray.data

    seg_glob = os.path.join(index_dir, "segments")
    seg_files = sorted(
        os.path.join(seg_glob, d, "terms.parquet")
        for d in os.listdir(seg_glob)
        if d.startswith("p=")
    )
    gdir = _global_dir(index_dir)
    # The live global/ dir (if any) is kept UNTIL the replacement tmp dir is
    # fully built — a crash mid-merge must leave the previous merged index
    # searchable. It is swapped out only at the final rename below.
    tmp_gdir = gdir + ".tmp"
    # Bucket-level merge resume: the tmp dir survives crashes. A marker
    # records the merge epoch (segment set + config + format); on re-entry
    # with the same epoch, the finished shuffle phase and already-written
    # bucket files are kept and only missing buckets re-run. Any epoch
    # mismatch wipes tmp and redoes the merge from scratch.
    epoch = json.dumps(
        {
            "segments": [os.path.basename(os.path.dirname(f)) for f in seg_files],
            "cfg": sorted(
                (k, str(v)) for k, v in cfg.__dict__.items()
            ),
            "format": INDEX_FORMAT_VERSION,
        },
        sort_keys=True,
    )
    marker = os.path.join(tmp_gdir, "merge_epoch.json")
    if os.path.isdir(tmp_gdir):
        prev = None
        if os.path.exists(marker):
            with open(marker) as f:
                prev = f.read()
        if prev != epoch:
            shutil.rmtree(tmp_gdir)
    os.makedirs(os.path.join(tmp_gdir, "postings"), exist_ok=True)
    os.makedirs(os.path.join(tmp_gdir, "revdict"), exist_ok=True)
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write(epoch)

    # ---- pass 1: hot-term detection by stratified segment sampling ----
    # Salting is a perf-only decision (it never changes merged results), so
    # an estimate suffices: a term with global df > H appears in a uniform
    # S-of-P segment sample with expected df ~ H*S/P and vanishing variance
    # for the Zipf head. No full-vocab shuffle — exact global term stats are
    # recoverable at query time by summing the merged chunk rows' metadata.
    # Hot terms must be stable across resume attempts (they key the bucket
    # hash), so the first attempt's estimate is persisted with the epoch.
    hot_path = os.path.join(tmp_gdir, "hot_terms.json")
    if os.path.exists(hot_path):
        with open(hot_path) as f:
            hot_terms = set(json.load(f))
    else:
        hot_terms = _estimate_hot_terms(seg_files, cfg.hot_term_doc_freq)
        with open(hot_path, "w") as f:
            json.dump(sorted(hot_terms), f)

    # ---- pass 2: postings merge shuffle (bucketed, fully vectorized) ----
    # rows are keyed by bucket = hash(term) ^ mix(salt); one reduce task per
    # bucket decodes + re-encodes ALL of its (term, salt) groups in a single
    # numpy pass (codec.encode_postings_many), so reduce cost is O(postings),
    # not O(groups). Salting still bounds the largest (term, salt) group to
    # `salt_group_partitions` contiguous partitions of postings.
    pid_arr = np.array([int(p["pid"]) for p in manifest.partitions], dtype=np.int64)
    base_arr = np.zeros(int(pid_arr.max()) + 1 if len(pid_arr) else 1, dtype=np.int64)
    base_arr[pid_arr] = np.array(
        [int(p["doc_base"]) for p in manifest.partitions], dtype=np.int64
    )
    hot_ref = ray.put(sorted(hot_terms))
    bases_ref = ray.put(base_arr)
    group_size = cfg.salt_group_partitions
    chunk_docs = cfg.chunk_docs
    block = cfg.block_size
    codec = get_codec(cfg.codec_name)  # captured by the reduce closure
    index_positions = cfg.index_positions
    num_buckets = cfg.merge_buckets

    def add_salt(batch: pa.Table) -> pa.Table:
        return _salt_batch(batch, ray.get(hot_ref), group_size, num_buckets)

    def merge_bucket(group: pa.Table, bucket_id: int) -> pa.Table:
        if group.num_rows == 0:
            return _empty_merged_table()
        return _encode_bucket(
            group,
            bucket_id,
            ray.get(bases_ref),
            chunk_docs,
            block,
            codec,
            index_positions,
        )

    # Two-phase file shuffle (explicit, storage-backed — the pattern that
    # holds at 100 TB: no in-memory all-to-all, and both phases are plain
    # embarrassingly-parallel map stages over files):
    #   A. map over segment term tables -> write parquet hive-partitioned by
    #      bucket (each map task appends one file per bucket it touches);
    #   B. one reduce task per bucket reads ONLY its bucket directory,
    #      merges + re-encodes all its (term, salt) groups in one numpy
    #      pass, and writes a deterministic `bucket-NNNNN.parquet`,
    #      term-sorted so row-group term ranges are tight for lookup.
    postings_dir = os.path.join(tmp_gdir, "postings")
    revdict_dir = os.path.join(tmp_gdir, "revdict")
    shuffle_dir = os.path.join(tmp_gdir, "shuffle")
    shuffle_done = os.path.join(tmp_gdir, "shuffle_COMPLETE")
    phase_a = None
    if not os.path.exists(shuffle_done):
        # a partial shuffle dir cannot be appended to (duplicate rows) —
        # redo phase A whole, then mark complete
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        phase_a = ray.data.read_parquet(
            seg_files, partitioning=None  # don't infer hive col from p=NNNNN dirs
        ).map_batches(add_salt, batch_format="pyarrow")
        phase_a.write_parquet(shuffle_dir, partition_cols=["bucket"])
        with open(shuffle_done, "w") as f:
            f.write("ok")

    # test-only failpoint (read driver-side, captured into the closure so it
    # reaches workers): buckets >= this id raise, simulating a mid-merge crash
    fail_bucket = int(os.environ.get("LGR_MERGE_FAIL_BUCKET", "-1"))

    def reduce_bucket(batch: pa.Table) -> pa.Table:
        # Writes this bucket's merged postings file AND returns its range-
        # index rows (per row group: term min/max), so the lookup index
        # needs no separate driver-side metadata pass over the files.
        import time as _time

        trace = os.environ.get("LGR_REDUCE_TRACE")
        out: dict[str, list] = {k: [] for k in _RANGE_INDEX_COLS}
        for b in batch["bucket"].to_pylist():
            b = int(b)
            if 0 <= fail_bucket <= b:
                raise RuntimeError(f"injected merge failure at bucket {b}")
            t0 = _time.perf_counter()
            fname = f"bucket-{b:05d}.parquet"
            fpath = os.path.join(postings_dir, fname)
            if os.path.exists(fpath):
                # bucket finished in a previous (crashed) merge attempt of
                # the same epoch: keep it, rebuild its range-index rows
                # from the key columns (cheap metadata read)
                pf = pq.ParquetFile(fpath)
                kt = pf.read(columns=["field", "term"])
                keys = _fkey_column(kt).combine_chunks()
                off = 0
                for rg in range(pf.metadata.num_row_groups):
                    n = pf.metadata.row_group(rg).num_rows
                    sl = keys.slice(off, n)
                    off += n
                    if len(sl) == 0:
                        continue
                    mm = pc.min_max(sl).as_py()
                    out["kind"].append("post")
                    out["file"].append(fname)
                    out["row_group"].append(rg)
                    out["key_min"].append(mm["min"])
                    out["key_max"].append(mm["max"])
                    out["bucket_min"].append(b)
                    out["bucket_max"].append(b)
                    out["num_rows"].append(len(sl))
                rpath = os.path.join(revdict_dir, fname)
                if os.path.exists(rpath):
                    rt = pq.read_table(rpath)
                else:  # crashed between postings and revdict writes
                    rt = _revdict_table(kt["field"], kt["term"])
                    pq.write_table(
                        rt, rpath + ".inprogress", row_group_size=REV_RG_ROWS
                    )
                    os.replace(rpath + ".inprogress", rpath)
                _append_rg_stats(
                    out, "rev", fname, b, _fkey_column(rt), REV_RG_ROWS
                )
                continue
            bdir = os.path.join(shuffle_dir, f"bucket={b}")
            if os.path.isdir(bdir):
                # one shuffle file per (map task, bucket): read them with an
                # I/O thread pool — Ray pins each worker's Arrow CPU pool to
                # 1, so a plain directory read would open files serially.
                from concurrent.futures import ThreadPoolExecutor

                files = sorted(
                    os.path.join(bdir, f)
                    for f in os.listdir(bdir)
                    if f.endswith(".parquet")
                )
                with ThreadPoolExecutor(max_workers=8) as ex:
                    tabs = list(ex.map(pq.read_table, files))
                t = pa.concat_tables(tabs)
                t1 = _time.perf_counter()
                merged = merge_bucket(t, b)
            else:
                t1 = _time.perf_counter()
                merged = _empty_merged_table()
            t2 = _time.perf_counter()
            # tmp + rename: a crash mid-write never leaves a partial bucket
            # file to be mistaken for a finished one on resume. Write order
            # is blob THEN meta — the meta parquet's existence implies its
            # blob side file is complete (the resume branch relies on it).
            rg_rows = _postings_rg_rows(merged)
            meta, blob_chunks = split_blob_columns(merged)
            bpath = fpath[: -len(".parquet")] + ".blob"
            with open(bpath + ".inprogress", "wb") as bf:
                for c in blob_chunks:
                    bf.write(c)
            os.replace(bpath + ".inprogress", bpath)
            pq.write_table(
                meta,
                fpath + ".inprogress",
                row_group_size=rg_rows,
            )
            os.replace(fpath + ".inprogress", fpath)
            if trace:
                print(
                    f"[reduce b={b}] read={t1 - t0:.2f}s merge={t2 - t1:.2f}s "
                    f"write={_time.perf_counter() - t2:.2f}s rows={merged.num_rows}",
                    flush=True,
                )
            _append_rg_stats(out, "post", fname, b, _fkey_column(merged), rg_rows)
            rt = _revdict_table(merged["field"], merged["term"])
            rpath = os.path.join(revdict_dir, fname)
            pq.write_table(rt, rpath + ".inprogress", row_group_size=REV_RG_ROWS)
            os.replace(rpath + ".inprogress", rpath)
            _append_rg_stats(out, "rev", fname, b, _fkey_column(rt), REV_RG_ROWS)
        return pa.table(
            {name: pa.array(out[name], type=t) for name, t in _RANGE_INDEX_SCHEMA}
        )

    phase_b = ray.data.from_items(
        [{"bucket": b} for b in range(num_buckets)]
    ).map_batches(reduce_bucket, batch_size=1, batch_format="pyarrow", num_cpus=1)
    index_rows = phase_b.take_all()  # one row per postings row group (small)
    if os.environ.get("LGR_MERGE_STATS"):
        if phase_a is not None:
            print(phase_a.stats())
        print(phase_b.stats())
    shutil.rmtree(shuffle_dir)
    os.remove(shuffle_done)
    os.remove(os.path.join(tmp_gdir, "hot_terms.json"))
    os.remove(marker)

    # ---- pass 3: forward + reversed term range indexes from the reduce
    # tasks' metadata (no driver-side scan of the bucket files) ----
    for fname_out, kind in (
        ("postings_index.parquet", "post"),
        ("revdict_index.parquet", "rev"),
    ):
        rows = [r for r in index_rows if r["kind"] == kind]
        pq.write_table(
            pa.table(
                {
                    name: pa.array([r[name] for r in rows], type=t)
                    for name, t in _RANGE_INDEX_SCHEMA
                    if name != "kind"
                }
            ),
            os.path.join(tmp_gdir, fname_out),
        )

    with open(os.path.join(tmp_gdir, "stats.json"), "w") as f:
        json.dump(
            {
                "max_doc": manifest.max_doc,
                "doc_count": manifest.doc_count,
                "sum_total_term_freq": manifest.sum_total_term_freq,
                "sum_doc_freq": manifest.sum_doc_freq,
                # per-field CollectionStatistics for non-default fields
                "field_stats": manifest.field_stats,
                "hot_terms": sorted(hot_terms),  # combined (field,term) keys
                "format_version": INDEX_FORMAT_VERSION,
                # incremental-merge lineage: which partitions this global
                # index contains, and the doc count at the last FULL merge
                # (the tiered policy's rebalance baseline)
                "merged_pids": sorted(
                    int(p["pid"]) for p in manifest.partitions
                ),
                "full_merge_doc_count": manifest.doc_count,
            },
            f,
        )
    # swap: retire the old global dir only now that tmp is complete, so the
    # window with no searchable index is a single rename, not the whole merge
    old_gdir = gdir + ".old"
    if os.path.isdir(old_gdir):
        shutil.rmtree(old_gdir)
    if os.path.isdir(gdir):
        os.replace(gdir, old_gdir)
    os.replace(tmp_gdir, gdir)
    shutil.rmtree(old_gdir, ignore_errors=True)
    manifest.merged = True
    save_manifest(index_dir, manifest)
    return manifest


_MERGED_SCHEMA = [
    ("field", pa.string()),
    ("term", pa.large_string()),
    ("salt", pa.int32()),
    ("bucket", pa.int32()),
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


_GOLDEN = 0x9E3779B97F4A7C15


def term_buckets(
    terms: list[str], salts: np.ndarray, num_buckets: int
) -> np.ndarray:
    """Deterministic merge-bucket id per (term, salt) row.

    Shared between the merge shuffle keying and the query-side direct
    bucket probe (search/searcher.py:_RangeIndex) — a term's postings live
    ONLY in the buckets this function returns for its possible salts, so a
    lookup touches O(1) row groups instead of range-scanning the vocab."""
    import zlib

    crc = np.fromiter(
        (zlib.crc32(t.encode()) for t in terms),
        dtype=np.uint64,
        count=len(terms),
    )
    salts = np.asarray(salts, dtype=np.int64)
    with np.errstate(over="ignore"):
        prod = salts.astype(np.uint64) * np.uint64(_GOLDEN)
    return ((crc ^ prod) % np.uint64(num_buckets)).astype(np.int32)


_HOT_SAMPLE_SEGMENTS = 64


REV_RG_ROWS = 65_536  # reversed-dictionary rows per row group

_BLOB_KINDS = ("docs", "freqs", "norms", "pos")


def split_blob_columns(t: pa.Table) -> tuple[pa.Table, list[bytes]]:
    """Meta/blob split of a merged bucket table: drop the four packed
    stream columns and replace them with int64 byte offsets into a raw
    side file (row region = docs || freqs || norms || pos, rows
    sequential, positions last so non-phrase readers touch a contiguous
    prefix). Returns (meta table, blob byte chunks to write in order).

    This is what makes block-max skipping an I/O-level win: the parquet
    row group a lookup reads now holds only metadata (widths, block
    maxima, offsets), and the searcher preads exactly the byte ranges of
    the blocks it visits (codec.BlobFile.gather)."""
    present = [k for k in _BLOB_KINDS if f"{k}_blob" in t.column_names]
    lens = {
        k: pc.binary_length(t[f"{k}_blob"])
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
        for k in present
    }
    n = t.num_rows
    zeros = np.zeros(n, dtype=np.int64)
    row_total = sum(lens.values()) if present else zeros
    row_start = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(row_total[:-1], out=row_start[1:])
    offs: dict[str, np.ndarray] = {}
    run = row_start
    for k in _BLOB_KINDS:
        offs[f"{k}_off"] = run
        run = run + lens.get(k, zeros)
    offs["blob_end"] = run
    cols = {k: t[f"{k}_blob"].to_pylist() for k in present}
    chunks: list[bytes] = []
    for i in range(n):
        for k in present:
            chunks.append(cols[k][i])
    meta = t.drop_columns([f"{k}_blob" for k in present])
    for name, arr in offs.items():
        meta = meta.append_column(name, pa.array(arr, type=pa.int64()))
    return meta, chunks


def _revdict_table(fields, terms) -> pa.Table:
    """Bucket-local reversed-term dictionary: one row per distinct
    (field, term) of the bucket, with ``term`` holding the
    CODEPOINT-REVERSED term, sorted by the combined (field, rev) key.

    Suffix patterns (leading-wildcard ``*foo``) become prefix seeks here —
    reversing each hit restores the original term — the classic
    ReversedWildcardFilter technique. Building it per bucket costs no
    extra shuffle: terms are hash-scattered across buckets either way and
    the range index prunes at row-group granularity exactly as for the
    forward dictionary, so a suffix seek touches O(row groups matching
    the reversed prefix), never the whole vocabulary."""
    d = (
        pa.table({"field": fields, "term": terms})
        .group_by(["field", "term"])
        .aggregate([])
    )
    t = pa.table(
        {
            "field": d["field"].cast(pa.string()),
            "term": pc.utf8_reverse(d["term"].cast(pa.large_string())),
        }
    )
    return t.take(pc.sort_indices(_fkey_column(t)))


def _append_rg_stats(out: dict, kind: str, fname: str, b: int, keys, rg_rows: int):
    """Range-index rows (one per row group) for a key-sorted file."""
    for rg_start in range(0, len(keys), rg_rows):
        sl = keys.slice(rg_start, rg_rows)
        mm = pc.min_max(sl).as_py()
        out["kind"].append(kind)
        out["file"].append(fname)
        out["row_group"].append(rg_start // rg_rows)
        out["key_min"].append(mm["min"])
        out["key_max"].append(mm["max"])
        out["bucket_min"].append(b)
        out["bucket_max"].append(b)
        out["num_rows"].append(len(sl))


def _fkey_column(t: pa.Table) -> pa.ChunkedArray | pa.Array:
    """Combined (field, term) posting-key column (codec.KEY_SEP joined)."""
    return pc.binary_join_element_wise(
        t["field"].cast(pa.large_string()),
        t["term"].cast(pa.large_string()),
        pa.scalar(KEY_SEP, type=pa.large_string()),
    )


def _estimate_hot_terms(seg_files: list[str], hot_doc_freq: int) -> set[str]:
    """Estimated set of posting keys with global doc_freq > ``hot_doc_freq``.

    Reads (field, term, doc_freq) from an evenly-strided sample of at most
    ``_HOT_SAMPLE_SEGMENTS`` segment term tables and scales by P/S. A missed
    hot key only costs merge balance, never correctness; a false positive
    only adds a few extra (key, salt) groups. At cluster scale this read
    is one small column off S files — independent of P. Keyword-field keys
    (e.g. lang=en over a web corpus) salt exactly like hot text terms."""
    P = len(seg_files)
    if P == 0:
        return set()
    stride = max(1, P // _HOT_SAMPLE_SEGMENTS)
    sample = seg_files[::stride][:_HOT_SAMPLE_SEGMENTS]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(sample))) as ex:
        parts = list(
            ex.map(
                lambda f: pq.read_table(
                    f, columns=["field", "term", "doc_freq"]
                ),
                sample,
            )
        )
    tbl = pa.concat_tables(parts)
    agg = (
        pa.table({"fkey": _fkey_column(tbl), "doc_freq": tbl["doc_freq"]})
        .group_by("fkey")
        .aggregate([("doc_freq", "sum")])
    )
    scale = P / len(sample)
    # 2x margin on the scaled estimate to absorb sampling noise
    thresh = max(1.0, hot_doc_freq / (2.0 * scale))
    mask = pc.greater(agg["doc_freq_sum"], int(thresh))
    return set(agg.filter(mask)["fkey"].to_pylist())


def _empty_merged_table() -> pa.Table:
    return pa.table({name: pa.array([], type=t) for name, t in _MERGED_SCHEMA})


def _salt_batch(
    batch: pa.Table, hot: list, group_size: int, num_buckets: int
) -> pa.Table:
    """Salt + bucket columns for segment term rows — shared by the full
    merge shuffle and the incremental delta shuffle (which MUST reuse the
    base epoch's hot set so delta rows land in the buckets queries probe)."""
    pids = batch["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
    fkeys = _fkey_column(batch)
    if hot:
        is_hot = pc.is_in(
            fkeys, value_set=pa.array(hot, type=pa.large_string())
        ).to_numpy(zero_copy_only=False)
    else:
        is_hot = np.zeros(len(batch), dtype=bool)
    salt = np.where(is_hot, pids // group_size, -1).astype(np.int32)
    bucket = term_buckets(fkeys.to_pylist(), salt, num_buckets)
    return batch.append_column(
        "salt", pa.array(salt, type=pa.int32())
    ).append_column("bucket", pa.array(bucket, type=pa.int32()))


def _encode_bucket(
    group: pa.Table,
    bucket_id: int,
    bases: np.ndarray,
    chunk_docs: int,
    block: int,
    codec,
    index_positions: bool,
) -> pa.Table:
    """Merge one bucket's segment term rows into term-sorted FOR-compressed
    chunk rows (the reduce kernel of both the full merge and the
    incremental delta merge)."""
    R = group.num_rows
    pids = group["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
    salts = group["salt"].to_numpy(zero_copy_only=False).astype(np.int32)
    # group key = combined (field, term) posting key — one inverted list
    # per (field, term, salt); output stays key-sorted so row-group key
    # ranges are tight for the lookup index
    fkeys = np.asarray(_fkey_column(group).to_pylist(), dtype=object)
    fields = np.asarray(group["field"].to_pylist(), dtype=object)
    terms = np.asarray(group["term"].to_pylist(), dtype=object)
    _, term_code = np.unique(fkeys, return_inverse=True)
    order = np.lexsort((pids, salts, term_code))
    group = group.take(pa.array(order))
    pids, salts = pids[order], salts[order]
    fields, terms = fields[order], terms[order]
    term_code = term_code[order]
    doc_freqs = group["doc_freq"].to_numpy(zero_copy_only=False).astype(np.int64)
    docs, freqs, norms8, offs = codec.decode_postings_many(
        doc_freqs,
        group["docs_blob"].to_pylist(),
        group["doc_widths"].to_pylist(),
        group["freqs_blob"].to_pylist(),
        group["freq_widths"].to_pylist(),
        group["norms_blob"].to_pylist(),
        block,
    )
    docs += np.repeat(bases[pids], doc_freqs)
    pos = None
    if index_positions:
        pos = codec.decode_positions_many(
            group["pos_blob"].to_pylist(),
            group["pos_width"].to_numpy(zero_copy_only=False),
            freqs,
            offs,
        )
    # merged (term, salt) groups over the sorted rows; docIDs ascend
    # across a group's rows because salt groups are contiguous pid ranges
    new_grp = np.ones(R, dtype=bool)
    new_grp[1:] = (term_code[1:] != term_code[:-1]) | (salts[1:] != salts[:-1])
    grp_row_starts = np.flatnonzero(new_grp)
    G = len(grp_row_starts)
    gcounts = np.add.reduceat(doc_freqs, grp_row_starts)
    nchunks = (gcounts + chunk_docs - 1) // chunk_docs
    ct = np.repeat(np.arange(G), nchunks)
    ci = _seg_local_idx(nchunks)
    ccount = np.minimum(chunk_docs, gcounts[ct] - ci * chunk_docs)
    chunk_offsets = np.concatenate([[0], np.cumsum(ccount)]).astype(np.int64)
    enc = codec.encode_postings_many(
        docs, freqs, norms8, chunk_offsets, pos, block=block
    )
    chunk_terms = terms[grp_row_starts][ct]
    chunk_fields = fields[grp_row_starts][ct]
    chunk_salts = salts[grp_row_starts][ct]
    cols = {
        "field": pa.array(chunk_fields.tolist(), type=pa.string()),
        "term": pa.array(chunk_terms.tolist(), type=pa.large_string()),
        "salt": pa.array(chunk_salts, type=pa.int32()),
        "bucket": pa.array(
            np.full(len(ct), bucket_id, dtype=np.int32), type=pa.int32()
        ),
        "chunk_id": pa.array(ci.astype(np.int32), type=pa.int32()),
    }
    for name, t in _MERGED_SCHEMA:
        if name not in cols:
            cols[name] = pa.array(enc[name], type=t)
    return pa.table({name: cols[name] for name, _ in _MERGED_SCHEMA})


_RANGE_INDEX_SCHEMA = [
    ("kind", pa.string()),  # "post" (merged postings) | "rev" (revdict)
    ("file", pa.string()),
    ("row_group", pa.int32()),
    ("key_min", pa.large_string()),  # combined (field, term) posting keys
    ("key_max", pa.large_string()),
    ("bucket_min", pa.int32()),
    ("bucket_max", pa.int32()),
    ("num_rows", pa.int64()),
]
_RANGE_INDEX_COLS = [name for name, _ in _RANGE_INDEX_SCHEMA]


# --------------------------------------------------------------------------
# incremental (tiered) merge — fold new segments into the existing buckets
# --------------------------------------------------------------------------


def plan_merge(index_dir: str, manifest: Manifest, cfg: IndexConfig) -> str:
    """Size-tiered merge decision: ``"incremental"`` folds only the
    not-yet-merged partitions into the existing bucket files;
    ``"full"`` re-shuffles everything.

    This is the MergePolicy surface of the reference
    (/root/reference/core/index/mergepolicy.go:134-334 — FindMerges over
    size-sorted segment tiers; the reference's own SegmentMerger panics,
    so the CONTRACT is the user-facing thing): small deltas are folded
    cheaply; once cumulative growth since the last full merge exceeds
    ``cfg.tiered_growth_ratio`` x the full-merge doc count, a full merge
    re-tiers the index (rebalancing buckets and re-estimating hot terms,
    which incremental folds intentionally never touch)."""
    gdir = _global_dir(index_dir)
    stats_path = os.path.join(gdir, "stats.json")
    if not os.path.exists(stats_path):
        return "full"
    with open(stats_path) as f:
        stats = json.load(f)
    if stats.get("format_version") != INDEX_FORMAT_VERSION:
        return "full"
    if not stats.get("merged_pids"):
        return "full"  # pre-lineage index: no delta bookkeeping
    base = int(stats.get("full_merge_doc_count") or 0)
    if base <= 0:
        return "full"
    growth = manifest.doc_count - base
    if growth > getattr(cfg, "tiered_growth_ratio", 1.0) * base:
        return "full"
    return "incremental"


def incremental_merge_index(
    index_dir: str, manifest: Manifest, cfg: IndexConfig
) -> Manifest:
    """Fold ONLY not-yet-merged partitions into the existing global index.

    Because bucket = hash(term, salt) is deterministic and the base
    epoch's hot-term set is reused, a delta row lands in exactly the
    bucket queries already probe; and because docIDs are append-monotone
    (add_documents numbers new partitions after every existing pid), a
    term's new postings sort strictly AFTER its existing chunks. So the
    fold never decodes or re-encodes base postings: per touched bucket it
    encodes the delta rows into fresh chunk rows (chunk_ids continuing
    each (term, salt) group's sequence), appends the new blob bytes after
    the base blob (shifting only the NEW rows' offsets), and merge-sorts
    the meta rows by (key, salt, chunk_id). Buckets with no delta rows
    are HARDLINKED into the replacement dir untouched — cost is
    O(delta + touched-bucket metadata), not O(corpus).

    Same crash discipline as merge_index: staged tmp dir with an epoch
    marker, per-bucket resume, and a single-rename swap at the end.
    Intentional deferrals to the next FULL merge (plan_merge's growth
    trigger): hot-term re-estimation, chunk rebalancing (a base group's
    last partial chunk stays partial), and expunge of tombstones."""
    import ray
    import ray.data

    gdir = _global_dir(index_dir)
    with open(os.path.join(gdir, "stats.json")) as f:
        stats = json.load(f)
    merged_pids = set(int(x) for x in stats["merged_pids"])
    all_pids = sorted(int(p["pid"]) for p in manifest.partitions)
    delta_pids = [p for p in all_pids if p not in merged_pids]
    if not delta_pids:
        manifest.merged = True
        save_manifest(index_dir, manifest)
        return manifest
    seg_files = [
        os.path.join(index_dir, "segments", f"p={pid:05d}", "terms.parquet")
        for pid in delta_pids
    ]
    hot_terms = list(stats.get("hot_terms", []))

    tmp_gdir = gdir + ".inc"
    epoch = json.dumps(
        {
            "base_pids": sorted(merged_pids),
            "delta_pids": delta_pids,
            "cfg": sorted((k, str(v)) for k, v in cfg.__dict__.items()),
            "format": INDEX_FORMAT_VERSION,
        },
        sort_keys=True,
    )
    marker = os.path.join(tmp_gdir, "inc_epoch.json")
    if os.path.isdir(tmp_gdir):
        prev = None
        if os.path.exists(marker):
            with open(marker) as f:
                prev = f.read()
        if prev != epoch:
            shutil.rmtree(tmp_gdir)
    postings_dir = os.path.join(tmp_gdir, "postings")
    revdict_dir = os.path.join(tmp_gdir, "revdict")
    os.makedirs(postings_dir, exist_ok=True)
    os.makedirs(revdict_dir, exist_ok=True)
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write(epoch)

    # ---- phase A: shuffle ONLY the delta segments' rows by bucket ----
    shuffle_dir = os.path.join(tmp_gdir, "shuffle")
    shuffle_done = os.path.join(tmp_gdir, "shuffle_COMPLETE")
    group_size = cfg.salt_group_partitions
    num_buckets = cfg.merge_buckets
    hot_ref = ray.put(hot_terms)
    if not os.path.exists(shuffle_done):
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        ray.data.read_parquet(seg_files, partitioning=None).map_batches(
            lambda b: _salt_batch(
                b, ray.get(hot_ref), group_size, num_buckets
            ),
            batch_format="pyarrow",
        ).write_parquet(shuffle_dir, partition_cols=["bucket"])
        with open(shuffle_done, "w") as f:
            f.write("ok")
    touched = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(shuffle_dir)
        if d.startswith("bucket=")
    )

    # ---- phase B: fold each touched bucket (one Ray task per bucket) ----
    pid_arr = np.array(all_pids, dtype=np.int64)
    base_arr = np.zeros(int(pid_arr.max()) + 1, dtype=np.int64)
    for p in manifest.partitions:
        base_arr[int(p["pid"])] = int(p["doc_base"])
    bases_ref = ray.put(base_arr)
    chunk_docs = cfg.chunk_docs
    block = cfg.block_size
    codec = get_codec(cfg.codec_name)
    index_positions = cfg.index_positions
    base_postings = os.path.join(gdir, "postings")
    fail_bucket = int(os.environ.get("LGR_INC_FAIL_BUCKET", "-1"))

    def fold_bucket(batch: pa.Table) -> pa.Table:
        from concurrent.futures import ThreadPoolExecutor

        out: dict[str, list] = {k: [] for k in _RANGE_INDEX_COLS}
        for b in batch["bucket"].to_pylist():
            b = int(b)
            if 0 <= fail_bucket <= b:
                raise RuntimeError(f"injected incremental failure at bucket {b}")
            fname = f"bucket-{b:05d}.parquet"
            fpath = os.path.join(postings_dir, fname)
            if os.path.exists(fpath):
                # bucket folded by a previous crashed attempt of the same
                # epoch: keep it, rebuild its index rows from the file
                _existing_bucket_rows(out, fpath, revdict_dir, fname, b)
                continue
            bdir = os.path.join(shuffle_dir, f"bucket={b}")
            files = sorted(
                os.path.join(bdir, f)
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            )
            with ThreadPoolExecutor(max_workers=8) as ex:
                tabs = list(ex.map(pq.read_table, files))
            delta = pa.concat_tables(tabs)
            new_tab = _encode_bucket(
                delta, b, ray.get(bases_ref), chunk_docs, block, codec,
                index_positions,
            )
            new_meta, new_chunks = split_blob_columns(new_tab)
            new_blob_len = int(sum(len(c) for c in new_chunks))

            base_fpath = os.path.join(base_postings, fname)
            base_blob_len = 0
            if os.path.exists(base_fpath):
                base_meta = pq.read_table(base_fpath)
                base_blob_len = os.path.getsize(
                    base_fpath[: -len(".parquet")] + ".blob"
                )
                # continue each (key, salt) group's chunk_id sequence —
                # vectorized: one lexsort over the base rows, run ends
                # carry each group's max chunk_id (rows sort chunk-asc
                # within a group), then one run-boundary searchsorted maps
                # every NEW row to its group's next id. O(rows log rows)
                # numpy, no per-row interpreter work on the base bucket.
                bk = np.asarray(
                    _fkey_column(base_meta).to_pylist(), dtype=object
                )
                bs = base_meta["salt"].to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                bc = base_meta["chunk_id"].to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                order_b = np.lexsort((bc, bs, bk))
                bk, bs, bc = bk[order_b], bs[order_b], bc[order_b]
                if len(bk):
                    last = np.flatnonzero(
                        np.concatenate(
                            [(bk[1:] != bk[:-1]) | (bs[1:] != bs[:-1]),
                             [True]]
                        )
                    )
                    gk, gs, gmax = bk[last], bs[last], bc[last]
                else:  # base bucket file exists but is empty
                    gk = np.empty(0, dtype=object)
                    gs = gmax = np.empty(0, dtype=np.int64)
                nk = np.asarray(
                    _fkey_column(new_meta).to_pylist(), dtype=object
                )
                ns = new_meta["salt"].to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                nc = new_meta["chunk_id"].to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                # locate each new row's (key, salt) among the base groups:
                # search on key runs, then scan the (tiny) salt run
                gi = np.searchsorted(gk, nk, side="left")
                off = np.zeros(len(nk), dtype=np.int64)
                for j in range(len(nk)):
                    g = gi[j]
                    while g < len(gk) and gk[g] == nk[j] and gs[g] < ns[j]:
                        g += 1
                    if g < len(gk) and gk[g] == nk[j] and gs[g] == ns[j]:
                        off[j] = gmax[g] + 1
                nc = nc + off
                new_meta = new_meta.set_column(
                    new_meta.schema.get_field_index("chunk_id"),
                    "chunk_id",
                    pa.array(nc.astype(np.int32), type=pa.int32()),
                )
            else:
                base_meta = None

            # shift ONLY the new rows' blob offsets past the base blob
            if base_blob_len:
                for col in ("docs_off", "freqs_off", "norms_off", "pos_off",
                            "blob_end"):
                    idx = new_meta.schema.get_field_index(col)
                    shifted = pc.add(
                        new_meta[col], pa.scalar(base_blob_len, pa.int64())
                    )
                    new_meta = new_meta.set_column(idx, col, shifted)

            if base_meta is not None:
                combined = pa.concat_tables(
                    [base_meta, new_meta], promote_options="none"
                )
                ck = np.asarray(
                    _fkey_column(combined).to_pylist(), dtype=object
                )
                cs = combined["salt"].to_numpy(zero_copy_only=False)
                cc = combined["chunk_id"].to_numpy(zero_copy_only=False)
                order = np.lexsort((cc, cs, ck))
                combined = combined.take(pa.array(order))
            else:
                combined = new_meta

            # blob: regions re-laid in MERGED ROW ORDER (the bucket
            # invariant CheckIndex enforces: row i's region ends where
            # row i+1's starts). The fold copies every base blob byte
            # either way, so gathering regions into the sorted order
            # costs the same I/O as a stream copy; memory envelope is
            # one bucket's blob — the same bound as the full-merge
            # reduce, which holds the bucket's decoded postings.
            # Write order blob THEN meta — meta existence implies a
            # complete blob.
            if base_blob_len:
                with open(
                    base_fpath[: -len(".parquet")] + ".blob", "rb"
                ) as src:
                    allbuf = memoryview(src.read() + b"".join(new_chunks))
            else:
                allbuf = memoryview(b"".join(new_chunks))
            off_old = combined["docs_off"].to_numpy(zero_copy_only=False)
            end_old = combined["blob_end"].to_numpy(zero_copy_only=False)
            lens = end_old - off_old
            new_start = np.zeros(len(lens), dtype=np.int64)
            if len(lens) > 1:
                np.cumsum(lens[:-1], out=new_start[1:])
            bpath = fpath[: -len(".parquet")] + ".blob"
            with open(bpath + ".inprogress", "wb") as bf:
                for o, ln in zip(off_old.tolist(), lens.tolist()):
                    bf.write(allbuf[o : o + ln])
            os.replace(bpath + ".inprogress", bpath)
            delta = new_start - off_old
            for col in ("docs_off", "freqs_off", "norms_off", "pos_off"):
                idx = combined.schema.get_field_index(col)
                vals = combined[col].to_numpy(zero_copy_only=False) + delta
                combined = combined.set_column(
                    idx, col, pa.array(vals, pa.int64())
                )
            combined = combined.set_column(
                combined.schema.get_field_index("blob_end"),
                "blob_end",
                pa.array(new_start + lens, pa.int64()),
            )
            total_bytes = combined.nbytes + base_blob_len + new_blob_len
            avg = max(1, total_bytes // max(1, combined.num_rows))
            rg_rows = int(
                np.clip(
                    POSTINGS_ROW_GROUP_BYTES // avg, 64,
                    POSTINGS_ROW_GROUP_ROWS,
                )
            )
            pq.write_table(combined, fpath + ".inprogress",
                           row_group_size=rg_rows)
            os.replace(fpath + ".inprogress", fpath)
            _append_rg_stats(
                out, "post", fname, b,
                _fkey_column(combined).combine_chunks(), rg_rows,
            )
            rt = _revdict_table(combined["field"], combined["term"])
            rpath = os.path.join(revdict_dir, fname)
            pq.write_table(rt, rpath + ".inprogress",
                           row_group_size=REV_RG_ROWS)
            os.replace(rpath + ".inprogress", rpath)
            _append_rg_stats(
                out, "rev", fname, b, _fkey_column(rt), REV_RG_ROWS
            )
        return pa.table(
            {name: pa.array(out[name], type=t)
             for name, t in _RANGE_INDEX_SCHEMA}
        )

    index_rows = (
        ray.data.from_items([{"bucket": b} for b in touched])
        .map_batches(fold_bucket, batch_size=1, batch_format="pyarrow",
                     num_cpus=1)
        .take_all()
    )
    # Remove the COMPLETE marker BEFORE the shuffle dir: a crash inside
    # rmtree would otherwise leave shuffle_COMPLETE pointing at a missing
    # or PARTIAL dir, and a resume would compute a smaller `touched` set
    # (keeping stale index rows for already-rewritten buckets). With the
    # marker gone first, re-entry redoes phase A whole (worst case: a
    # redundant delta shuffle; folded buckets still resume via the
    # output-exists branch).
    os.remove(shuffle_done)
    shutil.rmtree(shuffle_dir)
    os.remove(marker)

    # ---- phase C: assemble the replacement dir and swap ----
    touched_set = set(touched)
    for sub in ("postings", "revdict"):
        src_dir = os.path.join(gdir, sub)
        dst_dir = os.path.join(tmp_gdir, sub)
        for f in os.listdir(src_dir):
            if not (f.startswith("bucket-") and
                    (f.endswith(".parquet") or f.endswith(".blob"))):
                continue
            bid = int(f.split("-")[1].split(".")[0])
            if bid in touched_set:
                continue
            dst = os.path.join(dst_dir, f)
            if not os.path.exists(dst):
                os.link(os.path.join(src_dir, f), dst)

    for fname_out, kind in (
        ("postings_index.parquet", "post"),
        ("revdict_index.parquet", "rev"),
    ):
        old = pq.read_table(os.path.join(gdir, fname_out))
        keep = pc.invert(
            pc.is_in(
                old["bucket_min"],
                value_set=pa.array(sorted(touched_set), pa.int32()),
            )
        )
        old = old.filter(keep)
        rows = [r for r in index_rows if r["kind"] == kind]
        new = pa.table(
            {
                name: pa.array([r[name] for r in rows], type=t)
                for name, t in _RANGE_INDEX_SCHEMA
                if name != "kind"
            }
        )
        pq.write_table(
            pa.concat_tables([old, new], promote_options="none"),
            os.path.join(tmp_gdir, fname_out),
        )

    stats.update(
        {
            "max_doc": manifest.max_doc,
            "doc_count": manifest.doc_count,
            "sum_total_term_freq": manifest.sum_total_term_freq,
            "sum_doc_freq": manifest.sum_doc_freq,
            "field_stats": manifest.field_stats,
            "merged_pids": all_pids,
            # full_merge_doc_count intentionally NOT updated: it anchors
            # plan_merge's growth trigger to the last FULL merge
        }
    )
    with open(os.path.join(tmp_gdir, "stats.json"), "w") as f:
        json.dump(stats, f)

    old_gdir = gdir + ".old"
    if os.path.isdir(old_gdir):
        shutil.rmtree(old_gdir)
    os.replace(gdir, old_gdir)
    os.replace(tmp_gdir, gdir)
    shutil.rmtree(old_gdir, ignore_errors=True)
    manifest.merged = True
    save_manifest(index_dir, manifest)
    return manifest


def _existing_bucket_rows(
    out: dict, fpath: str, revdict_dir: str, fname: str, b: int
) -> None:
    """Rebuild a finished bucket's range-index rows from its files
    (crash-resume path of the incremental fold)."""
    pf = pq.ParquetFile(fpath)
    kt = pf.read(columns=["field", "term"])
    keys = _fkey_column(kt).combine_chunks()
    off = 0
    for rg in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(rg).num_rows
        sl = keys.slice(off, n)
        off += n
        if len(sl) == 0:
            continue
        mm = pc.min_max(sl).as_py()
        out["kind"].append("post")
        out["file"].append(fname)
        out["row_group"].append(rg)
        out["key_min"].append(mm["min"])
        out["key_max"].append(mm["max"])
        out["bucket_min"].append(b)
        out["bucket_max"].append(b)
        out["num_rows"].append(len(sl))
    rpath = os.path.join(revdict_dir, fname)
    if os.path.exists(rpath):
        rt = pq.read_table(rpath)
    else:  # crashed between postings and revdict writes
        rt = _revdict_table(kt["field"], kt["term"])
        pq.write_table(rt, rpath + ".inprogress", row_group_size=REV_RG_ROWS)
        os.replace(rpath + ".inprogress", rpath)
    _append_rg_stats(out, "rev", fname, b, _fkey_column(rt), REV_RG_ROWS)
