"""Offline index integrity validation — the CheckIndex surface
(/root/reference/core/index/checkindex.go): re-derive per-term statistics
from the packed posting streams and cross-check every layer of metadata,
so a corrupted blob byte, a truncated side file or a stale manifest is
caught BEFORE a searcher silently mis-ranks.

Checks (offline, read-only):

1. manifest: format version, docBase prefix-sum over partitions,
   max_doc consistency;
2. global stats: doc_count / sum_total_term_freq / sum_doc_freq equal
   the sums of the per-partition manifest rows;
3. segments: docmap row count == num_docs, dead ords in-bounds;
4. merged postings (sampled per bucket): blob offsets monotonic and
   inside the side file, then a REAL codec decode of each sampled row —
   decoded doc count == doc_freq, docIDs strictly increasing and equal
   to first_doc/last_doc at the ends, all < max_doc, freqs >= 1 with
   sum == total_term_freq, norms length == doc_freq;
5. reversed-term dictionary (sampled): every sampled reversed term's
   forward term resolves to >= 1 postings row, and vice versa;
6. payload side stream (sampled, when built with payload_kind): per
   sampled payload term, row count == the segment's doc_freq and the
   summed per-occurrence list lengths == total_term_freq (from the
   segment terms table), ords in [0, num_docs), no empty lists;
7. term vectors (sampled, when stored): per row len(positions) == freq,
   positions strictly increasing, ords in [0, num_docs).

Any flipped byte in a sampled row's streams breaks one of the decode
invariants (widths/counts no longer reconcile) — see
tests/test_check_index.py which corrupts a single blob byte.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

from .codec import INDEX_FORMAT_VERSION, BlobFile, get_codec
from .config import IndexConfig
from .manifest import load_manifest

_META_KINDS = ("docs", "freqs", "norms", "pos")


def _sample_idx(n: int, k: int, seed: int) -> np.ndarray:
    if n <= k:
        return np.arange(n)
    return np.sort(
        np.random.default_rng(seed).choice(n, size=k, replace=False)
    )


def check_index(
    index_dir: str, *, sample_per_bucket: int = 16, seed: int = 0
) -> dict:
    """Validate an index; returns {"ok", "problems": [...], "checked": {...}}.

    Never raises on corruption — every violated invariant appends a
    problem string (the CLI exits nonzero when any exist)."""
    problems: list[str] = []
    checked = {"terms_decoded": 0, "buckets": 0, "revdict_terms": 0}

    manifest = load_manifest(index_dir)
    if manifest is None:
        return {"ok": False, "problems": ["no manifest"], "checked": checked}
    cfg = IndexConfig.from_dict(manifest.config)
    codec = get_codec(cfg.codec_name)

    # 1. manifest geometry
    base = 0
    for p in manifest.partitions:
        if int(p["doc_base"]) != base:
            problems.append(
                f"partition {p['pid']}: doc_base {p['doc_base']} != "
                f"prefix sum {base}"
            )
        base += int(p["num_docs"])
    if manifest.max_doc != base:
        problems.append(f"max_doc {manifest.max_doc} != sum num_docs {base}")

    # 2. + 3. stats vs partitions; segment files
    sums = {"doc_count": 0, "sum_total_term_freq": 0, "sum_doc_freq": 0}
    for p in manifest.partitions:
        for k in sums:
            sums[k] += int(p.get(k, 0))
        seg = os.path.join(index_dir, "segments", f"p={int(p['pid']):05d}")
        dm = os.path.join(seg, "docmap.parquet")
        if not os.path.exists(dm):
            problems.append(f"segment {p['pid']}: missing docmap")
            continue
        n = pq.ParquetFile(dm).metadata.num_rows
        if n != int(p["num_docs"]):
            problems.append(
                f"segment {p['pid']}: docmap rows {n} != num_docs "
                f"{p['num_docs']}"
            )
        dead = os.path.join(seg, "dead.parquet")
        if os.path.exists(dead):
            ords = pq.read_table(dead, columns=["ord"])["ord"].to_numpy(
                zero_copy_only=False
            )
            if len(ords) and (ords.min() < 0 or ords.max() >= n):
                problems.append(f"segment {p['pid']}: dead ord out of bounds")

    gdir = os.path.join(index_dir, "global")
    stats = None
    if manifest.merged:
        try:
            with open(os.path.join(gdir, "stats.json")) as f:
                stats = json.load(f)
        except OSError:
            problems.append("merged manifest but no global/stats.json")
    if stats is not None:
        if stats.get("format_version") != INDEX_FORMAT_VERSION:
            problems.append(
                f"format_version {stats.get('format_version')} != engine "
                f"{INDEX_FORMAT_VERSION}"
            )
        for k, v in sums.items():
            # post-compaction stats subtract expunged docs; partitions'
            # rows are refreshed together, so equality must still hold
            if int(stats.get(k, -1)) != v:
                problems.append(
                    f"stats.{k} {stats.get(k)} != partition sum {v}"
                )
        if int(stats.get("max_doc", -1)) != manifest.max_doc:
            problems.append("stats.max_doc != manifest.max_doc")

    # 4. merged postings buckets: offsets + real decodes (sampled)
    pdir = os.path.join(gdir, "postings")
    if stats is not None and os.path.isdir(pdir):
        max_doc = manifest.max_doc
        for fname in sorted(os.listdir(pdir)):
            if not fname.endswith(".parquet"):
                continue
            checked["buckets"] += 1
            fpath = os.path.join(pdir, fname)
            t = pq.read_table(fpath)
            if t.num_rows == 0:
                continue
            bf = None
            if "docs_off" in t.column_names:
                bpath = fpath[: -len(".parquet")] + ".blob"
                if not os.path.exists(bpath):
                    problems.append(f"{fname}: missing blob side file")
                    continue
                bf = BlobFile(bpath)
                bsize = os.path.getsize(bpath)
                ends = t["blob_end"].to_numpy(zero_copy_only=False)
                offs = t["docs_off"].to_numpy(zero_copy_only=False)
                if len(ends) and int(ends[-1]) != bsize:
                    problems.append(
                        f"{fname}: blob size {bsize} != last blob_end "
                        f"{ends[-1]}"
                    )
                if ((offs[1:] - ends[:-1]) != 0).any() or (
                    (ends - offs) < 0
                ).any():
                    problems.append(f"{fname}: non-contiguous blob regions")
            for i in _sample_idx(t.num_rows, sample_per_bucket, seed):
                row = {c: t[c][int(i)].as_py() for c in t.column_names}
                if bf is not None:
                    row["_blob_file"] = bf
                try:
                    docs, freqs, norms8 = codec.decode_docs_freqs_norms(
                        row, cfg.block_size
                    )
                except Exception as e:  # noqa: BLE001 — corruption surfaces here
                    problems.append(
                        f"{fname} row {i} ({row['term']!r}): decode failed: "
                        f"{type(e).__name__}: {e}"
                    )
                    continue
                checked["terms_decoded"] += 1
                n = int(row["doc_freq"])
                term = row["term"]
                if len(docs) != n or len(freqs) != n or len(norms8) != n:
                    problems.append(f"{fname} {term!r}: stream length != df")
                    continue
                if n and (
                    int(docs[0]) != int(row["first_doc"])
                    or int(docs[-1]) != int(row["last_doc"])
                ):
                    problems.append(f"{fname} {term!r}: first/last_doc drift")
                if n and (np.diff(docs) <= 0).any():
                    problems.append(f"{fname} {term!r}: docIDs not increasing")
                if n and (docs[-1] >= max_doc or docs[0] < 0):
                    problems.append(f"{fname} {term!r}: docID out of range")
                if (freqs < 1).any():
                    problems.append(f"{fname} {term!r}: zero freq")
                if int(freqs.sum()) != int(row["total_term_freq"]):
                    problems.append(
                        f"{fname} {term!r}: sum(freqs) != total_term_freq"
                    )

    # 5. revdict round-trip (sampled)
    rdir = os.path.join(gdir, "revdict")
    if stats is not None and os.path.isdir(rdir):
        from ..search.searcher import IndexSearcher

        s = IndexSearcher(index_dir)
        for fname in sorted(os.listdir(rdir)):
            if not fname.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(rdir, fname))
            if t.num_rows == 0:
                continue
            for i in _sample_idx(t.num_rows, max(2, sample_per_bucket // 4),
                                 seed + 1):
                row = {c: t[c][int(i)].as_py() for c in t.column_names}
                fwd = row["term"][::-1]
                rows = s._term_rows(fwd, fld=row["field"])
                checked["revdict_terms"] += 1
                if not rows:
                    problems.append(
                        f"revdict {fname}: {row['term']!r} has no forward "
                        f"postings for {fwd!r}"
                    )

    # 6. + 7. per-segment side streams: payloads and term vectors
    checked["payload_terms"] = 0
    checked["tvec_rows"] = 0
    for p in manifest.partitions:
        seg = os.path.join(index_dir, "segments", f"p={int(p['pid']):05d}")
        num_docs = int(p["num_docs"])
        ppath = os.path.join(seg, "payloads.parquet")
        if os.path.exists(ppath):
            pt = pq.read_table(ppath, columns=["term", "ord"])
            ords = pt["ord"].to_numpy(zero_copy_only=False)
            if len(ords) and (ords.min() < 0 or ords.max() >= num_docs):
                problems.append(f"segment {p['pid']}: payload ord out of bounds")
            uterms = pt["term"].unique().to_pylist()
            for i in _sample_idx(len(uterms), max(2, sample_per_bucket // 4),
                                 seed + 2):
                term = uterms[int(i)]
                rows = pq.read_table(ppath, filters=[("term", "=", term)])
                lens = rows["payloads"].combine_chunks()
                counts = np.asarray(
                    [len(v) for v in lens], dtype=np.int64
                )
                checked["payload_terms"] += 1
                if (counts == 0).any():
                    problems.append(
                        f"segment {p['pid']}: empty payload list for {term!r}"
                    )
                st = pq.read_table(
                    os.path.join(seg, "terms.parquet"),
                    columns=["doc_freq", "total_term_freq"],
                    filters=[("field", "=", cfg.text_column),
                             ("term", "=", term)],
                )
                df = int(np.sum(st["doc_freq"].to_numpy(zero_copy_only=False)))
                ttf = int(
                    np.sum(st["total_term_freq"].to_numpy(zero_copy_only=False))
                )
                if rows.num_rows != df:
                    problems.append(
                        f"segment {p['pid']}: payload rows {rows.num_rows} != "
                        f"doc_freq {df} for {term!r}"
                    )
                if int(counts.sum()) != ttf:
                    problems.append(
                        f"segment {p['pid']}: payload occurrences "
                        f"{int(counts.sum())} != total_term_freq {ttf} for "
                        f"{term!r}"
                    )
        tpath = os.path.join(seg, "tvec.parquet")
        if os.path.exists(tpath):
            # tvec is the largest side file (doc-major transpose of the
            # postings): sample at ROW-GROUP granularity so the check
            # never loads the whole table
            pf = pq.ParquetFile(tpath)
            rgs = _sample_idx(pf.metadata.num_row_groups, 2, seed + 3)
            per_rg = max(2, sample_per_bucket // max(1, len(rgs)))
            for rg in rgs:
                tt = pf.read_row_group(int(rg))
                # per-group seed: identical seeds would pick the SAME row
                # offsets in every fixed-size row group
                for i in _sample_idx(tt.num_rows, per_rg, seed + 3 + int(rg)):
                    row = {c: tt[c][int(i)].as_py() for c in tt.column_names}
                    checked["tvec_rows"] += 1
                    if not (0 <= int(row["ord"]) < num_docs):
                        problems.append(
                            f"segment {p['pid']}: tvec ord {row['ord']} out "
                            f"of bounds"
                        )
                    pos = row["positions"]
                    if len(pos) != int(row["freq"]):
                        problems.append(
                            f"segment {p['pid']}: tvec positions len != freq "
                            f"for ({row['field']}, {row['term']!r}, ord "
                            f"{row['ord']})"
                        )
                    if any(b <= a for a, b in zip(pos, pos[1:])):
                        problems.append(
                            f"segment {p['pid']}: tvec positions not "
                            f"increasing for ({row['field']}, {row['term']!r})"
                        )

    return {"ok": not problems, "problems": problems, "checked": checked}
