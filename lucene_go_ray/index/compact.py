"""Tombstone compaction — the reference IndexWriter's expungeDeletes /
ForceMergeDeletes surface (/root/reference/core/index/indexwriter.go:399-422
delete GC; indexfiledeleter.go:1 file retirement), re-expressed for an
immutable distributed index with STABLE global docIDs.

Lucene expunges by rewriting segments and renumbering docIDs. Here docIDs
are user-visible (search results carry them), so compaction instead:

1. picks every partition whose pending tombstone ratio >= ``min_ratio``,
2. rebuilds those segments with the dead rows' indexed content blanked
   (``SegmentIndexer`` dead_ords path, build.py): postings, norms, per-field
   stats, dv zone maps and has-field bitmaps all exclude the dead docs,
   while physical rows — and therefore every surviving doc's ord, docBase
   and global docID — stay put,
3. re-runs the global merge so the merged postings drop the dead docs,
4. rewrites the tombstone overlay WITHOUT the consumed docIDs (they now
   live in each segment's ``dead.parquet``, the .liv-file analogue that
   searchers still union into the collect-time filter — needed only for
   the match-all / docID-range / dense paths that don't go through
   postings).

After compaction, collection/field statistics genuinely exclude the
deleted docs (Lucene's post-merge behavior); before it, they keep counting
them (Lucene's liveDocs behavior) — both matching the reference contract.

Crash safety: segment rewrites commit via tmp-dir + rename before the
manifest is touched, the manifest before the merge, the merge before the
overlay shrink. A crash at any point leaves every deleted doc filtered
(possibly by overlay AND dead.parquet at once — the union is idempotent)
and a re-run converges.

Scale: the rebuild is an actor-pool map over ONLY the selected partitions
(delete skew does not touch cold partitions); the merge is the same
two-phase bucketed file shuffle as the build. At 100 TB one would further
restrict the merge to term buckets containing the rewritten partitions'
terms; a partition's vocabulary spans nearly all buckets under hash
bucketing, so the full re-merge is the honest cost and is documented in
the manifest metrics.
"""

from __future__ import annotations

import os
from dataclasses import asdict

import numpy as np
import pyarrow.parquet as pq

from .config import IndexConfig
from .deletes import DELETES_DIR, load_deleted, write_tombstones
from .manifest import PartitionInfo, finalize_partitions, load_manifest, save_manifest


def segment_dead_ords(index_dir: str, pid: int) -> np.ndarray:
    """Local ords already expunged from segment ``pid`` (its .liv file)."""
    from .build import segment_path

    p = os.path.join(segment_path(index_dir, pid), "dead.parquet")
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(p, columns=["ord"])["ord"].to_numpy(zero_copy_only=False)


def _bake_dv_updates(index_dir: str, info: PartitionInfo, dv_upd) -> PartitionInfo:
    """Write pending dv updates into one rewritten segment's docmap and
    refresh its zone maps (the consumption side of
    /root/reference/core/index/docvaluesfieldupdates.go: after a merge the
    updated values ARE the segment's values). Atomic tmp+rename; zone maps
    recompute over live (non-dead) rows only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .build import segment_path

    path = os.path.join(segment_path(index_dir, info.pid), "docmap.parquet")
    t = pq.read_table(path)
    base, n = int(info.doc_base), int(info.num_docs)
    live = np.ones(n, dtype=bool)
    dead = segment_dead_ords(index_dir, info.pid)
    live[dead] = False
    cols = {name: t[name] for name in t.column_names}
    new_ranges = dict(info.dv_ranges or {})
    changed = False
    for fld, (u_ids, u_vals) in dv_upd.items():
        col = f"dv_{fld}"
        if col not in t.column_names:
            continue
        a = int(np.searchsorted(u_ids, base))
        b = int(np.searchsorted(u_ids, base + n))
        if a == b:
            continue
        arr = t[col].combine_chunks()
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        vals = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        ords = u_ids[a:b] - base
        vals[ords] = u_vals[a:b]
        valid[ords] = True
        cols[col] = pa.array(vals, pa.int64(), mask=~valid)
        lv = valid & live
        if lv.any():
            new_ranges[fld] = [int(vals[lv].min()), int(vals[lv].max())]
        else:
            new_ranges.pop(fld, None)
        changed = True
    if not changed:
        return info
    tmp = path + ".tmp"
    pq.write_table(pa.table(cols), tmp)
    os.replace(tmp, path)
    info.dv_ranges = new_ranges
    return info


def expunge_deletes(
    index_dir: str,
    *,
    min_ratio: float = 0.0,
    concurrency: int | None = None,
) -> dict:
    """Rewrite every partition whose pending-tombstone ratio >= min_ratio.

    Returns {"partitions_rewritten", "docs_expunged", "tombstones_left"}.
    ``min_ratio=0.0`` expunges every partition with any pending delete
    (Lucene forceMergeDeletes default is a 10% threshold — pass 0.1).
    """
    from .build import _run_segment_builds
    from .merge import merge_index

    manifest = load_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest in {index_dir}; build first")
    cfg = IndexConfig.from_dict(manifest.config)

    hard_pending = load_deleted(index_dir)  # overlay only (not dead files)
    # soft-deleted docs (pendingsoftdeletes.go) are consumed as hard dead
    # rows at compaction, exactly like Lucene merges drop them
    from .dv_updates import SOFT_DELETES_FIELD, load_dv_updates

    dv_upd = load_dv_updates(index_dir)
    soft = dv_upd.pop(SOFT_DELETES_FIELD, None)
    soft_dead = (
        soft[0][soft[1] == 1] if soft is not None else np.empty(0, np.int64)
    )
    pending = np.union1d(hard_pending, soft_dead)
    parts = [PartitionInfo(**p) for p in manifest.partitions]
    todo: list[dict] = []
    consumed: list[np.ndarray] = []
    for p in parts:
        lo, hi = p.doc_base, p.doc_base + p.num_docs
        mine = pending[(pending >= lo) & (pending < hi)]
        if len(mine) == 0:
            continue
        prior = segment_dead_ords(index_dir, p.pid)
        new_dead = np.union1d(mine - lo, prior)
        # ratio counts ALL dead rows (prior + new) like Lucene's
        # pctDeletes over the segment
        if len(new_dead) / max(1, p.num_docs) < min_ratio:
            continue
        d = asdict(p)
        desc = {
            "pid": p.pid,
            "path": p.path,
            "row_groups": list(d["row_groups"]),
            "row_start": p.row_start,
            "num_docs": p.num_docs,
            "input_bytes": p.input_bytes,
            "dead_ords": [int(x) for x in new_dead],
            "replace": True,
        }
        todo.append(desc)
        consumed.append(mine)

    if not todo:
        return {
            "partitions_rewritten": 0,
            "docs_expunged": 0,
            "tombstones_left": int(len(pending)),
        }

    rebuilt = {
        info.pid: info
        for info in _run_segment_builds(index_dir, cfg, todo, concurrency,
                                        from_descriptors=True)
    }
    # bake pending dv updates (docvaluesfieldupdates.go consumption) into
    # the rewritten segments' docmaps + refresh their zone maps; the
    # overlay rows for these docID ranges are dropped below. Rebuilt infos
    # carry doc_base=-1 until finalize; docBases are STABLE across
    # rewrites, so seed them from the prior manifest first.
    base_by_pid = {p.pid: p.doc_base for p in parts}
    for pid, info in rebuilt.items():
        info.doc_base = base_by_pid[pid]
    if dv_upd:
        for pid, info in rebuilt.items():
            rebuilt[pid] = _bake_dv_updates(index_dir, info, dv_upd)
    merged_parts = [rebuilt.get(p.pid, p) for p in parts]
    new_manifest = finalize_partitions(merged_parts)
    new_manifest.config = asdict(cfg)
    new_manifest.metrics = dict(manifest.metrics or {})
    new_manifest.metrics["expunged_docs"] = int(
        sum(p.num_deleted for p in merged_parts)
    )
    save_manifest(index_dir, new_manifest)

    new_manifest = merge_index(index_dir, new_manifest, cfg)
    save_manifest(index_dir, new_manifest)

    # shrink the overlays. Tombstones: drop the consumed docIDs, keep the
    # rest (survivor file FIRST, then unlink — crash-safe: worst case a
    # docID is listed twice; the union at load time dedups). dv updates +
    # soft deletes: every overlay row whose docID lies in a rewritten
    # partition's range is now baked (dv) or dead (soft) — drop those;
    # soft deletes OUTSIDE rewritten partitions stay soft (they must NOT
    # become hard tombstones here).
    from .dv_updates import drop_consumed_updates

    eaten = np.concatenate(consumed)
    rewritten_ranges = [
        (rebuilt[d["pid"]].doc_base,
         rebuilt[d["pid"]].doc_base + rebuilt[d["pid"]].num_docs)
        for d in todo
    ]
    upd_eaten = [eaten]
    for fi, fv in list(dv_upd.values()) + ([soft] if soft is not None else []):
        m = np.zeros(len(fi), dtype=bool)
        for lo, hi in rewritten_ranges:
            m |= (fi >= lo) & (fi < hi)
        upd_eaten.append(fi[m])
    drop_consumed_updates(index_dir, np.unique(np.concatenate(upd_eaten)))
    left = np.setdiff1d(hard_pending, eaten)
    ddir = os.path.join(index_dir, DELETES_DIR)
    old_files = (
        sorted(
            os.path.join(ddir, f)
            for f in os.listdir(ddir)
            if f.endswith(".parquet")
        )
        if os.path.isdir(ddir)
        else []
    )
    if len(left):
        write_tombstones(index_dir, left)
    for f in old_files:
        os.unlink(f)

    return {
        "partitions_rewritten": len(todo),
        "docs_expunged": int(len(eaten)),
        "tombstones_left": int(len(left)),
    }


def gc_index(index_dir: str) -> dict:
    """Orphan-artifact GC — the IndexFileDeleter surface
    (/root/reference/core/index/indexfiledeleter.go:1): every commit in
    this engine is tmp-write + atomic rename, so a crash can only leave
    clearly-named orphans, never corrupt live state. Removes:

    - ``global.old``        (crash between the two merge-swap renames)
    - ``global.tmp``        (only when the manifest says merged — an
                             unfinished merge's tmp dir is a RESUME asset
                             and is kept; merge.py wipes it itself on
                             epoch mismatch)
    - ``segments/.tmp-p=*`` (crashed segment builds)
    - ``segments/p=*.old-*``(crashed compaction replaces)
    - ``deletes/.del-*.tmp``(crashed tombstone appends)

    Returns {"removed": [paths...], "bytes_freed": n}.
    """
    import shutil

    removed: list[str] = []
    freed = 0

    def _size(p: str) -> int:
        if os.path.isfile(p):
            return os.path.getsize(p)
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )

    def _rm(p: str):
        nonlocal freed
        freed += _size(p)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            os.unlink(p)
        removed.append(os.path.relpath(p, index_dir))

    old_gdir = os.path.join(index_dir, "global.old")
    if os.path.isdir(old_gdir):
        _rm(old_gdir)
    manifest = load_manifest(index_dir)
    tmp_gdir = os.path.join(index_dir, "global.tmp")
    if manifest is not None and manifest.merged and os.path.isdir(tmp_gdir):
        _rm(tmp_gdir)
    seg_root = os.path.join(index_dir, "segments")
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            if name.startswith(".tmp-p=") or (
                name.startswith("p=") and ".old-" in name
            ):
                _rm(os.path.join(seg_root, name))
    ddir = os.path.join(index_dir, DELETES_DIR)
    if os.path.isdir(ddir):
        for name in sorted(os.listdir(ddir)):
            if name.startswith(".") and name.endswith(".tmp"):
                _rm(os.path.join(ddir, name))
    return {"removed": removed, "bytes_freed": int(freed)}
