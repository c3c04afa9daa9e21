"""Numeric doc-values field updates + soft deletes — the reference's
DocValuesFieldUpdates / PendingSoftDeletes surface
(/root/reference/core/index/docvaluesfieldupdates.go,
pendingsoftdeletes.go), re-expressed as a generation-stamped overlay for
an immutable distributed index.

Lucene updates a numeric dv in place by writing a new dv "generation"
file next to the segment and recording the generation in segment infos;
readers resolve field -> newest generation. Here:

- each ``update_numeric_docvalues*`` call appends ONE parquet file
  ``<index>/dv_updates/upd-<gen:06d>-<uuid>.parquet`` with columns
  (field:string, doc_id:int64, value:int64) via tmp-write + atomic
  rename (the same two-phase commit as every other artifact),
- generations are monotonically increasing; at load the NEWEST
  generation wins per (field, doc_id),
- searchers overlay the updates onto the per-segment dv columns at
  column-load time (search/searcher.py:_dv_column), so every dv
  consumer — numeric range/set/box queries, RangeField relations,
  collectors' ``dv_values`` gathers, field-sorted top-K — sees the
  updated values with zero per-query cost,
- segment dv zone maps (manifest ``dv_ranges``) may be stale for an
  updated field, so zone pruning is DISABLED for fields with pending
  updates (correctness beats the skip until compaction),
- ``expunge_deletes`` (index/compact.py) CONSUMES the overlay: rewritten
  segments get the updated values baked into their docmap + refreshed
  zone maps, and consumed rows are dropped from the overlay.

Soft deletes ride the same mechanism, exactly as Lucene's soft deletes
are "a doc-values field the reader interprets": ``soft_delete_by_query``
sets the reserved ``SOFT_DELETES_FIELD`` to 1; searchers opened normally
union those docs into the collect-time liveDocs filter, while
``IndexSearcher(dir, include_soft_deleted=True)`` still sees them (the
NRT / retention reader). ``soft_undelete`` writes a newer generation
with value 0 — recoverability is what distinguishes soft from hard
tombstones (index/deletes.py). Compaction treats soft-deleted docs as
dead and consumes them.

Scale: an update file is (string, int64, int64) rows — millions of
updates per GB; the load path reads the whole overlay once per searcher
open. For update volumes approaching corpus size, compact — exactly
Lucene's guidance for dv updates.
"""

from __future__ import annotations

import os
import re
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DV_UPDATES_DIR = "dv_updates"
SOFT_DELETES_FIELD = "__soft_del__"

_FILE_RE = re.compile(r"^upd-(\d{6})-[0-9a-f]+\.parquet$")


def _updates_dir(index_dir: str) -> str:
    return os.path.join(index_dir, DV_UPDATES_DIR)


def _next_gen(d: str) -> int:
    gens = [
        int(m.group(1))
        for name in os.listdir(d)
        if (m := _FILE_RE.match(name))
    ]
    return (max(gens) + 1) if gens else 1


def update_numeric_docvalues(
    index_dir: str, fld: str, doc_ids, values
) -> int:
    """Append one update generation setting ``fld`` to ``values[i]`` for
    ``doc_ids[i]`` (global docIDs). Returns rows written."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    values = np.broadcast_to(
        np.asarray(values, dtype=np.int64), doc_ids.shape
    )
    if len(doc_ids) == 0:
        return 0
    # last occurrence wins within one call, matching cross-call semantics
    _, last = np.unique(doc_ids[::-1], return_index=True)
    keep = len(doc_ids) - 1 - last
    doc_ids, values = doc_ids[keep], values[keep]
    d = _updates_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    gen = _next_gen(d)
    name = f"upd-{gen:06d}-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(d, "." + name + ".tmp")
    pq.write_table(
        pa.table(
            {
                "field": pa.array([fld] * len(doc_ids), pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "value": pa.array(values, pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, os.path.join(d, name))
    return len(doc_ids)


def update_numeric_docvalues_by_query(
    index_dir: str, query, fld: str, value: int
) -> int:
    """Set ``fld = value`` on every (live) doc matching ``query`` — the
    IndexWriter.UpdateNumericDocValue(term, ...) surface generalized to
    delete-by-query shape."""
    from ..search.searcher import IndexSearcher

    s = IndexSearcher(index_dir)
    ev = s._eval(query.rewrite(), 1.0, need_scores=False)
    docs = s._apply_live_docs(ev.docs)
    return update_numeric_docvalues(index_dir, fld, docs, int(value))


def soft_delete_by_query(index_dir: str, query) -> int:
    """Soft-delete matching docs (SOFT_DELETES_FIELD := 1): hidden from
    normal searchers, visible to ``include_soft_deleted=True`` readers,
    reversible via ``soft_undelete`` — pendingsoftdeletes.go semantics."""
    return update_numeric_docvalues_by_query(
        index_dir, query, SOFT_DELETES_FIELD, 1
    )


def soft_undelete(index_dir: str, doc_ids) -> int:
    """Resurrect soft-deleted docs by writing a newer generation with 0."""
    return update_numeric_docvalues(
        index_dir, SOFT_DELETES_FIELD, doc_ids, 0
    )


def load_dv_updates(
    index_dir: str,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """{field: (sorted global doc_ids, values)} with newest-generation-
    wins resolution across all update files. Empty dict if none."""
    d = _updates_dir(index_dir)
    if not os.path.isdir(d):
        return {}
    files = sorted(name for name in os.listdir(d) if _FILE_RE.match(name))
    if not files:
        return {}
    tables = [
        pq.read_table(os.path.join(d, name)) for name in files
    ]  # gen order == file-name sort order
    t = pa.concat_tables(tables)
    fields = t["field"].combine_chunks().to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    vals = t["value"].to_numpy(zero_copy_only=False)
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for f in np.unique(fields):
        m = fields == f
        fi, fv = ids[m], vals[m]
        # rows are in generation order; keep the LAST write per doc_id
        _, last = np.unique(fi[::-1], return_index=True)
        keep = np.sort(len(fi) - 1 - last)
        fi, fv = fi[keep], fv[keep]
        order = np.argsort(fi, kind="stable")
        out[str(f)] = (fi[order], fv[order])
    return out


def drop_consumed_updates(index_dir: str, doc_ids: np.ndarray) -> None:
    """Remove all overlay rows for ``doc_ids`` (sorted array) — called by
    compaction after baking them into rewritten segments. Rewrites the
    surviving rows as one new top-generation file FIRST, then unlinks the
    old files (crash-safe: worst case a row survives twice; newest-wins
    load resolution dedups)."""
    d = _updates_dir(index_dir)
    if not os.path.isdir(d):
        return
    files = sorted(name for name in os.listdir(d) if _FILE_RE.match(name))
    if not files:
        return
    resolved = load_dv_updates(index_dir)
    parts = []
    for f, (fi, fv) in resolved.items():
        keep = ~np.isin(fi, doc_ids)
        if keep.any():
            parts.append(
                pa.table(
                    {
                        "field": pa.array([f] * int(keep.sum()), pa.string()),
                        "doc_id": pa.array(fi[keep], pa.int64()),
                        "value": pa.array(fv[keep], pa.int64()),
                    }
                )
            )
    if parts:
        gen = _next_gen(d)
        name = f"upd-{gen:06d}-{uuid.uuid4().hex[:12]}.parquet"
        tmp = os.path.join(d, "." + name + ".tmp")
        pq.write_table(pa.concat_tables(parts), tmp)
        os.replace(tmp, os.path.join(d, name))
    for f in files:
        os.unlink(os.path.join(d, f))
