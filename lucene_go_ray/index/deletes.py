"""Tombstone delete overlay — the delete-by-term path of the reference's
IndexWriter (/root/reference/core/index/indexwriter.go:399-422: Update-
Document = atomic delete(term) + add) re-expressed for an immutable
distributed index.

Deletes are an OVERLAY, not a rewrite: each ``delete_by_query`` call
appends one parquet file of global docIDs under ``<index>/deletes/``
(write-temp + atomic rename, like every other commit in this engine).
Searchers union all delete files into a sorted live-docs filter applied at
collect time — exactly the reference's liveDocs bitmap semantics
(segmentreader.go liveDocs; docFreq / collection statistics deliberately
STILL COUNT deleted docs until segments are rewritten, as in Lucene).

The overlay lives outside ``global/`` and ``segments/``, so it survives a
re-merge unchanged (tombstoned docIDs are stable: docBases never change
for existing partitions, index/manifest.py:finalize_partitions).

Scale: a delete file is a sorted int64 column — millions of tombstones per
GB. For truly mutable corpora the compaction path is ``add_documents`` +
periodic full rebuild of affected partitions; the overlay bounds staleness
between rebuilds.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DELETES_DIR = "deletes"


def _deletes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, DELETES_DIR)


def load_deleted(index_dir: str) -> np.ndarray:
    """Sorted unique global docIDs tombstoned so far (empty if none)."""
    d = _deletes_dir(index_dir)
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    arrs = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            arrs.append(
                pq.read_table(os.path.join(d, name), columns=["doc_id"])[
                    "doc_id"
                ].to_numpy(zero_copy_only=False)
            )
    if not arrs:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(arrs).astype(np.int64))


def write_tombstones(index_dir: str, doc_ids: np.ndarray) -> int:
    """Append one tombstone file (atomic rename); returns rows written."""
    doc_ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
    if len(doc_ids) == 0:
        return 0
    d = _deletes_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    name = f"del-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(d, "." + name + ".tmp")
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, type=pa.int64())}), tmp
    )
    os.replace(tmp, os.path.join(d, name))
    return len(doc_ids)


def delete_by_query(index_dir: str, query) -> int:
    """Tombstone every doc matching ``query``; returns newly deleted count.

    The deleting searcher itself respects existing tombstones, so re-running
    the same delete is idempotent (0 new deletes)."""
    from ..search.searcher import IndexSearcher

    s = IndexSearcher(index_dir)
    ev = s._eval(query.rewrite(), 1.0, need_scores=False)
    docs = s._apply_live_docs(ev.docs)
    return write_tombstones(index_dir, docs)


def delete_by_term(index_dir: str, term: str, fld: str | None = None) -> int:
    """IndexWriter.DeleteDocuments(term) (indexwriter.go:399-422)."""
    from ..search.query import TermQuery

    return delete_by_query(index_dir, TermQuery(term, field=fld))
