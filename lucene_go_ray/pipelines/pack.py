"""Sequence packing: assign documents to fixed-capacity token contexts.

The LLM-pretraining dataloader step: documents are concatenated in a
deterministic order (doc_id) and cut into fixed-size contexts; each doc
needs its global token OFFSET and the id of the context (pack) its first
token lands in. The core primitive is a distributed PREFIX SUM, executed
the same way the index builder assigns docBases (index/build.py):

  pass A  (streaming, map-only): one task per planned row-chunk returns a
          single metadata row (chunk ordinal, token sum) — O(chunks) rows
          reach the driver, never documents;
  driver  prefix-sums the tiny per-chunk totals into chunk base offsets
          (exactly the docBase pattern — a metadata-only pass);
  pass B  (streaming, map-only): each chunk re-reads its rows
          (row-group-pruned), cumsums locally, adds its base, and emits
          (doc_id, n_tokens, offset, pack_id = offset // capacity).

Two linear scans, zero shuffles, O(chunks) driver state. Determinism
requires a stable doc order: the documents table is doc_id-sorted by
construction (TESTDATA.md); the planner asserts per-chunk monotonicity.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import GO_WHITESPACE_CLASS
from .dedup import _read_rows


def _token_counts(texts: pa.Array) -> np.ndarray:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(
        texts.cast(pa.large_string()), GO_WHITESPACE_CLASS
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)


def pack_sequences(
    sf_dir: str,
    *,
    key: str = "doc_id",
    text: str = "text",
    capacity: int = 2048,
    chunk_rows: int = 100_000,
):
    """(doc_id, n_tokens, offset, pack_id) for every document, where
    ``offset`` is the doc's first-token position in the doc_id-ordered
    token stream and ``pack_id = offset // capacity`` is the training
    context its first token falls into."""
    import ray.data

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    n_rows = pq.ParquetFile(path).metadata.num_rows
    bounds = list(range(0, n_rows, chunk_rows)) + [n_rows]
    chunks = [
        {"cid": i, "lo": lo, "hi": hi}
        for i, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:]))
    ]

    def _chunk_sums(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("cid", "tok_sum", "first_id", "last_id")}
        for row in batch.to_pylist():
            t = _read_rows(path, [key, text], int(row["lo"]), int(row["hi"]))
            ids = t[key].to_numpy(zero_copy_only=False)
            out["cid"].append(int(row["cid"]))
            out["tok_sum"].append(int(_token_counts(t[text]).sum()))
            out["first_id"].append(int(ids[0]) if len(ids) else 0)
            out["last_id"].append(int(ids[-1]) if len(ids) else 0)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    sums = np.zeros(len(chunks), dtype=np.int64)
    firsts = np.zeros(len(chunks), dtype=np.int64)
    lasts = np.zeros(len(chunks), dtype=np.int64)
    for b in (
        ray.data.from_items(chunks)
        .map_batches(_chunk_sums, batch_format="pyarrow", batch_size=1)
        .iter_batches(batch_format="pyarrow")
    ):
        cid = b["cid"].to_numpy(zero_copy_only=False)
        sums[cid] = b["tok_sum"].to_numpy(zero_copy_only=False)
        firsts[cid] = b["first_id"].to_numpy(zero_copy_only=False)
        lasts[cid] = b["last_id"].to_numpy(zero_copy_only=False)
    # cross-CHUNK monotonicity (pass B only checks within each chunk)
    if len(chunks) > 1 and not np.all(lasts[:-1] < firsts[1:]):
        raise ValueError("pack_sequences requires a doc_id-sorted table")
    bases = np.zeros(len(chunks) + 1, dtype=np.int64)
    np.cumsum(sums, out=bases[1:])

    def _assign(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            t = _read_rows(path, [key, text], int(row["lo"]), int(row["hi"]))
            ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) > 1 and not np.all(np.diff(ids) > 0):
                raise ValueError(
                    "pack_sequences requires a doc_id-sorted table"
                )
            n = _token_counts(t[text])
            off = np.zeros(len(n), dtype=np.int64)
            np.cumsum(n[:-1], out=off[1:])
            off += bases[int(row["cid"])]
            out.append(
                pa.table(
                    {
                        key: pa.array(ids),
                        "n_tokens": pa.array(n),
                        "offset": pa.array(off),
                        "pack_id": pa.array(off // capacity),
                    }
                )
            )
        return pa.concat_tables(out)

    return ray.data.from_items(chunks).map_batches(
        _assign, batch_format="pyarrow", batch_size=1
    )
