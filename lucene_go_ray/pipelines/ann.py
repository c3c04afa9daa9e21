"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix (``ray.put`` once, read per task), then a tiny
  driver-side merge of per-block top-k. The baseline and the oracle.
- ``lsh_bucketed_topk``: scale path — random-hyperplane LSH bucketing; only
  buckets sharing a code with the query (within Hamming radius) are scored.
  Approximate; recall controlled by (n_planes, radius).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(len(arr), dim)


def brute_force_topk(
    sf_dir: str,
    query_vec: np.ndarray | None = None,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    query_vec_id: int = 0,
):
    """Exact cosine top-k. If ``query_vec`` is None, the embedding of row
    ``query_vec_id`` is used (keeps the SQL oracle self-contained).
    Returns a Dataset of (rank, vec_id, sim) — sim rounded to 6."""
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    if query_vec is None:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=[key, col])
        idx = t[key].to_numpy(zero_copy_only=False).tolist().index(query_vec_id)
        query_vec = np.asarray(t[col][idx].as_py(), dtype=np.float64)
    q = query_vec / np.linalg.norm(query_vec)
    q_ref = ray.put(q)

    def _score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _emb_matrix(batch, col)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ qv) / np.maximum(norms, 1e-30)
        ids = batch[key].to_numpy(zero_copy_only=False)
        # per-block top-k prune before the driver merge
        if len(sims) > k:
            part = np.lexsort((ids, -sims))[:k]
            ids, sims = ids[part], sims[part]
        return pa.table(
            {key: pa.array(ids), "sim": pa.array(np.round(sims, 6))}
        )

    ds = ray.data.read_parquet(path, columns=[key, col])
    top = ds.map_batches(_score, batch_format="pyarrow").to_pandas()
    order = np.lexsort((top[key].to_numpy(), -top["sim"].to_numpy()))[:k]
    out = top.iloc[order].reset_index(drop=True)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int64)),
            key: pa.array(out[key].to_numpy().astype(np.int64)),
            "sim": pa.array(out["sim"].to_numpy()),
        }
    )


def lsh_bucketed_topk(
    sf_dir: str,
    query_vec: np.ndarray | None = None,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_planes: int = 12,
    radius: int = 2,
    seed: int = 42,
    query_vec_id: int = 0,
):
    """Approximate cosine top-k: score only vectors whose random-hyperplane
    code is within ``radius`` bits of the query's code."""
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as pq

    if query_vec is None:
        t = pq.read_table(path, columns=[key, col])
        idx = t[key].to_numpy(zero_copy_only=False).tolist().index(query_vec_id)
        query_vec = np.asarray(t[col][idx].as_py(), dtype=np.float64)
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    q = query_vec / np.linalg.norm(query_vec)
    q_code = (q @ planes > 0).astype(np.uint32) @ (1 << np.arange(n_planes))
    refs = ray.put((q, planes, int(q_code)))

    def _score(batch: pa.Table) -> pa.Table:
        qv, pl, qc = ray.get(refs)
        m = _emb_matrix(batch, col)
        codes = ((m @ pl) > 0).astype(np.uint32) @ (1 << np.arange(pl.shape[1]))
        pop = np.array(
            [bin(i).count("1") for i in range(1 << pl.shape[1])], dtype=np.int8
        )
        ham = pop[(codes ^ qc).astype(np.int64)]
        sel = ham <= radius
        m = m[sel]
        ids = batch[key].to_numpy(zero_copy_only=False)[sel]
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ qv) / np.maximum(norms, 1e-30)
        if len(sims) > k:
            part = np.lexsort((ids, -sims))[:k]
            ids, sims = ids[part], sims[part]
        return pa.table({key: pa.array(ids), "sim": pa.array(np.round(sims, 6))})

    ds = ray.data.read_parquet(path, columns=[key, col])
    top = ds.map_batches(_score, batch_format="pyarrow").to_pandas()
    order = np.lexsort((top[key].to_numpy(), -top["sim"].to_numpy()))[:k]
    out = top.iloc[order].reset_index(drop=True)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int64)),
            key: pa.array(out[key].to_numpy().astype(np.int64)),
            "sim": pa.array(out["sim"].to_numpy()),
        }
    )
