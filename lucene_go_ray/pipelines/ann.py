"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k — per-batch numpy matmul against
  the query vector (tiny; shipped once per task in the scorer closure),
  per-block top-k prune, then a distributed ordered-limit merge. The
  baseline and the oracle.
- ``build_lsh_index`` / ``lsh_probe_topk``: scale path — a PERSISTED
  multi-table random-hyperplane LSH index (hive-partitioned by
  (table, code)); per query only the Hamming-ball partitions of each table
  are read. Approximate; recall measured by ``lsh_recall_at_k`` and
  controlled by (n_tables, n_planes, radius).
- ``build_ivf_index`` / ``ivf_probe_topk``: the other classic scale path —
  IVF coarse quantizer (spherical k-means centroids trained on a bounded
  driver-side sample, map-only assignment, hive-partitioned by cell); per
  query only the ``nprobe`` closest cells' partitions are read. Recall
  measured by ``ivf_recall_at_k`` and controlled by (n_cells, nprobe).
- ``build_ivfpq_index`` / ``ivfpq_probe_topk``: the STORAGE-compressed
  scale path — IVF cells store (id, m-byte PQ code) instead of full
  vectors (dim x 4 -> m bytes, 16x at dim=64 m=16); probes score codes
  via an ADC lookup table and exact-rerank only the top candidates from
  the source parquet. Recall measured by ``ivfpq_recall_at_k``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # flatten(), not .values: a SLICED list array's .values is the full
    # unsliced child buffer, which would silently misalign rows
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(len(arr), dim)


def _query_vecs_from_ids(
    path: str, key: str, col: str, query_ids
) -> np.ndarray:
    """(len(query_ids), dim) embedding matrix for the given key values, in
    the requested order — ONE row-group-pruned filtered read (the parquet
    key-column statistics skip every non-overlapping row group), never a
    full-column driver materialization: at corpus scale this reads a few
    row groups, not the table."""
    import pyarrow.parquet as pq

    ids = [int(q) for q in query_ids]
    t = pq.read_table(
        path, columns=[key, col], filters=[(key, "in", ids)]
    )
    got = t[key].to_numpy(zero_copy_only=False)
    m = _emb_matrix(t, col)
    pos = {int(v): i for i, v in enumerate(got)}
    missing = [q for q in ids if q not in pos]
    if missing:
        raise KeyError(f"{key} values {missing} not found in {path}")
    return m[[pos[q] for q in ids]]


def _query_vec_from_id(
    path: str, key: str, col: str, query_vec_id: int
) -> np.ndarray:
    """Embedding of the row with ``key == query_vec_id`` (keeps the SQL
    oracle self-contained)."""
    return _query_vecs_from_ids(path, key, col, [query_vec_id])[0]


def _cosine_block_scorer(q: np.ndarray, k: int, key: str, col: str):
    """Per-block scorer shared by every ANN path: cosine against the
    (normalized) query, then a per-block top-k prune so only k rows per
    block reach the merge."""

    def _score(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, col)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ q) / np.maximum(norms, 1e-30)
        ids = batch[key].to_numpy(zero_copy_only=False)
        if len(sims) > k:
            part = np.lexsort((ids, -sims))[:k]
            ids, sims = ids[part], sims[part]
        return pa.table({key: pa.array(ids), "sim": pa.array(np.round(sims, 6))})

    return _score


def _ranked_topk(scored, k: int, key: str, *, dedup: bool = False) -> pa.Table:
    """Distributed ordered-limit merge shared by every ANN path: the
    driver only ever holds the final k rows. ``dedup`` collapses a vector
    surfacing from several partitions (multi-table LSH / multi-assign IVF,
    identical sim) via groupby-max on the tiny per-block top-k stream."""
    if dedup:
        from ray.data.aggregate import Max

        scored = scored.groupby(key).aggregate(Max("sim", alias_name="sim"))
    out = (
        scored.sort(["sim", key], descending=[True, False]).limit(k).to_pandas()
    )
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int64)),
            key: pa.array(out[key].to_numpy().astype(np.int64)),
            "sim": pa.array(out["sim"].to_numpy()),
        }
    )


def _empty_topk(key: str) -> pa.Table:
    return pa.table(
        {"rank": pa.array([], pa.int64()), key: pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )


def _leaf_parquet_files(d: str) -> list[str]:
    return [
        os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]


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
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    if query_vec is None:
        query_vec = _query_vec_from_id(path, key, col, query_vec_id)
    q = query_vec / np.linalg.norm(query_vec)
    ds = ray.data.read_parquet(path, columns=[key, col])
    scored = ds.map_batches(
        _cosine_block_scorer(q, k, key, col), batch_format="pyarrow"
    )
    return _ranked_topk(scored, k, key)


def brute_force_topk_batch(
    sf_dir: str,
    query_ids: tuple = (0, 1, 2),
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
):
    """Exact cosine top-k for a BATCH of queries in one corpus pass: the
    normalized query matrix is published to the object store once
    (``ray.put``) and read zero-copy by every task; each block does ONE
    (block x dim) @ (dim x Q) matmul and a per-(block, query) top-k prune,
    then a single distributed sort+limit per query group merges the
    k x blocks x Q candidate stream. Returns (query_id, rank, vec_id,
    sim). This is the amortized form of :func:`brute_force_topk` — Q
    queries cost one corpus scan, not Q."""
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    Q = _query_vecs_from_ids(path, key, col, query_ids)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put(Qn)
    qids = np.asarray(query_ids, dtype=np.int64)

    def _score(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)  # zero-copy object-store read per task
        m = _emb_matrix(batch, col)
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-30)
        sims = (m @ qm.T) / norms[:, None]  # (rows, Q) in one matmul
        ids = batch[key].to_numpy(zero_copy_only=False)
        n, nq = sims.shape
        take = min(k, n)
        # per-query top-k prune: argpartition per column, then exact order
        out_q, out_id, out_sim = [], [], []
        for j in range(nq):  # nq is tiny (the query batch), rows vectorized
            sj = sims[:, j]
            part = np.lexsort((ids, -sj))[:take]
            out_q.append(np.full(take, qids[j], dtype=np.int64))
            out_id.append(ids[part])
            out_sim.append(np.round(sj[part], 6))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                key: pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim)),
            }
        )

    def _reduce_query(group: pa.Table) -> pa.Table:
        # one group == one query's k x blocks candidates: exact-order top-k
        ids = group[key].to_numpy(zero_copy_only=False)
        sims = group["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        qid = np.int64(group["query_id"][0].as_py())
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                key: pa.array(ids[order]),
                "sim": pa.array(sims[order]),
            }
        )

    ds = ray.data.read_parquet(path, columns=[key, col])
    # distributed per-query reduction: the exchange moves only the pruned
    # k x blocks x Q candidate stream; the driver holds Q x k rows
    out = (
        ds.map_batches(_score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_reduce_query, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "query_id": pa.array(out["query_id"].to_numpy().astype(np.int64)),
            "rank": pa.array(out["rank"].to_numpy().astype(np.int64)),
            key: pa.array(out[key].to_numpy().astype(np.int64)),
            "sim": pa.array(out["sim"].to_numpy()),
        }
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def _codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    return ((m @ planes) > 0).astype(np.int64) @ (
        1 << np.arange(planes.shape[1], dtype=np.int64)
    )


def build_lsh_index(
    sf_dir: str,
    index_dir: str,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_tables: int = 12,
    n_planes: int = 10,
    seed: int = 42,
) -> str:
    """Build stage (run ONCE, then probed per query): MULTI-TABLE
    random-hyperplane LSH. Each vector is written once per table, parquet
    hive-partitioned by (tbl, bucket=code), plus a meta.json with the
    plane spec; storage is n_tables x data — the classic LSH recall/space
    tradeoff. A probe reads ONLY the Hamming-ball partitions of each table
    (the persisted, partition-pruned form of LSH bucketing; the per-query
    full scan this replaces read everything every time).

    Parameter note (measured on the synthetic embeddings, where true
    top-10 neighbors sit at cosine ~0.3-0.4 — a HARD regime for hyperplane
    LSH): defaults (12 tables x 10 bits, radius-2 probe) give recall@10
    ~0.95 while touching ~half the corpus. Corpora with genuine near-dup
    clusters (cosine >= 0.7) prune far harder at the same recall; tune
    (n_tables, n_planes, radius) per corpus with lsh_recall_at_k.
    Atomic: built in a tmp dir, renamed on completion; an existing
    complete index is reused."""
    import json

    import pyarrow.parquet as pq
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    meta_path = os.path.join(index_dir, "meta.json")
    want = {"n_tables": int(n_tables), "n_planes": int(n_planes),
            "seed": int(seed)}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        have = {kk: meta.get(kk) for kk in want}
        if have != want:
            raise ValueError(
                f"LSH index at {index_dir} was built with {have}, "
                f"requested {want}; use a different index_dir or delete it"
            )
        return index_dir
    first = pq.ParquetFile(path).read_row_group(0, columns=[col])
    dim = len(first[col][0])
    planes = [
        _planes(dim, n_planes, seed + ti) for ti in range(n_tables)
    ]

    def _bucket(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, col)
        parts = []
        for ti in range(n_tables):
            codes = _codes(m, planes[ti])
            parts.append(
                batch.append_column(
                    "tbl", pa.array(np.full(len(m), ti, dtype=np.int32))
                ).append_column("bucket", pa.array(codes, type=pa.int64()))
            )
        return pa.concat_tables(parts)

    tmp = index_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds = ray.data.read_parquet(path, columns=[key, col])
    # NOT clustered before the write, unlike the kd/IVF/IVF-PQ layouts:
    # LSH has n_tables x 2^n_planes TINY partitions by design (the probe
    # opens only Hamming-ball dirs), so a sorted output block would span
    # thousands of partition values and trip pyarrow's 1024-partitions-
    # per-fragment cap; file count here is ~partitions x input blocks and
    # the per-partition file count stays equal to the input block count
    # regardless of clustering.
    ds.map_batches(_bucket, batch_format="pyarrow").write_parquet(
        os.path.join(tmp, "buckets"), partition_cols=["tbl", "bucket"]
    )
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {"n_tables": n_tables, "n_planes": n_planes, "seed": seed, "dim": dim},
            f,
        )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return index_dir


def _hamming_ball(code: int, n_bits: int, radius: int) -> list[int]:
    from itertools import combinations

    out = []
    for r in range(radius + 1):
        for bits in combinations(range(n_bits), r):
            c = code
            for b in bits:
                c ^= 1 << b
            out.append(c)
    return out


def lsh_probe_topk(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    radius: int = 2,
):
    """Approximate cosine top-k against a persisted multi-table LSH index:
    reads ONLY the bucket partitions within ``radius`` bits of the query's
    per-table code (n_tables x sum_{i<=r} C(n_planes, i) directories out
    of n_tables x 2^n_planes); a vector surfacing from several tables is
    deduplicated at the merge."""
    import json

    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    dirs = []
    for ti in range(meta["n_tables"]):
        planes = _planes(meta["dim"], meta["n_planes"], meta["seed"] + ti)
        qc = int(_codes(q[None, :], planes)[0])
        tdir = os.path.join(index_dir, "buckets", f"tbl={ti}")
        for c in _hamming_ball(qc, meta["n_planes"], radius):
            d = os.path.join(tdir, f"bucket={c}")
            if os.path.isdir(d):
                dirs.extend(_leaf_parquet_files(d))
    if not dirs:
        return _empty_topk(key)
    scored = ray.data.read_parquet(dirs, columns=[key, col]).map_batches(
        _cosine_block_scorer(q, k, key, col), batch_format="pyarrow"
    )
    # dedup: the same vec surfaces from several tables with identical sim
    return _ranked_topk(scored, k, key, dedup=True)


def _cached_lsh_index(
    sf_dir: str, *, n_tables: int = 12, n_planes: int = 10, seed: int = 42
) -> str:
    import hashlib

    path = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}:"
        f"{n_tables}:{n_planes}:{seed}".encode()
    ).hexdigest()[:16]
    return build_lsh_index(
        sf_dir, os.path.join("/tmp/lgr_lsh_index", tag),
        n_tables=n_tables, n_planes=n_planes, seed=seed,
    )


def lsh_bucketed_topk(
    sf_dir: str,
    query_vec: np.ndarray | None = None,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_tables: int = 12,
    n_planes: int = 10,
    radius: int = 2,
    seed: int = 42,
    query_vec_id: int = 0,
):
    """Approximate cosine top-k via the persisted code-partitioned index
    (built once per corpus, cached) + Hamming-ball partition probe."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    if query_vec is None:
        query_vec = _query_vec_from_id(path, key, col, query_vec_id)
    index_dir = _cached_lsh_index(
        sf_dir, n_tables=n_tables, n_planes=n_planes, seed=seed
    )
    return lsh_probe_topk(
        index_dir, query_vec, k, key=key, col=col, radius=radius
    )


def lsh_recall_at_k(
    sf_dir: str,
    n_queries: int = 20,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_tables: int = 12,
    n_planes: int = 10,
    radius: int = 2,
    seed: int = 42,
) -> float:
    """Measured recall@k of the LSH probe vs exact cosine top-k over the
    first ``n_queries`` vectors as queries (diagnostic — the exact side is
    computed locally; production recall sampling would run the brute-force
    Dataset oracle per sampled query)."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=[key, col])
    E = np.array(t[col].to_pylist(), dtype=np.float64)
    En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    index_dir = _cached_lsh_index(
        sf_dir, n_tables=n_tables, n_planes=n_planes, seed=seed
    )
    hits = total = 0
    for qi in range(min(n_queries, len(ids))):
        sims = np.round(En @ En[qi], 6)
        exact = set(ids[np.lexsort((ids, -sims))[:k]].tolist())
        got = lsh_probe_topk(index_dir, E[qi], k, key=key, col=col, radius=radius)
        hits += len(exact & set(got[key].to_pylist()))
        total += len(exact)
    return hits / max(1, total)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _strided_emb_sample(
    path: str, col: str, sample_rows: int, seed: int
) -> np.ndarray:
    """STRIDED training sample: rows from row groups spread across the
    whole file, not the leading ones — on a sorted/clustered corpus the
    leading row groups are a biased region and trained
    centroids/codebooks would under-cover the tail. Within each visited
    group an even row stride keeps the per-group take flat. Bounded
    memory: at most sample_rows vectors on the driver."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    n_rg = pf.num_row_groups
    rng = np.random.default_rng(seed)
    rg_order = np.sort(rng.permutation(n_rg)[: max(1, min(n_rg, 64))])
    per_rg = max(1, sample_rows // len(rg_order))
    rows = []
    got = 0
    for rg in rg_order:
        m = _emb_matrix(pf.read_row_group(int(rg), columns=[col]), col)
        if len(m) > per_rg:
            stride = len(m) / per_rg
            m = m[(np.arange(per_rg) * stride).astype(np.int64)]
        rows.append(m)
        got += len(m)
        if got >= sample_rows:
            break
    return np.concatenate(rows)[:sample_rows]


def _spherical_kmeans(
    sample: np.ndarray, n_cells: int, n_iters: int, seed: int
) -> np.ndarray:
    """Spherical k-means (cosine) on a normalized sample — the coarse
    quantizer. Pure numpy on the DRIVER over a bounded sample (the classic
    IVF train/assign split: training is O(sample), assignment streams)."""
    rng = np.random.default_rng(seed)
    X = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].copy()
    for _ in range(n_iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        best = sims.max(axis=1)  # reused for every dead-centroid respawn
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                v = members.sum(axis=0)
                C[c] = v / np.maximum(np.linalg.norm(v), 1e-30)
            else:  # dead centroid: respawn on the worst-covered point
                far = int(np.argmin(best))
                C[c] = X[far]
                best[far] = np.inf  # two dead cells never grab the same point
    return C


def build_ivf_index(
    sf_dir: str,
    index_dir: str,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 64,
    n_assign: int = 1,
    n_iters: int = 10,
    sample_rows: int = 20000,
    seed: int = 42,
) -> str:
    """Build stage (run ONCE): IVF coarse quantizer. Centroids are trained
    on a bounded sample driver-side (spherical k-means), then every vector
    is assigned to its nearest centroid in a map-only pass and written
    parquet hive-partitioned by ``cell`` — one directory per inverted
    list. A probe reads only the ``nprobe`` closest cells' partitions
    (nprobe/n_cells of the data), the IVF pruning contract.

    100-TB shape: train cost is O(sample x n_cells) on one node; the
    assignment is a single streamed map over the corpus with the centroid
    matrix shipped once per task (small: n_cells x dim floats); the write
    is partitioned so a failed build resumes per cell directory and a
    probe is partition-pruned I/O, exactly like the LSH tables above.
    Parameter note (measured on the synthetic embeddings — near-uniform
    on the sphere with true top-10 neighbors at cosine ~0.3-0.4, the
    WORST case for any partition-pruned ANN): 64 cells / nprobe=32 gives
    recall@10 ~0.92 scanning ~half the corpus (the same scan fraction the
    LSH tables need here); ``n_assign=2`` (each vector in its top-2
    cells, 2x storage — the IVF analogue of LSH's n_tables) lifts the
    same scan fraction to ~0.95+. Corpora with real cluster structure
    prune far harder at the same recall; tune with ivf_recall_at_k.
    Atomic tmp-dir + rename; an existing complete index is reused."""
    import json
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    meta_path = os.path.join(index_dir, "meta.json")
    want = {"n_cells": int(n_cells), "n_assign": int(n_assign),
            "n_iters": int(n_iters), "seed": int(seed)}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            have = json.load(f).get("params")
        if have is not None and have != want:
            raise ValueError(
                f"IVF index at {index_dir} was built with {have}, "
                f"requested {want}; use a different index_dir or delete it"
            )
        return index_dir
    sample = _strided_emb_sample(path, col, sample_rows, seed)
    C = _spherical_kmeans(sample, n_cells, n_iters, seed)

    def _assign(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ C.T
        if n_assign <= 1:
            cell = np.argmax(sims, axis=1).astype(np.int32)
            return batch.append_column("cell", pa.array(cell))
        # multi-assignment (the IVF analogue of LSH's n_tables): each
        # vector is replicated into its top-n_assign cells — n_assign x
        # storage buys recall at the same probe fraction; the probe
        # dedups on (key, max sim)
        top = np.argsort(-sims, axis=1)[:, :n_assign].astype(np.int32)
        parts = [
            batch.append_column("cell", pa.array(top[:, j]))
            for j in range(top.shape[1])
        ]
        return pa.concat_tables(parts)

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds = ray.data.read_parquet(path, columns=[key, col])
    # cluster by cell before the hive write (the kd-index lesson: without
    # it every input block writes a fragment into every cell it touches —
    # O(blocks x cells) tiny files; after it, ~one file per cell)
    ds.map_batches(_assign, batch_format="pyarrow").sort("cell").write_parquet(
        os.path.join(tmp, "cells"), partition_cols=["cell"]
    )
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {
                "n_cells": int(len(C)),
                "n_assign": int(n_assign),
                "dim": int(C.shape[1]),
                "seed": seed,
                "params": want,  # requested build params, checked on reuse
                "centroids": C.tolist(),
            },
            f,
        )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return index_dir


def ivf_probe_topk(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    nprobe: int = 8,
):
    """Approximate cosine top-k against a persisted IVF index: score the
    query against the centroid matrix, read ONLY the ``nprobe`` closest
    cells' partitions, exact-rank inside them (per-block top-k prune +
    distributed ordered-limit — the driver holds k rows)."""
    import json

    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    order = np.argsort(-(C @ q))[: min(nprobe, len(C))]
    dirs = []
    for c in order:
        d = os.path.join(index_dir, "cells", f"cell={int(c)}")
        if os.path.isdir(d):
            dirs.extend(_leaf_parquet_files(d))
    if not dirs:
        return _empty_topk(key)
    scored = ray.data.read_parquet(dirs, columns=[key, col]).map_batches(
        _cosine_block_scorer(q, k, key, col), batch_format="pyarrow"
    )
    # multi-assigned vectors surface from several cells with identical sim
    return _ranked_topk(
        scored, k, key, dedup=int(meta.get("n_assign", 1)) > 1
    )


def _cached_ivf_index(
    sf_dir: str, *, n_cells: int = 64, n_assign: int = 1,
    n_iters: int = 10, seed: int = 42
) -> str:
    import hashlib

    path = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.md5(
        f"ivf:{os.path.abspath(path)}:{os.path.getmtime(path)}:"
        f"{n_cells}:{n_assign}:{n_iters}:{seed}".encode()
    ).hexdigest()[:16]
    return build_ivf_index(
        sf_dir, os.path.join("/tmp/lgr_ivf_index", tag),
        n_cells=n_cells, n_assign=n_assign, n_iters=n_iters, seed=seed,
    )


def ivf_topk(
    sf_dir: str,
    query_vec: np.ndarray | None = None,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 64,
    n_assign: int = 1,
    nprobe: int = 32,
    seed: int = 42,
    query_vec_id: int = 0,
):
    """Approximate cosine top-k via the persisted cell-partitioned IVF
    index (built once per corpus, cached) + nprobe-cell probe."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    if query_vec is None:
        query_vec = _query_vec_from_id(path, key, col, query_vec_id)
    index_dir = _cached_ivf_index(
        sf_dir, n_cells=n_cells, n_assign=n_assign, seed=seed
    )
    return ivf_probe_topk(index_dir, query_vec, k, key=key, col=col, nprobe=nprobe)


def ivf_recall_at_k(
    sf_dir: str,
    n_queries: int = 20,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 64,
    n_assign: int = 1,
    nprobe: int = 32,
    seed: int = 42,
) -> float:
    """Measured recall@k of the IVF probe vs exact cosine top-k over the
    first ``n_queries`` vectors as queries (diagnostic, same protocol as
    lsh_recall_at_k)."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=[key, col])
    E = np.array(t[col].to_pylist(), dtype=np.float64)
    En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    index_dir = _cached_ivf_index(
        sf_dir, n_cells=n_cells, n_assign=n_assign, seed=seed
    )
    hits = total = 0
    for qi in range(min(n_queries, len(ids))):
        sims = np.round(En @ En[qi], 6)
        exact = set(ids[np.lexsort((ids, -sims))[:k]].tolist())
        got = ivf_probe_topk(index_dir, E[qi], k, key=key, col=col, nprobe=nprobe)
        hits += len(exact & set(got[key].to_pylist()))
        total += len(exact)
    return hits / max(1, total)


# ------------------------------------------------------------------ IVF-PQ
# Product-quantized inverted lists (Jégou, Douze & Schmid 2011, "Product
# Quantization for Nearest Neighbor Search"): the STORAGE-compressed ANN
# scale path next to the LSH tables and the full-vector IVF above. Cells
# store (id, m-byte code) only — dim x 4 bytes -> m bytes per vector
# (32x at dim=64, m=8) — so a probe's I/O is code-table reads, and the
# query-time work is an m x ksub lookup table + one gather per batch
# (asymmetric distance computation, ADC). An optional exact re-rank
# re-reads ONLY the top candidates' full vectors from the source parquet.


def _kmeans_euclid(
    X: np.ndarray, k: int, n_iters: int, seed: int
) -> np.ndarray:
    """Plain euclidean k-means for the PQ sub-quantizers — driver-side on
    a bounded sample, vectorized via the -2XC' + |C|^2 distance form
    (never materializes the n x k x d cube). Empty clusters reseed to
    random points so exactly k centroids come back."""
    rng = np.random.default_rng(seed)
    k = int(min(k, len(X)))
    C = X[rng.choice(len(X), size=k, replace=False)].astype(np.float64)
    for _ in range(n_iters):
        d = -2.0 * (X @ C.T) + (C**2).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        empty = counts == 0
        if empty.any():
            sums[empty] = X[rng.choice(len(X), size=int(empty.sum()))]
            counts[empty] = 1.0
        C = sums / counts[:, None]
    return C


def _pq_train(
    sample: np.ndarray, m: int, ksub: int, n_iters: int, seed: int
) -> np.ndarray:
    """Per-subspace codebooks over the NORMALIZED sample: (m, ksub, dim/m)."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    if ksub > 256:
        raise ValueError(
            f"ksub={ksub} > 256: PQ codes are stored as uint8, one byte "
            f"per subspace — use more subspaces (m) instead"
        )
    if n < 4:
        raise ValueError(f"PQ training sample too small ({n} rows)")
    ksub = int(min(ksub, max(4, n // 4)))
    books = np.empty((m, ksub, dsub), np.float64)
    for j in range(m):
        books[j] = _kmeans_euclid(
            sample[:, j * dsub : (j + 1) * dsub], ksub, n_iters, seed + j
        )
    return books


def _pq_encode(books: np.ndarray, Xn: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per subspace, nearest codebook entry."""
    m, ksub, dsub = books.shape
    codes = np.empty((len(Xn), m), np.uint8)
    for j in range(m):
        cb = books[j]
        sub = Xn[:, j * dsub : (j + 1) * dsub]
        d = -2.0 * (sub @ cb.T) + (cb**2).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def build_ivfpq_index(
    sf_dir: str,
    index_dir: str,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 64,
    m: int = 16,
    ksub: int = 256,
    n_iters: int = 10,
    sample_rows: int = 20000,
    seed: int = 42,
) -> str:
    """Build stage (run ONCE): IVF coarse quantizer + PQ codebooks trained
    driver-side on one strided sample, then a single map pass normalizes,
    assigns the cell and PQ-encodes every vector, writing (key, codes)
    hive-partitioned by cell and CLUSTERED by cell before the write (one
    file per cell instead of O(blocks x cells) fragments — the kd-index
    lesson). 100-TB shape: the shipped state is centroids + codebooks
    (n_cells x dim + m x ksub x dim/m floats, KBs), the corpus pass is
    map-only, and the stored bytes per vector drop dim*4 -> m."""
    import json
    import shutil

    import ray.data

    meta_path = os.path.join(index_dir, "meta.json")
    want = {
        "n_cells": int(n_cells), "m": int(m), "ksub": int(ksub),
        "n_iters": int(n_iters), "sample_rows": int(sample_rows),
        "seed": int(seed),
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            have = json.load(f).get("params")
        if have is not None and have != want:
            raise ValueError(
                f"IVF-PQ index at {index_dir} was built with {have}, "
                f"requested {want}; use a different index_dir or delete it"
            )
        return index_dir
    path = os.path.join(sf_dir, "embeddings.parquet")
    sample = _strided_emb_sample(path, col, sample_rows, seed)
    sn = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-30
    )
    C = _spherical_kmeans(sample, n_cells, n_iters, seed)
    books = _pq_train(sn, m, ksub, n_iters, seed + 1)

    def _assign_encode(batch: pa.Table) -> pa.Table:
        X = _emb_matrix(batch, col)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        cell = np.argmax(Xn @ C.T, axis=1).astype(np.int32)
        codes = _pq_encode(books, Xn)
        n = len(Xn)
        flat = pa.array(codes.ravel(), type=pa.uint8())
        offsets = np.arange(n + 1, dtype=np.int64) * codes.shape[1]
        return pa.table(
            {
                key: batch[key],
                "codes": pa.LargeListArray.from_arrays(offsets, flat),
                "cell": pa.array(cell),
            }
        )

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds = ray.data.read_parquet(path, columns=[key, col])
    ds.map_batches(_assign_encode, batch_format="pyarrow").sort(
        "cell"
    ).write_parquet(os.path.join(tmp, "cells"), partition_cols=["cell"])
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {
                "params": want,
                "n_cells": int(len(C)),
                "m": int(books.shape[0]),
                "ksub": int(books.shape[1]),
                "dim": int(C.shape[1]),
                "centroids": C.tolist(),
                "codebooks": books.tolist(),
            },
            f,
        )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return index_dir


def ivfpq_probe_topk(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    nprobe: int = 8,
    rerank_path: str | None = None,
    rerank_mult: int = 4,
):
    """ADC probe: score the query against the centroids, read ONLY the
    ``nprobe`` closest cells' CODE tables (m bytes/vector), score each
    batch via the per-query (m x ksub) lookup table + one fancy-index
    gather — no per-row work — and ordered-limit merge. With
    ``rerank_path`` the top k x rerank_mult ADC candidates are re-read
    from the source parquet (an id-filtered, row-group-pruned read of
    ~k*mult rows) and exact-ranked, so PQ distortion only affects
    candidate GENERATION, not final ordering."""
    import json

    import pyarrow.parquet as pq
    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    m, ksub, dsub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    # lut[j, c] = q_j . codebook[j][c]  (ADC: sim ~= sum_j lut[j, code_j])
    lut = np.einsum("jd,jkd->jk", q.reshape(m, dsub), books)
    order = np.argsort(-(C @ q))[: min(nprobe, len(C))]
    files = []
    for c in order:
        d = os.path.join(index_dir, "cells", f"cell={int(c)}")
        if os.path.isdir(d):
            files.extend(_leaf_parquet_files(d))
    if not files:
        return _empty_topk(key)
    take = max(k, k * (rerank_mult if rerank_path else 1))
    jj = np.arange(m)[:, None]

    def _adc(batch: pa.Table) -> pa.Table:
        lst = batch["codes"].combine_chunks()
        # flatten(), not .values (slice-offset safety, see _emb_matrix)
        codes = lst.flatten().to_numpy(zero_copy_only=False).reshape(-1, m)
        sims = lut[jj, codes.T].sum(axis=0)
        ids = batch[key].to_numpy(zero_copy_only=False)
        if len(sims) > take:
            part = np.lexsort((ids, -sims))[:take]
            ids, sims = ids[part], sims[part]
        return pa.table({key: pa.array(ids), "sim": pa.array(np.round(sims, 6))})

    scored = ray.data.read_parquet(files, columns=[key, "codes"]).map_batches(
        _adc, batch_format="pyarrow"
    )
    adc_top = _ranked_topk(scored, take, key)
    if rerank_path is None or len(adc_top) == 0:
        return adc_top.slice(0, k)
    # exact re-rank of the candidate ids (driver-small: k x rerank_mult
    # rows; the read is row-group-pruned by the id filter)
    cand = adc_top[key].to_pylist()
    t = pq.read_table(rerank_path, columns=[key, col], filters=[(key, "in", cand)])
    E = _emb_matrix(t, col)
    sims = np.round(
        (E @ q) / np.maximum(np.linalg.norm(E, axis=1), 1e-30), 6
    )
    ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    orderr = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(orderr) + 1, dtype=np.int64)),
            key: pa.array(ids[orderr]),
            "sim": pa.array(sims[orderr]),
        }
    )


def _cached_ivfpq_index(
    sf_dir: str, *, n_cells: int = 64, m: int = 16, ksub: int = 256,
    seed: int = 42
) -> str:
    import hashlib

    path = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.md5(
        f"ivfpq:{os.path.abspath(path)}:{os.path.getmtime(path)}:"
        f"{n_cells}:{m}:{ksub}:{seed}".encode()
    ).hexdigest()[:16]
    return build_ivfpq_index(
        sf_dir, os.path.join("/tmp/lgr_ivfpq_index", tag),
        n_cells=n_cells, m=m, ksub=ksub, seed=seed,
    )


def ivfpq_topk(
    sf_dir: str,
    query_vec: np.ndarray | None = None,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 64,
    m: int = 16,
    nprobe: int = 32,
    rerank: bool = True,
    seed: int = 42,
    query_vec_id: int = 0,
):
    """Approximate cosine top-k via the persisted IVF-PQ index (built once
    per corpus, cached) + ADC probe + optional exact re-rank."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    if query_vec is None:
        query_vec = _query_vec_from_id(path, key, col, query_vec_id)
    index_dir = _cached_ivfpq_index(sf_dir, n_cells=n_cells, m=m, seed=seed)
    return ivfpq_probe_topk(
        index_dir, query_vec, k, key=key, col=col, nprobe=nprobe,
        rerank_path=path if rerank else None,
    )


def ivfpq_recall_at_k(
    sf_dir: str,
    n_queries: int = 20,
    k: int = 10,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 64,
    m: int = 16,
    nprobe: int = 32,
    rerank: bool = True,
    seed: int = 42,
) -> float:
    """Measured recall@k of the IVF-PQ probe vs exact cosine top-k (same
    protocol as ivf_recall_at_k / lsh_recall_at_k)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, columns=[key, col])
    E = np.array(t[col].to_pylist(), dtype=np.float64)
    En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    index_dir = _cached_ivfpq_index(sf_dir, n_cells=n_cells, m=m, seed=seed)
    hits = total = 0
    for qi in range(min(n_queries, len(ids))):
        sims = np.round(En @ En[qi], 6)
        exact = set(ids[np.lexsort((ids, -sims))[:k]].tolist())
        got = ivfpq_probe_topk(
            index_dir, E[qi], k, key=key, col=col, nprobe=nprobe,
            rerank_path=path if rerank else None,
        )
        hits += len(exact & set(got[key].to_pylist()))
        total += len(exact)
    return hits / max(1, total)
