"""Semantic deduplication over an embedding column — SemDeDup (Abbas et
al. 2023, arXiv:2303.09540): k-means-cluster the embeddings, then drop
near-identical pairs WITHIN each cluster (cosine >= threshold), keeping
one representative. The clustering bounds the pairwise work to
O(sum cluster_size^2) instead of O(N^2).

Stages, all Dataset-native:

``train_kmeans_centroids`` — FULL-corpus distributed Lloyd's iterations
(spherical/cosine): centroids initialize from a strided sample, then each
iteration broadcasts the (k x dim) centroid matrix and streams ONE
map-only pass that emits per-batch PARTIAL SUMS (k rows of (sum-vector,
count) per batch — never raw vectors); the driver reduces the O(k·dim)
partials and renormalizes. Iteration count is fixed (deterministic across
runs and cluster sizes). This is the full-data counterpart of the
bounded-sample trainer in pipelines/ann.py (IVF coarse quantizer).

``kmeans_embeddings`` — assignment pass: (vec_id, cluster, sim).

``semantic_dedup`` — assignment carries the normalized vector into ONE
groupby(cluster) exchange, then a vectorized keep-first sweep inside each
cluster: drop j iff some i < j (by id) has cosine(i, j) >= threshold —
the same keep-first convention as dup_spans/minhash. Chunked matmuls
bound per-task memory to O(chunk x cluster_size) regardless of cluster
size.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .ann import _emb_matrix, _strided_emb_sample


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


# Partial sums are accumulated in FIXED-POINT int64 (scale 2^28): integer
# addition is exactly associative and commutative, so the reduced centroid
# is bit-identical no matter how Ray batches the rows or in which order
# the partials arrive at the driver — float partials would drift with
# parallelism and break run-to-run determinism. 2^-28 quantization (~4e-9
# per element on unit vectors) is far below k-means' resolution; overflow
# needs > ~3e10 unit-vector rows in ONE cluster.
_FIX = np.int64(1) << np.int64(28)


def _det_scores(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """A @ B.T with a FIXED accumulation order (ascending dim), so the
    result is bit-identical for any row batching. BLAS gemm blocks by
    matrix SHAPE — the same row dotted inside a 4096-row batch and a
    100-row batch can differ in the last ulp, which flips near-tie
    argmaxes and threshold comparisons and would make cluster assignment
    depend on Ray's batch sizes. O(dim) fused elementwise passes; dims
    here are small (embedding tables are 64-d in the test corpus)."""
    S = np.zeros((A.shape[0], B.shape[0]), dtype=np.float64)
    for d in range(A.shape[1]):
        S += A[:, d, None] * B[None, :, d]
    return S


def train_kmeans_centroids(
    sf_dir: str,
    *,
    col: str = "embedding",
    k: int = 32,
    iters: int = 8,
    seed: int = 5,
    sample_rows: int = 8192,
) -> np.ndarray:
    """(k x dim) spherical-k-means centroids trained over the FULL
    embedding table (broadcast centroids -> map-only partial sums ->
    O(k·dim) driver reduce per iteration). Deterministic."""
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    sample = _normalize(
        _strided_emb_sample(path, col, sample_rows, seed).astype(np.float64)
    )
    stride = max(1, len(sample) // k)
    C = _normalize(sample[(np.arange(k) * stride) % len(sample)].copy())

    for _ in range(iters):
        c_ref = ray.put(C)

        def _partials(batch: pa.Table) -> pa.Table:
            cm = ray.get(c_ref)
            E = _normalize(_emb_matrix(batch, col).astype(np.float64))
            a = np.argmax(_det_scores(E, cm), axis=1)
            q = np.round(E * np.float64(_FIX)).astype(np.int64)
            sums = np.zeros((len(cm), E.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=len(cm)).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(cm), dtype=np.int64)),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.int64())),
                    "cnt": pa.array(cnt),
                }
            )

        sums = np.zeros((k, C.shape[1]), dtype=np.int64)
        cnts = np.zeros(k, dtype=np.int64)
        for b in (
            ray.data.read_parquet(path, columns=[col])
            .map_batches(_partials, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            vs = np.array(b["vsum"].to_pylist(), dtype=np.int64)
            # np.add.at, NOT fancy-index +=: one iter_batch can coalesce
            # several tasks' partials, repeating cluster ids — buffered
            # fancy indexing would keep only one row per repeated id
            np.add.at(sums, cl, vs)
            np.add.at(cnts, cl, b["cnt"].to_numpy(zero_copy_only=False))
        live = cnts > 0
        C[live] = _normalize(sums[live].astype(np.float64) / np.float64(_FIX))
        # empty cells keep their previous centroid (stable, deterministic)
    return C


def kmeans_embeddings(
    sf_dir: str,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    k: int = 32,
    iters: int = 8,
    seed: int = 5,
    sample_rows: int = 8192,
):
    """(vec_id, cluster, sim) for every vector; ``sim`` is the cosine to
    the assigned centroid (the SemDeDup ranking signal), rounded to 6."""
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    C = train_kmeans_centroids(
        sf_dir, col=col, k=k, iters=iters, seed=seed, sample_rows=sample_rows
    )
    c_ref = ray.put(C)

    def _assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        E = _normalize(_emb_matrix(batch, col).astype(np.float64))
        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        S = _det_scores(E, cm)
        a = np.argmax(S, axis=1)
        return pa.table(
            {
                key: pa.array(ids),
                "cluster": pa.array(a.astype(np.int64)),
                "sim": pa.array(
                    np.round(S[np.arange(len(a)), a], 6), type=pa.float64()
                ),
            }
        )

    return ray.data.read_parquet(path, columns=[key, col]).map_batches(
        _assign, batch_format="pyarrow"
    )


def semantic_dedup(
    sf_dir: str,
    *,
    key: str = "vec_id",
    col: str = "embedding",
    k: int = 32,
    iters: int = 8,
    threshold: float = 0.7,
    seed: int = 5,
    sample_rows: int = 8192,
    chunk: int = 1024,
):
    """(vec_id, cluster, kept) — SemDeDup keep-first: within each k-means
    cluster, a vector is dropped iff some LOWER-id member has cosine >=
    threshold (kept or not — chain-insensitive, deterministic; the
    dup_spans/minhash keep-first convention). One groupby(cluster)
    exchange carries each normalized vector exactly once."""
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    C = train_kmeans_centroids(
        sf_dir, col=col, k=k, iters=iters, seed=seed, sample_rows=sample_rows
    )
    c_ref = ray.put(C)

    def _assign_vec(batch: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        E = _normalize(_emb_matrix(batch, col).astype(np.float64))
        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.argmax(_det_scores(E, cm), axis=1)
        return pa.table(
            {
                key: pa.array(ids),
                "cluster": pa.array(a.astype(np.int64)),
                "vec": pa.array(list(E), type=pa.list_(pa.float64())),
            }
        )

    def _cluster_sweep(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {key: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64()),
                 "kept": pa.array([], pa.bool_())}
            )
        ids = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = group["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.array(group["vec"].to_pylist(), dtype=np.float64)
        order = np.lexsort((ids, cl))
        ids, cl, E = ids[order], cl[order], E[order]
        starts = np.flatnonzero(np.concatenate([[True], cl[1:] != cl[:-1]]))
        ends = np.append(starts[1:], len(cl))
        kept = np.ones(len(ids), dtype=bool)
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            Ec = E[s:e]
            for cs in range(1, m, chunk):
                ce = min(cs + chunk, m)
                S6 = np.round(_det_scores(Ec[cs:ce], Ec[:ce]), 6)
                colmask = (
                    np.arange(ce)[None, :] < np.arange(cs, ce)[:, None]
                )
                hit = ((S6 >= threshold) & colmask).any(axis=1)
                kept[s + cs : s + ce] = ~hit
        return pa.table(
            {
                key: pa.array(ids),
                "cluster": pa.array(cl),
                "kept": pa.array(kept),
            }
        )

    return (
        ray.data.read_parquet(path, columns=[key, col])
        .map_batches(_assign_vec, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(_cluster_sweep, batch_format="pyarrow")
    )
