"""SemDeDup (k-means + within-cluster cosine keep-first) vs an inline
single-process recompute of the identical fixed-point algorithm — the
rows-only gate entries' independent oracle. The engine's determinism
mechanisms (int64 fixed-point partial sums, fixed-dim-order score kernel)
are what make bit-exact equality possible at ANY batching/parallelism."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_go_ray.pipelines import semdedup
from lucene_go_ray.pipelines.ann import _emb_matrix, _strided_emb_sample
from lucene_go_ray.pipelines.semdedup import _FIX, _det_scores, _normalize

K, ITERS, THR = 8, 4, 0.4


def _oracle_centroids(sf_dir, k=K, iters=ITERS):
    path = os.path.join(sf_dir, "embeddings.parquet")
    E = _normalize(
        _emb_matrix(pq.read_table(path), "embedding").astype(np.float64)
    )
    sample = _normalize(
        _strided_emb_sample(path, "embedding", 8192, 5).astype(np.float64)
    )
    stride = max(1, len(sample) // k)
    C = _normalize(sample[(np.arange(k) * stride) % len(sample)].copy())
    for _ in range(iters):
        a = np.argmax(_det_scores(E, C), axis=1)
        q = np.round(E * np.float64(_FIX)).astype(np.int64)
        sums = np.zeros((k, E.shape[1]), np.int64)
        np.add.at(sums, a, q)
        live = np.bincount(a, minlength=k) > 0
        C[live] = _normalize(sums[live].astype(np.float64) / np.float64(_FIX))
    return E, C


def test_kmeans_assign_bit_exact(sf_dir):
    E, C = _oracle_centroids(sf_dir)
    ids = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"]
    )["vec_id"].to_numpy()
    a = np.argmax(_det_scores(E, C), axis=1)
    got = (
        semdedup.kmeans_embeddings(sf_dir, k=K, iters=ITERS)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["cluster"].to_numpy(), a[np.argsort(ids)])
    assert got["cluster"].nunique() > 1  # a real partition, not one blob


def test_semantic_dedup_bit_exact_and_chunking(sf_dir):
    E, C = _oracle_centroids(sf_dir)
    ids = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"]
    )["vec_id"].to_numpy()
    a = np.argmax(_det_scores(E, C), axis=1)
    kept = np.ones(len(ids), bool)
    order = np.lexsort((ids, a))
    for c in range(K):
        idx = order[a[order] == c]
        for j_pos in range(1, len(idx)):
            j = idx[j_pos]
            sims = np.round(_det_scores(E[j : j + 1], E[idx[:j_pos]]), 6)[0]
            if (sims >= THR).any():
                kept[j] = False
    expect = kept[np.argsort(ids)]
    got = (
        semdedup.semantic_dedup(sf_dir, k=K, iters=ITERS, threshold=THR)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["kept"].to_numpy(), expect)
    assert (~got["kept"]).sum() > 0  # the corpus has semantic near-dups
    # a tiny sweep chunk must not change the result (chunked column masks)
    got2 = (
        semdedup.semantic_dedup(
            sf_dir, k=K, iters=ITERS, threshold=THR, chunk=7
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got.equals(got2)


def test_semantic_dedup_exact_duplicates(tmp_path):
    """Exact duplicate vectors always collapse to the min id."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 8)).astype(np.float32)
    vecs = np.concatenate([base, base[:5]])  # ids 20..24 duplicate 0..4
    p = tmp_path / "emb"
    p.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(np.zeros(len(vecs), dtype=np.int32)),
            }
        ),
        p / "embeddings.parquet",
    )
    got = (
        semdedup.semantic_dedup(
            str(p), k=4, iters=3, threshold=0.999, sample_rows=25
        )
        .to_pandas()
        .set_index("vec_id")
    )
    for dup in range(20, 25):
        assert not got.loc[dup, "kept"]  # duplicate of a lower id
        assert got.loc[dup - 20, "kept"]
