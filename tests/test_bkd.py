"""kd block index (the BKD point-tree analogue, index/bkd.py) vs a
brute-force scan: exact result sets for random boxes, cell relations
(inside / crosses / outside), pruning evidence, and build-contract
checks (param mismatch, reuse)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index import bkd

DIMS = ("x", "y", "z")
N = 4000


@pytest.fixture(scope="module")
def table_path(tmp_path_factory):
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("kdsrc")
    p = str(d / "pts.parquet")
    t = pa.table(
        {
            "id": pa.array(np.arange(N, dtype=np.int64)),
            # x clustered (sorted-ish), y uniform, z heavy duplicates —
            # exercises the strided sample, the widest-span choice and
            # the duplicate-median guard
            "x": pa.array(np.sort(rng.normal(0, 100, N))),
            "y": pa.array(rng.uniform(-50, 50, N)),
            "z": pa.array(rng.integers(0, 5, N).astype(np.float64)),
        }
    )
    pq.write_table(t, p, row_group_size=256)
    return p


@pytest.fixture(scope="module")
def built(table_path, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("kdidx") / "kd")
    bkd.build_kd_index(
        table_path, idx, dims=DIMS, payload_cols=("id",), leaf_points=256,
        sample_rows=2048,
    )
    t = pq.read_table(table_path)
    X = np.column_stack([t[c].to_numpy() for c in DIMS])
    ids = t["id"].to_numpy()
    return idx, X, ids


def _brute(X, ids, lo, hi):
    keep = np.ones(len(X), dtype=bool)
    for j in range(X.shape[1]):
        keep &= (X[:, j] >= lo[j]) & (X[:, j] <= hi[j])
    return set(ids[keep].tolist())


def _query_ids(idx, lo, hi):
    df = bkd.kd_box_query(idx, lo, hi, columns=["id"]).to_pandas()
    # an all-pruned read yields an empty frame with no schema
    return set() if len(df) == 0 else set(df["id"].tolist())


def test_random_boxes_exact(built):
    idx, X, ids = built
    rng = np.random.default_rng(11)
    for _ in range(12):
        a = X[rng.integers(0, len(X))]
        b = X[rng.integers(0, len(X))]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        assert _query_ids(idx, lo, hi) == _brute(X, ids, lo, hi)


def test_whole_space_is_inside_cells(built):
    """A box covering everything relates every leaf CELL_INSIDE — the
    no-per-point-comparison fast path (pointrangequery.go relate)."""
    idx, X, ids = built
    lo = X.min(axis=0)
    hi = X.max(axis=0)
    plan = bkd.kd_box_plan(idx, lo, hi)
    assert plan["outside"] == 0 and not plan["crosses"]
    assert len(plan["inside"]) >= 2
    assert _query_ids(idx, lo, hi) == set(ids.tolist())


def test_small_box_prunes_leaves(built):
    """A tight box must leave most leaf directories unopened."""
    idx, X, ids = built
    c = np.median(X, axis=0)
    eps = (X.max(axis=0) - X.min(axis=0)) * 0.02 + 1e-9
    lo, hi = c - eps, c + eps
    plan = bkd.kd_box_plan(idx, lo, hi)
    opened = len(plan["inside"]) + len(plan["crosses"])
    assert plan["n_leaves"] >= 8
    assert opened < plan["n_leaves"] / 2, plan
    assert _query_ids(idx, lo, hi) == _brute(X, ids, lo, hi)


def test_empty_box(built):
    idx, X, ids = built
    lo = X.max(axis=0) + 1.0
    hi = lo + 1.0
    plan = bkd.kd_box_plan(idx, lo, hi)
    assert not plan["inside"] and not plan["crosses"]
    assert _query_ids(idx, lo, hi) == set()


def test_param_mismatch_fails_loudly(built, table_path):
    idx, _, _ = built
    with pytest.raises(ValueError, match="built with"):
        bkd.build_kd_index(
            table_path, idx, dims=DIMS, payload_cols=("id",), leaf_points=512,
            sample_rows=2048,
        )


def test_reuse_existing(built, table_path):
    idx, _, _ = built
    marker = os.path.getmtime(os.path.join(idx, "meta.json"))
    out = bkd.build_kd_index(
        table_path, idx, dims=DIMS, payload_cols=("id",), leaf_points=256,
        sample_rows=2048,
    )
    assert out == idx
    assert os.path.getmtime(os.path.join(idx, "meta.json")) == marker


def test_bad_box_dims(built):
    idx, _, _ = built
    with pytest.raises(ValueError, match="dims"):
        bkd.kd_box_plan(idx, (0.0, 0.0), (1.0, 1.0))


def test_check_kd_index_clean_and_corrupted(tmp_path, built):
    """check_kd_index: clean index validates; a doctored split threshold
    breaks the sampled routing invariant; a doctored recorded bound
    breaks the footer-stats reconciliation."""
    import json
    import shutil

    from lucene_go_ray.index.bkd import check_kd_index

    idx, _, _ = built
    res = check_kd_index(idx)
    assert res["ok"], res["problems"][:5]
    assert res["checked"]["leaves"] > 1
    assert res["checked"]["rows_sampled"] > 0

    d = str(tmp_path / "kd_doctored")
    shutil.copytree(idx, d)
    mpath = os.path.join(d, "meta.json")
    meta = json.load(open(mpath))
    # find an internal node (leaf == -1) and shift its threshold hard
    i = meta["tree"]["leaf"].index(-1)
    meta["tree"]["thr"][i] = meta["tree"]["thr"][i] + 1e9
    with open(mpath, "w") as f:
        json.dump(meta, f)
    res = check_kd_index(d)
    assert not res["ok"]
    assert any("route to a different leaf" in p for p in res["problems"]), (
        res["problems"][:5]
    )

    d2 = str(tmp_path / "kd_doctored_bounds")
    shutil.copytree(idx, d2)
    mpath = os.path.join(d2, "meta.json")
    meta = json.load(open(mpath))
    leaf0 = next(iter(meta["leaf_bounds"]))
    meta["leaf_bounds"][leaf0]["hi"][0] += 123.0
    with open(mpath, "w") as f:
        json.dump(meta, f)
    res = check_kd_index(d2)
    assert not res["ok"]
    assert any("footer stats" in p for p in res["problems"]), res["problems"][:5]

    # a lost cells/ subtree reports instead of raising (never-raises contract)
    d3 = str(tmp_path / "kd_no_cells")
    shutil.copytree(idx, d3)
    shutil.rmtree(os.path.join(d3, "cells"))
    res = check_kd_index(d3)
    assert not res["ok"]
    assert res["problems"] == ["cells directory missing"]


def test_check_kd_cli(built):
    import json
    import subprocess
    import sys

    idx, _, _ = built
    r = subprocess.run(
        [sys.executable, "-m", "lucene_go_ray.cli", "check-kd", idx,
         "--sample", "8"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout)["ok"]
