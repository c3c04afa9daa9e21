"""Multi-dimensional point queries over a persisted kd block index — the
pipeline face of `index/bkd.py` (the BKD tree analogue,
`/root/reference/core/util/bkd/` + `core/search/pointrangequery.go`).

The demo corpus is the `lineitem` table: 3 numeric dimensions
(l_quantity, l_extendedprice, l_discount) that zone maps can't serve
jointly — exactly the >2-D regime the reference builds BKD trees for."""

from __future__ import annotations

import hashlib
import os

from lucene_go_ray.index import bkd

KD_DIMS = ("l_quantity", "l_extendedprice", "l_discount")
KD_PAYLOAD = ("l_orderkey", "l_linenumber")


def _cached_kd_index(
    sf_dir: str,
    *,
    table: str = "lineitem",
    dims: tuple[str, ...] = KD_DIMS,
    payload_cols: tuple[str, ...] = KD_PAYLOAD,
    leaf_points: int = 4096,
    seed: int = 42,
) -> str:
    path = os.path.join(sf_dir, f"{table}.parquet")
    tag = hashlib.md5(
        f"kd{bkd.KD_LAYOUT_VERSION}:{os.path.abspath(path)}:"
        f"{os.path.getmtime(path)}:"
        f"{dims}:{payload_cols}:{leaf_points}:{seed}".encode()
    ).hexdigest()[:16]
    return bkd.build_kd_index(
        path,
        os.path.join("/tmp/lgr_kd_index", tag),
        dims=dims,
        payload_cols=payload_cols,
        leaf_points=leaf_points,
        seed=seed,
    )


def kd_box(sf_dir: str, lo, hi, **build_kw):
    """Inclusive 3-D box over lineitem via the kd index: plan → prune
    CELL_OUTSIDE leaves → stream CELL_INSIDE unfiltered → exact-filter
    CELL_CROSSES. Returns the matching (l_orderkey, l_linenumber, dims)
    rows as a pyarrow Table (driver-small: a box selects a slice)."""
    import pyarrow as pa
    import ray

    idx = _cached_kd_index(sf_dir, **build_kw)
    ds = bkd.kd_box_query(idx, lo, hi)
    out = pa.concat_tables(ray.get(ds.to_arrow_refs()), promote_options="default")
    # deterministic presentation order for humans; the gate hash is
    # order-insensitive anyway
    import pyarrow.compute as pc

    order = pc.sort_indices(
        out, sort_keys=[("l_orderkey", "ascending"), ("l_linenumber", "ascending")]
    )
    return out.take(order)


def kd_box_stats(sf_dir: str, lo, hi, **build_kw) -> dict:
    """Pruning evidence: leaf relation counts for a box."""
    idx = _cached_kd_index(sf_dir, **build_kw)
    plan = bkd.kd_box_plan(idx, lo, hi)
    return {
        "inside": len(plan["inside"]),
        "crosses": len(plan["crosses"]),
        "outside": plan["outside"],
        "n_leaves": plan["n_leaves"],
    }
