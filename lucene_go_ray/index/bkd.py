"""Distributed BKD point-tree analogue: a k-d block index over N numeric
dimensions — the >2-D regime that per-segment zone maps don't cover
(1-D ranges / set membership / 2-D boxes stay on the doc-values zone-map
path, `search/searcher.py`).

Reference surfaces replicated (semantics, not code — the reference is an
in-process byte-packed tree, this is a partitioned parquet layout):

- recursive median split, choosing the split dimension by "prefer a
  dimension that has split < half as often as the most-split one, else
  the widest span" (`/root/reference/core/util/bkd/writerutils.go:221-259
  split()`), applied top-down exactly like the recursive writer
  (`/root/reference/core/util/bkd/writerbuild.go:18-90 build()`);
- bounded leaf cells (`maxPointsInLeafNode`,
  `/root/reference/core/util/bkd/config.go:21-107`);
- query-time cell relations CELL_INSIDE_QUERY / CELL_CROSSES_QUERY /
  CELL_OUTSIDE_QUERY with the inside-cell fast path that skips per-point
  comparison (`/root/reference/core/search/pointrangequery.go:130-150
  relate()`; the intersect recursion in
  `/root/reference/core/util/bkd/indextree.go` + `intersect_state.go`);
- inclusive lower AND upper bounds (PointRangeQuery contract).

Ray-native shape (the 100-TB plan):

- the split TREE is planned driver-side from a strided row-group sample
  (bounded memory: `sample_rows` points), thresholds = sample medians —
  the analogue of the reference's radix-select median partition
  (`radixselector.go`) without moving the data twice;
- every row is routed to its leaf in ONE vectorized `map_batches` pass
  (a depth-long sequence of numpy gathers — no per-row Python), then
  written hive-partitioned by `leaf`: one directory per leaf cell,
  resumable + prunable like the LSH/IVF layouts in `pipelines/ann.py`;
- per-leaf ACTUAL bounds are recovered from parquet row-group column
  statistics (footer reads only, zero data I/O) — the parquet footer IS
  the packed-value cell summary;
- a box query relates every leaf's actual bounds to the box on the
  driver (n_leaves is driver-bounded and tiny), reads CELL_INSIDE leaves
  with no per-point filter, exact-filters only CELL_CROSSES leaves, and
  never opens CELL_OUTSIDE directories.
"""

from __future__ import annotations

import json
import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# On-disk layout version (bump on layout changes so cached index dirs
# and tags never mix layouts): 2 = leaf-clustered write (sort before the
# hive write, file count <= leaves + blocks instead of blocks x leaves).
KD_LAYOUT_VERSION = 2

# Relation of a leaf cell's actual bounds to the query box
# (pointrangequery.go:130-150).
CELL_OUTSIDE = "outside"
CELL_CROSSES = "crosses"
CELL_INSIDE = "inside"

# config.go:107 DEFAULT_MAX_POINTS_IN_LEAF_NODE is 512 for the in-process
# tree; a parquet leaf DIRECTORY amortizes open/footer cost over far more
# rows, so the default block is bigger.
DEFAULT_LEAF_POINTS = 4096


@dataclass
class _PlanNode:
    dim: int  # split dimension (-1 for a leaf)
    thr: float  # split threshold: value <= thr goes left
    left: int
    right: int
    leaf: int  # leaf ordinal (-1 for internal nodes)


def _choose_split_dim(
    lo: np.ndarray, hi: np.ndarray, span: np.ndarray, parent_splits: np.ndarray
) -> int:
    """writerutils.go:221-259: prefer any dimension split less than half
    as often as the most-split one (provided it isn't constant here),
    else the widest span. Spans are normalized by the global sample span
    per dimension — the analogue of comparing fixed-width encoded byte
    spans when dimensions share a scale."""
    max_splits = int(parent_splits.max()) if len(parent_splits) else 0
    for d in range(len(lo)):
        if parent_splits[d] < max_splits // 2 and hi[d] > lo[d]:
            return d
    frac = (hi - lo) / np.where(span > 0, span, 1.0)
    return int(np.argmax(frac))


def _plan_tree(
    sample: np.ndarray, n_leaves: int
) -> tuple[list[_PlanNode], int]:
    """Recursive median-split plan over the sample (writerbuild.go:18-90).
    Returns (flat node list, n_leaves_actual). Leaves self-loop so the
    vectorized descent can run a fixed number of steps."""
    span = sample.max(axis=0) - sample.min(axis=0) if len(sample) else None
    nodes: list[_PlanNode] = []
    leaf_counter = 0

    def build(idx: np.ndarray, want_leaves: int, parent_splits: np.ndarray) -> int:
        nonlocal leaf_counter
        me = len(nodes)
        nodes.append(_PlanNode(-1, 0.0, me, me, -1))
        sub = sample[idx]
        lo, hi = (sub.min(axis=0), sub.max(axis=0)) if len(sub) else (None, None)
        if want_leaves <= 1 or len(sub) < 2 or lo is None or not (hi > lo).any():
            nodes[me] = _PlanNode(-1, 0.0, me, me, leaf_counter)
            leaf_counter += 1
            return me
        d = _choose_split_dim(lo, hi, span, parent_splits)
        vals = sub[:, d]
        thr = float(np.median(vals))
        if thr >= hi[d]:  # duplicate-heavy: median == max would empty the right
            below = vals[vals < hi[d]]
            thr = float(below.max()) if len(below) else float(lo[d])
        go_left = vals <= thr
        if not go_left.any() or go_left.all():
            nodes[me] = _PlanNode(-1, 0.0, me, me, leaf_counter)
            leaf_counter += 1
            return me
        # numLeftLeafNodes split like the reference: half the leaf budget
        # each side (median keeps point counts balanced)
        lw = max(1, want_leaves // 2)
        child_splits = parent_splits.copy()
        child_splits[d] += 1  # parentSplits[splitDim]++ (writerbuild.go:79)
        li = build(idx[go_left], lw, child_splits)
        ri = build(idx[~go_left], want_leaves - lw, child_splits)
        nodes[me] = _PlanNode(d, thr, li, ri, -1)
        return me

    if len(sample) == 0:
        nodes.append(_PlanNode(-1, 0.0, 0, 0, 0))
        leaf_counter = 1
    else:
        build(np.arange(len(sample)), max(1, n_leaves), np.zeros(sample.shape[1], np.int64))
    return nodes, leaf_counter


def _descend(nodes_arr: dict[str, np.ndarray], X: np.ndarray) -> np.ndarray:
    """Vectorized tree descent: route each row (of the (n, ndims) float
    matrix) to its leaf ordinal in depth gather steps, no per-row loop."""
    dim, thr = nodes_arr["dim"], nodes_arr["thr"]
    left, right, leaf = nodes_arr["left"], nodes_arr["right"], nodes_arr["leaf"]
    node = np.zeros(len(X), dtype=np.int64)
    # depth is bounded by the node count; leaves self-loop so extra steps
    # are no-ops and we can stop as soon as every row sits on a leaf
    for _ in range(len(dim)):
        on_leaf = leaf[node] >= 0
        if on_leaf.all():
            break
        d = np.where(on_leaf, 0, dim[node])
        vals = X[np.arange(len(X)), d]
        nxt = np.where(vals <= thr[node], left[node], right[node])
        node = np.where(on_leaf, node, nxt)
    return leaf[node]


def _nodes_to_arrays(nodes: list[_PlanNode]) -> dict[str, np.ndarray]:
    return {
        "dim": np.array([n.dim for n in nodes], np.int64),
        "thr": np.array([n.thr for n in nodes], np.float64),
        "left": np.array([n.left for n in nodes], np.int64),
        "right": np.array([n.right for n in nodes], np.int64),
        "leaf": np.array([n.leaf for n in nodes], np.int64),
    }


def _strided_sample(path: str, dims: tuple[str, ...], sample_rows: int, seed: int) -> np.ndarray:
    """Row-group-strided sample (bounded memory, unbiased on sorted or
    clustered inputs — same discipline as build_ivf_index)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    n_rg = pf.num_row_groups
    rng = np.random.default_rng(seed)
    rg_order = np.sort(rng.permutation(n_rg)[: max(1, min(n_rg, 64))])
    per_rg = max(1, sample_rows // len(rg_order))
    rows, got = [], 0
    for rg in rg_order:
        t = pf.read_row_group(int(rg), columns=list(dims))
        m = np.column_stack(
            [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in dims]
        )
        if len(m) > per_rg:
            stride = len(m) / per_rg
            m = m[(np.arange(per_rg) * stride).astype(np.int64)]
        rows.append(m)
        got += len(m)
        if got >= sample_rows:
            break
    return np.concatenate(rows)[:sample_rows] if rows else np.empty((0, len(dims)))


def _leaf_bounds_from_footers(cells_dir: str, dims: tuple[str, ...]) -> dict[int, dict]:
    """Recover per-leaf actual bounds from parquet row-group column
    statistics — footer reads only, no data I/O. The footer stats ARE the
    cell's packed min/max summary."""
    import pyarrow.parquet as pq

    leaf_dirs = {
        int(name.split("=", 1)[1]): os.path.join(cells_dir, name)
        for name in os.listdir(cells_dir)
        if name.startswith("leaf=")
    }

    def one(item):
        leaf, d = item
        lo = np.full(len(dims), np.inf)
        hi = np.full(len(dims), -np.inf)
        n = 0
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                n += g.num_rows
                for j, c in enumerate(dims):
                    st = g.column(names[c]).statistics
                    lo[j] = min(lo[j], float(st.min))
                    hi[j] = max(hi[j], float(st.max))
        return leaf, {"lo": lo.tolist(), "hi": hi.tolist(), "rows": n}

    with ThreadPoolExecutor(max_workers=16) as ex:
        return dict(ex.map(one, sorted(leaf_dirs.items())))


def build_kd_index(
    table_path: str,
    index_dir: str,
    *,
    dims: tuple[str, ...],
    payload_cols: tuple[str, ...],
    leaf_points: int = DEFAULT_LEAF_POINTS,
    sample_rows: int = 65536,
    seed: int = 42,
) -> str:
    """Build stage (run ONCE): plan the split tree on a strided sample,
    route every row to its leaf in one vectorized map pass, write
    hive-partitioned parquet (one directory per leaf cell), then read
    back per-leaf bounds from the footers. Atomic tmp+rename; an existing
    index built with the same params is reused, different params fail
    loudly (same contract as build_ivf_index)."""
    import pyarrow.parquet as pq
    import ray.data

    want = {
        "dims": list(dims),
        "payload_cols": list(payload_cols),
        "leaf_points": int(leaf_points),
        "sample_rows": int(sample_rows),
        "seed": int(seed),
        "layout": KD_LAYOUT_VERSION,
    }
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            have = json.load(f).get("params")
        if have is not None and have != want:
            raise ValueError(
                f"kd index at {index_dir} was built with {have}, requested "
                f"{want}; use a different index_dir or delete it"
            )
        return index_dir

    total_rows = pq.ParquetFile(table_path).metadata.num_rows
    n_leaves = max(1, -(-total_rows // leaf_points))
    sample = _strided_sample(table_path, dims, sample_rows, seed)
    nodes, n_leaves_actual = _plan_tree(sample, n_leaves)
    arrs = _nodes_to_arrays(nodes)

    def _route(batch: pa.Table) -> pa.Table:
        X = np.column_stack(
            [
                batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in dims
            ]
        )
        return batch.append_column("leaf", pa.array(_descend(arrs, X)))

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    cols = list(dict.fromkeys([*payload_cols, *dims]))  # prune at the read
    ds = ray.data.read_parquet(table_path, columns=cols)
    # Cluster by leaf BEFORE the partitioned write: without it every input
    # block writes one fragment into every leaf it touches — O(blocks x
    # leaves) tiny files (measured 9.7k files for 600k rows / 147 leaves,
    # and the box probe paid ~2.7k read tasks). The one-time sort is the
    # standard cluster-by-key step before a hive write; after it the file
    # count is <= leaves + output blocks.
    ds.map_batches(_route, batch_format="pyarrow").sort("leaf").write_parquet(
        os.path.join(tmp, "cells"), partition_cols=["leaf"]
    )
    bounds = _leaf_bounds_from_footers(os.path.join(tmp, "cells"), dims)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {
                "params": want,
                "dims": list(dims),
                "payload_cols": list(payload_cols),
                "n_leaves": int(n_leaves_actual),
                "total_rows": int(total_rows),
                "tree": {k: v.tolist() for k, v in arrs.items()},
                "leaf_bounds": {str(k): v for k, v in bounds.items()},
            },
            f,
        )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return index_dir


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def kd_box_plan(index_dir: str, lo, hi) -> dict:
    """Relate every leaf cell's ACTUAL bounds (footer stats) to the
    inclusive box [lo, hi] — pointrangequery.go:130-150 relate(). Returns
    {"inside": [leaf_dir...], "crosses": [...], "outside": n, ...}."""
    meta = _load_meta(index_dir)
    dims = meta["dims"]
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    if len(lo) != len(dims) or len(hi) != len(dims):
        raise ValueError(f"box must have {len(dims)} dims {dims}")
    inside, crosses, outside = [], [], 0
    for leaf, b in meta["leaf_bounds"].items():
        blo = np.asarray(b["lo"])
        bhi = np.asarray(b["hi"])
        d = os.path.join(index_dir, "cells", f"leaf={leaf}")
        if (bhi < lo).any() or (blo > hi).any():
            outside += 1
        elif (lo <= blo).all() and (bhi <= hi).all():
            inside.append(d)  # CELL_INSIDE: no per-point comparison needed
        else:
            crosses.append(d)
        # else CELL_OUTSIDE: directory never opened
    return {
        "dims": dims,
        "inside": sorted(inside),
        "crosses": sorted(crosses),
        "outside": outside,
        "n_leaves": int(meta["n_leaves"]),
        "payload_cols": meta["payload_cols"],
    }


def kd_box_query(
    index_dir: str, lo, hi, *, columns: list[str] | None = None
):
    """Inclusive N-dim box query against a persisted kd index: CELL_INSIDE
    leaves stream through unfiltered, CELL_CROSSES leaves get one
    vectorized exact filter, CELL_OUTSIDE leaves are never read. Returns a
    lazy Dataset of (payload_cols + dims) (or ``columns``)."""
    import ray.data

    plan = kd_box_plan(index_dir, lo, hi)
    dims = plan["dims"]
    cols = columns or list(dict.fromkeys([*plan["payload_cols"], *dims]))
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)

    def _exact(batch: pa.Table) -> pa.Table:
        keep = np.ones(len(batch), dtype=bool)
        for j, c in enumerate(dims):
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            keep &= (v >= lo[j]) & (v <= hi[j])
        return batch.filter(pa.array(keep)).select(cols)

    # push the box down as a parquet filter too: row groups inside a
    # crossing leaf get footer-pruned before the exact pass
    expr = None
    for j, c in enumerate(dims):
        e = (pc.field(c) >= pa.scalar(float(lo[j]))) & (
            pc.field(c) <= pa.scalar(float(hi[j]))
        )
        expr = e if expr is None else (expr & e)

    def _files(dirs: list[str]) -> list[str]:
        return [
            os.path.join(d, f)
            for d in dirs
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]

    parts = []
    if plan["inside"]:
        parts.append(ray.data.read_parquet(_files(plan["inside"]), columns=cols))
    if plan["crosses"]:
        parts.append(
            ray.data.read_parquet(
                _files(plan["crosses"]),
                columns=list(dict.fromkeys([*cols, *dims])),
                # row-group pruning INSIDE a crossing leaf: the box is
                # pushed to the parquet scanner so footer stats drop
                # non-overlapping row groups before any decode; the exact
                # vectorized pass below stays as the semantic guarantee
                filter=expr,
            ).map_batches(_exact, batch_format="pyarrow")
        )
    if not parts:
        return ray.data.from_arrow(
            pa.table({c: pa.array([], type=pa.float64()) for c in cols})
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def check_kd_index(
    index_dir: str, *, sample_rows_per_leaf: int = 64, seed: int = 0
) -> dict:
    """Offline kd-index integrity validation — the CheckIndex discipline
    (/root/reference/core/index/checkindex.go) for the point-tree layout:

    1. every leaf recorded in meta exists on disk and vice versa;
    2. per-leaf footer stats (recomputed) == the recorded leaf bounds,
       and summed leaf row counts == meta total_rows;
    3. routing invariant (sampled): rows read back from a leaf descend
       the stored split tree to that same leaf — a corrupted tree,
       doctored threshold, or misplaced file breaks this.

    Never raises on corruption; returns {"ok", "problems", "checked"}."""
    import pyarrow.parquet as pq

    problems: list[str] = []
    checked = {"leaves": 0, "rows_sampled": 0}
    try:
        meta = _load_meta(index_dir)
    except OSError:
        return {"ok": False, "problems": ["no meta.json"], "checked": checked}
    dims = tuple(meta["dims"])
    arrs = {
        k: np.asarray(v, np.float64 if k == "thr" else np.int64)
        for k, v in meta["tree"].items()
    }
    cells = os.path.join(index_dir, "cells")
    if not os.path.isdir(cells):
        return {
            "ok": False,
            "problems": ["cells directory missing"],
            "checked": checked,
        }
    on_disk = {
        int(n.split("=", 1)[1]) for n in os.listdir(cells) if n.startswith("leaf=")
    }
    recorded = {int(k) for k in meta["leaf_bounds"]}
    for leaf in sorted(recorded - on_disk):
        problems.append(f"leaf {leaf} recorded in meta but missing on disk")
    for leaf in sorted(on_disk - recorded):
        problems.append(f"leaf {leaf} on disk but absent from meta")
    fresh = _leaf_bounds_from_footers(cells, dims)
    total = 0
    rng = np.random.default_rng(seed)
    for leaf in sorted(on_disk & recorded):
        checked["leaves"] += 1
        b = meta["leaf_bounds"][str(leaf)]
        fb = fresh[leaf]
        total += fb["rows"]
        if (
            not np.allclose(b["lo"], fb["lo"], rtol=0, atol=0)
            or not np.allclose(b["hi"], fb["hi"], rtol=0, atol=0)
        ):
            problems.append(
                f"leaf {leaf}: recorded bounds {b['lo']}..{b['hi']} != "
                f"footer stats {fb['lo']}..{fb['hi']}"
            )
        d = os.path.join(cells, f"leaf={leaf}")
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        if not files:
            problems.append(f"leaf {leaf}: no parquet files")
            continue
        try:
            pf = pq.ParquetFile(
                os.path.join(d, files[int(rng.integers(len(files)))])
            )
            if pf.metadata.num_row_groups == 0:
                problems.append(f"leaf {leaf}: parquet file has no row groups")
                continue
            t = pf.read_row_group(
                int(rng.integers(pf.num_row_groups)), columns=list(dims)
            )
        except Exception as e:  # noqa: BLE001 — corruption surfaces here
            problems.append(
                f"leaf {leaf}: unreadable parquet ({type(e).__name__}: {e})"
            )
            continue
        X = np.column_stack(
            [
                t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in dims
            ]
        )
        if len(X) > sample_rows_per_leaf:
            X = X[
                np.sort(
                    rng.choice(len(X), size=sample_rows_per_leaf, replace=False)
                )
            ]
        checked["rows_sampled"] += len(X)
        routed = _descend(arrs, X)
        if (routed != leaf).any():
            bad = int((routed != leaf).sum())
            problems.append(
                f"leaf {leaf}: {bad}/{len(X)} sampled rows route to a "
                f"different leaf (tree/file mismatch)"
            )
    if total != int(meta["total_rows"]):
        problems.append(
            f"leaf row sum {total} != meta total_rows {meta['total_rows']}"
        )
    return {"ok": not problems, "problems": problems, "checked": checked}
