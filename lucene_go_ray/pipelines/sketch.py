"""Distributed cardinality sketching — HyperLogLog (Flajolet, Fusy,
Gandouet, Meunier 2007) over the term space. The canonical mergeable
sketch: per-batch register MAXIMA (2^p bytes) merge by elementwise max,
which is associative and commutative, so the estimate is bit-identical
at any batching, task order, or cluster size — the same determinism
argument as semdedup's fixed-point partial sums. One streaming pass,
O(2^p) bytes of reduced state, no exchange at all.

Hashing is the repo's stable splitmix64-over-FNV family (dedup._mix), so
runs are reproducible across processes. Estimator: the original paper's
bias-corrected harmonic mean with the small-range linear-counting and
large-range corrections.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .dedup import _mix, _token_hashes


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _registers_for(hashes: np.ndarray, p: int) -> np.ndarray:
    """2^p uint8 registers from 64-bit hashes: bucket = top p bits,
    rho = leading-zero count of the remaining 64-p bits + 1."""
    if p < 12:
        raise ValueError("p >= 12 required (frexp exactness bound)")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    bucket = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rem = hashes & np.uint64((1 << (64 - p)) - 1)
    # exact bit-length via frexp (rem < 2^52 for p >= 12: exact in float64)
    _, expo = np.frexp(rem.astype(np.float64))
    rho = ((64 - p) - expo + 1).astype(np.uint8)  # rem==0 -> expo 0 -> max
    np.maximum.at(regs, bucket, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    E = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if E <= 2.5 * m and zeros:  # small-range: linear counting
        return m * float(np.log(m / zeros))
    if E > (1 << 64) / 30.0:  # large-range correction
        return -(2.0**64) * float(np.log1p(-E / 2.0**64))
    return float(E)


def hll_distinct_terms(
    sf_dir: str,
    *,
    key: str = "doc_id",
    text: str = "text",
    p: int = 12,
):
    """1-row table (estimate, m): approximate distinct-term count of the
    corpus. Relative standard error ~= 1.04 / sqrt(2^p)."""
    import ray.data

    path = os.path.join(sf_dir, "documents.parquet")
    m = 1 << p

    def _partial(batch: pa.Table) -> pa.Table:
        tok_h, _ = _token_hashes(batch[text])
        regs = _registers_for(_mix(tok_h, np.uint64(47)), p)
        return pa.table(
            {"regs": pa.array([regs.tobytes()], type=pa.large_binary())}
        )

    merged = np.zeros(m, dtype=np.uint8)
    for b in (
        ray.data.read_parquet(path, columns=[text])
        .map_batches(_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for buf in b["regs"].to_pylist():
            np.maximum(
                merged, np.frombuffer(buf, dtype=np.uint8), out=merged
            )
    return pa.table(
        {
            "estimate": pa.array(
                [round(hll_estimate(merged), 6)], pa.float64()
            ),
            "m": pa.array([m], pa.int64()),
        }
    )
