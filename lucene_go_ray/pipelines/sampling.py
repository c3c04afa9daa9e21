"""Deterministic sampling stages for corpus curation.

Hash-rate sampling: a document is kept iff ``splitmix64(doc_id, seed) %
mod < rate * mod`` — the standard reproducible alternative to RNG-based
sampling for web-scale corpora (any worker, any run, any cluster size
makes the same keep/drop decision for a given id, so sampling composes
with resume/retry and with downstream joins). Stratified rates implement
the usual language/source re-balancing step of a training-data pipeline
(e.g. up-sample low-resource languages, down-sample boilerplate sources).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _mix


def stratified_sample(
    sf_dir: str,
    *,
    key: str = "doc_id",
    strat: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    seed: int = 13,
    mod: int = 10000,
):
    """Deterministic per-stratum rate sampling over the documents table.

    Keeps a doc iff ``_mix(key, seed) % mod < round(rate[stratum] * mod)``
    (missing/unknown strata use ``default_rate``). Entirely MAP-ONLY: the
    filter is a pure per-batch function of (id, stratum), so it runs at
    the read with zero exchanges and scales linearly. Returns
    (key, strat) rows of the sample.

    The DuckDB oracle replays the identical splitmix64 arithmetic
    (HUGEINT mod-2^64), so the sample is value-hash-checked, not just
    rate-checked."""
    import ray.data

    rates = {"en": 0.5, "fr": 0.3, "de": 0.2} if rates is None else rates
    strata = list(rates.keys())
    thresholds = np.array(
        [int(round(r * mod)) for r in rates.values()], dtype=np.int64
    )
    default_thr = int(round(default_rate * mod))

    def _f(batch: pa.Table) -> pa.Table:
        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = (_mix(ids, np.uint64(seed)) % np.uint64(mod)).astype(np.int64)
        idx = pc.index_in(
            batch[strat], value_set=pa.array(strata, type=pa.string())
        ).fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        thr = np.where(idx >= 0, thresholds[np.maximum(idx, 0)], default_thr)
        return batch.filter(pa.array(hv < thr)).select([key, strat])

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, strat]
    ).map_batches(_f, batch_format="pyarrow")
