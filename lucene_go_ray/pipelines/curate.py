"""End-to-end corpus curation: the composition a training-data pipeline
actually runs — quality filters → exact dedup → (optional) tombstone
exclusion → partitioned, resumable Parquet output.

Shape notes (100 TB discipline):
- quality signals are computed inside ``map_batches`` (vectorized, column-
  pruned read) and the filter applies immediately, so rejected docs never
  reach the shuffle;
- dedup moves only (content_hash, doc_id) pairs — text bytes stay in the
  read stage; the survivor set joins back as a semi-join instead of
  re-shipping text through the groupby;
- output is hive-partitioned by input shard (``part=`` directories), one
  directory per source block, so a re-run can skip finished partitions
  and no single giant file is ever produced.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _FNV_OFFSET, _mix, _token_hashes


def _quality_filter_batch(
    batch: pa.Table,
    *,
    min_chars: int,
    max_chars: int,
    min_tokens: int,
    max_stopword_ratio: float,
    stop_list: tuple,
    max_top2gram_frac: float | None = None,
    max_top3gram_frac: float | None = None,
    max_dup5gram_frac: float | None = None,
) -> pa.Table:
    """(doc_id, text, content_hash) for docs passing the quality gates."""
    from ..analysis import GO_WHITESPACE_CLASS
    from .textstats import _ngram_char_coverage

    s = batch["text"].cast(pa.large_string())
    n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern_regex(s, GO_WHITESPACE_CLASS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    flat = pc.utf8_lower(pc.list_flatten(toks))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_of = np.repeat(np.arange(len(counts)), counts)
    is_stop = pc.is_in(
        flat, value_set=pa.array(list(stop_list), type=pa.large_string())
    ).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(doc_of, weights=is_stop, minlength=len(counts))
    ratio = n_stop / np.maximum(counts, 1)
    keep = (
        (n_chars >= min_chars)
        & (n_chars <= max_chars)
        & (counts >= min_tokens)
        & (np.round(ratio, 6) <= max_stopword_ratio)
    )
    # Gopher repetition gates (Rae et al. 2021 app. A1.1), as fractions
    # of n_chars; same rounding discipline as the stopword gate
    for thr, n, mode in (
        (max_top2gram_frac, 2, "top"),
        (max_top3gram_frac, 3, "top"),
        (max_dup5gram_frac, 5, "dup"),
    ):
        if thr is not None:
            cov = _ngram_char_coverage(flat, doc_of, len(counts), n, mode)
            frac = cov / np.maximum(n_chars, 1)
            keep &= np.round(frac, 6) <= thr
    kept = batch.filter(pa.array(keep))
    # content hash over kept docs only (the dedup key; exact_dedup_hashed
    # semantics: order-sensitive fold of token hashes)
    tok_h, kcounts = _token_hashes(kept["text"])
    kdoc = np.repeat(np.arange(len(kcounts)), kcounts)
    acc = np.full(len(kcounts), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        np.multiply.at(acc, kdoc, np.uint64(31))
        np.bitwise_xor.at(acc, kdoc, _mix(tok_h, np.uint64(7)))
    return pa.table(
        {
            "doc_id": kept["doc_id"],
            "content_hash": pa.array(acc.astype(np.int64)),
        }
    )


def curate(
    sf_dir: str,
    out_dir: str | None = None,
    *,
    min_chars: int = 50,
    max_chars: int = 1_000_000,
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.6,
    max_top2gram_frac: float | None = None,
    max_top3gram_frac: float | None = None,
    max_dup5gram_frac: float | None = None,
    near_dup_threshold: float | None = None,
    near_dup_k: int = 3,
    out_partitions: int = 64,
):
    """Surviving doc_ids after quality filters + exact dedup (keep the
    smallest doc_id per content hash). With ``out_dir``, also writes the
    curated corpus as partitioned parquet and still returns the survivor
    Dataset.

    The ``max_*gram_frac`` knobs (off by default) add the Gopher
    repetition gates (Rae et al. 2021): drop docs whose most-frequent
    2-/3-gram or duplicated-5-gram char coverage exceeds the given
    fraction of n_chars (paper defaults: 0.20 / 0.18 / 0.10).

    ``near_dup_threshold`` (off by default) adds NEAR-duplicate removal
    on top of the exact dedup: jaccard k-gram pairs -> connected
    components (dedup.near_dup_clusters); every cluster member except
    the min-doc_id representative is dropped. Clusters are a property of
    the TEXT — computed over the full corpus, so duplicated content is
    removed even when its canonical copy was itself quality-rejected.
    The cluster loser ids are pair-graph-sized (tiny), broadcast like
    the exact-dup loser set; the survivor filter stays map-only.

    The write path is a BROADCAST semi-join, never a shuffle join of the
    full corpus: quality gates are pure per-batch functions, so the
    re-read re-applies them map-only; the only state needed is the
    DUP-LOSER id set (docs whose content_hash has a smaller doc_id) —
    the small complement of the survivor set, 8 bytes per duplicate —
    published once via ``ray.put`` and probed with a vectorized
    membership test in every write task. Text bytes therefore cross no
    exchange at all. (At extreme duplicate rates swap the sorted array
    for a bloom filter; the plan shape is unchanged.)"""
    import ray
    import ray.data
    from ray.data.aggregate import Min

    from ..index.config import IndexConfig

    stops = IndexConfig().stop_words
    path = os.path.join(sf_dir, "documents.parquet")

    gates = dict(
        min_chars=min_chars,
        max_chars=max_chars,
        min_tokens=min_tokens,
        max_stopword_ratio=max_stopword_ratio,
        stop_list=stops,
        max_top2gram_frac=max_top2gram_frac,
        max_top3gram_frac=max_top3gram_frac,
        max_dup5gram_frac=max_dup5gram_frac,
    )

    def _f(batch: pa.Table) -> pa.Table:
        return _quality_filter_batch(batch, **gates)

    # near-dup cluster losers (doc_id != cluster representative): a
    # pair-graph-sized id set, collected once and merged into the same
    # broadcast/membership machinery as the exact-dup losers
    nd_losers = np.empty(0, dtype=np.int64)
    if near_dup_threshold is not None:
        from .dedup import near_dup_clusters

        cc = near_dup_clusters(
            sf_dir, threshold=near_dup_threshold, k=near_dup_k
        )

        def _nd_losers(batch: pa.Table) -> pa.Table:
            keep = pc.not_equal(
                batch["doc_id"].combine_chunks(),
                batch["cluster_id"].combine_chunks(),
            )
            return batch.filter(keep).select(["doc_id"])

        nd_losers = np.sort(
            np.concatenate(
                [
                    b["doc_id"].to_numpy(zero_copy_only=False)
                    for b in cc.map_batches(
                        _nd_losers, batch_format="pyarrow"
                    ).iter_batches(batch_format="pyarrow")
                ]
                + [np.empty(0, np.int64)]
            )
        )

    def _drop_members(ds, drop_ref):
        def _filter(batch: pa.Table) -> pa.Table:
            drop = ray.get(drop_ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(drop, ids, side="left")
            hi = np.searchsorted(drop, ids, side="right")
            return batch.filter(pa.array(lo == hi))

        return ds.map_batches(_filter, batch_format="pyarrow")

    hashed = ray.data.read_parquet(
        path, columns=["doc_id", "text"]
    ).map_batches(_f, batch_format="pyarrow")
    if out_dir is None:
        surv = (
            hashed.groupby("content_hash")
            .aggregate(Min("doc_id", alias_name="doc_id"))
            .select_columns(["doc_id"])
        )
        if near_dup_threshold is None:
            return surv
        return _drop_members(surv, ray.put(nd_losers))

    # one (hash, id) exchange produces BOTH outputs: per-group survivor
    # (min doc_id) and the loser ids
    def _split_group(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        lo = ids.min()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "is_loser": pa.array(ids != lo),
            }
        )

    marked = (
        hashed.groupby("content_hash")
        .map_groups(_split_group, batch_format="pyarrow")
        .materialize()
    )
    # reduce to the loser ids DISTRIBUTED (workers drop the survivor
    # rows); only the small loser stream ever reaches the driver
    def _losers_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["is_loser"].combine_chunks()).select(
            ["doc_id"]
        )

    losers = np.unique(
        np.concatenate(
            [
                b["doc_id"].to_numpy(zero_copy_only=False)
                for b in marked.map_batches(
                    _losers_only, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            ]
            + [np.empty(0, np.int64), nd_losers]
        )
    )
    losers_ref = ray.put(losers)

    def _write_filter(batch: pa.Table) -> pa.Table:
        drop = ray.get(losers_ref)  # zero-copy object-store read
        kept = _quality_filter_batch(batch, **gates)
        ids = kept["doc_id"].to_numpy(zero_copy_only=False)
        # sorted-array membership: idx bounds differ exactly for present ids
        a = np.searchsorted(drop, ids, side="left")
        b = np.searchsorted(drop, ids, side="right")
        keep_ids = ids[a == b]
        out = batch.filter(pc.is_in(batch["doc_id"], pa.array(keep_ids)))
        part = pc.bit_wise_and(out["doc_id"], out_partitions - 1)
        return out.append_column("part", part.cast(pa.int32()))

    ray.data.read_parquet(path).map_batches(
        _write_filter, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["part"])

    # the returned survivor stream reuses the SAME broadcast loser set as
    # the write path (exact-dup losers are already absent via is_loser;
    # the membership probe removes the nd-cluster members) — one ray.put,
    # one map pass, no second broadcast
    def _survivors_only(batch: pa.Table) -> pa.Table:
        keep = pc.invert(batch["is_loser"].combine_chunks())
        t = batch.filter(keep).select(["doc_id"])
        drop = ray.get(losers_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(drop, ids, side="left")
        hi = np.searchsorted(drop, ids, side="right")
        return t.filter(pa.array(lo == hi))

    return marked.map_batches(_survivors_only, batch_format="pyarrow")
