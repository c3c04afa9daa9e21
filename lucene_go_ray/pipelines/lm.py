"""N-gram language-model perplexity scoring — the CCNet quality signal
(Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data": score web documents by the perplexity of a small LM
trained on a clean reference corpus; low perplexity ~ well-formed prose).

The reference corpus is SMALL by construction (Wikipedia-scale against a
web-scale target), so the pipeline shape is:

  train   distributed pre-combined unigram/bigram counting over the
          reference docs (only distinct (hash, partial_count) rows cross
          the exchange), reduced once and broadcast via ``ray.put`` —
          the same small-side discipline as decontaminate;
  score   MAP-ONLY: each batch hashes its tokens, probes the broadcast
          count tables with vectorized searchsorted, and emits the doc's
          log10 perplexity. Zero shuffles over the corpus.

Model: interpolated bigram LM over lowercased whitespace tokens —
p(w|v) = LAMBDA * ML_bigram(w|v) + (1 - LAMBDA) * p_add(w), with
p_add(w) = (c(w) + ALPHA) / (N + ALPHA * (V + 1)) (add-ALPHA unigram with
one shared OOV bucket); the first token of a doc is scored by the
unigram alone. log10 perplexity = -(1/T) * sum log10 p. All constants
fixed so any run of any worker reproduces the same scores; the DuckDB
oracle recomputes the identical formula from gram STRINGS (the engine
counts 64-bit token hashes — a collision would fail the gate).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .dedup import _mix, _token_hashes

LAMBDA = 0.9  # bigram interpolation weight
ALPHA = 1.0  # add-alpha unigram smoothing


def _doc_token_hashes(batch: pa.Table, text: str):
    tok_h, counts = _token_hashes(batch[text])
    return tok_h, counts.astype(np.int64)


def _pair_keys(tok_h: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """64-bit keys of within-doc consecutive token pairs (doc-major)."""
    L = len(tok_h)
    if L < 2:
        return np.empty(0, np.uint64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    valid = doc_of[:-1] == doc_of[1:]
    with np.errstate(over="ignore"):
        keys = _mix(
            tok_h[:-1] * np.uint64(0x9E3779B97F4A7C15) ^ tok_h[1:],
            np.uint64(41),
        )
    return keys[valid]


def train_bigram_lm(
    sf_dir: str,
    *,
    key: str = "doc_id",
    text: str = "text",
    train_mod: int = 11,
    max_ngrams: int | None = None,
):
    """Unigram/bigram hash-count tables from the reference subset
    (docs with ``key % train_mod == 0``). Returns (sorted uni hashes,
    uni counts, N, V, sorted bi keys, bi counts) — all numpy.

    CONTRACT: the reference subset must be BOUNDED (CCNet trains its LM
    on Wikipedia, not on the crawl) — ``train_mod`` here is a
    deterministic stand-in selector for test tables; at real scale pass
    a selector that yields a fixed-size reference corpus, and/or set
    ``max_ngrams`` to prune each table to its top-``max_ngrams`` entries
    by (count desc, hash asc) after the reduce — the standard truncated-
    vocabulary LM (KenLM-style pruning; pruned entries score as unseen:
    ML-bigram 0 / add-alpha OOV). N and V are computed BEFORE pruning so
    the unigram denominator still reflects the full reference mass. The
    gate runs unpruned (max_ngrams=None) so the SQL oracle stays exact."""
    import ray.data

    path = os.path.join(sf_dir, "documents.parquet")

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch[key].to_numpy(zero_copy_only=False)
        tr = batch.filter(pa.array(ids % train_mod == 0))
        tok_h, counts = _doc_token_hashes(tr, text)
        uh, uc = np.unique(tok_h, return_counts=True)
        bk = _pair_keys(tok_h, counts)
        bh, bc = np.unique(bk, return_counts=True)
        return pa.table(
            {
                "h": pa.array(
                    np.concatenate([uh, bh]).astype(np.int64)
                ),
                "c": pa.array(np.concatenate([uc, bc]).astype(np.int64)),
                "is_bigram": pa.array(
                    np.concatenate(
                        [np.zeros(len(uh), bool), np.ones(len(bh), bool)]
                    )
                ),
            }
        )

    uni: dict = {}
    parts_u: list = []
    parts_c: list = []
    parts_b: list = []
    for b in (
        ray.data.read_parquet(path, columns=[key, text])
        .map_batches(_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        parts_u.append(b["h"].to_numpy(zero_copy_only=False))
        parts_c.append(b["c"].to_numpy(zero_copy_only=False))
        parts_b.append(b["is_bigram"].to_numpy(zero_copy_only=False))
    if parts_u:
        h = np.concatenate(parts_u).astype(np.uint64)
        c = np.concatenate(parts_c).astype(np.int64)
        isb = np.concatenate(parts_b)
    else:  # pragma: no cover - empty corpus
        h = np.empty(0, np.uint64)
        c = np.empty(0, np.int64)
        isb = np.empty(0, bool)

    def _reduce(hs, cs):
        order = np.argsort(hs, kind="stable")
        hs, cs = hs[order], cs[order]
        new = np.empty(len(hs), bool)
        new[:1] = True
        new[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(cs, starts) if len(hs) else cs
        return hs[starts], tot

    uh, uc = _reduce(h[~isb], c[~isb])
    bh, bc = _reduce(h[isb], c[isb])
    N, V = int(uc.sum()), int(len(uh))
    if max_ngrams is not None:

        def _prune(hs, cs):
            if len(hs) <= max_ngrams:
                return hs, cs
            order = np.lexsort((hs, -cs))[:max_ngrams]
            keep = np.sort(order)  # back to hash order for searchsorted
            return hs[keep], cs[keep]

        uh, uc = _prune(uh, uc)
        bh, bc = _prune(bh, bc)
    return uh, uc, N, V, bh, bc


def lm_perplexity(
    sf_dir: str,
    *,
    key: str = "doc_id",
    text: str = "text",
    train_mod: int = 11,
    max_ngrams: int | None = None,
):
    """(doc_id, n_tokens, log10_ppl) for EVERY document, where log10_ppl
    is the interpolated-bigram LM log10 perplexity under the reference
    subset's counts, rounded to 6 decimals (the gate's float discipline).
    ``max_ngrams`` prunes the broadcast tables (see train_bigram_lm).
    """
    import ray
    import ray.data

    uh, uc, N, V, bh, bc = train_bigram_lm(
        sf_dir, key=key, text=text, train_mod=train_mod,
        max_ngrams=max_ngrams,
    )
    model_ref = ray.put((uh, uc.astype(np.float64), bh, bc.astype(np.float64)))
    denom = float(N + ALPHA * (V + 1))

    def _lookup(sorted_keys, values, probe):
        idx = np.searchsorted(sorted_keys, probe)
        idx_c = np.minimum(idx, len(sorted_keys) - 1) if len(sorted_keys) else idx
        hit = (
            (idx < len(sorted_keys)) & (sorted_keys[idx_c] == probe)
            if len(sorted_keys)
            else np.zeros(len(probe), bool)
        )
        out = np.zeros(len(probe), np.float64)
        out[hit] = values[idx_c[hit]]
        return out

    def _score(batch: pa.Table) -> pa.Table:
        s_uh, s_uc, s_bh, s_bc = ray.get(model_ref)
        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tok_h, counts = _doc_token_hashes(batch, text)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        cu = _lookup(s_uh, s_uc, tok_h)
        p_add = (cu + ALPHA) / denom
        # bigram ML for positions i >= 1 within a doc
        p = p_add.copy()
        if len(tok_h) >= 2:
            valid = doc_of[:-1] == doc_of[1:]
            cb = _lookup(s_bh, s_bc, _pair_keys(tok_h, counts))
            cctx = cu[:-1][valid]
            ml = np.divide(
                cb, cctx, out=np.zeros_like(cb), where=cctx > 0
            )
            tgt = np.flatnonzero(np.concatenate([[False], valid]))
            p[tgt] = LAMBDA * ml + (1 - LAMBDA) * p_add[tgt]
        logp = np.log10(p)
        sums = np.zeros(len(counts), np.float64)
        np.add.at(sums, doc_of, logp)
        lp = np.round(-sums / np.maximum(counts, 1), 6)
        return pa.table(
            {
                key: pa.array(ids),
                "n_tokens": pa.array(counts),
                "log10_ppl": pa.array(lp, type=pa.float64()),
            }
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
    ).map_batches(_score, batch_format="pyarrow")
