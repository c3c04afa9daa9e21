"""Text-analysis pipelines: token counting, quality scoring, language ID,
document fingerprinting — the per-document curation signals a training-data
pipeline computes alongside indexing. All vectorized map_batches stages."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import GO_WHITESPACE_CLASS
from .dedup import _mix, _shingle_hashes, _token_hashes

_STOP_LIST = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()


def token_counts(sf_dir: str, key: str = "doc_id", text: str = "text"):
    """(key, n_tokens) — raw whitespace-scanner token count (empties incl.)."""
    import ray.data

    def _f(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            batch[text].cast(pa.large_string()), GO_WHITESPACE_CLASS
        )
        return pa.table(
            {key: batch[key], "n_tokens": pc.list_value_length(toks).cast(pa.int64())}
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
    )
    return ds.map_batches(_f, batch_format="pyarrow")


def _ngram_char_coverage(
    flat: pa.Array, doc_of: np.ndarray, ndocs: int, n: int, mode: str
) -> np.ndarray:
    """Per-doc n-gram character-coverage counts over lowercased
    whitespace tokens — the Gopher repetition-filter signals (Rae et
    al. 2021, app. A1.1), kept as EXACT integer char counts so the SQL
    oracle matches bit-for-bit (callers divide by n_chars for the
    paper's fractions). A gram's coverage is count * len(gram string,
    tokens joined by one space); overlapping occurrences are counted
    independently (both sides of the gate use the same convention).

    mode="top": max coverage over the doc's grams (the most-repeated
    n-gram's share — no tie-break needed since the max is over the
    product). mode="dup": summed coverage of grams occurring >= 2 times
    (duplicate-n-gram share). Vectorized: one dictionary-encode + one
    np.unique over packed (doc, gram) keys per batch — no per-doc loop."""
    out = np.zeros(ndocs, dtype=np.int64)
    L = len(flat)
    if L < n:
        return out
    parts = [flat.slice(i, L - n + 1) for i in range(n)]
    valid = doc_of[: L - n + 1] == doc_of[n - 1 :]
    if not valid.any():
        return out
    gram = pc.binary_join_element_wise(
        *parts, pa.scalar(" ", type=pa.large_string())
    )
    gram = gram.combine_chunks() if isinstance(gram, pa.ChunkedArray) else gram
    gram = gram.filter(pa.array(valid))
    gdoc = doc_of[: L - n + 1][valid].astype(np.int64)
    denc = gram.dictionary_encode()
    glen = (
        pc.utf8_length(denc.dictionary)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    D = np.int64(len(denc.dictionary))
    uk, cnt = np.unique(gdoc * D + codes, return_counts=True)
    dk = (uk // D).astype(np.int64)
    cov = cnt.astype(np.int64) * glen[(uk % D).astype(np.int64)]
    if mode == "top":
        np.maximum.at(out, dk, cov)
    else:  # dup: grams appearing at least twice
        m = cnt >= 2
        np.add.at(out, dk[m], cov[m])
    return out


def text_quality(sf_dir: str, key: str = "doc_id", text: str = "text"):
    """Per-doc quality signals: (key, n_chars, n_tokens, n_unique_terms,
    stopword_ratio, top2gram_chars, top3gram_chars, dup5gram_chars) —
    the usual web-text quality filters (length, lexical diversity,
    stopword density) plus the Gopher repetition filters (most-frequent
    2-/3-gram char coverage, duplicated-5-gram char coverage; Rae et
    al. 2021), all SQL-checkable."""
    import ray.data

    stop_arr = pa.array(_STOP_LIST, type=pa.large_string())

    def _f(batch: pa.Table) -> pa.Table:
        s = batch[text].cast(pa.large_string())
        toks = pc.split_pattern_regex(s, GO_WHITESPACE_CLASS)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.utf8_lower(pc.list_flatten(toks))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        is_stop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(doc_of, weights=is_stop, minlength=len(counts))
        # unique terms per doc via sorted (doc, term-dictionary-id) runs
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keys64 = doc_of.astype(np.int64) * (np.int64(len(denc.dictionary)) + 1) + codes
        uniq_keys = np.unique(keys64)
        n_uniq = np.bincount(
            (uniq_keys // (np.int64(len(denc.dictionary)) + 1)).astype(np.int64),
            minlength=len(counts),
        )
        ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
        ndocs = len(counts)
        return pa.table(
            {
                key: batch[key],
                "n_chars": pc.utf8_length(s).cast(pa.int64()),
                "n_tokens": pa.array(n_tokens.astype(np.int64)),
                "n_unique_terms": pa.array(n_uniq.astype(np.int64)),
                "stopword_ratio": pa.array(np.round(ratio, 6)),
                "top2gram_chars": pa.array(
                    _ngram_char_coverage(flat, doc_of, ndocs, 2, "top")
                ),
                "top3gram_chars": pa.array(
                    _ngram_char_coverage(flat, doc_of, ndocs, 3, "top")
                ),
                "dup5gram_chars": pa.array(
                    _ngram_char_coverage(flat, doc_of, ndocs, 5, "dup")
                ),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
    )
    return ds.map_batches(_f, batch_format="pyarrow")


def language_id(sf_dir: str, key: str = "doc_id", text: str = "text"):
    """(key, lang_pred, lang_score) via the byte-trigram Naive Bayes
    classifier (pipelines/langid.py — model built once per actor)."""
    from .langid import language_id as _lid

    return _lid(sf_dir, key, text)


def fingerprints(
    sf_dir: str,
    key: str = "doc_id",
    text: str = "text",
    window: int = 4,
    keep: int = 8,
):
    """Winnowing-style document fingerprints: the ``keep`` smallest
    ``window``-gram rolling hashes per doc (Schleimer et al. winnowing,
    public algorithm), as (key, fp0..fp{keep-1}) int64 columns."""
    import ray.data

    def _f(batch: pa.Table) -> pa.Table:
        tok_h, counts = _token_hashes(batch[text])
        sh, sh_counts = _shingle_hashes(tok_h, counts, window)
        n = len(counts)
        doc_of = np.repeat(np.arange(n), sh_counts)
        hv = _mix(sh, np.uint64(99))
        out = np.full((n, keep), np.iinfo(np.int64).max, dtype=np.int64)
        order = np.lexsort((hv, doc_of))
        hv_s, doc_s = hv[order], doc_of[order]
        starts = np.searchsorted(doc_s, np.arange(n))
        # vectorized "first `keep` of each doc's sorted hash run": rank of
        # each row within its doc, scatter the rank<keep rows — no per-doc
        # Python loop (the batch is one fancy-indexed assignment)
        rank = np.arange(len(doc_s)) - starts[doc_s]
        sel = rank < keep
        out[doc_s[sel], rank[sel]] = (hv_s[sel] >> np.uint64(1)).astype(
            np.int64
        )
        cols = {key: batch[key]}
        for i in range(keep):
            cols[f"fp{i}"] = pa.array(out[:, i])
        return pa.table(cols)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
    )
    return ds.map_batches(_f, batch_format="pyarrow")


# GPT-2-style pre-tokenizer (contractions | space?+letters | space?+digits |
# space?+punct-run | whitespace-run), RE2 syntax so the EXACT same pattern
# runs in pyarrow (count_substring_regex) and DuckDB (regexp_extract_all) —
# the "BPE-ish regex" token estimate of LLM data pipelines. The lookahead
# of the original GPT-2 pattern is dropped (RE2 has none); counts differ
# from tiktoken only on multi-space runs before tokens.
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\pL+| ?\pN+| ?[^\s\pL\pN]+|\s+"


def bpe_token_counts(sf_dir: str, key: str = "doc_id", text: str = "text"):
    """(key, n_bpe_tokens) — vectorized BPE-ish pre-tokenizer match count
    (an LLM token-budget estimator that needs no vocabulary; one regex
    scan per batch, map-only)."""
    import ray.data

    def _f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: batch[key],
                "n_bpe_tokens": pc.count_substring_regex(
                    batch[text].cast(pa.large_string()), BPE_ISH_PATTERN
                ).cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
    )
    return ds.map_batches(_f, batch_format="pyarrow")


def top_ngrams(
    sf_dir: str,
    *,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
    k: int = 100,
    num_buckets: int = 64,
):
    """Global top-k most frequent token n-grams — corpus-level LM/repetition
    statistics (the aggregate behind boilerplate discovery and smoothing
    tables). The textbook pre-combined wide aggregation:

      map_batches: dictionary-encode the batch's grams and emit only
        DISTINCT (gram, partial_count) rows — the exchange never sees
        per-occurrence rows;
      groupby(hash bucket): sum partials per gram and keep the bucket's
        top-k (buckets partition the gram space, so no cross-bucket gram
        can outrank a bucket-local top-k survivor);
      sort(cnt desc, gram asc).limit(k): a k·num_buckets-row final merge.

    Gram strings ride the exchange (the SQL oracle groups the same
    strings); bucket routing uses the FNV window hashes so routing cost
    stays integer-only."""
    import os

    import ray.data

    from .dedup import _exact_shingle_hashes, _mix, _token_hashes

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[text].cast(pa.large_string())
        toks = pc.split_pattern_regex(s, GO_WHITESPACE_CLASS)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        flat = pc.utf8_lower(pc.list_flatten(toks))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_of = np.repeat(np.arange(len(counts)), counts)
        L = len(flat)
        empty = pa.table(
            {"gram": pa.array([], pa.large_string()),
             "cnt": pa.array([], pa.int64()),
             "gbucket": pa.array([], pa.int32())}
        )
        if L < n:
            return empty
        parts = [flat.slice(i, L - n + 1) for i in range(n)]
        valid = doc_of[: L - n + 1] == doc_of[n - 1 :]
        if not valid.any():
            return empty
        gram = pc.binary_join_element_wise(
            *parts, pa.scalar(" ", type=pa.large_string())
        )
        gram = (
            gram.combine_chunks() if isinstance(gram, pa.ChunkedArray) else gram
        )
        gram = gram.filter(pa.array(valid))
        # window hashes align 1:1 with the string grams (both doc-major)
        tok_h, _ = _token_hashes(batch[text])
        wh, _ = _exact_shingle_hashes(tok_h, counts, n)
        denc = gram.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(denc.dictionary)).astype(
            np.int64
        )
        # one representative window hash per distinct gram (any occurrence
        # hashes identically)
        first = np.zeros(len(denc.dictionary), dtype=np.int64)
        first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
        ghash = wh[first]
        bkt = (_mix(ghash, np.uint64(29)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "gram": denc.dictionary,
                "cnt": pa.array(cnt),
                "gbucket": pa.array(bkt),
            }
        )

    def _bucket_topk(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gram": pa.array([], pa.large_string()),
             "cnt": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        denc = group["gram"].combine_chunks().cast(pa.large_string()).dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        part = group["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = np.zeros(len(denc.dictionary), dtype=np.int64)
        np.add.at(tot, codes, part)
        grams = denc.dictionary.to_numpy(zero_copy_only=False)
        order = np.lexsort((grams.astype("U"), -tot))[:k]
        return pa.table(
            {
                "gram": pa.array(grams[order], pa.large_string()),
                "cnt": pa.array(tot[order]),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(_bucket_topk, batch_format="pyarrow")
        .sort(["cnt", "gram"], descending=[True, False])
        .limit(k)
    )


def group_quantiles(
    sf_dir: str,
    *,
    strat: str = "lang",
    col: str = "n_chars",
    qs: tuple = (0.5, 0.9),
):
    """EXACT per-group quantiles of a numeric column, computed from
    pre-combined value histograms — never from the raw rows:

      map_batches  emits DISTINCT (strat, value, count) rows per batch
                   (one np.unique over packed keys), so the exchange and
                   the per-group state are bounded by value CARDINALITY,
                   not row count;
      groupby(strat).map_groups  re-aggregates the histogram, sorts the
                   values once, and reads each quantile off the cumulative
                   counts (discrete quantile: the element at
                   max(ceil(q*n) - 1, 0) — DuckDB quantile_disc semantics,
                   so the SQL oracle is exact).

    Returns (strat, q, value); NULL strata are excluded on both sides."""
    import os

    import ray.data

    def _hist(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[strat]))
        sv = t[strat].cast(pa.large_string())
        denc = sv.combine_chunks().dictionary_encode() if isinstance(
            sv, pa.ChunkedArray
        ) else sv.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        D = np.int64(len(denc.dictionary))
        vmin = vals.min() if len(vals) else 0
        packed = (vals - vmin) * D + codes
        uk, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                strat: denc.dictionary.take(
                    pa.array((uk % D).astype(np.int64))
                ),
                "value": pa.array((uk // D).astype(np.int64) + vmin),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def _quant(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {strat: pa.array([], pa.large_string()),
                 "q": pa.array([], pa.float64()),
                 "value": pa.array([], pa.int64())}
            )
        name = group[strat][0].as_py()
        vals = group["value"].to_numpy(zero_copy_only=False)
        cnt = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vals, kind="stable")
        vals, cnt = vals[order], cnt[order]
        # merge duplicate values arriving from different batches
        new = np.concatenate([[True], vals[1:] != vals[:-1]])
        starts = np.flatnonzero(new)
        vals = vals[starts]
        cnt = np.add.reduceat(cnt, starts)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        out_q, out_v = [], []
        from fractions import Fraction
        from math import ceil

        for q in qs:
            # EXACT rank arithmetic: DuckDB parses the q literal as a
            # DECIMAL, so ceil(q*n) is exact there; float ceil(q*n) here
            # would overshoot whenever q*n is an integer whose float
            # product lands one ulp above it (e.g. 0.28 * 25)
            rank = max(ceil(Fraction(str(q)) * n), 1)
            out_q.append(float(q))
            out_v.append(int(vals[np.searchsorted(cum, rank)]))
        return pa.table(
            {
                strat: pa.array([name] * len(qs), pa.large_string()),
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(out_v, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=[strat, col]
        )
        .map_batches(_hist, batch_format="pyarrow")
        .groupby(strat)
        .map_groups(_quant, batch_format="pyarrow")
    )
