"""Distributed BPE vocabulary training (Sennrich, Haddow, Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-training step of an LLM data pipeline.

Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus: one
pre-combined exchange reduces the corpus to (word, count) rows (orders of
magnitude smaller — Zipf), and every merge round then runs over that
table:

  count   map-only: each batch emits pre-combined (left, right,
          partial-count) rows of adjacent-symbol pairs weighted by word
          count; the driver reduces the vocabulary-sized partials and
          picks the argmax with a deterministic tie-break
          (count desc, left asc, right asc);
  apply   map-only: the winning pair merges GREEDY LEFT-TO-RIGHT
          non-overlapping inside every word ("aaaa" + (a,a) -> "aa","aa"),
          vectorized over the flattened symbol arrays (within each run of
          consecutive candidate starts, even offsets are chosen — exactly
          the sequential greedy result); the word table re-materializes
          per round (vocabulary-sized, never corpus-sized).

Rounds = num_merges (fixed; stops early below ``min_pair_count``). At
100 TB the corpus is touched exactly once (the word-count exchange); the
iterated state is the word table only.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import GO_WHITESPACE_CLASS


def word_counts(sf_dir: str, *, key: str = "doc_id", text: str = "text"):
    """(word, cnt) over lowercased whitespace tokens — pre-combined per
    batch, one groupby exchange."""
    import ray.data
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[text].cast(pa.large_string())
        toks = pc.split_pattern_regex(s, GO_WHITESPACE_CLASS)
        flat = pc.utf8_lower(pc.list_flatten(toks))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        denc = flat.dictionary_encode()
        cnt = np.bincount(
            denc.indices.to_numpy(zero_copy_only=False),
            minlength=len(denc.dictionary),
        ).astype(np.int64)
        return pa.table({"word": denc.dictionary, "cnt": pa.array(cnt)})

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=[text]
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def _greedy_merge_mask(cand: np.ndarray) -> np.ndarray:
    """Greedy left-to-right non-overlapping selection from a candidate
    mask over pair START positions (candidates at i and i+1 overlap):
    within each RUN of consecutive candidates keep even offsets — the
    exact sequential-greedy result, vectorized."""
    if not cand.any():
        return cand
    idx = np.flatnonzero(cand)
    new_run = np.concatenate([[True], np.diff(idx) != 1])
    run_start = idx[new_run][np.cumsum(new_run) - 1]
    keep = ((idx - run_start) % 2) == 0
    out = np.zeros_like(cand)
    out[idx[keep]] = True
    return out


def _apply_one_merge(
    offs: np.ndarray, flat_np: np.ndarray, bl: str, br: str
) -> tuple[np.ndarray, np.ndarray]:
    """Apply one (bl, br) merge greedily to every symbol sequence in a
    flattened (offsets, numpy object array) representation; returns
    (new offsets, new flat). Pure numpy — callers convert Arrow<->numpy
    ONCE per batch, not once per merge."""
    L = len(flat_np)
    if L < 2:
        return offs, flat_np
    nseq = len(offs) - 1
    seq_of = np.repeat(np.arange(nseq), np.diff(offs))
    il = flat_np == bl
    ir = flat_np == br
    cand = il[:-1] & ir[1:] & (seq_of[:-1] == seq_of[1:])
    chosen = _greedy_merge_mask(cand)
    if not chosen.any():
        return offs, flat_np
    starts = np.zeros(L, bool)
    starts[np.flatnonzero(chosen)] = True
    drop = np.zeros(L, bool)
    drop[np.flatnonzero(chosen) + 1] = True
    out = flat_np.copy()
    out[starts] = bl + br
    keep = ~drop
    new_flat = out[keep]
    new_counts = np.bincount(seq_of[keep], minlength=nseq)
    new_offs = np.zeros(nseq + 1, np.int64)
    np.cumsum(new_counts, out=new_offs[1:])
    return new_offs, new_flat


def _sym_table(syms_offs: np.ndarray, flat: pa.Array, cnt) -> pa.Table:
    return pa.table(
        {
            "syms": pa.LargeListArray.from_arrays(
                pa.array(syms_offs, pa.int64()), flat
            ),
            "cnt": cnt,
        }
    )


def _best_pair(
    la: np.ndarray, ra: np.ndarray, ca: np.ndarray, min_pair_count: int
) -> tuple[str, str, int] | None:
    """Group (left, right, count) rows and pick the argmax pair with the
    deterministic tie-break (count desc, left asc, right asc). Two-key
    lexsort on the STRING arrays — no joined key, so symbols may contain
    any code point."""
    if len(la) == 0:
        return None
    las, ras = la.astype(str), ra.astype(str)
    order0 = np.lexsort((ras, las))
    las, ras, ca = las[order0], ras[order0], ca[order0]
    new = np.concatenate(
        [[True], (las[1:] != las[:-1]) | (ras[1:] != ras[:-1])]
    )
    starts = np.flatnonzero(new)
    la_u, ra_u = las[starts], ras[starts]
    tot = np.add.reduceat(ca, starts)
    best = np.lexsort((ra_u, la_u, -tot))[0]
    if tot[best] < min_pair_count:
        return None
    return str(la_u[best]), str(ra_u[best]), int(tot[best])


def _merges_table(merges: list[tuple[str, str, int]]) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(merges) + 1, dtype=np.int64)),
            "left": pa.array([m[0] for m in merges], pa.large_string()),
            "right": pa.array([m[1] for m in merges], pa.large_string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def _train_bpe_local(
    words_tab: pa.Table, num_merges: int, min_pair_count: int
) -> pa.Table:
    """Driver-side merge loop over the already-reduced word table: the
    corpus was touched exactly once (the distributed word-count exchange);
    everything after is pure numpy over the Zipf-bounded vocabulary —
    ZERO Ray round-trips per merge round, so a production 32k-merge vocab
    costs 32k in-memory passes, not 64k cluster exchanges."""
    w = words_tab["word"].cast(pa.large_string())
    cnt = words_tab["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    words_py = w.to_pylist()
    lens = pc.utf8_length(w).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    flat_np = np.asarray(list("".join(words_py)), dtype=object)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        if len(flat_np) < 2:
            break
        word_of = np.repeat(np.arange(len(cnt)), np.diff(offs))
        valid = word_of[:-1] == word_of[1:]
        if not valid.any():
            break
        la = flat_np[:-1][valid]
        ra = flat_np[1:][valid]
        ca = cnt[word_of[:-1][valid]]
        pick = _best_pair(la, ra, ca, min_pair_count)
        if pick is None:
            break
        merges.append(pick)
        offs, flat_np = _apply_one_merge(offs, flat_np, pick[0], pick[1])
    return _merges_table(merges)


def train_bpe(
    sf_dir: str,
    *,
    key: str = "doc_id",
    text: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
    driver_word_limit: int = 5_000_000,
):
    """Learn ``num_merges`` BPE merges; returns a pyarrow table
    (rank, left, right, pair_count) — the merge table a tokenizer would
    persist. Deterministic: tie-break (count desc, left asc, right asc).

    The corpus-sized work is ONE distributed exchange (word_counts).
    When the reduced word table fits the driver (``driver_word_limit``
    distinct words — Zipf guarantees this far beyond 100 TB of natural
    text), the merge loop runs locally with zero per-round Ray traffic;
    above the limit it falls back to the distributed per-round path
    (two cluster passes per merge)."""
    import ray
    import ray.data

    words = word_counts(sf_dir, key=key, text=text).materialize()
    if words.count() <= driver_word_limit:
        tab = pa.concat_tables(
            list(words.iter_batches(batch_format="pyarrow"))
        )
        return _train_bpe_local(tab, num_merges, min_pair_count)

    def _to_symbols(batch: pa.Table) -> pa.Table:
        w = batch["word"].cast(pa.large_string())
        words_py = w.to_pylist()
        lens = pc.utf8_length(w).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = pa.array(list("".join(words_py)), pa.large_string())
        return _sym_table(offs, flat, batch["cnt"])

    ds = words.map_batches(_to_symbols, batch_format="pyarrow").materialize()

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):

        def _pair_partials(batch: pa.Table) -> pa.Table:
            syms = batch["syms"].combine_chunks()
            cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
            offs = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = syms.values
            L = len(flat)
            empty = pa.table(
                {"left": pa.array([], pa.large_string()),
                 "right": pa.array([], pa.large_string()),
                 "c": pa.array([], pa.int64())}
            )
            if L < 2:
                return empty
            word_of = np.repeat(np.arange(len(cnt)), np.diff(offs))
            valid = word_of[:-1] == word_of[1:]
            if not valid.any():
                return empty
            vmask = pa.array(valid)
            lefts = flat.slice(0, L - 1).filter(vmask)
            rights = flat.slice(1, L - 1).filter(vmask)
            w = cnt[word_of[:-1][valid]]
            # encode the PAIR as packed (left code, right code) — a joined
            # string key would conflate pairs whose symbols contain the
            # separator ("a\x1f"+"b" == "a"+"\x1fb")
            ld = lefts.dictionary_encode()
            rd = rights.dictionary_encode()
            lc = ld.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            rc = rd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            nr = np.int64(len(rd.dictionary))
            uk, inv = np.unique(lc * nr + rc, return_inverse=True)
            tot = np.bincount(inv, weights=w).astype(np.int64)
            return pa.table(
                {
                    "left": ld.dictionary.take(
                        pa.array((uk // nr).astype(np.int64))
                    ),
                    "right": rd.dictionary.take(
                        pa.array((uk % nr).astype(np.int64))
                    ),
                    "c": pa.array(tot),
                }
            )

        # driver reduce: vocabulary-sized partials, vectorized argmax
        ls, rs, cs = [], [], []
        for b in ds.map_batches(
            _pair_partials, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            ls.append(np.asarray(b["left"].to_pylist(), dtype=object))
            rs.append(np.asarray(b["right"].to_pylist(), dtype=object))
            cs.append(b["c"].to_numpy(zero_copy_only=False))
        if not ls:
            break
        pick = _best_pair(
            np.concatenate(ls),
            np.concatenate(rs),
            np.concatenate(cs).astype(np.int64),
            min_pair_count,
        )
        if pick is None:
            break
        best_l, best_r = pick[0], pick[1]
        merges.append(pick)
        pair_ref = ray.put((best_l, best_r))

        def _apply(batch: pa.Table) -> pa.Table:
            bl, br = ray.get(pair_ref)
            syms = batch["syms"].combine_chunks()
            cnt = batch["cnt"]
            offs = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat_np = np.asarray(syms.values.to_pylist(), dtype=object)
            new_offs, new_flat = _apply_one_merge(offs, flat_np, bl, br)
            return _sym_table(
                new_offs, pa.array(new_flat.tolist(), pa.large_string()), cnt
            )

        ds = ds.map_batches(_apply, batch_format="pyarrow").materialize()

    return _merges_table(merges)


def encode_counts(
    sf_dir: str,
    merges: pa.Table,
    *,
    key: str = "doc_id",
    text: str = "text",
):
    """(doc_id, n_subwords): per-document subword counts after applying
    the learned merge table in RANK order (greedy left-to-right per
    merge — the same application rule training used, so encoding the
    training corpus reproduces the training segmentation exactly).

    MAP-ONLY: the merge table broadcasts via ``ray.put``; each batch
    segments only its DISTINCT words (dictionary-encode), then scatters
    the per-word subword counts back to documents with one bincount."""
    import ray
    import ray.data

    m_ref = ray.put(
        list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    )

    def _enc(batch: pa.Table) -> pa.Table:
        ms = ray.get(m_ref)
        s = batch[text].cast(pa.large_string())
        toks = pc.split_pattern_regex(s, GO_WHITESPACE_CLASS)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        flat = pc.utf8_lower(pc.list_flatten(toks))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        denc = flat.dictionary_encode()
        words_py = denc.dictionary.to_pylist()
        lens = (
            pc.utf8_length(denc.dictionary)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        fc = np.array(list("".join(words_py)), dtype=object)
        for bl, br in ms:
            offs, fc = _apply_one_merge(offs, fc, bl, br)
        n_sub = np.diff(offs)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        per_doc = np.bincount(
            doc_of, weights=n_sub[codes].astype(np.float64),
            minlength=len(counts),
        ).astype(np.int64)
        return pa.table(
            {
                key: batch[key],
                "n_subwords": pa.array(per_doc),
            }
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
    ).map_batches(_enc, batch_format="pyarrow")
