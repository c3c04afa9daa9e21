"""Deterministic Common-Crawl-style corpus (the input_hint table shape).

Schema (BASELINE.json input_hint / FIXTURES.md F1):
    url:string, warc_ts:timestamp[us], html:binary, text:large_string, lang:string

Generation is fully deterministic (seeded numpy; no wall clock): Zipfian
tokens from a fixed ~10k-term vocabulary including stopwords, log-normal doc
lengths in [2, 2000] (crossing 256 to exercise the reference's
``norm & 0xFF`` wrap, similaritybm25.go:245), plus crafted rows for the
analyzer edge cases (mixed case, multi-whitespace, unicode, all-stopwords,
duplicate texts for docID tie-breaks, a hot term for merge salting).

``html`` is a deterministic wrapper of ``text``; ``extract_text`` inverts it
exactly, giving the per-url byte-identical extracted-text invariant the
north rule requires. Real-HTML extraction would slot in behind the same
vectorized column transform.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

HTML_PREFIX = "<html><body>"
HTML_SUFFIX = "</body></html>"

_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]
HOT_TERM = "web"  # present in >50% of docs => exercises the salting path


def _vocabulary(size: int = 10_000) -> list[str]:
    base = [
        "page", "data", "index", "search", "query", "term", "crawl", "link",
        "site", "text", "rank", "score", "match", "word", "doc", "corpus",
        "token", "field", "store", "merge", "shard", "block", "batch", "node",
    ]
    vocab = list(_STOPWORDS) + [HOT_TERM] + base
    i = 0
    while len(vocab) < size:
        vocab.append(f"w{i:05d}")
        i += 1
    return vocab[:size]


def synthesize_corpus(
    n_docs: int,
    out_path: str,
    *,
    seed: int = 42,
    vocab_size: int = 10_000,
    shard_rows: int = 250_000,
    row_group_rows: int = 5_000,
) -> list[str]:
    """Write the corpus as one or more parquet shards; returns the paths.

    Deterministic for a given (n_docs, seed, vocab_size): re-runs are
    byte-stable, and the same corpus is produced regardless of parallelism.
    """
    os.makedirs(out_path, exist_ok=True)
    vocab = np.asarray(_vocabulary(vocab_size), dtype=object)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.07
    probs /= probs.sum()
    rng = np.random.default_rng(seed)
    paths = []
    shard = 0
    for base in range(0, n_docs, shard_rows):
        n = min(shard_rows, n_docs - base)
        path = os.path.join(out_path, f"corpus-{shard:05d}.parquet")
        tbl = _make_shard(rng, vocab, probs, base, n)
        pq.write_table(tbl, path, row_group_size=row_group_rows)
        paths.append(path)
        shard += 1
    return paths


def _make_shard(rng, vocab, probs, base: int, n: int) -> pa.Table:
    lengths = np.clip(
        np.round(np.exp(rng.normal(4.0, 1.2, size=n))).astype(np.int64), 2, 2000
    )
    # hot term: ~60% of docs get it injected at position 0
    hot_mask = rng.random(n) < 0.6
    total = int(lengths.sum())
    token_ids = rng.choice(len(vocab), size=total, p=probs)
    toks = vocab[token_ids]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    toks[offsets[:-1][hot_mask]] = HOT_TERM
    lst = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(toks, type=pa.string()),
    )
    texts = pc.binary_join(lst, " ").to_pylist()

    # crafted edge-case rows, deterministically placed at the shard head
    crafted = [
        "The THE the",  # lowercase filter
        "multi  space\tand\nnewline sep",  # empty tokens from runs
        " leading and trailing ",  # boundary empties
        "",  # empty text => single empty token
        "the a an and or of to in is it",  # all stopwords => norm 0
        "quick the brown of of fox",  # stopword position gaps
        "日本語 テキスト 中文 😀 combining éé",  # unicode
        "web non breaking space",  # NBSP delimiter (U+00A0)
    ]
    dup = "duplicate text for tie break scoring"
    crafted += [dup, dup, dup]
    for i, c in enumerate(crafted):
        if i < len(texts):
            texts[i] = c

    urls = [f"https://example.org/p/{base + i:010d}" for i in range(n)]
    warc_ts = pa.array(
        (1_500_000_000_000_000 + (base + np.arange(n)) * 1_000_000).astype(
            "datetime64[us]"
        )
    )
    html = pa.array(
        [(HTML_PREFIX + t + HTML_SUFFIX).encode("utf-8") for t in texts],
        type=pa.binary(),
    )
    langs = rng.choice(["en", "de", "fr"], size=n, p=[0.95, 0.03, 0.02])
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": warc_ts,
            "html": html,
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def synthesize_bursty_corpus(
    n_docs: int,
    out_path: str,
    *,
    seed: int = 7,
    vocab_size: int = 10_000,
    burst_terms: int = 8,
    burst_rate: float = 0.004,
    row_group_rows: int = 5_000,
    sort_by_length: bool = True,
) -> str:
    """A documents-style table (doc_id, text) with BURSTY term frequencies —
    the tf regime where block-max WAND pruning pays off.

    Real web text is bursty: a topical term occurs dozens of times in the
    few pages about that topic and ~once elsewhere (the 'verbosity' half of
    the two-Poisson model behind BM25 itself). The driver's synthetic
    documents table draws tokens i.i.d., which flattens per-block score
    bounds and makes upper-bound pruning structurally useless — this
    generator restores the skew: i.i.d. Zipf background tokens plus, for a
    handful of head terms, a ``burst_rate`` fraction of docs where the term
    is repeated 16-128 times. Doc lengths are clipped to [8, 255] so the
    reference's ``norm & 0xFF`` wrap (similaritybm25.go:245) never fires
    and block bounds follow true document length. Deterministic for a
    given (n_docs, seed)."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    vocab = np.asarray(_vocabulary(vocab_size), dtype=object)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.07
    probs /= probs.sum()
    rng = np.random.default_rng(seed)
    lengths = np.clip(
        np.round(np.exp(rng.normal(3.8, 0.8, size=n_docs))).astype(np.int64), 8, 255
    )
    if sort_by_length:
        # Index sorting (SetIndexSort by doc length): docIDs in norm order
        # homogenizes per-block norms, which is what turns bursty tf into
        # per-block bound VARIANCE — the early-termination layout Lucene's
        # sorted indexes buy (indexsorter.go). Unsorted, every 128-posting
        # block catches some short doc and the bounds flatten out.
        lengths.sort()
    total = int(lengths.sum())
    toks = vocab[rng.choice(vocab_size, size=total, p=probs)]
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    head = [w for w in vocab[: burst_terms + len(_STOPWORDS) + 1] if w not in _STOPWORDS]
    for w in head[:burst_terms]:
        docs = np.flatnonzero(rng.random(n_docs) < burst_rate)
        reps = rng.integers(16, 128, size=len(docs))
        for d, r in zip(docs, reps):
            r = min(int(r), int(lengths[d]) - 1)
            toks[offsets[d] + 1 : offsets[d] + 1 + r] = w
    lst = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(toks, type=pa.string()),
    )
    texts = pc.binary_join(lst, " ")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": texts.cast(pa.large_string()),
        }
    )
    pq.write_table(tbl, out_path, row_group_size=row_group_rows)
    return out_path


def sort_corpus(
    input_paths: list[str],
    out_dir: str,
    by: str,
    *,
    descending: bool = False,
    row_group_rows: int = 5_000,
) -> list[str]:
    """Index-sorting pre-pass (the reference's IndexWriterConfig.SetIndexSort
    surface, /root/reference/core/index/indexsorter.go:47-117, re-expressed
    Ray-Data-first): a distributed ``Dataset.sort`` over the corpus written
    back as numbered parquet shards. Building an index over the output
    assigns docIDs in sort-key order (docBase prefix-sum over the sorted
    shards), which is exactly what segment-sorting buys Lucene — early
    termination on sorted fields and better posting-delta locality."""
    import ray.data

    ds = ray.data.read_parquet(input_paths).sort(by, descending=descending)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(
        out_dir,
        min_rows_per_file=row_group_rows,
        row_group_size=row_group_rows,
        filename_provider=_NumberedFilenames(),
    )
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )


class _NumberedFilenames:
    """Zero-padded, task-ordered filenames so lexicographic file order ==
    sort order (plan_partitions sorts paths; docBases then follow the
    corpus sort key)."""

    def get_filename_for_block(self, block, write_uuid, task_index, block_index):
        # write_uuid suffix (required by Ray's overwrite guard) sits AFTER
        # the numeric prefix, so lexicographic order is still task order
        return f"sorted-{task_index:06d}-{block_index:06d}-{write_uuid}.parquet"


def extract_text(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized extraction inverse of the html wrapper (zero Python rows).

    Anchored greedy RE2 match strips exactly one leading prefix and the final
    trailing suffix; ``(?s)`` lets ``.*`` span newlines inside the text.
    """
    s = html.cast(pa.large_string())
    pattern = f"(?s)^{HTML_PREFIX}(?P<text>.*){HTML_SUFFIX}$"
    extracted = pc.extract_regex(s, pattern)
    return pc.struct_field(extracted, "text")


def check_extraction_invariant(paths: list[str]) -> int:
    """Ray pipeline asserting extract(html) == text byte-identically per url.

    Returns the number of rows checked; raises on any mismatch."""
    import ray.data

    def _check(batch: pa.Table) -> pa.Table:
        got = extract_text(batch["html"])
        eq = pc.equal(got, batch["text"].cast(pa.large_string()))
        bad = batch.filter(pc.invert(eq))
        if bad.num_rows:
            raise AssertionError(
                f"extraction mismatch for urls: {bad['url'].to_pylist()[:5]}"
            )
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})

    ds = ray.data.read_parquet(paths, columns=["url", "html", "text"])
    out = ds.map_batches(_check, batch_format="pyarrow")
    return sum(r["n"] for r in out.take_all())


def generate_query_set(
    seed: int = 42, n_queries: int = 200, vocab_size: int = 10_000
) -> list[dict]:
    """F2 query set: term / bool_and / bool_or / bool_not / phrase over the
    synthetic vocabulary, spread across the df spectrum."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocabulary(vocab_size)
    non_stop = [w for w in vocab if w not in set(_STOPWORDS)]
    hot = non_stop[:30]
    mid = non_stop[30:300]
    rare = non_stop[300:3000]
    queries = []
    kinds = ["term", "bool_and", "bool_or", "bool_not", "phrase"]
    for qid in range(n_queries):
        kind = kinds[qid % len(kinds)]
        pool = [hot, mid, rare][qid % 3]
        k = [1, 10, 100, 1000][qid % 4]
        if kind == "term":
            clauses = [pool[rng.integers(len(pool))]]
            if qid % 15 == 0:
                clauses = ["zz-absent-term"]
        elif kind == "bool_and":
            nc = 2 + qid % 3
            clauses = list(rng.choice(pool, size=nc, replace=False))
        elif kind == "bool_or":
            nc = 2 + qid % 7
            clauses = list(rng.choice(pool, size=nc, replace=False))
        elif kind == "bool_not":
            clauses = [
                pool[rng.integers(len(pool))],
                hot[rng.integers(len(hot))],
            ]
        else:  # phrase
            nc = 2 + qid % 2
            clauses = list(rng.choice(pool, size=nc, replace=False))
        queries.append(
            {"qid": qid, "kind": kind, "clauses": [str(c) for c in clauses], "k": k}
        )
    return queries
