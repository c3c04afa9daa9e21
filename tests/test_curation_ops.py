"""Round-4 curation additions: connected-components clustering,
benchmark decontamination, stratified hash sampling, sequence packing.
Each is checked against an independent brute-force oracle (union-find /
Python sets / row-at-a-time recompute) — the non-SQL analogue of the
DuckDB value-hash gate, which covers the same operators at sf0.01."""

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_go_ray.analysis import GO_WHITESPACE_CHARS
from lucene_go_ray.pipelines import dedup, pack, sampling

_SPLIT = "[" + GO_WHITESPACE_CHARS + "]"


def _union_find_clusters(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {u: find(u) for u in parent}


def _cc_of(
    edges: list[tuple[int, int]], local_threshold: int = 2_000_000
) -> dict[int, int]:
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.int64()),
                "b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    out = dedup.connected_components(
        ds, num_buckets=8, local_edges_threshold=local_threshold
    ).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["doc_id"], out["cluster_id"]))


@pytest.mark.parametrize("local_threshold", [2_000_000, 0])
def test_connected_components_random_graph(local_threshold):
    # threshold 0 forces the distributed star rounds; the default takes
    # the single-task label-propagation fast path — both must agree with
    # union-find
    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 200, size=(300, 2))
        if a != b
    ]
    assert _cc_of(edges, local_threshold) == _union_find_clusters(edges)


@pytest.mark.parametrize("local_threshold", [2_000_000, 0])
def test_connected_components_path_graph_multi_round(local_threshold):
    # a 64-node path has diameter 63: forces several star rounds
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_of(edges, local_threshold)
    assert got == {i: 0 for i in range(64)}


def test_connected_components_empty():
    got = _cc_of([])
    assert got == {}


def test_near_dup_clusters_vs_union_find(sf_dir):
    pairs = dedup.jaccard_ngram_pairs(sf_dir, threshold=0.5).to_pandas()
    edges = list(zip(pairs["a"].astype(int), pairs["b"].astype(int)))
    expect = _union_find_clusters(edges)
    got = dedup.near_dup_clusters(sf_dir, threshold=0.5).to_pandas()
    assert dict(zip(got["doc_id"], got["cluster_id"])) == expect


def test_decontaminate_brute_force(sf_dir):
    L, mod = 8, 7
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    grams: dict[int, set] = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = [x.lower() for x in re.split(_SPLIT, text)]
        grams[did] = {
            tuple(toks[i : i + L]) for i in range(len(toks) - L + 1)
        }
    ev = set().union(*(g for d, g in grams.items() if d % mod == 0))
    expect = {
        d: len(g & ev)
        for d, g in grams.items()
        if d % mod != 0 and g & ev
    }
    got = dedup.decontaminate(sf_dir, L=L, bench_mod=mod).to_pandas()
    assert dict(zip(got["doc_id"], got["shared_grams"])) == expect


def test_stratified_sample_rule_and_determinism(sf_dir):
    rates, default_rate, seed, mod = {"en": 0.5, "fr": 0.3}, 0.1, 13, 10000
    got = sampling.stratified_sample(
        sf_dir, rates=rates, default_rate=default_rate, seed=seed, mod=mod
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    again = sampling.stratified_sample(
        sf_dir, rates=rates, default_rate=default_rate, seed=seed, mod=mod
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(again)  # deterministic across runs
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    expect = []
    for did, lang in zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()):
        hv = int(
            dedup._mix(np.array([did], np.uint64), np.uint64(seed))[0]
        ) % mod
        if hv < round(rates.get(lang, default_rate) * mod):
            expect.append((did, lang))
    assert list(zip(got["doc_id"], got["lang"])) == expect
    # a kept doc for every configured stratum at these rates
    assert set(got["lang"]) >= set(rates)


def test_pack_sequences_offsets_and_chunking(sf_dir):
    one = pack.pack_sequences(sf_dir, capacity=512).to_pandas()
    one = one.sort_values("doc_id").reset_index(drop=True)
    # multi-chunk planning must agree with the single-chunk result
    many = pack.pack_sequences(
        sf_dir, capacity=512, chunk_rows=37
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)
    off = one["offset"].to_numpy()
    n = one["n_tokens"].to_numpy()
    assert off[0] == 0
    assert np.array_equal(off[1:], off[:-1] + n[:-1])  # contiguous stream
    assert np.array_equal(one["pack_id"].to_numpy(), off // 512)
    assert one["pack_id"].iloc[-1] > 0  # multiple contexts at this sf


def test_pack_sequences_unsorted_raises(tmp_path):
    p = tmp_path / "docs"
    p.mkdir()
    pq.write_table(
        pa.table({"doc_id": [3, 1, 2], "text": ["a b", "c", "d e f"]}),
        p / "documents.parquet",
    )
    with pytest.raises(Exception, match="doc_id-sorted"):
        pack.pack_sequences(str(p), capacity=8).to_pandas()


def test_curate_near_dup_variant(sf_dir, tmp_path):
    """curate(near_dup_threshold=...) = basic survivors minus the
    non-representative members of the jaccard connected components; the
    out_dir write path drops the same docs."""
    from lucene_go_ray.pipelines import curate

    basic = set(curate.curate(sf_dir).to_pandas()["doc_id"].astype(int))
    cc = dedup.near_dup_clusters(sf_dir, threshold=0.5).to_pandas()
    losers = set(
        cc.loc[cc["doc_id"] != cc["cluster_id"], "doc_id"].astype(int)
    )
    assert losers  # the synthetic corpus has near-dup clusters
    expect = basic - losers
    got = set(
        curate.curate(sf_dir, near_dup_threshold=0.5)
        .to_pandas()["doc_id"]
        .astype(int)
    )
    assert got == expect
    out = str(tmp_path / "curated_nd")
    got_w = set(
        curate.curate(sf_dir, out, near_dup_threshold=0.5)
        .to_pandas()["doc_id"]
        .astype(int)
    )
    assert got_w == expect
    import pyarrow.parquet as _pq
    import pyarrow.dataset as _pds

    written = set(
        _pds.dataset(out, format="parquet", partitioning="hive")
        .to_table(columns=["doc_id"])["doc_id"]
        .to_pylist()
    )
    assert written == expect


def test_top_ngrams_vs_counter(sf_dir):
    """Global top-k gram counts == a brute-force Counter over the same
    lowercased whitespace tokens (doc-boundary grams excluded), ordered
    (cnt desc, gram asc)."""
    from collections import Counter

    n, k = 3, 50
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    c: Counter = Counter()
    for text in t["text"].to_pylist():
        toks = [x.lower() for x in re.split(_SPLIT, text)]
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i : i + n])] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    from lucene_go_ray.pipelines import textstats

    got = textstats.top_ngrams(sf_dir, n=n, k=k).to_pandas()
    assert list(zip(got["gram"], got["cnt"])) == expect


def test_lm_perplexity_brute_force(sf_dir):
    """Interpolated-bigram perplexity == a pure-Python recompute from
    token strings (the engine counts 64-bit hashes)."""
    from collections import Counter
    from math import log10

    from lucene_go_ray.pipelines import lm

    mod = 11
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = {
        d: [x.lower() for x in re.split(_SPLIT, s)]
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    uni: Counter = Counter()
    bi: Counter = Counter()
    for d, toks in docs.items():
        if d % mod == 0:
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
    N, V = sum(uni.values()), len(uni)
    denom = N + lm.ALPHA * (V + 1)

    def p_add(w):
        return (uni.get(w, 0) + lm.ALPHA) / denom

    expect = {}
    for d, toks in docs.items():
        s = log10(p_add(toks[0]))
        for v, w in zip(toks, toks[1:]):
            ml = bi.get((v, w), 0) / uni[v] if uni.get(v) else 0.0
            s += log10(lm.LAMBDA * ml + (1 - lm.LAMBDA) * p_add(w))
        expect[d] = (len(toks), round(-s / len(toks), 6))
    got = lm.lm_perplexity(sf_dir, train_mod=mod).to_pandas()
    got_d = {
        d: (n, p)
        for d, n, p in zip(got["doc_id"], got["n_tokens"], got["log10_ppl"])
    }
    assert got_d == expect
    # the signal separates: train docs (in-domain) score lower on average
    tr = np.mean([p for d, (_, p) in expect.items() if d % mod == 0])
    te = np.mean([p for d, (_, p) in expect.items() if d % mod != 0])
    assert tr < te


def test_lm_perplexity_pruned_vocabulary(sf_dir):
    """max_ngrams prunes the broadcast tables deterministically: pruned
    entries score as unseen, unpruned entries are untouched, and a cap
    above the vocabulary size is a no-op."""
    from lucene_go_ray.pipelines import lm

    full = lm.lm_perplexity(sf_dir, train_mod=11).to_pandas()
    nop = lm.lm_perplexity(sf_dir, train_mod=11, max_ngrams=10**9).to_pandas()
    assert full.equals(nop)
    pruned = lm.lm_perplexity(sf_dir, train_mod=11, max_ngrams=50).to_pandas()
    assert len(pruned) == len(full)
    # a truncated LM assigns less probability mass -> ppl never decreases
    m = full.merge(pruned, on="doc_id", suffixes=("_f", "_p"))
    assert (m["log10_ppl_p"] >= m["log10_ppl_f"] - 1e-9).all()
    assert (m["log10_ppl_p"] > m["log10_ppl_f"]).any()


def test_hll_distinct_terms(sf_dir):
    """HLL estimate within the paper's error bound of the exact distinct
    count; bit-identical across runs (elementwise-max merge)."""
    from lucene_go_ray.pipelines import sketch

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    exact = len(
        {
            x.lower()
            for s in t["text"].to_pylist()
            for x in re.split(_SPLIT, s)
        }
    )
    got = sketch.hll_distinct_terms(sf_dir, p=12)
    est = got["estimate"][0].as_py()
    m = got["m"][0].as_py()
    assert abs(est - exact) / exact < 3 * 1.04 / np.sqrt(m) + 0.05
    assert sketch.hll_distinct_terms(sf_dir, p=12).equals(got)


def test_hll_registers_large_cardinality():
    """The sketch path (not linear counting) stays within 3 sigma on a
    synthetic 200k-distinct stream, and merging two halves equals one
    pass (associative max)."""
    from lucene_go_ray.pipelines import sketch

    h = dedup._mix(np.arange(200_000, dtype=np.uint64), np.uint64(47))
    regs = sketch._registers_for(h, 12)
    est = sketch.hll_estimate(regs)
    assert abs(est - 200_000) / 200_000 < 3 * 1.04 / np.sqrt(1 << 12)
    r1 = sketch._registers_for(h[:100_000], 12)
    r2 = sketch._registers_for(h[100_000:], 12)
    assert np.array_equal(np.maximum(r1, r2), regs)


def test_group_quantiles_vs_bruteforce(sf_dir):
    from lucene_go_ray.pipelines import textstats

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    ).to_pandas()
    t = t[t["lang"].notna()]
    expect = {}
    for lang, grp in t.groupby("lang"):
        v = np.sort(grp["n_chars"].to_numpy())
        for q in (0.5, 0.9):
            expect[(lang, q)] = int(v[max(int(np.ceil(q * len(v))) - 1, 0)])
    got = textstats.group_quantiles(sf_dir, qs=(0.5, 0.9)).to_pandas()
    assert {
        (r["lang"], r["q"]): int(r["value"]) for _, r in got.iterrows()
    } == expect


def test_curation_ops_multi_row_group_invariance(sf_dir, tmp_path):
    """Rewriting the documents table into many small row groups (more
    read blocks / different batch boundaries) must not change any
    operator's result — the batching-invariance contract behind the
    determinism claims."""
    import shutil

    from lucene_go_ray.pipelines import lm, sampling, textstats

    src = os.path.join(sf_dir, "documents.parquet")
    p = tmp_path / "rg"
    p.mkdir()
    t = pq.read_table(src)
    pq.write_table(t, p / "documents.parquet", row_group_size=37)

    def norm(df, cols):
        return df.sort_values(cols).reset_index(drop=True)

    for fn, cols in (
        (lambda d: dedup.decontaminate(d).to_pandas(), ["doc_id"]),
        (lambda d: sampling.stratified_sample(d).to_pandas(), ["doc_id"]),
        (lambda d: textstats.top_ngrams(d, n=3, k=50).to_pandas(), ["cnt", "gram"]),
        (lambda d: lm.lm_perplexity(d).to_pandas(), ["doc_id"]),
        (lambda d: dedup.near_dup_clusters(d).to_pandas(), ["doc_id"]),
    ):
        a = norm(fn(sf_dir), cols)
        b = norm(fn(str(p)), cols)
        assert a.equals(b), f"row-group layout changed a result: {cols}"


def test_group_quantiles_integer_boundary(tmp_path):
    """q*n hitting an exact integer must use exact rank arithmetic:
    0.28*25 is 7.000...01 in float64; ceil must give rank 7, not 8
    (DuckDB parses the q literal as DECIMAL and gets 7)."""
    import duckdb

    from lucene_go_ray.pipelines import textstats

    p = tmp_path / "qb"
    p.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(25), pa.int64()),
                "lang": pa.array(["en"] * 25),
                "n_chars": pa.array(range(1, 26), pa.int64()),
            }
        ),
        p / "documents.parquet",
    )
    got = textstats.group_quantiles(str(p), qs=(0.28, 0.56)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{p}/documents.parquet')"
    )
    for q in (0.28, 0.56):
        want = con.execute(
            f"SELECT quantile_disc(n_chars, {q}) FROM documents"
        ).fetchone()[0]
        assert int(got.loc[got["q"] == q, "value"].iloc[0]) == want


def test_pack_sequences_cross_chunk_unsorted_raises(tmp_path):
    """Per-chunk-sorted but globally unsorted input must raise (the
    cross-chunk first/last check)."""
    from lucene_go_ray.pipelines import pack

    p = tmp_path / "xs"
    p.mkdir()
    ids = list(range(100, 200)) + list(range(0, 100))  # two sorted blocks
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(["a b c"] * 200),
            }
        ),
        p / "documents.parquet",
    )
    with pytest.raises(ValueError, match="doc_id-sorted"):
        pack.pack_sequences(str(p), capacity=8, chunk_rows=100).to_pandas()
