"""Independent exact oracles for the rows-only gate entries (minhash_pairs,
simhash, fingerprints, language_id): every hash is recomputed here from the
published algorithm definitions (FNV-1a, splitmix64, Broder MinHash +
banding, Charikar SimHash, Schleimer winnowing) in separate code — pure
Python ints / per-doc loops — and compared byte-exactly to the vectorized
Ray pipelines. This is the non-SQL analogue of the DuckDB value-hash gate."""

import os
import re

import numpy as np
import pyarrow.parquet as pq

from lucene_go_ray.analysis import GO_WHITESPACE_CHARS
from lucene_go_ray.pipelines import dedup, textstats

M64 = (1 << 64) - 1
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3


def _tok_hashes(text: str) -> list[int]:
    toks = [t.lower() for t in re.split("[" + GO_WHITESPACE_CHARS + "]", text)]
    out = []
    for t in toks:
        h = FNV_OFFSET
        for b in t.encode("utf-8"):
            h = ((h ^ b) * FNV_PRIME) & M64
        out.append(h)
    return out


def _shingles(tok_h: list[int], k: int) -> list[int]:
    n = len(tok_h)
    if n == 0:
        return []
    out = []
    for s in range(max(n - k + 1, 1) if n else 0):
        h = 0
        for j in range(k):
            # short docs clamp to the last token (whole-doc shingle quirk)
            h = ((h * FNV_PRIME) & M64) ^ tok_h[min(s + j, n - 1)]
        out.append(h)
    return out


def _splitmix(h: int, seed: int) -> int:
    z = (h + seed * 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return (z ^ (z >> 31)) & M64


def _load_docs(sf_dir):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def test_simhash_matches_independent(sf_dir):
    ids, texts = _load_docs(sf_dir)
    got = {
        int(r["doc_id"]): int(r["simhash"])
        for r in dedup.simhash_table(sf_dir).take_all()
    }
    for i in range(0, len(ids), 9):  # stratified sample, exact per doc
        sh = _shingles(_tok_hashes(texts[i]), 2)
        votes = [0] * 64
        for h in sh:
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        expected = sum(1 << b for b in range(64) if votes[b] > 0)
        # pipeline stores as int64 (two's complement)
        expected_i64 = expected - (1 << 64) if expected >= (1 << 63) else expected
        assert got[ids[i]] == expected_i64, ids[i]


def test_fingerprints_match_independent(sf_dir):
    ids, texts = _load_docs(sf_dir)
    rows = {
        int(r["doc_id"]): [int(r[f"fp{j}"]) for j in range(8)]
        for r in textstats.fingerprints(sf_dir).take_all()
    }
    for i in range(0, len(ids), 9):
        sh = _shingles(_tok_hashes(texts[i]), 4)
        hv = sorted(_splitmix(h, 99) for h in sh)[:8]
        expected = [v >> 1 for v in hv]
        expected += [np.iinfo(np.int64).max] * (8 - len(expected))
        assert rows[ids[i]] == expected, ids[i]


def _signature_matrix(texts, num_hashes=64, shingle_k=3):
    """Independent MinHash signatures: per-doc python/numpy recompute."""
    sigs = np.full((len(texts), num_hashes), np.iinfo(np.uint64).max, np.uint64)
    for d, text in enumerate(texts):
        sh = np.array(_shingles(_tok_hashes(text), shingle_k), dtype=np.uint64)
        if len(sh) == 0:
            continue
        for i in range(num_hashes):
            with np.errstate(over="ignore"):
                z = sh + np.uint64((i + 1) * 0x9E3779B97F4A7C15 & M64)
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                z = z ^ (z >> np.uint64(31))
            sigs[d, i] = z.min()
    return sigs


def test_minhash_pairs_match_independent(sf_dir):
    """Full-corpus oracle: recomputed signatures -> banding -> candidate
    pairs -> estimate threshold, compared as exact (a, b, est) sets."""
    ids, texts = _load_docs(sf_dir)
    sigs = _signature_matrix(texts)
    bands, rows_per_band, threshold = 16, 4, 0.5
    buckets: dict[tuple, list[int]] = {}
    for d in range(len(ids)):
        for b in range(bands):
            seg = sigs[d, b * rows_per_band : (b + 1) * rows_per_band]
            h = FNV_OFFSET
            for v in seg:
                h = ((h ^ int(v)) * FNV_PRIME) & M64
            buckets.setdefault((b, h), []).append(d)
    expected = {}
    for (_, _), ds in buckets.items():
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                i, j = ds[x], ds[y]
                if ids[i] == ids[j]:
                    continue
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    a, b2 = sorted((ids[i], ids[j]))
                    expected[(a, b2)] = est
    got = {
        (int(r["a"]), int(r["b"])): float(r["jaccard_est"])
        for r in dedup.minhash_lsh_pairs(sf_dir, threshold=threshold).take_all()
    }
    assert got == expected


def _naive_classify(model, text: str):
    """Independent pure-python reimplementation of the byte-trigram NB
    scorer: string slicing + dict counting instead of the engine's numpy
    buffer math. Shares only the trained log-prob table."""
    from lucene_go_ray.pipelines.langid import _BUCKET_BITS, _HASH_MULT

    b = text.lower().encode("utf-8")
    if len(b) < 3:
        return "und", 0.0
    counts: dict[int, int] = {}
    for i in range(len(b) - 2):
        code = (b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
        bucket = (code * int(_HASH_MULT) % (1 << 32)) >> (32 - _BUCKET_BITS)
        counts[bucket] = counts.get(bucket, 0) + 1
    n_tri = len(b) - 2
    means = [
        sum(c * float(model.log_prob[li][bk]) for bk, c in counts.items())
        / n_tri
        for li in range(len(model.langs))
    ]
    order = sorted(range(len(means)), key=lambda i: means[i])
    best, second = order[-1], order[-2]
    return model.langs[best], round(means[best] - means[second], 6)


def test_language_id_matches_independent(sf_dir):
    from lucene_go_ray.pipelines.langid import LangIDModel

    ids, texts = _load_docs(sf_dir)
    got = {
        int(r["doc_id"]): (r["lang_pred"], float(r["lang_score"]))
        for r in textstats.language_id(sf_dir).take_all()
    }
    model = LangIDModel()
    for i in range(0, len(ids), 9):
        exp_lang, exp_score = _naive_classify(model, texts[i])
        pred, score = got[ids[i]]
        assert pred == exp_lang, ids[i]
        assert abs(score - exp_score) < 1e-6, ids[i]


def test_language_id_accuracy_heldout():
    """Real-classifier criterion: held-out sentences (absent from the seed
    profiles) in all 8 supported languages classify correctly."""
    from lucene_go_ray.pipelines.langid import LangIDModel

    m = LangIDModel()
    held_out = [
        ("the children walked to school although it was raining hard", "en"),
        ("you should never give up even when everything goes wrong", "en"),
        ("ich habe keine ahnung wo mein schlüssel geblieben ist", "de"),
        ("morgen werden wir zusammen in die stadt fahren", "de"),
        ("je ne sais pas où se trouvent mes clés ce matin", "fr"),
        ("demain nous irons ensemble au marché près de la gare", "fr"),
        ("no tengo ni idea de dónde están mis llaves esta mañana", "es"),
        ("mañana iremos juntos al mercado cerca de la estación", "es"),
        ("non ho idea di dove siano finite le mie chiavi stamattina", "it"),
        ("domani andremo insieme al mercato vicino alla stazione", "it"),
        ("não faço ideia de onde estão as minhas chaves esta manhã", "pt"),
        ("amanhã iremos juntos ao mercado perto da estação", "pt"),
        ("ik heb geen idee waar mijn sleutels deze ochtend zijn", "nl"),
        ("morgen gaan we samen naar de markt bij het station", "nl"),
        ("我不知道我的钥匙今天早上放在哪里了", "zh"),
        ("明天我们一起去火车站附近的市场", "zh"),
    ]
    correct = sum(m.classify(t)[0] == lang for t, lang in held_out)
    assert correct >= 15, f"{correct}/16"
    # margins are positive confidences; empty input is undetermined
    assert all(m.classify(t)[1] > 0 for t, _ in held_out)
    assert m.classify("")[0] == "und"
    assert m.classify("ab")[0] == "und"