"""BM25 scoring, vectorized, replicating the reference's quirks exactly.

From /root/reference/core/search/similaritybm25.go:

- idf = ln(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))          (:250-252)
- avgdl = sumTotalTermFreq / docCount                               (:256-257)
- cache[i] = 1/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl)), i in 0..255  (:186-192)
- score(freq, norm) = weight - weight/(1 + freq*cache[norm & 0xFF]) (:235-246)
  — note the & 0xFF WRAP: this port stores raw token counts as norms (no
  SmallFloat encoding, :111-121), so a 300-token doc scores as a 44-token
  doc. LENGTH_TABLE is the identity on 0..255 (:14-28).
- weight = boost * idf (single term); multi-term (phrase) weight sums the
  per-term idfs (IdfExplainV1 semantics).

All arithmetic is float64 (Go float64 throughout), so numpy float64
reproduces the reference bit-for-bit given identical inputs.
"""

from __future__ import annotations

import math

import numpy as np

LENGTH_TABLE = np.arange(256, dtype=np.float64)


def idf(doc_freq: int, doc_count: int) -> float:
    return math.log(1.0 + (float(doc_count - doc_freq) + 0.5) / (float(doc_freq) + 0.5))


class BM25Scorer:
    """Per-(query-term) scorer bound to global collection statistics."""

    def __init__(
        self,
        doc_count: int,
        sum_total_term_freq: int,
        k1: float = 1.2,
        b: float = 0.75,
    ):
        self.k1 = k1
        self.b = b
        self.doc_count = doc_count
        self.avgdl = (
            float(sum_total_term_freq) / float(doc_count) if doc_count else 0.0
        )
        if self.avgdl > 0:
            self.cache = 1.0 / (k1 * ((1 - b) + b * LENGTH_TABLE / self.avgdl))
        else:
            self.cache = np.zeros(256, dtype=np.float64)

    def weight(self, doc_freq: int, boost: float = 1.0) -> float:
        return boost * idf(doc_freq, self.doc_count)

    def score(
        self, weight: float, freqs: np.ndarray, norms8: np.ndarray
    ) -> np.ndarray:
        """Vectorized weight - weight/(1 + freq * cache[norm & 0xFF])."""
        norm_inv = self.cache[norms8]
        return weight - weight / (1.0 + freqs.astype(np.float64) * norm_inv)

    def max_block_score(
        self, weight: float, max_freq: np.ndarray, min_norm8: np.ndarray
    ) -> np.ndarray:
        """Per-block score upper bound from the block-max (impact) metadata.

        cache[] is non-increasing in the (wrapped) norm, so (max freq,
        min norm8) bounds every posting in the block — the role of the
        CompetitiveImpactAccumulator frontier
        (/root/reference/core/index/competitiveimpactaccumulator.go:88-132)."""
        return self.score(weight, max_freq.astype(np.float64), min_norm8)


class ClassicSimilarity:
    """TF-IDF ClassicSimilarity (the reference's pluggable Similarity
    surface, /root/reference/core/interface/index/similarity.go; formula
    from the public Lucene ClassicSimilarity):

        idf    = 1 + ln(docCount / (df + 1))
        tf     = sqrt(freq)
        norm   = 1 / sqrt(length)        (length via the same raw-count
                                          & 0xFF convention as BM25 here)
        score  = boost * idf^2 * tf * norm

    Same Scorer interface as BM25Scorer (weight/score/max_block_score), so
    every query path — including block-max pruning, whose bound is
    monotone increasing in freq and decreasing in wrapped length — works
    unchanged under either similarity."""

    def __init__(
        self,
        doc_count: int,
        sum_total_term_freq: int,
        k1: float = 1.2,  # accepted for interface parity; unused
        b: float = 0.75,
    ):
        self.doc_count = doc_count
        self.avgdl = (
            float(sum_total_term_freq) / float(doc_count) if doc_count else 0.0
        )
        with np.errstate(divide="ignore"):
            self.cache = 1.0 / np.sqrt(np.maximum(LENGTH_TABLE, 1.0))

    def weight(self, doc_freq: int, boost: float = 1.0) -> float:
        i = 1.0 + math.log(float(self.doc_count) / (float(doc_freq) + 1.0)) \
            if self.doc_count else 0.0
        return boost * i * i

    def score(
        self, weight: float, freqs: np.ndarray, norms8: np.ndarray
    ) -> np.ndarray:
        return weight * np.sqrt(freqs.astype(np.float64)) * self.cache[norms8]

    def max_block_score(
        self, weight: float, max_freq: np.ndarray, min_norm8: np.ndarray
    ) -> np.ndarray:
        return self.score(weight, max_freq.astype(np.float64), min_norm8)


SIMILARITIES = {"bm25": BM25Scorer, "classic": ClassicSimilarity}


def make_scorer(
    name: str, doc_count: int, sum_total_term_freq: int, k1: float, b: float
):
    """Similarity registry (IndexWriterConfig.SetSimilarity analogue)."""
    try:
        cls = SIMILARITIES[name]
    except KeyError:
        raise ValueError(
            f"unknown similarity {name!r}; known: {sorted(SIMILARITIES)}"
        ) from None
    return cls(doc_count, sum_total_term_freq, k1=k1, b=b)
