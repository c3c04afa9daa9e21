"""Lucene-compatible StandardAnalyzer pipeline, vectorized for Arrow batches.

Re-implements (from behavior, not code) the analysis chain of the reference
lucene-go engine:

- ``standard.Tokenizer`` (/root/reference/core/analysis/standard/tokenizer.go:144-175)
  is — despite its UAX#29 doc comment — a *single-whitespace-character*
  splitter: a token is the (possibly empty) run of non-space runes between
  two whitespace runes.  Consequences we replicate faithfully:

  * consecutive whitespace emits empty-string tokens ("a  b" -> ["a","","b"])
  * leading whitespace emits a leading empty token (" a" -> ["","a"])
  * trailing whitespace emits a trailing empty token ("a " -> ["a",""])
  * empty text emits exactly one empty token ("" -> [""])

  i.e. exactly the semantics of ``re.split('[<ws-class>]', text)`` where the
  class is Go's ``unicode.IsSpace`` set.

- byte offsets use the reference's slow/fast counters including the
  off-by-one ``fast += n; fast++`` quirk on each delimiter
  (tokenizer.go:168-170): the reported start offset of token *i* is
  ``sum(len_bytes(tok_j) + len_bytes(delim_j) + 1 for j < i)``.

- ``LowerCaseFilter`` (/root/reference/core/analysis/lowercasefilter.go:24-39):
  full-string lowercase before the stop filter.

- ``StopFilter`` / ``FilteringTokenFilter``
  (/root/reference/core/analysis/filteringtokenfilter.go:37-66): dropped
  tokens accumulate their position increments onto the next kept token.
  Since every raw token carries posIncr=1, the position of a kept token is
  simply its index in the *full* token stream.

- norm (per-doc field length) = Length - NumOverlap = number of kept tokens
  (no posIncr-0 tokens can occur in this chain), matching
  ``BM25Similarity.ComputeNorm`` (/root/reference/core/search/similaritybm25.go:111-121).

The reference ships no default stopword set (the analyzer takes a caller
``CharArraySet``); we default to the classic public Lucene English stop set
but the set is fully configurable (empty set => pure tokenize+lowercase).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Go's unicode.IsSpace set: '\t','\n','\v','\f','\r',' ',U+0085,U+00A0 plus
# the Unicode White_Space property (Zs/Zl/Zp): U+1680, U+2000-200A, U+2028,
# U+2029, U+202F, U+205F, U+3000.  Spelled out explicitly (not `\s`) so the
# Python, RE2/pyarrow and DuckDB views of "whitespace" are identical.
GO_WHITESPACE_CHARS = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)
# char class of the above; all chars are literals, no escaping needed inside [].
GO_WHITESPACE_CLASS = "[" + GO_WHITESPACE_CHARS + "]"

_SPLIT_RE = re.compile(GO_WHITESPACE_CLASS)

# Classic public Lucene English stop set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET).
DEFAULT_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


@dataclass
class AnalyzedDoc:
    """Token-level output for one document (row-at-a-time API, used in tests
    and the in-memory single-doc engine; the hot path is `analyze_column`)."""

    terms: list[str]
    positions: np.ndarray  # int32, position = index in the full token stream
    starts: np.ndarray  # int32 byte offsets (reference slow/fast semantics)
    ends: np.ndarray  # int32
    length: int  # number of kept tokens (sum of termFreq)
    norm: int  # length - num_overlap (== length here)


def _token_byte_offsets(texts: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-raw-token byte offsets (actual UTF-8 positions within
    each doc, empties included): one numpy scan of the concatenated string
    buffer finds every whitespace delimiter (Go unicode.IsSpace set spelled
    as explicit UTF-8 patterns), token boundaries follow from delimiter
    spans. Returns flattened (starts, token_byte_lens, counts_per_doc)."""
    n = len(texts)
    bufs = texts.buffers()
    data = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
    doc_offs = np.frombuffer(bufs[1], dtype=np.int64)[
        texts.offset : texts.offset + n + 1
    ]
    m = len(data)
    b0 = data
    b1 = np.empty(m, dtype=np.uint8)
    b2 = np.empty(m, dtype=np.uint8)
    b1[: m - 1] = data[1:] if m else b1[:0]
    b1[m - 1 :] = 0
    b2[: m - 2] = data[2:] if m > 1 else b2[:0]
    b2[m - 2 :] = 0
    is1 = np.isin(b0, np.array([9, 10, 11, 12, 13, 32], dtype=np.uint8))
    is2 = (b0 == 0xC2) & ((b1 == 0x85) | (b1 == 0xA0))
    is3 = (
        ((b0 == 0xE1) & (b1 == 0x9A) & (b2 == 0x80))
        | (
            (b0 == 0xE2)
            & (b1 == 0x80)
            & (((b2 >= 0x80) & (b2 <= 0x8A)) | (b2 == 0xA8) | (b2 == 0xA9) | (b2 == 0xAF))
        )
        | ((b0 == 0xE2) & (b1 == 0x81) & (b2 == 0x9F))
        | ((b0 == 0xE3) & (b1 == 0x80) & (b2 == 0x80))
    )
    dstart = np.flatnonzero(is1 | is2 | is3)
    dlen = np.where(is1[dstart], 1, np.where(is2[dstart], 2, 3)).astype(np.int64)
    dend = dstart + dlen
    # delimiters per doc (delimiter spans never straddle doc boundaries)
    d_per_doc = np.searchsorted(dstart, doc_offs[1:]) - np.searchsorted(
        dstart, doc_offs[:-1]
    )
    counts = d_per_doc + 1  # tokens per doc == delimiters + 1
    total = int(counts.sum())
    tok_bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_bounds[1:])
    starts = np.empty(total, dtype=np.int64)
    ends = np.empty(total, dtype=np.int64)
    first_idx = tok_bounds[:-1]
    last_idx = tok_bounds[1:] - 1
    # token j>0 starts where delimiter j-1 ends; token 0 starts at doc start
    not_first = np.ones(total, dtype=bool)
    not_first[first_idx] = False
    starts[first_idx] = doc_offs[:-1]
    starts[not_first] = dend  # delimiters are in (doc, position) order
    # token j<last ends where delimiter j starts; last token ends at doc end
    not_last = np.ones(total, dtype=bool)
    not_last[last_idx] = False
    ends[last_idx] = doc_offs[1:]
    ends[not_last] = dstart
    rel_starts = starts - np.repeat(doc_offs[:-1], counts)
    return rel_starts, ends - starts, counts


@dataclass(frozen=True)
class StandardAnalyzer:
    """tokenize -> lowercase -> stopword-drop with position accumulation."""

    stop_words: frozenset = DEFAULT_STOP_WORDS
    lowercase: bool = True
    # Added to the position counter BETWEEN values of a multi-valued field
    # (list<string> column): Analyzer.GetPositionIncrementGap, reference
    # default 0 (/root/reference/core/analysis/analyzer.go:123-125; applied
    # per value instance in defaultindexingchain.go:839). Set >0 (Lucene
    # users commonly pick 100) to keep phrases from matching across values.
    position_increment_gap: int = 0
    # Added to the OFFSET counter between values of a multi-valued field:
    # Analyzer.GetOffsetGap, reference default 1
    # (/root/reference/core/analysis/analyzer.go:127-129). The counter a
    # value ends at is the scanner's final ``slow`` — the reported START
    # of the value's last raw token (tokenizer EOF branch sets
    # SetOffset(slow, slow+0), standard/tokenizer.go:40-46, and
    # invertState.Offset += EndOffset() + GetOffsetGap(),
    # defaultindexingchain.go:833-841).
    offset_gap: int = 1

    # ---------------- row-at-a-time (reference-exact, incl. offsets) -------

    def tokenize_raw(self, text: str) -> list[str]:
        """Raw token stream: split on every single whitespace char (empties kept)."""
        return _SPLIT_RE.split(text)

    def analyze(self, text: str) -> AnalyzedDoc:
        raw = self.tokenize_raw(text)
        # Reconstruct the delimiter byte lengths for the offset quirk.
        delims = _SPLIT_RE.findall(text)
        starts, ends, keep_terms, keep_pos = [], [], [], []
        slow = 0
        for i, tok in enumerate(raw):
            nbytes = len(tok.encode("utf-8"))
            term = tok.lower() if self.lowercase else tok
            if term not in self.stop_words:
                keep_terms.append(term)
                keep_pos.append(i)
                starts.append(slow)
                ends.append(slow + nbytes)
            if i < len(delims):
                # fast += token bytes + delimiter bytes, then fast++ (quirk)
                slow += nbytes + len(delims[i].encode("utf-8")) + 1
        n = len(keep_terms)
        return AnalyzedDoc(
            terms=keep_terms,
            positions=np.asarray(keep_pos, dtype=np.int32),
            starts=np.asarray(starts, dtype=np.int32),
            ends=np.asarray(ends, dtype=np.int32),
            length=n,
            norm=n,
        )

    # ---------------- vectorized batch path (the hot path) -----------------

    def analyze_column(
        self, texts: pa.Array | pa.ChunkedArray, emit_offsets: bool = False
    ) -> dict:
        """Vectorized analysis of a column of documents.

        Returns flattened arrays over all *kept* tokens plus per-doc norms:

        - ``doc_idx``   int32 — row index within the batch for each token
        - ``terms``     pa.LargeStringArray — analyzed term per token
        - ``positions`` int32 — full-stream position per token
        - ``norms``     int64 — per-doc kept-token count (len == batch rows)
        - with ``emit_offsets``: ``starts``/``ends`` int32 byte offsets per
          kept token, replicating the reference's slow/fast counter quirk
          (start of token i = actual byte offset + i; tokenizer.go:168-170)
          — computed by the vectorized buffer scan, exact vs ``analyze``.

        Null text rows produce no tokens and norm 0 (field absent).

        A list<string> column is a MULTI-VALUED field: every doc's values
        are analyzed in sequence with ``position_increment_gap`` added to
        the position counter between values (defaultindexingchain.go:839),
        so positions stay monotone per doc and phrases never silently
        span values when a gap is configured.
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_list(texts.type) or pa.types.is_large_list(texts.type):
            return self._analyze_column_multi(texts, emit_offsets)
        n_docs = len(texts)
        empty = {
            "doc_idx": np.empty(0, np.int32),
            "terms": pa.array([], type=pa.large_string()),
            "positions": np.empty(0, np.int32),
            "norms": np.zeros(n_docs, np.int64),
            "raw_counts": np.zeros(n_docs, np.int64),
        }
        if emit_offsets:
            empty["starts"] = np.empty(0, np.int32)
            empty["ends"] = np.empty(0, np.int32)
            empty["final_offsets"] = np.zeros(n_docs, np.int64)
        if n_docs == 0:
            return empty
        texts = texts.cast(pa.large_string())
        null_mask = texts.is_null().to_numpy(zero_copy_only=False)
        has_null = bool(null_mask.any())
        if has_null:
            texts = pc.fill_null(texts, "")
        toks = pc.split_pattern_regex(texts, GO_WHITESPACE_CLASS)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        flat = pc.list_flatten(toks)
        if self.lowercase:
            flat = pc.utf8_lower(flat)
        total = len(flat)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int32), counts)
        positions = (
            np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts)
        ).astype(np.int32)
        starts = ends = None
        final_offsets = None
        if emit_offsets:
            rel_starts, tok_bytes, off_counts = _token_byte_offsets(texts)
            assert np.array_equal(off_counts, counts), "scanner disagreement"
            # slow/fast quirk: +1 per preceding delimiter == + token index
            starts = (rel_starts + positions.astype(np.int64)).astype(np.int32)
            ends = (starts + tok_bytes).astype(np.int32)
            # the offset counter each value ENDS at (scanner final `slow`):
            # reported start of the last raw token = its actual byte start
            # + its token index — what a multi-valued field's next value
            # adds to its offset base (plus offset_gap)
            final_offsets = rel_starts[np.cumsum(counts) - 1] + (counts - 1)
            if has_null:
                final_offsets = np.where(null_mask, 0, final_offsets)
        keep = None
        if has_null:
            keep = ~null_mask[doc_idx]
        if self.stop_words:
            stop_arr = pa.array(sorted(self.stop_words), type=pa.large_string())
            drop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
            keep = ~drop if keep is None else (keep & ~drop)
        if keep is not None:
            doc_idx = doc_idx[keep]
            positions = positions[keep]
            flat = flat.filter(pa.array(keep))
            if emit_offsets:
                starts = starts[keep]
                ends = ends[keep]
        norms = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        out = {
            "doc_idx": doc_idx,
            "terms": flat,
            "positions": positions,
            "norms": norms,
            # raw (pre-filter) stream length per doc — the position counter
            # a value ends at; null rows have NO stream, not an empty one
            "raw_counts": (
                np.where(null_mask, 0, counts) if has_null else counts
            ).astype(np.int64),
        }
        if emit_offsets:
            out["starts"] = starts
            out["ends"] = ends
            out["final_offsets"] = final_offsets.astype(np.int64)
        return out

    def _analyze_column_multi(self, lists: pa.Array, emit_offsets: bool) -> dict:
        """Multi-valued (list<string>) field analysis: flatten values, run
        the scalar path once over ALL values of the batch, then lift each
        token's position by its value's per-doc base offset
        base(value j) = sum over previous values of (raw_token_count + gap)
        — exactly the reference invert loop, whose position counter ends a
        value at its raw stream length (End() adds trailing-stopword
        increments) and then adds GetPositionIncrementGap
        (defaultindexingchain.go:830-840). Null values inside a list and
        null list rows contribute nothing.

        With ``emit_offsets``, byte offsets accumulate across values the
        same way: a value ends the offset counter at the scanner's final
        ``slow`` (the reported start of its last raw token — the tokenizer
        EOF branch sets SetOffset(slow, slow+0), standard/tokenizer.go:
        40-46) and the next value's base adds that plus ``offset_gap``
        (invertState.Offset += EndOffset() + GetOffsetGap(),
        defaultindexingchain.go:833-841)."""
        n_docs = len(lists)
        vcounts = (
            pc.fill_null(pc.list_value_length(lists), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        values = pc.list_flatten(lists)
        per_val = self.analyze_column(values, emit_offsets)
        n_vals = len(values)
        # value -> doc (valid rows only; flatten skipped null lists)
        val_doc = np.repeat(np.arange(n_docs, dtype=np.int64), vcounts)
        # exclusive running position base per value, reset per doc
        adv = per_val["raw_counts"] + int(self.position_increment_gap)
        gbase = np.zeros(n_vals, dtype=np.int64)
        np.cumsum(adv[:-1], out=gbase[1:] if n_vals else gbase[:0])
        first_val = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(vcounts, out=first_val[1:])
        base = gbase - gbase[first_val[:-1][val_doc]] if n_vals else gbase
        tok_val = per_val["doc_idx"].astype(np.int64)
        out = {
            "doc_idx": val_doc[tok_val].astype(np.int32),
            "terms": per_val["terms"],
            "positions": (
                per_val["positions"].astype(np.int64) + base[tok_val]
            ).astype(np.int32),
            "norms": np.bincount(
                val_doc[tok_val], minlength=n_docs
            ).astype(np.int64),
            "raw_counts": np.bincount(
                val_doc, weights=per_val["raw_counts"], minlength=n_docs
            ).astype(np.int64),
        }
        if emit_offsets:
            # exclusive running OFFSET base per value, reset per doc —
            # same shape as the position base above but advancing by
            # (value-final offset counter + offset_gap)
            adv_off = per_val["final_offsets"] + int(self.offset_gap)
            obase = np.zeros(n_vals, dtype=np.int64)
            np.cumsum(adv_off[:-1], out=obase[1:] if n_vals else obase[:0])
            if n_vals:
                obase = obase - obase[first_val[:-1][val_doc]]
            out["starts"] = (
                per_val["starts"].astype(np.int64) + obase[tok_val]
            ).astype(np.int32)
            out["ends"] = (
                per_val["ends"].astype(np.int64) + obase[tok_val]
            ).astype(np.int32)
            # per-VALUE stream bases (position counter / offset counter at
            # each value's start, reset per doc) — persisted by the build
            # as the inversion table that maps a stored stream offset back
            # to (value index, actual byte offset): the Matches/offsets-
            # mode highlighter surface for multi-valued fields.
            out["value_doc"] = val_doc
            out["value_pos_base"] = base
            out["value_off_base"] = obase
        return out


@dataclass(frozen=True)
class LengthFilter:
    """Drop tokens outside [min_len, max_len] codepoints — the reference
    analysis-module LengthFilter (FilteringTokenFilter subclass: dropped
    tokens accumulate position increments like stopwords)."""

    min_len: int = 1
    max_len: int = 255

    def keep(self, term: str) -> bool:
        return self.min_len <= len(term) <= self.max_len


@dataclass(frozen=True)
class ASCIIFoldingFilter:
    """Fold Latin diacritics to ASCII (NFKD strip) — the public
    ASCIIFoldingFilter behavior for the Latin ranges."""

    def map(self, term: str) -> str:
        import unicodedata

        return "".join(
            c
            for c in unicodedata.normalize("NFKD", term)
            if not unicodedata.combining(c)
        )


@dataclass(frozen=True)
class CustomAnalyzer:
    """Composable tokenizer + filter chain — the Analyzer/
    ComponentsBuilder.CreateComponents extension surface
    (/root/reference/core/analysis/analyzer.go:66-68): map filters rewrite
    terms, keep filters drop them with stopword-style position
    accumulation (filteringtokenfilter.go:37-66). The chain runs in
    declaration order, mirroring TokenFilter decorator nesting.

    ``map_filters``: objects with ``map(term) -> term``;
    ``keep_filters``: objects with ``keep(term) -> bool``.
    """

    lowercase: bool = True
    stop_words: frozenset = frozenset()
    map_filters: tuple = ()
    keep_filters: tuple = ()

    def analyze(self, text: str) -> AnalyzedDoc:
        raw = _SPLIT_RE.split(text)
        terms, positions = [], []
        for i, tok in enumerate(raw):
            term = tok.lower() if self.lowercase else tok
            for f in self.map_filters:
                term = f.map(term)
            if term in self.stop_words:
                continue
            if any(not f.keep(term) for f in self.keep_filters):
                continue
            terms.append(term)
            positions.append(i)
        n = len(terms)
        return AnalyzedDoc(
            terms=terms,
            positions=np.asarray(positions, dtype=np.int32),
            starts=np.zeros(n, np.int32),
            ends=np.zeros(n, np.int32),
            length=n,
            norm=n,
        )

    def analyze_column(self, texts: pa.Array | pa.ChunkedArray) -> dict:
        """Vectorized chain: arrow split/lower, then per-UNIQUE-term filter
        evaluation (the dictionary trick: filters run once per distinct
        term, not once per token occurrence)."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        if n_docs == 0:
            return {
                "doc_idx": np.empty(0, np.int32),
                "terms": pa.array([], type=pa.large_string()),
                "positions": np.empty(0, np.int32),
                "norms": np.zeros(0, np.int64),
            }
        texts = pc.fill_null(texts.cast(pa.large_string()), "")
        toks = pc.split_pattern_regex(texts, GO_WHITESPACE_CLASS)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        flat = pc.list_flatten(toks)
        if self.lowercase:
            flat = pc.utf8_lower(flat)
        total = len(flat)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int32), counts)
        positions = (
            np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts)
        ).astype(np.int32)
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = de.dictionary.to_pylist()
        mapped, kept = [], np.ones(len(vocab), dtype=bool)
        for vi, term in enumerate(vocab):
            for f in self.map_filters:
                term = f.map(term)
            mapped.append(term)
            if term in self.stop_words or any(
                not f.keep(term) for f in self.keep_filters
            ):
                kept[vi] = False
        keep = kept[codes]
        doc_idx = doc_idx[keep]
        positions = positions[keep]
        terms = pa.array(
            [mapped[c] for c in codes[keep]], type=pa.large_string()
        )
        return {
            "doc_idx": doc_idx,
            "terms": terms,
            "positions": positions,
            "norms": np.bincount(doc_idx, minlength=n_docs).astype(np.int64),
        }


@dataclass(frozen=True)
class WhitespaceAnalyzer(StandardAnalyzer):
    """Tokenizer only — no lowercase, no stopwords (the reference
    WhitespaceTokenizer, `analysis/common/analysis/core/whitespacetokenizer.go`,
    shares the same single-char-split scanner semantics)."""

    stop_words: frozenset = frozenset()
    lowercase: bool = False


@dataclass(frozen=True)
class KeywordAnalyzer:
    """Untokenized field -> exactly one token at position 0, offsets [0, len)
    (reference StringTokenStream, /root/reference/core/document/field.go:119-237)."""

    def analyze(self, text: str) -> AnalyzedDoc:
        nbytes = len(text.encode("utf-8"))
        return AnalyzedDoc(
            terms=[text],
            positions=np.zeros(1, np.int32),
            starts=np.zeros(1, np.int32),
            ends=np.asarray([nbytes], np.int32),
            length=1,
            norm=1,
        )

    def analyze_column(self, texts: pa.Array | pa.ChunkedArray) -> dict:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        null_mask = texts.is_null().to_numpy(zero_copy_only=False)
        keep = ~null_mask
        doc_idx = np.arange(n, dtype=np.int32)[keep]
        return {
            "doc_idx": doc_idx,
            "terms": texts.cast(pa.large_string()).filter(pa.array(keep)),
            "positions": np.zeros(int(keep.sum()), np.int32),
            "norms": keep.astype(np.int64),
        }
