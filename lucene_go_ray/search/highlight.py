"""Highlighting — snippet extraction around query-term hits.

The classic Lucene highlighter re-analyzes the stored text per hit doc
(lucene's highlighter module; the reference repo ships only the core, so
this is an extension surface like PhraseQuery). Two modes, mirroring
Lucene's two highlighters:

- ``highlight`` (default): re-analyze the stored text with the index's
  analyzer and compute ACTUAL byte offsets with the vectorized scanner —
  works on any index whose source parquet still holds the text (stored
  fields are the source files here).
- ``use_offsets=True`` (FastVectorHighlighter analogue): read the
  persisted offsets side table (``index_offsets=True`` builds) and
  recover actual byte offsets from the quirk-encoded stream (reported
  start = actual start + token index, tokenizer.go:168-170; the token
  index of occurrence j IS its position, so actual = reported − position).

Fragments: hits are merged into windows of ``window`` bytes; fragments
rank by hit count (then earliest), top ``max_fragments`` returned with
``pre``/``post`` tags wrapped around each hit, sliced on UTF-8 byte
boundaries (token offsets are always boundary-aligned).
"""

from __future__ import annotations

import numpy as np

from ..analysis.analyzer import _SPLIT_RE


def _actual_hit_offsets_reanalyze(
    text: str, terms: set, lowercase: bool
) -> list[tuple[int, int]]:
    """(start_byte, end_byte) of every raw token whose analyzed form is in
    ``terms`` — actual offsets (no quirk), via one pass over the split."""
    raw = _SPLIT_RE.split(text)
    delims = _SPLIT_RE.findall(text)
    out = []
    pos = 0
    for i, tok in enumerate(raw):
        nb = len(tok.encode("utf-8"))
        term = tok.lower() if lowercase else tok
        if term in terms:
            out.append((pos, pos + nb))
        pos += nb + (len(delims[i].encode("utf-8")) if i < len(delims) else 0)
    return out


def _actual_hit_offsets_from_index(searcher, doc_id: int, terms: set):
    """Per-VALUE actual byte offsets of every term hit, resolved entirely
    from the index via the Matches machinery (searcher.match_regions:
    positions postings + offsets stream + persisted per-value stream
    bases). Works on single- AND multi-valued fields — the quirk and gap
    accumulations invert exactly through the value-base table. Returns
    {value_idx: [(start, end), ...]}."""
    by_value: dict[int, list] = {}
    for v, a, b, _p, _t in searcher.match_regions(doc_id, terms):
        by_value.setdefault(v, []).append((a, b))
    return by_value


def highlight(
    searcher,
    doc_id: int,
    terms,
    *,
    text_column: str | None = None,
    max_fragments: int = 3,
    window: int = 80,
    pre: str = "<b>",
    post: str = "</b>",
    use_offsets: bool = False,
) -> list[str]:
    """Top fragments of ``doc_id``'s text with query-term hits tagged.

    ``terms`` are analyzed-form terms (what the query matched on)."""
    col = text_column or searcher.cfg.text_column
    text = searcher.document(doc_id, columns=[col])[col]
    if text is None:
        return []
    tset = set(terms)
    multi = isinstance(text, (list, tuple, np.ndarray))
    values = list(text) if multi else [text]
    off_hits = None
    if use_offsets:
        try:
            off_hits = _actual_hit_offsets_from_index(searcher, doc_id, tset)
        except FileNotFoundError:
            # index built without index_offsets: fall back to re-analysis
            # (the pre-Matches behaviour) instead of failing the call
            off_hits = None
    ranked: list[tuple[int, int, str]] = []
    for vi, v in enumerate(values):
        if v is None:
            continue
        if off_hits is not None:
            hits = off_hits.get(vi, [])
        else:
            hits = _actual_hit_offsets_reanalyze(
                v, tset, searcher.cfg.lowercase
            )
        ranked.extend(_fragments(v, sorted(hits), window, pre, post))
    # rank across values: most hits first, then earliest
    ranked.sort(key=lambda f: (-f[0], f[1]))
    return [f[2] for f in ranked[:max_fragments]]


def _fragments(
    text: str, hits, window: int, pre: str, post: str
) -> list[tuple[int, int, str]]:
    """(n_hits, start_byte, snippet) fragments of one text value."""
    if not hits:
        return []
    data = text.encode("utf-8")
    n = len(data)
    # merge hits into fragment windows
    frags = []  # (lo, hi, [hit spans])
    for s, e in hits:
        lo = max(0, s - window // 2)
        hi = min(n, e + window // 2)
        if frags and lo <= frags[-1][1]:
            frags[-1] = (frags[-1][0], max(frags[-1][1], hi), frags[-1][2] + [(s, e)])
        else:
            frags.append((lo, hi, [(s, e)]))
    out = []
    for lo, hi, spans in frags:
        # snap to UTF-8 boundaries (token offsets already are; the window
        # padding might not be)
        while lo > 0 and (data[lo] & 0xC0) == 0x80:
            lo -= 1
        while hi < n and (data[hi] & 0xC0) == 0x80:
            hi += 1
        piece = data[lo:hi]
        for s, e in sorted(spans, reverse=True):
            piece = (
                piece[: s - lo]
                + pre.encode()
                + piece[s - lo : e - lo]
                + post.encode()
                + piece[e - lo :]
            )
        out.append((len(spans), lo, piece.decode("utf-8")))
    return out
