"""Posting payloads — the reference's per-position payload surface
(/root/reference/core/index/freqproxtermswriterperfield.go:124-218
encodes a hasPayload bit into the prox stream; the attribute carrier is
core/util/attribute/packedtoken.go PayloadAttribute).

Re-expressed for the vectorized engine: a payload is a per-OCCURRENCE
int32 produced by a named VECTORIZED function over the analyzer's token
arrays (``IndexConfig.payload_kind`` — the PayloadAttribute-filter
analogue; a Python per-token callback would be the slowest construct in
the build). Storage is a segment-local side table
(``payloads.parquet``: term, ord, payloads list<int32>, term-sorted so
parquet row-group statistics prune term lookups), exactly like the
offsets stream — never shuffled; payload readers resolve global docID ->
(segment, ord) first. Values align 1:1 with the occurrence order of the
positions stream.

Built-in kinds:

- ``token_bytes``: the raw (pre-lowercase) token's UTF-8 byte length —
  a classic payload demo value that is NOT derivable from the analyzed
  term (multi-byte characters and case folding change lengths), yet is
  exactly recomputable by the DuckDB oracle (octet_length of the raw
  token), which makes the whole payload path value-hash-checkable.
"""

from __future__ import annotations

import numpy as np


def _token_bytes(tok: dict) -> np.ndarray:
    """Raw token byte length per kept occurrence: the quirk-encoded
    start/end offsets carry the SAME per-token shift (reported = actual +
    token index, tokenizer.go:168-170), so end - start is the actual
    byte length."""
    return (
        tok["ends"].astype(np.int64) - tok["starts"].astype(np.int64)
    ).astype(np.int32)


PAYLOAD_FUNCS = {
    "token_bytes": _token_bytes,
}


def payload_values(kind: str, tok: dict) -> np.ndarray:
    fn = PAYLOAD_FUNCS.get(kind)
    if fn is None:
        raise ValueError(
            f"unknown payload_kind {kind!r}; registered: "
            f"{sorted(PAYLOAD_FUNCS)}"
        )
    return fn(tok)
