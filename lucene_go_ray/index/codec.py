"""Posting-list codec: FOR (frame-of-reference) delta bit-packing + block-max.

Plays the role of the reference's posting encodings — FreqProx byte-slice
VInt streams at index time (/root/reference/core/index/freqproxtermswriterperfield.go:124-218)
and the SimpleText skip/impact structure at codec time
(/root/reference/codecs/simpletext/fieldswriter.go:75-278, skipwriter.go:116-127)
— re-expressed as numpy-vectorized fixed-width bit-packed blocks, which is
the modern Lucene (FOR/PForDelta) layout the north star asks for:

- doc IDs: per-block delta encoding (first delta is from the previous
  block's last doc, -1 base for the first block), packed at the block's
  minimal bit width;
- term frequencies: per-block packed at minimal width;
- per-posting norm bytes (``norm & 0xFF`` — the only bits BM25 scoring ever
  reads, see similaritybm25.go:235-246) packed at 8 bits so scoring streams
  postings without a per-doc norms lookup;
- block metadata: last_doc, max_freq, min_norm8 per block == the
  block-max (impact) data that powers WAND pruning, the analogue of
  CompetitiveImpactAccumulator's (freq, norm) frontier
  (/root/reference/core/index/competitiveimpactaccumulator.go:88-132).

BLOCK_SIZE is 128 docs (Lucene 8 geometry) — the reference's SimpleText
codec uses 8 (skipwriter.go:13-18) only because it is a debug codec.

Positions are delta-encoded within each (term, doc) posting and bit-packed
at a single per-chunk width (counts recoverable from freqs).

All encode/decode paths are pure numpy — no per-row Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128

_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints < 2**width into a little-endian bitstream."""
    if width == 0 or len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)).astype(
        np.uint8
    )
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def bitunpack(buf: bytes, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`bitpack` → uint64 array of ``count`` values."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=count * width, bitorder="little"
    ).reshape(count, width)
    return bits.astype(np.uint64) @ _POW2[:width]


def _bit_width(maxval: int) -> int:
    return int(maxval).bit_length()


def _blockwise_pack(values: np.ndarray, block: int) -> tuple[bytes, np.ndarray]:
    """Pack ``values`` in blocks of ``block`` at per-block minimal widths.

    Returns (blob, widths uint8 per block). Blob is the concatenation of the
    per-block packed streams (byte-aligned per block).
    """
    n = len(values)
    nblocks = (n + block - 1) // block
    widths = np.zeros(nblocks, dtype=np.uint8)
    parts = []
    for b in range(nblocks):
        chunk = values[b * block : (b + 1) * block]
        w = _bit_width(int(chunk.max())) if len(chunk) else 0
        widths[b] = w
        parts.append(bitpack(chunk, w))
    return b"".join(parts), widths


def _blockwise_unpack(
    blob: bytes, widths: np.ndarray, count: int, block: int
) -> np.ndarray:
    out = np.empty(count, dtype=np.uint64)
    off = 0
    for b, w in enumerate(widths):
        n = min(block, count - b * block)
        nbytes = (n * int(w) + 7) // 8
        out[b * block : b * block + n] = bitunpack(blob[off : off + nbytes], int(w), n)
        off += nbytes
    return out


@dataclass
class PostingBlob:
    """Encoded postings for one term chunk (maps 1:1 to parquet columns)."""

    doc_freq: int
    total_term_freq: int
    first_doc: int
    last_doc: int
    docs_blob: bytes
    doc_widths: bytes  # uint8 per block
    freqs_blob: bytes
    freq_widths: bytes  # uint8 per block
    norms_blob: bytes  # norm8 per posting, width 8
    block_last: bytes  # int64 per block (absolute doc ids)
    block_max_freq: bytes  # uint32 per block
    block_min_norm: bytes  # uint8 per block (min of norm & 0xFF)
    pos_blob: bytes  # delta positions, single width
    pos_width: int

    def to_row(self) -> dict:
        return {
            "doc_freq": self.doc_freq,
            "total_term_freq": self.total_term_freq,
            "first_doc": self.first_doc,
            "last_doc": self.last_doc,
            "docs_blob": self.docs_blob,
            "doc_widths": self.doc_widths,
            "freqs_blob": self.freqs_blob,
            "freq_widths": self.freq_widths,
            "norms_blob": self.norms_blob,
            "block_last": self.block_last,
            "block_max_freq": self.block_max_freq,
            "block_min_norm": self.block_min_norm,
            "pos_blob": self.pos_blob,
            "pos_width": self.pos_width,
        }


def encode_postings(
    docs: np.ndarray,
    freqs: np.ndarray,
    norms8: np.ndarray,
    positions: np.ndarray | None = None,
    block: int = BLOCK_SIZE,
) -> PostingBlob:
    """Encode one term's postings.

    ``docs`` strictly-increasing int64 doc ids; ``freqs`` int per doc;
    ``norms8`` = (norm & 0xFF) per doc; ``positions`` flattened ascending
    positions per doc, concatenated in doc order (len == freqs.sum()),
    or None when positions are not indexed.
    """
    docs = np.asarray(docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norms8 = np.asarray(norms8, dtype=np.uint8)
    n = len(docs)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docs[0] + 1  # delta from virtual previous doc -1
    np.subtract(docs[1:], docs[:-1], out=deltas[1:], casting="unsafe")
    docs_blob, doc_widths = _blockwise_pack(deltas, block)
    freqs_blob, freq_widths = _blockwise_pack(freqs.astype(np.uint64), block)
    norms_blob = norms8.tobytes()
    nblocks = len(doc_widths)
    pad = (-n) % block
    if pad:
        fpad = np.pad(freqs, (0, pad))
        npad = np.pad(norms8, (0, pad), constant_values=255)
        dpad = np.pad(docs, (0, pad), constant_values=docs[-1])
    else:
        fpad, npad, dpad = freqs, norms8, docs
    block_last = dpad.reshape(nblocks, block)[:, -1].astype(np.int64)
    block_max_freq = fpad.reshape(nblocks, block).max(axis=1).astype(np.uint32)
    block_min_norm = npad.reshape(nblocks, block).min(axis=1).astype(np.uint8)
    if positions is not None and len(positions):
        positions = np.asarray(positions, dtype=np.int64)
        # delta within each doc: pos[0] raw, then diffs; doc boundaries from freqs
        pdelta = np.diff(positions, prepend=0)
        starts = np.zeros(n, dtype=np.int64)
        starts[1:] = np.cumsum(freqs)[:-1]
        pdelta[starts] = positions[starts]
        w = _bit_width(int(pdelta.max())) if len(pdelta) else 0
        pos_blob, pos_width = bitpack(pdelta.astype(np.uint64), w), w
    else:
        pos_blob, pos_width = b"", 0
    return PostingBlob(
        doc_freq=int(n),
        total_term_freq=int(freqs.sum()),
        first_doc=int(docs[0]),
        last_doc=int(docs[-1]),
        docs_blob=docs_blob,
        doc_widths=doc_widths.tobytes(),
        freqs_blob=freqs_blob,
        freq_widths=freq_widths.tobytes(),
        norms_blob=norms_blob,
        block_last=block_last.tobytes(),
        block_max_freq=block_max_freq.tobytes(),
        block_min_norm=block_min_norm.tobytes(),
        pos_blob=pos_blob,
        pos_width=pos_width,
    )


def decode_docs_freqs_norms(
    row: dict, block: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (docs int64, freqs int64, norms8 uint8) from a postings row."""
    n = int(row["doc_freq"])
    doc_widths = np.frombuffer(row["doc_widths"], dtype=np.uint8)
    deltas = _blockwise_unpack(row["docs_blob"], doc_widths, n, block)
    docs = np.cumsum(deltas.astype(np.int64)) - 1
    freq_widths = np.frombuffer(row["freq_widths"], dtype=np.uint8)
    freqs = _blockwise_unpack(row["freqs_blob"], freq_widths, n, block).astype(np.int64)
    norms8 = np.frombuffer(row["norms_blob"], dtype=np.uint8)
    return docs, freqs, norms8


def decode_positions(row: dict, freqs: np.ndarray) -> np.ndarray:
    """Decode flattened absolute positions (len == freqs.sum())."""
    total = int(freqs.sum())
    pdelta = bitunpack(row["pos_blob"], int(row["pos_width"]), total).astype(np.int64)
    n = len(freqs)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(freqs)[:-1]
    # segmented cumsum: cumsum over all, then subtract carry-over before each doc
    csum = np.cumsum(pdelta)
    carry = np.zeros(total, dtype=np.int64)
    carry[starts[1:]] = csum[starts[1:] - 1]
    positions = csum - np.maximum.accumulate(carry)
    return positions


def block_metadata(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(block_last int64, block_max_freq uint32, block_min_norm uint8)."""
    return (
        np.frombuffer(row["block_last"], dtype=np.int64),
        np.frombuffer(row["block_max_freq"], dtype=np.uint32),
        np.frombuffer(row["block_min_norm"], dtype=np.uint8),
    )
