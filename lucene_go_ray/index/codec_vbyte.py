"""VByte postings codec — a second registered format for the codec SPI.

The reference resolves codecs by NAME from segment metadata (the SimpleText
codec registers "SimpleText", /root/reference/codecs/simpletext/codec.go;
readers look the name up again at open). This module is the proof that our
registry (codec.register_codec / get_codec) is a real plug-in slot and not
a renamed constant: a genuinely different byte-level postings format that
round-trips through the SAME build / merge / search machinery — an index
built with ``IndexConfig(codec_name="vbyte128")`` is rank-identical to a
``for128`` index (asserted in tests/test_codec_vbyte.py).

Format: classic LEB128-style variable-byte — 7 payload bits per byte, high
bit set on every byte except the last of a value (the VInt of the
reference's DataOutput, /root/reference/core/store/dataoutput.go:33-49,
which FreqProx byte-slices use at index time). Streams stay blocked at 128
docs for block-max WAND: block metadata (last_doc / max_freq / min_norm)
is identical to for128; the per-block *byte length* of the docs/freqs
streams is recorded (uint16 LE each) in the ``doc_widths``/``freq_widths``
columns — same parquet schema, different interpretation — so selective
block decode (``decode_row_blocks``) still preads only visited blocks.

Encode and decode are pure numpy (terminator-bit scan + ``reduceat``); no
per-value Python anywhere.
"""

from __future__ import annotations

import numpy as np

from .codec import (
    BLOCK_SIZE,
    PostingsCodec,
    _seg_local_idx,
    block_metadata,  # metadata layout is shared with for128
    register_codec,
    row_blob,
    row_blob_gather,
)

# ---------------------------------------------------------------------------
# core VByte kernels
# ---------------------------------------------------------------------------


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value: ceil(bit_length/7), minimum 1."""
    v = np.asarray(values, dtype=np.uint64)
    n = np.ones(len(v), dtype=np.int64)
    thresh = np.uint64(1) << np.uint64(7)
    # values < 2^7 take 1 byte, < 2^14 take 2, ... (<=10 for 64-bit)
    for k in range(1, 10):
        more = v >= thresh
        if not more.any():
            break
        n[more] = k + 1
        if 7 * (k + 1) >= 64:
            break
        thresh = thresh << np.uint64(7)
    return n


def vbyte_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode uint64 values → (uint8 stream, per-value byte lengths)."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nb = vbyte_lengths(v)
    byte_idx = _seg_local_idx(nb)  # 0..nb-1 within each value
    val_idx = np.repeat(np.arange(len(v)), nb)
    payload = (v[val_idx] >> (np.uint64(7) * byte_idx.astype(np.uint64))) & np.uint64(
        0x7F
    )
    out = payload.astype(np.uint8)
    cont = byte_idx < (nb[val_idx] - 1)
    out[cont] |= 0x80
    return out, nb


def vbyte_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a full VByte stream → uint64 values (terminator-bit scan)."""
    buf = np.asarray(buf, dtype=np.uint8)
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    if buf[-1] >= 0x80:  # final byte must terminate a value
        raise ValueError(
            "truncated vbyte stream: last byte has the continuation bit set"
        )
    ends = np.flatnonzero(buf < 0x80)  # last byte of each value
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    byte_idx = np.arange(len(buf), dtype=np.int64) - np.repeat(starts, lengths)
    shifted = (buf.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * byte_idx.astype(np.uint64)
    )
    return np.add.reduceat(shifted, starts)


def _block_byte_lengths(
    nb: np.ndarray, bstart: np.ndarray, bcount: np.ndarray
) -> np.ndarray:
    """Sum per-value byte lengths over each block's value range."""
    c = np.concatenate([[0], np.cumsum(nb)])
    return c[bstart + bcount] - c[bstart]


def _segmented_cumsum(
    deltas: np.ndarray, counts: np.ndarray, bases: np.ndarray | int
) -> np.ndarray:
    """Per-segment cumulative sum of ``deltas`` (segments sized by
    ``counts``) offset by per-segment ``bases`` (scalar or array) — the
    one delta-reconstruction kernel behind docs (base -1), positions
    (base 0) and selective block decode (base = previous block's last
    doc)."""
    starts = np.cumsum(counts) - counts
    c = np.cumsum(deltas.astype(np.int64))
    carry = c[starts] - deltas[starts].astype(np.int64)
    if isinstance(bases, np.ndarray):
        base_rep = np.repeat(bases, counts)
    else:
        base_rep = np.int64(bases)
    return c - np.repeat(carry, counts) + base_rep


# ---------------------------------------------------------------------------
# codec entry points (same signatures / column names as for128)
# ---------------------------------------------------------------------------


def encode_postings_many(
    docs: np.ndarray,
    freqs: np.ndarray,
    norms8: np.ndarray,
    offsets: np.ndarray,
    positions: np.ndarray | None = None,
    block: int = BLOCK_SIZE,
) -> dict:
    docs = np.asarray(docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norms8 = np.asarray(norms8, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    counts = np.diff(offsets)
    if (counts <= 0).any():
        raise ValueError("every term slice must be non-empty")
    T = len(counts)
    starts = offsets[:-1]
    n = len(docs)

    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = docs[1:].astype(np.uint64) - docs[:-1].astype(np.uint64)
    deltas[starts] = (docs[starts] + 1).astype(np.uint64)  # base = doc -1

    nblocks = (counts + block - 1) // block
    bt = np.repeat(np.arange(T), nblocks)
    bi = _seg_local_idx(nblocks)
    bcount = np.minimum(block, counts[bt] - bi * block)
    bstart = starts[bt] + bi * block

    docs_buf, d_nb = vbyte_encode(deltas)
    freqs_buf, f_nb = vbyte_encode(freqs.astype(np.uint64))
    dblk = _block_byte_lengths(d_nb, bstart, bcount)
    fblk = _block_byte_lengths(f_nb, bstart, bcount)
    if (dblk > 0xFFFF).any() or (fblk > 0xFFFF).any():
        raise ValueError("vbyte block exceeds uint16 byte length")

    block_last = docs[bstart + bcount - 1].astype(np.int64)
    block_max_freq = np.maximum.reduceat(freqs, bstart).astype(np.uint32)
    block_min_norm = np.minimum.reduceat(norms8, bstart).astype(np.uint8)

    ttf = np.add.reduceat(freqs, starts).astype(np.int64)
    if positions is not None:
        positions = np.asarray(positions, dtype=np.int64)
        pdelta = np.empty(len(positions), dtype=np.int64)
        pdelta[1:] = positions[1:] - positions[:-1]
        pstarts = np.cumsum(freqs) - freqs
        pdelta[pstarts] = positions[pstarts]
        pos_buf, p_nb = vbyte_encode(pdelta.astype(np.uint64))
        pos_off_vals = np.cumsum(ttf) - ttf
        pc = np.concatenate([[0], np.cumsum(p_nb)])
        term_posbytes = pc[pos_off_vals + ttf] - pc[pos_off_vals]
    else:
        pos_buf = np.zeros(0, dtype=np.uint8)
        term_posbytes = np.zeros(T, dtype=np.int64)

    dc = np.concatenate([[0], np.cumsum(d_nb)])
    fc = np.concatenate([[0], np.cumsum(f_nb)])
    term_docbytes = dc[offsets[1:]] - dc[starts]
    term_freqbytes = fc[offsets[1:]] - fc[starts]
    d_off = np.concatenate([[0], np.cumsum(term_docbytes)])
    f_off = np.concatenate([[0], np.cumsum(term_freqbytes)])
    p_off = np.concatenate([[0], np.cumsum(term_posbytes)])
    b_off = np.concatenate([[0], np.cumsum(nblocks)])

    docs_b = docs_buf.tobytes()
    freqs_b = freqs_buf.tobytes()
    pos_b = pos_buf.tobytes()
    # per-block BYTE LENGTHS as uint16 LE — rides in the widths columns
    dblk_b = dblk.astype("<u2").tobytes()
    fblk_b = fblk.astype("<u2").tobytes()
    norms_b = norms8.tobytes()
    blast_b = block_last.tobytes()
    bmaxf_b = block_max_freq.tobytes()
    bminn_b = block_min_norm.tobytes()

    return {
        "doc_freq": counts,
        "total_term_freq": ttf,
        "first_doc": docs[starts],
        "last_doc": docs[offsets[1:] - 1],
        "docs_blob": [docs_b[d_off[i] : d_off[i + 1]] for i in range(T)],
        "doc_widths": [dblk_b[2 * b_off[i] : 2 * b_off[i + 1]] for i in range(T)],
        "freqs_blob": [freqs_b[f_off[i] : f_off[i + 1]] for i in range(T)],
        "freq_widths": [fblk_b[2 * b_off[i] : 2 * b_off[i + 1]] for i in range(T)],
        "norms_blob": [norms_b[offsets[i] : offsets[i + 1]] for i in range(T)],
        "block_last": [blast_b[8 * b_off[i] : 8 * b_off[i + 1]] for i in range(T)],
        "block_max_freq": [bmaxf_b[4 * b_off[i] : 4 * b_off[i + 1]] for i in range(T)],
        "block_min_norm": [bminn_b[b_off[i] : b_off[i + 1]] for i in range(T)],
        "pos_blob": [pos_b[p_off[i] : p_off[i + 1]] for i in range(T)],
        # pos stream is self-delimiting; the width column is unused (0)
        "pos_width": np.zeros(T, dtype=np.int32),
    }


def decode_postings_many(
    doc_freqs: np.ndarray,
    docs_blobs: list[bytes],
    doc_widths_blobs: list[bytes],
    freqs_blobs: list[bytes],
    freq_widths_blobs: list[bytes],
    norms_blobs: list[bytes],
    block: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    counts = np.asarray(doc_freqs, dtype=np.int64)
    dbuf = np.frombuffer(b"".join(docs_blobs), dtype=np.uint8)
    deltas = vbyte_decode(dbuf)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    if len(deltas) != offsets[-1]:
        raise ValueError("vbyte docs stream count mismatch")
    docs = _segmented_cumsum(deltas, counts, -1)
    fbuf = np.frombuffer(b"".join(freqs_blobs), dtype=np.uint8)
    freqs = vbyte_decode(fbuf).astype(np.int64)
    norms8 = np.frombuffer(b"".join(norms_blobs), dtype=np.uint8).copy()
    return docs, freqs, norms8, offsets


def decode_positions_many(
    pos_blobs: list[bytes],
    pos_widths: np.ndarray,
    freqs: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    freqs = np.asarray(freqs, dtype=np.int64)
    pbuf = np.frombuffer(b"".join(pos_blobs), dtype=np.uint8)
    pdelta = vbyte_decode(pbuf).astype(np.int64)
    return _segmented_cumsum(pdelta, freqs, 0)


def decode_docs_freqs_norms(
    row: dict, block: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = int(row["doc_freq"])
    deltas = vbyte_decode(row_blob(row, "docs"))
    if len(deltas) != n:
        raise ValueError("vbyte docs stream count mismatch")
    docs = np.cumsum(deltas.astype(np.int64)) - 1
    freqs = vbyte_decode(row_blob(row, "freqs")).astype(np.int64)
    norms8 = row_blob(row, "norms")
    return docs, freqs, norms8


def decode_positions(row: dict, freqs: np.ndarray) -> np.ndarray:
    pdelta = vbyte_decode(row_blob(row, "pos")).astype(np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    return _segmented_cumsum(pdelta, freqs, 0)


def decode_row_blocks(
    row: dict, block_ids: np.ndarray, block: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    n = int(row["doc_freq"])
    dblk = np.frombuffer(row["doc_widths"], dtype="<u2").astype(np.int64)
    fblk = np.frombuffer(row["freq_widths"], dtype="<u2").astype(np.int64)
    nb = len(dblk)
    counts = np.full(nb, block, dtype=np.int64)
    counts[-1] = n - block * (nb - 1)
    doff = np.cumsum(dblk) - dblk
    foff = np.cumsum(fblk) - fblk
    sel = np.unique(np.asarray(block_ids, dtype=np.int64))
    scounts = counts[sel]
    dsel = row_blob_gather(row, "docs", doff[sel], dblk[sel])
    fsel = row_blob_gather(row, "freqs", foff[sel], fblk[sel])
    deltas = vbyte_decode(dsel).astype(np.int64)
    if len(deltas) != scounts.sum():
        raise ValueError("vbyte block gather count mismatch")
    last = np.frombuffer(row["block_last"], dtype=np.int64)
    bases = np.where(sel > 0, last[sel - 1], np.int64(-1))
    docs = _segmented_cumsum(deltas, scounts, bases)
    freqs = vbyte_decode(fsel).astype(np.int64)
    norms8 = row_blob_gather(row, "norms", sel * block, scounts)
    return docs, freqs, norms8, scounts


register_codec(
    PostingsCodec(
        name="vbyte128",
        encode_postings_many=encode_postings_many,
        decode_postings_many=decode_postings_many,
        decode_positions_many=decode_positions_many,
        decode_docs_freqs_norms=decode_docs_freqs_norms,
        decode_row_blocks=decode_row_blocks,
        decode_positions=decode_positions,
        block_metadata=block_metadata,
    )
)
