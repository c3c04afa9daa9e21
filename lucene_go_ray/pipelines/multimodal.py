"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as opaque ``binary`` columns moving through
actor-pool ``map_batches`` stages. The decode kernels themselves are
STUBBED (no image/audio libraries in this container): each stage tries the
real library import and otherwise either raises ``NotImplementedError``
(``fake=False``) or produces a deterministic fake derived from the payload
bytes (``fake=True``) so that the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested end-to-end.

Batch-size note: binary payloads are large, so these stages should run with
small ``batch_size`` (rows) — the helper ``decode_images`` defaults to 64 —
and actor-pool concurrency sized to the node, letting block size stay under
the object-store target.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _mix

IMAGE_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # "image/jpeg", "audio/wav", ...
    ]
)


def _payload_hashes(payloads: pa.Array) -> np.ndarray:
    """Deterministic uint64 per payload from (length, first/last 8 bytes).

    Fully vectorized over the Arrow binary buffers (offsets + one
    frombuffer view of the value bytes) — zero Python-object rows, the
    same pattern dedup._token_hashes uses for strings. Byte order matches
    the scalar definition: FNV-fold over b[:8] then b[-8:] (short payloads
    fold their bytes twice, exactly like the slice concatenation)."""
    if isinstance(payloads, pa.ChunkedArray):
        payloads = payloads.combine_chunks()
    payloads = payloads.cast(pa.large_binary())
    n = len(payloads)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = payloads.buffers()
    data = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
    offs = np.frombuffer(bufs[1], dtype=np.int64)[
        payloads.offset : payloads.offset + n + 1
    ]
    lens = np.diff(offs)
    if bufs[0] is not None:  # nulls hash like empty payloads
        valid = np.unpackbits(
            np.frombuffer(bufs[0], dtype=np.uint8), bitorder="little"
        )[payloads.offset : payloads.offset + n].astype(bool)
        lens = np.where(valid, lens, 0)
    h = lens.astype(np.uint64)
    head = np.minimum(lens, 8)  # bytes taken from each end
    with np.errstate(over="ignore"):
        for j in range(8):  # b[:8] fold
            live = head > j
            idx = offs[:-1][live] + j
            h[live] = (h[live] ^ data[idx].astype(np.uint64)) * np.uint64(
                0x100000001B3
            )
        for j in range(8):  # b[-8:] fold
            live = head > j
            idx = offs[1:][live] - head[live] + j
            h[live] = (h[live] ^ data[idx].astype(np.uint64)) * np.uint64(
                0x100000001B3
            )
    return _mix(h, np.uint64(5))


class ImageDecodeStage:
    """binary image -> (width, height, mean_luma). Actor-pool stage.

    Real path would be ``PIL.Image.open`` in ``__init__``-compiled form;
    stubbed here (library absent)."""

    def __init__(self, payload_col: str = "payload", fake: bool = True):
        self.payload_col = payload_col
        self.fake = fake
        try:  # pragma: no cover - not present in this container
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._pil and not self.fake:
            raise NotImplementedError(
                "image decode requires PIL, which is not available; "
                "construct with fake=True for the deterministic stub"
            )
        h = _payload_hashes(batch[self.payload_col])
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        height = ((h >> np.uint64(11)) % np.uint64(1080) + np.uint64(16)).astype(
            np.int32
        )
        luma = ((h >> np.uint64(22)) % np.uint64(256)).astype(np.float64)
        return batch.drop_columns([self.payload_col]).append_column(
            "width", pa.array(width)
        ).append_column("height", pa.array(height)).append_column(
            "mean_luma", pa.array(luma)
        )


class EmbedStage:
    """binary payload -> deterministic fake embedding (dim float32 list).

    The real stage would load a model once per actor in __init__ and run
    batched inference in __call__."""

    def __init__(self, payload_col: str = "payload", dim: int = 16, fake: bool = True):
        self.payload_col = payload_col
        self.dim = dim
        if not fake:
            raise NotImplementedError("no model runtime in this container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = _payload_hashes(batch[self.payload_col])
        mat = np.empty((len(h), self.dim), dtype=np.float32)
        for j in range(self.dim):
            mat[:, j] = (
                _mix(h, np.uint64(j + 11)).astype(np.float64) / 2**64 - 0.5
            ).astype(np.float32)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float32()), self.dim
        )
        return batch.drop_columns([self.payload_col]).append_column(
            "embedding", emb
        )


def frame_sample_offsets(payload_len: int, n_frames: int = 8) -> list[int]:
    """Deterministic frame-sample byte offsets for a video payload."""
    if payload_len <= 0:
        return []
    return [int(i * payload_len / n_frames) for i in range(n_frames)]


def decode_images(ds, *, batch_size: int = 64, concurrency=(1, 8), fake: bool = True):
    """Wire the decode stage with multimodal-appropriate batch sizing."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FeatureStage:
    """Fused decode + embed actor stage: ONE pass over each payload batch
    produces all per-doc features (width/height/luma from the decode
    kernel, embedding norm from the embed kernel). Fusing removes the
    doc_id join between two full per-doc streams — the payload bytes are
    read once and never re-shuffled. Real kernels would load PIL + the
    model once here in __init__."""

    def __init__(self, payload_col: str = "payload", dim: int = 16, fake: bool = True):
        self.decode = ImageDecodeStage(payload_col=payload_col, fake=fake)
        self.embed = EmbedStage(payload_col=payload_col, dim=dim, fake=fake)
        self.payload_col = payload_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = _payload_hashes(batch[self.payload_col])
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        height = ((h >> np.uint64(11)) % np.uint64(1080) + np.uint64(16)).astype(
            np.int32
        )
        luma = ((h >> np.uint64(22)) % np.uint64(256)).astype(np.float64)
        mat = np.empty((len(h), self.dim), dtype=np.float64)
        for j in range(self.dim):
            mat[:, j] = (
                _mix(h, np.uint64(j + 11)).astype(np.float64) / 2**64 - 0.5
            ).astype(np.float32)
        emb_norm = np.round(np.linalg.norm(mat, axis=1), 6)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(width),
                "height": pa.array(height),
                "mean_luma": pa.array(luma),
                "emb_norm": pa.array(emb_norm, type=pa.float64()),
            }
        )


def multimodal_features(sf_dir: str, dim: int = 16):
    """End-to-end multimodal plumbing over the documents table: text bytes
    stand in for an opaque binary payload column (the container has no
    image/audio libs — see module docstring), then the fused decode+embed
    actor-pool stage runs for real. Output: one feature row per document
    (rows-only gate entry — hash-family features are not SQL-expressible).
    Fully streaming: no driver-side join or materialization."""
    import os

    import ray.data

    def _payloads(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": batch["text"].cast(pa.large_binary()),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            FeatureStage,
            fn_constructor_kwargs={"dim": dim},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=(1, 8),
            num_cpus=1,
        )
    )
