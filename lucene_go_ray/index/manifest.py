"""Index manifest: per-partition lineage + global stats, two-phase commit.

Mirrors the reference's generation-numbered ``segments_N`` two-phase commit
(write ``pending_segments_N`` → fsync → rename,
/root/reference/core/index/segmentinfos.go:248-259) with a JSON manifest
written via temp-file + atomic rename.  Partition rows double as the
checkpoint lineage for resumable builds: a re-run skips every partition
whose row (and on-disk segment) already exists.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionInfo:
    pid: int
    path: str  # input file
    row_groups: list  # input row-group ids
    row_start: int  # row offset within the row groups (for split groups)
    num_docs: int
    doc_base: int = -1  # assigned at finalize (prefix sum in pid order)
    num_terms: int = 0
    sum_total_term_freq: int = 0  # total kept tokens in partition
    sum_doc_freq: int = 0  # sum over terms of per-partition doc_freq
    doc_count: int = 0  # docs with >= 1 posting
    build_secs: float = 0.0
    input_bytes: int = 0
    # per-field CollectionStatistics partials for NON-default fields:
    # {field: {"doc_count": n, "sum_total_term_freq": n, "sum_doc_freq": n}}
    # (the default text field's stats are the legacy columns above)
    field_stats: dict = field(default_factory=dict)
    # doc-values zone maps: {field: [min, max]} over this segment's values
    dv_ranges: dict = field(default_factory=dict)
    # docs expunged from this segment's postings/stats (their local ords are
    # in the segment's dead.parquet — the .liv file of segmentreader.go
    # liveDocs, kept WITH the segment after compaction). docIDs stay stable:
    # num_docs keeps counting dead rows so docBases never shift.
    num_deleted: int = 0


@dataclass
class Manifest:
    version: int = 1
    num_partitions: int = 0
    max_doc: int = 0
    doc_count: int = 0
    sum_total_term_freq: int = 0
    sum_doc_freq: int = 0
    config: dict = field(default_factory=dict)
    partitions: list = field(default_factory=list)  # list[PartitionInfo dicts]
    # global per-field stats for non-default fields (sum of partition rows),
    # keyed by field name — the per-field CollectionStatistics of
    # indexsearcher.go:438-481
    field_stats: dict = field(default_factory=dict)
    merged: bool = False  # global merged index present
    # aggregate build metrics (wall seconds, docs/s, ...) — per-partition
    # metrics (build_secs, input_bytes, counts) live on each partition row
    metrics: dict = field(default_factory=dict)

    def doc_bases(self) -> dict:
        return {p["pid"]: p["doc_base"] for p in self.partitions}


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def load_manifest(index_dir: str) -> Manifest | None:
    path = manifest_path(index_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    m = Manifest(**data)
    return m


def save_manifest(index_dir: str, manifest: Manifest) -> None:
    """Two-phase: write pending file then atomic rename (segments_N semantics)."""
    os.makedirs(index_dir, exist_ok=True)
    tmp = manifest_path(index_dir) + ".pending"
    with open(tmp, "w") as f:
        json.dump(asdict(manifest), f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(index_dir))


def finalize_partitions(parts: list[PartitionInfo]) -> Manifest:
    """Assign docBases by prefix sum in pid order (deterministic, the
    composite-reader docBase stitching — standarddirectoryreader.go:48) and
    fold per-partition stats into the global CollectionStatistics
    (indexsearcher.go:438-481 sums across leaves)."""
    parts = sorted(parts, key=lambda p: p.pid)
    base = 0
    for p in parts:
        p.doc_base = base
        base += p.num_docs
    field_stats: dict = {}
    for p in parts:
        for f_name, fs in (p.field_stats or {}).items():
            acc = field_stats.setdefault(
                f_name,
                {"doc_count": 0, "sum_total_term_freq": 0, "sum_doc_freq": 0},
            )
            for k in acc:
                acc[k] += int(fs.get(k, 0))
    return Manifest(
        num_partitions=len(parts),
        max_doc=base,
        doc_count=sum(p.doc_count for p in parts),
        sum_total_term_freq=sum(p.sum_total_term_freq for p in parts),
        sum_doc_freq=sum(p.sum_doc_freq for p in parts),
        partitions=[asdict(p) for p in parts],
        field_stats=field_stats,
    )
