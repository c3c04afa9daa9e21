"""CheckIndex analogue (/root/reference/core/index/checkindex.go):
a clean index validates; a single corrupted blob byte, a truncated blob,
or a doctored manifest is caught."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from lucene_go_ray.index import IndexConfig, build_index
from lucene_go_ray.index.check import check_index

CFG = IndexConfig(target_partition_rows=120)


@pytest.fixture(scope="module")
def built(tmp_path_factory, sf_dir):
    index_dir = str(tmp_path_factory.mktemp("chk_idx"))
    build_index(
        [os.path.join(sf_dir, "documents.parquet")], index_dir, CFG
    )
    return index_dir


def _copy(built, tmp_path):
    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    return d


def test_clean_index_checks_ok(built):
    res = check_index(built, sample_per_bucket=1000)  # every term
    assert res["ok"], res["problems"][:5]
    assert res["checked"]["terms_decoded"] >= 25  # sf0.001 vocab ~29 terms
    assert res["checked"]["revdict_terms"] > 0


def test_single_corrupted_blob_byte_detected(built, tmp_path):
    d = _copy(built, tmp_path)
    pdir = os.path.join(d, "global", "postings")
    blobs = sorted(
        f for f in os.listdir(pdir)
        if f.endswith(".blob") and os.path.getsize(os.path.join(pdir, f)) > 64
    )
    path = os.path.join(pdir, blobs[0])
    with open(path, "r+b") as f:
        f.seek(os.path.getsize(path) // 3)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0xFF]))
    res = check_index(d, sample_per_bucket=1000)
    assert not res["ok"]
    assert any(
        "drift" in p or "increasing" in p or "total_term_freq" in p
        or "out of range" in p or "decode failed" in p or "zero freq" in p
        for p in res["problems"]
    ), res["problems"][:5]


def test_truncated_blob_detected(built, tmp_path):
    d = _copy(built, tmp_path)
    pdir = os.path.join(d, "global", "postings")
    blobs = sorted(
        f for f in os.listdir(pdir)
        if f.endswith(".blob") and os.path.getsize(os.path.join(pdir, f)) > 64
    )
    path = os.path.join(pdir, blobs[0])
    with open(path, "r+b") as f:
        f.truncate(os.path.getsize(path) - 8)
    res = check_index(d, sample_per_bucket=4)
    assert not res["ok"]
    assert any("blob size" in p for p in res["problems"]), res["problems"][:3]


def test_doctored_manifest_stats_detected(built, tmp_path):
    d = _copy(built, tmp_path)
    mpath = os.path.join(d, "manifest.json")
    m = json.load(open(mpath))
    m["partitions"][0]["doc_count"] += 1
    with open(mpath, "w") as f:
        json.dump(m, f)
    res = check_index(d, sample_per_bucket=1)
    assert not res["ok"]
    assert any("stats.doc_count" in p for p in res["problems"])


def test_cli_check_subcommand(built):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "lucene_go_ray.cli", "check", built,
         "--sample", "2"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout)
    assert out["ok"]


@pytest.fixture(scope="module")
def built_sides(tmp_path_factory, sf_dir):
    """Index with BOTH round-4 side streams: payloads + term vectors."""
    index_dir = str(tmp_path_factory.mktemp("chk_sides"))
    build_index(
        [os.path.join(sf_dir, "documents.parquet")],
        index_dir,
        IndexConfig(
            target_partition_rows=300,
            payload_kind="token_bytes",
            index_term_vectors=True,
        ),
    )
    return index_dir


def test_clean_side_streams_check_ok(built_sides):
    res = check_index(built_sides, sample_per_bucket=64)
    assert res["ok"], res["problems"][:5]
    assert res["checked"]["payload_terms"] > 0
    assert res["checked"]["tvec_rows"] > 0


def test_truncated_payload_list_detected(built_sides, tmp_path):
    """Dropping one occurrence from one payload list breaks the
    sum(lens) == total_term_freq reconciliation."""
    import pyarrow as pa

    d = _copy(built_sides, tmp_path)
    ppath = os.path.join(d, "segments", "p=00000", "payloads.parquet")
    t = pq.read_table(ppath)
    lists = t["payloads"].to_pylist()
    victim = next(i for i, v in enumerate(lists) if len(v) >= 2)
    lists[victim] = lists[victim][:-1]
    t = t.set_column(
        t.column_names.index("payloads"),
        "payloads",
        pa.array(lists, type=t["payloads"].type),
    )
    pq.write_table(t, ppath)
    res = check_index(d, sample_per_bucket=50_000)  # sample every term
    assert not res["ok"]
    assert any("total_term_freq" in p and "payload" in p for p in res["problems"]), (
        res["problems"][:5]
    )


def test_doctored_tvec_freq_detected(built_sides, tmp_path):
    import pyarrow as pa

    d = _copy(built_sides, tmp_path)
    tpath = os.path.join(d, "segments", "p=00000", "tvec.parquet")
    t = pq.read_table(tpath)
    freqs = t["freq"].to_pylist()
    freqs[0] += 1
    t = t.set_column(
        t.column_names.index("freq"), "freq", pa.array(freqs, type=t["freq"].type)
    )
    pq.write_table(t, tpath)
    res = check_index(d, sample_per_bucket=50_000)  # > tvec rows: check all
    assert not res["ok"]
    assert any("tvec positions len != freq" in p for p in res["problems"]), (
        res["problems"][:5]
    )
