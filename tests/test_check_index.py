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
