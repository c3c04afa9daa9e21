"""Property tests: the DuckDB replays of the fingerprint kernels
(minhash signatures / simhash / FNV token hashes — the round-5 SQL
oracle machinery in __ray_entry__) stay bit-identical to the numpy
kernels on ADVERSARIAL random unicode, not just the benign gate corpus:
multi-byte code points, empty strings, runs of whitespace (empty
tokens), docs shorter than the shingle width, and single-token docs
exercise every clamp/fold edge the SQL emulates."""

import importlib.util
import sys

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_go_ray.pipelines.dedup import (
    _token_hashes,
    minhash_signatures,
    simhash64,
)


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "re_mod_sqlfp", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


_M = _entry_mod()

# token alphabet mixes ASCII, 2-byte and 3-byte code points plus
# whitespace variants the GO_WHITESPACE_CLASS splits on
_texts = st.lists(
    st.text(
        alphabet="ab Zé中\t\n  ",
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=12,
)


def _con(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    return con


@settings(max_examples=25, deadline=None)
@given(_texts)
def test_simhash_sql_matches_kernel_on_random_unicode(texts):
    arr = pa.array(texts, pa.string())
    expect = dict(
        zip(range(len(texts)), simhash64(arr).astype(np.int64).tolist())
    )
    got = dict(_con(texts).execute(_M._simhash_table_sql()).fetchall())
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(_texts)
def test_minhash_band_pairs_sql_matches_kernel_on_random_unicode(texts):
    arr = pa.array(texts, pa.string())
    sig = minhash_signatures(arr, 64, 3)
    n = len(texts)
    bands, rows = 16, 4
    est = (sig[:, None, :] == sig[None, :, :]).mean(axis=2)
    bandeq = np.zeros((n, n), dtype=bool)
    for b in range(bands):
        seg = sig[:, b * rows : (b + 1) * rows]
        bandeq |= (seg[:, None, :] == seg[None, :, :]).all(axis=2)
    iu = np.triu_indices(n, 1)
    mask = bandeq[iu] & (est[iu] >= 0.5)
    expect = {
        (int(i), int(j)): float(est[i, j])
        for i, j in zip(iu[0][mask], iu[1][mask])
    }
    got = {
        (a, b): e
        for a, b, e in _con(texts)
        .execute(_M._minhash_pairs_sql())
        .fetchall()
    }
    assert got == expect


@settings(max_examples=25, deadline=None)
@given(_texts)
def test_token_fnv_sql_matches_kernel_on_random_unicode(texts):
    h, counts = _token_hashes(pa.array(texts, pa.large_string()))
    dtoks = f"""dtoks AS (
  SELECT doc_id, tok_idx, lower(tok) AS tok
  FROM (SELECT doc_id, unnest(string_split_regex(text, '{_M._WS}')) AS tok,
               generate_subscripts(string_split_regex(text, '{_M._WS}'), 1) AS tok_idx
        FROM documents)
)"""
    sql = f"""
WITH {dtoks},
th AS (
  SELECT doc_id, tok_idx,
    CASE WHEN octet_length(encode(tok)) = 0 THEN {_M._FNV_OFF_SQL}
    ELSE list_reduce(
      list_prepend({_M._FNV_OFF_SQL},
        list_transform(range(octet_length(encode(tok))),
          i -> ('0x' || substr(hex(encode(tok)), 2*i::INT+1, 2))::UBIGINT)),
      (acc, b) -> {_M._mulp('xor(acc::UBIGINT, b::UBIGINT)')}
    ) END AS th
  FROM dtoks
)
SELECT th FROM th ORDER BY doc_id, tok_idx
"""
    got = np.array(
        [r[0] for r in _con(texts).execute(sql).fetchall()], dtype=np.uint64
    )
    assert np.array_equal(got, h)
