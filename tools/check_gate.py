"""Local simulation of the driver's correctness gate:
runs every queries() entry and compares against oracle_sql() via DuckDB
(row count + schema + order-insensitive value hash). Usage:

    python tools/check_gate.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(
            round(v, 6) if isinstance(v, float) else v for v in row
        )
        for row in df.itertuples(index=False, name=None)
    )
    import hashlib

    return hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.execute(sqls[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: sql error {e}")
            failures.append(name)
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).head(5)
            e2 = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).head(5)
            print("  got:\n", g, "\n  exp:\n", e2)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(got)} rows)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all gate queries match")
    ray.shutdown()


if __name__ == "__main__":
    main()
