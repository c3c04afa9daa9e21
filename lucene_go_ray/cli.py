"""Cluster job entry points — the ``ray job submit`` surface of the engine.

Examples (north-rule run mode):

    ray job submit --working-dir . -- \
        python -m lucene_go_ray.cli build \
        --input /data/commoncrawl/*.parquet --index /data/index \
        --partition-rows 20000

    ray job submit --working-dir . -- \
        python -m lucene_go_ray.cli search \
        --index /data/index --kind bool_and --clauses sort merge --k 10

    python -m lucene_go_ray.cli query-batch \
        --index /data/index --queries queries.jsonl --out results.parquet

Owns its Ray session (guarded init) per the driver contract: library code
never calls ``ray.init``; this CLI and bench.py do.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "--cluster" in sys.argv else "local",
                 include_dashboard=False, ignore_reinit_error=True)
    return ray


def cmd_build(args) -> int:
    _ensure_ray()
    from .index import IndexConfig, build_index

    paths = sorted(p for pat in args.input for p in glob.glob(pat))
    if not paths:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    cfg = IndexConfig(
        key_column=args.key_column,
        text_column=args.text_column,
        target_partition_rows=args.partition_rows,
        hot_term_doc_freq=args.hot_term_doc_freq,
        salt_group_partitions=args.salt_group_partitions,
        merge_buckets=args.merge_buckets,
        index_positions=not args.no_positions,
        index_offsets=args.offsets,
        keyword_fields=tuple(args.keyword_fields or ()),
        docvalue_fields=tuple(args.docvalue_fields or ()),
    )
    manifest = build_index(paths, args.index, cfg, merge=not args.no_merge)
    print(
        json.dumps(
            {
                "index": args.index,
                "partitions": len(manifest.partitions),
                "max_doc": manifest.max_doc,
                "merged": manifest.merged,
            }
        )
    )
    return 0


def cmd_delete(args) -> int:
    _ensure_ray()
    from .index.deletes import delete_by_term

    n = delete_by_term(args.index, args.term, fld=args.field)
    print(json.dumps({"deleted": n, "term": args.term, "field": args.field}))
    return 0


def cmd_expunge(args) -> int:
    _ensure_ray()
    from .index.compact import expunge_deletes

    res = expunge_deletes(args.index, min_ratio=args.min_ratio)
    print(json.dumps(res))
    return 0


def cmd_clean(args) -> int:
    # pure filesystem sweep — no Ray session needed
    from .index.compact import gc_index

    res = gc_index(args.index)
    print(json.dumps(res))
    return 0


def cmd_check(args) -> int:
    # offline integrity validation (CheckIndex,
    # /root/reference/core/index/checkindex.go) — no Ray session needed
    from .index.check import check_index

    res = check_index(args.index, sample_per_bucket=args.sample)
    print(json.dumps(res, indent=2))
    return 0 if res["ok"] else 1


def cmd_check_kd(args) -> int:
    # kd point-index validation (index/bkd.py layout) — no Ray session
    from .index.bkd import check_kd_index

    res = check_kd_index(args.index, sample_rows_per_leaf=args.sample)
    print(json.dumps(res, indent=2))
    return 0 if res["ok"] else 1


def cmd_add(args) -> int:
    _ensure_ray()
    from .index.build import add_documents

    paths = sorted(p for pat in args.input for p in glob.glob(pat))
    if not paths:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    manifest = add_documents(args.index, paths, merge=args.merge)
    print(
        json.dumps(
            {
                "index": args.index,
                "partitions": len(manifest.partitions),
                "max_doc": manifest.max_doc,
            }
        )
    )
    return 0


def cmd_search(args) -> int:
    _ensure_ray()
    from .search import IndexSearcher
    from .search.searcher import query_from_descriptor

    s = IndexSearcher(args.index)
    q = query_from_descriptor(args.kind, args.clauses)
    hl_terms = s.highlight_terms(q) if args.highlight else None
    if args.shards > 1:
        td = s.search_sharded(q, args.k, num_shards=args.shards)
        if args.keys:
            td.keys = s.lookup_keys(td.doc_ids)
    else:
        td = s.search(q, args.k, prune=args.prune, with_keys=args.keys)
    for i in range(len(td.doc_ids)):
        row = {
            "rank": i + 1,
            "doc_id": int(td.doc_ids[i]),
            "score": float(td.scores[i]),
        }
        if td.keys is not None:
            row["key"] = td.keys[i]
        if args.highlight:
            # highlight the terms the REWRITTEN query actually matches on
            # (expansion queries contribute their dictionary expansions;
            # numeric/range clause args are never mistaken for terms)
            row["snippets"] = s.highlight(
                int(td.doc_ids[i]), hl_terms, max_fragments=2
            )
        print(json.dumps(row, ensure_ascii=False))
    return 0


def cmd_query_batch(args) -> int:
    _ensure_ray()
    from .search import IndexSearcher

    with open(args.queries) as f:
        queries = [json.loads(line) for line in f if line.strip()]
    s = IndexSearcher(args.index)
    ds = s.search_batch_dataset(queries, k=args.k, prune=args.prune)
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"queries": len(queries), "out": args.out}))
    else:
        for row in ds.iter_rows():
            print(json.dumps({k: (v.item() if hasattr(v, "item") else v)
                              for k, v in row.items()}))
    return 0


def cmd_curate(args) -> int:
    _ensure_ray()
    from .pipelines import curate

    surv = curate.curate(
        args.sf_dir,
        args.out,
        min_chars=args.min_chars,
        max_chars=args.max_chars,
        min_tokens=args.min_tokens,
        max_stopword_ratio=args.max_stopword_ratio,
        max_top2gram_frac=args.max_top2gram_frac,
        max_top3gram_frac=args.max_top3gram_frac,
        max_dup5gram_frac=args.max_dup5gram_frac,
        near_dup_threshold=args.near_dup_threshold,
        out_partitions=args.out_partitions,
    )
    print(json.dumps({"survivors": surv.count(), "out": args.out}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lucene_go_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--input", nargs="+", required=True, help="parquet globs")
    b.add_argument("--index", required=True)
    b.add_argument("--key-column", default="url")
    b.add_argument("--text-column", default="text")
    b.add_argument("--partition-rows", type=int, default=20000)
    b.add_argument("--hot-term-doc-freq", type=int, default=500_000)
    b.add_argument("--salt-group-partitions", type=int, default=8)
    b.add_argument("--merge-buckets", type=int, default=32)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-merge", action="store_true",
                   help="commit segments only (searchable via the NRT reader)")
    b.add_argument("--offsets", action="store_true",
                   help="store the per-occurrence byte-offset stream")
    b.add_argument("--keyword-fields", nargs="*", default=[],
                   help="columns indexed verbatim under (field, term) keys")
    b.add_argument("--docvalue-fields", nargs="*", default=[],
                   help="numeric columns stored for NumericRangeQuery")
    b.add_argument("--cluster", action="store_true",
                   help="ray.init(address='auto') instead of local")
    b.set_defaults(fn=cmd_build)

    d = sub.add_parser("delete", help="tombstone docs matching a term")
    d.add_argument("--index", required=True)
    d.add_argument("--term", required=True)
    d.add_argument("--field", default=None)
    d.add_argument("--cluster", action="store_true")
    d.set_defaults(fn=cmd_delete)

    e = sub.add_parser(
        "expunge", help="compact tombstones: rewrite deleted-heavy segments"
    )
    e.add_argument("--index", required=True)
    e.add_argument("--min-ratio", type=float, default=0.0,
                   help="only rewrite partitions with >= this delete ratio "
                        "(Lucene forceMergeDeletes default is 0.1)")
    e.add_argument("--cluster", action="store_true")
    e.set_defaults(fn=cmd_expunge)

    ck = sub.add_parser(
        "check",
        help="offline integrity validation: re-derive sampled term stats "
        "from blob decodes, verify manifest/stats/offsets/revdict "
        "(CheckIndex analogue; exit 1 on any problem)",
    )
    ck.add_argument("index")
    ck.add_argument("--sample", type=int, default=16,
                    help="terms decoded per bucket (default 16)")
    ck.set_defaults(fn=cmd_check)

    ckd = sub.add_parser(
        "check-kd",
        help="offline kd point-index validation: leaf set vs meta, footer "
        "stats vs recorded bounds, sampled routing through the split tree "
        "(exit 1 on any problem)",
    )
    ckd.add_argument("index")
    ckd.add_argument("--sample", type=int, default=64,
                     help="rows routed per leaf (default 64)")
    ckd.set_defaults(fn=cmd_check_kd)

    c = sub.add_parser("clean", help="remove orphan tmp/retired artifacts")
    c.add_argument("--index", required=True)
    c.set_defaults(fn=cmd_clean)

    a = sub.add_parser("add", help="append documents to an existing index")
    a.add_argument("--input", nargs="+", required=True, help="parquet globs")
    a.add_argument("--index", required=True)
    a.add_argument("--cluster", action="store_true")
    a.add_argument(
        "--merge",
        default="auto",
        choices=("auto", "incremental", "full", "none"),
        help="MergePolicy: auto = size-tiered (incremental fold until "
        "growth exceeds cfg.tiered_growth_ratio, then full re-merge)",
    )
    a.set_defaults(fn=cmd_add)

    s = sub.add_parser("search", help="one query against a built index")
    s.add_argument("--index", required=True)
    s.add_argument(
        "--kind",
        default="term",
        choices=["term", "bool_and", "bool_or", "bool_not", "phrase",
                 "prefix", "term_range", "term_set", "dismax", "constant",
                 "range_filter", "match_all", "field_term", "field_mixed",
                 "numeric_range"],
    )
    s.add_argument("--clauses", nargs="*", default=[])
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--shards", type=int, default=1,
                   help=">1: doc-range-sharded parallel evaluation")
    s.add_argument("--prune", action="store_true")
    s.add_argument("--keys", action="store_true", help="resolve stored keys")
    s.add_argument("--highlight", action="store_true",
                   help="attach tagged snippets around the query terms")
    s.add_argument("--cluster", action="store_true")
    s.set_defaults(fn=cmd_search)

    cu = sub.add_parser(
        "curate",
        help="quality filters -> exact dedup -> optional near-dup cluster "
        "removal -> partitioned resumable parquet",
    )
    cu.add_argument("sf_dir", help="directory holding documents.parquet")
    cu.add_argument("--out", default=None,
                    help="write the curated corpus here (hive-partitioned)")
    cu.add_argument("--min-chars", type=int, default=50)
    cu.add_argument("--max-chars", type=int, default=1_000_000)
    cu.add_argument("--min-tokens", type=int, default=10)
    cu.add_argument("--max-stopword-ratio", type=float, default=0.6)
    cu.add_argument("--max-top2gram-frac", type=float, default=None,
                    help="Gopher repetition gate (paper default 0.20)")
    cu.add_argument("--max-top3gram-frac", type=float, default=None)
    cu.add_argument("--max-dup5gram-frac", type=float, default=None)
    cu.add_argument("--near-dup-threshold", type=float, default=None,
                    help="jaccard threshold: drop near-dup cluster losers")
    cu.add_argument("--out-partitions", type=int, default=64)
    cu.add_argument("--cluster", action="store_true")
    cu.set_defaults(fn=cmd_curate)

    qb = sub.add_parser("query-batch", help="JSONL query batch -> parquet")
    qb.add_argument("--index", required=True)
    qb.add_argument("--queries", required=True, help="jsonl of descriptors")
    qb.add_argument("--k", type=int, default=10)
    qb.add_argument("--prune", action="store_true")
    qb.add_argument("--out", default=None)
    qb.add_argument("--cluster", action="store_true")
    qb.set_defaults(fn=cmd_query_batch)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
