"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes one callable per implemented pipeline/operator from
SURVEY.md §2 (plus the training-data extras); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one. The driver runs both
at sf=0.01 and compares row-count + schema + order-insensitive value-hash.

Scores/similarities are rounded to 6 decimals on BOTH sides (and ranked by
the rounded value, doc_id ascending) so the comparison is robust to 1-ulp
libm differences between numpy and DuckDB; full-precision rank-identity is
asserted separately in pytest against the exhaustive oracle engine.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from lucene_go_ray.analysis import DEFAULT_STOP_WORDS, GO_WHITESPACE_CLASS

# ---------------------------------------------------------------------------
# shared SQL fragments (must mirror lucene_go_ray.analysis semantics exactly)
# ---------------------------------------------------------------------------

_WS = GO_WHITESPACE_CLASS  # identical char class in Python/RE2/DuckDB
_STOPS = ", ".join(f"'{w}'" for w in sorted(DEFAULT_STOP_WORDS))

_TOKS = f"""toks AS (
    SELECT doc_id, lower(tok) AS term
    FROM (SELECT doc_id, unnest(string_split_regex(text, '{_WS}')) AS tok
          FROM documents)
    WHERE lower(tok) NOT IN ({_STOPS})
)"""

_NORMS = """norms AS (
    SELECT doc_id, count(*)::BIGINT AS norm FROM toks GROUP BY doc_id
)"""

_STATS = """stats AS (
    SELECT count(*)::DOUBLE AS doc_count, sum(norm)::DOUBLE AS sum_ttf
    FROM norms
)"""

K1, B = 1.2, 0.75


def _bm25_score_expr(w: str, freq: str, norm: str) -> str:
    ninv = f"1.0/({K1}*((1-{B}) + {B}*(({norm} % 256)::DOUBLE)/(stats.sum_ttf/stats.doc_count)))"
    return f"({w}) - ({w})/(1 + ({freq}) * {ninv})"


def _idf_expr(df: str) -> str:
    return f"ln(1 + (stats.doc_count - {df} + 0.5)/({df} + 0.5))"


def _topk_term_sql(term: str, k: int) -> str:
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
tf AS (SELECT doc_id, count(*)::DOUBLE AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id),
dfv AS (SELECT count(*)::DOUBLE AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         {_bm25_score_expr(_idf_expr("dfv.df"), "tf.freq", "n.norm")} AS score
  FROM tf JOIN norms n ON n.doc_id = tf.doc_id, dfv, stats
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _topk_bool_sql(terms: list[str], k: int, mode: str, msm: int = 0) -> str:
    """mode: 'and' | 'or' | 'not' (first term MUST, rest MUST_NOT)."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    if mode == "not":
        pos = f"('{terms[0]}')"
        neg = ", ".join(f"'{t}'" for t in terms[1:])
        cand = f"""cand AS (
  SELECT doc_id FROM tfs WHERE term IN {pos}
  AND doc_id NOT IN (SELECT doc_id FROM toks WHERE term IN ({neg}))
)"""
    elif mode == "and":
        cand = f"""cand AS (
  SELECT doc_id FROM tfs GROUP BY doc_id HAVING count(DISTINCT term) = {len(terms)}
)"""
    else:
        having = f"HAVING count(DISTINCT term) >= {msm}" if msm > 1 else ""
        cand = f"cand AS (SELECT doc_id FROM tfs GROUP BY doc_id {having})"
    scoring_terms = f"('{terms[0]}')" if mode == "not" else f"({tlist})"
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
tfs AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks
        WHERE term IN ({tlist}) GROUP BY doc_id, term),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tfs GROUP BY term),
{cand},
scored AS (
  SELECT c.doc_id,
         sum({_bm25_score_expr(_idf_expr("dfs.df"), "t.freq", "n.norm")}) AS score
  FROM cand c
  JOIN tfs t ON t.doc_id = c.doc_id AND t.term IN {scoring_terms}
  JOIN dfs ON dfs.term = t.term
  JOIN norms n ON n.doc_id = c.doc_id, stats
  GROUP BY c.doc_id
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _topk_phrase_sql(terms: list[str], k: int) -> str:
    joins = "\n  ".join(
        f"JOIN p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        for i in range(1, len(terms))
    )
    plists = ",\n".join(
        f"p{i} AS (SELECT doc_id, pos FROM tokpos WHERE term = '{t}')"
        for i, t in enumerate(terms)
    )
    idf_sum = " + ".join(
        _idf_expr(
            f"(SELECT count(DISTINCT doc_id)::DOUBLE FROM toks WHERE term = '{t}')"
        )
        for t in terms
    )
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
tokpos AS (
  SELECT doc_id, lower(tok) AS term, idx - 1 AS pos
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '{_WS}')) AS tok,
               generate_subscripts(string_split_regex(text, '{_WS}'), 1) AS idx
        FROM documents)
),
{plists},
matches AS (
  SELECT p0.doc_id, count(*)::DOUBLE AS freq
  FROM p0
  {joins}
  GROUP BY p0.doc_id
),
scored AS (
  SELECT m.doc_id,
         {_bm25_score_expr("(" + idf_sum + ")", "m.freq", "n.norm")} AS score
  FROM matches m JOIN norms n ON n.doc_id = m.doc_id, stats
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


_TOKPOS = f"""tokpos AS (
  SELECT doc_id, lower(tok) AS term, idx - 1 AS pos
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '{_WS}')) AS tok,
               generate_subscripts(string_split_regex(text, '{_WS}'), 1) AS idx
        FROM documents)
)"""


def _span_scored_sql(matches_cte: str, idf_sum: str, k: int) -> str:
    """Shared tail for span oracles: BM25 over the span freq with the
    summed-idf weight (PhraseQuery scoring shape — mirrors the engine's
    _span_scored)."""
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
{_TOKPOS},
{matches_cte},
scored AS (
  SELECT m.doc_id,
         {_bm25_score_expr("(" + idf_sum + ")", "m.freq", "n.norm")} AS score
  FROM matches m JOIN norms n ON n.doc_id = m.doc_id, stats
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _span_idf_sum(terms: list[str]) -> str:
    return " + ".join(
        _idf_expr(
            f"(SELECT count(DISTINCT doc_id)::DOUBLE FROM toks WHERE term = '{t}')"
        )
        for t in terms
    )


def _topk_span_near_sql(terms: list, slop: int, in_order: bool, k: int) -> str:
    """SpanNearQuery oracle: freq = count of first-clause occurrences that
    anchor a qualifying window (exists-an-increasing-chain for ordered —
    equivalent to the engine's greedy minimal-successor chain; an
    all-distinct combination within the span bound for unordered). A
    clause given as a LIST is an OR of alternatives (term IN (...)); every
    alternative term contributes idf, as in the engine."""
    n = len(terms)

    def pred(t) -> str:
        if isinstance(t, str):
            return f"term = '{t}'"
        alts = ", ".join(f"'{a}'" for a in t)
        return f"term IN ({alts})"

    plists = ",\n".join(
        f"p{i} AS (SELECT doc_id, pos FROM tokpos WHERE {pred(t)})"
        for i, t in enumerate(terms)
    )
    flat_terms = [a for t in terms for a in ((t,) if isinstance(t, str) else t)]
    if in_order:
        joins = "\n  ".join(
            f"JOIN p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos > p{i - 1}.pos"
            for i in range(1, n)
        )
        window = f"p{n - 1}.pos - p0.pos <= {slop + n - 1}"
    else:  # any clause count: pairwise-distinct positions, span bound
        joins = "\n  ".join(
            f"JOIN p{i} ON p{i}.doc_id = p0.doc_id AND "
            + " AND ".join(f"p{i}.pos != p{j}.pos" for j in range(i))
            for i in range(1, n)
        )
        allpos = ", ".join(f"p{i}.pos" for i in range(n))
        window = f"greatest({allpos}) - least({allpos}) <= {slop + n - 1}"
    matches = f"""{plists},
matches AS (
  SELECT p0.doc_id, count(DISTINCT p0.pos)::DOUBLE AS freq
  FROM p0
  {joins}
  WHERE {window}
  GROUP BY p0.doc_id
)"""
    return _span_scored_sql(matches, _span_idf_sum(flat_terms), k)


def _topk_span_not_sql(inc: str, exc: str, pre: int, post: int, k: int) -> str:
    """SpanNotQuery oracle: freq = include occurrences with no exclude
    occurrence in [pos - pre, pos + post]; only include carries weight."""
    matches = f"""matches AS (
  SELECT i.doc_id, count(*)::DOUBLE AS freq FROM tokpos i
  WHERE i.term = '{inc}' AND NOT EXISTS (
    SELECT 1 FROM tokpos e
    WHERE e.doc_id = i.doc_id AND e.term = '{exc}'
      AND e.pos >= i.pos - {pre} AND e.pos <= i.pos + {post})
  GROUP BY i.doc_id
)"""
    return _span_scored_sql(matches, _span_idf_sum([inc]), k)


def _topk_span_first_sql(term: str, end: int, k: int) -> str:
    """SpanFirstQuery oracle: freq = occurrences at position < end."""
    matches = f"""matches AS (
  SELECT doc_id, count(*)::DOUBLE AS freq FROM tokpos
  WHERE term = '{term}' AND pos < {end}
  GROUP BY doc_id
)"""
    return _span_scored_sql(matches, _span_idf_sum([term]), k)


def _constant_topk_sql(term_pred: str, k: int) -> str:
    """Constant-score top-k (MultiTermQuery CONSTANT_SCORE_REWRITE): every
    matching doc scores 1.0; ties by docID ascending."""
    return f"""
WITH {_TOKS},
cand AS (SELECT DISTINCT doc_id FROM toks WHERE {term_pred})
SELECT row_number() OVER (ORDER BY doc_id) AS rank, doc_id, 1.0::DOUBLE AS score
FROM cand ORDER BY doc_id LIMIT {k}
"""


def _dismax_topk_sql(terms: list[str], k: int) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
tfs AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks
        WHERE term IN ({tlist}) GROUP BY doc_id, term),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.doc_id,
         max({_bm25_score_expr(_idf_expr("dfs.df"), "t.freq", "n.norm")}) AS score
  FROM tfs t JOIN dfs ON dfs.term = t.term
  JOIN norms n ON n.doc_id = t.doc_id, stats
  GROUP BY t.doc_id
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _range_filter_topk_sql(term: str, lo: int, hi: int, k: int) -> str:
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
tf AS (SELECT doc_id, count(*)::DOUBLE AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id),
dfv AS (SELECT count(*)::DOUBLE AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         {_bm25_score_expr(_idf_expr("dfv.df"), "tf.freq", "n.norm")} AS score
  FROM tf JOIN norms n ON n.doc_id = tf.doc_id, dfv, stats
  WHERE tf.doc_id BETWEEN {lo} AND {hi}
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _topk_term_filtered_sql(term: str, k: int, filter_pred: str) -> str:
    """Scored text-term top-k restricted by a docID predicate (keyword-field
    FILTER / doc-values range FILTER / tombstone exclusion). BM25 inputs
    (df, norms, collection stats) stay GLOBAL — filters and deletes never
    change scoring, matching the engine's collect-time filtering."""
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
tf AS (SELECT doc_id, count(*)::DOUBLE AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id),
dfv AS (SELECT count(*)::DOUBLE AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         {_bm25_score_expr(_idf_expr("dfv.df"), "tf.freq", "n.norm")} AS score
  FROM tf JOIN norms n ON n.doc_id = tf.doc_id, dfv, stats
  WHERE {filter_pred}
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _field_term_topk_sql(fld: str, value: str, k: int) -> str:
    """Keyword-field BM25 top-k: freq=1, norm=1, per-FIELD collection stats
    (doc_count = sum_ttf = docs with a non-null value => avgdl = 1)."""
    ninv = f"1.0/({K1}*((1-{B}) + {B}*1.0/(fstats.sum_ttf/fstats.doc_count)))"
    w = f"ln(1 + (fstats.doc_count - dfv.df + 0.5)/(dfv.df + 0.5))"
    return f"""
WITH fstats AS (
  SELECT count(*)::DOUBLE AS doc_count, count(*)::DOUBLE AS sum_ttf
  FROM documents WHERE {fld} IS NOT NULL
),
tf AS (SELECT doc_id FROM documents WHERE {fld} = '{value}'),
dfv AS (SELECT count(*)::DOUBLE AS df FROM tf),
scored AS (
  SELECT tf.doc_id, ({w}) - ({w})/(1 + 1.0 * {ninv}) AS score
  FROM tf, dfv, fstats
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _paged_topk_sql(term: str, page: int, page_size: int) -> str:
    lo = (page - 1) * page_size + 1
    hi = page * page_size
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
tf AS (SELECT doc_id, count(*)::DOUBLE AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id),
dfv AS (SELECT count(*)::DOUBLE AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         {_bm25_score_expr(_idf_expr("dfv.df"), "tf.freq", "n.norm")} AS score
  FROM tf JOIN norms n ON n.doc_id = tf.doc_id, dfv, stats
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank BETWEEN {lo} AND {hi} ORDER BY rank
"""


# ---------------------------------------------------------------------------
# suite plumbing: families of related operators share ONE gate entry with a
# qid column (the driver's correctness window is capped at 50 entries; a
# suite keeps every operator SQL-checked without overflowing it). The value
# hash is order-insensitive and qid-disambiguated, so a failure in any
# sub-query fails the whole entry — same evidentiary strength, fewer rows.
# ---------------------------------------------------------------------------


_SIMSUITE_COLS = ("doc_id", "simhash", "a", "b", "distance")


def _pad_int64(t, cols: tuple, fill: int = -1):
    """Align a (Dataset|Table) to the given int64 column set, filling the
    missing columns with a sentinel — lets schema-diverse suite parts share
    ONE exact schema (sentinels, not nulls: the value-hash comparator's
    tuple sort is only total without NaN)."""
    import pyarrow as pa
    import ray.data

    if isinstance(t, ray.data.Dataset):
        t = pa.Table.from_pandas(t.to_pandas(), preserve_index=False)
    n = t.num_rows
    out = {}
    for c in cols:
        out[c] = (
            t[c].cast(pa.int64())
            if c in t.column_names
            else pa.array([fill] * n, pa.int64())
        )
    return pa.table(out)


def _suite(parts: dict[str, Any], permissive: bool = False) -> Any:
    """Compose {qid: callable(sf) -> Table/Dataset/DataFrame} into one
    callable returning a single pyarrow table with a leading qid column.
    ``permissive=True`` null-pads differing schemas — used only for
    rows-only suites (the driver counts rows there; SQL suites must keep
    one exact schema)."""
    import pandas as pd
    import pyarrow as pa

    def run(sf_dir: str):
        import ray.data

        tabs = []
        for qid, fn in parts.items():
            t = fn(sf_dir)
            if isinstance(t, ray.data.Dataset):
                t = pa.Table.from_pandas(t.to_pandas(), preserve_index=False)
            elif isinstance(t, pd.DataFrame):
                t = pa.Table.from_pandas(t, preserve_index=False)
            tabs.append(
                t.add_column(0, "qid", pa.array([qid] * t.num_rows, pa.string()))
            )
        if permissive:
            return pa.concat_tables(tabs, promote_options="permissive")
        return pa.concat_tables(tabs)

    return run


def _suite_sql(parts: dict[str, str]) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{qid}' AS qid, * FROM ({sql})" for qid, sql in parts.items()
    )


def _topk_sort_field_sql(term: str, fld: str, k: int) -> str:
    """Field-sorted top-k of the term's hit set (TopFieldCollector):
    order by dv field DESC with missing-last, then docID asc."""
    return f"""
WITH {_TOKS},
mset AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{term}')
SELECT rank, doc_id, {fld} FROM (
  SELECT row_number() OVER (ORDER BY d.{fld} DESC NULLS LAST, d.doc_id) AS rank,
         d.doc_id, d.{fld}
  FROM documents d JOIN mset USING (doc_id))
WHERE rank <= {k} ORDER BY rank
"""


# --- multimodal oracle: the deterministic fake kernels are pure functions
# of the payload bytes (FNV-style end-fold + splitmix64, multimodal.py),
# so DuckDB can recompute them EXACTLY with 64-bit wrap arithmetic emulated
# via HUGEINT mod 2^64 (constants split into 32-bit halves so the int128
# products never overflow). Generated as a chain of one-step CTEs.

_M64 = "18446744073709551616::HUGEINT"


def _mm_wrap(e: str) -> str:
    return f"((({e}) % {_M64}))::UBIGINT"


def _mm_mul64(a: str, b: int) -> str:
    if b < (1 << 62):
        return _mm_wrap(f"({a})::HUGEINT * {b}::HUGEINT")
    hi, lo = b >> 32, b & 0xFFFFFFFF
    return _mm_wrap(
        f"(({a})::HUGEINT * {lo}::HUGEINT) % {_M64}"
        f" + ((({a})::HUGEINT * {hi}::HUGEINT) % 4294967296::HUGEINT)"
        f" * 4294967296::HUGEINT"
    )


def _mm_mix_steps(h_col: str, seed: int, prefix: str):
    """splitmix64 _mix(h, seed) (pipelines/dedup.py:105) as CTE steps."""
    c1 = (seed * 0x9E3779B97F4A7C15) % (1 << 64)
    s = [(f"{prefix}z1", _mm_wrap(f"({h_col})::HUGEINT + {c1}::HUGEINT"))]
    z1, z2, z3 = f"{prefix}z1", f"{prefix}z2", f"{prefix}z3"
    s.append((z2, _mm_mul64(f"xor({z1}, {z1} >> 30)", 0xBF58476D1CE4E5B9)))
    s.append((z3, _mm_mul64(f"xor({z2}, {z2} >> 27)", 0x94D049BB133111EB)))
    s.append((f"{prefix}out", f"xor({z3}, {z3} >> 31)"))
    return s, f"{prefix}out"


# --- minhash / simhash oracles: the fingerprints are DETERMINISTIC pure
# functions of the text (FNV-1a token hashes -> FNV shingle chains ->
# splitmix64 permutations / bit votes, pipelines/dedup.py:29-199), so the
# whole LSH pipeline replays in DuckDB with the same HUGEINT-mod-2^64
# wrap emulation as the multimodal oracle. The banding is replayed too:
# a minhash pair is emitted only if some band's rows all agree, exactly
# like the engine's band_bucket groupby.

_FNV_OFF_SQL = "14695981039346656037::UBIGINT"


def _mulp(e: str) -> str:
    """wrap64(e * FNV_PRIME) — the prime fits 40 bits, product fits HUGEINT."""
    return f"((({e})::HUGEINT * 1099511628211::HUGEINT) % {_M64})::UBIGINT"


def _mix_expr(h: str, seed: int) -> str:
    """splitmix64 _mix(h, seed) (dedup.py:105) as one nested expression."""
    c1 = (seed * 0x9E3779B97F4A7C15) % (1 << 64)
    z1 = f"((({h})::HUGEINT + {c1}::HUGEINT) % {_M64})::UBIGINT"
    z2 = _mm_mul64(f"xor({z1}, ({z1}) >> 30)", 0xBF58476D1CE4E5B9)
    z3 = _mm_mul64(f"xor({z2}, ({z2}) >> 27)", 0x94D049BB133111EB)
    return f"xor({z3}, ({z3}) >> 31)"


def _shingle_ctes(k: int) -> str:
    """CTEs: dtoks (lowercased whitespace tokens with positions) -> dth
    (FNV-1a token hashes, list per doc) -> shingles (doc_id, sh) with the
    engine's short-doc clamp (docs with 0 < n < k emit ONE shingle over
    end-clamped positions; empty docs emit none)."""
    # shingle chain out = (out * PRIME) ^ th, starting at 0 — for
    # j_exprs = the k (1-based) list indices into ths
    def chain(idx_exprs: list[str]) -> str:
        e = f"ths[{idx_exprs[0]}]"
        for ix in idx_exprs[1:]:
            e = f"xor({_mulp(e)}, ths[{ix}])"
        return e

    long_idx = [f"s::INT + {j + 1}" for j in range(k)]
    short_idx = [f"least({j}, n - 1) + 1" for j in range(k)]
    return f"""dtoks AS (
  SELECT doc_id, tok_idx, lower(tok) AS tok
  FROM (SELECT doc_id, unnest(string_split_regex(text, '{_WS}')) AS tok,
               generate_subscripts(string_split_regex(text, '{_WS}'), 1) AS tok_idx
        FROM documents)
),
dth AS (
  SELECT doc_id, list(
    CASE WHEN octet_length(encode(tok)) = 0 THEN {_FNV_OFF_SQL}
    ELSE list_reduce(
      list_prepend({_FNV_OFF_SQL},
        list_transform(range(octet_length(encode(tok))),
          i -> ('0x' || substr(hex(encode(tok)), 2*i::INT+1, 2))::UBIGINT)),
      (acc, b) -> {_mulp('xor(acc::UBIGINT, b::UBIGINT)')}
    ) END ORDER BY tok_idx) AS ths
  FROM dtoks GROUP BY doc_id
),
shingles AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ths) = 0 THEN []::UBIGINT[]
         WHEN len(ths) < {k} THEN (SELECT [{chain(short_idx)}] FROM (SELECT len(ths) AS n))
         ELSE list_transform(range(len(ths) - {k} + 1), s -> {chain(long_idx)})
    END) AS sh
  FROM dth
)"""


def _minhash_pairs_sql(
    num_hashes: int = 64, bands: int = 16, k: int = 3,
    threshold: float = 0.5,
) -> str:
    rows = num_hashes // bands
    maxu = "18446744073709551615::UBIGINT"
    sig_cols = ", ".join(
        f"min({_mix_expr('sh', i + 1)}) AS s{i}" for i in range(num_hashes)
    )
    full_cols = ", ".join(
        f"coalesce(s.s{i}, {maxu}) AS s{i}" for i in range(num_hashes)
    )
    eq_sum = " + ".join(
        f"(x.s{i} = y.s{i})::INT" for i in range(num_hashes)
    )
    band_or = " OR ".join(
        "(" + " AND ".join(
            f"x.s{b * rows + r} = y.s{b * rows + r}" for r in range(rows)
        ) + ")"
        for b in range(bands)
    )
    return f"""
WITH {_shingle_ctes(k)},
sig AS (SELECT doc_id, {sig_cols} FROM shingles GROUP BY doc_id),
sigfull AS (
  SELECT d.doc_id, {full_cols}
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT a, b, jaccard_est FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         ({eq_sum}) / {num_hashes}.0 AS jaccard_est,
         ({band_or}) AS cand
  FROM sigfull x JOIN sigfull y ON x.doc_id < y.doc_id)
WHERE cand AND jaccard_est >= {threshold}
ORDER BY a, b
"""


def _simhash_table_sql(k: int = 2) -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * sum(((sh >> {b}) & 1)::BIGINT) > count(*) "
        f"THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64)
    )
    return f"""
WITH {_shingle_ctes(k)},
sv AS (SELECT doc_id, ({bit_terms}) AS v FROM shingles GROUP BY doc_id)
SELECT d.doc_id,
       (CASE WHEN coalesce(sv.v, 0::HUGEINT) >= 9223372036854775808::HUGEINT
             THEN coalesce(sv.v, 0::HUGEINT) - {_M64}
             ELSE coalesce(sv.v, 0::HUGEINT) END)::BIGINT AS simhash
FROM documents d LEFT JOIN sv USING (doc_id)
ORDER BY doc_id
"""


def _simhash_pairs_sql(max_distance: int = 3, k: int = 2) -> str:
    """Hamming pairs over the replayed fingerprints. The engine's Manku
    banding (max_distance+1 bands) is recall-EXACT by pigeonhole — every
    pair within distance d agrees on some band — so the oracle is simply
    the distance filter."""
    table = _simhash_table_sql(k)
    return f"""
WITH sim AS ({table})
SELECT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash))::BIGINT AS distance
FROM sim x JOIN sim y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_distance}
ORDER BY a, b
"""


def _multimodal_sql(dim: int = 16) -> str:
    steps = []
    prev = "h0"
    for j in range(8):  # b[:8] fold (multimodal._payload_hashes)
        byte = f"('0x' || substr(hx, {2 * j + 1}, 2))::UBIGINT"
        steps.append(
            (
                f"hf{j}",
                f"CASE WHEN least(len, 8) > {j} THEN "
                f"{_mm_mul64(f'xor({prev}, {byte})', 0x100000001B3)} "
                f"ELSE {prev} END",
            )
        )
        prev = f"hf{j}"
    for j in range(8):  # b[-8:] fold
        byte = (
            f"('0x' || substr(hx, (2*(len::BIGINT - least(len::BIGINT, 8)"
            f" + {j}) + 1), 2))::UBIGINT"
        )
        steps.append(
            (
                f"hb{j}",
                f"CASE WHEN least(len, 8) > {j} THEN "
                f"{_mm_mul64(f'xor({prev}, {byte})', 0x100000001B3)} "
                f"ELSE {prev} END",
            )
        )
        prev = f"hb{j}"
    mix5, H = _mm_mix_steps(prev, 5, "m5_")
    steps += mix5
    emb_cols = []
    for d in range(dim):  # EmbedStage: _mix(H, d + 11) -> float32 value
        ms, out = _mm_mix_steps(H, d + 11, f"e{d}_")
        steps += ms
        emb_cols.append(
            f"CAST(({out})::DOUBLE / 18446744073709551616.0 - 0.5 AS FLOAT)::DOUBLE"
        )
    sql = (
        "WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,"
        " octet_length(encode(text))::UBIGINT AS len,"
        " octet_length(encode(text))::UBIGINT AS h0 FROM documents)\n"
    )
    prev_cte = "b"
    for i, (col, expr) in enumerate(steps):
        sql += f", s{i} AS (SELECT *, {expr} AS {col} FROM {prev_cte})\n"
        prev_cte = f"s{i}"
    sq_sum = " + ".join(f"({e}) * ({e})" for e in emb_cols)
    return sql + f"""
SELECT doc_id,
       ({H} % 1920 + 16)::INTEGER AS width,
       (({H} >> 11) % 1080 + 16)::INTEGER AS height,
       (({H} >> 22) % 256)::DOUBLE AS mean_luma,
       round(sqrt({sq_sum}), 6) AS emb_norm
FROM {prev_cte}
"""


_JACCARD_SQL = f"""
WITH raw AS (
  SELECT doc_id,
         lower(unnest(string_split_regex(text, '{_WS}'))) AS tok,
         generate_subscripts(string_split_regex(text, '{_WS}'), 1) AS idx
  FROM documents
),
sh0 AS (
  SELECT DISTINCT t0.doc_id, t0.tok || ' ' || t1.tok || ' ' || t2.tok AS shingle
  FROM raw t0
  JOIN raw t1 ON t1.doc_id = t0.doc_id AND t1.idx = t0.idx + 1
  JOIN raw t2 ON t2.doc_id = t0.doc_id AND t2.idx = t0.idx + 2
),
-- hot-shingle cap (df <= 256), mirroring the engine's max_shingle_df:
-- Jaccard is computed over the capped shingle space on BOTH sides
sh AS (
  SELECT sh0.* FROM sh0
  JOIN (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 256) k
  USING (shingle)
),
sizes AS (SELECT doc_id, count(*)::DOUBLE AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS c
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.a, i.b, round(i.c / (sa.n + sb.n - i.c), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.5
"""

def _topk_mlt_sql(doc: int, n_terms: int, k: int) -> str:
    """MoreLikeThis oracle: the same rounded tf*idf interesting-term
    selection (score desc, term asc), then the SHOULD query over the
    selected set — dynamic term list via a CTE instead of literals."""
    w = _idf_expr("dfs.df")
    return f"""
WITH {_TOKS}, {_NORMS}, {_STATS},
dtf AS (SELECT term, count(*)::DOUBLE AS freq FROM toks
        WHERE doc_id = {doc} GROUP BY term),
alldf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM toks GROUP BY term),
sel AS (SELECT d.term FROM dtf d JOIN alldf a USING (term), stats
        ORDER BY round(d.freq *
          ln(1 + (stats.doc_count - a.df + 0.5)/(a.df + 0.5)), 6) DESC, d.term
        LIMIT {n_terms}),
tfs AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks
        WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.doc_id,
         sum({_bm25_score_expr(w, "t.freq", "n.norm")}) AS score
  FROM tfs t JOIN dfs USING (term)
  JOIN norms n ON n.doc_id = t.doc_id, stats
  GROUP BY t.doc_id
)
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored)
WHERE rank <= {k} ORDER BY rank
"""


def _funnel_sql(steps: tuple, within_s: int) -> str:
    """Funnel oracle: the greedy-earliest chain is a min() self-join chain
    (earliest step-i event strictly after the step-(i-1) time); because
    times only increase along the chain, 'earliest after cur, then window
    check' equals the engine's per-step window gate exactly. One
    total_hits row per funnel prefix."""
    w_us = within_s * 1_000_000
    ctes = [
        "e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events)",
        f"s1 AS (SELECT user_id, min(us) AS t1, min(us) AS anchor FROM e "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)",
    ]
    for i in range(2, len(steps) + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.us) AS t{i}, "
            f"min({prev}.anchor) AS anchor "
            f"FROM e JOIN {prev} USING (user_id) "
            f"WHERE e.event_type = '{steps[i - 1]}' AND e.us > {prev}.t{i - 1} "
            f"GROUP BY e.user_id "
            f"HAVING min(e.us) - min({prev}.anchor) <= {w_us})"
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT (SELECT count(*) FROM s{i})::BIGINT AS total_hits"
        for i in range(1, len(steps) + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def _near_dup_clusters_sql() -> str:
    """Connected components of the jaccard pair graph as a recursive CTE:
    a vertex's cluster is the min doc_id reachable from it (reach = the
    component in an undirected graph)."""
    return f"""
WITH RECURSIVE pairs AS (SELECT a, b FROM ({_JACCARD_SQL})),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
)
SELECT u AS doc_id, least(u, min(v))::BIGINT AS cluster_id
FROM reach GROUP BY u ORDER BY doc_id
"""


def _decontaminate_sql(L: int, mod: int) -> str:
    """Gram-STRING recompute of the decontamination flags (the engine
    groups 64-bit window hashes; a collision would fail this oracle)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '{_WS}'), x -> lower(x)) AS t
  FROM documents
),
wins AS (
  SELECT doc_id, array_to_string(t[i : i + {L - 1}], chr(31)) AS gram
  FROM toks, unnest(range(1, len(t) - {L} + 2)) AS u(i)
  WHERE len(t) >= {L}
),
ev AS (SELECT DISTINCT gram FROM wins WHERE doc_id % {mod} = 0)
SELECT doc_id, count(DISTINCT gram)::BIGINT AS shared_grams
FROM wins WHERE doc_id % {mod} != 0 AND gram IN (SELECT gram FROM ev)
GROUP BY doc_id ORDER BY doc_id
"""


def _stratified_sample_sql(
    rates: dict, default_rate: float, seed: int, mod: int
) -> str:
    """Replay the engine's splitmix64(doc_id, seed) % mod < rate·mod keep
    rule exactly (same HUGEINT mod-2^64 arithmetic as the multimodal
    oracle)."""
    steps, out = _mm_mix_steps("h0", seed, "sm_")
    sql = "WITH b AS (SELECT doc_id, lang, doc_id::UBIGINT AS h0 FROM documents)\n"
    prev = "b"
    for i, (col, expr) in enumerate(steps):
        sql += f", t{i} AS (SELECT *, {expr} AS {col} FROM {prev})\n"
        prev = f"t{i}"
    case = (
        "CASE "
        + " ".join(
            f"WHEN lang = '{k}' THEN {int(round(r * mod))}"
            for k, r in rates.items()
        )
        + f" ELSE {int(round(default_rate * mod))} END"
    )
    return sql + f"SELECT doc_id, lang FROM {prev} WHERE ({out} % {mod}) < {case}"


def _pack_sequences_sql(capacity: int) -> str:
    """Token-offset prefix sum over doc_id order as a window function."""
    prefix = (
        "coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(text, '{_WS}'))::BIGINT AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       {prefix}::BIGINT AS "offset",
       ({prefix} // {capacity})::BIGINT AS pack_id
FROM t ORDER BY doc_id
"""


def _lm_perplexity_sql(train_mod: int) -> str:
    """CCNet-style bigram-LM perplexity recomputed from gram STRINGS with
    the engine's exact constants (lm.py: LAMBDA=0.9, ALPHA=1.0; (1-0.9)
    written as an expression so both engines evaluate the same float).
    The engine counts 64-bit token hashes — a collision would fail this.
    Rounding to 6 decimals absorbs the groupwise float-sum order."""
    p_add_u = "(coalesce(u.c, 0) + 1.0) / (st.N + 1.0 * (st.V + 1))"
    return f"""
WITH {_TOKPOS},
tr_uni AS (SELECT term, count(*)::DOUBLE AS c FROM tokpos
           WHERE doc_id % {train_mod} = 0 GROUP BY term),
tr_stats AS (SELECT sum(c)::DOUBLE AS N, count(*)::DOUBLE AS V FROM tr_uni),
tr_bi AS (SELECT a.term AS v, b.term AS w, count(*)::DOUBLE AS c
          FROM tokpos a JOIN tokpos b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          WHERE a.doc_id % {train_mod} = 0 GROUP BY 1, 2),
seq AS (
  SELECT doc_id, pos, term,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tokpos
),
p AS (
  SELECT s.doc_id,
         CASE WHEN s.prev IS NULL
              THEN {p_add_u}
              ELSE 0.9 * (CASE WHEN cu.c IS NULL OR cu.c = 0 THEN 0
                               ELSE coalesce(bi.c, 0) / cu.c END)
                   + (1 - 0.9) * ({p_add_u})
         END AS prob
  FROM seq s
  LEFT JOIN tr_uni u ON u.term = s.term
  LEFT JOIN tr_uni cu ON cu.term = s.prev
  LEFT JOIN tr_bi bi ON bi.v = s.prev AND bi.w = s.term, tr_stats st
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(-sum(log10(prob)) / count(*), 6) AS log10_ppl
FROM p GROUP BY doc_id ORDER BY doc_id
"""


_CURATED_SQL = f"""
WITH raw AS (
  SELECT doc_id, text, length(text)::BIGINT AS n_chars,
         string_split_regex(text, '{_WS}') AS toks
  FROM documents
),
flat AS (SELECT doc_id, lower(unnest(toks)) AS term FROM raw),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN term IN ({_STOPS}) THEN 1 ELSE 0 END)::DOUBLE AS n_stop
  FROM flat GROUP BY doc_id
),
q AS (
  SELECT r.doc_id, r.text
  FROM raw r JOIN agg a USING (doc_id)
  WHERE r.n_chars BETWEEN 50 AND 1000000
    AND a.n_tokens >= 10
    AND round(a.n_stop / a.n_tokens, 6) <= 0.6
)
SELECT min(doc_id)::BIGINT AS doc_id FROM q GROUP BY text
"""

_EMB_NEAR_DUP_SQL = """
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         round(list_cosine_similarity(a.v, b.v), 6) AS sim
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT a, b, sim FROM pairs WHERE sim >= 0.4
"""


# ---------------------------------------------------------------------------
# gate query terms (all present at every sf of the synthetic documents table)
# ---------------------------------------------------------------------------

_TERM = "spark"
_AND_TERMS = ["sort", "merge"]
_OR_TERMS = ["spark", "window", "dup"]
_NOT_TERMS = ["scan", "join"]
_MSM_TERMS = ["spark", "window", "dup", "batch"]
_PHRASE = ["batch", "scan"]
_PREFIX = "sp"
_RANGE = ["m", "p"]
_SET_TERMS = ["spark", "window", "dup"]
_DISMAX_TERMS = ["spark", "window"]
_FILTER_TERM, _FILTER_LO, _FILTER_HI = "spark", 100, 400
_K = 10
# multi-field / doc-values / delete gate constants
_KW_FIELD, _KW_VALUE = "lang", "fr"
_MIX_TERM, _MIX_FIELD, _MIX_VALUE = "spark", "lang", "en"
_NR_TERM, _NR_FIELD, _NR_LO, _NR_HI = "spark", "n_chars", 150, 350
_DEL_FIELD, _DEL_VALUE, _DEL_TERM = "lang", "de", "spark"
# wildcard / fuzzy (automaton-family) + point-set / 2-D box gate constants
_WILDCARD = "s*k"  # term LIKE 's%k'
_WILDCARD_LEAD = "*er"  # leading wildcard: reversed-dictionary suffix seek
_REGEXP = "s[ch][a-z]+"  # regexp_full_match on the term dictionary
_FUZZY_TERM, _FUZZY_EDITS, _FUZZY_PREFIX = "spark", 1, 1
_NS_TERM, _NS_FIELD, _NS_VALUES = "spark", "n_chars", (150, 200, 250, 300)
_BOX = ("spark", "n_chars", 100, 400, "doc_id", 50, 400)
_FE_FIELD = "lang"
_FACET_FIELD, _FACET_N = "lang", 10  # facet field (keyword) and top-N
# RangeField gate constants (core/query/rangefieldquery.go relations over
# the per-doc interval [min(doc_id, n_chars), max(doc_id, n_chars)])
_RF_TERM, _RF_FIELD = "spark", "span"
_RF_Q = (150, 300)  # intersects / contains / crosses query interval
_RF_WITHIN = (150, 2000)  # wider interval so WITHIN selects a real subset
# expungeDeletes gate constants (delete lang=es, compact, re-query)
_EXP_FIELD, _EXP_VALUE, _EXP_TERM = "lang", "es", "spark"
# incremental-merge gate: re-append the fr docs (doc_id order) through the
# delta-fold path; appended docIDs = count(*) + row_number() - 1
_INC_FIELD, _INC_VALUE, _INC_TERM = "lang", "fr", "spark"
_INC_CORPUS = (
    "FROM (SELECT doc_id, text FROM documents UNION ALL "
    "SELECT (SELECT count(*) FROM documents) "
    "+ row_number() OVER (ORDER BY doc_id) - 1 AS doc_id, text "
    "FROM documents WHERE {f} = '{v}') aug)"
).format(f=_INC_FIELD, v=_INC_VALUE)
# non-prefix regexp (no literal prefix: exercises automaton-bounded
# dictionary expansion instead of the prefix seek)
_REGEXP_NOPREFIX = "[a-z]*ar[kt]"
# TopFieldCollector gate constants (top-k of the term's hits by dv desc)
_SF_TERM, _SF_FIELD = "spark", "n_chars"
_SF_STR_FIELD = "source"  # SORTED string dv sort (docvaluesreader.go:129)


def _sort_value_str(t, fld: str):
    """Rename a topk_sort_field result's value column to sort_value and
    cast to string, giving the numeric and string qids ONE exact schema."""
    import pyarrow as pa

    idx = t.column_names.index(fld)
    return t.set_column(idx, "sort_value", t[fld].cast(pa.string()))
# dv-update gate constants (set n_chars := 999 on lang=fr docs, then a
# numeric-range-filtered top-k sees the UPDATED values)
_DVU_TERM, _DVU_FIELD, _DVU_VALUE, _DVU_NEW = "spark", "lang", "fr", 999
# pluggable-collector gate constants (doc-values histogram over matches)
_HIST = ("spark", "n_chars", 0, 500, 10)  # term, field, lo, hi, n_buckets
# span proximity gate constants (SpanNearQuery/SpanFirstQuery — the spans
# surface the reference declares but stubs, core/search/spans/)
_SPAN_ORD2_TERMS, _SPAN_ORD2_SLOP = ["batch", "scan"], 2
_SPAN_ORD3_TERMS, _SPAN_ORD3_SLOP = ["sort", "merge", "batch"], 6
_SPAN_UNORD_TERMS, _SPAN_UNORD_SLOP = ["spark", "window"], 3
_SPAN_UNORD3_TERMS, _SPAN_UNORD3_SLOP = ["sort", "merge", "batch"], 4
# OR-clause chain (SpanOr-inside-SpanNear): '|' separates alternatives in
# the descriptor; the list form feeds the SQL generator
_SPAN_OR_TERMS, _SPAN_OR_SLOP = [["batch", "scan"], "merge"], 3
# unordered with OVERLAPPING non-identical alternative sets — exercises
# the anchor-forced deficiency-Hall matcher (clause 2's bare 'scan'
# competes with both OR-clauses for the same occurrences)
_SPAN_OVL_TERMS, _SPAN_OVL_SLOP = (
    [["batch", "scan"], ["scan", "merge"], "scan"],
    5,
)
_SPAN_FIRST_TERM, _SPAN_FIRST_END = "spark", 5
_SPAN_NOT = ("spark", "window", 2, 2)  # include, exclude, pre, post
# kd point-index gate constants: inclusive 3-D box over lineitem
# (l_quantity, l_extendedprice, l_discount) — the BKD >2-D regime
_KD_LO = (10.0, 20000.0, 0.02)
_KD_HI = (30.0, 60000.0, 0.06)
# near-dup clustering: connected components over the jaccard pair graph
_CC_THRESHOLD = 0.5
# decontamination: L-token gram overlap vs the doc_id % mod == 0 eval set
_DECON_L, _DECON_MOD = 8, 7
# stratified sampling: per-lang keep rates, splitmix64(doc_id, seed) % mod
_SAMPLE_RATES = {"en": 0.5, "fr": 0.3, "de": 0.2}
_SAMPLE_DEFAULT, _SAMPLE_SEED, _SAMPLE_MOD = 0.1, 13, 10000
# sequence packing: fixed-capacity context assignment by token prefix sum
_PACK_CAPACITY = 512
# global top-k frequent n-grams (pre-combined wide aggregation)
_TOPGRAM_N, _TOPGRAM_K = 3, 100
# CCNet-style LM perplexity: reference subset = doc_id % mod == 0
_LM_TRAIN_MOD = 11
# SemDeDup: k-means clusters, Lloyd iterations, within-cluster cosine
_SEM_K, _SEM_ITERS, _SEM_THRESHOLD = 8, 4, 0.4
# BPE tokenizer training: merge-table size
_BPE_MERGES = 30
# MoreLikeThis source doc + interesting-term count; suggest prefix
_MLT_DOC, _MLT_TERMS = 42, 5
_SUGGEST_PREFIX = "s"
# exact per-lang quantiles; HLL precision
_GQ_QS = (0.5, 0.9)
_HLL_P = 12
# funnel: ordered step sequence + chain window (greedy-earliest chain,
# whole chain within the window of the step-1 anchor)
_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WITHIN = 28800


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the merged inverted index over the
    documents table and answer a distributed batch of BM25 queries."""
    from lucene_go_ray.pipelines import fulltext

    sf_dir = "/root/testdata/sf0.001"
    s = fulltext.get_searcher(sf_dir)
    queries = [
        {"qid": 0, "kind": "term", "clauses": [_TERM], "k": 10},
        {"qid": 1, "kind": "bool_and", "clauses": _AND_TERMS, "k": 10},
        {"qid": 2, "kind": "bool_or", "clauses": _OR_TERMS, "k": 10},
        {"qid": 3, "kind": "bool_not", "clauses": _NOT_TERMS, "k": 10},
        {"qid": 4, "kind": "phrase", "clauses": _PHRASE, "k": 10},
    ]
    return s.search_batch_dataset(queries, k=10).to_pandas()


def _multimodal_features(sf):
    from lucene_go_ray.pipelines import multimodal

    return multimodal.multimodal_features(sf)


def _curated_ids(sf):
    from lucene_go_ray.pipelines import curate

    return curate.curate(sf)


def _curated_near_dup(sf):
    from lucene_go_ray.pipelines import curate

    return curate.curate(sf, near_dup_threshold=_CC_THRESHOLD)


def _points_kd_box(sf):
    from lucene_go_ray.pipelines import points

    return points.kd_box(sf, _KD_LO, _KD_HI)


def _bpe_suite(sf):
    """Train once, then run both halves of the tokenizer story (rows-only
    permissive suite: merge table + per-doc encoded subword counts)."""
    from lucene_go_ray.pipelines import bpe

    merges = bpe.train_bpe(sf, num_merges=_BPE_MERGES)
    return _suite(
        {
            "merges": lambda _sf: merges,
            "encode": lambda _sf: bpe.encode_counts(_sf, merges),
        },
        permissive=True,
    )(sf)


def _kmeans_embeddings(sf):
    from lucene_go_ray.pipelines import semdedup

    return semdedup.kmeans_embeddings(sf, k=_SEM_K, iters=_SEM_ITERS)


def _semantic_dedup(sf):
    from lucene_go_ray.pipelines import semdedup

    return semdedup.semantic_dedup(
        sf, k=_SEM_K, iters=_SEM_ITERS, threshold=_SEM_THRESHOLD
    )


def _hll_distinct_terms(sf):
    from lucene_go_ray.pipelines import sketch

    return sketch.hll_distinct_terms(sf, p=_HLL_P)


def _lm_perplexity(sf):
    from lucene_go_ray.pipelines import lm

    return lm.lm_perplexity(sf, train_mod=_LM_TRAIN_MOD)


def _stratified_sample(sf):
    from lucene_go_ray.pipelines import sampling

    return sampling.stratified_sample(
        sf,
        rates=_SAMPLE_RATES,
        default_rate=_SAMPLE_DEFAULT,
        seed=_SAMPLE_SEED,
        mod=_SAMPLE_MOD,
    )


def _pack_sequences(sf):
    from lucene_go_ray.pipelines import pack

    return pack.pack_sequences(sf, capacity=_PACK_CAPACITY)


def _funnel_counts(sf):
    import pyarrow as pa

    from lucene_go_ray.pipelines import events

    t = events.funnel_counts(
        sf, steps=_FUNNEL_STEPS, within_seconds=_FUNNEL_WITHIN
    )
    return pa.table({"total_hits": t["n_users"]})


def _window_counts(sf):
    from lucene_go_ray.pipelines import events

    return events.tumbling_window_counts(sf, window_seconds=3600)


def _sessions(sf):
    from lucene_go_ray.pipelines import events

    return events.sessionize(sf, gap_seconds=1800)


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_go_ray.pipelines import ann, dedup, fulltext, textstats
    from lucene_go_ray.search.query import BooleanQuery

    def msm_topk(sf_dir):
        import numpy as np
        import pyarrow as pa

        s = fulltext.get_searcher(sf_dir)
        q = BooleanQuery.build(should=_MSM_TERMS, minimum_should_match=2)
        td = s.search(q, _K + 200)
        s6 = np.round(td.scores, 6)
        order = np.lexsort((td.doc_ids, -s6))[:_K]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": pa.array(td.doc_ids[order]),
                "score": pa.array(s6[order], type=pa.float64()),
            }
        )

    def _bpe_renamed(sf):
        # shares the token_counts_suite schema: n_bpe_tokens -> n_tokens
        return textstats.bpe_token_counts(sf).map_batches(
            lambda b: b.rename_columns(
                [
                    "n_tokens" if c == "n_bpe_tokens" else c
                    for c in b.column_names
                ]
            ),
            batch_format="pyarrow",
        )

    # Families of related operators share one suite entry (qid column) so
    # that EVERY entry fits inside the driver's 50-entry correctness
    # window — the round-3 verdict's top item. Newest / least-proven
    # entries lead.
    return {
        # --- round-4 curation additions (newest first) ---
        "near_dup_clusters": lambda sf: dedup.near_dup_clusters(
            sf, threshold=_CC_THRESHOLD
        ),
        "decontaminate": lambda sf: dedup.decontaminate(
            sf, L=_DECON_L, bench_mod=_DECON_MOD
        ),
        "stratified_sample": lambda sf: _stratified_sample(sf),
        "pack_sequences": lambda sf: _pack_sequences(sf),
        "top_ngrams": lambda sf: textstats.top_ngrams(
            sf, n=_TOPGRAM_N, k=_TOPGRAM_K
        ),
        "lm_perplexity": _lm_perplexity,
        "bpe_suite": _bpe_suite,
        # --- round-4 surfaces + entries the r3 window dropped ---
        "points_kd_box": _points_kd_box,
        "topk_span_suite": _suite(
            {
                "ordered2": lambda sf: fulltext.topk(
                    sf, "span_near",
                    [str(_SPAN_ORD2_SLOP), "1", *_SPAN_ORD2_TERMS], _K,
                ),
                "ordered3": lambda sf: fulltext.topk(
                    sf, "span_near",
                    [str(_SPAN_ORD3_SLOP), "1", *_SPAN_ORD3_TERMS], _K,
                ),
                "unordered2": lambda sf: fulltext.topk(
                    sf, "span_near",
                    [str(_SPAN_UNORD_SLOP), "0", *_SPAN_UNORD_TERMS], _K,
                ),
                "unordered3": lambda sf: fulltext.topk(
                    sf, "span_near",
                    [str(_SPAN_UNORD3_SLOP), "0", *_SPAN_UNORD3_TERMS], _K,
                ),
                "first": lambda sf: fulltext.topk(
                    sf, "span_first",
                    [_SPAN_FIRST_TERM, str(_SPAN_FIRST_END)], _K,
                ),
                "not": lambda sf: fulltext.topk(
                    sf, "span_not", [str(c) for c in _SPAN_NOT], _K,
                ),
                "ordered_or": lambda sf: fulltext.topk(
                    sf, "span_near",
                    [
                        str(_SPAN_OR_SLOP), "1",
                        *(
                            c if isinstance(c, str) else "|".join(c)
                            for c in _SPAN_OR_TERMS
                        ),
                    ],
                    _K,
                ),
                "unordered_or_overlap": lambda sf: fulltext.topk(
                    sf, "span_near",
                    [
                        str(_SPAN_OVL_SLOP), "0",
                        *(
                            c if isinstance(c, str) else "|".join(c)
                            for c in _SPAN_OVL_TERMS
                        ),
                    ],
                    _K,
                ),
            }
        ),
        "payload_stats": lambda sf: fulltext.payload_stats(sf, _TERM),
        "topk_sort_field": _suite(
            {
                # one schema across qids: the sort value travels as string
                # (numeric qid casts) under a shared column name
                "numeric": lambda sf: _sort_value_str(
                    fulltext.topk_sort_field(
                        sf, _SF_TERM, [(_SF_FIELD, True)], _K
                    ),
                    _SF_FIELD,
                ),
                "string": lambda sf: _sort_value_str(
                    fulltext.topk_sort_field(
                        sf, _SF_TERM, [(_SF_STR_FIELD, True)], _K
                    ),
                    _SF_STR_FIELD,
                ),
            }
        ),
        "ann_cosine_topk_batch": lambda sf: ann.brute_force_topk_batch(
            sf, query_ids=(0, 1, 2), k=_K
        ),
        "ann_trained_suite": _suite(
            {
                "ivf": lambda sf: ann.ivf_topk(sf, k=_K),
                "ivfpq": lambda sf: ann.ivfpq_topk(sf, k=_K),
            }
        ),
        "kmeans_embeddings": _kmeans_embeddings,
        "semantic_dedup": _semantic_dedup,
        "facet_counts": _suite(
            {
                "postings": lambda sf: fulltext.facet_counts(
                    sf, _TERM, _FACET_FIELD, _FACET_N
                ),
                "dv": lambda sf: fulltext.facet_counts(
                    sf, _TERM, _FACET_FIELD, _FACET_N, use_dv=True
                ),
            }
        ),
        "multimodal_features": _multimodal_features,
        "text_quality": lambda sf: textstats.text_quality(sf),
        "language_id": lambda sf: textstats.language_id(sf),
        "fingerprints": lambda sf: textstats.fingerprints(sf),
        "ann_cosine_topk": lambda sf: ann.brute_force_topk(sf, k=_K),
        "ann_lsh_topk": lambda sf: ann.lsh_bucketed_topk(sf, k=_K),
        "window_counts": _window_counts,
        "sessions": _sessions,
        # --- analysis / stats (index-build surfaces) ---
        "term_stats_suite": _suite(
            {
                "text": lambda sf: fulltext.term_stats(sf),
                "field": lambda sf: fulltext.field_term_stats(sf, _KW_FIELD),
            }
        ),
        "collection_stats": lambda sf: fulltext.collection_stats(sf),
        "norms_suite": _suite(
            {
                "doc_norms": lambda sf: fulltext.doc_norms(sf),
                "sorted_topn": lambda sf: fulltext.sorted_topn_norms(sf, 20),
            }
        ),
        # --- top-k BM25 over the merged inverted index ---
        "topk_core_suite": _suite(
            {
                "term": lambda sf: fulltext.topk(sf, "term", [_TERM], _K),
                "and": lambda sf: fulltext.topk(sf, "bool_and", _AND_TERMS, _K),
                "or": lambda sf: fulltext.topk(sf, "bool_or", _OR_TERMS, _K),
                "not": lambda sf: fulltext.topk(sf, "bool_not", _NOT_TERMS, _K),
                "msm": msm_topk,
                "phrase": lambda sf: fulltext.topk(sf, "phrase", _PHRASE, _K),
            }
        ),
        "topk_mlt": lambda sf: fulltext.topk_mlt(
            sf, _MLT_DOC, n_terms=_MLT_TERMS, k=_K
        ),
        "suggest_terms": lambda sf: fulltext.suggest_terms(
            sf, _SUGGEST_PREFIX, k=_K
        ),
        "group_quantiles": lambda sf: textstats.group_quantiles(
            sf, qs=_GQ_QS
        ),
        "hll_distinct_terms": _hll_distinct_terms,
        "count_suite": _suite(
            {
                "term_doc_count": lambda sf: fulltext.term_doc_count(sf, _TERM),
                "field_exists": lambda sf: fulltext.field_exists_count(
                    sf, _FE_FIELD
                ),
                # funnel analysis: per-step completion counts reshaped to
                # the suite's (total_hits) schema
                "funnel": _funnel_counts,
            }
        ),
        # --- multi-term expansion family (constant-score rewrites):
        #     prefix / range / set / constant / wildcard (+leading via the
        #     reversed dictionary) / fuzzy / regexp (+non-prefix pattern,
        #     the automaton-bounded expansion path) ---
        "topk_multiterm_suite": _suite(
            {
                "prefix": lambda sf: fulltext.topk(sf, "prefix", [_PREFIX], _K),
                "term_range": lambda sf: fulltext.topk(
                    sf, "term_range", _RANGE, _K
                ),
                "term_set": lambda sf: fulltext.topk(
                    sf, "term_set", _SET_TERMS, _K
                ),
                "constant": lambda sf: fulltext.topk(sf, "constant", [_TERM], _K),
                "wildcard": lambda sf: fulltext.topk(
                    sf, "wildcard", [_WILDCARD], _K
                ),
                "wildcard_leading": lambda sf: fulltext.topk(
                    sf, "wildcard", [_WILDCARD_LEAD], _K
                ),
                "fuzzy": lambda sf: fulltext.topk(
                    sf,
                    "fuzzy",
                    [_FUZZY_TERM, str(_FUZZY_EDITS), str(_FUZZY_PREFIX)],
                    _K,
                ),
                "regexp": lambda sf: fulltext.topk(sf, "regexp", [_REGEXP], _K),
                "regexp_nonprefix": lambda sf: fulltext.topk(
                    sf, "regexp", [_REGEXP_NOPREFIX], _K
                ),
            }
        ),
        "topk_misc_suite": _suite(
            {
                "dismax": lambda sf: fulltext.topk(
                    sf, "dismax", _DISMAX_TERMS, _K
                ),
                "range_filter": lambda sf: fulltext.topk(
                    sf,
                    "range_filter",
                    [_FILTER_TERM, str(_FILTER_LO), str(_FILTER_HI)],
                    _K,
                ),
                "paged": lambda sf: fulltext.topk_paged(
                    sf, "term", [_TERM], page=2
                ),
            }
        ),
        # --- multi-field (keyword fields), doc-values, deletes ---
        "topk_field_suite": _suite(
            {
                "field_term": lambda sf: fulltext.topk(
                    sf, "field_term", [_KW_FIELD, _KW_VALUE], _K
                ),
                "field_mixed": lambda sf: fulltext.topk(
                    sf, "field_mixed", [_MIX_TERM, _MIX_FIELD, _MIX_VALUE], _K
                ),
            }
        ),
        "term_vectors": lambda sf: fulltext.term_vectors(sf, modulus=97),
        "dv_histogram": lambda sf: fulltext.dv_histogram(sf, *_HIST),
        # --- doc-values queries: 1-D range / point-set / 2-D box ---
        "topk_numeric_suite": _suite(
            {
                "range": lambda sf: fulltext.topk(
                    sf,
                    "numeric_range",
                    [_NR_TERM, _NR_FIELD, str(_NR_LO), str(_NR_HI)],
                    _K,
                ),
                "set": lambda sf: fulltext.topk(
                    sf, "numeric_set", [_NS_TERM, _NS_FIELD, *map(str, _NS_VALUES)], _K
                ),
                "box": lambda sf: fulltext.topk(
                    sf, "numeric_box", [str(c) for c in _BOX], _K
                ),
            }
        ),
        # --- RangeField relations (per-doc interval vs query interval) ---
        "topk_range_relations": _suite(
            {
                rel: (
                    lambda sf, rel=rel, q=q: fulltext.topk(
                        sf,
                        "range_field",
                        [_RF_TERM, _RF_FIELD, str(q[0]), str(q[1]), rel],
                        _K,
                    )
                )
                for rel, q in (
                    ("intersects", _RF_Q),
                    ("within", _RF_WITHIN),
                    ("contains", _RF_Q),
                    ("crosses", _RF_Q),
                )
            }
        ),
        "topk_mutation_suite": _suite(
            {
                "after_dv_update": lambda sf: fulltext.topk_after_dv_update(
                    sf, _DVU_TERM, _NR_FIELD, _NR_LO, _NR_HI, _K,
                    upd_field=_DVU_FIELD, upd_value=_DVU_VALUE,
                    new_value=_DVU_NEW,
                ),
                "after_delete": lambda sf: fulltext.topk_after_delete(
                    sf, "term", [_DEL_TERM], _K,
                    del_field=_DEL_FIELD, del_value=_DEL_VALUE,
                ),
                "after_expunge": lambda sf: fulltext.topk_after_expunge(
                    sf, "term", [_EXP_TERM], _K,
                    del_field=_EXP_FIELD, del_value=_EXP_VALUE,
                ),
                "after_incremental": lambda sf: fulltext.topk_after_incremental(
                    sf, "term", [_INC_TERM], _K,
                    app_field=_INC_FIELD, app_value=_INC_VALUE,
                ),
            }
        ),
        # --- dedup family ---
        "exact_dedup_suite": _suite(
            {
                "text": lambda sf: dedup.exact_dedup(sf),
                "hashed": lambda sf: dedup.exact_dedup_hashed(sf),
            }
        ),
        "minhash_pairs": lambda sf: dedup.minhash_lsh_pairs(sf, threshold=0.5),
        "simhash_suite": _suite(
            {
                # one exact schema across qids (-1 sentinel padding, no
                # nulls) so the suite is SQL-hash-checkable
                "table": lambda sf: _pad_int64(
                    dedup.simhash_table(sf), _SIMSUITE_COLS
                ),
                "pairs": lambda sf: _pad_int64(
                    dedup.simhash_hamming_pairs(sf), _SIMSUITE_COLS
                ),
            }
        ),
        "jaccard_pairs": lambda sf: dedup.jaccard_ngram_pairs(sf, threshold=0.5),
        "dup_spans_suite": _suite(
            {
                "all": lambda sf: dedup.dup_spans(sf, min_tokens=8),
                "keep_first": lambda sf: dedup.dup_spans(
                    sf, min_tokens=8, keep_first=True
                ),
            }
        ),
        "dedup_cleaned_tokens": lambda sf: dedup.dedup_cleaned_tokens(
            sf, min_tokens=8
        ),
        "embedding_near_dup": lambda sf: dedup.embedding_near_dup(sf, threshold=0.4),
        # --- end-to-end curation (filters -> dedup -> survivors; the
        #     near_dup variant adds cluster-loser removal) ---
        "curated_ids_suite": _suite(
            {"basic": _curated_ids, "near_dup": _curated_near_dup}
        ),
        # --- text analysis ---
        "token_counts_suite": _suite(
            {
                "ws": lambda sf: textstats.token_counts(sf),
                "bpe": _bpe_renamed,
            }
        ),
    }


def oracle_sql() -> dict[str, str]:
    from lucene_go_ray.pipelines.textstats import BPE_ISH_PATTERN

    qual_stops = _STOPS
    # single source of truth: the oracle runs the IDENTICAL RE2 pattern
    # the Ray pipeline feeds pyarrow (both engines are RE2)
    bpe_pat_sql = BPE_ISH_PATTERN.replace("'", "''")
    return {
        "lm_perplexity": _lm_perplexity_sql(_LM_TRAIN_MOD),
        "near_dup_clusters": _near_dup_clusters_sql(),
        "decontaminate": _decontaminate_sql(_DECON_L, _DECON_MOD),
        "stratified_sample": _stratified_sample_sql(
            _SAMPLE_RATES, _SAMPLE_DEFAULT, _SAMPLE_SEED, _SAMPLE_MOD
        ),
        "pack_sequences": _pack_sequences_sql(_PACK_CAPACITY),
        "top_ngrams": f"""
WITH raw AS (
  SELECT list_transform(string_split_regex(text, '{_WS}'), x -> lower(x)) AS t
  FROM documents
),
g AS (
  SELECT array_to_string(t[i : i + {_TOPGRAM_N - 1}], ' ') AS gram
  FROM (SELECT t, unnest(range(1, len(t) - {_TOPGRAM_N} + 2)) AS i
        FROM raw WHERE len(t) >= {_TOPGRAM_N})
),
c AS (SELECT gram, count(*)::BIGINT AS cnt FROM g GROUP BY gram)
SELECT gram, cnt FROM c ORDER BY cnt DESC, gram LIMIT {_TOPGRAM_K}
""",
        "term_stats_suite": _suite_sql(
            {
                "text": f"""
WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq,
       count(*)::BIGINT AS total_term_freq
FROM toks GROUP BY term
""",
                "field": f"""
SELECT {_KW_FIELD}::VARCHAR AS term, count(*)::BIGINT AS doc_freq,
       count(*)::BIGINT AS total_term_freq
FROM documents WHERE {_KW_FIELD} IS NOT NULL GROUP BY 1
""",
            }
        ),
        "collection_stats": f"""
WITH {_TOKS}, {_NORMS},
postings AS (SELECT term, doc_id FROM toks GROUP BY term, doc_id)
SELECT (SELECT count(*) FROM documents)::BIGINT AS max_doc,
       (SELECT count(*) FROM norms)::BIGINT AS doc_count,
       (SELECT sum(norm) FROM norms)::BIGINT AS sum_total_term_freq,
       (SELECT count(*) FROM postings)::BIGINT AS sum_doc_freq
""",
        "norms_suite": _suite_sql(
            {
                "doc_norms": f"""
WITH {_TOKS}
SELECT doc_id, count(*)::BIGINT AS norm FROM toks GROUP BY doc_id
""",
                "sorted_topn": f"""
WITH {_TOKS}, {_NORMS}
SELECT doc_id, norm FROM norms ORDER BY norm DESC, doc_id LIMIT 20
""",
            }
        ),
        # payload values are the RAW (pre-lowercase) token's UTF-8 byte
        # length — strlen (byte length) of the un-lowered token recomputes them
        "payload_stats": f"""
SELECT doc_id,
       count(*)::BIGINT AS freq,
       sum(strlen(tok))::BIGINT AS sum_payload,
       min(strlen(tok))::BIGINT AS min_payload,
       max(strlen(tok))::BIGINT AS max_payload
FROM (SELECT doc_id, unnest(string_split_regex(text, '{_WS}')) AS tok
      FROM documents)
WHERE lower(tok) = '{_TERM}'
GROUP BY doc_id ORDER BY doc_id
""",
        "points_kd_box": f"""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
FROM lineitem
WHERE l_quantity >= {_KD_LO[0]} AND l_quantity <= {_KD_HI[0]}
  AND l_extendedprice >= {_KD_LO[1]} AND l_extendedprice <= {_KD_HI[1]}
  AND l_discount >= {_KD_LO[2]} AND l_discount <= {_KD_HI[2]}
""",
        "topk_span_suite": _suite_sql(
            {
                "ordered2": _topk_span_near_sql(
                    _SPAN_ORD2_TERMS, _SPAN_ORD2_SLOP, True, _K
                ),
                "ordered3": _topk_span_near_sql(
                    _SPAN_ORD3_TERMS, _SPAN_ORD3_SLOP, True, _K
                ),
                "unordered2": _topk_span_near_sql(
                    _SPAN_UNORD_TERMS, _SPAN_UNORD_SLOP, False, _K
                ),
                "unordered3": _topk_span_near_sql(
                    _SPAN_UNORD3_TERMS, _SPAN_UNORD3_SLOP, False, _K
                ),
                "first": _topk_span_first_sql(
                    _SPAN_FIRST_TERM, _SPAN_FIRST_END, _K
                ),
                "not": _topk_span_not_sql(*_SPAN_NOT, _K),
                "ordered_or": _topk_span_near_sql(
                    _SPAN_OR_TERMS, _SPAN_OR_SLOP, True, _K
                ),
                "unordered_or_overlap": _topk_span_near_sql(
                    _SPAN_OVL_TERMS, _SPAN_OVL_SLOP, False, _K
                ),
            }
        ),
        "topk_sort_field": _suite_sql(
            {
                "numeric": (
                    f"SELECT rank, doc_id, {_SF_FIELD}::VARCHAR AS sort_value "
                    f"FROM ({_topk_sort_field_sql(_SF_TERM, _SF_FIELD, _K)})"
                ),
                "string": (
                    f"SELECT rank, doc_id, {_SF_STR_FIELD}::VARCHAR AS sort_value "
                    f"FROM ({_topk_sort_field_sql(_SF_TERM, _SF_STR_FIELD, _K)})"
                ),
            }
        ),
        "multimodal_features": _multimodal_sql(16),
        "topk_core_suite": _suite_sql(
            {
                "term": _topk_term_sql(_TERM, _K),
                "and": _topk_bool_sql(_AND_TERMS, _K, "and"),
                "or": _topk_bool_sql(_OR_TERMS, _K, "or"),
                "not": _topk_bool_sql(_NOT_TERMS, _K, "not"),
                "msm": _topk_bool_sql(_MSM_TERMS, _K, "or", msm=2),
                "phrase": _topk_phrase_sql(_PHRASE, _K),
            }
        ),
        "topk_mlt": _topk_mlt_sql(_MLT_DOC, _MLT_TERMS, _K),
        "suggest_terms": f"""
WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq FROM toks
WHERE term LIKE '{_SUGGEST_PREFIX}%'
GROUP BY term ORDER BY doc_freq DESC, term LIMIT {_K}
""",
        "topk_multiterm_suite": _suite_sql(
            {
                "prefix": _constant_topk_sql(f"term LIKE '{_PREFIX}%'", _K),
                "term_range": _constant_topk_sql(
                    f"term >= '{_RANGE[0]}' AND term <= '{_RANGE[1]}'", _K
                ),
                "term_set": _constant_topk_sql(
                    "term IN (" + ", ".join(f"'{t}'" for t in _SET_TERMS) + ")",
                    _K,
                ),
                "constant": _constant_topk_sql(f"term = '{_TERM}'", _K),
                "wildcard": _constant_topk_sql(
                    f"term LIKE '{_WILDCARD.replace('*', '%').replace('?', '_')}'",
                    _K,
                ),
                "wildcard_leading": _constant_topk_sql(
                    f"term LIKE "
                    f"'{_WILDCARD_LEAD.replace('*', '%').replace('?', '_')}'",
                    _K,
                ),
                "fuzzy": _constant_topk_sql(
                    f"levenshtein(term, '{_FUZZY_TERM}') <= {_FUZZY_EDITS}"
                    f" AND substr(term, 1, {_FUZZY_PREFIX}) = "
                    f"substr('{_FUZZY_TERM}', 1, {_FUZZY_PREFIX})",
                    _K,
                ),
                "regexp": _constant_topk_sql(
                    f"regexp_full_match(term, '{_REGEXP}')", _K
                ),
                "regexp_nonprefix": _constant_topk_sql(
                    f"regexp_full_match(term, '{_REGEXP_NOPREFIX}')", _K
                ),
            }
        ),
        "topk_misc_suite": _suite_sql(
            {
                "dismax": _dismax_topk_sql(_DISMAX_TERMS, _K),
                "range_filter": _range_filter_topk_sql(
                    _FILTER_TERM, _FILTER_LO, _FILTER_HI, _K
                ),
                "paged": _paged_topk_sql(_TERM, 2, 10),
            }
        ),
        "term_vectors": f"""
WITH {_TOKS}
SELECT doc_id, term, count(*)::BIGINT AS freq
FROM toks WHERE doc_id % 97 = 0 GROUP BY doc_id, term
""",
        "dv_histogram": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{_HIST[0]}')
SELECT bucket, count(*)::BIGINT AS cnt FROM (
  SELECT least(greatest((d.{_HIST[1]} - {_HIST[2]}) * {_HIST[4]} // ({_HIST[3]} - {_HIST[2]}), 0), {_HIST[4]} - 1)::BIGINT AS bucket
  FROM documents d JOIN m ON m.doc_id = d.doc_id
  WHERE d.{_HIST[1]} IS NOT NULL
) GROUP BY bucket ORDER BY bucket
""",
        "topk_field_suite": _suite_sql(
            {
                "field_term": _field_term_topk_sql(_KW_FIELD, _KW_VALUE, _K),
                "field_mixed": _topk_term_filtered_sql(
                    _MIX_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"{_MIX_FIELD} = '{_MIX_VALUE}')",
                ),
            }
        ),
        "topk_numeric_suite": _suite_sql(
            {
                "range": _topk_term_filtered_sql(
                    _NR_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"{_NR_FIELD} BETWEEN {_NR_LO} AND {_NR_HI})",
                ),
                "set": _topk_term_filtered_sql(
                    _NS_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"{_NS_FIELD} IN (" + ", ".join(map(str, _NS_VALUES)) + "))",
                ),
                "box": _topk_term_filtered_sql(
                    _BOX[0],
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"{_BOX[1]} BETWEEN {_BOX[2]} AND {_BOX[3]} AND "
                    f"{_BOX[4]} BETWEEN {_BOX[5]} AND {_BOX[6]})",
                ),
            }
        ),
        "topk_range_relations": _suite_sql(
            {
                "intersects": _topk_term_filtered_sql(
                    _RF_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"least(doc_id, n_chars) <= {_RF_Q[1]} AND "
                    f"greatest(doc_id, n_chars) >= {_RF_Q[0]})",
                ),
                "within": _topk_term_filtered_sql(
                    _RF_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"least(doc_id, n_chars) >= {_RF_WITHIN[0]} AND "
                    f"greatest(doc_id, n_chars) <= {_RF_WITHIN[1]})",
                ),
                "contains": _topk_term_filtered_sql(
                    _RF_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"least(doc_id, n_chars) <= {_RF_Q[0]} AND "
                    f"greatest(doc_id, n_chars) >= {_RF_Q[1]})",
                ),
                "crosses": _topk_term_filtered_sql(
                    _RF_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"(least(doc_id, n_chars) <= {_RF_Q[1]} AND "
                    f" greatest(doc_id, n_chars) >= {_RF_Q[0]}) AND NOT "
                    f"(least(doc_id, n_chars) >= {_RF_Q[0]} AND "
                    f" greatest(doc_id, n_chars) <= {_RF_Q[1]}) AND NOT "
                    f"(least(doc_id, n_chars) <= {_RF_Q[0]} AND "
                    f" greatest(doc_id, n_chars) >= {_RF_Q[1]}))",
                ),
            }
        ),
        "count_suite": _suite_sql(
            {
                "term_doc_count": f"""
WITH {_TOKS}
SELECT count(DISTINCT doc_id)::BIGINT AS total_hits FROM toks
WHERE term = '{_TERM}'
""",
                "field_exists": f"""
SELECT count(*)::BIGINT AS total_hits FROM documents
WHERE {_FE_FIELD} IS NOT NULL
""",
                "funnel": _funnel_sql(_FUNNEL_STEPS, _FUNNEL_WITHIN),
            }
        ),
        # postings-side and dv-side facet paths count the same thing — one
        # oracle body per qid
        "facet_counts": _suite_sql(
            dict.fromkeys(
                ("postings", "dv"),
                f"""
WITH {_TOKS},
matches AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{_TERM}')
SELECT {_FACET_FIELD} AS value, count(*)::BIGINT AS cnt
FROM documents d JOIN matches m ON m.doc_id = d.doc_id
WHERE {_FACET_FIELD} IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, value LIMIT {_FACET_N}
""",
            )
        ),
        "topk_mutation_suite": _suite_sql(
            {
                "after_dv_update": _topk_term_filtered_sql(
                    _DVU_TERM,
                    _K,
                    f"tf.doc_id IN (SELECT doc_id FROM documents WHERE "
                    f"(CASE WHEN {_DVU_FIELD} = '{_DVU_VALUE}' THEN {_DVU_NEW} "
                    f"ELSE {_NR_FIELD} END) BETWEEN {_NR_LO} AND {_NR_HI})",
                ),
                "after_delete": _topk_term_filtered_sql(
                    _DEL_TERM,
                    _K,
                    f"tf.doc_id NOT IN (SELECT doc_id FROM documents "
                    f"WHERE {_DEL_FIELD} = '{_DEL_VALUE}')",
                ),
                # post-expunge: stats themselves exclude the deleted docs,
                # so the oracle drops them from the corpus BEFORE
                # tokenizing (vs after_delete, which only filters hits)
                "after_expunge": _topk_term_sql(_EXP_TERM, _K).replace(
                    "FROM documents)",
                    f"FROM documents WHERE {_EXP_FIELD} IS DISTINCT FROM "
                    f"'{_EXP_VALUE}')",
                ),
                # grown corpus: base docs + the re-appended subset with
                # docIDs continuing after max_doc (add_documents'
                # monotone assignment, replayed in SQL)
                "after_incremental": _topk_term_sql(_INC_TERM, _K).replace(
                    "FROM documents)", _INC_CORPUS
                ),
            }
        ),
        "group_quantiles": "\nUNION ALL\n".join(
            f"SELECT lang, {q} AS q, quantile_disc(n_chars, {q})::BIGINT AS value "
            f"FROM documents WHERE lang IS NOT NULL GROUP BY lang"
            for q in _GQ_QS
        ),
        "jaccard_pairs": _JACCARD_SQL,
        "minhash_pairs": _minhash_pairs_sql(),
        "simhash_suite": _suite_sql(
            {
                "table": (
                    "SELECT doc_id, simhash, -1::BIGINT AS a, "
                    "-1::BIGINT AS b, -1::BIGINT AS distance FROM ("
                    + _simhash_table_sql()
                    + ")"
                ),
                "pairs": (
                    "SELECT -1::BIGINT AS doc_id, -1::BIGINT AS simhash, "
                    "a, b, distance FROM ("
                    + _simhash_pairs_sql()
                    + ")"
                ),
            }
        ),
        "embedding_near_dup": _EMB_NEAR_DUP_SQL,
        "window_counts": """
SELECT user_id,
       CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS window_start,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
        "sessions": """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
m AS (
  SELECT user_id, us,
         CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM m
)
SELECT user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events, min(us)::BIGINT AS session_start_us
FROM s GROUP BY 1, 2
""",
        "exact_dedup_suite": _suite_sql(
            {
                "text": """
SELECT min(doc_id)::BIGINT AS doc_id FROM documents GROUP BY text
""",
                "hashed": """
SELECT min(doc_id)::BIGINT AS doc_id FROM documents GROUP BY text
""",
            }
        ),
        # exact substring dedup at the gram-STRING level (the Ray side
        # groups on a 64-bit window hash; a collision would fail this)
        "dup_spans_suite": _suite_sql({"all": f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '{_WS}'), x -> lower(x)) AS t
  FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(t[i : i + 7], chr(31)) AS gram
  FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
dup AS (SELECT gram FROM wins GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM wins WHERE gram IN (SELECT gram FROM dup)),
isl AS (SELECT doc_id, pos,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM hits)
SELECT doc_id, min(pos)::BIGINT AS span_start, (max(pos) + 7)::BIGINT AS span_end
FROM isl GROUP BY doc_id, grp
""",
        # keep-first removal policy: the lowest doc_id keeps each gram
        "keep_first": f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '{_WS}'), x -> lower(x)) AS t
  FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(t[i : i + 7], chr(31)) AS gram
  FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
dup AS (SELECT gram, min(doc_id) AS keeper FROM wins GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup d USING (gram)
         WHERE w.doc_id > d.keeper),
isl AS (SELECT doc_id, pos,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM hits)
SELECT doc_id, min(pos)::BIGINT AS span_start, (max(pos) + 7)::BIGINT AS span_end
FROM isl GROUP BY doc_id, grp
"""}),
        # cleaned token budget: raw count minus the UNION of removable
        # window coverage (count DISTINCT covered positions)
        "dedup_cleaned_tokens": f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '{_WS}'), x -> lower(x)) AS t
  FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(t[i : i + 7], chr(31)) AS gram
  FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
dup AS (SELECT gram, min(doc_id) AS keeper FROM wins GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup d USING (gram)
         WHERE w.doc_id > d.keeper),
cov AS (SELECT doc_id, count(DISTINCT p)::BIGINT AS covered
        FROM hits, unnest(range(pos, pos + 8)) AS u(p) GROUP BY doc_id)
SELECT t.doc_id,
       (len(t.t) - coalesce(c.covered, 0))::BIGINT AS n_tokens_clean
FROM toks t LEFT JOIN cov c USING (doc_id)
""",
        # the SAME RE2 pattern the Ray pipeline feeds pyarrow
        # count_substring_regex (both engines are RE2, so the oracle is
        # exact, not approximate)
        "token_counts_suite": _suite_sql(
            {
                "ws": f"""
SELECT doc_id, len(string_split_regex(text, '{_WS}'))::BIGINT AS n_tokens
FROM documents
""",
                "bpe": f"""
SELECT doc_id, len(regexp_extract_all(text,
  '{bpe_pat_sql}'
))::BIGINT AS n_tokens
FROM documents
""",
            }
        ),
        "curated_ids_suite": _suite_sql(
            {
                "basic": _CURATED_SQL,
                "near_dup": f"""
WITH RECURSIVE pairs AS (SELECT a, b FROM ({_JACCARD_SQL})),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
nd_losers AS (
  SELECT u AS doc_id FROM reach GROUP BY u HAVING least(u, min(v)) != u
)
SELECT doc_id FROM ({_CURATED_SQL})
WHERE doc_id NOT IN (SELECT doc_id FROM nd_losers)
""",
            }
        ),
        "text_quality": f"""
WITH raw AS (SELECT doc_id, length(text)::BIGINT AS n_chars,
                    string_split_regex(text, '{_WS}') AS toks FROM documents),
flat AS (SELECT doc_id, lower(unnest(toks)) AS term FROM raw),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
               count(DISTINCT term)::BIGINT AS n_unique_terms,
               sum(CASE WHEN term IN ({qual_stops}) THEN 1 ELSE 0 END)::DOUBLE AS n_stop
        FROM flat GROUP BY doc_id),
g2 AS (SELECT doc_id, lower(array_to_string(toks[i:i+1], ' ')) AS gram
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM raw)),
g3 AS (SELECT doc_id, lower(array_to_string(toks[i:i+2], ' ')) AS gram
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i FROM raw)),
g5 AS (SELECT doc_id, lower(array_to_string(toks[i:i+4], ' ')) AS gram
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-3)) AS i FROM raw)),
top2 AS (SELECT doc_id, max(c * gl)::BIGINT AS v FROM (
           SELECT doc_id, count(*) AS c, length(gram) AS gl
           FROM g2 GROUP BY doc_id, gram) GROUP BY doc_id),
top3 AS (SELECT doc_id, max(c * gl)::BIGINT AS v FROM (
           SELECT doc_id, count(*) AS c, length(gram) AS gl
           FROM g3 GROUP BY doc_id, gram) GROUP BY doc_id),
dup5 AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN c * gl ELSE 0 END)::BIGINT AS v
         FROM (SELECT doc_id, count(*) AS c, length(gram) AS gl
               FROM g5 GROUP BY doc_id, gram) GROUP BY doc_id)
SELECT r.doc_id, r.n_chars, a.n_tokens, a.n_unique_terms,
       round(a.n_stop / a.n_tokens, 6) AS stopword_ratio,
       coalesce(top2.v, 0)::BIGINT AS top2gram_chars,
       coalesce(top3.v, 0)::BIGINT AS top3gram_chars,
       coalesce(dup5.v, 0)::BIGINT AS dup5gram_chars
FROM raw r JOIN agg a USING (doc_id)
LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id)
LEFT JOIN dup5 USING (doc_id)
""",
        "ann_cosine_topk": f"""
WITH q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
           FROM embeddings WHERE vec_id = 0),
scored AS (SELECT e.vec_id,
                  list_cosine_similarity(list_transform(e.embedding, x -> x::DOUBLE), q.qv) AS sim
           FROM embeddings e, q)
SELECT rank, vec_id, sim FROM (
  SELECT row_number() OVER (ORDER BY round(sim, 6) DESC, vec_id) AS rank,
         vec_id, round(sim, 6) AS sim
  FROM scored)
WHERE rank <= {_K} ORDER BY rank
""",
        "ann_cosine_topk_batch": f"""
WITH q AS (SELECT vec_id AS query_id,
                  list_transform(embedding, x -> x::DOUBLE) AS qv
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (SELECT q.query_id, e.vec_id,
                  list_cosine_similarity(list_transform(e.embedding, x -> x::DOUBLE), q.qv) AS sim
           FROM embeddings e, q)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(sim, 6) DESC, vec_id) AS rank,
         vec_id, round(sim, 6) AS sim
  FROM scored)
WHERE rank <= {_K} ORDER BY query_id, rank
""",
        # language_id / fingerprints / ann_lsh_topk / ann_ivf_topk /
        # ann_ivfpq_topk: non-SQL-expressible (heuristic / trained-quantizer
        # pipelines) -> rows-only; recall oracles live in pytest
        # (test_lsh_index_recall_at_sf01, test_ivf_index_recall_at_sf01,
        # test_ivfpq_recall_at_sf01). minhash_pairs / simhash_suite moved
        # to full SQL replay (round 5): the fingerprints are deterministic
        # pure functions of the text, so the splitmix64/FNV machinery
        # reproduces them bit-exactly, banding included.
    }
