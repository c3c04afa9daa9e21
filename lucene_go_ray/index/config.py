"""Build/search configuration (the analogue of IndexWriterConfig +
LiveIndexWriterConfig knobs, /root/reference/core/index/indexwriter.go:1595-1611)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # --- schema (the FieldInfos registry analogue,
    # /root/reference/core/index/fieldinfos.go:33 + document/field.go:119-237;
    # field name == source column name, field number == registry order) ---
    text_column: str = "text"  # TextField: tokenized, DOCS_AND_FREQS_AND_POSITIONS
    key_column: str = "doc_id"  # stored key (url or doc_id) kept in the docmap
    # StringField-semantics columns (core/document/stringfield.go:20-41):
    # indexed untokenized — one verbatim term per doc, freq 1, position 0,
    # norm 1 — under the posting key (field, term). Null values index nothing.
    keyword_fields: tuple = ()
    # Numeric doc-values columns (int64-castable; timestamps → epoch micros)
    # stored per-doc in the docmap with per-segment min/max zone maps — the
    # value store behind NumericRangeQuery (the BKD PointRangeQuery analogue,
    # /root/reference/core/search/pointrangequery.go).
    docvalue_fields: tuple = ()
    # String/binary doc-values columns — the SORTED / SORTED_SET / BINARY
    # dv types of the reference reader (codecs/simpletext/
    # docvaluesreader.go:129,326): a string column is SORTED (sortable,
    # facetable), a list<string> column is SORTED_SET (facetable,
    # multi-valued), a binary column is BINARY (stored per-doc bytes).
    # Stored verbatim in the segment docmap as sdv_{name}; parquet's
    # dictionary encoding plays the per-segment ordinal table role, and
    # sort comparisons rank-encode per candidate block instead of
    # materializing global ordinals.
    string_docvalue_fields: tuple = ()
    # RangeField analogue (/root/reference/core/query/rangefieldquery.go +
    # {int,long,float,double}rangeslowrangequery.go): each doc stores an
    # INTERVAL [lo, hi] queried by relation (INTERSECTS / WITHIN / CONTAINS
    # / CROSSES). Entries are (name, col_a, col_b): at build time the
    # interval is lo = min(col_a, col_b), hi = max(col_a, col_b) — the
    # min<=max invariant the reference enforces in verifyAndEncodeInt64
    # (longrange.go:15-39) holds by construction — persisted as two
    # doc-values columns dv_{name}_lo / dv_{name}_hi with per-segment zone
    # maps, so every relation prunes segments before reading values.
    range_fields: tuple = ()
    # --- analysis ---
    stop_words: tuple = tuple(
        sorted(
            """a an and are as at be but by for if in into is it no not of on or such
            that the their then there these they this to was will with""".split()
        )
    )
    lowercase: bool = True
    # position gap between values of a multi-valued (list<string>) text
    # column (Analyzer.GetPositionIncrementGap, analyzer.go:123; reference
    # default 0). Set >0 so PhraseQuery can't match across value joins.
    position_increment_gap: int = 0
    # offset gap between values of a multi-valued field
    # (Analyzer.GetOffsetGap, analyzer.go:127-129; reference default 1) —
    # only observable when index_offsets=True on a list<string> column
    offset_gap: int = 1
    # --- scoring (reference defaults, similaritybm25.go:68-75) ---
    similarity: str = "bm25"  # search.scorer.SIMILARITIES registry key
    k1: float = 1.2
    b: float = 0.75
    # --- physical layout ---
    # Postings codec, resolved by NAME through the codec registry
    # (index/codec.py: register_codec/get_codec — the plug-in slot of the
    # reference's named-codec SPI, codecs/simpletext). Persisted in the
    # manifest so readers resolve the same format; unknown names fail
    # loudly at build/open instead of mis-decoding.
    codec_name: str = "for128"
    block_size: int = 128  # postings docs per FOR block
    index_positions: bool = True
    # optional per-occurrence byte-offset stream (highlighting parity,
    # fieldswriter.go:204-247 offsets lines). OFF by default: offsets are
    # the widest per-token stream and only highlighters read them. Stored
    # as a segment-local side table (offsets.parquet), never shuffled.
    index_offsets: bool = False
    # per-occurrence payload stream (the reference's hasPayload prox bit,
    # freqproxtermswriterperfield.go:124-218 + PayloadAttribute): a NAMED
    # vectorized function over the token arrays (index/payloads.py
    # registry; e.g. "token_bytes" = raw token UTF-8 byte length) whose
    # int32 values are stored per (term, ord) in a segment-local side
    # table (payloads.parquet), aligned 1:1 with occurrence order. None
    # (default) stores no payloads.
    payload_kind: str | None = None
    # per-document term vectors (FieldType.StoreTermVectors,
    # /root/reference/core/document/fieldtype.go:10-25 + the simpletext
    # term-vector writer): a doc-major mini inverted index per segment
    # (tvec.parquet: ord, field, term, freq, positions), row-group pruned
    # by ord on retrieval. OFF by default — it duplicates every posting.
    index_term_vectors: bool = False
    target_partition_rows: int = 25_000  # docs per build partition (segment)
    chunk_docs: int = 131_072  # max postings per merged-index row (term chunk)
    # --- merge-shuffle skew handling ---
    # terms whose global doc_freq exceeds this get salted: their per-partition
    # postings are merged in groups of `salt_group_partitions` partitions
    # instead of one all-partitions group (SURVEY §4 "skew").
    hot_term_doc_freq: int = 500_000
    salt_group_partitions: int = 8
    # term-hash buckets for the merge shuffle: each reduce task processes one
    # bucket of (term, salt) groups in a single vectorized pass. Sized so a
    # bucket's postings fit a worker's heap (~cluster cores x 2 at scale).
    merge_buckets: int = 32
    # --- tiered merge policy (reference contract mergepolicy.go:134-334) ---
    # add_documents folds new segments incrementally into the existing
    # bucket files until cumulative growth since the last FULL merge
    # exceeds this fraction of the full-merge doc count; past it, a full
    # re-shuffle re-tiers the index (rebalances buckets + re-estimates
    # hot terms).
    tiered_growth_ratio: float = 1.0
    # --- search ---
    total_hits_threshold: int = 1000  # indexsearcher.go:14

    def stop_set(self) -> frozenset:
        return frozenset(self.stop_words)

    @classmethod
    def from_dict(cls, cfgd: dict) -> "IndexConfig":
        """Rebuild a config from a manifest/actor dict, normalizing the
        sequence fields back to (nested) tuples so frozen-dataclass
        hashing/formatting is stable across the JSON round trip."""
        d = dict(cfgd)
        for k in ("stop_words", "keyword_fields", "docvalue_fields",
                  "string_docvalue_fields"):
            d[k] = tuple(d.get(k) or ())
        d["range_fields"] = tuple(
            tuple(e) for e in (d.get("range_fields") or ())
        )
        return cls(**d)
