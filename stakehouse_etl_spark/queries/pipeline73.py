"""Data-pipeline queries, wave 73: maximal duplicated-span detection.

The substring-granular dedup stage of an LLM training-data pipeline
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better"): instead of doc-level (MinHash tiers) or fixed-chunk
(``corpus_passage_dedup``) decisions, find the MAXIMAL token spans
that are duplicated across documents, inventory them per document,
and scrub all but the first-claimant occurrence.

The exact suffix-array construction of the paper is replaced by a
k-token-gram anchor equivalent that Spark can run as three linear
shuffles: any duplicated span of length >= k is covered by duplicated
k-grams at every offset inside it, so merging adjacent duplicated
k-gram positions (classic islands pass, per-document window)
reconstructs exactly the maximal duplicated regions at k-token
resolution — no pairwise doc join, no suffix array.

Three queries: the per-doc span inventory, the corpus-wide keep-first
scrub, and the incremental form (a new batch scrubbed against the
stored corpus gram index — the shape a steady-state ingest loop
actually runs).

Scale shape (100 TB): positional grams are one explode (k*n work per
doc, expression-level); the gram frequency table is one hash shuffle
on the gram fingerprint (high cardinality, even); the join back is a
second shuffle reusing that key; the islands window partitions by
doc_id — row-parallel, never a global window. Reference anchor for
the dedup-tier contract: operators/dedup.py:373 (tier ladder notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.storagelevel import StorageLevel

from stakehouse_etl_spark.caches import persist_tracked
from stakehouse_etl_spark.io.sources import load_table
from stakehouse_etl_spark.operators.text import fan_out, tokens
from stakehouse_etl_spark.queries.registry import register

# Span resolution: a duplicated region is reported iff it spans at
# least SPAN_K whitespace tokens (the paper uses 50 BPE tokens at web
# scale; 5 keeps sf0.01 spans non-degenerate on ~60-token synthetic
# docs while exercising the identical plan).
SPAN_K = 5

_TOKS_CTE = """
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
)
"""

# Positional k-grams: pos is 0-based; DuckDB list slicing is 1-based
# inclusive, so gram at pos i covers toks[i+1 .. i+K].


def _grams_cte_sql(k: int, name: str = "g") -> str:
    """The positional-gram CTE at an arbitrary resolution ``k`` (the
    recall eval compares two k's on one corpus; everything else uses
    the SPAN_K default via the module constant below)."""
    return f"""
{name} AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(toks[u.i + 1 : u.i + {k}], ' ')) AS gram
  FROM t, LATERAL (
    SELECT unnest(range(0, greatest(len(toks) - {k} + 1, 0))) AS i
  ) u
)
"""


_GRAMS_CTE = _grams_cte_sql(SPAN_K)

# Islands pass over duplicated gram positions: intervals [pos, pos+K-1]
# sorted by pos merge iff the next start is within K of the previous
# (fixed-length intervals => lag alone is exact; no running-max
# needed). sum() OVER defaults to UNBOUNDED PRECEDING..CURRENT ROW in
# both engines, and pos is unique per doc so RANGE == ROWS.
_ISLANDS_SQL = f"""
o2 AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS ppos
  FROM occ
),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN ppos IS NOT NULL AND pos > ppos + {SPAN_K}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM o2
),
sp AS (
  SELECT doc_id, island,
         min(pos) AS s, max(pos) + {SPAN_K} - 1 AS e
  FROM isl GROUP BY 1, 2
)
"""


def _positional_grams(
    docs: DataFrame, k: int = SPAN_K
) -> tuple[DataFrame, DataFrame]:
    """(per-doc token frame, exploded (doc_id, pos, gram) frame).

    The gram is an md5 fingerprint of the ``k``-token window starting
    at 0-based ``pos`` — reproduced verbatim in the oracle CTE above.
    """
    t = fan_out(docs).select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda x: x != "").alias("toks"),
    )
    n = F.size("toks")
    # sequence(0, -1) would generate a DESCENDING range for docs
    # shorter than K tokens — guard to an empty array instead.
    # Shifted-slice construction (r10), NOT slice-inside-transform:
    # `transform(sequence(0, n-k), i -> slice(toks, i+1, k))` copies k
    # elements from the FULL array per window through an interpreted
    # lambda — O(n·k) copies plus per-element overhead that measured
    # O(n²)-shaped on long documents (one 5000-token doc cost 3.5× the
    # same gram count spread over 50 short docs; the zipf lognormal
    # length tail turned that into the dominant ladder term). Zipping
    # k shifted slices builds each window by position — the same fix
    # as operators/text.shingles (round-6 sf10 fuzz).
    n_out = n - (k - 1)
    zipped = F.arrays_zip(
        *[
            F.slice(F.col("toks"), j + 1, n_out).alias(f"w{j}")
            for j in range(k)
        ]
    )
    gram_structs = F.when(
        n >= k,
        F.transform(
            zipped,
            lambda x, i: F.struct(
                i.cast("long").alias("pos"),
                F.md5(
                    F.concat_ws(
                        " ", *[x[f"w{j}"] for j in range(k)]
                    )
                ).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,gram:string>>"))
    g = t.select("doc_id", F.explode(gram_structs).alias("g")).select(
        "doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram")
    )
    return t, g


def _merge_islands(occ: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Merge duplicated gram positions into maximal spans [s, e].

    Fixed-length intervals sorted by start merge iff the next start is
    <= previous start + K, so a lag-based break flag is exact (the
    generic islands running-max is unnecessary). The window partitions
    by doc_id — per-document, row-parallel at any scale.
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") > F.lag("pos").over(w) + k, 1).otherwise(0)
    return (
        occ.withColumn("island", F.sum(brk).over(w))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + k - 1).alias("e"),
        )
    )


@register(
    "dedup_span_inventory",
    tags=("dedup", "text", "spans"),
    bench=True,
    oracle=f"""
WITH {_TOKS_CTE}, {_GRAMS_CTE},
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
occ AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
{_ISLANDS_SQL},
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
         CAST(max(e - s + 1) AS BIGINT) AS max_span_len
  FROM sp GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(a.max_span_len, 0) AS BIGINT) AS max_span_len,
       CASE WHEN len(t.toks) > 0
            THEN CAST(coalesce(a.dup_tokens, 0) AS DOUBLE) / len(t.toks)
            ELSE CAST(0 AS DOUBLE) END AS dup_frac
FROM t LEFT JOIN agg a USING (doc_id)
""",
)
def dedup_span_inventory_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document inventory of MAXIMAL cross-document duplicated
    token spans at SPAN_K-gram resolution: how many distinct
    duplicated regions, how many tokens they cover, and the longest.

    A gram is duplicated iff it occurs in >= 2 DISTINCT documents
    (within-doc repetition is repetition, not duplication — that is
    ``text_repetition_metrics``'s lane). Adjacent/overlapping
    duplicated gram positions merge into maximal spans, so a 40-token
    boilerplate block shared by two docs reports as ONE span of ~40
    tokens, not 36 overlapping grams — the signal doc-level and
    fixed-chunk dedup both miss.
    """
    docs = load_table(spark, sf_dir, "documents")
    t, g = _positional_grams(docs)
    # t feeds both the gram pipeline and the final n_tokens join —
    # persist it or the corpus re-scans and re-tokenizes for the
    # closing join (review r5; the scrub query persists the same way).
    # DISK_ONLY (r9): t carries full token arrays and g the exploded
    # positional-gram rows — both corpus-scale. Memory-first blocks of
    # that size squeeze the unified pool at sf30 (the execution side
    # then spill-churns every gram shuffle; measured wall ratio 4.73
    # vs the 3.0x data step before the change). One row-linear disk
    # re-read per consumer is the bounded alternative.
    t = persist_tracked(t, level=StorageLevel.DISK_ONLY)
    g = persist_tracked(g, level=StorageLevel.DISK_ONLY)
    dup = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    # MERGE pin (r8): dup/firsts-style gram tables are GRAM-scale
    # (≈ one row per distinct gram — token-scale divided by the dup
    # factor) yet compress far under AQE's broadcast threshold, and
    # the driver OOM'd building the broadcast at sf30
    # (corpus_span_scrub — "Not enough memory to build and broadcast").
    # Same spilling-arm rule as the dedup verifies (PLANS.md Round-8).
    spans = _merge_islands(
        g.join(dup.hint("MERGE"), "gram").select("doc_id", "pos")
    )
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
        F.max(F.col("e") - F.col("s") + 1).cast("long").alias("max_span_len"),
    )
    n_tokens = F.size("toks").cast("long")
    return (
        t.select("doc_id", n_tokens.alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.coalesce(F.col("max_span_len"), F.lit(0))
            .cast("long")
            .alias("max_span_len"),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def _scrub_tail(t: DataFrame, occ: DataFrame) -> DataFrame:
    """Shared scrub tail: duplicated gram positions ``occ`` → merged
    spans → anti-join of token positions against the exploded covered
    ranges → order-explicit reassembly + fingerprint, one row per doc
    of ``t`` (docs with nothing scrubbed keep a full-stream
    fingerprint via the left join's NULL → handled by callers).
    """
    # Merged spans are disjoint per doc, so the exploded positions are
    # already distinct — no dedup needed before the anti-join.
    # Disambiguated join columns: cov shares lineage with tok through
    # `t`, so equi-keys must be renamed, not referenced positionally.
    # MERGE pin: cov is ROW-SCALE (one row per covered token), but
    # AQE sizes this join from the pre-explode shuffle stats (one row
    # per merged island) and auto-broadcasts — the explode multiplies
    # rows AFTER the stats point, and the broadcast build OOMs the
    # driver at sf10 (measured r5). SHUFFLE_HASH fails the same way
    # per-task (hash builds don't spill); sort-merge is the only arm
    # of the join ladder that spills, i.e. survives any scale.
    cov = _merge_islands(occ).select(
        F.col("doc_id").alias("c_doc"),
        F.explode(F.sequence(F.col("s"), F.col("e"))).alias("p"),
    ).hint("MERGE")
    tok = t.select(
        "doc_id", F.posexplode("toks").alias("tpos", "tok")
    ).select("doc_id", F.col("tpos").cast("long").alias("tpos"), "tok")
    kept = tok.join(
        cov,
        (tok["doc_id"] == cov["c_doc"]) & (tok["tpos"] == cov["p"]),
        "left_anti",
    )
    reb = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("tpos", "tok"))
                    ),
                    lambda st: st["tok"],
                ),
                " ",
            )
        ).alias("cleaned_fp"),
    )
    n_tokens = F.size("toks").cast("long")
    return (
        t.select("doc_id", n_tokens.alias("n_tokens"))
        .join(reb, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (
                F.col("n_tokens")
                - F.coalesce(F.col("n_kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_scrubbed"),
            "cleaned_fp",
        )
    )


@register(
    "corpus_span_scrub",
    tags=("corpus", "dedup", "spans"),
    oracle=f"""
WITH {_TOKS_CTE}, {_GRAMS_CTE},
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
occ AS (
  SELECT doc_id, pos FROM g JOIN firsts USING (gram)
  WHERE first_doc < doc_id
),
{_ISLANDS_SQL},
cov AS (
  SELECT sp.doc_id, CAST(u.p AS BIGINT) AS p
  FROM sp, LATERAL (SELECT unnest(range(s, e + 1)) AS p) u
),
tok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS tpos, toks[u.i + 1] AS tok
  FROM t, LATERAL (SELECT unnest(range(0, len(toks))) AS i) u
),
kept AS (
  SELECT k.doc_id, k.tpos, k.tok
  FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.tpos = c.p
  WHERE c.p IS NULL
),
reb AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY tpos)) AS cleaned_fp
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(t.toks) - coalesce(r.n_kept, 0) AS BIGINT) AS n_scrubbed,
       r.cleaned_fp AS cleaned_fp
FROM t LEFT JOIN reb r USING (doc_id)
""",
)
def corpus_span_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first span scrub: every maximal duplicated span is removed
    from all documents EXCEPT the gram's first claimant (min doc_id —
    ingestion order), and the surviving text is fingerprinted.

    This is the paper's dedup policy (keep one occurrence of each
    duplicated substring, drop the rest) expressed corpus-wide in four
    linear shuffles: gram -> first claimant, join-back filtered to
    later claimants, per-doc islands merge, and an anti-join of token
    positions against the exploded covered ranges. Reassembly is
    order-explicit (sorted by token position), never collect arrival
    order. Docs that survive intact keep ``n_scrubbed = 0`` and a
    fingerprint of their full normalized token stream.
    """
    docs = load_table(spark, sf_dir, "documents")
    t, g = _positional_grams(docs)
    # DISK_ONLY (r9): same rationale as dedup_span_inventory above —
    # corpus-scale token/gram frames must not occupy the memory pool.
    t = persist_tracked(t, level=StorageLevel.DISK_ONLY)
    g = persist_tracked(g, level=StorageLevel.DISK_ONLY)
    firsts = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    # MERGE pin (r8): firsts is gram-scale; AQE auto-broadcast it at
    # sf30 from its compressed stats and the driver OOM'd building
    # the table. Sort-merge spills at any scale.
    occ = (
        g.join(firsts.hint("MERGE"), "gram")
        .filter(F.col("first_doc") < F.col("doc_id"))
        .select("doc_id", "pos")
    )
    return _scrub_tail(t, occ)


@register(
    "dedup_span_incremental",
    tags=("dedup", "spans", "incremental"),
    oracle=f"""
WITH {_TOKS_CTE}, {_GRAMS_CTE},
ci AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
fb AS (
  SELECT gram, min(doc_id) AS first_b
  FROM g WHERE doc_id % 2 = 1 GROUP BY gram
),
occ AS (
  SELECT g.doc_id, g.pos
  FROM g
  LEFT JOIN ci ON g.gram = ci.gram
  JOIN fb ON g.gram = fb.gram
  WHERE g.doc_id % 2 = 1
    AND (ci.gram IS NOT NULL OR fb.first_b < g.doc_id)
),
{_ISLANDS_SQL},
cov AS (
  SELECT sp.doc_id, CAST(u.p AS BIGINT) AS p
  FROM sp, LATERAL (SELECT unnest(range(s, e + 1)) AS p) u
),
tok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS tpos, toks[u.i + 1] AS tok
  FROM t, LATERAL (SELECT unnest(range(0, len(toks))) AS i) u
  WHERE doc_id % 2 = 1
),
kept AS (
  SELECT k.doc_id, k.tpos, k.tok
  FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.tpos = c.p
  WHERE c.p IS NULL
),
reb AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY tpos)) AS cleaned_fp
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(t.toks) - coalesce(r.n_kept, 0) AS BIGINT) AS n_scrubbed,
       r.cleaned_fp AS cleaned_fp
FROM t LEFT JOIN reb r USING (doc_id)
WHERE t.doc_id % 2 = 1
""",
)
def dedup_span_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental span scrub — the production shape of
    ``corpus_span_scrub``: a NEW batch (odd doc_ids) is scrubbed
    against the already-ingested corpus (even doc_ids) without ever
    re-scrubbing the corpus. A batch gram position is duplicated iff
    its gram exists anywhere in the corpus (the corpus claimant always
    precedes the batch — ingestion order), or an earlier batch doc
    first-claimed it within this batch. Corpus docs are never touched
    or re-emitted.

    Scale shape: at 100 TB the corpus gram set is a PRECOMPUTED index
    (exactly the band-index pattern of ``incremental_minhash_dedup``
    — operators/dedup.py:616): maintaining it is one distinct-merge
    per ingested batch, and this query's per-batch cost is then
    batch-sized, never corpus×corpus. Here the index is derived
    inline from the even half so the whole plan is reproducible
    against one table; every shuffle (index probe, within-batch
    firsts, islands window, position anti-join) is keyed on the gram
    fingerprint or doc_id — linear, no pairwise doc join.
    """
    docs = load_table(spark, sf_dir, "documents")
    return incremental_span_scrub(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


def incremental_span_scrub(corpus: DataFrame, batch: DataFrame) -> DataFrame:
    """Scrub the batch's cross-duplicated spans against (a) the
    corpus gram set and (b) earlier claimants within the batch.
    Corpus rows are never re-emitted. See ``dedup_span_incremental``.
    """
    _, gc = _positional_grams(corpus)
    return span_scrub_against_index(gc.select("gram"), batch)


def span_scrub_against_index(
    gram_index: DataFrame, batch: DataFrame
) -> DataFrame:
    """The stored-index form of the incremental scrub: ``gram_index``
    is the corpus gram set maintained OUTSIDE this call (one
    distinct-merge per ingested batch — the steady-state loop
    ``stream_span_scrub`` runs), so per-batch cost never touches
    corpus rows at all. The index is defensively de-duplicated here:
    a duplicate gram row would FAN OUT the probe join and double
    batch positions.
    """
    tb, gb = _positional_grams(batch)
    tb = persist_tracked(tb)
    gb = persist_tracked(gb)
    fb = gb.groupBy("gram").agg(F.min("doc_id").alias("first_b"))
    # MERGE pins (r8): the stored gram index (hundreds of MB parquet
    # at sf10, growing with the corpus) and the batch firsts table are
    # both gram-scale — the r7 fuzz OBSERVED SortMergeJoin here; the
    # pins make that load-bearing property a contract rather than an
    # AQE mood (the sf30 broadcast OOM in corpus_span_scrub is this
    # exact class one query over).
    #
    # r9 (20-batch fuzz follow-up): the old probe DISTINCT-shuffled
    # the whole index every batch (a second O(state) shuffle per
    # batch on top of the join's own) purely to defend against
    # duplicate gram rows fanning out a left join. A LEFT SEMI join
    # cannot fan out regardless of right-side duplicates, so the
    # "claimed by corpus OR claimed by an earlier doc in batch"
    # predicate is expressed as a UNION of the two claim sources —
    # duplicated (doc_id, pos) rows are exactly what _scrub_tail's
    # island merge is specified to absorb. One state-sized shuffle
    # per batch remains (the semi join itself): inherent to a
    # join-probe against global keep-first history; the point-lookup
    # alternative is the RocksDB state-store arm.
    occ_corpus = gb.join(
        gram_index.select("gram").hint("MERGE"), "gram", "left_semi"
    ).select("doc_id", "pos")
    occ_batch = (
        gb.join(fb.hint("MERGE"), "gram")
        .filter(F.col("first_b") < F.col("doc_id"))
        .select("doc_id", "pos")
    )
    return _scrub_tail(tb, occ_corpus.unionByName(occ_batch))
