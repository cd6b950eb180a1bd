"""Aggregated query catalog.

Importing this module registers every query family into ``QUERIES``.
``query_map`` / ``oracle_map`` are the shapes ``__spark_entry__.py``
exposes to the driver.

Imports FAIL LOUD: a syntax/import error in any query module must
surface as a hard failure of the whole catalog, not silently shrink
it (the driver would then just see fewer queries). The only tolerated
condition is a missing OPTIONAL third-party dependency, which no
query module has today.
"""

from __future__ import annotations

import importlib
import sys

from stakehouse_etl_spark.queries.registry import QUERIES, QueryDef

# Registration side effects — order defines catalog listing order
# (after the driver-priority prefix below).
_QUERY_MODULES = [
    "core",        # §2 operator kernels: the W/J/A/O/U/F families
    "datapipe",    # dedup / similarity / text analysis
    "streaming",   # structured streaming + incremental
    "extra",       # coverage-completing + TPC-H bench shapes
    "lifecycle",   # sinks, serving ratios, catch-up, backfill, connectors
    "tpch2",       # TPC-H Q2/Q9/Q11/Q12/Q15/Q20/Q21
    "analytics",   # sessionize / gap-fill / tfidf / cube / components
    "corpus",      # repetition / PII / corpus-clean pipeline
    "pipeline2",   # packing / sampling / contamination / ngram LM
    "analytics2",  # funnel / cohort / SCD2 / range join / mixing
    "analytics3",  # pagerank / range-frame rolling / group OLS
    "layout",      # z-order / partition pruning / vocab coverage
    "approx2",     # heavy-hitters contract / equi-depth histogram
    "pipeline3",   # prefix-filter join / containment / CDC / anomaly
    "pipeline4",   # DQ audit / rolling distinct / PMI / int8 quantize
    "pipeline5",   # knn precision@10 / langid confusion / grouping sets
    "pipeline6",   # bloom prefilter join / schema evolution / stream CDC
    "pipeline7",   # intersect-all / OHLC resample / inc agg merge
    "pipeline8",   # SCD2 point-in-time join / n-gram novelty
    "pipeline9",   # small-file compaction / PQ codebook
    "pipeline10",  # Welch t / triangle count / percent-of-total
    "pipeline11",  # count-min sketch / freshness / calibration
    "pipeline12",  # drill-across / chi2 drift / write-audit-publish
    "pipeline13",  # LSH eval / exact AUC / gopher rules
    "pipeline14",  # availableNow restart / decimal sums / null-safe join
    "pipeline15",  # weighted averages / month-over-month growth
    "pipeline16",  # skew-resistant cumsum / partition-prune bench
    "pipeline17",  # passage dedup / canonical docs / logit inference / mm hamming
    "pipeline18",  # portable-SQL surface: one SQL text, two engines
    "pipeline19",  # CUSUM change-point detection, batch + streaming twins
    "pipeline20",  # semdedup / BM25 / pivot / sketch-merge / neg-sampling / EWMA
    "pipeline21",  # feature eng / eval plumbing / table reconciliation
    "pipeline22",  # behavioral analytics / bounded-state streaming dedup
    "pipeline23",  # expression-surface breadth: arrays, regex, mode, RLE, DLQ
    "pipeline24",  # robust statistics / interval algebra
    "pipeline25",  # mergeable-state contracts / budgeted selection
    "pipeline26",  # intra-doc dedup / Wilson CI / snapshot diff / stream top-k
    "pipeline27",  # dynamic partition pruning / RocksDB state store
    "pipeline28",  # REAL media codecs: BMP + RIFF/WAV, closed-form oracles
    "pipeline29",  # NN resize / multi-frame container sampling / k-anonymity
    "pipeline30",  # golden record / sweep line / autocorrelation / chi2 indep
    "pipeline31",  # path trigrams / trimmed mean / join-card estimator / portable SQL
    "pipeline32",  # param binding / masked view / surrogate keys / late dim
    "pipeline33",  # 2-hop reachability / data-driven top-k
    "pipeline34",  # calendar dim / fan-out inflation audit / EXCEPT ALL
    "pipeline35",  # KS / Mann-Whitney / Gini / stump / Benford / observe / jaccard
    "pipeline36",  # Spearman / VARIANT / LPA rounds / MASE / uniqueness profile
    "pipeline37",  # recursive CTE / NULL-aware NOT IN / RAKE keywords
    "pipeline38",  # association rules / FK orphans / Simpson's audit
    "pipeline39",  # streaming observe metrics / Theil-Sen robust slope
    "pipeline40",  # sorted-neighborhood blocking / HHI / threshold sweep
    "pipeline41",  # k-core peel / language entropy / month-end clamp
    "pipeline42",  # BMP histogram / stopword discovery / weighted median
    "pipeline43",  # assortativity / modularity / CUPED
    "pipeline44",  # hash bootstrap / MDE sizing / forward as-of
    "pipeline45",  # Pareto skyline / label windows / key overlap
    "pipeline46",  # max drawdown / portable recursive closure
    "pipeline47",  # 2-feature Shapley / HITS / LLR keyness
    "pipeline48",  # Lorenz curve / record highs / NULL-agg kernel
    "pipeline49",  # nearest as-of / Cohen's kappa
    "pipeline50",  # NULL-join matrix / Fano burstiness
    "pipeline51",  # nDCG@10 / local clustering coefficient
    "pipeline52",  # lead-lag xcorr / ratio delta-method SE
    "pipeline53",  # P/R@k curve / corpus filter attribution
    "pipeline54",  # Kaplan-Meier survival
    "pipeline55",  # vocab coverage curve / RFM segmentation
    "pipeline56",  # mutual-information cells
    "pipeline57",  # Kruskal-Wallis k-sample test
    "pipeline58",  # Zipf slope / inter-arrival CV
    "pipeline59",  # dup-cluster histogram / cross-field consistency
    "pipeline60",  # Kendall tau-b ordinal association
    "pipeline61",  # diff-in-diff / EB shrinkage
    "pipeline62",  # per-class F1
    "pipeline63",  # monthly VWAP / caliper matching ATT
    "pipeline64",  # Adamic-Adar / Brier score
    "pipeline65",  # price-volume mix / workday-adjusted KPI
    "pipeline66",  # hash-deterministic permutation test
    "pipeline67",  # ship-lag SLA / PSI stability bands
    "pipeline68",  # Hill tail index / seasonal index MA
    "pipeline69",  # weekly growth accounting
    "pipeline70",  # forecast WAPE-bias / calibration ECE
    "pipeline71",  # ABC Pareto classification
    "pipeline72",  # monthly CAGR
    "pipeline73",  # duplicated-span inventory / keep-first scrub / incremental batch scrub
    "pipeline74",  # hybrid retrieval fusion: RRF over the BM25 + cosine arms
    "pipeline75",  # span-dedup resolution eval + streaming span scrub
    "pipeline76",  # LM-perplexity quality filter (CCNet-style)
    "soak",        # r3: 10-cycle incremental warehouse soak (S1->W1->J3->serve)
]

for _m in _QUERY_MODULES:
    try:
        importlib.import_module(f"stakehouse_etl_spark.queries.{_m}")
    except Exception as e:  # pragma: no cover - defensive
        print(
            f"FATAL: query module '{_m}' failed to import — the catalog "
            f"would silently shrink. Root cause: {type(e).__name__}: {e}",
            file=sys.stderr,
        )
        raise

# Catalog-shrink guard: bump when adding queries; tools/check.py and
# the test suite assert against it. A broken registration path then
# fails here, visibly, instead of producing a smaller catalog.
EXPECTED_MIN_QUERIES = 390
if len(QUERIES) < EXPECTED_MIN_QUERIES:
    raise RuntimeError(
        f"catalog shrank: {len(QUERIES)} queries registered, expected >= "
        f"{EXPECTED_MIN_QUERIES}"
    )

# The grading driver samples the FIRST 50 queries() entries; this
# prefix guarantees that sample covers every SURVEY §2 family (S/K/P/
# J/A/W/O/U/F/T) and every beyond-§2 pipeline family (text, dedup
# ladder, similarity, multimodal, corpus pipeline, connected
# components, streaming).
#
# ROTATION (VERDICT r3 task #5): ~20 slots rotate each round so the
# external gate eventually touches the whole catalog instead of
# re-checking the same prefix. Round 6 keeps the 27-query §2 spine
# (one representative per family) and surfaces 23 queries the driver
# has NEVER checked (not in CORRECTNESS_r01–r05) — newest code first:
# the round's additions and every query whose plan changed take
# slots ahead of stable never-checked queries, so the external gate
# validates exactly the changed code. Queries rotated out stay in
# the catalog under the local 389-query gate (tools/check.py), which
# runs the same DuckDB methodology.
DRIVER_PRIORITY = [
    # --- §2 spine (27, all driver-green in r1–r4) ---
    # time-series / window family (W1-W6, T3)
    "w1_user_income", "w2_income_epoch_hourly",
    # join family (J1-J10, P8)
    "j1_latest_order_per_customer", "j3_order_lineitem_agg",
    "j9_asof_last_signup",
    # aggregate family (A1-A10)
    "a1_pricing_summary",
    # output / set family (O1-O3, U1-U3; union semantics stay covered
    # by u3's sequence+anti plan and the r1-r4 green history of u1)
    "o2_pagination", "u3_missing_days",
    # scalar-function family (F1-F10) + predicate kernel (P1-P7)
    "f_scalar_kernel", "f10_json_extract", "p_predicate_kernel",
    # sink family (K1/K2/K4, T5)
    "k1_upsert_sink",
    # connector family (S1-S3)
    "s1_s2_connector_normalize",
    # incremental / temporal family (T1-T5; the soak is the 10-cycle
    # composed production loop)
    "pipeline_warehouse_soak", "t2_bounded_catchup", "t4_backfill_repair",
    # streaming (T6) + CDC sink
    "stream_windowed_counts", "stream_stateful_income", "stream_cdc_apply",
    # text analysis
    "text_quality",
    # dedup ladder
    "dedup_exact", "dedup_minhash_lsh", "dedup_cc_clusters",
    "pipeline_corpus_clean",
    # similarity / ANN
    "sim_cosine_topk", "sim_ivf_topk",
    # multimodal — real BMP codec end-to-end
    "mm_bmp_decode",
    # --- round-6 rotation (23) ---
    # Changed-code-first (the rotation contract): the three r6
    # additions (streaming span scrub, span-resolution recall eval,
    # LM-perplexity filter), the r5 code the gate never touched
    # (corpus_span_scrub + the two queries catalog.py promised last
    # round + mm_wav_decode), then EVERY query whose plan changed this
    # round — the levenshtein verify tier (af2c9c5), the eight
    # interpreted-HOF re-split fixes (shingles/ordered_kgrams
    # consumers + mm_hamming's substr byte gather), the re-tiered
    # graph queries (capped-LSH edges; pagerank also lost its
    # row-scale degree broadcast pin), and the scaled-K SemDeDup —
    # then a stable never-checked tail. 22 of 23 are first-time
    # (pagerank was r5-checked but its plan changed twice this round).
    "stream_span_scrub", "dedup_span_recall_eval", "corpus_lm_perplexity",
    "corpus_span_scrub", "inc_agg_merge", "j24_null_aware_not_in",
    "mm_wav_decode", "dedup_levenshtein_pairs",
    "text_winnowing_fingerprints", "text_repetition_metrics",
    "text_contamination_overlap", "text_ngram_counts",
    "text_feature_hashing", "mm_hamming_dedup",
    "ml_bpe_train_merges", "text_bpe_merge_pairs",
    "dedup_semantic_prune", "graph_pagerank_2iter",
    "graph_triangle_count",
    "tpch_q6_forecast_revenue", "a_grouping_sets", "ts_scd2_history",
    "dq_column_profile",
]
assert len(DRIVER_PRIORITY) == 50, len(DRIVER_PRIORITY)
_missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
if _missing:
    raise RuntimeError(f"DRIVER_PRIORITY names not in catalog: {_missing}")


def _ordered_names() -> list[str]:
    rest = [n for n in QUERIES if n not in set(DRIVER_PRIORITY)]
    return DRIVER_PRIORITY + rest


def query_map():
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_map():
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }


def bench_queries():
    return {name: q.fn for name, q in QUERIES.items() if q.bench}


__all__ = [
    "QUERIES",
    "QueryDef",
    "DRIVER_PRIORITY",
    "EXPECTED_MIN_QUERIES",
    "query_map",
    "oracle_map",
    "bench_queries",
]
