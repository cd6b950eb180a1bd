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
    "pipeline77",  # train-ready corpus export: the full tier ladder, one ledger
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
EXPECTED_MIN_QUERIES = 392
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
# ROTATION (VERDICT r6 task #1): the r6 gate spent 28/50 slots on
# repeat anchors; round 7 cuts the standing spine to 10 core
# representatives and fills 40 slots with (a) changed-code-first —
# this round's new composed export pipeline plus the two queries
# whose plans the round-6 review fixes changed (stream_span_scrub's
# retry-stable rewrite, dedup_semantic_prune's persist + centroid
# cap) — then (b) 37 queries the driver has NEVER checked (not in
# CORRECTNESS_r01–r06): 38 first-time entries total (target >= 35),
# lifting cumulative external coverage to >= 169/391. Queries rotated
# out stay under the local full-catalog gate (tools/check.py,
# EXPECTED_MIN_QUERIES entries, same DuckDB value-hash methodology).
DRIVER_PRIORITY = [
    # --- §2 spine (10 anchors, all driver-green r1–r6) ---
    "w1_user_income", "w2_income_epoch_hourly",
    "j1_latest_order_per_customer", "j3_order_lineitem_agg",
    "j9_asof_last_signup",
    "a1_pricing_summary",
    "k1_upsert_sink",
    "pipeline_warehouse_soak",
    "dedup_minhash_lsh",
    "stream_stateful_income",
    # --- changed-code-first (3; 1 first-time) ---
    "pipeline_corpus_export",   # NEW: full tier-ladder export ledger
    "stream_span_scrub",        # retry-stable foreachBatch rewrite
    "dedup_semantic_prune",     # persist + centroid-cap guard
    # --- never-driver-checked (37) ---
    # TPC-H family: the 16 shapes the external gate has never hashed
    "tpch_q2_min_cost_supplier", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority", "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue", "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier", "tpch_q22_global_balance_anti",
    # skew mitigation
    "skew_salted_join", "skew_two_stage_agg",
    # sources / sinks / layout
    "src_json_roundtrip", "src_orc_roundtrip",
    "sink_partitioned_prune", "sink_bucketed_join",
    # DataSource V2 arms
    "s1_datasource_scan", "k6_datasource_writer_roundtrip",
    # corpus pipeline tier
    "corpus_drop_ledger", "corpus_canonical_docs",
    "corpus_gopher_rules", "corpus_decontaminate_counts",
    "corpus_mix_temperature",
    # dedup / similarity evaluation arms (the sampled LSH eval is the
    # round-7 scale twin — changed-code-first; the unsampled
    # ground-truth arm stays under the local gate, where it remains
    # green at every shipped rung)
    "dedup_lsh_eval_sampled", "sim_ivf_recall_eval",
    "dedup_incremental_batch",
    # streaming
    "stream_availablenow_restart", "stream_dedup_within_watermark",
    # window / aggregate kernels
    "w_rank_kernel",
    # r7 plan changes — changed-code-first: the bucketed two-phase
    # epoch rank (also never driver-checked) and the BPE trainer's
    # incremental pair-count maintenance
    "corpus_epoch_shuffle", "ml_bpe_train_merges",
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
