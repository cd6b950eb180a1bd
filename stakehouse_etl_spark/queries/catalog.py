"""Aggregated query catalog.

Importing this module registers every query family into ``QUERIES``.
``query_map`` / ``oracle_map`` are the shapes ``__spark_entry__.py``
exposes to the driver.
"""

from __future__ import annotations

from stakehouse_etl_spark.queries.registry import QUERIES, QueryDef

# Registration side effects — order defines catalog listing order.
from stakehouse_etl_spark.queries import core  # noqa: F401,E402

try:  # beyond-reference data-pipeline queries (dedup/similarity/text)
    from stakehouse_etl_spark.queries import datapipe  # noqa: F401,E402
except ImportError:
    pass
try:  # streaming / incremental queries
    from stakehouse_etl_spark.queries import streaming  # noqa: F401,E402
except ImportError:
    pass
try:  # coverage-completing + TPC-H-shaped bench queries
    from stakehouse_etl_spark.queries import extra  # noqa: F401,E402
except ImportError:
    pass
try:  # sinks, serving ratios, bounded catch-up, backfill, connectors
    from stakehouse_etl_spark.queries import lifecycle  # noqa: F401,E402
except ImportError:
    pass
try:  # TPC-H Q2/Q9/Q11/Q12/Q15/Q20/Q21 — completing the 22-query set
    from stakehouse_etl_spark.queries import tpch2  # noqa: F401,E402
except ImportError:
    pass
try:  # sessionize / gap-fill / tfidf / cube / percentiles / components
    from stakehouse_etl_spark.queries import analytics  # noqa: F401,E402
except ImportError:
    pass
try:  # repetition metrics / PII redaction / corpus-clean pipeline
    from stakehouse_etl_spark.queries import corpus  # noqa: F401,E402
except ImportError:
    pass
try:  # packing / sampling / contamination / ngram LM / kmeans / TWA
    from stakehouse_etl_spark.queries import pipeline2  # noqa: F401,E402
except ImportError:
    pass
try:  # funnel / cohort / SCD2 / range join / source mixing
    from stakehouse_etl_spark.queries import analytics2  # noqa: F401,E402
except ImportError:
    pass
try:  # pagerank / range-frame rolling / group OLS / vocab overlap
    from stakehouse_etl_spark.queries import analytics3  # noqa: F401,E402
except ImportError:
    pass
try:  # z-order / partition pruning / vocab coverage
    from stakehouse_etl_spark.queries import layout  # noqa: F401,E402
except ImportError:
    pass
try:  # heavy-hitters contract / equi-depth histogram
    from stakehouse_etl_spark.queries import approx2  # noqa: F401,E402
except ImportError:
    pass
try:  # prefix-filter similarity join / containment / CDC / anomaly / PPS
    from stakehouse_etl_spark.queries import pipeline3  # noqa: F401,E402
except ImportError:
    pass
try:  # DQ audit / rolling distinct / PMI / int8 quantize / as-of tolerance
    from stakehouse_etl_spark.queries import pipeline4  # noqa: F401,E402
except ImportError:
    pass
try:  # knn precision@10 / langid confusion / grouping sets
    from stakehouse_etl_spark.queries import pipeline5  # noqa: F401,E402
except ImportError:
    pass
try:  # bloom prefilter join / schema evolution / streaming CDC
    from stakehouse_etl_spark.queries import pipeline6  # noqa: F401,E402
except ImportError:
    pass
try:  # intersect-all / OHLC resample / incremental agg merge
    from stakehouse_etl_spark.queries import pipeline7  # noqa: F401,E402
except ImportError:
    pass
try:  # SCD2 point-in-time join / n-gram novelty
    from stakehouse_etl_spark.queries import pipeline8  # noqa: F401,E402
except ImportError:
    pass
try:  # small-file compaction / PQ codebook
    from stakehouse_etl_spark.queries import pipeline9  # noqa: F401,E402
except ImportError:
    pass
try:  # Welch t / triangle count / percent-of-total
    from stakehouse_etl_spark.queries import pipeline10  # noqa: F401,E402
except ImportError:
    pass
try:  # count-min sketch / freshness / dedup rate / calibration
    from stakehouse_etl_spark.queries import pipeline11  # noqa: F401,E402
except ImportError:
    pass
try:  # drill-across / chi2 drift / write-audit-publish
    from stakehouse_etl_spark.queries import pipeline12  # noqa: F401,E402
except ImportError:
    pass
try:  # LSH eval / exact AUC / gopher rules
    from stakehouse_etl_spark.queries import pipeline13  # noqa: F401,E402
except ImportError:
    pass
try:  # availableNow restart / decimal sums / null-safe join
    from stakehouse_etl_spark.queries import pipeline14  # noqa: F401,E402
except ImportError:
    pass
try:  # weighted averages / month-over-month growth
    from stakehouse_etl_spark.queries import pipeline15  # noqa: F401,E402
except ImportError:
    pass


def query_map():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_map():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def bench_queries():
    return {name: q.fn for name, q in QUERIES.items() if q.bench}


__all__ = ["QUERIES", "QueryDef", "query_map", "oracle_map", "bench_queries"]
