"""Persist lifecycle closure (VERDICT r2 'what's wrong' #2 / task 3).

The pair operators persist their exploded shingle tables; a
long-lived service composing them must not accumulate MEMORY_AND_DISK
RDDs. The contract: operators register caches via
``caches.persist_tracked``, the query layer wraps its ACTION in
``caches.cache_scope()``, and nothing stays persisted after the scope
exits — verified against the JVM's own ``getPersistentRDDs``.
"""

from __future__ import annotations

from stakehouse_etl_spark import caches
from stakehouse_etl_spark.queries.catalog import QUERIES

SF = "/root/testdata/sf0.001"

# Three persist-heavy pair queries, back-to-back (the verdict's exact
# scenario). All are shingle-table pair ops — no localCheckpoint
# (connected-components) blocks, which are GC-managed, not tracked.
PAIR_QUERIES = [
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_prefix_filter_pairs",
]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_pair_queries_release_caches_at_action_boundary(spark):
    caches.release_tracked()  # drain registrations from other modules
    spark.catalog.clearCache()  # isolate from other test modules
    assert _n_persistent(spark) == 0
    for name in PAIR_QUERIES:
        with caches.cache_scope():
            df = QUERIES[name].fn(spark, SF)
            n = df.count()  # the action; cache is live here
            assert n >= 0
            assert _n_persistent(spark) >= 1, (
                f"{name}: expected a live tracked cache inside the scope"
            )
        assert _n_persistent(spark) == 0, (
            f"{name}: caches leaked past the action boundary"
        )


def test_cache_scope_nests(spark):
    caches.release_tracked()
    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    from stakehouse_etl_spark.operators.dedup import doc_shingles

    with caches.cache_scope():
        outer = caches.persist_tracked(doc_shingles(docs))
        outer.count()
        with caches.cache_scope():
            inner = caches.persist_tracked(doc_shingles(docs, k=2))
            inner.count()
            assert _n_persistent(spark) == 2
        # inner scope released only its own registration
        assert _n_persistent(spark) == 1
    assert _n_persistent(spark) == 0


def test_release_tracked_is_idempotent_and_counts(spark):
    caches.release_tracked()
    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(1, "one two three four five six seven")], "doc_id long, text string"
    )
    from stakehouse_etl_spark.operators.dedup import doc_shingles

    caches.persist_tracked(doc_shingles(docs)).count()
    assert caches.release_tracked() == 1
    assert caches.release_tracked() == 0
    assert _n_persistent(spark) == 0


def test_checkpoint_tracked_releases_blocks(spark):
    """ADVICE r7: localCheckpoint pins MEMORY_AND_DISK blocks that
    ``DataFrame.unpersist`` cannot see; ``checkpoint_tracked`` must
    free them at the scope boundary via the LogicalRDD route (this
    test also pins the plan-shape reflection that route relies on)."""
    caches.release_tracked()
    spark.catalog.clearCache()
    assert _n_persistent(spark) == 0
    df = spark.range(1000).selectExpr("id", "id * 2 AS x")
    with caches.cache_scope():
        ck = caches.checkpoint_tracked(df)
        assert ck.count() == 1000
        assert _n_persistent(spark) >= 1, (
            "expected the localCheckpoint's blocks to register as a "
            "persistent RDD inside the scope"
        )
    assert _n_persistent(spark) == 0, (
        "localCheckpoint blocks leaked past the action boundary"
    )


def test_export_pipeline_releases_checkpoints(spark):
    """The stage-cut export pipeline holds ~10 checkpointed stage
    outputs while building the ledger; after the consuming action's
    scope exits, none may stay resident."""
    caches.release_tracked()
    spark.catalog.clearCache()
    with caches.cache_scope():
        n = QUERIES["pipeline_corpus_export"].fn(spark, SF).count()
        assert n > 0
        assert _n_persistent(spark) >= 1
    assert _n_persistent(spark) == 0


def test_registry_is_thread_isolated(spark):
    """ADVICE r3 (medium): two concurrent scopes must not interleave —
    thread B's scope exit may not unpersist thread A's live cache, and
    a thread sees only its own registrations."""
    import threading

    caches.release_tracked()
    spark.catalog.clearCache()
    from stakehouse_etl_spark.operators.dedup import doc_shingles

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    a_registered = threading.Event()
    b_done = threading.Event()
    results: dict[str, int] = {}

    def thread_a():
        with caches.cache_scope():
            df = caches.persist_tracked(doc_shingles(docs))
            df.count()
            a_registered.set()
            # B runs a full scope (register + release) while A's cache
            # is live; A's cache must survive B's exit.
            assert b_done.wait(timeout=60)
            results["a_live_after_b_exit"] = df.storageLevel.useMemory
        results["a_after_own_exit"] = _n_persistent(spark)

    def thread_b():
        assert a_registered.wait(timeout=60)
        # B sees none of A's registrations
        results["b_released_foreign"] = caches.release_tracked()
        with caches.cache_scope():
            db = caches.persist_tracked(doc_shingles(docs, k=2))
            db.count()
        b_done.set()

    ta = threading.Thread(target=thread_a)
    tb = threading.Thread(target=thread_b)
    ta.start()
    tb.start()
    ta.join(timeout=120)
    tb.join(timeout=120)
    assert results["b_released_foreign"] == 0
    assert results["a_live_after_b_exit"] is True
    assert results["a_after_own_exit"] == 0
