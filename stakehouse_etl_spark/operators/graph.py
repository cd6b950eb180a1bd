"""Connected components over an edge list — duplicate-cluster
resolution for the dedup ladder.

Pairwise near-duplicate detection (MinHash/SimHash/Jaccard,
operators/dedup.py) yields EDGES; a training-data pipeline needs
CLUSTERS ("keep one doc per component"), and pairs alone
under-delete: A~B and B~C without A~C must still collapse to one
kept document. Min-label propagation closes that gap.

Iterative algorithm, driver-controlled loop, data stays distributed:
each pass is one join + one grouped min (two shuffles), converging in
O(component diameter) passes — near-dup clusters are shallow (text
corpora: diameter ≲ 5), so a handful of passes suffices at any scale.
``localCheckpoint`` truncates the lineage each pass so the plan
doesn't grow with iterations. The only driver-side data is the 1-row
convergence count per pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from stakehouse_etl_spark.caches import checkpoint_tracked, release_now


# Below this many (deduped, directed) edge rows the component
# resolution runs as a single driver-side union-find instead of the
# iterative distributed loop: each distributed pass costs 3-4 stages
# of fixed latency, and a ≤100k-row edge list is a few MB — the same
# bounded-metadata class as a broadcast threshold. Near-dup edge sets
# are a tiny fraction of the corpus (they ARE the duplicate clusters),
# so in practice even 100 TB runs often take this path; genuinely
# large graphs fall through to pointer jumping unchanged.
CC_DRIVER_MAX_EDGES = 100_000


def _driver_components(pairs: list[tuple]) -> dict:
    """Union-find with min-root labels over collected (a, b) rows."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the MIN id as the root — the component label contract
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    driver_max_edges: int | None = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Resolve undirected components; returns (node, component) with
    component = min node id reachable from the node.

    Only nodes appearing in ``edges`` are labeled (singletons are
    their own component trivially — union them in at the call site if
    needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # Tracked checkpoint (ADVICE r7 / review r8): a bare
    # localCheckpoint's blocks are invisible to DataFrame.unpersist
    # and stay resident until the ContextCleaner GCs them; tracking
    # lets the enclosing cache_scope release them deterministically.
    sym = checkpoint_tracked(sym)
    # sym is materialized by the eager checkpoint, so this count reads
    # cached partition sizes — no recompute.
    if driver_max_edges is not None and sym.count() <= driver_max_edges:
        rows = sym.collect()
        if any(a is None or b is None for a, b in rows):
            raise ValueError(
                "connected_components: NULL node ids in the edge list"
            )
        comp = _driver_components([(r[0], r[1]) for r in rows])
        node_type = sym.schema["a"].dataType
        spark = edges.sparkSession
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("node", node_type, False),
                StructField("component", node_type, False),
            ]
        )
        # Broadcast-hint the result (r11, guide §3.1): this path's
        # output is bounded at 2·driver_max_edges rows of two ids —
        # a few MB at most — but reaches callers as a Python-RDD scan
        # with UNKNOWN stats, so a consuming join (the dedup
        # pipelines' keep-set anti-join) planned sort-merge and
        # shuffled the corpus-scale probe side. The hint makes it a
        # broadcast build; the distributed path below returns
        # unhinted (its labels are node-scale).
        return F.broadcast(spark.createDataFrame(sorted(comp.items()), schema))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # Labels only ever DECREASE under min-propagation, so "no label
    # changed" ⇔ "the global label sum is unchanged" — a one-row agg
    # over the just-checkpointed labels, much cheaper than the
    # join-old-vs-new convergence check (one fewer shuffle per pass).
    # The sum identity only holds for NUMERIC node ids (F.sum over a
    # string column is NULL, and None == None would "converge" after
    # one pass, returning under-merged components); for any other id
    # type fall back to the join-based changed-row count.
    numeric_ids = isinstance(labels.schema["component"].dataType, NumericType)
    # NULL ids break BOTH distributed paths, and not loudly: NULL-keyed
    # joins silently drop propagation (a NULL node's neighbors
    # under-merge), the join-based convergence check filters NULL !=
    # NULL comparisons out, and the numeric sum identity only goes NULL
    # when EVERY label is NULL — a single NULL id among millions slips
    # through it (review r5). Probe upfront for every path, matching
    # the driver fast path's ValueError, so behavior is not
    # size-dependent. One LIMIT-1 probe over the checkpointed labels.
    if labels.filter(F.col("node").isNull()).limit(1).count() > 0:
        raise ValueError(
            "connected_components: NULL node ids in the edge list"
        )
    prev_sum = None
    for _ in range(max_iter):
        neighbor = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        propagated = (
            labels.select("node", "component")
            .union(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # Pointer jump (path doubling): follow node -> component one more
        # hop, so label distance DOUBLES per pass — convergence in
        # O(log diameter) instead of O(diameter). A 1000-node chain
        # resolves in ~10 passes, not 1000; shallow near-dup clusters
        # still converge in 2-3. One extra self-join on the (small)
        # label table per pass.
        parent = propagated.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = checkpoint_tracked(
            propagated.join(parent, propagated.component == parent.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_comp"), F.col("component"))
                ).alias("component"),
            )
        )
        # Generation-bounded blocks (same discipline as the BPE
        # trainer): once new_labels is materialized and the old
        # generation has served its last read, retire it — the loop
        # holds at most two label generations, not max_iter.
        prev_labels = labels
        if numeric_ids:
            cur_sum = new_labels.agg(F.sum("component")).collect()[0][0]
            if cur_sum is None and prev_sum is None:
                # NULL aggregate on a numeric column means NULL node
                # ids slipped in — fail loud rather than "converge".
                if new_labels.limit(1).count() > 0:
                    raise ValueError(
                        "connected_components: NULL component sum over "
                        "non-empty labels (NULL node ids in the edge list?)"
                    )
            labels = new_labels
            release_now(prev_labels)
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            release_now(prev_labels)
            if changed == 0:
                break
    else:
        # Loop exhausted without a convergence break: with pointer
        # jumping this needs component diameter > 2^max_iter — if it
        # ever happens, under-merged components are silently WRONG
        # downstream (dedup keep-sets, cluster ids). Fail loud.
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            "pointer-jumping passes (diameter > 2^max_iter?)"
        )
    return labels
