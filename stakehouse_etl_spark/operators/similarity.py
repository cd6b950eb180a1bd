"""Similarity search over embedding columns.

Two paths:

- ``cosine_topk`` — brute-force top-k: queries × candidates. Correct
  baseline; cost O(|Q|·|C|·dim) — fine for |Q| small (rerank, eval),
  never for all-pairs at 100 TB.
- ``hyperplane_buckets`` / ``ann_lsh_pairs`` — random-hyperplane LSH:
  sign-bit bucket per vector, candidates only within a bucket. The
  scale path: one narrow shuffle on the bucket key instead of a cross
  join.

Determinism contract: embeddings are quantized to integer millis
(round(x·1000)), so dot products and norms are exact integer sums —
identical under any evaluation order and reproducible in DuckDB
(``list_dot_product`` over integer lists sums integer-valued doubles
exactly). Cosine = double(dot)/(sqrt(na)·sqrt(nb)) — one IEEE op
sequence, same in both engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000

# Fixed random hyperplanes (seed 42), quantized to integers — shared
# verbatim with the SQL oracle generator.
N_PLANES = 8
EMB_DIM = 64
_rng = np.random.RandomState(42)
PLANES: list[list[int]] = (
    np.round(_rng.randn(N_PLANES, EMB_DIM) * QUANT).astype(int).tolist()
)


def quantize(emb: Column) -> Column:
    """float array → exact integer-milli array."""
    return F.transform(emb, lambda x: F.round(x * QUANT).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine(dot: Column, na: Column, nb: Column) -> Column:
    return dot.cast("double") / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: the named query vectors against the
    full corpus. The query side is tiny → broadcast; the scan side
    streams once, no shuffle until the per-query top-k (row_number
    over a k-bounded window)."""
    q = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            quantize(F.col(emb_col)).alias("q_emb"),
        )
        .withColumn("q_norm", sq_norm(F.col("q_emb")))
    )
    c = embeddings.select(
        F.col(id_col).alias("cand_id"), quantize(F.col(emb_col)).alias("c_emb")
    ).withColumn("c_norm", sq_norm(F.col("c_emb")))
    pairs = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .withColumn("dot", int_dot(F.col("q_emb"), F.col("c_emb")))
        .withColumn("cos_sim", cosine(F.col("dot"), F.col("q_norm"), F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def bucket_bits(emb_q: Column) -> Column:
    """LSH bucket id: sign bit per hyperplane, packed into a long.
    Integer dot with integer planes — exact, engine-independent."""
    bit_terms = [
        F.when(
            F.aggregate(
                F.zip_with(
                    emb_q,
                    F.array(*[F.lit(v) for v in PLANES[p]]),
                    lambda x, y: x * y,
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1 << p),
        ).otherwise(F.lit(0))
        for p in range(N_PLANES)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out.cast("long")


def hyperplane_buckets(
    embeddings: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Assign each vector its LSH bucket (+ keep the quantized vector
    and its norm for in-bucket rescoring)."""
    return embeddings.select(
        F.col(id_col),
        quantize(F.col(emb_col)).alias("q_emb"),
    ).select(
        id_col,
        "q_emb",
        sq_norm(F.col("q_emb")).alias("norm"),
        bucket_bits(F.col("q_emb")).alias("bucket"),
    )


def ann_lsh_pairs(
    embeddings: DataFrame,
    min_cosine: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed: exact cosine computed
    only within buckets. Equi-join on the bucket key — at 100 TB this
    shuffles each vector once; no cross join ever materializes.

    Recall is governed by N_PLANES (8 → ~|cos| high pairs collide with
    good probability); run multiple plane-sets and union for higher
    recall — same plan shape.
    """
    b = hyperplane_buckets(embeddings, id_col, emb_col)
    left = b.select(
        F.col(id_col).alias("id_a"),
        F.col("q_emb").alias("emb_a"),
        F.col("norm").alias("norm_a"),
        "bucket",
    )
    right = b.select(
        F.col(id_col).alias("id_b"),
        F.col("q_emb").alias("emb_b"),
        F.col("norm").alias("norm_b"),
        "bucket",
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", int_dot(F.col("emb_a"), F.col("emb_b")))
        .withColumn(
            "cos_sim", cosine(F.col("dot"), F.col("norm_a"), F.col("norm_b"))
        )
        .filter(F.col("cos_sim") >= min_cosine)
        .select("id_a", "id_b", "cos_sim")
        .distinct()
    )
