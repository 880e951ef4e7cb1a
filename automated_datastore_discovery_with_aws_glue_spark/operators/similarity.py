"""Similarity search over embedding columns (north-star surface):

- brute-force cosine top-k  — exact baseline; one scan, TakeOrdered
- blocked near-dup          — cosine >= t within blocking keys
- hyperplane-LSH top-k      — sign-bit bucketing; the 100 TB path where
                              only the query's bucket is scanned

Dot products run as ``aggregate(zip_with(...))`` higher-order
expressions in the JVM; embeddings are cast to double once so results
are bit-identical with the DuckDB oracle's list_cosine_similarity.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.storagelevel import StorageLevel

from automated_datastore_discovery_with_aws_glue_spark.operators.rebalance import spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda v: v.cast("double"))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float] | Column,
    k: int = 10,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    Executes as scan -> projection -> TakeOrderedAndProject: no shuffle,
    no global sort materialization; each partition keeps k rows.
    Rounded similarity + id tiebreak make the ordering total."""
    q = query if isinstance(query, Column) else F.array(*[F.lit(float(v)) for v in query])
    sim = F.round(cosine(as_double(F.col(vec_col)), q), 4)
    return (
        df.select(F.col(id_col), sim.alias("similarity"))
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )


def blocked_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    *,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks (id_a < id_b).
    The self-join shuffles on the block key only; cosine is evaluated on
    co-located pairs. The cast vectors are persisted once (both join
    sides read them); ``spread`` rebalances unsplittable inputs."""
    base = spread(
        df.select(
            F.col(id_col).alias("id"),
            F.col(block_col).alias("block"),
            as_double(F.col(vec_col)).alias("v"),
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = base.select(F.col("id").alias("id_a"), "block", F.col("v").alias("v_a"))
    b = base.select(F.col("id").alias("id_b"), "block", F.col("v").alias("v_b"))
    sim = F.round(cosine(F.col("v_a"), F.col("v_b")), 4)
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("similarity", sim)
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "block", "similarity")
    )


# ---------------------------------------------------------------------------
# Hyperplane LSH (approximate; the partition-pruned scale path)
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (public SimHash-for-cosine LSH)."""
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def lsh_bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id of a vector under the given hyperplanes —
    native expressions only (one dot product per plane)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    On a partitioned/bucketed table the bucket id is a partition key and
    this becomes a partition-pruned scan of ~1/2^n_planes of the data.
    Recall is probabilistic (tested against the exact baseline)."""
    dim = len(query)
    planes = hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query, dtype=float)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(qv, plane)) >= 0:
            qbucket |= 1 << i
    v = as_double(F.col(vec_col))
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.withColumn("bucket", lsh_bucket_expr(v, planes))
        .filter(F.col("bucket") == qbucket)
        .select(F.col(id_col), F.round(cosine(v, qcol), 4).alias("similarity"))
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )
