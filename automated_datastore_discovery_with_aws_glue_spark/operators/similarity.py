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
    """Cosine similarity of two double-array columns (any dimension;
    higher-order fold — interpreted per element, so prefer
    ``cosine_fixed`` in hot paths when the dimension is known)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _vec_term(name: str | list[float], i: int) -> str:
    """SQL fragment for element i of a vector: column subscript or an
    inlined literal coefficient (Python float repr round-trips exactly
    through Java's Double.parseDouble)."""
    if isinstance(name, str):
        return f"CAST({name}[{i}] AS DOUBLE)"
    return f"CAST('{float(name[i])!r}' AS DOUBLE)"


def dot_fixed_sql(a: str | list[float], b: str | list[float], dim: int) -> str:
    """Statically-unrolled dot product for a known dimension, as ONE SQL
    string (single parse — building the same tree out of Python Column
    ops costs hundreds of py4j round-trips per query).

    The higher-order ``aggregate(zip_with(...))`` form materializes a
    zipped array and walks an interpreted lambda per element — ~10x
    slower per pair than this flat expression, which whole-stage codegen
    compiles to straight-line JVM arithmetic. Fold order (left-to-right,
    seeded 0.0) matches the HOF form bit-for-bit, so oracle hashes agree."""
    terms = " + ".join(f"{_vec_term(a, i)} * {_vec_term(b, i)}" for i in range(dim))
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def dot_fixed(a: str | list[float], b: str | list[float], dim: int) -> Column:
    return F.expr(dot_fixed_sql(a, b, dim))


def cosine_fixed(a: str | list[float], b: str | list[float], dim: int) -> Column:
    """Unrolled cosine; ``a``/``b`` are column names or literal vectors."""
    d, na, nb = dot_fixed_sql(a, b, dim), dot_fixed_sql(a, a, dim), dot_fixed_sql(b, b, dim)
    return F.expr(f"{d} / (sqrt({na}) * sqrt({nb}))")


def vector_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality probe (one-row scan). Array columns carry
    no length in the schema, so the unrolled kernels need one lookup."""
    rows = df.select(F.size(F.col(vec_col))).limit(1).collect()
    return int(rows[0][0]) if rows else 0


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
    if isinstance(query, Column):  # opaque query expression -> generic kernel
        sim = F.round(cosine(as_double(F.col(vec_col)), query), 4)
    else:
        sim = F.round(cosine_fixed(vec_col, list(query), len(query)), 4)
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
    co-located pairs with the unrolled fixed-dim kernel, and each
    vector's norm is computed ONCE per row (persisted) instead of once
    per pair — at B rows per block that saves B norm evaluations per
    candidate. ``spread`` rebalances unsplittable inputs."""
    dim = vector_dim(df, vec_col)
    base = (
        spread(
            df.select(
                F.col(id_col).alias("id"),
                F.col(block_col).alias("block"),
                as_double(F.col(vec_col)).alias("v"),
            )
        )
        .withColumn("nrm", F.expr(f"sqrt({dot_fixed_sql('v', 'v', dim)})"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = base.select(F.col("id").alias("id_a"), "block", F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = base.select(F.col("id").alias("id_b"), "block", F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    sim = F.round(dot_fixed("v_a", "v_b", dim) / (F.col("n_a") * F.col("n_b")), 4)
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


def lsh_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket id of a vector under the given hyperplanes — one
    SQL expression (unrolled dot product per plane; plane coefficients
    fold into the codegen'd expression as literals)."""
    dim = planes.shape[1]
    parts = []
    for i, plane in enumerate(planes):
        dot = dot_fixed_sql(vec_col, [float(c) for c in plane], dim)
        parts.append(f"shiftleft(CAST({dot} >= 0 AS BIGINT), {i})")
    return F.expr(" ^ ".join(parts))


def ivf_centroids(
    df: DataFrame, vec_col: str, *, n_cells: int = 16, id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: take the n_cells vectors with
    the smallest ``xxhash64(id)`` (a seedless pseudo-random but
    reproducible sample) and L2-normalize them. A tiny driver-side
    collect — n_cells x dim floats — regardless of table size."""
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(n_cells)
        .collect()
    )
    c = np.array([[float(x) for x in r["v"]] for r in rows])
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_cell_expr(vec_col: str, centroids: np.ndarray) -> Column:
    """Cell id = argmax over centroids of dot(v, unit_centroid) — one SQL
    expression via the array_max(struct(sim, cell)) trick (ties break to
    the higher cell id, deterministically). Centroid coefficients fold in
    as literals; the whole assignment is map-side codegen."""
    dim = centroids.shape[1]
    structs = ", ".join(
        f"named_struct('s', {dot_fixed_sql(vec_col, [float(x) for x in c], dim)}, 'c', {i})"
        for i, c in enumerate(centroids)
    )
    return F.expr(f"array_max(array({structs})).c")


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells: score only the
    vectors whose nearest centroid is among the query's n_probe nearest
    centroids.

    Scale path: materialize the cell id as a partition/bucket column at
    ingest (``ivf_cell_expr``) and this becomes a partition-pruned scan
    of n_probe/n_cells of the data; here the assignment is computed
    inline. Complements hyperplane LSH: IVF adapts to the data
    distribution (centroids come from the data), LSH is data-oblivious."""
    cents = ivf_centroids(df, vec_col, n_cells=n_cells, id_col=id_col)
    qv = np.asarray(query, dtype=float)
    probes = np.argsort(-(cents @ qv))[:n_probe].tolist()
    dim = len(query)
    return (
        df.withColumn("_cell", ivf_cell_expr(vec_col, cents))
        .filter(F.col("_cell").isin([int(p) for p in probes]))
        .select(
            F.col(id_col),
            F.round(cosine_fixed(vec_col, [float(x) for x in query], dim), 4).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )


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
    # left-to-right IEEE fold, exactly the order the codegen'd SQL
    # expression uses — np.dot's pairwise/SIMD summation could flip the
    # sign of a near-zero projection and disagree with the executor-side
    # bucket (and the differential oracle) on the same data
    qbucket = 0
    for i, plane in enumerate(planes):
        acc = 0.0
        for x, c in zip(query, plane):
            acc += float(x) * float(c)
        if acc >= 0:
            qbucket |= 1 << i
    return (
        df.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
        .filter(F.col("bucket") == qbucket)
        .select(
            F.col(id_col),
            F.round(cosine_fixed(vec_col, [float(x) for x in query], dim), 4).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )
