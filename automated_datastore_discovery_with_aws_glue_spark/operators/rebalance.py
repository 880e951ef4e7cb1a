"""Partition rebalancing for CPU-heavy per-row stages.

Parquet scans parallelize by splitting files on row-group boundaries; a
source written as a few huge single-row-group files (or gzip text, or a
small-file JDBC read) arrives as a handful of partitions no matter how
many cores the cluster has. For cheap scans that is fine — for operators
that do heavy per-row expression work (shingling, 64-way hash
signatures, per-pair cosine) an unbalanced input serializes the whole
stage on a few cores.

``spread`` hash-repartitions the input up to the session's default
parallelism *only when the incoming plan has fewer partitions than
that* — a well-partitioned 100 TB input passes through untouched (no
extra shuffle), while a pathological layout gets one cheap narrow-column
shuffle before the expensive stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` iff it
    currently has fewer partitions than that target."""
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * factor)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans; spreading is optional
        return df
    if current >= target:
        return df
    return df.repartition(target)
