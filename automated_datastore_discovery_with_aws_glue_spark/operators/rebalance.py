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

The partition probe (``df.rdd``) is only safe on NARROW plans
(scan/project/filter/generate): under AQE, probing a plan that contains
an exchange finalizes the adaptive plan — EXECUTING every upstream
stage at plan-build time, whose work the repartitioned plan then
re-runs. Frames with joins/aggregates/windows therefore pass through
untouched: their upstream exchange already spread the data across
``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: logical-plan nodes that introduce (or imply) an exchange — probing
#: .rdd past one of these executes the upstream stages under AQE
_WIDE_NODE = re.compile(
    r"^[\s:+-]*(Join|Aggregate|Window|Sort|Deduplicate|Distinct|"
    r"Repartition|RepartitionByExpression|Intersect|Except|GlobalLimit|"
    # group-map / cogroup / stateful nodes imply an exchange too:
    # groupBy().applyInPandas / applyInPandasWithState / cogroup
    r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|FlatMapGroupsWithState|"
    r"ApplyInPandasWithState|MapGroups|CoGroup)\b",
    re.M,
)


def _is_narrow(df: DataFrame) -> bool:
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover - exotic plans
        return False
    return _WIDE_NODE.search(plan) is None


def spread(df: DataFrame, *, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` iff it is a
    narrow (scan-stage) plan with fewer partitions than that target."""
    if not _is_narrow(df):
        return df
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * factor)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans; spreading is optional
        return df
    if current >= target:
        return df
    return df.repartition(target)
