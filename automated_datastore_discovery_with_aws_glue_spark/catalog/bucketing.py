"""Bucketed-table support — the co-located join path at scale.

SURVEY §7 / the 100 TB posture: a fact-to-fact equi-join (orders ⋈
lineitem on orderkey) shuffles BOTH sides on every run. Writing the
tables bucketed on the join key with matching bucket counts makes the
join shuffle-free forever after: each task sort-merge-joins bucket i of
one table against bucket i of the other, so the exchange disappears
from the physical plan (verified by ``tests/test_bucketing.py``).

The reference has no analogue (its joins are Python loops over KB-scale
state); this is engine-native infrastructure for the repeated
reporting/classification joins the engine runs daily over the same
tables — pay one bucketed write, save a shuffle per query thereafter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a metastore table bucketed (and optionally
    sorted) on ``key``. Sorting within buckets lets the sort-merge join
    skip its sort step too — the join degenerates to a streaming merge
    of pre-sorted bucket files."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``key`` with equal bucket counts.
    Catalyst plans a sort-merge join whose children read bucketed scans
    directly — no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
