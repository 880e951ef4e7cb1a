"""Bucketed co-located joins: the exchange must vanish from the plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from automated_datastore_discovery_with_aws_glue_spark.catalog.bucketing import colocated_join, write_bucketed
from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=4)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=4)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # broadcast would bypass the bucketed path on this small fixture;
    # disable it so the test exercises the sort-merge machinery that a
    # fact-to-fact join uses at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed):
    plain = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    bucketed_df = (
        colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    assert sorted(map(tuple, bucketed_df.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_agg_avoids_exchange(spark, bucketed):
    # aggregation on the bucket key also reuses the bucketing
    agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange" not in _plan(agg)
