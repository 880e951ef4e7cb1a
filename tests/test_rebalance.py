"""`operators.rebalance.spread` guard: the partition probe (`df.rdd`)
is only safe on narrow scan-stage plans — under AQE, probing a plan with
an exchange-implying node executes upstream stages at plan-build time.
The `_is_narrow` blacklist must therefore cover group-map / cogroup /
stateful logical nodes, not just joins/aggregates (advisor finding)."""

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.operators.rebalance import _is_narrow, spread


def test_scan_project_filter_is_narrow(spark):
    df = spark.range(10).select((F.col("id") * 2).alias("x")).filter("x > 2")
    assert _is_narrow(df)


def test_wide_nodes_not_narrow(spark):
    base = spark.range(10).withColumn("k", F.col("id") % 3)
    assert not _is_narrow(base.groupBy("k").count())
    assert not _is_narrow(base.join(base.select("k").distinct(), "k"))


def test_group_map_nodes_not_narrow(spark):
    """groupBy().applyInPandas / cogroup().applyInPandas imply an
    exchange — spread() must pass them through untouched instead of
    probing .rdd (which would finalize/execute upstream stages)."""
    import pandas as pd

    base = spark.range(10).withColumn("k", F.col("id") % 3)

    def ident(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    gm = base.groupBy("k").applyInPandas(ident, "id long, k long")
    assert not _is_narrow(gm)
    assert spread(gm) is gm

    def cog(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return left

    cg = base.groupBy("k").cogroup(base.groupBy("k")).applyInPandas(
        lambda l, r: l, "id long, k long"
    )
    assert not _is_narrow(cg)
    assert spread(cg) is cg
