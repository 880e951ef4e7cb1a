"""Mergeable HLL distinct-count sketches (`operators/sketch.py`) — the
sf0.01 oracle run pins the exact+tolerance contract; these pin the two
properties the INCREMENTAL design rests on: union-of-partials equals
the whole-corpus sketch exactly, and sketches survive a parquet
state-table roundtrip still mergeable."""

from __future__ import annotations

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.operators.sketch import (
    hll_partials,
    hll_union_estimate,
)


def _frame(spark):
    return spark.range(60000).selectExpr(
        "id % 4 AS batch",
        "CAST(id % 2 AS STRING) AS g",
        "CAST(id % 9137 AS STRING) AS u",
    )


def test_hll_union_of_partials_equals_whole(spark):
    df = _frame(spark)
    whole = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("u", F.lit(12))).alias("n"))
        .collect()
    }
    parts = hll_partials(df, ["g"], "u", batch_col="batch")
    merged = {
        r["g"]: r["approx_nd"]
        for r in hll_union_estimate(parts, ["g"]).collect()
    }
    assert merged == whole
    # and the estimate is a real estimate of the true cardinality
    for v in merged.values():
        assert abs(v - 9137) / 9137 < 0.05


def test_hll_sketches_survive_parquet_state_roundtrip(spark, tmp_path):
    """The incremental lifecycle: batch sketches WRITTEN to a state
    table, read back later, unioned with a NEW batch — the estimate
    matches computing over all data at once."""
    df = _frame(spark)
    old = hll_partials(df.filter("batch < 3"), ["g"], "u", batch_col="batch")
    p = str(tmp_path / "sketch_state")
    old.write.parquet(p)
    stored = spark.read.parquet(p)
    new = hll_partials(df.filter("batch = 3"), ["g"], "u", batch_col="batch")
    merged = {
        r["g"]: r["approx_nd"]
        for r in hll_union_estimate(stored.unionByName(new), ["g"]).collect()
    }
    whole = {
        r["g"]: r["approx_nd"]
        for r in hll_union_estimate(
            hll_partials(df, ["g"], "u", batch_col="batch"), ["g"]
        ).collect()
    }
    assert merged == whole
