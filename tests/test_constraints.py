"""Constraint-suite semantics (`operators/constraints.py`) — the sf0.01
oracle run proves engine-vs-DuckDB equality of the composed report;
these prove each check's definition (Deequ semantics) and the fused
single-scan property."""

from __future__ import annotations

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.operators.constraints import (
    Completeness,
    Compliance,
    ReferentialIntegrity,
    Uniqueness,
    run_checks,
)


def _report(df, checks):
    return {
        r["constraint"]: (r["metric"], r["passed"])
        for r in run_checks(df, checks).collect()
    }


def test_completeness_and_null_predicate_compliance(spark):
    """NULLs fail completeness; a predicate evaluating to NULL (null
    operand) counts as NON-compliant, never silently compliant."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -5), (4, None)], "id long, v int"
    )
    rep = _report(
        df,
        [
            Completeness("v", threshold=0.8),
            Compliance("v_positive", F.col("v") > 0, threshold=0.25),
        ],
    )
    assert rep["completeness(v)"] == (0.5, False)
    # only id=1 complies; ids 2 and 4 have NULL predicates -> fail
    assert rep["compliance(v_positive)"] == (0.25, True)


def test_uniqueness_is_deequ_rows_occurring_once(spark):
    """uniqueness = rows whose key occurs exactly once / total rows —
    NOT distinct/total: [a, a, b] -> 1/3, not 2/3."""
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    rep = _report(df, [Uniqueness(("k",), threshold=0.5)])
    assert rep["uniqueness(k)"] == (0.3333, False)


def test_referential_integrity_counts_nulls_as_violations(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, fk int"
    )
    ref = spark.createDataFrame([(10,), (20,)], "pk int")
    rep = _report(
        df,
        [ReferentialIntegrity("fk", ref, ref_col="pk", ref_name="dim", threshold=0.3)],
    )
    assert rep["referential(fk in dim.pk)"] == (0.3333, True)


def test_scalar_checks_fuse_into_one_scan(spark):
    """N completeness/compliance checks = ONE scan of the table: the
    executed plan contains exactly one scan node and no exchange beyond
    the single-row aggregate."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("v")
    )
    out = run_checks(
        df,
        [
            Completeness("v"),
            Compliance("v_small", F.col("v") < 2, threshold=0.5),
            Compliance("v_nonneg", F.col("v") >= 0),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") + plan.count("Range (") == 1
    assert out.count() == 3


def test_empty_table_still_returns_one_verdict_per_constraint(spark):
    """Empty-table semantics: every constraint reports metric NULL +
    passed FALSE (a ratio over zero rows is undefined and never vouches
    for quality) — no NULL verdicts, no ANSI 0/0 error."""
    df = spark.createDataFrame([], "id long, v int")
    ref = spark.createDataFrame([(1,)], "k long")
    rep = _report(
        df,
        [
            Completeness("v"),
            Compliance("pos", F.col("v") > 0),
            Uniqueness(("id",)),
            ReferentialIntegrity("id", ref, ref_col="k", ref_name="dim"),
        ],
    )
    assert len(rep) == 4
    for metric, passed in rep.values():
        assert metric is None
        assert passed is False
