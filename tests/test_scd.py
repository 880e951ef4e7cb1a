"""SCD Type-2 semantics (`state/scd.py`) on engineered micro-fixtures —
the sf0.01 oracle run proves engine-vs-DuckDB equality; these prove the
version-chain semantics a warehouse user expects (no-op suppression,
in-batch chains, closed-history pass-through, new keys)."""

from __future__ import annotations

import datetime as dt

from automated_datastore_discovery_with_aws_glue_spark.state.scd import scd2_apply

D = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731

_DIM_SCHEMA = (
    "k long, segment string, valid_from timestamp, valid_to timestamp,"
    " is_current boolean"
)
_CH_SCHEMA = "k long, segment string, ts timestamp"


def _apply(spark, dim_rows, ch_rows):
    dim = spark.createDataFrame(dim_rows, _DIM_SCHEMA)
    ch = spark.createDataFrame(ch_rows, _CH_SCHEMA)
    out = scd2_apply(dim, ch, "k", ["segment"]).collect()
    return sorted(
        ((r["k"], r["segment"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out),
        key=lambda t: (t[0], t[2]),
    )


def test_scd2_change_closes_current_and_opens_new(spark):
    got = _apply(
        spark,
        [(1, "A", D("2024-01-01"), None, True)],
        [(1, "B", D("2024-02-01"))],
    )
    assert got == [
        (1, "A", D("2024-01-01"), D("2024-02-01"), False),
        (1, "B", D("2024-02-01"), None, True),
    ]


def test_scd2_noop_change_is_suppressed(spark):
    """Re-stating the current attributes creates NO new version — and a
    run of equal changes collapses to nothing."""
    got = _apply(
        spark,
        [(1, "A", D("2024-01-01"), None, True)],
        [(1, "A", D("2024-02-01")), (1, "A", D("2024-03-01"))],
    )
    assert got == [(1, "A", D("2024-01-01"), None, True)]


def test_scd2_in_batch_chain_and_interleaved_noop(spark):
    """A->B->B->C in one batch: the duplicate B is collapsed, B's
    valid_to is C's ts, C is current."""
    got = _apply(
        spark,
        [(1, "A", D("2024-01-01"), None, True)],
        [
            (1, "B", D("2024-02-01")),
            (1, "B", D("2024-02-10")),
            (1, "C", D("2024-03-01")),
        ],
    )
    assert got == [
        (1, "A", D("2024-01-01"), D("2024-02-01"), False),
        (1, "B", D("2024-02-01"), D("2024-03-01"), False),
        (1, "C", D("2024-03-01"), None, True),
    ]


def test_scd2_closed_history_passes_through_and_new_key_opens(spark):
    got = _apply(
        spark,
        [
            (1, "OLD", D("2023-01-01"), D("2024-01-01"), False),
            (1, "A", D("2024-01-01"), None, True),
        ],
        [(2, "NEW", D("2024-02-15"))],
    )
    assert got == [
        (1, "OLD", D("2023-01-01"), D("2024-01-01"), False),
        (1, "A", D("2024-01-01"), None, True),
        (2, "NEW", D("2024-02-15"), None, True),
    ]


def test_scd2_one_exchange_for_both_windows(spark):
    """The lag (no-op collapse) and lead (valid_to) windows share one
    partitioning+sort — the plan contains exactly one Exchange for the
    chain (scale property: one shuffle on the key)."""
    dim = spark.createDataFrame(
        [(1, "A", D("2024-01-01"), None, True)], _DIM_SCHEMA
    )
    ch = spark.createDataFrame([(1, "B", D("2024-02-01"))], _CH_SCHEMA)
    plan = (
        scd2_apply(dim, ch, "k", ["segment"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
