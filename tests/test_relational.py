"""Every driver-contract query runs at sf0.001 with stable schema and
plausible results; a few hand-computed assertions on tiny frames."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns, name
    assert isinstance(rows, list)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert len(df.collect()) > 0


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)


def test_j4_first_match_is_global_max(spark):
    row = entrymod.queries()["j4_first_match"](spark, SF_DIR).collect()[0]
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

    mx = load_table(spark, SF_DIR, "supplier").agg({"s_acctbal": "max"}).collect()[0][0]
    assert abs(row["s_acctbal"] - round(mx, 2)) < 1e-9


def test_j1_latest_matches_a1_argmax(spark):
    j1 = {
        (r["user_id"], r["ts_str"])
        for r in entrymod.queries()["j1_latest_per_key"](spark, SF_DIR).collect()
    }
    a1 = {
        (r["user_id"], r["latest_ts"])
        for r in entrymod.queries()["a1_argmax_group"](spark, SF_DIR).collect()
    }
    assert j1 == a1
