"""Versioned parquet state store + MERGE semantics unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from automated_datastore_discovery_with_aws_glue_spark.state.merge import merge_frames
from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetStateStore(spark, str(tmp_path))


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "val", "flag"])


def test_merge_insert_only_never_clobbers(spark):
    t = _df(spark, [("a", 1, False), ("b", 2, False)])
    s = _df(spark, [("b", 99, True), ("c", 3, True)])
    out = {r["id"]: (r["val"], r["flag"]) for r in merge_frames(t, s, "id").collect()}
    assert out == {"a": (1, False), "b": (2, False), "c": (3, True)}


def test_merge_update_only(spark):
    t = _df(spark, [("a", 1, False), ("b", 2, False)])
    s = _df(spark, [("b", 0, True), ("c", 0, True)])
    out = {
        r["id"]: (r["val"], r["flag"])
        for r in merge_frames(
            t, s, "id",
            set_on_match={"flag": F.lit(True), "val": F.col("src.val")},
            insert_not_matched=False,
        ).collect()
    }
    assert out == {"a": (1, False), "b": (0, True)}


def test_merge_missing_source_columns_null_filled(spark):
    t = _df(spark, [("a", 1, False)])
    s = spark.createDataFrame([("z",)], ["id"])
    out = {r["id"]: (r["val"], r["flag"]) for r in merge_frames(t, s, "id").collect()}
    assert out == {"a": (1, False), "z": (None, None)}


def test_store_versioning_and_vacuum(spark, store):
    store.init("t", _df(spark, [("a", 1, False)]))
    assert store.latest_version("t") == 1
    store.merge("t", _df(spark, [("b", 2, True)]), "id")
    assert store.latest_version("t") == 2
    assert store.read("t").count() == 2
    store.append("t", _df(spark, [("c", 3, True)]))
    assert store.read("t").count() == 3
    store.vacuum("t", keep=1)
    assert store.read("t").count() == 3  # latest survives


def test_store_merge_initializes_absent_table(spark, store):
    store.merge("fresh", _df(spark, [("a", 1, False)]), "id")
    assert store.read("fresh").count() == 1


def test_store_merge_idempotent_replay(spark, store):
    batch = _df(spark, [("a", 1, False)])
    store.merge("r", batch, "id")
    store.merge("r", batch, "id")
    store.merge("r", batch, "id")
    assert store.read("r").count() == 1
