"""Incremental IVF vector index (`operators/ann.py`): build-vs-ingest
assignment parity, O(batch) append through the versioned store,
partition-pruned probes, replay guard, and the immutable-layout meta."""

from __future__ import annotations

import re

import numpy as np
import pyspark.sql.functions as F
import pytest

from automated_datastore_discovery_with_aws_glue_spark.operators.ann import IvfVectorIndex
from automated_datastore_discovery_with_aws_glue_spark.operators.similarity import brute_force_topk


def _corpus(spark, n=120, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)]
    rows.append((n, [0.0] * dim))  # a zero vector must not poison anything
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows


def test_build_then_ingest_equals_one_shot(spark, tmp_path):
    """Splitting the corpus into build + two ingests stores EXACTLY the
    rows a single build-plus-one-ingest stores (same centroids — both
    train on the same build slice — and the stored integer quantizer
    makes assignment deterministic across sessions)."""
    df, _rows = _corpus(spark)
    p1 = df.filter(F.col("vec_id") % 3 == 0)
    p2 = df.filter(F.col("vec_id") % 3 == 1)
    p3 = df.filter(F.col("vec_id") % 3 == 2)

    a = IvfVectorIndex(spark, str(tmp_path / "a"), n_cells=4, iterations=2)
    a.build(p1)
    a.ingest(p2)
    a.ingest(p3)

    b = IvfVectorIndex(spark, str(tmp_path / "b"), n_cells=4, iterations=2)
    b.build(p1)
    b.ingest(p2.unionByName(p3))

    assert a.centroids_int() == b.centroids_int()

    def content(ix):
        return {
            (r["vec_id"], r["_cell"]) for r in ix.vectors().select("vec_id", "_cell").collect()
        }

    assert content(a) == content(b)
    assert len(content(a)) == df.count()

    # a REOPENED handle (fresh object, same root) assigns identically
    a2 = IvfVectorIndex(spark, str(tmp_path / "a"), n_cells=4, iterations=2)
    assert a2.centroids_int() == a.centroids_int()


def test_ingest_is_o_batch_and_replay_guarded(spark, tmp_path):
    """Each ingest writes only the batch through Spark (prior files
    hard-linked by the store), and re-delivering an applied batch_id
    no-ops."""
    df, _rows = _corpus(spark, n=60)
    ix = IvfVectorIndex(spark, str(tmp_path / "ix"), n_cells=4, iterations=1)
    ix.build(df.filter(F.col("vec_id") < 30))
    batch = df.filter((F.col("vec_id") >= 30) & (F.col("vec_id") < 45))
    ix.ingest(batch, batch_id=1)
    n = ix.vectors().count()
    ix.ingest(batch, batch_id=1)  # replay: must not double
    assert ix.vectors().count() == n
    ix.ingest(df.filter(F.col("vec_id") >= 45), batch_id=2)
    assert ix.vectors().count() == df.count()


def test_topk_prunes_partitions_and_tracks_brute_force(spark, tmp_path):
    """The probe plans _cell IN (...) as a PartitionFilter (only probed
    cell directories are listed) and, probing half the cells on a
    spread-out corpus, finds the exact top hit and most of the top-k."""
    df, rows = _corpus(spark, n=200, dim=8)
    ix = IvfVectorIndex(spark, str(tmp_path / "ix"), n_cells=4, iterations=2)
    ix.build(df.filter(F.col("vec_id") < 150))
    ix.ingest(df.filter(F.col("vec_id") >= 150))

    q = rows[7][1]
    top = ix.topk(q, 5, n_probe=2)
    plan = top._sc._jvm.PythonSQLUtils.explainString(
        top._jdf.queryExecution(), "formatted"
    )
    assert re.search(r"PartitionFilters: \[.*_cell#\d+ (IN|INSET)", plan), plan

    got = [r["vec_id"] for r in top.collect()]
    assert got[0] == 7  # self is always in the probed cell
    # brute_force_topk scores every row — feed it the non-zero corpus
    # (cosine of a zero vector is an ANSI divide-by-zero by design)
    exact = {
        r["vec_id"]
        for r in brute_force_topk(
            df.filter(F.col("vec_id") != 200), "embedding", q, 5
        ).collect()
    }
    assert len(exact & set(got)) >= 3

    # the zero vector is stored (assignment total) but never scored
    assert 200 in {r["vec_id"] for r in ix.vectors().select("vec_id").collect()}
    assert 200 not in {r["vec_id"] for r in ix.topk(q, 500, n_probe=4).collect()}


def test_meta_guard_rejects_layout_change(spark, tmp_path):
    df, _rows = _corpus(spark, n=30)
    ix = IvfVectorIndex(spark, str(tmp_path / "ix"), n_cells=4)
    ix.build(df)
    with pytest.raises(ValueError, match="immutable"):
        IvfVectorIndex(spark, str(tmp_path / "ix"), n_cells=8)


def test_build_rejects_unusable_corpus(spark, tmp_path):
    zeros = spark.createDataFrame(
        [(i, [0.0, 0.0]) for i in range(5)], ["vec_id", "embedding"]
    )
    ix = IvfVectorIndex(spark, str(tmp_path / "ix"), n_cells=2)
    with pytest.raises(ValueError, match="non-zero"):
        ix.build(zeros)
