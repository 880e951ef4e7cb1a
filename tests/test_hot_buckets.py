"""Hot-bucket accounting + routing (operators/hot.py).

A boilerplate-degenerate corpus collapses into one (band, bucket) group;
``max_bucket`` must never lose pairs SILENTLY: ``on_hot='drop'`` logs the
dropped group/row counts, ``on_hot='route'`` recovers the component via
star candidates to the group's min-id representative at O(B) cost.
"""

from __future__ import annotations

import logging

import pytest

from automated_datastore_discovery_with_aws_glue_spark.operators.cache import release
from automated_datastore_discovery_with_aws_glue_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
    simhash_pairs,
)
from automated_datastore_discovery_with_aws_glue_spark.operators.similarity import lsh_near_dup

BOILER = "subscribe to our newsletter for updates and follow us on social media today"


def _await_warnings(caplog, needle: str, timeout: float = 10.0) -> list[str]:
    """The default ``account='observe'`` mode logs from a daemon thread
    after the caller's action — poll briefly instead of asserting
    immediately."""
    import time

    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        msgs = [r.getMessage() for r in caplog.records if needle in r.getMessage()]
        if msgs:
            return msgs
        time.sleep(0.05)
    return []


@pytest.fixture()
def boiler_docs(spark):
    rows = [(i, BOILER, "en") for i in range(12)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


@pytest.fixture()
def const_emb(spark):
    rows = [(i, [1.0, 0.5, -0.25, 2.0]) for i in range(12)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_drop_policy_accounts_for_dropped_buckets(spark, const_emb, caplog):
    with caplog.at_level(logging.WARNING, logger="automated_datastore_discovery_with_aws_glue_spark.operators.hot"):
        pairs = lsh_near_dup(
            const_emb, "vec_id", "embedding",
            threshold=0.9, n_bands=2, band_planes=2, max_bucket=5,
        )
        got = pairs.collect()
        warnings = _await_warnings(caplog, "hot bucket")
        release(pairs)
    assert got == []  # capped: identical embeddings dropped from candidates
    assert warnings, "dropping hot buckets must be logged, never silent"
    assert "max_bucket=5" in warnings[0] and "policy=drop" in warnings[0]


def test_route_policy_recovers_component_linear(spark, const_emb):
    pairs = lsh_near_dup(
        const_emb, "vec_id", "embedding",
        threshold=0.9, n_bands=2, band_planes=2, max_bucket=5, on_hot="route",
    )
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    # star routing: every member pairs with the min id — O(B), not O(B^2)
    assert got == [(0, i) for i in range(1, 12)]
    assert all(r["similarity"] == 1.0 for r in pairs.collect())
    clusters = dedup_clusters(pairs, const_emb.select("vec_id"))
    labels = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    assert set(labels.values()) == {0}  # one component, nothing lost
    release(clusters)


def test_route_policy_minhash(spark, boiler_docs):
    dropped = minhash_lsh_pairs(boiler_docs, "doc_id", "text", threshold=0.5, max_bucket=5)
    routed = minhash_lsh_pairs(
        boiler_docs, "doc_id", "text", threshold=0.5, max_bucket=5, on_hot="route"
    )
    assert dropped.count() == 0
    got = sorted((r["id_a"], r["id_b"]) for r in routed.collect())
    assert got == [(0, i) for i in range(1, 12)]
    release(dropped)
    release(routed)


def test_route_policy_simhash_carries_rep_sketch(spark, boiler_docs):
    routed = simhash_pairs(
        boiler_docs, "doc_id", "text", "lang",
        max_hamming=3, max_bucket=5, on_hot="route",
    )
    rows = routed.collect()
    assert sorted((r["id_a"], r["id_b"]) for r in rows) == [(0, i) for i in range(1, 12)]
    assert all(r["hamming"] == 0 for r in rows)  # identical sketches
    release(routed)


def test_bad_policy_rejected(spark, boiler_docs):
    with pytest.raises(ValueError, match="on_hot"):
        minhash_lsh_pairs(boiler_docs, "doc_id", "text", max_bucket=5, on_hot="nope")


def test_blocked_near_dup_max_block_drop(spark, const_emb, caplog):
    """The exact verifier's degenerate-block guard: an over-cap caller
    block leaves the all-pairs self-join, logged — never silent."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.similarity import blocked_near_dup

    emb = const_emb.withColumn("label", const_emb.vec_id % 1)  # one block of 12
    with caplog.at_level(logging.WARNING, logger="automated_datastore_discovery_with_aws_glue_spark.operators.hot"):
        pairs = blocked_near_dup(
            emb, "vec_id", "embedding", "label", threshold=0.9, max_block=5
        )
        got = pairs.collect()
        warnings = _await_warnings(caplog, "hot bucket")
        release(pairs)
    assert got == []
    assert warnings and "blocked_near_dup" in warnings[0]


def test_blocked_near_dup_max_block_route(spark, const_emb):
    """Routing keeps a capped block connected at O(B): every member pairs
    with the min-id representative, cosine-verified."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.similarity import blocked_near_dup

    emb = const_emb.withColumn("label", const_emb.vec_id % 1)
    pairs = blocked_near_dup(
        emb, "vec_id", "embedding", "label", threshold=0.9, max_block=5, on_hot="route"
    )
    rows = pairs.collect()
    assert sorted((r["id_a"], r["id_b"]) for r in rows) == [(0, i) for i in range(1, 12)]
    assert all(r["similarity"] == 1.0 for r in rows)
    clusters = dedup_clusters(pairs, emb.select("vec_id"))
    assert {r["cluster_id"] for r in clusters.collect()} == {0}
    release(clusters)


def test_blocked_near_dup_cap_spares_normal_blocks(spark):
    """Mixed blocks: the cap removes only the degenerate block's pairs."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.similarity import blocked_near_dup

    rows = [(i, [1.0, 0.0, 0.0, 0.0], "hot") for i in range(8)] + [
        (100, [0.0, 1.0, 0.0, 0.0], "ok"),
        (101, [0.0, 1.0, 0.0, 0.0], "ok"),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    pairs = blocked_near_dup(
        emb, "vec_id", "embedding", "label", threshold=0.9, max_block=4
    )
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == [(100, 101)]
    release(pairs)


def test_cap_does_not_disturb_normal_buckets(spark):
    """Mixed corpus: a hot boilerplate group under the cap policy must
    not affect pairs found in healthy buckets."""
    rows = [(i, BOILER, "en") for i in range(8)] + [
        (100, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (101, "the quick brown fox jumps over the lazy dog again and again", "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5, max_bucket=4)
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert (100, 101) in got
    assert not [p for p in got if p[0] < 100]  # boilerplate dropped by cap
    release(pairs)


def test_async_accounting_does_not_block_construction(spark, boiler_docs, caplog):
    """The default account='async' mode: the probe runs on a daemon
    thread (its job both logs the account and pre-populates the sizes
    cache the action reuses) — construction never blocks on a job, and
    the warning still fires with counts."""
    with caplog.at_level(logging.WARNING, logger="automated_datastore_discovery_with_aws_glue_spark.operators.hot"):
        pairs = minhash_lsh_pairs(
            boiler_docs, "doc_id", "text", threshold=0.5, max_bucket=5
        )
        assert pairs.collect() == []
        warnings = _await_warnings(caplog, "hot bucket")
        release(pairs)
    assert warnings, "async accounting must still surface the drop"
    assert "192 rows" in warnings[0] and "max_bucket=5" in warnings[0]  # 12 docs x 16 bands
