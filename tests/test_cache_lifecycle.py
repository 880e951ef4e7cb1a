"""Deterministic lifecycle of operator-internal caches.

The dedup/LSH operators persist shared intermediate frames (shingle
index, bucket frame, label checkpoints). In a long-lived session those
must be freed when the caller is done — not accumulate until they evict
each other. Contract under test:

- after collecting an operator's result and calling ``cache.release``
  on it, NO persisted RDD remains (``getPersistentRDDs`` empty);
- ``cache_scope`` frees everything adopted inside it on exit;
- the GC backstop frees caches when the result is garbage-collected;
- released results with intact lineage still recompute correctly.
"""

from __future__ import annotations

import gc

from tests.conftest import SF_DIR

import pyspark.sql.functions as F
import pytest

from automated_datastore_discovery_with_aws_glue_spark.operators import similarity
from automated_datastore_discovery_with_aws_glue_spark.operators.cache import (
    cache_scope,
    persistent_rdd_ids,
    release,
)
from automated_datastore_discovery_with_aws_glue_spark.operators.dedup import (
    dedup_canonical,
    dedup_clusters,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (2, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (3, "the quick brown fox jumps over the lazy cat again and again", "en"),
        (4, "completely unrelated text about spark query planning and shuffles", "en"),
        (5, "ein ganz anderer deutscher satz ohne jede ueberlappung", "de"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


@pytest.fixture()
def emb(spark):
    rows = [(i, [float((i * 7 + j) % 5) - 2.0 for j in range(8)], i % 2) for i in range(20)]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def _no_cached_rdds(spark):
    return persistent_rdd_ids(spark.sparkContext) == set()


@pytest.mark.parametrize(
    "make",
    [
        lambda docs, emb: jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.4),
        lambda docs, emb: minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.4),
        lambda docs, emb: simhash_pairs(docs, "doc_id", "text", "lang", max_hamming=10),
        lambda docs, emb: similarity.blocked_near_dup(
            emb, "vec_id", "embedding", "label", threshold=0.2
        ),
        lambda docs, emb: similarity.lsh_near_dup(
            emb, "vec_id", "embedding", threshold=0.2, n_bands=4, band_planes=2
        ),
    ],
    ids=["jaccard", "minhash_lsh", "simhash", "blocked", "lsh_near_dup"],
)
def test_release_leaves_no_cached_rdds(spark, docs, emb, make):
    assert _no_cached_rdds(spark), "leftover caches from another test"
    result = make(docs, emb)
    first = result.collect()
    assert persistent_rdd_ids(spark.sparkContext), "operator should cache while live"
    release(result)
    assert _no_cached_rdds(spark)
    # lineage is intact for persist-only operators: released frames
    # recompute (uncached) with identical results
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, first))


def test_cluster_pipeline_releases_checkpoints(spark, docs):
    assert _no_cached_rdds(spark)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.4)
    clusters = dedup_clusters(pairs, docs.select("doc_id"))
    got = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    assert got[1] == got[2] == got[3] == 1 and got[4] == 4 and got[5] == 5
    # superseded per-round checkpoints were dropped eagerly; only the
    # final round's blocks (backing the live result) may remain
    release(clusters)
    assert _no_cached_rdds(spark)


def test_canonical_releases_everything(spark, docs):
    assert _no_cached_rdds(spark)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.4)
    kept = dedup_canonical(docs, pairs, "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 4, 5]
    release(kept)
    assert _no_cached_rdds(spark)


def test_gc_backstop_frees_caches(spark, docs):
    assert _no_cached_rdds(spark)
    result = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.4)
    result.collect()
    assert persistent_rdd_ids(spark.sparkContext)
    del result
    gc.collect()
    assert _no_cached_rdds(spark)


def test_cache_scope_owns_and_frees(spark, docs):
    assert _no_cached_rdds(spark)
    with cache_scope():
        result = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.4)
        rows = result.collect()
        assert persistent_rdd_ids(spark.sparkContext)
        # release() inside a scope is a no-op: the scope owns the caches
        release(result)
        assert persistent_rdd_ids(spark.sparkContext)
        assert rows is not None
    assert _no_cached_rdds(spark)


def test_corpus_clean_releases(spark):
    from automated_datastore_discovery_with_aws_glue_spark.plans.llm_pipeline import corpus_clean

    assert _no_cached_rdds(spark)
    result = corpus_clean(spark, SF_DIR)
    rows = result.collect()
    assert len(rows) > 0
    release(result)
    assert _no_cached_rdds(spark)


def test_query_layer_entries_release(spark):
    """The bench/driver path: every headline dedup/LSH query's returned
    frame owns its operator caches — collect + release leaves the
    session clean."""
    import __spark_entry__ as entry

    queries = entry.queries()
    for name in [
        "dedup_ngram_jaccard",
        "dedup_clusters_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "emb_near_dup",
        "emb_near_dup_lsh",
        "corpus_prepare",
    ]:
        assert _no_cached_rdds(spark), f"dirty session before {name}"
        df = queries[name](spark, SF_DIR)
        df.collect()
        release(df)
        assert _no_cached_rdds(spark), f"{name} leaked caches after release"


def test_released_cluster_result_still_readable_before_release(spark, docs):
    """Order matters: collect-then-release is the contract. The collect
    must see checkpoint blocks alive even though the intermediate frames
    went out of scope inside the operator (carry keeps them pinned)."""
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.4)
    clusters = dedup_clusters(pairs, docs.select("doc_id"))
    gc.collect()  # would free the blocks if ownership weren't carried
    assert len(clusters.collect()) == 5
    release(clusters)
    assert _no_cached_rdds(spark)
