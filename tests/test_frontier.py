"""Persisted crawl frontier (`state/frontier.py`): O(batch) seen-set
ingest, replay protection, partition-pruned membership, and the
generic `discover_frontier` operator it rides on."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from automated_datastore_discovery_with_aws_glue_spark.operators import web as W
from automated_datastore_discovery_with_aws_glue_spark.state.frontier import CrawlFrontier


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html"])


def test_discover_frontier_operator(spark):
    rows = [
        # two pages referencing the same target -> n_refs = 2; one
        # nofollow ref must NOT count; base-href page resolves its
        # relative anchor onto the base host
        ("https://a.example/p1", '<a href="/t">x</a> <a href="https://b.example/q">y</a>'),
        ("https://a.example/p2", '<a href="/t">x</a> <a rel="nofollow" href="/spam">z</a>'),
        ("https://a.example/p3", '<base href="https://cdn.example/m/"><a href="f">g</a>'),
        ("https://a.example/p4", "<p>nothing here</p>"),
    ]
    out = {
        r["url"]: (r["host"], r["n_refs"])
        for r in W.discover_frontier(_pages(spark, rows), "url", "html").collect()
    }
    assert out == {
        "https://a.example/t": ("a.example", 2),
        "https://b.example/q": ("b.example", 1),
        "https://cdn.example/m/f": ("cdn.example", 1),
    }


def test_frontier_two_batch_ingest_and_replay(spark, tmp_path):
    fr = CrawlFrontier(spark, str(tmp_path / "fr"), partitions=8)
    fr.seed(spark.createDataFrame([("https://a.example/seeded",)], ["url"]))
    b1 = _pages(
        spark,
        [
            ("https://a.example/p1", '<a href="/one">1</a> <a href="/seeded">s</a>'),
            ("https://a.example/p2", '<a href="/one">1</a> <a href="/two">2</a>'),
        ],
    )
    out1 = {r["url"]: r for r in fr.ingest(b1).collect()}
    # the seeded URL is not new; /one dedups within the batch with count 2
    assert set(out1) == {"https://a.example/one", "https://a.example/two"}
    assert out1["https://a.example/one"]["n_refs"] == 2
    assert all(r["batch_id"] == 1 for r in out1.values())
    # batch 2: one known URL (from batch 1), one genuinely new
    b2 = _pages(
        spark,
        [("https://a.example/p3", '<a href="/one">k</a> <a href="/three">3</a>')],
    )
    out2 = [r["url"] for r in fr.ingest(b2).collect()]
    assert out2 == ["https://a.example/three"]
    # state after both batches: seeds + all discovered
    assert {r["url"] for r in fr.seen_urls().collect()} == {
        "https://a.example/seeded",
        "https://a.example/one",
        "https://a.example/two",
        "https://a.example/three",
    }
    assert fr.last_batch_id() == 2
    # replaying an already-committed batch id is a no-op: empty result,
    # no new versions, watermark unchanged
    v = fr.store.latest_version("frontier_seen")
    assert fr.ingest(b2, batch_id=2).count() == 0
    assert fr.store.latest_version("frontier_seen") == v
    assert fr.last_batch_id() == 2
    # the log records which batch first surfaced each URL
    log = {r["url"]: r["batch_id"] for r in fr.log().collect()}
    assert log["https://a.example/one"] == 1
    assert log["https://a.example/three"] == 2


def test_frontier_matches_one_shot_discovery(spark, tmp_path):
    # cross-batch union of new slices == one-shot discover over the
    # full page set minus the seed (the lifecycle == batch contract the
    # incr_* family pins)
    rows = [
        (f"https://h{i % 3}.example/p{i}",
         f'<a href="/x{i % 7}">a</a> <a href="https://h{(i + 1) % 3}.example/y{i % 5}">b</a>')
        for i in range(40)
    ]
    seed = ["https://h0.example/x0", "https://h1.example/y1"]
    fr = CrawlFrontier(spark, str(tmp_path / "fr2"), partitions=8)
    fr.seed(spark.createDataFrame([(u,) for u in seed], ["url"]))
    got = set()
    for lo, hi in ((0, 20), (20, 40)):
        batch = _pages(spark, rows[lo:hi])
        got |= {r["url"] for r in fr.ingest(batch).collect()}
    oneshot = {
        r["url"]
        for r in W.discover_frontier(_pages(spark, rows), "url", "html").collect()
    } - set(seed)
    assert got == oneshot


def test_frontier_probe_prunes_partitions(spark, tmp_path):
    fr = CrawlFrontier(spark, str(tmp_path / "fr3"), partitions=16)
    fr.seed(
        spark.createDataFrame(
            [(f"https://s.example/u{i}",) for i in range(200)], ["url"]
        )
    )
    # a one-URL probe touches ONE pt range of the stored side
    pts = [
        r[0]
        for r in spark.createDataFrame([("https://s.example/u7",)], ["url"])
        .select(F.pmod(F.xxhash64("url"), F.lit(16)).cast("int"))
        .collect()
    ]
    plan = (
        fr.store.read("frontier_seen")
        .filter(F.col("pt").isin(pts))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and ("pt" in m.group(1)), plan


def test_frontier_layout_pinned(spark, tmp_path):
    root = str(tmp_path / "fr4")
    CrawlFrontier(spark, root, partitions=8)
    with pytest.raises(ValueError, match="immutable"):
        CrawlFrontier(spark, root, partitions=4)


def test_frontier_unseeded_is_loud(spark, tmp_path):
    fr = CrawlFrontier(spark, str(tmp_path / "fr5"))
    with pytest.raises(FileNotFoundError, match="seed"):
        fr.ingest(_pages(spark, [("https://a.example/p", "<p>x</p>")]))
