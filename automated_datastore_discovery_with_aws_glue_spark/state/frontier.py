"""Persisted crawl frontier — the recurring-cost half of the crawl
cycle.

The crawl-cycle capstone (``plans/web_pipeline.corpus_crawl_cycle``)
decides ONE batch of fetched pages end-to-end; a real crawler runs that
loop forever, and the number that must stay O(batch) as the crawl grows
is the per-batch frontier update: "which of this batch's discovered
URLs has the crawl NEVER seen?" against a seen-set that is billions of
rows at 100 TB. :class:`CrawlFrontier` persists that seen-set in the
versioned state store (`state/store.py` — hard-linked O(batch)
appends, CAS commits) and answers each batch with scans, never
shuffles, of the stored side:

- ``seen``: ``(pt, url)`` — every canonical URL ever seeded or
  discovered, hash-range-partitioned on ``pt = pmod(xxhash64(url),
  partitions)`` so a small probe (a streaming micro-batch, a single
  host's recrawl) prunes to the partition ranges it actually touches
  (PartitionFilter, plan-asserted in pytest);
- ``log``: ``(batch_id, url, host, n_refs)`` — the append-only
  discovery log (which batch first surfaced each URL, with its
  in-batch discovery count).

Per-batch shape (:meth:`ingest`): anchor extraction + base-href
resolution + canonicalization are the map-side
``operators/web.discover_frontier`` composition; the batch then dedups
on the canonical URL (ONE batch-scale shuffle); membership against
``seen`` is decided by broadcasting the batch's URL set at the pruned
stored side (a semi-join SCAN of the index — the stored side never
shuffles), and only the resulting hit set (bounded by the batch) is
broadcast back for the anti-join. New URLs append to both tables at
O(batch) cost with the batch-id watermark committed atomically in the
version's meta — a replayed batch observes its own watermark and
appends nothing (the at-least-once upstream, exactly-once effect
contract the streaming family pins).

Reference analogue: the tracker table's recrawl discipline
(``lambda/s3-trigger/app.py`` — skip objects whose fingerprint the
state table already holds); here the "fingerprint" is the canonical
URL and the state table is partition-pruned instead of key-value.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.operators import web as W
from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore

_SEEN = "frontier_seen"
_LOG = "frontier_log"


class CrawlFrontier:
    """A persisted, partition-pruned crawl seen-set with O(batch)
    ingest. ``partitions`` is part of the stored layout (a different
    modulus would mis-prune) — pinned by a meta sidecar at creation,
    loud on mismatch."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        partitions: int = 16,
        commit_backend=None,
    ):
        self.spark = spark
        self.root = root
        self.partitions = partitions
        self.store = ParquetStateStore(spark, root, commit_backend=commit_backend)
        self._check_or_write_meta()

    def _check_or_write_meta(self) -> None:
        meta_path = os.path.join(self.root, "frontier_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                stored = json.load(fh)
            if stored.get("partitions") != self.partitions:
                raise ValueError(
                    f"CrawlFrontier at {self.root} was created with "
                    f"partitions={stored.get('partitions')} but reopened with "
                    f"{self.partitions}; the partition layout is immutable"
                )
            return
        os.makedirs(self.root, exist_ok=True)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"partitions": self.partitions}, fh)
        os.replace(tmp, meta_path)

    def _pt(self, url: F.Column) -> F.Column:
        return F.pmod(F.xxhash64(url), F.lit(self.partitions)).cast("int")

    # -- state views --------------------------------------------------------

    def seen_urls(self) -> DataFrame:
        """Snapshot of every URL the crawl has seen (seeded or
        discovered)."""
        return self.store.read(_SEEN).select("url")

    def log(self) -> DataFrame:
        """The append-only discovery log: (batch_id, url, host, n_refs)."""
        return self.store.read(_LOG)

    def last_batch_id(self) -> int:
        """The committed batch-id watermark (0 before any ingest)."""
        if not self.store.exists(_SEEN):
            return 0
        return int(self.store.table_meta(_SEEN).get("batch_id", 0))

    # -- lifecycle ----------------------------------------------------------

    def seed(self, urls: DataFrame, url_col: str = "url") -> None:
        """Initialize the seen-set with already-crawled canonical URLs
        (idempotent layout: one row per URL)."""
        u = F.col(url_col)
        df = (
            urls.select(u.alias("url"))
            .filter(F.col("url").isNotNull())
            .distinct()
            .select(self._pt(F.col("url")).alias("pt"), "url")
        )
        self.store.init(_SEEN, df, partition_by="pt")
        self.store.init(
            _LOG,
            self.spark.createDataFrame(
                [], "batch_id int, url string, host string, n_refs bigint"
            ),
        )

    def ingest(
        self,
        pages: DataFrame,
        url_col: str = "url",
        html_col: str = "html",
        *,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Discover this batch's NEW frontier and commit it: returns
        ``(batch_id, url, host, n_refs)`` — the URLs this batch
        surfaced that the crawl had never seen. ``batch_id`` defaults
        to the committed watermark + 1; re-ingesting an already
        committed batch id is a no-op returning an empty frame (replay
        protection — the upstream is at-least-once)."""
        if not self.store.exists(_SEEN):
            raise FileNotFoundError(
                f"CrawlFrontier at {self.root} is not seeded — call seed() first"
            )
        expect = self.store.latest_version(_SEEN)
        last = self.last_batch_id()
        bid = last + 1 if batch_id is None else batch_id
        schema = "batch_id int, url string, host string, n_refs bigint"
        if bid <= last:
            return self.spark.createDataFrame([], schema)

        cand = W.discover_frontier(pages, url_col, html_col)
        # the batch feeds the pt-prune collect, the membership probe,
        # and the final anti-join — persist so the extraction runs once
        cand = cand.persist()
        try:
            # partition prune: the batch's pt set is bounded by the
            # layout modulus (metadata-scale collect, ≤ partitions rows)
            pts = [
                r["pt"]
                for r in cand.select(self._pt(F.col("url")).alias("pt"))
                .distinct()
                .collect()
            ]
            if pts:
                seen = self.store.read(_SEEN).filter(F.col("pt").isin(pts))
                # membership by scanning the PRUNED stored side against the
                # broadcast batch (stored side never shuffles); the hit set
                # is bounded by the batch, so IT broadcasts for the anti-join
                hits = seen.join(
                    F.broadcast(cand.select("url")), "url", "leftsemi"
                ).select("url")
                new = cand.join(F.broadcast(hits), "url", "left_anti")
            else:
                new = cand
            out = new.select(
                F.lit(bid).cast("int").alias("batch_id"),
                "url",
                "host",
                "n_refs",
            ).localCheckpoint()
        finally:
            cand.unpersist()
        # O(batch) hard-linked appends; the watermark commits atomically
        # with the seen rows (CAS on the version the decision derived
        # from — a concurrent ingest loses loudly, never silently).
        # repartition on the partition column first or the write emits
        # tasks x partitions tiny files (store gotcha): unrepartitioned,
        # a 32-task batch wrote ~460 files into 16 dirs and every later
        # append re-linked all of them
        # ONE two-table ingest: both staged writes run concurrently;
        # the pointer flips stay _SEEN-before-_LOG (the watermark in
        # _SEEN's meta is the replay guard, so it must land first)
        self.store.append_many(
            [
                {
                    "table": _SEEN,
                    "df": out.select(
                        self._pt(F.col("url")).alias("pt"), "url"
                    ).repartition("pt"),
                    "partition_by": "pt",
                    "expect": expect,
                    "meta": {"batch_id": bid},
                },
                {"table": _LOG, "df": out},
            ]
        )
        return out
