"""Incremental corpus dedup — near-dup maintenance for a GROWING corpus.

The single largest recurring cost of a 100 TB training-data pipeline is
NOT the first dedup, it is the daily one: a 1% delta must not trigger a
full-corpus re-dedup. :class:`CorpusDedupIndex` persists the two frames
the MinHash-LSH operator family already computes —

- ``buckets``: (band, bucket, id) of every KEPT document — the LSH
  candidate index;
- ``docs``: (id, hs, sz) hashed shingles of every kept document — the
  exact-verification side (fixed-width longs, never text);

— in the versioned state store, and :meth:`ingest` dedups each new batch
against itself AND the index at O(batch + candidates) compute:

1. the batch's shingles/signatures/bucket keys compute map-side (the
   same expressions as ``minhash_lsh_pairs``);
2. new-new candidates come from the batch's own band self-join;
   new-old candidates from joining the BROADCAST batch buckets against
   the stored bucket index — a columnar scan of the index, never a
   shuffle of it;
3. exact-Jaccard verification touches candidates only (old shingles
   fetched by broadcasting the candidate id set against the docs
   table — again a scan, not a shuffle);
4. within-batch survivors follow the batch operators' canonical
   semantics (connected components of verified pairs -> min id), then
   anything verifying against an indexed doc drops;
5. survivors' buckets + shingles APPEND to the state tables (O(batch),
   hard-linked versions).

Semantics vs a one-shot batch dedup of the full corpus: identical
whenever document ids increase with arrival order (first-arrived ==
global-min canonical), EXCEPT that published canonicals are IMMUTABLE —
a new document that near-dups two previously-separate canonicals drops,
but does not retroactively merge them (you do not retract training data
already shipped; the batch operators remain the backfill path when a
global re-canonicalization is actually wanted). Both properties are
pinned in tests.

Scale notes: the per-batch cost is one columnar scan of each state
table plus candidate-bounded joins. At very large corpus scale,
bucket-range-partition the index table so the scan prunes to the
buckets the batch actually probes, and put the hot-bucket valve
(``operators/hot.py``) on the stored-side join — both are layout
changes behind this same API.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from automated_datastore_discovery_with_aws_glue_spark.operators.cache import release
from automated_datastore_discovery_with_aws_glue_spark.operators.dedup import (
    _hashed_shingle_frame,
    _signature_expr,
    dedup_clusters,
)
from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore

BUCKETS = "lsh_buckets"
DOCS = "kept_docs"
EMITTED = "emitted_ids"


class CorpusDedupIndex:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        threshold: float = 0.5,
        commit_backend=None,
    ):
        self.spark = spark
        self.store = ParquetStateStore(spark, root, commit_backend=commit_backend)
        self.n, self.num_hashes, self.bands = n, num_hashes, bands
        self.threshold = threshold

    # -- internals ---------------------------------------------------------

    def _banded(self, sigs: DataFrame) -> DataFrame:
        rows = self.num_hashes // self.bands
        return sigs.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(self.bands - 1)),
                    lambda bandix: F.struct(
                        bandix.cast("int").alias("band"),
                        F.xxhash64(
                            F.slice("signature", bandix * rows + 1, rows)
                        ).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        ).select("id", "bb.band", "bb.bucket")

    def _verified(self, cand: DataFrame, left: DataFrame, right: DataFrame) -> DataFrame:
        """Exact-Jaccard filter of (id_a, id_b) candidates; ``left`` /
        ``right`` provide (id, hs, sz) for each side."""
        inter = F.size(F.array_intersect("hs_a", "hs_b"))
        union = F.col("sz_a") + F.col("sz_b") - inter
        num = int(round(self.threshold * 10000))
        return (
            cand.join(
                left.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a")),
                "id_a",
            )
            .join(
                right.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b")),
                "id_b",
            )
            .filter(inter * 10000 >= F.lit(num) * union)
            .select("id_a", "id_b")
        )

    # -- API ---------------------------------------------------------------

    def ingest(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
        """Dedup ``docs`` against itself and the index; append survivors
        to the index; return the surviving subset of ``docs`` (original
        columns). Each call is one state version per table — replay a
        failed batch idempotently by re-running it against the prior
        version (ids already indexed dedup to nothing... they ARE their
        own near-dups — exact re-ingest of indexed ids is therefore
        filtered up front).

        Contracts: (1) ids are immutable document identities — a replayed
        id with DIFFERENT text is treated as a replay and dropped, not a
        correction (route corrections through a new id); (2) the batch
        side is broadcast against the index scans, which assumes
        batch << corpus (the delta shape) — a bulk load approaching
        corpus size should go through the batch operators instead."""
        base = _hashed_shingle_frame(docs, id_col, text_col, self.n).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        sigs = base.select("id", _signature_expr(F.col("hs"), self.num_hashes).alias("signature"))
        banded = self._banded(sigs).persist(StorageLevel.MEMORY_AND_DISK)

        have_index = self.store.exists(BUCKETS)
        if have_index:
            stored_docs = self.store.read(DOCS)
            # exact replays (id already indexed) drop before anything else
            indexed_ids = stored_docs.select(F.col("id").alias("_known"))
            base_new = base.join(
                indexed_ids, base["id"] == F.col("_known"), "left_anti"
            ).persist(StorageLevel.MEMORY_AND_DISK)
            banded_new = banded.join(
                indexed_ids, banded["id"] == F.col("_known"), "left_anti"
            )
        else:
            base_new, banded_new = base, banded

        # within-batch: self-join candidates -> verify -> components ->
        # min-id canonical (the batch operators' semantics)
        nn_cand = (
            banded_new.alias("l")
            .join(banded_new.alias("r"), ["band", "bucket"])
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
        )
        nn_pairs = self._verified(nn_cand, base_new, base_new)
        clusters = dedup_clusters(nn_pairs, base_new.select("id"))
        batch_keep = (
            clusters.groupBy("cluster_id")
            .agg(F.min("id").alias("id"))
            .select("id")
        )

        if have_index:
            # new-old candidates: BROADCAST the batch's bucket keys
            # against the stored index (columnar scan, no index shuffle)
            stored_buckets = self.store.read(BUCKETS)
            keep_banded = banded_new.join(batch_keep, "id")
            no_cand = (
                stored_buckets.alias("o")
                .join(
                    F.broadcast(keep_banded.alias("nw")),
                    ["band", "bucket"],
                )
                .select(F.col("nw.id").alias("id_a"), F.col("o.id").alias("id_b"))
                .distinct()
            )
            # old shingles: broadcast the candidate old-id set at the
            # docs-table scan
            old_ids = no_cand.select(F.col("id_b").alias("id")).distinct()
            old_side = stored_docs.join(F.broadcast(old_ids), "id")
            dup_vs_index = self._verified(no_cand, base_new, old_side).select(
                F.col("id_a").alias("id")
            ).distinct()
            final_keep = batch_keep.join(dup_vs_index, "id", "left_anti")
        else:
            final_keep = batch_keep

        final_keep = final_keep.persist(StorageLevel.MEMORY_AND_DISK)
        n_kept = final_keep.count()  # pins the keep set before state writes
        if n_kept:
            # Commit-order invariant: BUCKETS strictly BEFORE DOCS. The
            # replay filter keys on DOCS membership, so a crash in the
            # window between the two appends leaves BUCKETS-only rows for
            # the batch; the replay then reprocesses those ids (not yet in
            # DOCS) and the stale bucket rows are benign — candidate pairs
            # they produce inner-join DOCS for shingles and drop. The
            # reverse order (DOCS first) would make the replay skip ids
            # whose bucket rows were never written, leaving their future
            # near-dups permanently undetectable.
            self.store.append(BUCKETS, banded_new.join(final_keep, "id").select("band", "bucket", "id"))
            self.store.append(DOCS, base_new.join(final_keep, "id").select("id", "hs", "sz"))
        kept_rows = docs.join(
            final_keep.withColumnRenamed("id", "__keep"),
            docs[id_col] == F.col("__keep"),
        ).drop("__keep")
        # eager localCheckpoint SEVERS the result's lineage before the
        # operator caches release — the caller's later actions can never
        # fall into recomputing a released plan
        out = kept_rows.localCheckpoint()
        final_keep.unpersist()
        base.unpersist()
        banded.unpersist()
        if have_index:
            base_new.unpersist()
        release(clusters)
        return out

    def kept_ids(self) -> DataFrame:
        """All canonical ids in the index (empty frame before any ingest)."""
        if not self.store.exists(DOCS):
            return self.spark.createDataFrame([], "id long")
        return self.store.read(DOCS).select("id")

    def probe(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
        """READ-ONLY near-dup lookup against the index: ``(query_id,
        index_id, jaccard)`` for every query document whose exact
        Jaccard against an indexed canonical clears the threshold.
        Nothing is ingested — this is the contamination-check shape
        ("is any of this eval set already in my training corpus?"),
        same candidate/verify economics as :meth:`ingest`."""
        if not self.store.exists(BUCKETS):
            return self.spark.createDataFrame([], "id_a long, id_b long, jaccard double")
        base = _hashed_shingle_frame(docs, id_col, text_col, self.n)
        sigs = base.select("id", _signature_expr(F.col("hs"), self.num_hashes).alias("signature"))
        banded = self._banded(sigs)
        cand = (
            self.store.read(BUCKETS).alias("o")
            .join(F.broadcast(banded.alias("q")), ["band", "bucket"])
            .select(F.col("q.id").alias("id_a"), F.col("o.id").alias("id_b"))
            .distinct()
        )
        old_ids = cand.select(F.col("id_b").alias("id")).distinct()
        old_side = self.store.read(DOCS).join(F.broadcast(old_ids), "id")
        inter = F.size(F.array_intersect("hs_a", "hs_b"))
        union = F.col("sz_a") + F.col("sz_b") - inter
        num = int(round(self.threshold * 10000))
        return (
            cand.join(
                base.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a")),
                "id_a",
            )
            .join(
                old_side.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b")),
                "id_b",
            )
            .filter(inter * 10000 >= F.lit(num) * union)
            .select("id_a", "id_b", F.round(inter.cast("double") / union, 4).alias("jaccard"))
        )

    def maintain(self, keep: int = 3) -> None:
        """Retention: keep the last ``keep`` versions of both index
        tables (one version lands per ingested batch)."""
        for table in (BUCKETS, DOCS, EMITTED):
            if self.store.exists(table):
                self.store.vacuum(table, keep=keep)

    def make_sink(self, out_dir: str, id_col: str = "doc_id", text_col: str = "text"):
        """``foreachBatch`` front door: each micro-batch ingests through
        the DURABLE index (unlike the watermark-horizon streaming gate,
        state here never expires — the index IS the corpus) and the
        surviving rows append to ``out_dir`` as parquet. Restart safety:
        the emission set is ``batch ∩ kept_ids − emitted_ids`` —
        canonical membership AFTER the (idempotent) ingest, minus the
        ids already recorded as written, with ``emitted_ids`` committed
        strictly AFTER the parquet append. A replay whose first attempt
        indexed the rows but crashed before the append therefore still
        emits them (they are canonical but not yet emitted), while a
        full replay of committed batches emits nothing. The only
        remaining window is a crash between the parquet append and the
        ``emitted_ids`` commit, which duplicates that one batch's rows —
        at-least-once; readers dedup on the id column."""

        def sink(batch: DataFrame, _batch_id: int) -> None:
            if batch.limit(1).count() == 0:
                return
            self.ingest(batch, id_col, text_col)
            pending = batch.join(
                self.kept_ids().withColumnRenamed("id", "__keep"),
                batch[id_col] == F.col("__keep"),
            ).drop("__keep")
            if self.store.exists(EMITTED):
                pending = pending.join(
                    self.store.read(EMITTED).withColumnRenamed("id", "__done"),
                    pending[id_col] == F.col("__done"),
                    "left_anti",
                )
            pending = pending.localCheckpoint()  # pin before the two writes
            if pending.limit(1).count() == 0:
                return
            pending.write.mode("append").parquet(out_dir)
            self.store.append(EMITTED, pending.select(F.col(id_col).alias("id")))

        return sink
