"""Incremental IVF vector index (r9, VERDICT r8 item 6): the
`plans/incremental.py CorpusDedupIndex` lifecycle applied to ANN.

A 100 TB embedding corpus is not re-indexed daily; vectors ARRIVE. The
index therefore separates the two costs:

- ``build()`` — the one-time (or rare ``rebuild()``) cost: train the
  coarse quantizer with distributed k-means
  (`operators/similarity.py kmeans_centroids_int` — full Lloyd,
  map-side-combinable partial sums) and write every vector into its
  cell partition.
- ``ingest()`` — the RECURRING cost: assign the batch with the STORED
  quantizer (map-side literal-matrix argmax, zero shuffle beyond the
  partitioned write) and append at O(batch) — the state store
  hard-links the previous version's files, so a billion-vector index
  absorbs a thousand-vector delta without touching history.

Centroids persist as an integer state table (cell, pos, c micro-units),
so a reopened index assigns IDENTICALLY to the session that built it —
assignment parity between build-then-ingest and one-shot build is exact
(pytest `tests/test_ann_index.py`), not approximate.

Queries prune partitions: ``topk`` plans ``_cell IN (probes)`` as a
PartitionFilter against the versioned cell directories — n_probe /
n_cells of the files are listed, the rest never touched.

Replay guard: each ingest carries a ``batch_id`` on its rows (the
`streaming/classify.py` pattern); re-delivering an applied batch id
no-ops, making ``foreachBatch`` ingestion exactly-once under
at-least-once delivery.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.operators.similarity import (
    as_double,
    cosine,
    kmeans_cell_expr,
    kmeans_centroids_int,
    lit_vec,
    quantize_unit_micro,
    sq_norm_expr,
)
from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore

VECTORS = "vectors"
CENTROIDS = "centroids"


class IvfVectorIndex:
    _META_KEYS = ("n_cells", "vec_col", "id_col")

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        n_cells: int = 16,
        iterations: int = 3,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        hash_fn: str = "xxh",
        commit_backend=None,
    ):
        self.spark = spark
        self.root = root
        self.n_cells = n_cells
        self.iterations = iterations
        self.vec_col = vec_col
        self.id_col = id_col
        self.hash_fn = hash_fn
        self.store = ParquetStateStore(spark, root, commit_backend=commit_backend)
        self._check_or_write_meta()

    def _check_or_write_meta(self) -> None:
        """Cell layout is part of the persisted index (the
        CorpusDedupIndex contract): reopening with a different cell
        count or column mapping would silently mis-assign or mis-probe;
        a mismatch is a loud error. ``iterations``/``hash_fn`` only
        matter at (re)build time and are free to vary."""
        meta_path = os.path.join(self.root, "index_meta.json")
        mine = {k: getattr(self, k) for k in self._META_KEYS}
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                stored = json.load(fh)
            diffs = {
                k: (stored.get(k), mine[k])
                for k in self._META_KEYS
                if stored.get(k) != mine[k]
            }
            if diffs:
                raise ValueError(
                    f"IvfVectorIndex at {self.root} was created with "
                    f"{ {k: v[0] for k, v in diffs.items()} } but reopened with "
                    f"{ {k: v[1] for k, v in diffs.items()} }; the cell layout is "
                    f"immutable — rebuild() into a fresh root to change it"
                )
            return
        os.makedirs(self.root, exist_ok=True)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(mine, fh)
        os.replace(tmp, meta_path)

    # -- internals -----------------------------------------------------

    def centroids_int(self) -> list[list[int]]:
        """The stored quantizer as the k x d integer matrix."""
        rows = self.store.read(CENTROIDS).orderBy("cell", "pos").collect()
        cents: dict[int, dict[int, int]] = {}
        for r in rows:
            cents.setdefault(r["cell"], {})[r["pos"]] = r["c"]
        return [
            [cents[c][p] for p in sorted(cents[c])] for c in sorted(cents)
        ]

    def quantizer(self) -> np.ndarray:
        """Float unit-norm view of the stored centroids (probe scoring)."""
        arr = np.array(self.centroids_int(), dtype=float) / 1_000_000.0
        norms = np.linalg.norm(arr, axis=1, keepdims=True)
        return arr / np.maximum(norms, 1e-300)

    def _assigned(self, df: DataFrame, cents: list[list[int]], batch_id: int) -> DataFrame:
        """(id, vec, batch_id, _cell) with the integer argmax assignment;
        zero-norm vectors (no direction — excluded from training) land
        deterministically in the LAST cell (all dots zero, struct-max
        tie goes high) without ever dividing by their zero norm."""
        zeros = F.expr(f"transform(`{self.vec_col}`, x -> CAST(0 AS BIGINT))")
        qv = F.when(
            F.col("_nrm") > 0, quantize_unit_micro(self.vec_col, "_nrm")
        ).otherwise(zeros)
        return (
            df.select(
                F.col(self.id_col),
                F.col(self.vec_col),
                F.lit(batch_id).cast("long").alias("batch_id"),
                sq_norm_expr(self.vec_col).alias("_nrm"),
            )
            .withColumn("_qv", qv)
            .withColumn("_cell", kmeans_cell_expr("_qv", cents))
            .drop("_qv", "_nrm")
        )

    def _applied_through(self) -> int:
        if not self.store.exists(VECTORS):
            return -1
        row = (
            self.store.read(VECTORS)
            .agg(F.max("batch_id").alias("m"))
            .collect()[0]
        )
        return -1 if row["m"] is None else int(row["m"])

    # -- API -----------------------------------------------------------

    def build(self, df: DataFrame) -> None:
        """Train the quantizer over ``df`` (distributed Lloyd) and write
        the initial index. Errors on an empty/all-zero corpus — an index
        with no quantizer cannot assign future ingests."""
        cents = kmeans_centroids_int(
            df,
            self.vec_col,
            n_cells=self.n_cells,
            iterations=self.iterations,
            id_col=self.id_col,
            hash_fn=self.hash_fn,
        )
        if not cents:
            raise ValueError(
                "IvfVectorIndex.build: corpus has no non-zero vectors to train on"
            )
        cent_rows = self.spark.createDataFrame(
            [
                (cell, pos, int(v))
                for cell, vec in enumerate(cents)
                for pos, v in enumerate(vec)
            ],
            "cell int, pos int, c bigint",
        )
        self.store.overwrite(CENTROIDS, cent_rows)
        assigned = self._assigned(df, cents, batch_id=0)
        # repartition on the partition column first or the write emits
        # tasks x cells tiny files (store gotcha)
        self.store.overwrite(
            VECTORS, assigned.repartition("_cell"), partition_by="_cell"
        )

    def rebuild(self, df: DataFrame) -> None:
        """Backfill bridge: retrain on the given corpus and rewrite —
        same tables, new versions (readers on the old version finish
        their scan; the pointer flip is atomic)."""
        self.build(df)

    def ingest(self, df: DataFrame, *, batch_id: int | None = None) -> None:
        """Append a vector batch at O(batch): assign with the STORED
        quantizer, append into the cell partitions (previous files
        hard-linked). With ``batch_id``, re-delivery of an applied id
        no-ops (exactly-once under at-least-once)."""
        applied = self._applied_through()
        bid = applied + 1 if batch_id is None else batch_id
        if bid <= applied:
            return
        cents = self.centroids_int()
        assigned = self._assigned(df, cents, batch_id=bid)
        self.store.append(
            VECTORS, assigned.repartition("_cell"), partition_by="_cell"
        )

    def vectors(self) -> DataFrame:
        return self.store.read(VECTORS)

    def topk(
        self, query: list[float], k: int = 10, *, n_probe: int = 4
    ) -> DataFrame:
        """Partition-pruned approximate top-k: ``_cell IN (probes)`` is
        a PartitionFilter, so only the probed cell directories are
        listed. Zero-norm stored vectors are excluded from scoring
        (cosine with no direction is undefined — and an ANSI
        divide-by-zero)."""
        cents = self.quantizer()
        qv = np.asarray(query, dtype=float)
        probes = [int(p) for p in np.argsort(-(cents @ qv))[: n_probe]]
        return (
            self.vectors()
            .filter(F.col("_cell").isin(probes))
            .withColumn("_nrm", sq_norm_expr(self.vec_col))
            .filter(F.col("_nrm") > 0)
            .select(
                F.col(self.id_col),
                F.round(
                    cosine(
                        as_double(F.col(self.vec_col)),
                        lit_vec([float(x) for x in query]),
                    ),
                    4,
                ).alias("similarity"),
            )
            .orderBy(F.col("similarity").desc(), F.col(self.id_col))
            .limit(k)
        )
