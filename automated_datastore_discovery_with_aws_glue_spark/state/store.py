"""Versioned parquet state store — the engine's tracker/findings/tag
tables (SURVEY §1.1).

The reference keeps state in three DynamoDB tables (`lib/base-infra-
stack.ts:66-92`). Our engine keeps them as *versioned parquet tables*
with MERGE mutation semantics (delta-lake-style copy-on-write without the
dependency — delta isn't in this environment):

    <root>/<table>/v=00000001/part-*.parquet
    <root>/<table>/v=00000002/...
    <root>/<table>/_LATEST          # pointer file: committed version

Readers resolve `_LATEST` and scan exactly one version directory; writers
write the next version directory first and flip the pointer last (an
atomic rename on POSIX), giving snapshot isolation for single-writer use.
History enables audit/time-travel; `vacuum()` trims it.

Scale posture: each version is partitioned by a declared partition column
(e.g. ``data_source_type`` — the filter key of every P1-P5 state query),
so the reference's "PartiQL full scan per invocation" (BASELINE.md) turns
into partition-pruned reads. Appends are O(batch): the batch is written
and the previous version's files are hard-linked in (no data copy).
MERGE rewrites are full-version rewrites here; on a petabyte deployment
you'd use the same plan over Delta/Iceberg where only matched files
rewrite — the operator surface is identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.state.merge import merge_frames


class ParquetStateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping ------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_LATEST")

    def latest_version(self, table: str) -> int:
        try:
            with open(self._pointer(table)) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return 0

    def _version_dir(self, table: str, version: int) -> str:
        return os.path.join(self._table_dir(table), f"v={version:08d}")

    def _commit(self, table: str, version: int) -> None:
        tdir = self._table_dir(table)
        os.makedirs(tdir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=tdir, prefix="._latest")
        with os.fdopen(fd, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer(table))  # atomic pointer flip

    # -- public API ---------------------------------------------------------

    def exists(self, table: str) -> bool:
        return self.latest_version(table) > 0

    def read(self, table: str) -> DataFrame:
        v = self.latest_version(table)
        if v == 0:
            raise FileNotFoundError(f"state table not initialized: {table}")
        return self.spark.read.parquet(self._version_dir(table, v))

    def init(self, table: str, df: DataFrame, *, partition_by: str | None = None) -> None:
        """Create version 1 from a (possibly empty) DataFrame."""
        self._write_version(table, df, partition_by=partition_by)

    def overwrite(self, table: str, df: DataFrame, *, partition_by: str | None = None) -> None:
        self._write_version(table, df, partition_by=partition_by)

    def append(self, table: str, df: DataFrame, *, partition_by: str | None = None) -> None:
        """Plain insert (S10) — new version = old data + batch, at O(batch) cost.

        Only the batch is written through Spark; the previous version's data
        files are hard-linked into the new version directory (metadata-only,
        zero data copy — a poor-man's manifest list). A 100 TB findings table
        therefore costs O(batch) per ingest, not O(table). The snapshot
        contract is unchanged: readers scan exactly one version directory,
        and the pointer flip stays atomic. Hard links also keep shared data
        alive when ``vacuum`` removes an old version directory.

        Falls back to a full union-rewrite only when the batch's columns or
        partition layout differ from the current version (schema drift —
        rare, and the rewrite re-normalizes the table).
        """
        if not self.exists(table):
            self._write_version(table, df, partition_by=partition_by)
            return
        cur_v = self.latest_version(table)
        cur_dir = self._version_dir(table, cur_v)
        current = self.spark.read.parquet(cur_dir)
        prev_partitioned = any(
            "=" in name and os.path.isdir(os.path.join(cur_dir, name))
            for name in os.listdir(cur_dir)
        )
        same_layout = set(df.columns) == set(current.columns) and (
            bool(partition_by and partition_by in df.columns) == prev_partitioned
        )
        if not same_layout:
            merged = current.unionByName(df, allowMissingColumns=True)
            self._write_version(table, merged, partition_by=partition_by)
            return
        next_v = cur_v + 1
        out = self._version_dir(table, next_v)
        writer = df.select(*current.columns).write.mode("overwrite")
        if partition_by and partition_by in df.columns:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out)
        self._link_version_files(cur_dir, out)
        self._commit(table, next_v)

    def merge(
        self,
        table: str,
        source: DataFrame,
        key: str | list[str],
        *,
        set_on_match: dict[str, Column] | None = None,
        insert_not_matched: bool = True,
        partition_by: str | None = None,
    ) -> None:
        """MERGE INTO <table> USING <source> (S8/S9/J5 semantics);
        initializes the table from the source batch when absent."""
        if not self.exists(table):
            if insert_not_matched:
                self._write_version(table, source, partition_by=partition_by)
            return
        merged = merge_frames(
            self.read(table),
            source,
            key,
            set_on_match=set_on_match,
            insert_not_matched=insert_not_matched,
        )
        self._write_version(table, merged, partition_by=partition_by)

    def vacuum(self, table: str, keep: int = 2) -> None:
        """Drop all but the last ``keep`` committed versions."""
        latest = self.latest_version(table)
        tdir = self._table_dir(table)
        if latest == 0 or not os.path.isdir(tdir):
            return
        for name in os.listdir(tdir):
            if name.startswith("v="):
                v = int(name.split("=")[1])
                if v <= latest - keep:
                    shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)

    # -- internals ----------------------------------------------------------

    def _link_version_files(self, src_dir: str, dst_dir: str) -> None:
        """Mirror ``src_dir``'s data files into ``dst_dir`` via hard links.

        Skips ``_SUCCESS``/checksum files (readers ignore ``_``/``.``-prefixed
        names). Spark part-file names embed a per-job UUID, so collisions with
        the freshly written batch files cannot occur; a cross-device link
        failure degrades to a file copy.
        """
        for root, _dirs, files in os.walk(src_dir):
            rel = os.path.relpath(root, src_dir)
            target_root = dst_dir if rel == "." else os.path.join(dst_dir, rel)
            os.makedirs(target_root, exist_ok=True)
            for name in files:
                if name.startswith(("_", ".")):
                    continue
                src = os.path.join(root, name)
                dst = os.path.join(target_root, name)
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)

    def _write_version(self, table: str, df: DataFrame, *, partition_by: str | None) -> None:
        next_v = self.latest_version(table) + 1
        out = self._version_dir(table, next_v)
        writer = df.write.mode("overwrite")
        if partition_by and partition_by in df.columns:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out)
        self._commit(table, next_v)
