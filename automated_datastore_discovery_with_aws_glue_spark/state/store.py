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
atomic rename on POSIX), giving snapshot isolation. Concurrent writers
are serialized by an optimistic-concurrency CAS on the pointer flip
(`ConcurrentWriteError` — the reference's VersionId guard,
`lambda/pii-report/app.py:200-211`): first committer wins, the loser's
version directory is discarded and the caller retries on the new
snapshot. History enables audit/time-travel; `vacuum()` trims it.

Scale posture: each version is partitioned by a declared partition column
(e.g. ``data_source_type`` — the filter key of every P1-P5 state query),
so the reference's "PartiQL full scan per invocation" (BASELINE.md) turns
into partition-pruned reads. Appends are O(batch): the batch is written
and the previous version's files are hard-linked in (no data copy).
MERGE with ``prune_partitions=True`` rewrites only the partitions the
source batch touches (untouched partitions hard-link) — the copy-on-write
granularity Delta/Iceberg give per-file, here per-partition; without the
flag it is a full-version rewrite.

Object-store posture: filesystems without hard links (S3/fuse mounts —
``os.link`` raises) fall back to a per-version ``_INHERITED`` manifest:
instead of linking, the new version records (relative dst, absolute src)
for every inherited file — a true manifest list, the mechanism
Delta/Iceberg use — and ``read`` resolves it into a multi-path scan.
Appends stay O(batch) METADATA-ONLY either way; no data byte is ever
re-copied. Manifests are always fully resolved (they point at the file's
owning version, never at another manifest), so there are no chains to
walk. ``vacuum`` respects references: files a retained manifest points
at survive their version's vacuum (the directory is tombstoned with
``_VACUUMED`` and drops out of the readable history).

One naming caveat of the manifest read path: it mounts the table root as
the scan's ``basePath``, so ``v=NNNNNNNN`` is parsed as a partition
column and dropped — a data column literally named ``v`` would collide
(rejected at write time).

Commit atomicity — PLUGGABLE commit backends (``state/commit.py``). The
default :class:`PosixCommitBackend` protocol is (1) acquire
``_COMMIT_LOCK`` via ``O_CREAT|O_EXCL``, (2) ``os.rename`` staging ->
version dir, (3) ``os.replace`` the ``_LATEST`` pointer, (4) release the
lock. On POSIX every step is atomic and a reader can never observe a
torn state: the pointer flips only after the version dir fully exists,
and a crash between (2) and (3) leaves an orphaned (unreferenced,
invisible) version dir that the next writer's CAS ignores and ``vacuum``
sweeps. On raw S3-style stores neither ``O_EXCL`` nor rename is atomic —
pass :class:`ConditionalPutCommitBackend` instead, which commits with
the store's conditional PUTs only (If-None-Match claim of the version
slot, non-atomic multi-file publish into the unreferenced slot, If-Match
CAS of the pointer — the Delta-on-S3/Iceberg commit shape; the
single-pointer design is exactly why commit state lives in ONE file).
Supported postures therefore: (a) strongly-consistent POSIX layer
(EFS/NFSv4/Lustre — what 100 TB Spark deployments mount for
coordination) with the default backend, or (b) a conditional-PUT-capable
object store with the conditional backend. Under either backend a writer
that dies mid-commit blocks later writers with ``ConcurrentWriteError``
(fail-stop, never corruption); removing the stale lock file / ``_CLAIM``
slot is the documented operator intervention (see
``test_commit_lock_held_raises_concurrent_write`` /
``test_conditional_backend_stale_claim_fail_stop``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.state.merge import merge_frames


#: per-version manifest of inherited files (link-less filesystems):
#: JSON list of {"dst": <path rel to version dir>, "src": <abs path>}
_MANIFEST = "_INHERITED"
#: vacuum only sweeps staging dirs idle longer than this — an active
#: writer's staging write runs BEFORE it takes the commit lock, so age
#: is the only safe liveness signal
_STAGING_SWEEP_GRACE_S = 3600.0
#: tombstone left by vacuum when a version dir must survive partially
#: because retained manifests still reference files inside it
_VACUUMED = "_VACUUMED"
#: optional per-version table metadata (JSON), written into the staging
#: directory BEFORE the pointer flip — atomic with the data it describes
#: (underscore prefix = hidden to parquet readers). The ANN index keeps
#: its applied-batch watermark and per-cell counters here, turning the
#: exactly-once replay check into an O(1) metadata read instead of a
#: table scan.
_TABLE_META = "_TABLE_META"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this mutation's snapshot read and
    its pointer flip (the reference's VersionId guard,
    `lambda/pii-report/app.py:200-211`). The losing writer's version
    directory is discarded; retry re-reads the new snapshot."""


class ParquetStateStore:
    def __init__(self, spark: SparkSession, root: str, *, commit_backend=None):
        """``commit_backend`` selects the commit protocol (see
        ``state/commit.py``): default :class:`PosixCommitBackend`
        (lock file + atomic rename — strongly-consistent POSIX layers);
        pass :class:`ConditionalPutCommitBackend` for rename-less
        object-store postures (conditional-PUT claim + pointer CAS)."""
        from automated_datastore_discovery_with_aws_glue_spark.state.commit import PosixCommitBackend

        self.spark = spark
        self.root = root
        self._backend = commit_backend or PosixCommitBackend()
        # committed versions are IMMUTABLE, so their DataFrames are
        # reusable: memoizing read() per (table, version) saves the
        # file-listing job and plan re-analysis every re-read pays —
        # the incr_* lifecycles re-read the same snapshot 2-4x per batch
        self._read_cache: dict[tuple[str, int], DataFrame] = {}
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

    def _staging_dir(self, table: str) -> str:
        return os.path.join(self._table_dir(table), f"._staging_{uuid.uuid4().hex}")

    def _commit_staged(self, table: str, staging: str, *, expect: int) -> int:
        """Publish a fully-written staging directory as version
        ``expect + 1`` — the optimistic-concurrency CAS, delegated to the
        configured commit backend (``state/commit.py``: POSIX lock +
        atomic rename by default; conditional-PUT claim + pointer CAS for
        rename-less object stores). Writers never touch a live version
        directory: a pointer that moved past ``expect`` raises
        :class:`ConcurrentWriteError`; the loser's staging dir is
        discarded and the winner's commit stands untouched (the
        reference's VersionId guard, `lambda/pii-report/app.py:200-211`)."""
        return self._backend.commit(
            table=table,
            table_dir=self._table_dir(table),
            pointer=self._pointer(table),
            staging=staging,
            version_dir=self._version_dir(table, expect + 1),
            expect=expect,
        )

    # -- public API ---------------------------------------------------------

    def exists(self, table: str) -> bool:
        return self.latest_version(table) > 0

    def read(self, table: str, *, version: int | None = None) -> DataFrame:
        """Snapshot read — latest by default, or time-travel to any
        retained ``version`` (audit/debug; ``vacuum`` bounds retention).

        A version that carries an ``_INHERITED`` manifest (link-less
        filesystem) resolves to a multi-path scan: its own files plus
        every manifest source, mounted under the table root as
        ``basePath`` so partition values still parse (the synthetic
        ``v`` partition column from the version-dir level is dropped)."""
        latest = self.latest_version(table)
        if latest == 0:
            raise FileNotFoundError(f"state table not initialized: {table}")
        v = latest if version is None else version
        vdir = self._version_dir(table, v)
        if (
            v < 1
            or v > latest
            or not os.path.isdir(vdir)
            or os.path.exists(os.path.join(vdir, _VACUUMED))
        ):
            raise FileNotFoundError(
                f"{table}: version {v} not available (latest {latest}; older "
                "versions may have been vacuumed)"
            )
        cached = self._read_cache.get((table, v))
        if cached is not None:
            return cached
        manifest = self._read_manifest(vdir)
        if not manifest:
            df = self.spark.read.parquet(vdir)
        else:
            srcs = sorted({e["src"] for e in manifest})
            df = (
                self.spark.read.option("basePath", self._table_dir(table))
                .parquet(vdir, *srcs)
                .drop("v")
            )
        if len(self._read_cache) >= 64:  # bound plan references, FIFO
            self._read_cache.pop(next(iter(self._read_cache)))
        self._read_cache[(table, v)] = df
        return df

    def versions(self, table: str) -> list[int]:
        """Retained, readable versions (ascending; vacuum-tombstoned
        directories — kept only as manifest file pools — excluded)."""
        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        latest = self.latest_version(table)
        return sorted(
            int(name.split("=")[1])
            for name in os.listdir(tdir)
            if name.startswith("v=")
            and int(name.split("=")[1]) <= latest
            and not os.path.exists(os.path.join(tdir, name, _VACUUMED))
        )

    def init(self, table: str, df: DataFrame, *, partition_by: str | None = None) -> None:
        """Create version 1 from a (possibly empty) DataFrame."""
        self._write_version(table, df, partition_by=partition_by)

    def table_meta(self, table: str, *, version: int | None = None) -> dict:
        """The JSON metadata committed WITH a version (``meta=`` on
        overwrite/append) — empty dict when the version carries none.
        Because the meta file rides in the same staged directory as the
        data files, it can never be observed out of sync with them."""
        v = self.latest_version(table) if version is None else version
        if v <= 0:
            return {}
        path = os.path.join(self._version_dir(table, v), _TABLE_META)
        try:
            with open(path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    @staticmethod
    def _write_meta(staging: str, meta: dict | None) -> None:
        if meta is None:
            return
        with open(os.path.join(staging, _TABLE_META), "w") as fh:
            json.dump(meta, fh)

    def overwrite(
        self,
        table: str,
        df: DataFrame,
        *,
        partition_by: str | None = None,
        expect: int | None = None,
        meta: dict | None = None,
    ) -> None:
        """Full rewrite. ``expect`` pins the version the caller derived
        ``df`` from: a commit that would silently drop a concurrent
        writer's version raises ``ConcurrentWriteError`` instead (the
        read-modify-overwrite CAS — compaction's correctness hinge).
        ``meta`` commits atomically with the data (see
        :meth:`table_meta`)."""
        self._write_version(
            table, df, partition_by=partition_by, expect=expect, meta=meta
        )

    def append(
        self,
        table: str,
        df: DataFrame,
        *,
        partition_by: str | None = None,
        expect: int | None = None,
        meta: dict | None = None,
    ) -> None:
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

        On a filesystem without hard links the inherit step records a
        manifest instead of copying (see module docstring) — the append
        stays O(batch) either way.

        ``expect`` pins the snapshot version the caller's decision to
        append was derived from (r10): a concurrent commit landing after
        that read raises ``ConcurrentWriteError`` instead of silently
        appending onto a snapshot the caller never saw — the hinge of
        read-derive-append sequences like the ANN index's batch-id
        watermark. ``meta`` commits atomically with the data.
        """
        staging, base_v = self._stage_append(
            table, df, partition_by=partition_by, expect=expect, meta=meta
        )
        self._commit_staged(table, staging, expect=base_v)

    def _stage_append(
        self,
        table: str,
        df: DataFrame,
        *,
        partition_by: str | None = None,
        expect: int | None = None,
        meta: dict | None = None,
    ) -> tuple[str, int]:
        """Everything :meth:`append` does up to (not including) the
        pointer flip: returns ``(staging_dir, base_version)`` ready for
        :meth:`_commit_staged`. Factored out so :meth:`append_many` can
        run several tables' staged writes concurrently."""
        if not self.exists(table):
            return self._stage_version(
                table, df, partition_by=partition_by, expect=expect, meta=meta
            )
        self._check_reserved(df)
        cur_v = self.latest_version(table) if expect is None else expect
        cur_dir = self._version_dir(table, cur_v)
        current = self.read(table, version=cur_v)
        prev_part_cols = {
            name.split("=", 1)[0]
            for name in os.listdir(cur_dir)
            if "=" in name and os.path.isdir(os.path.join(cur_dir, name))
        }
        new_part_col = partition_by if partition_by and partition_by in df.columns else None
        # layout must match by the PARTITION COLUMN, not just by
        # partitioned-ness: appending region=*/ dirs next to linked
        # data_source_type=*/ dirs would corrupt the version
        same_layout = set(df.columns) == set(current.columns) and (
            prev_part_cols == ({new_part_col} if new_part_col else set())
        )
        if not same_layout:
            # expect pins the snapshot `current` was read from: a commit
            # landing during the union-rewrite must lose the CAS, not be
            # silently overwritten by a result built on the old snapshot
            merged = current.unionByName(df, allowMissingColumns=True)
            return self._stage_version(
                table, merged, partition_by=partition_by, expect=cur_v, meta=meta
            )
        staging = self._staging_dir(table)
        writer = df.select(*current.columns).write.mode("overwrite")
        if partition_by and partition_by in df.columns:
            writer = writer.partitionBy(partition_by)
        try:
            writer.parquet(staging)
            inherited = self._link_version_files(cur_dir, staging)
            # the previous version's own manifest is already fully
            # resolved (it names each file's owning version), so it
            # carries forward verbatim — manifests never chain
            inherited.extend(self._read_manifest(cur_dir))
            self._write_manifest(staging, inherited)
            self._write_meta(staging, meta)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        return staging, cur_v

    def append_many(self, appends: list[dict]) -> None:
        """Append several DISTINCT tables as one ingest. The staged
        Spark writes run CONCURRENTLY from a small driver thread pool
        (independent jobs overlap — one write's task tail back-fills
        with the next write's tasks, guide §2.6), then the pointer
        flips commit sequentially in LIST ORDER, preserving cross-table
        commit-order invariants (e.g. the dedup index's strictly-
        BUCKETS-before-DOCS replay contract).

        Each entry: ``{"table": str, "df": DataFrame,
        "partition_by": str|None, "expect": int|None, "meta": dict|None}``.

        Failure exposure is identical to calling :meth:`append` per
        table in list order: a staging failure commits NOTHING (all
        staged dirs are discarded); a commit failure (lost CAS) leaves
        the tables before it committed and discards the rest — the same
        crash window the sequential appends always had, minus the time
        the second table's write used to spend inside it."""
        tables = [a["table"] for a in appends]
        if len(set(tables)) != len(tables):
            raise ValueError("append_many: tables must be distinct per call")
        if len(appends) == 1:
            a = appends[0]
            self.append(
                a["table"],
                a["df"],
                partition_by=a.get("partition_by"),
                expect=a.get("expect"),
                meta=a.get("meta"),
            )
            return
        from concurrent.futures import ThreadPoolExecutor

        # job descriptions are thread-local: carry the caller's into the
        # pool threads so the staged writes stay attributable in the UI
        sc = self.spark.sparkContext
        desc = sc.getLocalProperty("spark.job.description")

        def stage(a: dict):
            if desc is not None:
                sc.setJobDescription(desc)
            return self._stage_append(
                a["table"],
                a["df"],
                partition_by=a.get("partition_by"),
                expect=a.get("expect"),
                meta=a.get("meta"),
            )

        futs = []
        with ThreadPoolExecutor(max_workers=min(len(appends), 4)) as pool:
            for a in appends:
                futs.append(pool.submit(stage, a))
        failed = [f for f in futs if f.exception() is not None]
        if failed:
            for f in futs:
                if f.exception() is None:
                    shutil.rmtree(f.result()[0], ignore_errors=True)
            raise failed[0].exception()
        staged = [f.result() for f in futs]
        for i, (a, (staging, base_v)) in enumerate(zip(appends, staged)):
            try:
                self._commit_staged(a["table"], staging, expect=base_v)
            except Exception:
                for _s, (later, _v) in zip(appends[i + 1 :], staged[i + 1 :]):
                    shutil.rmtree(later, ignore_errors=True)
                raise

    def replace_partitions(
        self,
        table: str,
        df: DataFrame,
        *,
        partition_by: str,
        values: list,
    ) -> None:
        """INSERT OVERWRITE PARTITION semantics (Spark's dynamic
        partition-overwrite, modeled on the versioned store): the listed
        ``values`` of ``partition_by`` are REPLACED wholesale by ``df``'s
        rows — including replacement-by-nothing (a value with zero rows in
        ``df`` is emptied, which plain ``merge`` cannot express because it
        never deletes) — while every other partition's files hard-link
        into the new version unchanged. O(touched partitions), not
        O(table): the per-source bookkeeping tables (file-level classify
        stats) rewrite one source's partition per pass at 100 TB.

        Values must be partition-dir-safe (no chars Spark escapes in
        ``k=v`` dir names — hex ids and identifiers are; arbitrary user
        strings may not be) and non-NULL; ``df`` must not carry partition
        values outside ``values`` (enforced here — extra values would
        shadow live partitions at link time).
        """
        if any(v is None for v in values):
            raise ValueError("replace_partitions: NULL partition values unsupported")
        if not self.exists(table):
            self._write_version(table, df, partition_by=partition_by)
            return
        self._check_reserved(df)
        cur_v = self.latest_version(table)
        cur_dir = self._version_dir(table, cur_v)
        current = self.read(table)
        if set(df.columns) != set(current.columns):
            raise ValueError(
                "replace_partitions: schema drift — align df to the table "
                f"columns first (have {sorted(df.columns)}, "
                f"table {sorted(current.columns)})"
            )
        prev_part_cols = {
            name.split("=", 1)[0]
            for name in os.listdir(cur_dir)
            if "=" in name and os.path.isdir(os.path.join(cur_dir, name))
        }
        if prev_part_cols != {partition_by}:
            # current version isn't laid out by this column (first write
            # was unpartitioned, or a different key): full logical
            # replace-rewrite — correctness first, the next version is
            # partitioned and later passes prune again. The stray-value
            # guard needs its own scan here (the logical merge would
            # silently absorb strays); the pruned path below gets it for
            # free from the staged directory listing.
            stray = (
                df.select(partition_by)
                .distinct()
                .filter(~F.col(partition_by).isin(values) | F.col(partition_by).isNull())
                .limit(1)
                .collect()
            )
            if stray:
                raise ValueError(
                    f"replace_partitions: df carries partition value {stray[0][0]!r} "
                    f"outside the declared replacement set"
                )
            merged = current.filter(
                ~F.col(partition_by).isin(values) | F.col(partition_by).isNull()
            ).unionByName(df.select(*current.columns))
            self._write_version(table, merged, partition_by=partition_by, expect=cur_v)
            return
        replaced_dirs = {f"{partition_by}={v}" for v in values}
        staging = self._staging_dir(table)
        try:
            df.select(*current.columns).write.mode("overwrite").partitionBy(
                partition_by
            ).parquet(staging)
            # stray-value guard, free from the staged listing (no extra
            # Spark job): every partition dir the write produced must be
            # in the declared set — a NULL partition value surfaces here
            # as __HIVE_DEFAULT_PARTITION__, an undeclared value (or one
            # whose dir-name encoding diverged) as its own dir. Raising
            # inside the try discards the staging dir; nothing commits.
            for name in os.listdir(staging):
                if (
                    "=" in name
                    and os.path.isdir(os.path.join(staging, name))
                    and name not in replaced_dirs
                ):
                    raise ValueError(
                        f"replace_partitions: df carries partition value "
                        f"{name.split('=', 1)[1]!r} outside the declared "
                        "replacement set (or the value is not dir-name-safe)"
                    )
            inherited: list[dict] = []
            untouched = [
                name
                for name in os.listdir(cur_dir)
                if "=" in name
                and os.path.isdir(os.path.join(cur_dir, name))
                and name not in replaced_dirs
            ]
            for name in untouched:
                sub = self._link_version_files(
                    os.path.join(cur_dir, name), os.path.join(staging, name)
                )
                inherited.extend(
                    {"dst": os.path.join(name, e["dst"]), "src": e["src"]}
                    for e in sub
                )
            untouched_set = set(untouched)
            inherited.extend(
                e
                for e in self._read_manifest(cur_dir)
                if e["dst"].split(os.sep, 1)[0] in untouched_set
            )
            self._write_manifest(staging, inherited)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        self._commit_staged(table, staging, expect=cur_v)

    def merge(
        self,
        table: str,
        source: DataFrame,
        key: str | list[str],
        *,
        set_on_match: dict[str, Column] | None = None,
        insert_not_matched: bool = True,
        partition_by: str | None = None,
        prune_partitions: bool = False,
        partition_values: list | None = None,
    ) -> None:
        """MERGE INTO <table> USING <source> (S8/S9/J5 semantics);
        initializes the table from the source batch when absent.

        ``prune_partitions=True`` rewrites ONLY the partitions whose
        ``partition_by`` value appears in the source batch; every other
        partition's files hard-link into the new version unchanged —
        O(touched partitions), not O(table). It is the caller's contract
        that a key's partition value is immutable (true for the tracker:
        the id is derived from the source type), because a source row can
        then only ever match target rows inside its own partition value.
        Falls back to the full rewrite when the source lacks the
        partition column, when ``set_on_match`` rewrites it, or when the
        current version isn't partitioned.

        ``partition_values`` declares the source's distinct partition
        values when the caller already knows them (a driver-built batch),
        skipping the distinct-scan job that would otherwise derive them.
        The staged write re-validates the claim from its partition
        directory listing — an undeclared value aborts the commit instead
        of shadowing a live partition."""
        if not self.exists(table):
            if insert_not_matched:
                self._write_version(table, source, partition_by=partition_by)
            return
        cur_v = self.latest_version(table)
        cur_dir = self._version_dir(table, cur_v)
        # full snapshot (manifest-resolving) — a raw directory read would
        # miss inherited files on link-less filesystems
        current = self.read(table)
        if prune_partitions and partition_by:
            prev_partitioned = any(
                "=" in name and os.path.isdir(os.path.join(cur_dir, name))
                for name in os.listdir(cur_dir)
            )
            safe = (
                partition_by in source.columns
                and partition_by not in (set_on_match or {})
                and prev_partitioned
            )
            vals: list = []
            if safe:
                vals = (
                    list(partition_values)
                    if partition_values is not None
                    else [r[0] for r in source.select(partition_by).distinct().collect()]
                )
                # a NULL partition value can't be matched by isin() (SQL
                # NULL semantics), so the NULL partition's target rows
                # would be excluded from the merge AND shadowed by the
                # staged NULL-partition dir at link time — silently lost.
                # NULLs take the full-rewrite path instead.
                if any(v is None for v in vals):
                    safe = False
            if safe:
                self._merge_pruned(
                    table,
                    current,
                    source,
                    key,
                    vals=vals,
                    set_on_match=set_on_match,
                    insert_not_matched=insert_not_matched,
                    partition_by=partition_by,
                    cur_v=cur_v,
                    cur_dir=cur_dir,
                )
                return
        merged = merge_frames(
            current,
            source,
            key,
            set_on_match=set_on_match,
            insert_not_matched=insert_not_matched,
        )
        self._write_version(table, merged, partition_by=partition_by, expect=cur_v)

    def _merge_pruned(
        self,
        table: str,
        current: DataFrame,
        source: DataFrame,
        key: str | list[str],
        *,
        vals: list,
        set_on_match: dict[str, Column] | None,
        insert_not_matched: bool,
        partition_by: str,
        cur_v: int,
        cur_dir: str,
    ) -> None:
        """Partition-granular copy-on-write: merge the touched partitions
        through Spark, hard-link the rest (see :meth:`merge`). ``vals``
        is the source's distinct partition values, pre-collected and
        NULL-free (the caller routes NULLs to the full rewrite)."""
        touched = current.filter(F.col(partition_by).isin(vals))
        merged = merge_frames(
            touched,
            source,
            key,
            set_on_match=set_on_match,
            insert_not_matched=insert_not_matched,
        )
        staging = self._staging_dir(table)
        declared_dirs = {f"{partition_by}={v}" for v in vals}
        try:
            merged.write.mode("overwrite").partitionBy(partition_by).parquet(staging)
            # validate the declared value set from the staged listing (no
            # Spark job): a source value missing from ``vals`` — possible
            # only through a wrong ``partition_values`` hint — would have
            # excluded that partition's target rows from ``touched`` and
            # then shadowed the live partition dir at link time. Raising
            # here discards staging; nothing commits.
            for name in os.listdir(staging):
                if (
                    "=" in name
                    and os.path.isdir(os.path.join(staging, name))
                    and name not in declared_dirs
                ):
                    raise ValueError(
                        f"merge: source carries partition value "
                        f"{name.split('=', 1)[1]!r} outside the declared "
                        "partition_values set"
                    )
            # untouched partitions: link whole directories. A touched value
            # with target rows always re-appears in staging (merge retains
            # matched rows), so "in cur but not in staging" = untouched.
            untouched = [
                name
                for name in os.listdir(cur_dir)
                if "=" in name
                and os.path.isdir(os.path.join(cur_dir, name))
                and not os.path.isdir(os.path.join(staging, name))
            ]
            inherited: list[dict] = []
            for name in untouched:
                sub = self._link_version_files(
                    os.path.join(cur_dir, name), os.path.join(staging, name)
                )
                inherited.extend(
                    {"dst": os.path.join(name, e["dst"]), "src": e["src"]}
                    for e in sub
                )
            # carry forward prior manifest entries for untouched
            # partitions only; touched partitions were fully rewritten
            untouched_set = set(untouched)
            inherited.extend(
                e
                for e in self._read_manifest(cur_dir)
                if e["dst"].split(os.sep, 1)[0] in untouched_set
            )
            self._write_manifest(staging, inherited)
        except Exception:
            # a mid-write failure (e.g. the NULL-merge-key guard firing
            # executor-side) must not leave partial staging data behind
            shutil.rmtree(staging, ignore_errors=True)
            raise
        self._commit_staged(table, staging, expect=cur_v)

    def vacuum(self, table: str, keep: int = 2) -> None:
        """Drop all but the last ``keep`` committed versions.

        Reference-aware on link-less filesystems: data files a RETAINED
        version's manifest still points at survive their version's
        vacuum (the directory keeps only those files plus a
        ``_VACUUMED`` tombstone and leaves the readable history). With
        hard links the filesystem provides this for free and whole
        directories are removed as before."""
        latest = self.latest_version(table)
        tdir = self._table_dir(table)
        if latest == 0 or not os.path.isdir(tdir):
            return
        # realpath-normalized on BOTH sides of the compare: manifest srcs
        # resolve root-relative (so any spelling of the root agrees) and
        # symlinked components collapse — a retained manifest's files can
        # never be missed because of path-spelling drift
        referenced: set[str] = set()
        for name in os.listdir(tdir):
            if name.startswith("v=") and latest - keep < int(name.split("=")[1]) <= latest:
                referenced.update(
                    os.path.realpath(e["src"])
                    for e in self._read_manifest(os.path.join(tdir, name))
                )
        for name in os.listdir(tdir):
            path = os.path.join(tdir, name)
            if name.startswith("v="):
                if int(name.split("=")[1]) <= latest - keep:
                    self._vacuum_version(path, referenced)
            elif name.startswith("._staging_"):
                # leftovers from crashed/conflicted writers. An ACTIVE
                # writer's staging (its parquet write precedes the commit
                # lock) must not be swept from under it — only dirs idle
                # past the grace period are dead for sure.
                try:
                    idle = time.time() - os.path.getmtime(path)
                except OSError:
                    continue
                if idle > _STAGING_SWEEP_GRACE_S:
                    shutil.rmtree(path, ignore_errors=True)

    def _vacuum_version(self, vdir: str, referenced: set[str]) -> None:
        if not any(
            os.path.realpath(os.path.join(root, f)) in referenced
            for root, _d, files in os.walk(vdir)
            for f in files
        ):
            shutil.rmtree(vdir, ignore_errors=True)
            return
        for root, _dirs, files in os.walk(vdir, topdown=False):
            for name in files:
                p = os.path.join(root, name)
                if os.path.realpath(p) not in referenced:
                    try:
                        os.remove(p)
                    except OSError:
                        pass
            if root != vdir:
                try:
                    os.rmdir(root)  # only succeeds when emptied
                except OSError:
                    pass
        with open(os.path.join(vdir, _VACUUMED), "w"):
            pass

    # -- internals ----------------------------------------------------------

    def _link_version_files(self, src_dir: str, dst_dir: str) -> list[dict]:
        """Mirror ``src_dir``'s data files into ``dst_dir`` via hard links.

        Skips ``_SUCCESS``/checksum files (readers ignore ``_``/``.``-prefixed
        names). Spark part-file names embed a per-job UUID, so collisions with
        the freshly written batch files cannot occur.

        Returns the manifest entries for files that could NOT be linked
        (``os.link`` unsupported — object-store-like filesystems): each is
        ``{"dst": <rel path>, "src": <abs path>}``; the caller persists
        them via :meth:`_write_manifest` so the append stays metadata-only
        instead of degrading to a full data copy."""
        entries: list[dict] = []
        for root, _dirs, files in os.walk(src_dir):
            rel = os.path.relpath(root, src_dir)
            target_root = dst_dir if rel == "." else os.path.join(dst_dir, rel)
            os.makedirs(target_root, exist_ok=True)
            for name in files:
                if name.startswith(("_", ".")):
                    continue
                src = os.path.join(root, name)
                try:
                    os.link(src, os.path.join(target_root, name))
                except OSError:
                    entries.append(
                        {
                            "dst": name if rel == "." else os.path.join(rel, name),
                            "src": src,
                        }
                    )
        return entries

    def _read_manifest(self, vdir: str) -> list[dict]:
        """Manifest entries with ``src`` RESOLVED against the current
        table root. Entries are persisted root-relative (see
        :meth:`_write_manifest`), so a store re-opened through another
        spelling of the same directory — relative path, symlinked mount,
        or a relocated root — still resolves every inherited file;
        absolute srcs (pre-relative manifests) pass through unchanged."""
        try:
            with open(os.path.join(vdir, _MANIFEST)) as fh:
                entries = json.load(fh)
        except FileNotFoundError:
            return []
        root = os.path.dirname(os.path.normpath(vdir))
        for e in entries:
            if not os.path.isabs(e["src"]):
                e["src"] = os.path.join(root, e["src"])
        return entries

    def _write_manifest(self, vdir: str, entries: list[dict]) -> None:
        """Persist manifest entries with ``src`` RELATIVE to the table
        root (srcs always point into sibling version dirs): path
        identity then survives root renames/symlinks, and vacuum's
        reference check can never miss a referenced file because the
        root was spelled differently at write time."""
        if entries:
            root = os.path.dirname(os.path.normpath(vdir))
            out = []
            for e in entries:
                rel = os.path.relpath(e["src"], root)
                out.append(
                    {"dst": e["dst"], "src": e["src"] if rel.startswith("..") else rel}
                )
            with open(os.path.join(vdir, _MANIFEST), "w") as fh:
                json.dump(out, fh)

    def _check_reserved(self, df: DataFrame) -> None:
        if "v" in df.columns:
            raise ValueError(
                "state tables reserve the column name 'v' (the version "
                "partition level of the manifest read path); rename it"
            )

    def _stage_version(
        self,
        table: str,
        df: DataFrame,
        *,
        partition_by: str | None,
        expect: int | None = None,
        meta: dict | None = None,
    ) -> tuple[str, int]:
        # ``expect`` pins the snapshot the caller derived ``df`` from; when
        # omitted, the version at entry is the snapshot (the Spark write
        # below is the long window a concurrent commit could slip into).
        self._check_reserved(df)
        base_v = self.latest_version(table) if expect is None else expect
        os.makedirs(self._table_dir(table), exist_ok=True)
        staging = self._staging_dir(table)
        writer = df.write.mode("overwrite")
        if partition_by and partition_by in df.columns:
            writer = writer.partitionBy(partition_by)
        try:
            writer.parquet(staging)
            self._write_meta(staging, meta)
        except Exception:
            # failed plans (lazy guards, executor errors) must not leave
            # partial staging directories behind
            shutil.rmtree(staging, ignore_errors=True)
            raise
        return staging, base_v

    def _write_version(
        self,
        table: str,
        df: DataFrame,
        *,
        partition_by: str | None,
        expect: int | None = None,
        meta: dict | None = None,
    ) -> None:
        staging, base_v = self._stage_version(
            table, df, partition_by=partition_by, expect=expect, meta=meta
        )
        self._commit_staged(table, staging, expect=base_v)
