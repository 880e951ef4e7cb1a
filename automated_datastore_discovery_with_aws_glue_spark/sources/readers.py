"""Source readers.

The reference discovers three source families — S3 CSV buckets, DynamoDB
tables (key-value JSON items), and RDS Postgres via JDBC — and reads them
through crawler-inferred catalog tables (SURVEY §2.1 S1-S5). Our engine
maps each family onto a native Spark reader; schema inference is the
reader's own (`inferSchema`), not a separate crawler service.

Readers deliberately return *lazy* DataFrames: predicate pushdown and
column pruning then reach the file scan for free via Catalyst.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: tables the driver generates at /root/testdata/sf*/ (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — metadata-only footer
    read (no data touched), cached per path."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:  # pragma: no cover - non-local or non-parquet path
        return ()
    return tuple(
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (lazy scan).

    Parquet TIMESTAMP(NANOS) columns are illegal for Spark's vectorized
    reader; we read them as raw int64 nanos (legacy conf) and truncate to
    microsecond timestamps — the same truncation DuckDB applies — keeping
    the scan fully vectorized and pushdown-capable.

    Plain (un-zoned) parquet timestamps must surface as TIMESTAMP, not
    TIMESTAMP_NTZ: PySpark >= 3.4 infers NTZ for them by default, and NTZ
    is rejected by ``unix_micros`` / long casts / ``F.window`` epoch math
    downstream. Disabling the inference at the reader keeps the column a
    primitive scan output (pushdown intact); with the session timezone
    pinned to UTC (session.py) the values are identical either way. A
    defensive cast covers files whose footer *explicitly* declares NTZ.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_columns(path)
    # Both confs are session-global with no per-read option; the schema
    # resolves eagerly inside read.parquet(), so save/restore scopes the
    # flips to this call (verified — incl. on a real TIMESTAMP(NANOS)
    # file: execution of the returned frame is driven by its resolved
    # schema, not the conf, so a later action works with the conf
    # restored). Leaving nanosAsLong set would make every LATER
    # spark.read.parquet on a nanos file silently yield raw int64
    # columns instead of failing fast.
    nanos_key = "spark.sql.legacy.parquet.nanosAsLong"
    ntz_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev_nanos = spark.conf.get(nanos_key, None)
    prev_ntz = spark.conf.get(ntz_key, None)
    if ns_cols:
        spark.conf.set(nanos_key, "true")
    spark.conf.set(ntz_key, "false")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev_ntz is None:
            spark.conf.unset(ntz_key)
        else:
            spark.conf.set(ntz_key, prev_ntz)
        if ns_cols:
            if prev_nanos is None:
                spark.conf.unset(nanos_key)
            else:
                spark.conf.set(nanos_key, prev_nanos)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv_source(
    spark: SparkSession,
    path: str | list[str],
    *,
    multi_line: bool = False,
    base_path: str | None = None,
    infer: bool = True,
) -> DataFrame:
    """CSV source with header + schema inference.

    Mirrors the reference's crawler-inferred CSV reads
    (`lambda/catalog-creator-s3/app.py:182-200`); `multiLine` covers the
    quoted-multiline fixture (`individual_details.csv`, FIXTURES.md §3).
    ``base_path`` (used with explicit file lists) keeps hive-style
    partition-directory columns visible — reading files by path without
    it would silently drop them. ``infer=False`` reads every column as
    string (header names only, NO inference pass) — for callers that
    immediately conform the frame to an already-registered schema, where
    inference would cost a full extra read of the data just to produce
    types the conform step throws away."""
    reader = (
        spark.read.option("header", True)
        .option("inferSchema", infer)
        .option("multiLine", multi_line)
        .option("escape", '"')
    )
    if base_path:
        reader = reader.option("basePath", base_path)
    return reader.csv(path)


def read_json_items(
    spark: SparkSession, path: str | list[str], *, base_path: str | None = None
) -> DataFrame:
    """Key-value item source (DynamoDB-export analogue): JSON lines with
    per-record schema, merged by Spark's JSON schema inference
    (ref: `lambda/catalog-creator-ddb/app.py:158-172`). ``base_path``:
    see :func:`read_csv_source`."""
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", base_path)
    return reader.json(path)


def jdbc_scan_options(
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """The exact option map handed to Spark's JDBC source — split out so
    the partitioned-read contract is testable without a database. The
    option names are Spark's public JDBC data-source contract; given
    these options the built-in source emits one bounded-range query per
    partition and pushes filters/column pruning into the database (both
    asserted live against embedded Derby in tests/test_readers.py).

    A partial partition spec is an error, not a silent single-partition
    scan: at 100 TB an unpartitioned JDBC read funnels the whole table
    through one executor.
    """
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    opts.update(properties or {})
    # num_partitions is part of the spec check: requesting parallelism
    # without the column/bounds used to be dropped on the floor — the
    # exact silent single-partition scan the contract forbids
    partition_spec = (partition_column, lower_bound, upper_bound)
    if any(v is not None for v in partition_spec) or num_partitions is not None:
        if any(v is None for v in partition_spec):
            raise ValueError(
                "partitioned JDBC scan needs partition_column, lower_bound "
                f"and upper_bound together (num_partitions={num_partitions}); "
                f"got {partition_spec}"
            )
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions or 8),
        )
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source (ref: `lambda/rds-glue-initial/app.py:482-499`).

    At scale, always pass (partition_column, lower/upper bound,
    num_partitions) so the scan parallelizes instead of running on one
    executor; Spark pushes filters down to the database. Options are
    built by :func:`jdbc_scan_options`; the full path runs live against
    embedded Derby in tests (partitioning, pushdown, pruning)."""
    opts = jdbc_scan_options(
        url,
        table,
        properties=properties,
        num_partitions=num_partitions,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
    )
    return spark.read.format("jdbc").options(**opts).load()


def read_text_whole(spark: SparkSession, path: str) -> DataFrame:
    """Whole-object text read (ref DDL-file fetch,
    `lambda/rds-ddl-init/app.py:251-271`): one row per file."""
    return spark.read.text(path, wholetext=True)


def run_sql_batch(spark: SparkSession, script: str) -> list[DataFrame]:
    """Split a SQL script on ';' and execute each statement
    (ref: `lambda/rds-ddl-init/app.py:355-367`)."""
    results: list[DataFrame] = []
    for stmt in script.split(";"):
        stmt = stmt.strip(" \n\t")
        if stmt:
            results.append(spark.sql(stmt))
    return results


def orc_roundtrip(
    spark: SparkSession, df: DataFrame, path: str, *, partition_by: str | None = None
) -> DataFrame:
    """Write ``df`` as ORC (Spark's built-in columnar alternative to
    parquet — the second warehouse format a migrating user brings) and
    read it back. Overwrite mode keeps the call idempotent per path;
    ``partition_by`` exercises hive-partitioned layout (partition values
    come back as the partition column — pin ``basePath`` semantics on
    explicit-file reads, see the gotcha in `catalog/engine.py`).

    Scale: ORC writes/reads are JVM-native and columnar (predicate
    pushdown + column pruning reach the ORC reader exactly like
    parquet); the roundtrip shape is what a format-migration job runs."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)
    return spark.read.orc(path)


def scratch_dir(tag: str) -> str:
    """Per-PROCESS scratch path for side-effecting declared queries
    (ORC roundtrip, persisted IVF indexes): fixed WITHIN a process so
    repeated bench/oracle sweeps overwrite instead of leaking a copy
    per run, but suffixed with the PID so two concurrent sessions on
    one host never overwrite each other's scratch mid-read. Dead
    processes' scratch for the same tag is GC'd on the way through."""
    import re
    import shutil
    import tempfile

    safe = re.sub(r"[^A-Za-z0-9_]+", "_", tag)
    root = tempfile.gettempdir()
    for d in os.listdir(root):
        m = re.match(rf"^{re.escape(safe)}_p(\d+)$", d)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        except PermissionError:
            pass  # live pid owned by another user
    return os.path.join(root, f"{safe}_p{os.getpid()}")


def bucketed_tables(
    spark: SparkSession,
    frames: dict[str, DataFrame],
    key: str | list[str],
    *,
    buckets: int = 8,
    prefix: str | None = None,
) -> dict[str, DataFrame]:
    """Write each frame as a BUCKETED+SORTED managed table on the join
    key and return the re-read handles. Joining two tables bucketed the
    same way on the same key plans WITHOUT a shuffle on either side
    (co-located join — the 100 TB lever the brief names: pre-shuffle
    once at write time, join forever for free; plan-asserted in
    `tests/test_readers.py`). Overwrite mode keeps the build
    idempotent per name; the default prefix carries the PID so two
    concurrent sessions sharing one warehouse dir never drop/rebuild
    each other's tables mid-read (pass an explicit ``prefix`` to opt
    into a shared, single-writer table name)."""
    import re
    import shutil
    from urllib.parse import urlparse

    if prefix is None:
        prefix = f"bkt_p{os.getpid()}"
        # GC the PID-suffixed scratch of DEAD processes (each process
        # gets fresh names for isolation; without this a long-lived
        # warehouse dir accumulates one table set per past run)
        wh0 = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path or (
            spark.conf.get("spark.sql.warehouse.dir")
        )
        if os.path.isdir(wh0):
            for d in os.listdir(wh0):
                m = re.match(r"^bkt_p(\d+)_", d)
                if not m or int(m.group(1)) == os.getpid():
                    continue
                try:
                    os.kill(int(m.group(1)), 0)  # raises if pid is dead
                except ProcessLookupError:
                    shutil.rmtree(os.path.join(wh0, d), ignore_errors=True)
                    spark.sql(f"DROP TABLE IF EXISTS {d}")
                except PermissionError:
                    pass  # live pid owned by another user: leave it
    keys = [key] if isinstance(key, str) else list(key)
    out: dict[str, DataFrame] = {}
    for name, df in frames.items():
        tbl = f"{prefix}_{name}"
        # a FRESH session's in-memory catalog has forgotten the table,
        # but the managed location under the warehouse dir survives —
        # CREATE then trips LOCATION_ALREADY_EXISTS. Drop both.
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path or (
            spark.conf.get("spark.sql.warehouse.dir")
        )
        shutil.rmtree(os.path.join(wh, tbl.lower()), ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(buckets, *keys)
            .sortBy(*keys)
            .format("parquet")
            .saveAsTable(tbl)
        )
        out[name] = spark.table(tbl)
    return out

