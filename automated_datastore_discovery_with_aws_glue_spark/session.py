"""SparkSession factory tuned for the engine.

The reference runs one Glue job (Spark 3.3, 10 x G.1X) *per table* with a
cold start each run (`lambda/s3-glue-job-creator/app.py:34-42`). Our engine
is a long-lived single session that processes all tables; these defaults
are chosen for correctness-at-scale:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- shuffle partitions sized for the local harness but overridable via env
  (`SPARK_GRAFT_CPUS`); on a real cluster you'd set this to 2-3x cores
- Arrow enabled so the few Pandas-UDF paths are vectorized
- session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle used by the correctness harness
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "datastore-discovery-spark"


def _cpus() -> int:
    """0 means "unset" — the session falls back to local[*] / 32 shuffle
    partitions; any positive value pins both."""
    try:
        return max(0, int(os.environ.get("SPARK_GRAFT_CPUS", "0")))
    except ValueError:
        return 0


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession."""
    cpus = _cpus()
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # un-zoned parquet timestamps surface as TIMESTAMP, not NTZ —
        # NTZ is rejected by unix_micros/window epoch math downstream;
        # identical values under the pinned UTC timezone
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    requested_explicitly = (
        master is not None or shuffle_partitions is not None or extra_conf
    )
    existing = _any_session()
    spark = builder.getOrCreate()
    if existing is not None and requested_explicitly:
        # getOrCreate reuses the live session and IGNORES builder confs —
        # warn instead of letting the caller believe its settings took
        got = spark.conf.get("spark.sql.shuffle.partitions", None)
        if shuffle_partitions is not None and got != str(shuffle_partitions):
            import logging

            logging.getLogger(__name__).warning(
                "get_spark: session already exists; requested "
                "shuffle_partitions=%s ignored (active: %s). Immutable "
                "confs (master, memory) cannot change on a live session.",
                shuffle_partitions,
                got,
            )
    return spark


def _any_session() -> SparkSession | None:
    """The live session regardless of thread: ``getActiveSession`` is
    THREAD-LOCAL, so a watchdog/cleanup thread other than the creator
    sees None — fall back to the process-wide instantiated session
    (PySpark's default-session equivalent)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return getattr(SparkSession, "_instantiatedSession", None)


def stop_spark() -> None:
    active = _any_session()
    if active is not None:
        active.stop()
