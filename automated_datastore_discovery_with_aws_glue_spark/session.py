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
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
