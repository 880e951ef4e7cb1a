"""Slowly-changing-dimension Type 2 history as a pure DataFrame transform.

The reference's tracker keeps only the LATEST state of every item
(DynamoDB point updates, `lambda/catalog-creator-s3/app.py:119-145` —
each ``update_item`` destroys the previous value). SCD2 is the audited
twin every warehouse needs next to it: applying a change batch CLOSES
the current version (``valid_to`` = change time, ``is_current`` = false)
and opens a new one, so the dimension answers "what was this key's state
at time t" forever.

``scd2_apply`` is set-based (no per-row MERGE loop):

1. closed history rows pass through untouched;
2. each key's OPEN row and its batch changes form one ordered chain
   (``ts`` asc, open row first on ties);
3. a ``lag`` over the chain drops NO-OP changes (attributes equal to
   the previous chain row — equality is transitive over a run, so
   comparing to the raw predecessor collapses whole runs correctly);
4. a ``lead`` over the kept rows writes each version's ``valid_to`` /
   ``is_current``.

Multiple changes to one key IN ONE BATCH are legal and produce the full
intermediate version chain — the property a daily batch over a
faster-moving upstream needs.

Scale: one equi-shuffle on the key (the two windows share the
``partitionBy(key) orderBy(ts, src)`` sort, so Catalyst plans ONE
exchange + sort for both), no joins against the closed history (it
passes through on a union), no driver collects. At 100 TB the dimension
would be stored partitioned by key-hash range; the change batch shuffles
to the same partitioning and history partitions untouched by the batch
are copy-through.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str | list[str],
    tracked: list[str],
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Return the SCD2 dimension after applying ``changes``.

    ``dim`` columns: ``key..., tracked..., valid_from, valid_to,
    is_current`` (``valid_to`` NULL on open rows). ``changes`` columns:
    ``key..., tracked..., ts_col``. New keys open their first version at
    their first change's timestamp."""
    keys = [key] if isinstance(key, str) else list(key)
    closed = dim.filter(~F.col("is_current"))
    open_rows = dim.filter(F.col("is_current")).select(
        *keys,
        *tracked,
        F.col("valid_from").alias("_ts"),
        F.lit(0).alias("_src"),
    )
    batch = changes.select(
        *keys, *tracked, F.col(ts_col).alias("_ts"), F.lit(1).alias("_src")
    )
    chain = open_rows.unionByName(batch)

    w = Window.partitionBy(*keys).orderBy("_ts", "_src")
    attrs = F.struct(*[F.col(c) for c in tracked])
    prev = F.lag(attrs).over(w)
    kept = chain.withColumn("_prev", prev).filter(
        F.col("_prev").isNull() | (attrs != F.col("_prev"))
    )

    wk = Window.partitionBy(*keys).orderBy("_ts", "_src")
    nxt = F.lead("_ts").over(wk)
    versions = kept.select(
        *keys,
        *tracked,
        F.col("_ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
    return closed.select(versions.columns).unionByName(versions)
