"""Hot-bucket handling shared by the banded LSH/sketch candidate
generators (``minhash_lsh_pairs``, ``simhash_pairs``,
``similarity.lsh_near_dup``).

A degenerate (band, bucket) group — boilerplate-dominated corpora where
near-constant documents collapse into one bucket — turns that group's
self-join quadratic. The ``max_bucket`` cap bounds it, but a silent cap
loses recall with no signal (and for SimHash's exact band-blocking,
loses exactness). Two policies, both accounted for:

- ``drop``: capped groups are excluded from candidate generation, and
  the dropped (group count, row count) is LOGGED — a skewed corpus is
  visible, never silent.
- ``route``: capped groups contribute STAR candidates instead — every
  member paired with the group's minimum id. O(B) extra candidates per
  hot bucket, not O(B²); the pairs flow through the same exact
  verification as every other candidate, and for the clustering
  consumers (``dedup_clusters`` / ``dedup_canonical``) star edges are
  exactly what's needed to keep a boilerplate component connected.
  All-pairs output inside a hot bucket is intrinsically quadratic —
  routing recovers the component at linear cost, trading only
  pair-level completeness *within* the bucket.

The bucket-size frame is PERSISTED and returned to the caller: the
accounting probe (one tiny aggregate over it) is the job that populates
the cache, and the action-time (keys, count) joins reuse those blocks —
the probe surfaces the signal at call time WITHOUT recomputing the size
aggregate later. Callers adopt the sizes frame onto their result
(``cache.adopt``) so the blocks are released with it. Laziness-critical
callers pass ``account=False`` to skip the probe (and the logging)
entirely — the split itself stays fully lazy.
"""

from __future__ import annotations

import logging
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

log = logging.getLogger(__name__)

HOT_POLICIES = ("drop", "route")


def split_hot_buckets(
    banded: DataFrame,
    keys: Sequence[str],
    max_bucket: int,
    *,
    label: str,
    policy: str = "drop",
    account: bool = True,
) -> tuple[DataFrame, DataFrame, tuple[int, int] | None, DataFrame]:
    """Partition a banded frame into (ok, hot) by group size and account
    for the hot side. Returns ``(ok, hot, stats, sizes)`` — ``stats`` =
    ``(n_groups, n_rows)`` of the over-cap groups (None with
    ``account=False``; a warning is logged when any exist), ``sizes`` =
    the persisted (keys, count) frame both filtered sides read: tie its
    lifetime to the operator result (``cache.adopt``). The size
    aggregate shuffles only (keys, count) — never document payloads —
    and is computed ONCE (the probe populates the cache the action
    reuses)."""
    keys = list(keys)
    sizes = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("_bn"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = None
    if account:
        row = (
            sizes.filter(F.col("_bn") > max_bucket)
            .agg(
                F.count("*").alias("k"),
                F.coalesce(F.sum("_bn"), F.lit(0)).alias("r"),
            )
            .first()
        )
        n_groups, n_rows = int(row["k"]), int(row["r"])
        stats = (n_groups, n_rows)
        if n_groups:
            log.warning(
                "%s: %d hot bucket group(s) holding %d rows exceed max_bucket=%d; "
                "policy=%s (%s; see operators/hot.py)",
                label,
                n_groups,
                n_rows,
                max_bucket,
                policy,
                "excluded from candidate generation"
                if policy == "drop"
                else "star-routed to the group representative",
            )
    joined = banded.join(sizes, keys)
    ok = joined.filter(F.col("_bn") <= max_bucket).drop("_bn")
    hot = joined.filter(F.col("_bn") > max_bucket).drop("_bn")
    return ok, hot, stats, sizes


def star_reps(
    hot: DataFrame,
    keys: Sequence[str],
    id_col: str = "id",
    carry: dict[str, str] | None = None,
) -> DataFrame:
    """Join each hot-group row with its group's representative: the
    minimum ``id_col`` (``_rep``), plus ``min_by``-selected companion
    columns (``carry`` maps output name -> source column — e.g. the
    representative's sketch). The per-group aggregate is tiny (one row
    per hot group, and hot groups number at most rows/max_bucket), so
    the join broadcasts."""
    keys = list(keys)
    aggs = [F.min(id_col).alias("_rep")]
    for out, col in (carry or {}).items():
        aggs.append(F.expr(f"min_by({col}, {id_col})").alias(out))
    mins = hot.groupBy(*keys).agg(*aggs)
    return hot.join(F.broadcast(mins), keys)
