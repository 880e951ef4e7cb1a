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

The accounting probe is one tiny aggregate over the bucket-size frame
(an eager ``first()`` — the only way to surface the signal at call time);
it runs only when ``max_bucket`` is set.
"""

from __future__ import annotations

import logging
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

log = logging.getLogger(__name__)

HOT_POLICIES = ("drop", "route")


def split_hot_buckets(
    banded: DataFrame,
    keys: Sequence[str],
    max_bucket: int,
    *,
    label: str,
    policy: str = "drop",
) -> tuple[DataFrame, DataFrame, tuple[int, int]]:
    """Partition a banded frame into (ok, hot) by group size and account
    for the hot side. Returns ``(ok, hot, (n_groups, n_rows))`` where the
    counts describe the over-cap groups; logs a warning when any exist.
    The size aggregate shuffles only (keys, count) — never document
    payloads."""
    keys = list(keys)
    sizes = banded.groupBy(*keys).agg(F.count("*").alias("_bn"))
    stats = (
        sizes.filter(F.col("_bn") > max_bucket)
        .agg(
            F.count("*").alias("k"),
            F.coalesce(F.sum("_bn"), F.lit(0)).alias("r"),
        )
        .first()
    )
    n_groups, n_rows = int(stats["k"]), int(stats["r"])
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
    return ok, hot, (n_groups, n_rows)


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
