"""Temporal joins Spark's DataFrame API lacks as primitives — as-of
join and bounded range (interval) join — expressed as scalable
compositions of built-in operators (the task's canonical "custom
operator" examples; pandas-on-Spark has merge_asof, but this
formulation stays in the JVM plan with ONE shuffle and no Pandas).

As-of join (``asof_join``): for every left row, the single latest right
row of the same key with ``right_ts <= left_ts`` (backward direction;
optionally within ``tolerance``). The naive formulation — range join
then per-left argmax — explodes on skew (every left row joins every
earlier right row). The scalable classic used here: tag both sides,
UNION, and carry the last right payload forward with a
``last(ignorenulls)`` window over (key, ts) — one shuffle on the key,
state bounded by a single payload per row, no pair blowup at any skew.

Range join (``range_join_count`` / ``range_join``): pairs of the same
key with ``0 <= b.ts - a.ts <= delta``. The naive key-equijoin then
filter re-materializes all same-key pairs first — quadratic per hot
key. Here both sides bucket into ``delta``-wide time bins and join on
(key, bin) with b drawn from bins {bin, bin+1} — every qualifying pair
shares one of those bins, so candidates are bounded by pairs within
2*delta, then the exact predicate filters. This is the bin trick
range-join optimizers (including Spark's own range-join hints on
Databricks, and Flink's interval join) apply internally.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: each left row gains the latest right row of
    the same ``on`` key with ``right_ts <= left_ts`` (ties at equal ts
    match). Right columns (except the key) come back suffixed; left
    rows with no match (or outside ``tolerance_us``) keep NULLs —
    left-join semantics. Deterministic: among right rows sharing
    (key, ts) the greatest payload struct wins."""
    r_payload = [c for c in right.columns if c != on]
    r_struct = F.struct(*[F.col(c) for c in r_payload])
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_r"),
        r_struct.alias("_rv"),
    )
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(r_tag.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lv"),
    )
    r_tag = r_tag.withColumn("_lv", F.lit(None).cast(l_tag.schema["_lv"].dataType))
    u = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (desc on _is_r), so
    # an equal-timestamp right row is visible to its left row; among
    # same-ts right rows the struct order breaks ties deterministically
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_r").desc(), F.col("_rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w)).filter(
        F.col("_is_r") == 0
    )
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.col("_m")[right_ts])
        ) <= F.lit(tolerance_us)
        carried = carried.withColumn(
            "_m", F.when(F.col("_m").isNotNull() & in_tol, F.col("_m"))
        )
    out_cols = [F.col("_lv")[c].alias(c) for c in left.columns]
    out_cols += [
        F.col("_m")[c].alias(c + suffix if c in left.columns or c == on else c)
        for c in r_payload
    ]
    return carried.select(*out_cols)


def range_join_count(
    df_a: DataFrame,
    df_b: DataFrame,
    on: str,
    *,
    a_ts: str = "ts",
    b_ts: str = "ts",
    delta_us: int = 300_000_000,
    count_col: str = "n_in_range",
    a_row_id: str | None = None,
) -> DataFrame:
    """For every ``df_a`` row: how many ``df_b`` rows of the same key
    fall in ``(a_ts, a_ts + delta_us]`` (strictly after, within delta).
    Bin-bucketed candidates (see module docstring), exact predicate on
    a LEFT join, one aggregate — every ``df_a`` row comes back exactly
    once, zero-match rows with count 0, DUPLICATE rows preserved as
    duplicates (each with its own count). ``a_row_id`` names a column
    already unique per row (an event id); when omitted a synthetic id
    is minted and the tagged frame localCheckpoint-pinned so the two
    references to it can never re-mint different ids."""
    if a_row_id is None:
        a0 = df_a.withColumn("_rid", F.monotonically_increasing_id()).localCheckpoint()
    else:
        a0 = df_a.withColumn("_rid", F.col(a_row_id))
    a = a0.select(
        "_rid",
        F.col(on).alias("_k"),
        F.unix_micros(F.col(a_ts)).alias("_ta"),
    ).withColumn("_bin", F.floor(F.col("_ta") / F.lit(delta_us)))
    b = (
        df_b.select(F.col(on).alias("_k"), F.unix_micros(F.col(b_ts)).alias("_tb"))
        .withColumn("_bin0", F.floor(F.col("_tb") / F.lit(delta_us)))
        .select(
            "_k", "_tb", F.explode(F.array(F.col("_bin0"), F.col("_bin0") - 1)).alias("_bin")
        )
    )
    hit = (
        (F.col("_tb") > F.col("_ta")) & (F.col("_tb") - F.col("_ta") <= F.lit(delta_us))
    ).cast("int")
    counts = (
        a.join(b, ["_k", "_bin"], "left")
        .groupBy("_rid")
        .agg(F.sum(F.coalesce(hit, F.lit(0))).alias(count_col))
    )
    return a0.join(counts, "_rid", "left").select(
        *df_a.columns, F.coalesce(F.col(count_col), F.lit(0)).alias(count_col)
    )
