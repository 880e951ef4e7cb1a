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
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains ONE right row of the same ``on``
    key (a column name or a composite-key list), chosen by
    ``direction``:

    - ``backward`` (default): latest right with ``right_ts <= left_ts``
      (ties at equal ts match; greatest payload struct wins ties).
    - ``forward``: earliest right with ``right_ts >= left_ts``
      (smallest payload struct wins ties).
    - ``nearest``: whichever of the two is closer in absolute time;
      equidistant resolves backward (pandas ``merge_asof`` rule).

    Right columns (except the key) come back suffixed; left rows with
    no match (or outside ``tolerance_us``) keep NULLs — left-join
    semantics. All directions are the same one-shuffle union+window
    composition: ``nearest`` adds a second sort within the already
    key-partitioned data, never a second shuffle."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]
    r_struct = F.struct(*[F.col(c) for c in r_payload])
    r_tag = right.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_r"),
        r_struct.alias("_rv"),
    )
    l_tag = left.select(
        *[F.col(c) for c in keys],
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
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_is_r").desc(), F.col("_rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward mirror: scan ts DESC so "last non-null" is the earliest
    # right row at-or-after the left row; _rv desc makes the SMALLEST
    # same-ts payload win (matches ORDER BY ts, payload LIMIT 1)
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").desc(), F.col("_is_r").desc(), F.col("_rv").desc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _in_tol(m, signed_diff):
        if tolerance_us is None:
            return m
        return F.when(m.isNotNull() & (signed_diff(m) <= F.lit(tolerance_us)), m)

    back_diff = lambda m: F.unix_micros(F.col("_ts")) - F.unix_micros(m[right_ts])  # noqa: E731
    fwd_diff = lambda m: F.unix_micros(m[right_ts]) - F.unix_micros(F.col("_ts"))  # noqa: E731

    if direction == "backward":
        carried = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w_back))
        carried = carried.filter(F.col("_is_r") == 0).withColumn(
            "_m", _in_tol(F.col("_m"), back_diff)
        )
    elif direction == "forward":
        carried = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w_fwd))
        carried = carried.filter(F.col("_is_r") == 0).withColumn(
            "_m", _in_tol(F.col("_m"), fwd_diff)
        )
    else:  # nearest: both passes share the single key-hash shuffle
        carried = (
            u.withColumn("_mb", F.last("_rv", ignorenulls=True).over(w_back))
            .withColumn("_mf", F.last("_rv", ignorenulls=True).over(w_fwd))
            .filter(F.col("_is_r") == 0)
        )
        mb = _in_tol(F.col("_mb"), back_diff)
        mf = _in_tol(F.col("_mf"), fwd_diff)
        carried = carried.withColumn("_mb2", mb).withColumn("_mf2", mf)
        pick_back = F.col("_mf2").isNull() | (
            F.col("_mb2").isNotNull()
            & (back_diff(F.col("_mb2")) <= fwd_diff(F.col("_mf2")))
        )
        carried = carried.withColumn(
            "_m", F.when(pick_back, F.col("_mb2")).otherwise(F.col("_mf2"))
        )
    out_cols = [F.col("_lv")[c].alias(c) for c in left.columns]
    out_cols += [
        F.col("_m")[c].alias(c + suffix if c in left.columns or c in keys else c)
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


def range_join(
    df_a: DataFrame,
    df_b: DataFrame,
    on: str,
    *,
    a_ts: str = "ts",
    b_ts: str = "ts",
    delta_us: int = 300_000_000,
    suffix: str = "_b",
) -> DataFrame:
    """Pair-emitting bounded range join: every (a, b) pair of the same
    ``on`` key with ``0 < b_ts - a_ts <= delta_us`` (b strictly after a,
    within delta) — the shape a join-then-aggregate-something-else
    caller needs where ``range_join_count`` only tallies. INNER
    semantics: zero-match ``df_a`` rows are absent.

    Same bin bucketing as the count form: each qualifying pair shares
    exactly one of b's bins {bin(b), bin(b)-1} with bin(a), so every
    pair is emitted EXACTLY once (no dedup pass) and candidates are
    bounded by pairs within ``2*delta_us`` — never the per-key
    quadratic of a key-equijoin-then-filter. ``df_b``'s columns come
    back suffixed where they collide with ``df_a``'s."""
    # b's timestamp must be a real payload column: when it IS the join
    # key it gets excluded from b_cols below and the bin expressions
    # would die with a bare KeyError instead of a usable message
    if b_ts == on:
        raise ValueError(
            f"range_join: b_ts ({b_ts!r}) cannot be the join key column "
            f"({on!r}) — the key joins by equality, not by range"
        )
    if a_ts == on:
        raise ValueError(
            f"range_join: a_ts ({a_ts!r}) cannot be the join key column ({on!r})"
        )
    if a_ts not in df_a.columns:
        raise ValueError(f"range_join: a_ts column {a_ts!r} not in df_a")
    if b_ts not in df_b.columns:
        raise ValueError(f"range_join: b_ts column {b_ts!r} not in df_b")
    b_cols = {
        c: (c + suffix if c in df_a.columns and c != on else c)
        for c in df_b.columns
        if c != on
    }
    # the suffix must actually disambiguate: feeding a prior range_join
    # output back in (it already has ts_b) would otherwise emit two
    # identically-named columns and fail later with AMBIGUOUS_REFERENCE
    out_names = list(df_a.columns) + list(b_cols.values())
    dup = {n for n in out_names if out_names.count(n) > 1}
    if dup:
        raise ValueError(
            f"range_join output column collision {sorted(dup)}: rename the "
            f"inputs or pass a different suffix"
        )
    if "_bin" in df_a.columns or "_bin" in df_b.columns:
        raise ValueError("range_join reserves the column name '_bin'")
    a = df_a.withColumn("_bin", F.floor(F.unix_micros(F.col(a_ts)) / F.lit(delta_us)))
    b = (
        df_b.select(
            F.col(on), *[F.col(c).alias(out) for c, out in b_cols.items()]
        )
        .withColumn("_bin0", F.floor(F.unix_micros(F.col(b_cols[b_ts])) / F.lit(delta_us)))
        .withColumn("_bin", F.explode(F.array(F.col("_bin0"), F.col("_bin0") - 1)))
        .drop("_bin0")
    )
    diff = F.unix_micros(F.col(b_cols[b_ts])) - F.unix_micros(F.col(a_ts))
    return (
        a.join(b, [on, "_bin"], "inner")
        .filter((diff > 0) & (diff <= F.lit(delta_us)))
        .drop("_bin")
    )


def gapfill(
    df: DataFrame,
    key: str | list[str],
    *,
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
    step_us: int = 3_600_000_000,
    interp_quant: int = 100,
) -> DataFrame:
    """Time-series gap filling (the ``time_bucket_gapfill`` shape of
    timeseries engines): bucket each key's observations to a regular
    ``step_us`` grid spanning [first, last] bucket PER KEY, and fill the
    empty buckets two ways —

    - ``locf``: last observation carried forward (NULL before the first
      observation);
    - ``interp``: linear interpolation between the neighboring
      observations (NULL outside them; equals ``value`` on observed
      buckets).

    A bucket with several observations keeps the FIRST by
    ``(ts, order_col)`` — a total, engine-portable tiebreak, never a
    sum whose float order could drift. Interpolation runs on
    observations QUANTIZED to ``1/interp_quant`` units: the weighted
    numerator and denominator are exact integers, and the only float
    ops are two single divisions — bit-portable by construction (a
    three-op float formula measurably drifts 1 ulp across engines when
    one of them contracts multiply-add to FMA).

    Shuffle shape: ONE hash exchange total. The input repartitions by
    the keys alone, which also satisfies the finer (key, bucket) dedup
    window (subset clustering), so the dedup, the neighbor windows and
    the lead window all share that single exchange and one sort. The
    grid then materializes MAP-SIDE: each observation row explodes
    ``sequence(bucket, next_bucket - 1)`` (its own bucket plus the gap
    rows it anchors), carrying the already-windowed fill neighbors —
    no span aggregate, no grid join, no second scan of the input.
    Per-key state is the span, so skewed keys cost their own span
    only."""
    keys = [key] if isinstance(key, str) else list(key)
    order = order_col or ts_col
    # integer floor-division (`div`), never float-divide-then-floor: a
    # correctly-rounded double quotient can land on the wrong side of an
    # integer boundary for large epochs
    bucket = F.unix_micros(F.col(ts_col)) - F.pmod(
        F.unix_micros(F.col(ts_col)), F.lit(step_us)
    )
    bucket = (bucket / F.lit(step_us)).cast("long")
    rn = F.row_number().over(
        Window.partitionBy(*keys, "bucket").orderBy(ts_col, order)
    )
    obs = (
        df.repartition(*[F.col(k) for k in keys])
        .withColumn("bucket", bucket)
        .withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .select(*keys, "bucket", F.col(val_col).alias("_v"))
    )
    obs = obs.withColumn(
        "_vq", F.round(F.col("_v") * interp_quant).cast("bigint")
    )
    obs_bucket = F.when(F.col("_v").isNotNull(), F.col("bucket"))
    # ALL window values in ONE projection over the deduped observation
    # rows (one per occupied bucket): the backward frame carries the
    # LOCF/interp left neighbor, the exclusive forward frame the interp
    # right neighbor, and lead() the next occupied bucket that bounds
    # this row's gap run. A NULL-valued observation stays a grid anchor
    # but is invisible to the fill columns (ignorenulls), exactly like
    # the former grid-join formulation.
    w = Window.partitionBy(*keys).orderBy("bucket")
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    anchors = obs.select(
        *keys,
        "bucket",
        "_v",
        F.last("_v", ignorenulls=True).over(wb).alias("_pv"),
        F.last("_vq", ignorenulls=True).over(wb).alias("_pq"),
        F.last(obs_bucket, ignorenulls=True).over(wb).alias("_pb"),
        F.first("_vq", ignorenulls=True).over(wf).alias("_nq"),
        F.first(obs_bucket, ignorenulls=True).over(wf).alias("_nb"),
        F.lead("bucket").over(w).alias("_ng"),
    )
    # map-side grid: each anchor emits itself plus the empty buckets up
    # to (excluding) the next anchor; the last anchor emits itself only.
    # For the anchor row (_gb == bucket) the exclusive forward neighbor
    # is only read when _v is NULL — where it coincides with the old
    # inclusive frame (the row's own contribution was NULL) — and for
    # gap rows the anchor's at-or-before/after-self neighbors are
    # exactly the gap's neighbors.
    g = anchors.select(
        *keys,
        F.col("bucket").alias("_ab"),
        "_v",
        "_pv",
        "_pq",
        "_pb",
        "_nq",
        "_nb",
        F.explode(
            F.sequence(
                F.col("bucket"), F.coalesce(F.col("_ng") - 1, F.col("bucket"))
            )
        ).alias("bucket"),
    )
    val = F.when(F.col("bucket") == F.col("_ab"), F.col("_v"))
    # exact integer weighted average of the quantized neighbors, rounded
    # to 4dp IN INTEGER SPACE (`(2x + d) div 2d`, the repo's half-up
    # idiom): a float `round()` at an exact tie — quarter-unit rationals
    # hit .5 at the 5th decimal constantly — is where engines disagree
    out_scale = 10_000
    if out_scale % interp_quant:
        raise ValueError("interp_quant must divide 10000")
    factor = out_scale // interp_quant
    # _den is NULLed on observed rows (prev_b == next_b == bucket):
    # ANSI `div` by zero would error even though `interp` never reads
    # the branch there
    g = g.withColumn("_val", val).withColumn(
        "_num",
        F.col("_pq") * (F.col("_nb") - F.col("bucket"))
        + F.col("_nq") * (F.col("bucket") - F.col("_pb")),
    ).withColumn(
        "_den", F.when(F.col("_nb") > F.col("_pb"), F.col("_nb") - F.col("_pb"))
    )
    interp = F.when(F.col("_val").isNotNull(), F.col("_val")).otherwise(
        F.expr(f"(_num * 2 * {factor} + _den) div (2 * _den)")
        / F.lit(float(out_scale))
    )
    return g.select(
        *keys,
        (F.col("bucket") * (step_us // 1_000_000)).alias("bucket_start_epoch"),
        F.col("_val").isNotNull().alias("observed"),
        F.round(F.col("_val"), 4).alias("value"),
        F.round(F.col("_pv"), 4).alias("locf"),
        F.round(interp, 4).alias("interp"),
    )
