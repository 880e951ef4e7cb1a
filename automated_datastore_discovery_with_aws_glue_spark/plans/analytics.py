"""Behavioral / record-linkage analytics plans.

Event-funnel conversion, cohort retention, and sorted-neighborhood
entity resolution — the three classic "product analytics + data
cleaning" shapes a datastore-discovery engine is pointed at right
after profiling (the reference's discovery pipeline stops at
classification; these extend the same declared-query surface the
driver hash-checks).

Scale notes (100 TB):

- ``ev_funnel`` cascades per-step aggregates joined on ``user_id`` —
  every shuffle keys on the same column so AQE reuses the exchange;
  per-step state is one row per qualifying user, never the raw events.
- ``ev_cohort_retention`` is two keyed aggregates (user -> first week,
  then (cohort, offset) -> distinct users) plus a broadcast of the
  per-week cohort sizes (one row per calendar week — metadata scale).
- ``er_sorted_neighborhood`` is the blocked sorted-neighborhood method
  (Hernandez & Stolfo 1995): one shuffle to sort within blocks, then a
  pure EQUI-join on (block, rank+offset) — candidate pairs are
  ``block_size * window``, never all-pairs. Block key choice is the
  scale lever: longer prefixes -> more, smaller blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_WINDOW_DAYS = 7
_ER_NEIGHBORS = 5
_ER_MAX_DIST = 2


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel: users completing view -> click -> purchase,
    each later step inside ``_FUNNEL_WINDOW_DAYS`` of the user's FIRST
    step-1 event, steps strictly ordered by timestamp.

    Implementation is a cascade of per-user min-timestamp aggregates,
    each joined back to the (filtered) event stream on ``user_id`` —
    the step state is one row per user who reached the step, so the
    funnel never materializes more than the user dimension."""
    ev = load_table(spark, sf_dir, "events")
    deadline = F.col("t1") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_DAYS} DAYS")

    s1 = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _count(df: DataFrame, idx: int) -> DataFrame:
        return df.agg(F.count("*").alias("users")).select(
            F.lit(idx + 1).alias("step_idx"),
            F.lit(_FUNNEL_STEPS[idx]).alias("step_name"),
            "users",
        )

    counts = _count(s1, 0).union(_count(s2, 1)).union(_count(s3, 2))
    w = Window.orderBy("step_idx")
    return counts.select(
        "step_idx",
        "step_name",
        "users",
        F.round(
            F.col("users").cast("double") / F.first("users").over(w), 4
        ).alias("pct_of_first"),
    ).orderBy("step_idx")


EV_FUNNEL_SQL = f"""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
          AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
          AND e.ts >= s2.t2 AND e.ts <= s2.t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
        GROUP BY e.user_id
    ),
    counts AS (
        SELECT 1 AS step_idx, '{_FUNNEL_STEPS[0]}' AS step_name, count(*) AS users FROM s1
        UNION ALL
        SELECT 2, '{_FUNNEL_STEPS[1]}', count(*) FROM s2
        UNION ALL
        SELECT 3, '{_FUNNEL_STEPS[2]}', count(*) FROM s3
    )
    SELECT step_idx, step_name, users,
           round(CAST(users AS DOUBLE)
                 / first_value(users) OVER (ORDER BY step_idx), 4) AS pct_of_first
    FROM counts
    ORDER BY step_idx
"""


def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = ISO week of a user's first
    event; for each (cohort, week-offset), the distinct users active
    that week and the retention rate against the cohort's size.

    Two keyed aggregates (both with map-side partials) plus a
    broadcast join of the per-week cohort sizes — the size table is
    one row per calendar week, metadata scale at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cw",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cw"))
                / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cw", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    sizes = first.groupBy("cw").agg(F.count("*").alias("cohort_size"))
    return (
        act.join(F.broadcast(sizes), "cw")
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_size"), 4
            ).alias("retention_rate"),
        )
        .orderBy("cohort_week", "week_offset")
    )


EV_COHORT_RETENTION_SQL = """
    WITH f AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT f.cw,
               CAST(datediff('day', f.cw, date_trunc('week', e.ts)) // 7 AS INT)
                   AS week_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN f ON e.user_id = f.user_id
        GROUP BY 1, 2
    ),
    s AS (SELECT cw, count(*) AS cohort_size FROM f GROUP BY cw)
    SELECT strftime(a.cw, '%Y-%m-%d') AS cohort_week,
           a.week_offset, a.active_users, s.cohort_size,
           round(CAST(a.active_users AS DOUBLE) / s.cohort_size, 4)
               AS retention_rate
    FROM a JOIN s ON a.cw = s.cw
    ORDER BY cohort_week, week_offset
"""


def _er_entities(parts: DataFrame) -> DataFrame:
    """Deterministic dirty-entity fixture: name+brand strings with a
    last-character truncation injected on every 7th key — the
    seeded-corruption pattern the generate/media fixtures use, so both
    engines derive identical inputs from the raw table."""
    base = F.concat_ws(" ", "p_name", "p_brand")
    entity = F.when(
        F.col("p_partkey") % 7 == 0,
        F.substring(base, 1, F.length(base).cast("int") - 1),
    ).otherwise(base)
    return parts.select("p_partkey", entity.alias("entity"))


def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernandez & Stolfo 1995)
    over noisy name+brand part entities: sort within prefix blocks,
    compare each record to its next ``_ER_NEIGHBORS`` neighbors, keep
    pairs within Levenshtein distance ``_ER_MAX_DIST``.

    The neighbor comparison is a pure equi-join on
    ``(block, rank + offset)`` — candidates are ``O(rows * window)``,
    never all-pairs, and the only shuffle is the per-block sort.
    Reference scope: the discovery pipeline's column-level PII match
    (src/.../glue_jobs, classification) has no record-linkage stage —
    this is the row-level analogue a cleanup pass needs."""
    parts = load_table(spark, sf_dir, "part")
    ent = _er_entities(parts).withColumn(
        "block", F.substring("entity", 1, 4)
    )
    w = Window.partitionBy("block").orderBy("entity", "p_partkey")
    ranked = ent.withColumn("rn", F.row_number().over(w))
    probe = ranked.select(
        F.col("p_partkey").alias("id_a"),
        F.col("entity").alias("entity_a"),
        "block",
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + _ER_NEIGHBORS)
        ).alias("rn"),
    )
    cand = probe.join(
        ranked.select(
            F.col("p_partkey").alias("id_b"),
            F.col("entity").alias("entity_b"),
            "block",
            "rn",
        ),
        ["block", "rn"],
    )
    return (
        cand.withColumn("dist", F.levenshtein("entity_a", "entity_b"))
        .filter(F.col("dist") <= _ER_MAX_DIST)
        .select("id_a", "id_b", "entity_a", "entity_b", "dist")
        .orderBy("id_a", "id_b")
    )


ER_SORTED_NEIGHBORHOOD_SQL = f"""
    WITH e AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 7 = 0
                    THEN substring(b, 1, length(b) - 1)
                    ELSE b END AS entity
        FROM (SELECT p_partkey, p_name || ' ' || p_brand AS b FROM part)
    ),
    t AS (
        SELECT p_partkey, entity, substring(entity, 1, 4) AS block,
               row_number() OVER (
                   PARTITION BY substring(entity, 1, 4)
                   ORDER BY entity, p_partkey) AS rn
        FROM e
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.entity AS entity_a, b.entity AS entity_b,
           levenshtein(a.entity, b.entity) AS dist
    FROM t a JOIN t b
      ON a.block = b.block
     AND b.rn BETWEEN a.rn + 1 AND a.rn + {_ER_NEIGHBORS}
    WHERE levenshtein(a.entity, b.entity) <= {_ER_MAX_DIST}
    ORDER BY id_a, id_b
"""


QUERIES = {
    "ev_funnel": ev_funnel,
    "ev_cohort_retention": ev_cohort_retention,
    "er_sorted_neighborhood": er_sorted_neighborhood,
}

ORACLES = {
    "ev_funnel": EV_FUNNEL_SQL,
    "ev_cohort_retention": EV_COHORT_RETENTION_SQL,
    "er_sorted_neighborhood": ER_SORTED_NEIGHBORHOOD_SQL,
}
