"""Relational query surface (SURVEY §2.2-§2.8).

Every query shape the reference expresses (its six PartiQL scans, the
procedural Python joins, argmax-per-group, unions, membership filters, the
scalar-function set) re-expressed as declarative DataFrame plans over the
driver testdata tables, plus the classic analytic shapes (pricing summary,
multi-way join rollups) that prove the engine at scale.

Conventions, enforced so the DuckDB oracle hash-compares cleanly:
- every computed column is aliased identically here and in the oracle SQL
- float aggregates are rounded (2dp money, 4dp fractions/averages)
- timestamps leave as formatted strings (engine-neutral)
- any LIMIT/top-k has a total deterministic ORDER BY (explicit tiebreaks)

Scale notes are on each function: what shuffles, what broadcasts, what
prunes — written for a 1000-executor / 100 TB deployment even though the
harness runs local[32].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4) + classic analytics
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filtered group-by (A3-class single-pass
    wide aggregation).

    Scale: map-side partial aggregation on (returnflag, linestatus) —
    4-6 groups — means the shuffle carries only #partitions x #groups rows.
    The shipdate filter + 7-column projection push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def a1_argmax_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-group aggregate (ref `lambda/pii-report/app.py:244-263`):
    max timestamp per key, carrying a count.

    Scale: pure hash aggregate with map-side combine; no join needed.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.date_format(F.max("ts"), TS_FMT).alias("latest_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (ref information_schema scan,
    `lambda/rds-glue-initial/app.py:21-23`)."""
    cu = load_table(spark, sf_dir, "customer")
    return cu.select("c_mktsegment").distinct().orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# Filters / projections (SURVEY §2.2)
# ---------------------------------------------------------------------------

def p1_state_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive-equality full-row filter — the reference's P1-P5 PartiQL
    shape (`lambda/catalog-creator-s3/app.py:10`).

    Scale: both predicates push down to parquet row-group stats; at 100 TB
    the state table would additionally be partitioned by the filter key
    (see state/store.py) so this prunes to a handful of files.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") == 7))
        .select(
            "event_id",
            F.date_format("ts", TS_FMT).alias("ts_str"),
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
            "props",
        )
        .orderBy("event_id")
    )


def p6_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter — P6 (`lambda/pii-report/app.py:14-16`).
    Column pruning reaches the scan: only 3 of 6 columns are read."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "error") & (F.col("user_id") == 3))
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


def p9_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN membership predicates (ref tag-key membership +
    exception lists, `lambda/s3-tag-report/app.py:18,205-207`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("event_type").isin("click", "view") & ~F.col("user_id").isin(1, 2, 3)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


def p11_substring_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring containment gate
    (ref `lambda/rds-ddl-init/app.py:318-320`)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.instr(F.lower(F.col("text")), "vector") > 0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

def j1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-findings semi-join (ref `lambda/pii-report/app.py:244-283`):
    keep each key's most recent detail row. Window formulation — one
    shuffle on the partition key, no join.

    Scale: prefer this over join-against-argmax (one shuffle vs two);
    if a single key is hot, AQE skew handling splits it.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", TS_FMT).alias("ts_str"),
            "event_type",
        )
        .orderBy("user_id")
    )


def j2_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension enrichment join (ref column-comment join,
    `lambda/pii-report/app.py:162-198`): fact side joined to two tiny dims.

    Scale: nation/region are KBs — explicitly broadcast, so the customer
    scan never shuffles; the aggregate is map-side combined.
    """
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


def j3_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracker x external-attributes lookup join
    (ref `lambda/s3-tag-report/app.py:191-223`): per-row natural-key
    lookup, done as one join instead of N API calls.

    Scale: customer grows with the data — no hard broadcast hint (a hint
    would OOM the driver at 100x and disable AQE's fallback). AQE picks
    broadcast when the lookup side fits under the threshold, sort-merge
    otherwise."""
    orders = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_totalprice") > 400.0)
        .join(cu, orders.o_custkey == cu.c_custkey)
        .select(
            "o_orderkey",
            "c_name",
            "c_mktsegment",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


def j4_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match lookup (ref secret scan,
    `lambda/rds-glue-initial/app.py:129-162`) = deterministic top-1."""
    su = load_table(spark, sf_dir, "supplier")
    return (
        su.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .limit(1)
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k.

    Scale: customer is filtered before the join but still scales with the
    data, so no hard broadcast hint — AQE broadcasts it while it fits and
    falls back to shuffle join beyond that. orders/lineitem co-shuffle on
    orderkey once (Catalyst reuses the exchange). Top-10 executes as
    TakeOrderedAndProject — no global sort materialization.
    """
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-06-01").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join rollup; supplier/customer nation must
    match. Only the fixed-size dims (nation 25 rows, region 5) carry hard
    broadcast hints; customer/supplier scale with the data, so AQE decides
    their join strategy. The single big-big join (orders x lineitem)
    shuffles on orderkey only once."""
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# ---------------------------------------------------------------------------
# MERGE semantics (SURVEY §2.1 S8/S9) — the state-store mutation operators
# verified relationally over testdata-derived target/source frames
# ---------------------------------------------------------------------------

def s8_merge_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional insert (put-if-absent,
    `lambda/glue-tracking-initial/app.py:221-228`): matched keys keep the
    TARGET row untouched; only unmatched source rows are inserted."""
    from automated_datastore_discovery_with_aws_glue_spark.state.merge import merge_frames

    cu = load_table(spark, sf_dir, "customer")
    target = cu.filter(F.col("c_custkey") <= 700)
    source = cu.filter(F.col("c_custkey").between(500, 900)).withColumn(
        "c_name", F.concat(F.lit("NEW_"), F.col("c_name"))
    )
    merged = merge_frames(target, source, "c_custkey")
    return merged.select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal")
    ).orderBy("c_custkey")


def s9_merge_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point update (SET fields on matched keys,
    `lambda/catalog-creator-s3/app.py:119-145`): no inserts."""
    from automated_datastore_discovery_with_aws_glue_spark.state.merge import merge_frames

    cu = load_table(spark, sf_dir, "customer")
    target = cu.filter(F.col("c_custkey") <= 700)
    source = cu.filter(F.col("c_custkey").between(500, 900)).select("c_custkey")
    merged = merge_frames(
        target,
        source,
        "c_custkey",
        set_on_match={"c_mktsegment": F.lit("REVIEWED")},
        insert_not_matched=False,
    )
    return merged.select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal")
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------

def u1_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of per-source pipelines (ref: 3 near-identical per-source Glue
    jobs are logically one pipeline over a union — SURVEY U1)."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", F.lit("clickstream").alias("source_kind"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.lit("sales").alias("source_kind"))
    )
    return a.unionByName(b).orderBy("event_id")


def u2_anti_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-membership via anti-join (ref exception lists, SURVEY U2):
    users with no high-value purchase. Scale: left-anti beats NOT IN (which
    builds an unscalable in-filter); the exclusion set scales with the
    data, so no hard broadcast hint — AQE broadcasts it while small."""
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 195.0))
        .select("user_id")
        .distinct()
    )
    return (
        ev.select("user_id")
        .distinct()
        .join(signups, "user_id", "left_anti")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# ---------------------------------------------------------------------------

def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar-function set (F4-F9, F16) in one projection:
    sanitize-replace, lower, concat, substring, trim, split/element_at,
    coalesce. All JVM-side builtins — whole-stage codegen, no UDFs."""
    pa = load_table(spark, sf_dir, "part")
    return (
        pa.select(
            "p_partkey",
            F.regexp_replace(F.col("p_name"), "[- .]", "_").alias("sanitized_name"),
            F.lower(F.col("p_brand")).alias("brand_lower"),
            F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
            F.trim(F.col("p_name")).alias("trimmed_name"),
            F.element_at(F.split(F.col("p_type"), " "), 1).alias("type_head"),
            F.coalesce(F.col("p_brand"), F.lit("UNKNOWN")).alias("brand_or_default"),
        )
        .orderBy("p_partkey")
    )


def _exact_avg_value() -> list:
    """Deterministic avg(value) for the 2-decimal ``events.value`` data:
    sum exact integer cents (order-independent — double partial-sum
    ordering flips the 4th decimal of a float avg at sf >= 0.1), then
    half-up integer division to 1e-4 and one exact double division.
    Both engines compute identical integers, hence identical doubles."""
    cents = F.sum(F.round(F.col("value") * 100, 0).cast("long"))
    n = F.count(F.lit(1))
    return [
        n.alias("n"),
        ((cents * 200 + n) .cast("long")).alias("_c200n"),
    ]


def f10_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp parse/format + bucket (F10): hourly event rollup —
    also the batch equivalent of the tumbling-window stream agg (§2.9).
    ``avg_value`` uses exact cent arithmetic (see :func:`_exact_avg_value`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
            "event_type",
        )
        .agg(*_exact_avg_value())
        .withColumn("avg_value", F.expr("(_c200n div (2 * n)) / CAST(10000 AS DOUBLE)"))
        .select("hour_bucket", "event_type", "n", "avg_value")
        .orderBy("hour_bucket", "event_type")
    )


def f13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode of a wire-format column (F13 — ref SQS body
    `json.loads`, `lambda/glue-tracking-initial/app.py:114-117`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 purchases per user by value (SURVEY §2.5 —
    the engine's declared ranking surface beyond the argmax pattern)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "rk", "event_id", F.round("value", 2).alias("value"))
        .orderBy("user_id", "rk")
    )


# ---------------------------------------------------------------------------
# Extended analytic surface: semi joins, rollup, tumbling windows, explode
# ---------------------------------------------------------------------------

def j_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style left-semi join: customers with at least one order above
    a price threshold (the relational form of the reference's "has a
    matching row" gates, e.g. `lambda/rds-glue-initial/app.py:149-160`).

    Scale: LEFT SEMI shuffles only the join keys of the filtered orders
    side and short-circuits on first match; no row multiplication, no
    payload columns move."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450.0)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def a3_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: per-event-type totals plus the grand total in one
    pass (subtotal lattice; Spark expands grouping sets map-side, so the
    shuffle still carries one partial row per (grouping, partition)).

    NULL grouping markers are coalesced to 'ALL' so the frame is
    engine-neutral."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type_c"),
            "n",
            "total_value",
        )
        .orderBy("event_type_c")
    )


def w_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling-window counts via F.window — the batch twin of
    the Structured Streaming windowed aggregation (streaming/onboard.py
    uses the same expression with a watermark).

    The bucket leaves as epoch seconds (timezone-proof on both engines);
    sub-day windows are epoch-aligned so results are absolute."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(*_exact_avg_value())
        .withColumn("avg_value", F.expr("(_c200n div (2 * n)) / CAST(10000 AS DOUBLE)"))
        .select(
            F.col("w.start").cast("long").alias("bucket_start_epoch"),
            "event_type",
            "n",
            "avg_value",
        )
        .orderBy("bucket_start_epoch", "event_type")
    )


def f_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: explode normalized words, global top-20 by
    frequency (F.explode + two-phase count; the unpivot/flatten shape the
    PII classifier uses internally via stack).

    Scale: count aggregates partially before the shuffle; the final
    top-20 is a TakeOrdered, not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


def p7_event_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-envelope validation (ref `lambda/s3-trigger/app.py:86-111`):
    parse the JSON payload, rebuild the CloudTrail-style nested envelope
    `{source, detail: {eventName, requestParameters}}`, then filter on
    nested fields (P7) with a required-field NOT NULL guard (P8) and
    extract a nested leaf (F15 / F13 from_json).

    Scale: from_json + struct access is whole-stage codegen'd; the
    conjunctive equality filter collapses to a pushable predicate on the
    flat source columns, so Catalyst prunes the scan exactly as if the
    envelope never existed.
    """
    ev = load_table(spark, sf_dir, "events")
    env = ev.select(
        "event_id",
        F.struct(
            F.concat(F.lit("aws."), F.col("event_type")).alias("source"),
            F.struct(
                F.col("event_type").alias("eventName"),
                F.from_json("props", "k BIGINT").alias("requestParameters"),
            ).alias("detail"),
        ).alias("evt"),
    )
    return (
        env.filter(
            (F.col("evt.source") == "aws.purchase")
            & (F.col("evt.detail.eventName") == "purchase")
            & F.col("evt.detail.requestParameters.k").isNotNull()
        )
        .select("event_id", F.col("evt.detail.requestParameters.k").alias("k"))
        .orderBy("event_id")
    )


def p10_tag_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-equality gate + map subset-projection (ref
    `lambda/s3-trigger/app.py:14-18,217-239` and REQUIRED_TAG_KEYS
    filtering at `lambda/s3-tag-report/app.py:18,205-207`): build a tag
    map per row, keep only the governed keys with `map_filter` (F14),
    pass rows iff tags['gdpr-scan'] == 'true' (P10), project a kept tag.

    Scale: the map is constructed and filtered inside one codegen'd
    projection; the gate folds to a plain column predicate, so no row
    ever materializes a map it doesn't need.
    """
    docs = load_table(spark, sf_dir, "documents")
    tags = F.create_map(
        F.lit("gdpr-scan"),
        F.when(F.col("source").isin("src1", "src2", "src3"), F.lit("true")).otherwise(F.lit("false")),
        F.lit("origin"),
        F.col("source"),
        F.lit("lang"),
        F.col("lang"),
    )
    kept = F.map_filter(tags, lambda k, _v: k.isin("gdpr-scan", "origin"))
    return (
        docs.select("doc_id", kept.alias("tags"))
        .filter(F.col("tags")["gdpr-scan"] == "true")
        .select("doc_id", F.col("tags")["origin"].alias("origin"))
        .orderBy("doc_id")
    )
