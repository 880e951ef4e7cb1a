"""Extended relational surface: the classic TPC-H-class query shapes not
already covered by plans/relational.py, adapted to the driver testdata
schema (no partsupp table; part joins go through lineitem.l_partkey).

These widen the declared capability surface beyond the reference's six
PartiQL scans (SURVEY §2.2): disjunctive pushdown, conditional and
distinct aggregates, correlated-EXISTS with an inequality, scalar
aggregate subqueries, aggregate-before-join, and HAVING — all shapes a
user migrating real reporting off the reference's state store will
write on day one.

Conventions match plans/relational.py: identical aliases both sides,
2dp money / 4dp fractions, dates as formatted strings, total ORDER BY
on every top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

def _rev() -> F.Column:
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive range filter + one global
    sum. Scale: every predicate and the 2-column projection reach the
    parquet reader (row-group stats prune whole chunks); the aggregate is
    a map-side partial -> single-row final, so the shuffle is #partitions
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""


def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality (orders having
    a lineitem shipped >=60 days after the order date), counted per
    priority. Scale: left-semi join — the build side is pre-filtered
    orders (date-range pruned), the probe side carries only
    (l_orderkey, l_shipdate); no row multiplication ever happens."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    late = filtered.join(
        li.select("l_orderkey", "l_shipdate"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer (top 20).
    Scale: lineitem is filtered on returnflag before the join; orders is
    date-pruned; nation (25 rows) broadcasts by hint, customer scales with
    the data so AQE picks its join strategy. The only big shuffle is
    lineitem⋈orders on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE inside SUM) after a
    fact-fact join. Scale: the CASE folds into the aggregate's partial
    step (map-side combine), so the shuffle carries 2 longs per
    (linestatus) group per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
    -- CAST: DuckDB integer sum() yields HUGEINT; Spark emits BIGINT.
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total aggregate (promo
    revenue share of a month). Scale: part scales with the data — no hard
    broadcast hint, AQE decides; both sums fold map-side; one row out."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(_rev()), 4).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per group with an exclusion
    filter (suppliers per brand/type/size, via lineitem since there is
    no partsupp). Scale: distinct-agg runs as two hash aggregates —
    partial distinct on (group, suppkey) map-side, then the count; the
    NOT-IN list is a literal filter pushed to the part scan. part scales
    with the data, so AQE picks the join strategy (no hard hint)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(
            p.filter(
                (F.col("p_brand") != "Brand#2")
                & F.col("p_size").isin(1, 5, 9, 12, 15, 20)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#2' AND p_size IN (1, 5, 9, 12, 15, 20)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped fact, then enrich. Scale:
    aggregate lineitem BEFORE joining (the groupBy shrinks 100 TB of
    lineitem to one row per order, and the >150 filter cuts that again)
    — joining first would shuffle the full fact twice. Customer scales
    with the data, so its join strategy is left to AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs over join columns (three brand/size/
    quantity envelopes). Scale: Catalyst factors the common l_partkey =
    p_partkey conjunct out of the disjunction so the join stays an
    equi-join, and pushes the per-side residuals (p_size bounds,
    l_quantity bounds) below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    c1 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    c2 = (
        (F.col("p_brand") == "Brand#22")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    c3 = (
        (F.col("p_brand") == "Brand#15")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(c1 | c2 | c3).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


Q19_SQL = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery + NOT EXISTS (rich
    customers with no order since 2000, per nation). Scale: the global
    average is one tiny aggregate broadcast to the filter; the NOT
    EXISTS is a left-anti join against the date-pruned o_custkey column;
    nation broadcasts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # the threshold average is ROUNDED before the compare (suite
    # convention): double partial-sum order differs between engines, and
    # a boundary customer within ulp noise of the raw mean would flip
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("_avg")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = """
    SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    ORDER BY n_name
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: rows equal to a global aggregate of an aggregate
    (supplier(s) with the quarter's max revenue). Scale: the revenue
    aggregate shrinks lineitem to one row per supplier; its max is a
    one-row broadcast; comparing on the 2dp-rounded value keeps the
    equality engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
    WITH rev AS (
        SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
"""


def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (SURVEY §2.7 — absent in the reference, declared via
    the Spark built-in): nations that field both customers and
    suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


U3_SQL = """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — the full grouping-set
    lattice (SURVEY §2.4 'not present' in the reference; Spark built-in,
    declared with an oracle). Subtotal rows are marked with
    ``grouping()`` flags (1 = the column is rolled up in this row), not
    by coalescing the value column — a genuine NULL data value in a
    grouped column therefore stays distinguishable from the subtotal
    row (a NULL value shows NULL with flag 0; the rollup shows 'ALL'
    with flag 1). Both engines compute GROUPING() natively."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.when(F.col("g_rf") == 1, F.lit("ALL"))
            .otherwise(F.col("l_returnflag"))
            .alias("returnflag"),
            F.when(F.col("g_ls") == 1, F.lit("ALL"))
            .otherwise(F.col("l_linestatus"))
            .alias("linestatus"),
            "g_rf",
            "g_ls",
            "n",
            "sum_qty",
        )
        .orderBy("g_rf", "g_ls", "returnflag", "linestatus")
    )


AGG_CUBE_SQL = """
    SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
           CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, returnflag, linestatus
"""


QUERIES = {
    "u3_intersect": u3_intersect,
    "agg_cube": agg_cube,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_late_shipments": q4_late_shipments,
    "q10_returned_revenue": q10_returned_revenue,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q14_promo_share": q14_promo_share,
    "q16_supplier_variety": q16_supplier_variety,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_idle_customers": q22_idle_customers,
    "q15_top_supplier": q15_top_supplier,
}

ORACLES = {
    "u3_intersect": U3_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q4_late_shipments": Q4_SQL,
    "q10_returned_revenue": Q10_SQL,
    "q12_priority_by_linestatus": Q12_SQL,
    "q14_promo_share": Q14_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q22_idle_customers": Q22_SQL,
    "q15_top_supplier": Q15_SQL,
}


# -- r7: temporal joins (operators/temporal.py) -----------------------------


def j_asof_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: every event enriched with the latest per-user "rate
    update" (a derived dimension: every 20th event publishes its value)
    at or before the event's timestamp — the time-series enrichment
    primitive Spark lacks natively, via the one-shuffle union +
    carry-forward formulation (``operators.temporal.asof_join``).
    DuckDB verifies with its NATIVE ASOF JOIN, so the whole semantics —
    latest-not-later, equal-ts inclusion, no-match NULLs — is
    differentially checked."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    rates = (
        ev.filter(F.col("event_id") % 20 == 0)
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("rate"))
    )
    out = asof_join(left, rates, "user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format(F.col("ts_r"), "yyyy-MM-dd HH:mm:ss").alias("rate_ts"),
        "rate",
    ).orderBy("event_id")


J_ASOF_RATE_SQL = """
    WITH rates AS (
        SELECT user_id, ts, round(max(value), 4) AS rate
        FROM events WHERE event_id % 20 = 0
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS rate_ts,
           r.rate
    FROM events e
    ASOF LEFT JOIN rates r ON e.user_id = r.user_id AND e.ts >= r.ts
    ORDER BY e.event_id
"""


def j_range_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (interval) JOIN: for every event, how many events of the
    same user land strictly within the next 5 minutes — the burst /
    follow-up-activity primitive. Bin-bucketed candidate generation
    (``operators.temporal.range_join_count``): both sides bucket into
    delta-wide bins and join on (key, bin±1), so candidate pairs are
    bounded by pairs within 2·delta instead of all same-key pairs —
    the quadratic-per-hot-key naive shape never materializes."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import range_join_count

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = range_join_count(
        ev, ev, "user_id", a_ts="ts", b_ts="ts", delta_us=5 * 60 * 1_000_000,
        a_row_id="event_id",
    )
    return out.select("event_id", "user_id", "n_in_range").orderBy("event_id")


J_RANGE_BURST_SQL = """
    SELECT a.event_id, a.user_id,
           CAST(count(b.event_id) AS BIGINT) AS n_in_range
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
    GROUP BY a.event_id, a.user_id
    ORDER BY a.event_id
"""

def j_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: every event enriched with the EARLIEST rate
    update at or after its timestamp — the look-ahead mirror of
    ``j_asof_rate`` (settlement-price / next-quote semantics). Same
    one-shuffle union + carry formulation, scanned in reverse; DuckDB
    verifies with its native ASOF JOIN on the flipped inequality."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    rates = (
        ev.filter(F.col("event_id") % 20 == 0)
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("rate"))
    )
    out = asof_join(left, rates, "user_id", left_ts="ts", right_ts="ts", direction="forward")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format(F.col("ts_r"), "yyyy-MM-dd HH:mm:ss").alias("rate_ts"),
        "rate",
    ).orderBy("event_id")


J_ASOF_FORWARD_SQL = """
    WITH rates AS (
        SELECT user_id, ts, round(max(value), 4) AS rate
        FROM events WHERE event_id % 20 = 0
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS rate_ts,
           r.rate
    FROM events e
    ASOF LEFT JOIN rates r ON e.user_id = r.user_id AND e.ts <= r.ts
    ORDER BY e.event_id
"""


def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: every event enriched with the rate update
    CLOSEST in absolute time (equidistant resolves backward — the
    pandas ``merge_asof`` rule). Both directional passes share the one
    key-hash shuffle (second pass is a sort within the same partition,
    plan-asserted in tests). DuckDB verifies with a LATERAL
    min-by-distance probe."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    rates = (
        ev.filter(F.col("event_id") % 20 == 0)
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("rate"))
    )
    out = asof_join(left, rates, "user_id", left_ts="ts", right_ts="ts", direction="nearest")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format(F.col("ts_r"), "yyyy-MM-dd HH:mm:ss").alias("rate_ts"),
        "rate",
    ).orderBy("event_id")


J_ASOF_NEAREST_SQL = """
    WITH rates AS (
        SELECT user_id, ts, round(max(value), 4) AS rate
        FROM events WHERE event_id % 20 = 0
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS rate_ts,
           r.rate
    FROM events e
    LEFT JOIN LATERAL (
        SELECT r.ts, r.rate
        FROM rates r
        WHERE r.user_id = e.user_id
        ORDER BY abs(epoch_us(r.ts) - epoch_us(e.ts)),
                 CASE WHEN r.ts <= e.ts THEN 0 ELSE 1 END
        LIMIT 1
    ) r ON true
    ORDER BY e.event_id
"""


def j_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-emitting RANGE JOIN: the actual (event, follow-up) pairs of
    the same user within the next 2 minutes, with payloads — the shape
    ``j_range_burst`` only tallies. Same bin-bucketed candidates
    (every pair lands in exactly one (key, bin) bucket, bounding
    candidates by pairs within 2·delta); DuckDB verifies with the
    plain inequality join."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = range_join(
        ev, ev, "user_id", a_ts="ts", b_ts="ts", delta_us=2 * 60 * 1_000_000
    )
    return out.select(
        "event_id",
        F.col("event_id_b").alias("next_event_id"),
        "user_id",
        (
            (F.unix_micros(F.col("ts_b")) - F.unix_micros(F.col("ts"))) / F.lit(1000000.0)
        ).alias("gap_sec"),
    ).orderBy("event_id", "next_event_id")


J_RANGE_PAIRS_SQL = """
    SELECT a.event_id,
           b.event_id AS next_event_id,
           a.user_id,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS DOUBLE) / 1000000.0 AS gap_sec
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 120000000
    ORDER BY a.event_id, next_event_id
"""


QUERIES["j_asof_rate"] = j_asof_rate
QUERIES["j_range_burst"] = j_range_burst
QUERIES["j_asof_forward"] = j_asof_forward
QUERIES["j_asof_nearest"] = j_asof_nearest
QUERIES["j_range_pairs"] = j_range_pairs
ORACLES["j_asof_rate"] = J_ASOF_RATE_SQL
ORACLES["j_range_burst"] = J_RANGE_BURST_SQL
ORACLES["j_asof_forward"] = J_ASOF_FORWARD_SQL
ORACLES["j_asof_nearest"] = J_ASOF_NEAREST_SQL
ORACLES["j_range_pairs"] = J_RANGE_PAIRS_SQL


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance (``state/scd.py scd2_apply``)
    over a customer-segment dimension: a deterministic md5-derived
    change batch — an in-batch NO-OP re-statement (suppressed), one or
    two genuine segment changes per selected key (intermediate versions
    chained in one batch), brand-new keys, plus pre-existing CLOSED
    history rows that must pass through untouched. The oracle replays
    the full version chain (lag-based no-op collapse, lead-based
    valid_to/is_current) in SQL."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.text import md5_hash64
    from automated_datastore_discovery_with_aws_glue_spark.state.scd import scd2_apply

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("segment")
    )

    def h(tag: str) -> F.Column:
        return md5_hash64(F.concat(F.lit(tag + "|"), F.col("k").cast("string")))

    dim = (
        cust.select(
            "k",
            "segment",
            F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .unionByName(
            cust.filter(h("h") % 9 == 0).select(
                "k",
                F.lit("OLD").alias("segment"),
                F.lit("2023-01-01").cast("timestamp").alias("valid_from"),
                F.lit("2024-01-01").cast("timestamp").alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
        )
    )
    changes = (
        cust.filter(h("c") % 5 == 0)
        .select("k", "segment", F.lit("2024-01-15").cast("timestamp").alias("ts"))
        .unionByName(
            cust.filter(h("a") % 4 == 0).select(
                "k",
                F.concat(F.lit("SEG_"), (F.col("k") % 5).cast("string")).alias(
                    "segment"
                ),
                F.lit("2024-02-01").cast("timestamp").alias("ts"),
            )
        )
        .unionByName(
            cust.filter(h("b") % 6 == 0).select(
                "k",
                F.concat(
                    F.lit("SEG_"), ((F.col("k") + 1) % 5).cast("string")
                ).alias("segment"),
                F.lit("2024-03-01").cast("timestamp").alias("ts"),
            )
        )
        .unionByName(
            cust.filter(h("d") % 25 == 0).select(
                (F.col("k") + 1_000_000).alias("k"),
                F.lit("NEW").alias("segment"),
                F.lit("2024-02-15").cast("timestamp").alias("ts"),
            )
        )
    )
    out = scd2_apply(dim, changes, "k", ["segment"])
    return out.select(
        F.col("k").alias("c_custkey"),
        "segment",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    ).orderBy("c_custkey", "valid_from")


_SCD2_H = "CAST(('0x' || substr(md5('{tag}|' || k), 1, 15)) AS BIGINT)"

SCD2_CUSTOMER_HISTORY_SQL = f"""
    WITH c AS (SELECT c_custkey AS k, c_mktsegment AS segment FROM customer),
    closed AS (
        SELECT k, 'OLD' AS segment,
               TIMESTAMP '2023-01-01' AS valid_from,
               TIMESTAMP '2024-01-01' AS valid_to,
               false AS is_current
        FROM c WHERE {_SCD2_H.format(tag='h')} % 9 = 0
    ),
    chain AS (
        SELECT k, segment, TIMESTAMP '2024-01-01' AS _ts, 0 AS _src FROM c
        UNION ALL
        SELECT k, segment, TIMESTAMP '2024-01-15', 1
        FROM c WHERE {_SCD2_H.format(tag='c')} % 5 = 0
        UNION ALL
        SELECT k, 'SEG_' || (k % 5), TIMESTAMP '2024-02-01', 1
        FROM c WHERE {_SCD2_H.format(tag='a')} % 4 = 0
        UNION ALL
        SELECT k, 'SEG_' || ((k + 1) % 5), TIMESTAMP '2024-03-01', 1
        FROM c WHERE {_SCD2_H.format(tag='b')} % 6 = 0
        UNION ALL
        SELECT k + 1000000, 'NEW', TIMESTAMP '2024-02-15', 1
        FROM c WHERE {_SCD2_H.format(tag='d')} % 25 = 0
    ),
    kept AS (
        SELECT k, segment, _ts, _src,
               lag(segment) OVER (PARTITION BY k ORDER BY _ts, _src) AS _prev
        FROM chain
        QUALIFY _prev IS NULL OR segment <> _prev
    ),
    ver AS (
        SELECT k, segment, _ts AS valid_from,
               lead(_ts) OVER (PARTITION BY k ORDER BY _ts, _src) AS valid_to
        FROM kept
    )
    SELECT k AS c_custkey, segment,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(valid_to, '%Y-%m-%d') AS valid_to,
           valid_to IS NULL AS is_current
    FROM ver
    UNION ALL
    SELECT k, segment,
           strftime(valid_from, '%Y-%m-%d'),
           strftime(valid_to, '%Y-%m-%d'),
           is_current
    FROM closed
    ORDER BY c_custkey, valid_from
"""

QUERIES["scd2_customer_history"] = scd2_customer_history
ORACLES["scd2_customer_history"] = SCD2_CUSTOMER_HISTORY_SQL


def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill over a 10% user slice of the event stream
    (`operators/temporal.py gapfill`): each user's observations land on
    an hourly grid spanning their own [first, last] bucket; empty
    buckets carry last-observation-forward and linear interpolation.
    The oracle replays the grid, the first-by-(ts, event_id) bucket
    pick, both IGNORE-NULLS fills, and the fixed-operand-order
    interpolation arithmetic."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import gapfill
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table as _lt

    ev = _lt(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    return gapfill(
        ev, "user_id", ts_col="ts", val_col="value", order_col="event_id"
    ).orderBy("user_id", "bucket_start_epoch")


TS_GAPFILL_HOURLY_SQL = """
    WITH e AS (
        SELECT user_id, ts, value, event_id,
               epoch_us(ts) // 3600000000 AS bucket
        FROM events WHERE user_id % 10 = 0
    ),
    obs AS (
        SELECT user_id, bucket, value AS v
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY user_id, bucket ORDER BY ts, event_id) AS rn
              FROM e)
        WHERE rn = 1
    ),
    span AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
             FROM obs GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM span),
    g AS (
        SELECT grid.user_id, grid.bucket, obs.v
        FROM grid LEFT JOIN obs USING (user_id, bucket)
    ),
    f AS (
        SELECT user_id, bucket, v,
               last_value(v IGNORE NULLS) OVER wb AS prev_v,
               last_value(CAST(round(v * 100) AS BIGINT) IGNORE NULLS)
                   OVER wb AS prev_q,
               last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
                   OVER wb AS prev_b,
               first_value(CAST(round(v * 100) AS BIGINT) IGNORE NULLS)
                   OVER wf AS next_q,
               first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
                   OVER wf AS next_b
        FROM g
        WINDOW wb AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket * 3600 AS bucket_start_epoch,
           v IS NOT NULL AS observed,
           round(v, 4) AS value,
           round(prev_v, 4) AS locf,
           round(CASE WHEN v IS NOT NULL THEN v
                      ELSE CAST(((prev_q * (next_b - bucket)
                                  + next_q * (bucket - prev_b)) * 200
                                 + (next_b - prev_b))
                                // (2 * (next_b - prev_b)) AS DOUBLE)
                           / 10000 END, 4) AS interp
    FROM f
    ORDER BY user_id, bucket_start_epoch
"""

QUERIES["ts_gapfill_hourly"] = ts_gapfill_hourly
ORACLES["ts_gapfill_hourly"] = TS_GAPFILL_HOURLY_SQL


def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source fidelity end-to-end: orders written as
    hive-partitioned ORC (partition column = o_orderstatus), read back,
    and aggregated. The oracle computes the same aggregate from the
    PARQUET original — equality proves the roundtrip preserved every
    value, type, and partition assignment (a dropped row, a mangled
    timestamp, or a partition-column loss all break the hash)."""
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import (
        orc_roundtrip,
        scratch_dir,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = scratch_dir("orc_rt_" + sf_dir)
    back = orc_roundtrip(spark, orders, path, partition_by="o_orderstatus")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.sum(F.col("o_orderkey") * F.col("o_custkey")).alias("key_fold"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
                "last_order"
            ),
        )
        .orderBy("o_orderstatus")
    )


SRC_ORC_ROUNDTRIP_SQL = """
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           CAST(sum(o_orderkey * o_custkey) AS BIGINT) AS key_fold,
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

QUERIES["src_orc_roundtrip"] = src_orc_roundtrip
ORACLES["src_orc_roundtrip"] = SRC_ORC_ROUNDTRIP_SQL


def w_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute HOPPING windows sliding every 5 minutes (F.window's
    slideDuration form — each event lands in exactly three overlapping
    windows): per (window, event_type) counts and exact integer-cents
    revenue. The sliding mode is the windowing shape tumbling can't
    express (a metric smoothed at finer grain than its span); the
    oracle replays the 3-window membership with generate_series."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                / F.lit(100.0)
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("bucket_start_epoch"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("bucket_start_epoch", "event_type")
    )


W_HOPPING_COUNTS_SQL = """
    WITH e AS (
        SELECT event_type,
               epoch_us(ts) // 300000000 AS b5,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT event_type, cents,
               unnest(generate_series(b5 - 2, b5)) * 300 AS bucket_start_epoch
        FROM e
    )
    SELECT bucket_start_epoch, event_type,
           count(*) AS n,
           CAST(sum(cents) AS BIGINT) / 100.0 AS total_value
    FROM m
    GROUP BY bucket_start_epoch, event_type
    ORDER BY bucket_start_epoch, event_type
"""

QUERIES["w_hopping_counts"] = w_hopping_counts
ORACLES["w_hopping_counts"] = W_HOPPING_COUNTS_SQL


def src_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (shuffle-free) fact-fact join via bucketed managed
    tables (`sources/readers.py bucketed_tables`): orders and lineitem
    are each written bucketed+sorted on their orderkey (8 buckets), so
    once the inputs outgrow the broadcast threshold the join plans with
    ZERO exchanges on either input — the pay-the-shuffle-once-at-write-
    time lever for joins that repeat every day at 100 TB (plan-asserted
    under a disabled-broadcast regime in `tests/test_readers.py`; at
    oracle sf the planner rightly broadcasts the small side instead). The oracle
    aggregates the parquet originals, so the bucketed write+read+join
    must also preserve every row and value."""
    import re as _re

    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import bucketed_tables

    tag = _re.sub(r"\W+", "_", sf_dir).strip("_")
    # bucket each side on ITS OWN join key (same bucket count) — the
    # co-location contract
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bo = bucketed_tables(
        spark, {f"orders_{tag}": orders}, key="o_orderkey", buckets=8
    )[f"orders_{tag}"]
    bl = bucketed_tables(
        spark, {f"lineitem_{tag}": li}, key="l_orderkey", buckets=8
    )[f"lineitem_{tag}"]
    return (
        bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias(
                "qty_cents"
            ),
        )
        .orderBy("o_orderstatus")
    )


SRC_BUCKETED_JOIN_SQL = """
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

QUERIES["src_bucketed_join"] = src_bucketed_join
ORACLES["src_bucketed_join"] = SRC_BUCKETED_JOIN_SQL


def j_stream_enrich_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval enrichment join (r9,
    `streaming/enrich.py stream_interval_join`): every purchase event
    joined to the same user's rate updates (every-20th-event feed)
    whose timestamp lies in the 5 minutes at-or-before the purchase —
    the EXACT builder the streaming pipeline runs (watermarks attach
    only on streaming inputs), so DuckDB checking this composition plus
    the streaming pytest checking stream==batch pins the whole path.
    Equi-key + time-range join: SortMergeJoin on user_id with a range
    residual, never a cartesian."""
    from automated_datastore_discovery_with_aws_glue_spark.streaming.enrich import stream_interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    rates = ev.filter(F.col("event_id") % 20 == 0).select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("rate")
    )
    out = stream_interval_join(
        purchases, rates, "user_id", lookback_sec=300, how="inner"
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("event_id_r").alias("rate_event_id"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("rate_ts"),
        "rate",
    ).orderBy("event_id", "rate_event_id")


J_STREAM_ENRICH_SQL = """
    SELECT a.event_id,
           a.user_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           b.event_id AS rate_event_id,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS rate_ts,
           round(b.value, 4) AS rate
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts <= a.ts
     AND epoch_us(a.ts) - epoch_us(b.ts) <= 300000000
    WHERE a.event_type = 'purchase' AND b.event_id % 20 = 0
    ORDER BY a.event_id, b.event_id
"""

QUERIES["j_stream_enrich_twin"] = j_stream_enrich_twin
ORACLES["j_stream_enrich_twin"] = J_STREAM_ENRICH_SQL


def w_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining §2.5 ranking-window surface in one plan: ntile,
    percent_rank, cume_dist, lag and lead sharing ONE (partition,
    order) frame — one exchange + one sort for all five expressions
    (the staged-withColumns trap plans a Window operator per stage;
    computing them in one select keeps a single Window node). Exact
    rational ranks round to 4dp identically in both engines (integer
    counts, one IEEE division)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
    ).orderBy("o_orderkey")


W_RANKING_SUITE_SQL = """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume,
           round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
           round(lead(o_totalprice, 1) OVER w, 2) AS next_price
    FROM orders
    WHERE o_orderkey % 5 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    ORDER BY o_orderkey
"""

QUERIES["w_ranking_suite"] = w_ranking_suite
ORACLES["w_ranking_suite"] = W_RANKING_SUITE_SQL
