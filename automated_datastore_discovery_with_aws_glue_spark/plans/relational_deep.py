"""Deep relational surface: the remaining TPC-H-class query shapes
(Q2/Q7/Q8/Q9/Q11/Q13/Q17/Q20/Q21 analogues), adapted to the driver
testdata schema — there is no partsupp table, so part↔supplier
relationships derive from lineitem, and no commit/receipt dates, so
"late" means shipped >= N days after the order date.

Together with plans/relational.py and plans/relational_ext.py this
completes a 22-query TPC-H-shaped suite: every classic shape — argmin
per group, bidirectional nation-pair joins, market-share case-sums,
global-threshold HAVING, outer-join histograms, correlated scalar
subqueries, nested semi-joins, and exists/not-exists combinations — has
an engine query and a DuckDB oracle.

Conventions match the sibling modules: identical column aliases on both
sides, 2dp money / 4dp fractions (rounded BEFORE any equality or
threshold compare so float noise can't flip boundaries), dates via
year()/timestamps, and a total ORDER BY on every result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (argmin-per-group + 4-way dim join)
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each LARGE size-5 part, the European
    supplier(s) whose observed supply cost (avg lineitem price for that
    part) is the part's minimum. Scale: cost aggregates lineitem down to
    one row per (part, supplier) before anything joins; the per-part min
    is a tiny second aggregate joined back on the 2dp-rounded value
    (engine-stable equality); nation/region broadcast by hint,
    part/supplier scale with the data so AQE decides their joins."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    parts = p.filter((F.col("p_size") == 5) & (F.col("p_type") == "LARGE"))
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.avg("l_extendedprice"), 2).alias("supply_cost"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
    )
    mins = cost.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("supply_cost").alias("_min_cost")
    )
    eur = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")  # nation/region: fixed-size dims
    )
    return (
        cost.join(
            mins,
            (F.col("l_partkey") == F.col("_pk"))
            & (F.col("supply_cost") == F.col("_min_cost")),
        )
        .join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "supply_cost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
    WITH cost AS (
        SELECT l_partkey, l_suppkey, round(avg(l_extendedprice), 2) AS supply_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM cost
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 5 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND supply_cost = (SELECT min(supply_cost) FROM cost c2
                         WHERE c2.l_partkey = cost.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (bidirectional pair join)
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flow between NATION_1 and NATION_2 in
    either direction, by year. Scale: both nation maps broadcast; the
    disjunctive pair predicate is applied AFTER the cheap broadcast
    joins attach n_name to each side, so lineitem shuffles only for the
    lineitem⋈orders equi-join; the final aggregate has ~(2 pairs × 2
    years) groups."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("_snk"))
        .join(n2, F.col("c_nationkey") == F.col("_cnk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — market share (conditional-sum ratio per year)
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_10 suppliers' share of PROMO-part revenue
    sold to ASIA customers, per year. Scale: the numerator is a
    conditional sum inside the same aggregate as the denominator — one
    pass, no self-join. nation/region broadcast by hint; the filtered
    part/customer/supplier sides scale with the data, so AQE picks their
    join strategies; the only guaranteed large shuffle is
    lineitem⋈orders."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    asia_cust = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = (
        s.join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("supp_nation"))
            ),
            F.col("s_nationkey") == F.col("_nk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    return (
        li.join(p.filter(F.col("p_type") == "PROMO").select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_10", _rev()).otherwise(F.lit(0.0)))
                / F.sum(_rev()),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
    SELECT year(o_orderdate) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_10'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    GROUP BY o_year
    ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on widget parts per supplier nation per
    year; cost approximated as 10% of retail price × quantity (the
    schema has no ps_supplycost). Scale: part pre-filtered on the LIKE
    (scales with data — AQE decides the join); nation broadcast by hint;
    one shuffle (groupBy on 25 nations × 7 years)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    # Decimal accumulation: the profit sum straddles cent boundaries, so a
    # double sum is order-sensitive across engines; per-row 4dp decimal makes
    # the aggregate exact and engine-independent.
    amount = (
        _rev() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    ).cast("decimal(28,4)")
    return (
        li.join(
            p.filter(F.col("p_name").like("%widget%")).select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity * 0.1 AS DECIMAL(28,4))), 2)
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 — important parts (HAVING vs global-threshold subquery)
# ---------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue from NATION_3 suppliers
    exceeds 0.1% of that nation's total. Scale: the per-part aggregate
    IS the input to the global total (reused, not recomputed — Spark
    caches nothing here but the plan reads the shuffle output twice at
    worst); the threshold is a one-row broadcast cross join. Both sides
    of the compare are rounded to 2dp."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nation_supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    per_part = (
        li.join(nation_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.round(F.sum(_rev()), 2).alias("part_value"))
    )
    thresh = per_part.agg(F.round(F.sum("part_value") * 0.001, 2).alias("_thresh"))
    return (
        per_part.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("_thresh"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
    WITH per_part AS (
        SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM per_part
    WHERE part_value > (SELECT round(sum(part_value) * 0.001, 2) FROM per_part)
    ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double groupBy)
# ---------------------------------------------------------------------------

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer including
    zero-order customers (left outer join), excluding URGENT orders.
    Scale: two shuffles by construction (join on custkey, then groupBy
    count-of-counts on ~dozens of distinct counts); the outer join keeps
    customer's side intact so no customer is lost before the histogram."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated scalar-avg subquery)
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from Brand#1 lineitems whose quantity is
    below 20% of that part's average quantity. Scale: the correlated
    scalar subquery decorrelates into an aggregate-then-join — the
    per-part average is computed over the SAME brand-filtered slice then
    joined back (both sides scale with part count, so AQE picks the
    strategy); the threshold is rounded to 4dp on both sides so the
    strict compare is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brand = li.join(
        p.filter(F.col("p_brand") == "Brand#1").select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = brand.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.round(F.avg("l_quantity") * 0.2, 4).alias("_limit")
    )
    return (
        brand.join(avg_qty, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
    WITH brand AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM brand b
    WHERE l_quantity < (SELECT round(avg(l_quantity) * 0.2, 4)
                        FROM brand b2 WHERE b2.l_partkey = b.l_partkey)
"""


# ---------------------------------------------------------------------------
# Q20 — above-threshold suppliers (nested semi-join chain)
# ---------------------------------------------------------------------------

def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers who moved more than half of
    the per-part maximum volume of some bolt part — a semi-join against
    an aggregate-derived threshold. Scale: per-(part,supplier) sums
    shrink lineitem first; the per-part max is a second small aggregate;
    the supplier list dedups via left-semi, never multiplying rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    bolt = li.join(
        p.filter(F.col("p_name").like("%bolt%")).select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty_sp = bolt.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_quantity"), 4).alias("qty")
    )
    mx = qty_sp.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.round(F.max("qty") * 0.5, 4).alias("_half_max")
    )
    qualifying = (
        qty_sp.join(mx, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("qty") > F.col("_half_max"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
               F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = """
    WITH qty_sp AS (
        SELECT l_partkey, l_suppkey, round(sum(l_quantity), 4) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND EXISTS (
          SELECT 1 FROM qty_sp
          WHERE l_suppkey = s_suppkey
            AND qty > (SELECT round(max(qty) * 0.5, 4) FROM qty_sp q2
                       WHERE q2.l_partkey = qty_sp.l_partkey)
      )
    ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (exists + not-exists combo)
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: NATION_5 suppliers who were the SOLE late
    supplier (shipped >= 60 days after order date) on a multi-supplier
    finalized order. Scale: the exists branch is a left-semi and the
    not-exists a left-anti against the same late-lineitem frame keyed by
    orderkey with a suppkey inequality — no row multiplication; order
    status pre-filters before any join; nation broadcasts by hint, the
    nation-filtered supplier side is left to AQE (it scales with data)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li1 = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn("late", F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    late1 = li1.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    all_supp = li1.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    ).distinct()
    late_supp = late1.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    sole_late = (
        late1.join(
            all_supp,
            (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
            "left_semi",
        )
        .join(
            late_supp,
            (F.col("l_orderkey") == F.col("_ok2")) & (F.col("l_suppkey") != F.col("_sk2")),
            "left_anti",
        )
    )
    return (
        sole_late.join(
            s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_5")),
                   F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
    WITH li1 AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate >= o_orderdate + INTERVAL 60 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    ),
    late1 AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM li1 WHERE late
    )
    SELECT s_name, count(*) AS numwait
    FROM late1 l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND EXISTS (SELECT 1 FROM li1 l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q13_order_distribution": q13_order_distribution,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q13_order_distribution": Q13_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
