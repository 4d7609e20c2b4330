"""Relational operator library — scans, filters, joins, aggregates, windows,
set ops, sorts/limits (SURVEY.md §2.1-§2.8) exercised as TPC-H-style queries
over the driver testdata.

Scale notes (the plans these produce at 100 TB):
- Star joins put the big fact (lineitem/orders) on the probe side and
  broadcast the small dims (region/nation always; customer/supplier under
  AQE's threshold at small SF, shuffle-hash beyond).
- Aggregates are partial (map-side combine) then final — guaranteed by using
  built-in aggregate functions, never UDAFs.
- Filters are written on base columns so Catalyst pushes them into the
  parquet scan (verified via .explain PushedFilters).
- Float aggregates use the exact-decimal technique in functions/__init__.py
  so results hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_demo_spark.functions import davg, dsum
from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables

# Shared oracle fragment: exact decimal revenue sum (see functions docstring).
# Rounded as DECIMAL first, cast to double second — ties like .385 are exact
# in decimal but not in binary, and the engines disagree on rounding them.
_REV = "CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE)"


def _rev_col():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# TPC-H Q15: top supplier by quarterly revenue (scalar-max tie semantics)
# ---------------------------------------------------------------------------
# Note: q2/q9/q11/q16/q20/q21 are NOT implementable on this testdata — the
# slimmed TPC-H schema has no partsupp table and no l_receiptdate /
# l_commitdate columns. Q15 completes the set of schema-expressible queries.
# Registered FIRST in this module so it takes the one remaining slot in the
# driver's 50-entry CORRECTNESS window — it was added late in round 3 and
# has never been driver-verified; every other relational gate has a green
# round-2/round-3 driver row.

@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue in 1996Q1 — the classic
    view-plus-scalar-subquery query, expressed as agg → 1-row max →
    broadcast equality join (ties preserved, matching the spec)."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev_col()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Flagship: revenue by region (scan+filter+4-way join+agg+sort; SURVEY §7.1)
# ---------------------------------------------------------------------------

@query(
    "flagship_revenue_by_region",
    oracle=f"""
    SELECT r_name,
           {_REV} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY r_name
    ORDER BY revenue DESC
    """,
)
def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(dsum(_rev_col()).alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q1: pricing summary (wide aggregate, partial-agg friendly)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l_discount AS DECIMAL(6,4))
                          * CAST(1 + l_tax AS DECIMAL(6,4))), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(_rev_col()).alias("sum_disc_price"),
            # charge has 6 true decimal digits — a double→decimal(18,4) cast
            # hits exact …50 ties the engines round differently; multiply in
            # exact decimal instead (factors are 2-decimal, tie-free casts).
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
                    * (F.lit(1) + F.col("l_tax")).cast("decimal(6,4)")
                ),
                2,
            ).cast("double").alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3: top unshipped orders (selective join + top-k with tiebreak)
# ---------------------------------------------------------------------------

@query(
    "q3_top_unshipped_orders",
    oracle=f"""
    SELECT l_orderkey,
           {_REV} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev_col()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5: local supplier volume (6-way join incl. two keys on nation)
# ---------------------------------------------------------------------------

@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_REV} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # supplier grows with SF: no forced broadcast — AQE/Catalyst
            # picks broadcast at small SF and shuffle join at scale
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_rev_col()).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q6: forecast revenue change (pure scan-filter-agg; fully pushed down)
# ---------------------------------------------------------------------------

@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10: returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV} AS revenue, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev_col()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12-style: late shipments per order priority (interval arithmetic + join)
# ---------------------------------------------------------------------------

@query(
    "q12_late_shipments_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q12_late_shipments_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q14-style: promo revenue share (conditional aggregation)
# ---------------------------------------------------------------------------

@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
           4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev_col()).otherwise(F.lit(0.0))
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast("decimal(18,4)")).cast("double")
                / F.sum(_rev_col().cast("decimal(18,4)")).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18-style: large-volume orders (join back on a grouped HAVING)
# ---------------------------------------------------------------------------

@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 140
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical Q18 shape: pre-aggregate lineitem by l_orderkey with the
    HAVING filter FIRST — the qualifying order set is ~1000× smaller than
    lineitem, so the orders/customer joins see a tiny build side (AQE picks
    broadcast at runtime) instead of joining the full fact table before
    aggregating. Grouping by l_orderkey is equivalent to the spec's
    4-column GROUP BY because o_orderkey is the orders key and each order
    has exactly one customer."""
    t = load_tables(spark, sf_dir)
    qual = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            dsum(F.col("l_quantity")).alias("total_qty"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_qty_exact"),
        )
        .filter(F.col("_qty_exact") > 140)
        .drop("_qty_exact")
    )
    return (
        qual.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


# ---------------------------------------------------------------------------
# Window function: top-3 customers per nation by balance
# ---------------------------------------------------------------------------

@query(
    "top3_customers_per_nation",
    oracle="""
    SELECT n_name, rank_in_nation, c_custkey, c_acctbal
    FROM (
      SELECT n_name, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rank_in_nation
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rank_in_nation <= 3
    ORDER BY n_name, rank_in_nation
    """,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select("n_name", "rank_in_nation", "c_custkey", "c_acctbal")
        .orderBy("n_name", "rank_in_nation")
    )


# ---------------------------------------------------------------------------
# ROLLUP: revenue at (region, nation), (region), and grand-total levels
# ---------------------------------------------------------------------------

@query(
    "revenue_rollup_region_nation",
    oracle=f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           {_REV} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
)
def revenue_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(dsum(_rev_col()).alias("revenue"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "revenue",
        )
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# Set operations: nations having both customers and suppliers / only customers
# ---------------------------------------------------------------------------

@query(
    "nations_customers_and_suppliers",
    oracle="""
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
    ORDER BY n_name
    """,
)
def nations_customers_and_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust_nations = t["nation"].join(
        t["customer"], F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    supp_nations = t["nation"].join(
        t["supplier"], F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    return cust_nations.intersect(supp_nations).orderBy("n_name")


@query(
    "nations_customers_only",
    oracle="""
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    EXCEPT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
                  WHERE s_acctbal > 5000
    ORDER BY n_name
    """,
)
def nations_customers_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust_nations = t["nation"].join(
        t["customer"], F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    supp_nations = t["nation"].join(
        t["supplier"].filter(F.col("s_acctbal") > 5000),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("n_name")
    # subtract == EXCEPT DISTINCT (exceptAll would keep unmatched duplicates)
    return cust_nations.subtract(supp_nations).orderBy("n_name")


# ---------------------------------------------------------------------------
# Anti join: customers that never ordered, per nation
# ---------------------------------------------------------------------------

@query(
    "customers_without_orders",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Semi join: suppliers in nations that have high-balance customers
# ---------------------------------------------------------------------------

@query(
    "suppliers_in_rich_nations",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM customer
                  WHERE c_nationkey = s_nationkey AND c_acctbal > 9000)
    ORDER BY s_suppkey
    """,
)
def suppliers_in_rich_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rich = t["customer"].filter(F.col("c_acctbal") > 9000)
    return (
        t["supplier"]
        .join(rich, F.col("c_nationkey") == F.col("s_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Distinct aggregates per group
# ---------------------------------------------------------------------------

@query(
    "distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Full outer join of two aggregates: customer vs supplier balance per nation
# ---------------------------------------------------------------------------

@query(
    "nation_balance_full_outer",
    oracle="""
    WITH cb AS (
      SELECT c_nationkey AS nk,
             CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS cust_balance
      FROM customer GROUP BY c_nationkey
    ), sb AS (
      SELECT s_nationkey AS nk,
             CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS supp_balance
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cb.nk, sb.nk) AS nationkey, cust_balance, supp_balance
    FROM cb FULL OUTER JOIN sb ON cb.nk = sb.nk
    ORDER BY nationkey
    """,
)
def nation_balance_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cb = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(dsum(F.col("c_acctbal")).alias("cust_balance"))
    )
    sb = (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(dsum(F.col("s_acctbal")).alias("supp_balance"))
    )
    return (
        cb.join(sb, F.col("cnk") == F.col("snk"), "full_outer")
        .select(
            F.coalesce("cnk", "snk").alias("nationkey"),
            "cust_balance",
            "supp_balance",
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Events: hourly stats (date_trunc + multi-agg; streaming-shaped workload)
# ---------------------------------------------------------------------------

@query(
    "events_hourly_stats",
    oracle="""
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY DATE_TRUNC('day', ts), event_type
    ORDER BY day, event_type
    """,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(F.col("value")).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# Events: JSON extraction from the props column
# ---------------------------------------------------------------------------

@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Events: sessionization via window lag (gap > 30 min starts a new session)
# ---------------------------------------------------------------------------

@query(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    ORDER BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = t["events"].withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            # double cast: TIMESTAMP_NTZ has no direct →long; the session
            # timezone is pinned UTC so →timestamp is a reinterpretation
            | (F.col("ts").cast("timestamp").cast("long")
               - F.lag("ts").over(w).cast("timestamp").cast("long") > 1800),
            1,
        ).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= 3)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Window aggregate comparison: orders priced above 1.5x the customer average
# ---------------------------------------------------------------------------

@query(
    "orders_above_customer_avg",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_sum,
             COUNT(*) OVER (PARTITION BY o_custkey) AS cust_cnt
      FROM orders
    )
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM w
    WHERE o_totalprice * cust_cnt > 1.5 * cust_sum
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = Window.partitionBy("o_custkey")
    enriched = (
        t["orders"]
        .withColumn("cust_sum", F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double"))
        .withColumn("cust_cnt", F.count("*").over(w))
    )
    return (
        enriched.filter(F.col("o_totalprice") * F.col("cust_cnt") > 1.5 * F.col("cust_sum"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# CASE / conditional bucketing + struct-ish projection
# ---------------------------------------------------------------------------

@query(
    "order_size_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY bucket, o_orderstatus
    """,
)
def order_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("bucket", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4: order priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------

@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a LEFT SEMI join — the fact side streams once, the semi
    join never duplicates order rows (no post-join dedup needed)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        ords.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q7: volume shipping between two nations (multi-join + year rollup)
# ---------------------------------------------------------------------------

@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {_REV} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast joins against the same dim (nation) under different
    roles; the cross-nation OR filter runs after both are attached."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    n1 = t["nation"].select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    li = t["lineitem"].filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    joined = (
        li.join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _rev_col().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("rev")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT (SURVEY §2.7 — Spark-native)
# ---------------------------------------------------------------------------

@query(
    "setops_customer_supplier_nations",
    oracle="""
    WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT nk FROM c UNION SELECT nk FROM s)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
    ORDER BY op
    """,
)
def setops_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].select(F.col("c_nationkey").alias("nk")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").alias("nk")).distinct()
    rows = [
        ("except", c.exceptAll(s).distinct().count()),
        ("intersect", c.intersect(s).count()),
        ("union", c.union(s).distinct().count()),
    ]
    return spark.createDataFrame(rows, "op string, n bigint")


# ---------------------------------------------------------------------------
# first() aggregate dedup (docs/spark-writes.md:136-141 INSERT OVERWRITE
# dedup pattern; deterministic because duplicate rows are identical)
# ---------------------------------------------------------------------------

@query(
    "dedup_first_agg",
    oracle="""
    WITH doubled AS (
      SELECT * FROM region UNION ALL SELECT * FROM region
    )
    SELECT r_regionkey, MIN(r_name) AS r_name, COUNT(*) AS n_copies
    FROM doubled
    GROUP BY r_regionkey
    ORDER BY r_regionkey
    """,
)
def dedup_first_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("region",))
    doubled = t["region"].unionAll(t["region"])
    return (
        doubled.groupBy("r_regionkey")
        .agg(F.first("r_name").alias("r_name"), F.count("*").alias("n_copies"))
        .orderBy("r_regionkey")
    )


# ---------------------------------------------------------------------------
# Q8-style: market share via conditional aggregation (CASE inside SUM)
# ---------------------------------------------------------------------------

@query(
    "q8_market_share",
    oracle=f"""
    WITH orders_in AS (
      SELECT o_orderkey, EXTRACT(year FROM o_orderdate) AS o_year
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           CAST(ROUND(
             SUM(CASE WHEN n_name = 'NATION_3'
                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END)
             / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 6)
           AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders_in ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation market share per order year: conditional aggregation
    (SUM(CASE...)/SUM(...)) over a 3-way star join — decimal-exact so the
    ratio hash-matches DuckDB."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier", "nation"))
    orders_in = (
        t["orders"]
        .filter((F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    rev_dec = _rev_col().cast("decimal(18,4)")
    joined = (
        t["lineitem"]
        .join(orders_in, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", rev_dec)
                      .otherwise(F.lit(0).cast("decimal(18,4)")))
                / F.sum(rev_dec),
                6,
            ).cast("double").alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q13-style: order-count distribution (left join + two-level aggregation)
# ---------------------------------------------------------------------------

@query(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers-per-order-count histogram: LEFT JOIN with an extra join-time
    predicate (not a post-filter — customers with only urgent orders must
    still count as 0), then a second aggregation over the first."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"].join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q17-style: small-quantity revenue (correlated per-group average threshold)
# ---------------------------------------------------------------------------

@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH thresholds AS (
      SELECT l_partkey AS t_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2) AS DOUBLE)
             AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thresholds ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < half_avg
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows below half their part's average quantity: the correlated
    aggregate becomes a pre-aggregated threshold table joined back to the
    fact (the scalable de-correlation — one extra partial agg instead of a
    per-row subquery)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg"))
    return (
        li.join(t["part"].filter(F.col("p_brand") == "Brand#1"),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0, 2)
            .cast("double").alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q19-style: OR-of-ANDs predicate (disjunctive pushdown)
# ---------------------------------------------------------------------------

@query(
    "q19_brand_size_revenue",
    oracle=f"""
    SELECT {_REV} AS revenue, COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive brand/size/quantity ranges: Catalyst
    splits the OR across the join — part-side conjuncts prune the build
    side, lineitem-side bounds (quantity ∈ [1,40]) push to the fact scan."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li, p = t["lineitem"], t["part"]
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(_rev_col()).alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Q22-style: idle wealthy customers (scalar subquery + NOT EXISTS anti-join)
# ---------------------------------------------------------------------------

@query(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the positive-balance average with no URGENT orders:
    scalar-subquery threshold (broadcast single row) + LEFT ANTI join against
    a filtered subquery, then per-nation totals."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c, o = t["customer"], t["orders"]
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o.filter(F.col("o_orderpriority") == "1-URGENT"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup (multi-granularity aggregation in one pass)
# ---------------------------------------------------------------------------

@query(
    "rollup_flag_status_qty",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS flag,
           COALESCE(l_linestatus, '<all>') AS status,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY flag, status
    """,
)
def rollup_flag_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): detail rows + per-flag subtotals
    + grand total in ONE aggregation pass (Spark expands grouping sets
    map-side — no extra scan per granularity, which is the scale win over
    running three GROUP BYs)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "sum_qty", "n",
        )
        .orderBy("flag", "status")
    )


@query(
    "cube_flag_status_price",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS flag,
           COALESCE(l_linestatus, '<all>') AS status,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY flag, status
    """,
)
def cube_flag_status_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): every granularity combination —
    detail, per-flag, per-status, grand total — in one aggregation pass
    (grouping sets expand map-side, same single-scan win as ROLLUP)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_extendedprice")).alias("sum_price"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "sum_price", "n",
        )
        .orderBy("flag", "status")
    )


@query(
    "quantity_percentiles_by_flag",
    oracle="""
    SELECT l_returnflag AS flag,
           quantile_disc(l_quantity, 0.25) AS p25,
           quantile_disc(l_quantity, 0.50) AS p50,
           quantile_disc(l_quantity, 0.75) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """,
)
def quantity_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (p25/p50/p75) of quantity per returnflag.

    Discrete (not interpolated) quantiles return an actual data value, so
    the cross-engine comparison is exact — no fp interpolation to diverge.
    DuckDB quantile_disc semantics: the smallest value whose cumulative
    row count covers ceil(p·n).

    Scale shape (value-counts formulation): ``l_quantity`` is a discrete
    low-cardinality domain (1–50), so we first aggregate to per-(flag,
    quantity) counts — a map-side-combined groupBy whose output is ~150
    rows at ANY input scale — then run the cumulative-coverage window over
    that tiny frame only. The smallest value v with cum(v) >= ceil(p·n)
    is exactly the value at rank ceil(p·n), so semantics are identical to
    the row-level rank formulation, but no fact-wide window exists in the
    plan: the only window sorts ≤50 rows per flag. For a continuous
    (non-discrete) column at 100 TB you'd switch to approx_percentile
    (t-digest, mergeable sketches); for discrete domains this IS the
    100 TB-safe exact shape.
    """
    t = load_tables(spark, sf_dir, ("lineitem",))
    from pyspark.sql import Window as W
    # 1 shuffle: partial-aggregated value counts, ~150 output rows total.
    vc = (
        t["lineitem"]
        .groupBy(F.col("l_returnflag").alias("flag"), "l_quantity")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Windows over the ~150-row counts frame (≤50 rows per flag partition).
    cum = vc.withColumn(
        "cum", F.sum("c").over(W.partitionBy("flag").orderBy("l_quantity"))
    ).withColumn("n", F.sum("c").over(W.partitionBy("flag")))
    agg = cum.groupBy("flag").agg(
        F.min(F.when(F.col("cum") >= F.ceil(0.25 * F.col("n")),
                     F.col("l_quantity"))).alias("p25"),
        F.min(F.when(F.col("cum") >= F.ceil(0.50 * F.col("n")),
                     F.col("l_quantity"))).alias("p50"),
        F.min(F.when(F.col("cum") >= F.ceil(0.75 * F.col("n")),
                     F.col("l_quantity"))).alias("p75"),
        F.sum("c").alias("n"),
    )
    return agg.orderBy("flag")


# ---------------------------------------------------------------------------
# Native session windows (F.session_window — the streaming-capable form)
# ---------------------------------------------------------------------------

@query(
    "events_session_window_stats",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ),
    g AS (
      SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
             date_diff('second', MIN(ts), MAX(ts)) AS span_s
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(SUM(span_s) AS BIGINT) AS total_active_s
    FROM g GROUP BY user_id
    HAVING COUNT(*) >= 2
    ORDER BY user_id
    """,
)
def events_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats via Spark's NATIVE ``session_window``
    (contrast events_sessionization above, which builds sessions by
    hand with LAG): dynamic-gap windows that merge while consecutive
    events are STRICTLY closer than the 30-minute gap (an exact-gap
    pair starts a new session — the oracle's ``>= INTERVAL 30 MINUTE``
    break mirrors that boundary). n_sessions / largest session /
    total active span (last-first per session; the window's ``end``
    carries the trailing gap, subtracted here) per user with ≥2
    sessions. Same-timestamp ties are order-insensitive: a 0 gap always
    merges, so the oracle needs no tiebreak.

    Scale shape: ONE shuffle on user_id; session assembly is Spark's
    native merging aggregation (updatable state — the same operator
    works over a stream with watermark eviction, which the LAG
    formulation cannot). The second aggregate reuses the user_id
    partitioning — no extra exchange (AQE folds it)."""
    t = load_tables(spark, sf_dir, ("events",))
    sess = (
        t["events"]
        .groupBy("user_id",
                 F.session_window(F.col("ts").cast("timestamp"),
                                  "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events",
                (F.unix_timestamp("sw.end") - F.unix_timestamp("sw.start")
                 - F.lit(1800)).alias("span_s"))
    )
    return (
        sess.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.max("n_events").alias("max_session_events"),
             F.sum("span_s").cast("bigint").alias("total_active_s"))
        .filter(F.col("n_sessions") >= 2)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# PIVOT / UNPIVOT (wide↔long reshaping; SURVEY §2.4 aggregation family)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_pivot_hourly_matrix",
    oracle=f"""
    WITH wide AS (
      SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
             {', '.join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _EVENT_TYPES)}
      FROM events GROUP BY 1
    ),
    long AS (
      SELECT hour_of_day, k AS event_type, v AS n
      FROM wide
      UNPIVOT (v FOR k IN ({', '.join(_EVENT_TYPES)}))
    )
    SELECT hour_of_day, event_type, CAST(n AS BIGINT) AS n
    FROM long WHERE n > 0
    ORDER BY hour_of_day, event_type
    """,
)
def events_pivot_hourly_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT then UNPIVOT round-trip: the hour-of-day × event-type count
    matrix built with DataFrame.pivot (explicit value list — no extra
    distinct-discovery pass, deterministic column order) and melted back
    to long form with DataFrame.unpivot, dropping empty cells. The
    round-trip is the point: both reshaping operators run in one query
    and the result is provably the plain GROUP BY — the wide form is a
    LAYOUT for consumers, never different data.

    Scale shape: pivot-with-values compiles to a two-level aggregate —
    map-side-combined (hour, type) partials, then the per-hour pivot
    fold — so both exchanges carry at most |hours|×|types| partial rows,
    never events (pivot WITHOUT a value list would first run a distinct
    scan to discover columns — always pass the list at scale); unpivot
    is a pure map (Expand over the 24 wide rows), no shuffle."""
    t = load_tables(spark, sf_dir, ("events",))
    wide = (
        t["events"]
        .select(F.hour(F.col("ts").cast("timestamp"))
                .cast("bigint").alias("hour_of_day"), "event_type")
        .groupBy("hour_of_day")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0, list(_EVENT_TYPES))
    )
    long = wide.unpivot(
        ["hour_of_day"], list(_EVENT_TYPES), "event_type", "n")
    return (long.filter(F.col("n") > 0)
            .select("hour_of_day", "event_type",
                    F.col("n").cast("bigint").alias("n"))
            .orderBy("hour_of_day", "event_type"))


@query("sql_pivot_unpivot", oracle=None)  # shares the pivot oracle below
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events_pivot_hourly_matrix round-trip expressed as SQL TEXT
    through ``Engine.sql`` over an engine catalog table (round 8,
    VERDICT r7 #8 — completing the SQL-surface parity theme of the
    round-7 SHOW/DESCRIBE work): Spark's native PIVOT clause (explicit
    value list with aliases) builds the wide hour-of-day × event-type
    matrix, the UNPIVOT clause melts it back, and the dotted table ref
    binds through the engine catalog like every other statement. Shares
    the DataFrame form's oracle — proving the two surfaces compute the
    same matrix.

    Scale shape: identical plan family to the DataFrame form — PIVOT
    with a value list compiles to the two-level partial aggregate
    (shuffles carry hour×type partials only), UNPIVOT is an Expand-only
    map. The engine-table copy is the gate's setup cost, not the
    query's, paid once per SF: the warehouse lives under the per-user
    scratch root and is reused across invocations (bench reps, oracle
    runs) instead of leaking a fresh tempdir per call."""
    from iceberg_demo_spark.engine import Engine
    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path

    eng = Engine(spark, scratch_path(f"glacier_sqlpivot_{_sf_tag(sf_dir)}"))
    # ALWAYS refresh db.ev from the live parquet: a warehouse keyed only
    # by the sf tag would silently serve stale rows if the testdata under
    # the same sf_dir were regenerated, while the shared DuckDB oracle
    # reads the live files — CTAS/RTAS is cheap at gate scale.
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select("event_type", "ts")
    if eng.catalog.table_exists("db.ev"):
        eng.catalog.replace_table_as("db.ev", ev)
    else:
        eng.catalog.create_table_as("db.ev", ev)
    in_list = ", ".join(f"'{t}' AS {t}" for t in _EVENT_TYPES)
    cols = ", ".join(_EVENT_TYPES)
    return eng.sql(f"""
        SELECT hour_of_day, event_type, CAST(n AS BIGINT) AS n FROM (
          SELECT * FROM (
            SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)
                     AS hour_of_day,
                   event_type
            FROM db.ev
          ) PIVOT (count(1) FOR event_type IN ({in_list}))
        ) UNPIVOT (n FOR event_type IN ({cols}))
        WHERE n > 0
        ORDER BY hour_of_day, event_type
    """)


from iceberg_demo_spark.registry import ORACLES as _RELORACLES  # noqa: E402

_RELORACLES["sql_pivot_unpivot"] = _RELORACLES["events_pivot_hourly_matrix"]


# ---------------------------------------------------------------------------
# Window-function matrix: rank / dense_rank / percent_rank / ntile /
# cume_dist semantics on ONE exchange, integer-exact
# ---------------------------------------------------------------------------

@query(
    "customer_balance_window_ranks",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ), r AS (
      SELECT c_custkey, c_nationkey, cents,
             row_number() OVER w_tb AS rn,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             ntile(4) OVER w_tb AS quartile,
             CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT)
               AS n,
             CAST(COUNT(*) OVER (
               PARTITION BY c_nationkey ORDER BY cents DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_ge
      FROM c
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY cents DESC),
             w_tb AS (PARTITION BY c_nationkey
                      ORDER BY cents DESC, c_custkey)
    )
    SELECT c_nationkey, rn, c_custkey, cents,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(drnk AS BIGINT) AS drnk,
           CAST(((rnk - 1) * 10000) // greatest(n - 1, 1) AS BIGINT)
             AS pr_bps,
           CAST(quartile AS BIGINT) AS quartile,
           CAST((n_ge * 10000) // n AS BIGINT) AS cd_bps
    FROM r WHERE rn <= 3
    ORDER BY c_nationkey, rn
    """,
)
def customer_balance_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window matrix on one frame: rank / dense_rank (ties
    on equal balance-cents), ntile(4) and the integer-exact forms of
    percent_rank (((rank−1)·10⁴) div (n−1)) and cume_dist ((peers-
    inclusive running count ·10⁴) div n — a RANGE-frame COUNT, so tied
    rows share the value exactly as cume_dist defines) — per nation over
    customer balances, top-3 rows per nation out. The native
    percent_rank()/cume_dist() return doubles; the div forms emit the
    same ordering information as oracle-hashable integers (the repo's
    standing float discipline).

    Scale shape: every window shares ONE c_nationkey exchange (the SCD2
    pattern — Spark plans a single Exchange feeding the Window chain,
    plan-pinned), and the rn ≤ 3 output bound keeps the result
    nation-sized. Balance cents: ROUND of an identical IEEE product to
    an INTEGER — engine-stable (the changelog_replication precedent)."""
    t = load_tables(spark, sf_dir, ("customer",))
    c = t["customer"].select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("cents"))
    w_tb = (Window.partitionBy("c_nationkey")
            .orderBy(F.desc("cents"), F.col("c_custkey")))
    w_n = Window.partitionBy("c_nationkey")
    w_ge = (Window.partitionBy("c_nationkey").orderBy(F.desc("cents"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    r = c.select(
        "c_nationkey", "c_custkey", "cents",
        F.row_number().over(w_tb).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w_tb).alias("quartile"),
        F.count(F.lit(1)).over(w_n).alias("n"),
        F.count(F.lit(1)).over(w_ge).alias("n_ge"))
    return (r.filter(F.col("rn") <= 3)
            .select("c_nationkey", "rn", "c_custkey", "cents",
                    F.col("rnk").cast("bigint").alias("rnk"),
                    F.col("drnk").cast("bigint").alias("drnk"),
                    F.expr("((rnk - 1) * 10000) div greatest(n - 1, 1)")
                     .cast("bigint").alias("pr_bps"),
                    F.col("quartile").cast("bigint").alias("quartile"),
                    F.expr("(n_ge * 10000) div n").cast("bigint")
                     .alias("cd_bps"))
            .orderBy("c_nationkey", "rn"))
