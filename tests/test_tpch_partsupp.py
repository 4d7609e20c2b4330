"""TPC-H partsupp synthesis + the six previously-blocked queries (r7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_demo_spark.operators import tpch_partsupp as tp
from iceberg_demo_spark.sources import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ps(spark):
    return tp.build_partsupp(spark, SF).cache()


def test_partsupp_covers_lineitem_pairs(spark, ps):
    """Every (l_partkey, l_suppkey) pair in lineitem exists in partsupp —
    so q9/q20's composite-key joins are dense, as in real TPC-H."""
    li = load_tables(spark, SF, ("lineitem",))["lineitem"]
    missing = (li.select(F.col("l_partkey").alias("ps_partkey"),
                         F.col("l_suppkey").alias("ps_suppkey")).distinct()
               .join(ps, ["ps_partkey", "ps_suppkey"], "left_anti"))
    assert missing.count() == 0


def test_partsupp_every_part_stocked(spark, ps):
    """Every part has >= 4 suppliers (the synthetic union guarantees it —
    q2's per-part MIN is never over an empty group)."""
    part = load_tables(spark, SF, ("part",))["part"]
    under = (ps.groupBy("ps_partkey").agg(F.count("*").alias("n"))
             .join(part, F.col("p_partkey") == F.col("ps_partkey"),
                   "right")
             .filter(F.coalesce("n", F.lit(0)) < 4))
    assert under.count() == 0


def test_partsupp_keys_unique_and_valid(spark, ps):
    supp = load_tables(spark, SF, ("supplier",))["supplier"]
    n = ps.count()
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == n
    # every suppkey references a real supplier
    dangling = ps.join(supp, F.col("ps_suppkey") == F.col("s_suppkey"),
                       "left_anti")
    assert dangling.count() == 0
    # attribute ranges
    row = ps.agg(F.min("ps_availqty"), F.max("ps_availqty"),
                 F.min("ps_supplycost"), F.max("ps_supplycost")).collect()[0]
    assert 1 <= row[0] and row[1] <= 9999
    assert 1.0 <= row[2] and row[3] <= 999.0


def test_partsupp_cache_matches_rebuild(spark, ps):
    """The staged parquet equals a fresh rebuild (pure function of the
    immutable testdata)."""
    cached = tp.partsupp_df(spark, SF)
    assert cached.exceptAll(ps).count() == 0
    assert ps.exceptAll(cached).count() == 0


@pytest.mark.parametrize("name,fn", [
    ("q2", tp.q2_min_cost_supplier),
    ("q9", tp.q9_product_profit),
    ("q11", tp.q11_important_stock),
    ("q16", tp.q16_supplier_part_counts),
    ("q20", tp.q20_promotion_suppliers),
    ("q21", tp.q21_suppliers_kept_waiting),
])
def test_queries_nonempty_at_smallest_sf(spark, name, fn):
    """Filters were tuned so every gate is nonempty even at sf0.001
    (supplier nation coverage is sparse there)."""
    assert fn(spark, SF).count() > 0


def test_q21_late_flag_balanced(spark):
    """The arithmetic lateness surrogate marks a non-degenerate fraction
    of lines late (~53%) — the semi/anti joins have real work to do."""
    li = load_tables(spark, SF, ("lineitem",))["lineitem"]
    total = li.count()
    late = li.filter(F.expr(tp._LATE_SQL)).count()
    assert 0.3 * total < late < 0.7 * total
