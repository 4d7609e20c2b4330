"""Salted skew-handling operators: equivalence to unsalted forms and the
parallelism claim (hot keys actually split across sub-keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_demo_spark import registry
from iceberg_demo_spark.operators.skew import salted_join, salted_sum_count
from tests.conftest import SF_MED

registry.load_all()


def test_salted_agg_equals_plain(spark):
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet")
    got = {tuple(r) for r in salted_sum_count(li, "l_returnflag", "l_quantity")
           .select("l_returnflag", F.round("total", 2).alias("t"), "cnt").collect()}
    want = {tuple(r) for r in li.groupBy("l_returnflag")
            .agg(F.round(F.sum("l_quantity"), 2).alias("t"),
                 F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want


def test_salted_agg_splits_hot_keys(spark):
    """The phase-1 partial aggregate must produce many sub-groups per hot
    key — that is the whole point (parallel reducers)."""
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("l_quantity")), F.lit(16)))
    per_key = (salted.groupBy("l_returnflag", "_salt").count()
               .groupBy("l_returnflag").count().collect())
    assert all(r["count"] >= 8 for r in per_key), per_key


def test_salted_join_equals_plain(spark):
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice")
    dim = (li.select(F.col("l_returnflag")).distinct()
           .withColumn("label", F.concat(F.lit("f_"), F.col("l_returnflag"))))
    got = salted_join(li, dim, "l_returnflag")
    want = li.join(dim, "l_returnflag")
    assert got.count() == want.count()
    g = {tuple(r) for r in got.groupBy("label")
         .agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()}
    w = {tuple(r) for r in want.groupBy("label")
         .agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()}
    assert g == w
