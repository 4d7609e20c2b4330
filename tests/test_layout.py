"""Round-4 layout operators: bucketed co-located join, partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_demo_spark import registry
from tests.conftest import SF_SMALL

registry.load_all()


def test_bucketed_join_matches_plain_join(spark):
    got = {r["o_orderpriority"]: r for r in
           registry.QUERIES["bucketed_colocated_join"](spark, SF_SMALL)
           .collect()}
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    exp = {r["o_orderpriority"]: r for r in
           o.join(li, o.o_orderkey == li.l_orderkey)
           .groupBy("o_orderpriority")
           .agg(F.countDistinct("o_orderkey").alias("n_orders"),
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("revenue"))
           .collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert (got[k]["n_orders"], got[k]["n_lines"]) == (
            exp[k]["n_orders"], exp[k]["n_lines"])
        assert abs(got[k]["revenue"] - exp[k]["revenue"]) < 0.02


def test_bucketed_write_produces_bucket_files(spark, tmp_path):
    from iceberg_demo_spark.operators.layout import write_bucketed

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_bucketed(df, "k", "glacier_bk_probe", str(tmp_path / "bk"),
                   n_buckets=4)
    files = [f for f in (tmp_path / "bk").rglob("*.parquet")]
    # bucket id is encoded in the file name: part-*_00000.c000 etc.
    buckets = {f.name.split("_")[-1].split(".")[0] for f in files}
    assert len(buckets) == 4
    got = dict(spark.table("glacier_bk_probe")
               .select("k", "v").rdd.map(tuple).collect())
    assert got == {i: i * 2 for i in range(100)}


def test_partition_pruned_scan_matches_filter(spark):
    got = {r["l_linestatus"]: r for r in
           registry.QUERIES["partition_pruned_scan"](spark, SF_SMALL)
           .collect()}
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    exp = {r["l_linestatus"]: r for r in
           li.filter(F.col("l_returnflag") == "R")
           .groupBy("l_linestatus")
           .agg(F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k]["n_lines"] == exp[k]["n_lines"]
        assert abs(got[k]["total_qty"] - exp[k]["total_qty"]) < 0.02


def test_bucket_pruning_on_key_filter(spark, tmp_path):
    """A point filter on the bucket key must prune the scan to ONE bucket
    (SelectedBucketsCount 1 out of N) — the read-side payoff of bucketing."""
    import contextlib
    import io

    from iceberg_demo_spark.operators.layout import write_bucketed

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    write_bucketed(df, "k", "glacier_bk_prune", str(tmp_path / "bkp"),
                   n_buckets=8)
    # autoBucketedScan drops the bucketed layout when no join/agg exploits
    # it, which also forfeits filter-time bucket pruning — a pure-filter
    # read wants it kept
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        q = spark.table("glacier_bk_prune").filter(F.col("k") == 421)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        assert "SelectedBucketsCount: 1 out of 8" in buf.getvalue()
        assert [r["v"] for r in q.collect()] == [421 % 7]
    finally:
        spark.conf.set(key, old)
