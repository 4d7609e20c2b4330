"""Physical-layout operators: bucketing and partition pruning.

The two storage-layout techniques that decide whether a 100 TB join or scan
is feasible at all:

- **Bucketed co-located join**: both fact tables pre-hashed into the same
  bucket count on the join key at WRITE time, so the join runs with ZERO
  exchange — the single biggest shuffle elimination available to a
  recurring join workload (Spark's `bucketBy`, the analogue of Iceberg's
  bucket partition transform + storage-partitioned joins).
- **Partition-pruned scan**: data laid out `partitionBy(col)` so a filter
  on that column prunes directories before any I/O — the plan carries it
  as `PartitionFilters`, and bytes read scale with the selected partition,
  not the table.

Both gates produce value-oracled results (the layout must not change the
answer) and tests/test_plans.py asserts the load-bearing plan properties
(no join exchange / non-empty PartitionFilters).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_demo_spark.functions import dsum
from iceberg_demo_spark.registry import query
from iceberg_demo_spark.scratch import scratch_path
from iceberg_demo_spark.sources import load_tables

#: bucket count for the co-located join demo — on a cluster this would be
#: sized so one bucket ≈ one task's comfortable input (e.g. 4096 buckets
#: for a 100 TB fact table ≈ 25 GB/bucket pre-compression).
_N_BUCKETS = 8


def _sf_tag(sf_dir: str) -> str:
    import re as _re

    return _re.sub(r"\W", "_", sf_dir.strip("/").replace("/", "_"))


def write_bucketed(df: DataFrame, key: str, name: str, path: str,
                   n_buckets: int = _N_BUCKETS) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    bucket-sorted) on ``key`` — the write-time shuffle that every
    subsequent join on ``key`` no longer pays."""
    (
        df.write.bucketBy(n_buckets, key).sortBy(key)
        .option("path", path).mode("overwrite").format("parquet")
        .saveAsTable(name)
    )


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem with both sides bucketed by order key.

    Scale shape: the bucketed layout pays one hash shuffle at write time;
    after that EVERY join on the key runs exchange-free — both scans
    report their bucket spec as the output partitioning, so sort-merge
    join needs no shuffle of either side (the plan test asserts zero
    exchanges below the join). At 100 TB this turns the recurring
    fact-to-fact join from the cluster's biggest shuffle into pure
    co-located streaming merges. The merge hint only disables the
    broadcast path at this test scale — a 100 TB lineitem is far past any
    broadcast threshold, so the hint is a no-op there.
    """
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    # deterministic per-SF names + overwrite mode: repeat invocations
    # (bench reps, oracle re-checks) reuse the same catalog entries and
    # directory instead of leaking one table pair + tempdir per call
    tag = _sf_tag(sf_dir)
    o_name = f"glacier_bk_orders_{tag}"
    l_name = f"glacier_bk_lineitem_{tag}"
    base = scratch_path(f"glacier_bucketed_{tag}")

    # Build once per process: the testdata is immutable, so an existing
    # catalog entry + directory is current. Re-paying the write-time
    # shuffle every invocation would make bench reps measure the SETUP
    # instead of the exchange-free join this gate demonstrates (the
    # whole point of bucketing is write once, join many).
    def _ensure(name: str, path: str, df: DataFrame, key: str) -> None:
        if not (spark.catalog.tableExists(name) and os.path.isdir(path)):
            write_bucketed(df, key, name, path)

    _ensure(o_name, f"{base}/orders",
            t["orders"].select("o_orderkey", "o_orderpriority"),
            "o_orderkey")
    _ensure(l_name, f"{base}/lineitem",
            t["lineitem"].select("l_orderkey", "l_extendedprice",
                                 "l_discount"),
            "l_orderkey")
    o = spark.table(o_name).hint("merge")
    li = spark.table(l_name).hint("merge")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "partition_pruned_scan",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned layout + partition-pruned read.

    Scale shape: `partitionBy(l_returnflag)` at write time makes the
    `l_returnflag = 'R'` predicate a *directory* filter — the plan's
    PartitionFilters prune before listing file contents, so the scan reads
    only the selected partition's bytes at any scale. This is the layout
    half of what the engine's own table format does with hidden partition
    transforms (tables/table.py); the gate shows the same discipline on a
    plain parquet lake.
    """
    t = load_tables(spark, sf_dir, ("lineitem",))
    base = scratch_path(f"glacier_parted_{_sf_tag(sf_dir)}")
    (
        t["lineitem"].select("l_returnflag", "l_linestatus", "l_quantity")
        .write.partitionBy("l_returnflag").mode("overwrite").parquet(base)
    )
    return (
        spark.read.parquet(base)
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("l_linestatus")
    )
