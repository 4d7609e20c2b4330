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


# ---------------------------------------------------------------------------
# Z-order effectiveness audit (round 9, VERDICT r8 #6)
# ---------------------------------------------------------------------------

#: the 2-D predicates the audit prices — identical text feeds the Spark
#: scan, the driver-side candidate pruning AND the DuckDB oracle, so the
#: three can never drift
_Z_PREDS = (
    ("p1", "l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'"
           " AND l_partkey < 60"),
    ("p2", "l_shipdate >= '1999-01-01' AND l_shipdate < '2000-01-01'"
           " AND l_partkey >= 100 AND l_partkey < 160"),
)

_Z_ORACLE = " UNION ALL ".join(
    f"""SELECT '{pid}' AS pred_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem WHERE {pred}""" for pid, pred in _Z_PREDS)


def _zorder_tables(spark: SparkSession, sf_dir: str):
    """Build the two compacted layouts the audit compares: the same
    16-fragment lineitem projection rewritten binpack (coalesce only —
    every output file keeps full-range column bounds) vs
    zorder(l_shipdate, l_partkey) (range-partitioned on the interleaved
    key — every output file gets a tight 2-D bounding box)."""
    from iceberg_demo_spark.operators.table_ops import _scratch
    from iceberg_demo_spark.tables import procedures

    t_in = load_tables(spark, sf_dir, ("lineitem",))
    src = (t_in["lineitem"]
           .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
           .repartition(16, "l_orderkey"))
    cat = _scratch(spark)
    ddl = ("l_orderkey bigint, l_partkey bigint, l_quantity double,"
           " l_shipdate timestamp")
    out = {}
    for name, strat, order in (
            ("db.li_bin", "binpack", None),
            ("db.li_z", "zorder",
             [{"col": "l_shipdate"}, {"col": "l_partkey"}])):
        t = cat.create_table(name, ddl)
        t.append(src)
        total = sum(f.bytes for f in t._branch_files("main"))
        stats = procedures.rewrite_data_files(
            t, strategy=strat, sort_order=order,
            target_file_size_bytes=max(total // 8, 1))
        assert stats["rewritten_data_files_count"] == 16, stats
        out[strat] = t
    return out["binpack"], out["zorder"]


@query("layout_zorder_skipping", oracle=_Z_ORACLE)
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does z-ordering actually buy file skips? The engine harvests
    per-file min/max column bounds (tables/table.py) and ships
    rewrite_data_files(strategy='zorder'); this gate PROVES the two
    compose: the same fragmented lineitem projection is compacted
    binpack vs zorder(l_shipdate, l_partkey), and for each 2-D
    predicate the driver-side stats pruning must admit STRICTLY fewer
    candidate files under the z-ordered layout (asserted in-gate, the
    stats_pruned_scan discipline; exact counts pytest-pinned). The
    returned answer is computed through the z-ordered table and shares
    the plain-lineitem oracle — layout must never change answers.

    Scale shape: this is the 100 TB lever for MULTI-column selective
    scans — a 1-D sort gives tight bounds on one column only; the
    Morton interleave bounds every z-dimension at once, so candidate
    files scale with the predicate's 2-D box, not the table. The
    rewrite pays one range shuffle on the interleaved key (amortized
    maintenance, the compaction family's contract)."""
    t_bin, t_z = _zorder_tables(spark, sf_dir)
    for pid, pred in _Z_PREDS:
        files_b = t_bin._branch_files("main")
        files_z = t_z._branch_files("main")
        cand_b = len(t_bin._prune_files(files_b, pred))
        cand_z = len(t_z._prune_files(files_z, pred))
        assert cand_z < cand_b, (
            f"{pid}: zorder must admit fewer candidate files "
            f"({cand_z=} vs {cand_b=} of {len(files_z)})")
    parts = []
    for pid, pred in _Z_PREDS:
        parts.append(
            t_z.scan(where=pred).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_quantity").cast("bigint")).cast("bigint")
                .alias("sum_qty"),
                F.countDistinct("l_partkey").cast("bigint")
                .alias("n_parts"))
            .select(F.lit(pid).alias("pred_id"), "n_rows", "sum_qty",
                    "n_parts"))
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.orderBy("pred_id")


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning (round 9): Catalyst's injected
# semi-join reduction — the engine-native answer to "pre-filter the fact
# shuffle by the dim's selective predicate".
# ---------------------------------------------------------------------------

@query(
    "events_bloom_pruned_join",
    oracle="""
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events e JOIN orders o ON e.user_id = o.o_custkey
    WHERE o.o_orderstatus = 'F' AND o.o_totalprice > 200000
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def events_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: the selective dim predicate
    (high-value finished orders, ~20% of customers) is turned by
    Catalyst into an injected ``bloom_filter_agg`` over the dim's join
    keys whose ``might_contain`` filter runs on the FACT side BEFORE its
    shuffle — the engine-native form of the manual broadcast-semi-join
    pre-filters the dedup family builds by hand, and the standard lever
    when the dim is too big to broadcast but its filtered keys are not.
    The gate asserts the injection actually happened (both expressions
    in the physical plan) and returns the value-oracled join aggregate —
    the optimization must never change the answer.

    Scale shape: fact rows that cannot join die at the scan, so the
    fact exchange carries ~selectivity × corpus instead of the corpus.
    Test-SF surrogates, restored after planning: broadcast is disabled
    (at 100 TB this dim exceeds any broadcast budget — shuffle join is
    the real regime) and the application-side size floor is lowered (its
    10 GB default exists to keep tiny scans from paying bloom-build
    cost; a 100 TB fact side passes it naturally)."""
    t = load_tables(spark, sf_dir, ("events", "orders"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        dim = (t["orders"]
               .filter((F.col("o_orderstatus") == "F")
                       & (F.col("o_totalprice") > 200000)))
        res = (
            t["events"].join(dim, F.col("user_id") == F.col("o_custkey"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("o_orderkey").alias("n_orders"),
                 dsum(F.col("value")).alias("total_value"))
            .orderBy("event_type")
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan, (
            "runtime bloom filter was not injected")
        # force materialization while the conf surrogates are active —
        # the physical plan is already fixed, this just keeps execution
        # and planning under the same regime
        res = spark.createDataFrame(res.collect(), res.schema)
        return res
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
