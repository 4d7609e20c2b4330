"""Round-12 OPTIMIZATION internals, pinned (OPTIMIZATION_r12.md).

The optimization round rewrote three engine internals without changing
any gate's answer; these tests pin the parts the gate oracles cannot
see:

#1 create_changelog_view replaced the per-commit double exceptAll with
   ONE signed net aggregation shared across commits. The multiset
   semantics must survive the rewrite — including net counts > 1 (a row
   value appearing with different multiplicities on the added/removed
   sides replicates through the explode(sequence) path, which plain
   exceptAll handled implicitly).

#2 The changelog plan must actually be exceptAll-free (the old shape
   lowered to two full-width union+aggregate passes per commit).

#3 Table.merge persists its source across the hits/rewrite/inserts
   jobs — a non-deterministic source expression now evaluates ONCE, so
   the inserted rows agree with the join decisions made on the cached
   frame (under re-execution per job, a random source would have been
   re-drawn per consumer).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_demo_spark import registry
from iceberg_demo_spark.engine import Engine
from iceberg_demo_spark.tables import procedures as proc

registry.load_all()


@pytest.fixture(scope="module")
def spark():
    from iceberg_demo_spark.session import get_spark

    return get_spark("test_round12_opt")


def _changelog_rows(spark, t, name):
    cl = proc.create_changelog_view(t, name)
    return sorted(
        (r["k"], r["v"], r["_change_type"], r["_change_ordinal"])
        for r in cl.select("k", "v", "_change_type",
                           "_change_ordinal").collect()
    )


def test_changelog_net_replicates_duplicate_multiplicities(spark):
    """A commit whose added/removed sides hold the SAME row value at
    different multiplicities must emit |net| copies: overwrite_all from
    3×(1,'x') + 1×(2,'y') down to 1×(1,'x') + 3×(2,'y') is 2 DELETEs of
    (1,'x') and 2 INSERTs of (2,'y') — the explode(sequence) replication
    path that the old exceptAll shape produced implicitly."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="g_r12opt_"))
    t = eng.catalog.create_table("db.cl_mult", "k bigint, v string")
    t.append(spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "x"), (2, "y")], "k bigint, v string"))
    t.overwrite_all(spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y"), (2, "y")], "k bigint, v string"))
    got = _changelog_rows(spark, t, "cl_mult_changes")
    assert got == sorted([
        (1, "x", "INSERT", 0), (1, "x", "INSERT", 0), (1, "x", "INSERT", 0),
        (2, "y", "INSERT", 0),
        (1, "x", "DELETE", 1), (1, "x", "DELETE", 1),
        (2, "y", "INSERT", 1), (2, "y", "INSERT", 1),
    ]), got


def test_changelog_plan_is_exceptall_free(spark):
    """The multiset diff is ONE signed aggregation per schema, not two
    exceptAll lowerings per commit: no ExceptAll/Except node anywhere in
    the changelog view's plan for a delete+update+append chain."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="g_r12opt_"))
    t = eng.catalog.create_table("db.cl_plan", "k bigint, v bigint")
    t.append(spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    t.delete_where("k % 7 = 0")
    t.update_where({"v": "v + 1"}, "k % 5 = 0")
    t.append(spark.range(100, 110).select(
        F.col("id").alias("k"), F.lit(0).cast("bigint").alias("v")))
    cl = proc.create_changelog_view(t, "cl_plan_changes")
    plan = cl._jdf.queryExecution().optimizedPlan().toString()
    assert "Except" not in plan, plan
    # and the diff work sits behind the eager checkpoint: the optimized
    # plan roots at the materialized net (plus the pure-append branch)
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan


def test_merge_source_evaluated_once_across_merge_jobs(spark):
    """MERGE persists its source: a non-deterministic source column is
    drawn once and every MERGE consumer (match decisions, inserted
    values) sees the same draw — the inserted rows' values must match
    what a re-read of the committed table reports, with no duplicate or
    missing key (re-execution per consumer job would re-draw rand() and
    could route one key down both the matched and not-matched legs)."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="g_r12opt_"))
    t = eng.catalog.create_table("db.m_once", "k bigint, v double")
    t.append(spark.range(50).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v")))
    src = spark.range(100).select(
        F.col("id").alias("k"), F.rand(seed=None).alias("v"))
    t.merge(
        src, on="t.k = s.k",
        matched=[{"condition": None, "action": "update",
                  "set": {"v": "s.v"}}],
        not_matched=[{"condition": None, "values": None}],
        check_cardinality=False,
    )
    rows = t.scan().collect()
    keys = sorted(r["k"] for r in rows)
    assert keys == list(range(100)), "every key exactly once"
