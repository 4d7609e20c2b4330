"""Incremental MV refresh: delta-driven partial group recompute via the
source table's changelog (beyond the reference, whose REFRESH INCREMENTAL
always recomputes fully — MaterializedViewCommands.scala:150-177)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_demo_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def _setup(engine, rows, name="db.sales"):
    t = engine.catalog.create_table(
        name, "region string, product string, amount double")
    t.append(engine.spark.createDataFrame(rows, schema=t.schema()))
    engine.register(name)  # temp view db_sales
    return t


def _expected(engine, t):
    return {
        tuple(r)
        for r in t.scan().groupBy("region")
        .agg(F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n"),
             F.min("amount").alias("lo"))
        .collect()
    }


def _mv_rows(engine, name):
    mv = engine.mv_catalog.get(name)
    return {tuple(r) for r in engine.mv.backing_df(mv).collect()}


ROWS = [("east", "w", 100.0), ("east", "g", 200.0),
        ("west", "w", 50.0), ("north", "w", 10.0)]

MV_SQL = ("CREATE MATERIALIZED VIEW inc_mv AS "
          "SELECT region, sum(amount) AS total, count(*) AS n, "
          "min(amount) AS lo FROM db_sales GROUP BY region")


def test_incremental_refresh_after_append(engine):
    t = _setup(engine, ROWS)
    engine.sql(MV_SQL)
    mv = engine.mv_catalog.get("inc_mv")
    assert mv.source_table == "db.sales"
    assert mv.source_snapshot_id > 0
    t.append(engine.spark.createDataFrame(
        [("east", "w", 7.0), ("south", "g", 1.0)], schema=t.schema()))
    engine.sql("REFRESH MATERIALIZED VIEW inc_mv INCREMENTAL")
    assert _mv_rows(engine, "inc_mv") == _expected(engine, t)
    assert engine.mv_catalog.get("inc_mv").source_snapshot_id == \
        t.metadata.current_snapshot().snapshot_id


def test_incremental_refresh_after_delete_and_update(engine):
    """Deletes shrink groups (east loses its max row; north vanishes) —
    partial recompute keeps MIN/SUM exact where +/- deltas could not keep
    MIN."""
    t = _setup(engine, ROWS)
    engine.sql(MV_SQL)
    t.delete_where("region = 'north'")
    t.update_where({"amount": "amount * 2"}, "region = 'west'")
    engine.sql("REFRESH MATERIALIZED VIEW inc_mv INCREMENTAL")
    got = _mv_rows(engine, "inc_mv")
    assert got == _expected(engine, t)
    assert not any(r[0] == "north" for r in got)  # emptied group removed


def test_incremental_noop_when_in_sync(engine):
    t = _setup(engine, ROWS)
    engine.sql(MV_SQL)
    before = t.metadata.current_snapshot().snapshot_id
    engine.sql("REFRESH MATERIALIZED VIEW inc_mv INCREMENTAL")
    assert engine.mv_catalog.get("inc_mv").source_snapshot_id == before
    assert _mv_rows(engine, "inc_mv") == _expected(engine, t)


def test_incremental_untouched_groups_not_recomputed(engine):
    """Only touched groups change backing rows; untouched groups' rows carry
    over byte-identical (same values)."""
    t = _setup(engine, ROWS)
    engine.sql(MV_SQL)
    before = {r[0]: tuple(r) for r in _mv_rows(engine, "inc_mv")}
    t.append(engine.spark.createDataFrame(
        [("west", "g", 5.0)], schema=t.schema()))
    engine.sql("REFRESH MATERIALIZED VIEW inc_mv INCREMENTAL")
    after = {r[0]: tuple(r) for r in _mv_rows(engine, "inc_mv")}
    assert after["east"] == before["east"]
    assert after["north"] == before["north"]
    assert after["west"] != before["west"]


def test_join_mv_falls_back_to_full(engine):
    t = _setup(engine, ROWS)
    engine.catalog.create_table("db.dim", "region string, zone string").append(
        engine.spark.createDataFrame(
            [("east", "z1"), ("west", "z2"), ("north", "z1")],
            "region string, zone string"))
    engine.register("db.dim")
    engine.sql(
        "CREATE MATERIALIZED VIEW join_mv AS "
        "SELECT d.zone, sum(s.amount) AS total FROM db_sales s "
        "JOIN db_dim d ON s.region = d.region GROUP BY d.zone")
    mv = engine.mv_catalog.get("join_mv")
    assert mv.source_table == ""  # not maintainable
    t.append(engine.spark.createDataFrame(
        [("east", "w", 1.0)], schema=t.schema()))
    engine.register("db.sales")  # full refresh reads the temp view
    engine.sql("REFRESH MATERIALIZED VIEW join_mv INCREMENTAL")
    got = {tuple(r) for r in engine.mv.backing_df(
        engine.mv_catalog.get("join_mv")).collect()}
    assert got == {("z1", 311.0), ("z2", 50.0)}


def test_incremental_with_where_filter(engine):
    t = _setup(engine, ROWS)
    engine.sql(
        "CREATE MATERIALIZED VIEW filt_mv AS "
        "SELECT region, sum(amount) AS total FROM db_sales "
        "WHERE amount > 20 GROUP BY region")
    t.append(engine.spark.createDataFrame(
        [("north", "g", 15.0), ("north", "g", 100.0)], schema=t.schema()))
    engine.sql("REFRESH MATERIALIZED VIEW filt_mv INCREMENTAL")
    got = {tuple(r) for r in engine.mv.backing_df(
        engine.mv_catalog.get("filt_mv")).collect()}
    # north: only the 100.0 row passes the filter (10 and 15 don't)
    assert got == {("east", 300.0), ("west", 50.0), ("north", 100.0)}


def test_incremental_randomized_matches_full(engine):
    """Randomized DML sequence: after every incremental refresh the backing
    equals a from-scratch recompute."""
    import random

    rng = random.Random(7)
    # seed a NULL-key group so every refresh handles it regardless of rng
    t = _setup(engine, ROWS + [(None, "w", 5.0)], "db.rand")
    engine.register("db.rand")
    engine.sql(
        "CREATE MATERIALIZED VIEW rand_mv AS "
        "SELECT region, sum(amount) AS total, count(*) AS n, "
        "max(amount) AS hi FROM db_rand GROUP BY region")
    # None exercises the NULL-group-key path (isin can't match NULL)
    regions = ["east", "west", "north", "south", None]
    for step in range(6):
        op = rng.choice(["append", "delete", "update"])
        if op == "append":
            rows = [(rng.choice(regions), "p", float(rng.randint(1, 99)))
                    for _ in range(rng.randint(1, 4))]
            t.append(engine.spark.createDataFrame(rows, schema=t.schema()))
        elif op == "delete":
            r = rng.choice(regions)
            pred = "region IS NULL" if r is None else f"region = '{r}'"
            t.delete_where(f"amount < {rng.randint(5, 40)} and {pred}")
        else:
            r = rng.choice(regions)
            pred = "region IS NULL" if r is None else f"region = '{r}'"
            t.update_where({"amount": "amount + 1"}, pred)
        engine.sql("REFRESH MATERIALIZED VIEW rand_mv INCREMENTAL")
        got = {tuple(r) for r in engine.mv.backing_df(
            engine.mv_catalog.get("rand_mv")).collect()}
        want = {
            tuple(r) for r in t.scan().groupBy("region")
            .agg(F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n"),
                 F.max("amount").alias("hi")).collect()
        }
        assert got == want, f"divergence at step {step} after {op}"


def test_incremental_path_actually_taken(engine, monkeypatch):
    """Guard against silent fallback: full refresh is forbidden during an
    incremental refresh of a maintainable view."""
    t = _setup(engine, ROWS, "db.strict")
    engine.register("db.strict")
    engine.sql(
        "CREATE MATERIALIZED VIEW strict_mv AS "
        "SELECT region, sum(amount) AS total FROM db_strict GROUP BY region")
    t.append(engine.spark.createDataFrame(
        [("east", "w", 1.0)], schema=t.schema()))

    def boom(mv):
        raise AssertionError("fell back to full refresh")

    monkeypatch.setattr(engine.mv, "_refresh_full", boom)
    engine.mv.refresh("strict_mv", incremental=True)
    got = {tuple(r) for r in engine.mv.backing_df(
        engine.mv_catalog.get("strict_mv")).collect()}
    assert got == {("east", 301.0), ("west", 50.0), ("north", 10.0)}


def test_incremental_refresh_out_of_scope_delta_is_metadata_only(engine):
    """DML that the MV's WHERE filters out entirely must not rewrite any
    backing file — only the synchronized snapshot advances."""
    t = _setup(engine, ROWS, "db.scoped")
    engine.register("db.scoped")
    engine.sql(
        "CREATE MATERIALIZED VIEW scoped_mv AS "
        "SELECT region, sum(amount) AS total FROM db_scoped "
        "WHERE amount > 60 GROUP BY region")
    backing = engine.catalog.load_table(
        engine.mv_catalog.get("scoped_mv").backing_table)
    snap_before = backing.metadata.current_snapshot().snapshot_id
    t.append(engine.spark.createDataFrame(
        [("east", "w", 1.0)], schema=t.schema()))  # below the WHERE cutoff
    engine.sql("REFRESH MATERIALIZED VIEW scoped_mv INCREMENTAL")
    assert backing.refresh().metadata.current_snapshot().snapshot_id \
        == snap_before
    assert engine.mv_catalog.get("scoped_mv").source_snapshot_id \
        == t.metadata.current_snapshot().snapshot_id
