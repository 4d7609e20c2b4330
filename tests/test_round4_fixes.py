"""Round-4 fix coverage: EXISTS-predicate DML must not multiply target rows
when the correlated source has duplicates (EXISTS is a semi-join, the merge
is not), alias-qualified plain WHERE/SET resolution, and loud errors for
unsupported multi-subquery predicates."""

from __future__ import annotations

import pytest

from iceberg_demo_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def _orders(engine, name="db.orders"):
    t = engine.catalog.create_table(name, "id bigint, status string, amt double")
    t.append(engine.spark.createDataFrame(
        [(1, "open", 10.0), (2, "open", 20.0), (3, "shipped", 30.0)],
        schema=t.schema()))
    return t


# -- EXISTS with duplicate correlated source rows ---------------------------

def test_sql_update_exists_duplicate_source_rows(engine):
    """ADVICE repro: returned=(1),(1),(2) — UPDATE via EXISTS must leave
    exactly 3 rows (id 1 updated ONCE, never emitted twice)."""
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(1,), (1,), (2,)], "oid bigint").createOrReplaceTempView("dup_ret")
    engine.sql("UPDATE db.orders AS t1 SET status = 'returned' "
               "WHERE EXISTS (SELECT oid FROM dup_ret WHERE t1.id = oid)")
    rows = t.refresh().scan().collect()
    assert len(rows) == 3
    got = {r["id"]: r["status"] for r in rows}
    assert got == {1: "returned", 2: "returned", 3: "shipped"}


def test_sql_delete_exists_duplicate_source_rows(engine):
    """DELETE ... WHERE status='open' AND EXISTS(...) with duplicate source
    matches: survivors must not be duplicated."""
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(1,), (1,), (2,)], "oid bigint").createOrReplaceTempView("dup_ret2")
    engine.sql(
        "DELETE FROM db.orders AS t1 WHERE status = 'open' AND "
        "EXISTS (SELECT oid FROM dup_ret2 WHERE t1.id = oid)")
    rows = t.refresh().scan().collect()
    assert sorted(r["id"] for r in rows) == [3]
    assert len(rows) == 1


def test_sql_update_exists_uncorrelated_source_columns(engine):
    """ON references no source column (EXISTS probes row presence only):
    one arbitrary probe row, never a fan-out."""
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(7,), (8,), (9,)], "x bigint").createOrReplaceTempView("probe_rows")
    engine.sql("UPDATE db.orders AS t1 SET status = 'flagged' "
               "WHERE EXISTS (SELECT x FROM probe_rows WHERE t1.id = 1)")
    rows = t.refresh().scan().collect()
    assert len(rows) == 3
    got = {r["id"]: r["status"] for r in rows}
    assert got == {1: "flagged", 2: "open", 3: "shipped"}


# -- alias-qualified plain WHERE / SET --------------------------------------

def test_sql_delete_alias_qualified_plain_where(engine):
    t = _orders(engine)
    engine.sql("DELETE FROM db.orders AS a WHERE a.amt > 15")
    assert sorted(r["id"] for r in t.refresh().scan().collect()) == [1]


def test_sql_update_alias_qualified_plain_where_and_set(engine):
    t = _orders(engine)
    engine.sql("UPDATE db.orders AS a SET amt = a.amt + 1 "
               "WHERE a.status = 'open'")
    got = {r["id"]: r["amt"] for r in t.refresh().scan().collect()}
    assert got == {1: 11.0, 2: 21.0, 3: 30.0}


def test_sql_delete_alias_in_string_literal_untouched(engine):
    t = _orders(engine)
    # 'a.x' inside the literal must NOT be rewritten
    engine.sql("DELETE FROM db.orders AS a WHERE a.status = 'a.bogus'")
    assert len(t.refresh().scan().collect()) == 3


# -- loud errors for unsupported predicate shapes ---------------------------

def test_sql_delete_not_exists_raises(engine):
    _orders(engine)
    engine.spark.createDataFrame(
        [(1,)], "oid bigint").createOrReplaceTempView("ne_src")
    with pytest.raises(ValueError, match="NOT EXISTS"):
        engine.sql("DELETE FROM db.orders AS t1 WHERE NOT EXISTS "
                   "(SELECT oid FROM ne_src WHERE t1.id = oid)")


def test_sql_delete_two_subquery_conjuncts_raises(engine):
    _orders(engine)
    engine.spark.createDataFrame(
        [(1,)], "oid bigint").createOrReplaceTempView("two_sub")
    with pytest.raises(ValueError, match="only one"):
        engine.sql(
            "DELETE FROM db.orders AS t1 WHERE "
            "EXISTS (SELECT oid FROM two_sub WHERE t1.id = oid) AND "
            "EXISTS (SELECT oid FROM two_sub WHERE t1.amt = oid)")
