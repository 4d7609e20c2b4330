"""Round-3 fix coverage: MERGE alias normalization, DataFrame/subquery
DML predicates (docs/spark-writes.md:170-199), MV incremental refresh with
NULL group keys, and the keyed (non-O(|MV|)) backing write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


# -- MERGE alias normalization ---------------------------------------------

def test_merge_swapped_engine_aliases(engine):
    """MERGE INTO tgt s USING src t — user aliases are the engine's own
    t/s swapped; sequential substitution would corrupt every reference."""
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(2, 99.0), (4, 44.0)], "id bigint, amt double"
    ).createOrReplaceTempView("src_swap")
    engine.sql("""
        MERGE INTO db.orders s USING src_swap t ON s.id = t.id
        WHEN MATCHED THEN UPDATE SET s.amt = t.amt
        WHEN NOT MATCHED THEN INSERT (id, status, amt)
            VALUES (t.id, 'new', t.amt)
    """)
    got = {r["id"]: (r["status"], r["amt"]) for r in t.refresh().scan().collect()}
    assert got == {1: ("open", 10.0), 2: ("open", 99.0),
                   3: ("shipped", 30.0), 4: ("new", 44.0)}


def test_merge_colliding_aliases_rejected(engine):
    _orders(engine)
    engine.spark.range(1).createOrReplaceTempView("src_x")
    with pytest.raises(ValueError, match="alias"):
        engine.sql("MERGE INTO db.orders x USING src_x x ON x.id = x.id "
                   "WHEN MATCHED THEN DELETE")


def test_merge_reserved_marker_column_rejected(engine):
    t = _orders(engine)
    bad = engine.spark.sql("SELECT 1 AS id, true AS _g_s_present")
    with pytest.raises(ValueError, match="_g_s_present"):
        t.merge(bad, on="t.id = s.id",
                matched=[{"condition": None, "action": "delete"}])


# -- DataFrame-predicate DML ------------------------------------------------

def test_delete_matching_api(engine):
    t = _orders(engine)
    keys = engine.spark.createDataFrame([(1,), (3,)], "id bigint")
    t.delete_matching(keys, on="t.id = s.id")
    assert [r["id"] for r in t.scan().collect()] == [2]


def test_update_matching_api_source_refs(engine):
    t = _orders(engine)
    src = engine.spark.createDataFrame(
        [(1, 5.0), (2, 7.0)], "id bigint, bump double")
    t.update_matching({"amt": "t.amt + s.bump"}, src, on="t.id = s.id")
    got = {r["id"]: r["amt"] for r in t.scan().collect()}
    assert got == {1: 15.0, 2: 27.0, 3: 30.0}


def test_sql_delete_where_exists(engine):
    """The reference's correlated-EXISTS DELETE
    (docs/spark-writes.md:176-178) — no driver-side key collection."""
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(1,), (2,)], "oid bigint").createOrReplaceTempView("returned")
    engine.sql("DELETE FROM db.orders AS t1 "
               "WHERE EXISTS (SELECT oid FROM returned WHERE t1.id = oid)")
    assert [r["id"] for r in t.refresh().scan().collect()] == [3]


def test_sql_delete_where_exists_plus_plain_conjunct(engine):
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(1,), (2,)], "oid bigint").createOrReplaceTempView("returned2")
    engine.sql(
        "DELETE FROM db.orders AS t1 WHERE status = 'open' AND "
        "EXISTS (SELECT oid FROM returned2 WHERE t1.id = oid AND oid > 1)")
    assert sorted(r["id"] for r in t.refresh().scan().collect()) == [1, 3]


def test_sql_delete_scalar_subquery(engine):
    """Uncorrelated scalar subquery (docs/spark-writes.md:173-174)."""
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(25.0,)], "cut double").createOrReplaceTempView("cuts")
    engine.sql("DELETE FROM db.orders WHERE amt < (SELECT min(cut) FROM cuts)")
    assert [r["id"] for r in t.refresh().scan().collect()] == [3]


def test_sql_update_where_exists(engine):
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(1,), (3,)], "oid bigint").createOrReplaceTempView("ret3")
    engine.sql("UPDATE db.orders AS t1 SET status = 'returned' "
               "WHERE EXISTS (SELECT oid FROM ret3 WHERE t1.id = oid)")
    got = {r["id"]: r["status"] for r in t.refresh().scan().collect()}
    assert got == {1: "returned", 2: "open", 3: "returned"}


def test_sql_update_scalar_subquery(engine):
    t = _orders(engine)
    engine.sql("UPDATE db.orders SET amt = 0 "
               "WHERE amt < (SELECT avg(amt) FROM db.orders)")
    got = {r["id"]: r["amt"] for r in t.refresh().scan().collect()}
    assert got == {1: 0.0, 2: 20.0, 3: 30.0}  # avg=20; only 10.0 < 20


# -- MV incremental refresh: NULL keys + keyed backing write ----------------

MV_SQL = ("CREATE MATERIALIZED VIEW nk_mv AS "
          "SELECT region, sum(amount) AS total, count(*) AS n "
          "FROM db_sales GROUP BY region")


def _sales(engine, rows):
    t = engine.catalog.create_table(
        "db.sales", "region string, product string, amount double")
    t.append(engine.spark.createDataFrame(
        rows, "region string, product string, amount double"))
    engine.register("db.sales")
    return t


def _mv_rows(engine, name="nk_mv"):
    mv = engine.mv_catalog.get(name)
    return {tuple(r) for r in engine.mv.backing_df(mv).collect()}


def test_incremental_refresh_null_key_group_survives(engine):
    """A touched NULL group key must be recomputed, not silently dropped
    (isin() never matches NULL)."""
    t = _sales(engine, [("east", "w", 100.0), (None, "w", 50.0),
                        (None, "g", 8.0), ("west", "w", 20.0)])
    engine.sql(MV_SQL)
    t.append(engine.spark.createDataFrame(
        [(None, "w", 2.0), ("east", "g", 1.0)],
        "region string, product string, amount double"))
    engine.sql("REFRESH MATERIALIZED VIEW nk_mv INCREMENTAL")
    assert _mv_rows(engine) == {("east", 101.0, 2), (None, 60.0, 3),
                                ("west", 20.0, 1)}


def test_incremental_refresh_null_key_group_vanishes(engine):
    t = _sales(engine, [("east", "w", 100.0), (None, "w", 50.0)])
    engine.sql(MV_SQL)
    t.delete_where("region IS NULL")
    engine.sql("REFRESH MATERIALIZED VIEW nk_mv INCREMENTAL")
    assert _mv_rows(engine) == {("east", 100.0, 1)}


def test_incremental_refresh_keeps_untouched_backing_files(engine):
    """The backing write is a keyed MERGE: data files holding only
    untouched groups survive the refresh physically unrewritten."""
    rows = [(f"r{i}", "w", float(i)) for i in range(16)]
    t = _sales(engine, rows)
    engine.sql(MV_SQL)
    backing = engine.catalog.load_table(
        engine.mv_catalog.get("nk_mv").backing_table)
    initial = {f.path for f in backing.metadata.current_snapshot().files}
    # insert-only delta: new groups don't match any backing row, so the
    # initial file(s) must survive and the inserts land in new files
    t.append(engine.spark.createDataFrame(
        [(f"s{i}", "w", 1.0) for i in range(8)],
        "region string, product string, amount double"))
    engine.sql("REFRESH MATERIALIZED VIEW nk_mv INCREMENTAL")
    mid = {f.path for f in backing.refresh().metadata.current_snapshot().files}
    assert initial <= mid, "insert-only refresh must not rewrite old files"
    inserted = mid - initial
    assert inserted
    # now touch only an inserted group: the initial files still survive,
    # while the file(s) holding s3 are rewritten
    t.append(engine.spark.createDataFrame(
        [("s3", "g", 1000.0)], "region string, product string, amount double"))
    engine.sql("REFRESH MATERIALIZED VIEW nk_mv INCREMENTAL")
    after = {f.path
             for f in backing.refresh().metadata.current_snapshot().files}
    assert initial <= after, "untouched backing files must not be rewritten"
    assert _mv_rows(engine) == (
        {(f"r{i}", float(i), 1) for i in range(16)}
        | {(f"s{i}", 1001.0 if i == 3 else 1.0, 2 if i == 3 else 1)
           for i in range(8)})


def test_sql_delete_in_subquery(engine):
    """DELETE … WHERE col IN (SELECT …): distributed join, no key collect."""
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(1,), (2,), (2,)], "oid bigint").createOrReplaceTempView("in_keys")
    engine.sql("DELETE FROM db.orders WHERE id IN (SELECT oid FROM in_keys)")
    assert [r["id"] for r in t.refresh().scan().collect()] == [3]


def test_sql_update_in_subquery_with_plain_conjunct(engine):
    t = _orders(engine)
    engine.spark.createDataFrame(
        [(1,), (3,)], "oid bigint").createOrReplaceTempView("in_keys2")
    engine.sql("UPDATE db.orders SET status = 'flagged' "
               "WHERE id IN (SELECT oid FROM in_keys2) AND amt > 15")
    got = {r["id"]: r["status"] for r in t.refresh().scan().collect()}
    assert got == {1: "open", 2: "open", 3: "flagged"}


def test_incremental_refresh_composite_keys_merge_path(engine):
    """Two group keys bypass the IN-list fast path: the keyed-MERGE backing
    write must update / insert / delete groups correctly."""
    t = _sales(engine, [("east", "w", 100.0), ("east", "g", 10.0),
                        ("west", "w", 50.0), (None, "g", 5.0)])
    engine.sql(
        "CREATE MATERIALIZED VIEW ck_mv AS "
        "SELECT region, product, sum(amount) AS total, count(*) AS n "
        "FROM db_sales GROUP BY region, product")
    t.append(engine.spark.createDataFrame(
        [("east", "w", 1.0), ("north", "w", 7.0), (None, "g", 2.0)],
        "region string, product string, amount double"))
    t.delete_where("region = 'west'")
    engine.sql("REFRESH MATERIALIZED VIEW ck_mv INCREMENTAL")
    # round 12: the composite-key semi-join was latently ambiguous and
    # silently fell back to full recompute until the fallback excepts
    # were narrowed — pin the mode so the merge path actually runs
    assert engine.mv.last_refresh_mode == "incremental"
    assert _mv_rows(engine, "ck_mv") == {
        ("east", "w", 101.0, 2), ("east", "g", 10.0, 1),
        ("north", "w", 7.0, 1), (None, "g", 7.0, 2)}
