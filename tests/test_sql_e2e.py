"""End-to-end SQL lifecycle in the reference's integration style
(iceberg_it.py drives EVERYTHING through run_sql + count/scalar asserts):
one scenario exercising DDL → DML → evolution → branches/WAP → MERGE →
time travel → procedures → MV, entirely through Engine.sql."""

from __future__ import annotations

import pytest

from iceberg_demo_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def _count(engine, sql: str) -> int:
    return engine.sql(sql).collect()[0][0]


def test_sql_only_lifecycle(engine, spark):
    eng = engine

    # DDL + initial load
    eng.sql("""
        CREATE TABLE db.orders_sql (
            id BIGINT NOT NULL COMMENT 'order id',
            category STRING,
            amount DOUBLE
        ) PARTITIONED BY (category)
        TBLPROPERTIES ('write.wap.enabled' = 'true')
    """)
    eng.sql("INSERT INTO db.orders_sql VALUES "
            "(1,'food',10.0), (2,'food',20.0), (3,'tech',30.0), (4,'tech',40.0)")
    eng.register("db.orders_sql", "orders_sql")
    assert _count(eng, "SELECT COUNT(*) FROM orders_sql") == 4

    # row-level DML
    eng.sql("UPDATE db.orders_sql SET amount = amount + 5 WHERE category = 'food'")
    eng.sql("DELETE FROM db.orders_sql WHERE id = 4")
    t = eng.catalog.load_table("db.orders_sql")
    assert {r["id"]: r["amount"] for r in t.scan().collect()} == \
        {1: 15.0, 2: 25.0, 3: 30.0}

    # schema evolution + insert with the new column
    eng.sql("ALTER TABLE db.orders_sql ADD COLUMNS (note STRING)")
    eng.sql("INSERT INTO db.orders_sql VALUES (5, 'food', 50.0, 'rush')")
    t.refresh()
    rows = {r["id"]: r["note"] for r in t.scan().collect()}
    assert rows[5] == "rush" and rows[1] is None  # old rows NULL for new col

    # MERGE through SQL
    spark.createDataFrame([(3, 333.0), (9, 99.0)], "id bigint, amt double") \
        .createOrReplaceTempView("merge_src_sql")
    eng.sql("""
        MERGE INTO db.orders_sql t USING merge_src_sql s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET amount = s.amt
        WHEN NOT MATCHED THEN INSERT (id, category, amount, note)
             VALUES (s.id, 'misc', s.amt, NULL)
    """)
    t.refresh()
    amounts = {r["id"]: r["amount"] for r in t.scan().collect()}
    assert amounts[3] == 333.0 and amounts[9] == 99.0 and len(amounts) == 5

    # WAP: stage on a branch, verify isolation, publish
    pre_wap = t.metadata.current_snapshot().snapshot_id
    eng.set_wap_branch("wap_stage")
    eng.sql("INSERT INTO db.orders_sql VALUES (10, 'tech', 1.0, NULL)")
    eng.set_wap_branch(None)
    t.refresh()
    assert t.scan().count() == 5                      # main unchanged
    assert t.scan(branch="wap_stage").count() == 6    # staged
    eng.sql("CALL system.fast_forward(table => 'db.orders_sql', "
            "branch => 'main', to => 'wap_stage')")
    assert t.refresh().scan().count() == 6            # published

    # time travel back before the WAP publish
    assert _count(
        eng, f"SELECT COUNT(*) FROM db.orders_sql VERSION AS OF {pre_wap}") == 5

    # tags + branch DDL through SQL
    eng.sql("ALTER TABLE db.orders_sql CREATE TAG before_cleanup")
    assert _count(
        eng, "SELECT COUNT(*) FROM db.orders_sql VERSION AS OF 'before_cleanup'") == 6

    # maintenance procedures through SQL
    eng.sql("CALL system.rewrite_data_files(table => 'db.orders_sql')")
    assert t.refresh().scan().count() == 6
    res = eng.sql("CALL system.compute_table_stats(table => 'db.orders_sql')")
    assert res.count() == 1

    # MV over the SQL table with automatic rewrite
    eng.register("db.orders_sql", "orders_sql")  # rebind to current state
    eng.sql("CREATE MATERIALIZED VIEW sql_mv AS "
            "SELECT category, sum(amount) AS total FROM orders_sql GROUP BY category")
    out = eng.sql("SELECT category, sum(amount) AS total FROM orders_sql "
                  "GROUP BY category")
    assert eng.last_rewrite is not None
    got = {r["category"]: r["total"] for r in out.collect()}
    # tech: id3 (merged to 333.0) + id10 (1.0); misc: id9 (99.0)
    assert got["tech"] == 334.0 and got["misc"] == 99.0
    assert got["food"] == 90.0  # 15 + 25 + 50

    # read-only guard blocks SQL DML
    eng.sql("ALTER TABLE db.orders_sql SET TBLPROPERTIES ('hive-ext.readOnly' = 'true')")
    from iceberg_demo_spark.tables.table import ReadOnlyTableError

    with pytest.raises(ReadOnlyTableError):
        eng.sql("DELETE FROM db.orders_sql WHERE id = 1")
    eng.sql("ALTER TABLE db.orders_sql UNSET TBLPROPERTIES ('hive-ext.readOnly')")
    eng.sql("DELETE FROM db.orders_sql WHERE id = 1")
    assert t.refresh().scan().count() == 5


def test_sql_ctas_rtas_lifecycle(engine):
    """SQL-text CTAS/RTAS (iceberg_it.py:298-333): REPLACE keeps history
    and MERGES properties (docs/spark-ddl.md:107-132)."""
    eng = engine
    eng.sql("CREATE TABLE db.src_ctas (id BIGINT, category STRING, v DOUBLE)")
    eng.sql("INSERT INTO db.src_ctas VALUES "
            "(1,'a',1.0), (2,'b',2.0), (3,'a',3.0)")

    # CTAS with partitioning + properties, reading a catalog table
    eng.sql("""
        CREATE TABLE db.ctas_t USING glacier PARTITIONED BY (category)
        TBLPROPERTIES ('k1' = 'v1')
        AS SELECT id, category, v * 10 AS v10 FROM db.src_ctas
    """)
    t = eng.catalog.load_table("db.ctas_t")
    assert t.properties.get("k1") == "v1"
    assert [p.source for p in t.metadata.partition_spec] == ["category"]
    assert {r["id"]: r["v10"] for r in t.scan().collect()} == \
        {1: 10.0, 2: 20.0, 3: 30.0}

    # CTAS IF NOT EXISTS over an existing table: no-op, no error
    eng.sql("CREATE TABLE IF NOT EXISTS db.ctas_t AS SELECT 99 AS id")
    assert t.refresh().scan().count() == 3

    # bare CREATE over an existing table: loud error
    from iceberg_demo_spark.tables.catalog import TableAlreadyExistsError
    with pytest.raises(TableAlreadyExistsError):
        eng.sql("CREATE TABLE db.ctas_t AS SELECT 99 AS id")

    # RTAS: new schema + data; history preserved; properties MERGED
    n_snaps_before = len(t.metadata.snapshots)
    eng.sql("""
        REPLACE TABLE db.ctas_t TBLPROPERTIES ('k2' = 'v2')
        AS SELECT category, count(*) AS n FROM db.src_ctas GROUP BY category
    """)
    t = eng.catalog.load_table("db.ctas_t")
    assert t.properties.get("k1") == "v1" and t.properties.get("k2") == "v2"
    assert len(t.metadata.snapshots) > n_snaps_before  # history survives
    assert {r["category"]: r["n"] for r in t.scan().collect()} == {"a": 2, "b": 1}

    # REPLACE of a missing table: error; CREATE OR REPLACE: creates
    from iceberg_demo_spark.tables.catalog import NoSuchTableError
    with pytest.raises(NoSuchTableError):
        eng.sql("REPLACE TABLE db.nope_t AS SELECT 1 AS x")
    eng.sql("CREATE OR REPLACE TABLE db.cor_t AS "
            "SELECT id FROM db.src_ctas WHERE id > 1")
    assert eng.catalog.load_table("db.cor_t").scan().count() == 2


def test_sql_alter_view_properties(engine):
    """SQL-driven view property lifecycle (iceberg_it.py:569-612)."""
    eng = engine
    eng.spark.range(3).createOrReplaceTempView("nums_v")
    eng.sql("CREATE VIEW v_props AS SELECT * FROM nums_v")
    eng.sql("ALTER VIEW v_props SET TBLPROPERTIES ('owner' = 'etl', 'tier' = 'gold')")
    assert eng.catalog.views["v_props"]["properties"] == \
        {"owner": "etl", "tier": "gold"}
    eng.sql("ALTER VIEW v_props SET TBLPROPERTIES ('tier' = 'silver')")
    assert eng.catalog.views["v_props"]["properties"]["tier"] == "silver"
    eng.sql("ALTER VIEW v_props UNSET TBLPROPERTIES ('owner', 'missing')")
    assert eng.catalog.views["v_props"]["properties"] == {"tier": "silver"}
    # a name the engine catalog doesn't own delegates to Spark, whose
    # resolver raises its own (equally loud) error
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND"):
        eng.sql("ALTER VIEW no_such_view SET TBLPROPERTIES ('a' = 'b')")


def test_plain_select_resolves_catalog_tables_without_register(engine, spark):
    """`SELECT … FROM db.t` must resolve engine tables directly — the
    reference's Spark-registered catalog behavior (docs/spark-queries.md) —
    without an explicit register() call, including in joins and subqueries,
    while temp views keep resolving untouched."""
    eng = engine
    eng.sql("CREATE TABLE db.sel_a (id BIGINT, v STRING)")
    eng.sql("INSERT INTO db.sel_a VALUES (1, 'x'), (2, 'y')")
    eng.sql("CREATE TABLE db.sel_b (id BIGINT, w BIGINT)")
    eng.sql("INSERT INTO db.sel_b VALUES (1, 10), (3, 30)")
    assert eng.sql("SELECT count(*) FROM db.sel_a").collect()[0][0] == 2
    rows = eng.sql(
        "SELECT a.id, a.v, b.w FROM db.sel_a a JOIN db.sel_b b ON a.id = b.id"
    ).collect()
    assert [(r["id"], r["v"], r["w"]) for r in rows] == [(1, "x", 10)]
    # temp views still win their own names
    spark.createDataFrame([(7,)], "z bigint").createOrReplaceTempView("plain_v")
    assert eng.sql("SELECT z FROM plain_v").collect()[0][0] == 7


def test_create_or_replace_fresh_table_keeps_partition_spec(engine):
    """Review regression: CREATE OR REPLACE TABLE ... PARTITIONED BY on a
    table that does NOT yet exist must create it partitioned."""
    eng = engine
    eng.sql("CREATE TABLE db.src_p (id BIGINT, cat STRING)")
    eng.sql("INSERT INTO db.src_p VALUES (1, 'a'), (2, 'b')")
    eng.sql(
        "CREATE OR REPLACE TABLE db.fresh_p PARTITIONED BY (cat) "
        "AS SELECT id, cat FROM db.src_p")
    t = eng.catalog.load_table("db.fresh_p")
    assert t.metadata.partition_spec, "partition spec was dropped"
    assert eng.sql("SELECT count(*) FROM db.fresh_p").collect()[0][0] == 2


def test_string_literal_containing_from_table_ref_survives(engine, spark):
    """Review regression: 'from db.x' inside a string literal must not be
    rewritten by the catalog binder."""
    eng = engine
    eng.sql("CREATE TABLE db.lit_t (id BIGINT, note STRING)")
    eng.sql("INSERT INTO db.lit_t VALUES (1, 'copied from db.lit_t')")
    rows = eng.sql(
        "SELECT note FROM db.lit_t WHERE note = 'copied from db.lit_t'"
    ).collect()
    assert [r["note"] for r in rows] == ["copied from db.lit_t"]


def test_alter_view_on_non_engine_view_delegates_to_spark(engine, spark):
    """Review regression: ALTER VIEW on a name the engine catalog doesn't
    own must fall through to Spark (which raises its own error for temp
    views) rather than NoSuchTableError from the engine catalog."""
    import pytest as _pytest

    from iceberg_demo_spark.tables.catalog import NoSuchTableError

    spark.createDataFrame([(1,)], "x bigint").createOrReplaceTempView(
        "spark_only_view")
    with _pytest.raises(Exception) as ei:
        engine.sql(
            "ALTER VIEW spark_only_view SET TBLPROPERTIES ('a' = 'b')")
    assert not isinstance(ei.value, NoSuchTableError)


def test_exists_on_clause_literal_not_treated_as_source_column(engine):
    """Review regression: an 's.'-prefixed token inside a string literal in
    the correlated predicate must not become a phantom source column."""
    eng = engine
    eng.sql("CREATE TABLE db.ex_t (id BIGINT, note STRING)")
    eng.sql("INSERT INTO db.ex_t VALUES (1, 's.flag'), (2, 'other')")
    eng.sql("CREATE TABLE db.ex_src (oid BIGINT)")
    eng.sql("INSERT INTO db.ex_src VALUES (1), (1)")
    eng.sql(
        "DELETE FROM db.ex_t t1 WHERE EXISTS ("
        "SELECT 1 FROM db.ex_src WHERE oid = t1.id "
        "AND t1.note = 's.flag')")
    left = eng.sql("SELECT id FROM db.ex_t ORDER BY id").collect()
    assert [r["id"] for r in left] == [2]


def test_show_views_tblproperties_describe_statement_text(engine, spark):
    """VERDICT r6 #5: SHOW VIEWS / SHOW TBLPROPERTIES / DESCRIBE
    [EXTENDED] as statement text through Engine.sql, with Spark's
    documented output columns (docs/spark-ddl.md:572-687,
    iceberg_it.py:569-612)."""
    eng = engine
    eng.sql("CREATE TABLE db.t_meta (id BIGINT, v STRING) "
            "TBLPROPERTIES ('k1' = 'v1', 'k2' = 'v2')")
    eng.sql("INSERT INTO db.t_meta VALUES (1, 'a')")
    eng.register("db.t_meta", "t_meta")
    eng.sql("CREATE VIEW db.v_meta COMMENT 'meta view' AS "
            "SELECT id, v FROM t_meta")
    eng.sql("ALTER VIEW db.v_meta SET TBLPROPERTIES ('vp' = '1')")

    # SHOW VIEWS → Spark's (namespace, viewName, isTemporary)
    sv = eng.sql("SHOW VIEWS")
    assert sv.columns == ["namespace", "viewName", "isTemporary"]
    assert [tuple(r) for r in sv.collect()] == [("db", "v_meta", False)]
    assert eng.sql("SHOW VIEWS IN db").count() == 1
    assert eng.sql("SHOW VIEWS IN nosuch").count() == 0

    # SHOW TBLPROPERTIES on a table, a view, and a single key
    tp = eng.sql("SHOW TBLPROPERTIES db.t_meta")
    assert tp.columns == ["key", "value"]
    props = dict((r["key"], r["value"]) for r in tp.collect())
    assert props["k1"] == "v1" and props["k2"] == "v2"
    vp = eng.sql("SHOW TBLPROPERTIES db.v_meta")
    assert vp.columns == ["key", "value"]
    assert [tuple(r) for r in vp.collect()] == [("vp", "1")]
    one = eng.sql("SHOW TBLPROPERTIES db.t_meta ('k2')").collect()
    assert [tuple(r) for r in one] == [("k2", "v2")]
    missing = eng.sql("SHOW TBLPROPERTIES db.t_meta ('nope')").collect()
    assert "does not have property" in missing[0]["value"]

    # DESCRIBE [EXTENDED] on table and view: (col_name, data_type, comment)
    d = eng.sql("DESCRIBE db.t_meta")
    assert d.columns == ["col_name", "data_type", "comment"]
    assert [r["col_name"] for r in d.collect()] == ["id", "v"]
    dv = eng.sql("DESCRIBE db.v_meta")
    assert dv.columns == ["col_name", "data_type", "comment"]
    assert [(r["col_name"], r["data_type"]) for r in dv.collect()] == [
        ("id", "bigint"), ("v", "string")]
    dve = eng.sql("DESCRIBE EXTENDED db.v_meta").collect()
    names = [r["col_name"] for r in dve]
    assert "# Detailed View Information" in names
    info = {r["col_name"]: r["data_type"] for r in dve}
    assert info["Name"] == "db.v_meta"
    assert info["Comment"] == "meta view"
    assert "SELECT id, v FROM t_meta" in info["View Text"]
    assert info["View Properties"] == "vp=1"

    # SHOW CREATE TABLE works on the view too (docs/spark-ddl.md:674-679)
    ct = eng.sql("SHOW CREATE TABLE db.v_meta").collect()[0]["createtab_stmt"]
    assert ct.startswith("CREATE VIEW db.v_meta")
    assert "COMMENT 'meta view'" in ct and "'vp' = '1'" in ct


def test_database_statements_route_through_engine_sql(engine):
    """CREATE/DROP/SHOW DATABASE as statement text (iceberg_it.py:185-187
    surface; DROP ... CASCADE runs the read-only guard across contained
    tables first)."""
    eng = engine
    eng.sql("CREATE DATABASE mydb")
    assert [r["namespace"] for r in
            eng.sql("SHOW DATABASES").collect()] == ["mydb"]
    eng.sql("CREATE DATABASE IF NOT EXISTS mydb")  # idempotent
    with pytest.raises(Exception):
        eng.sql("CREATE DATABASE mydb")
    eng.sql("CREATE TABLE mydb.t1 (id BIGINT)")
    with pytest.raises(ValueError, match="not empty"):
        eng.sql("DROP DATABASE mydb")
    eng.sql("DROP DATABASE mydb CASCADE")
    assert not eng.catalog.table_exists("mydb.t1")
    # the drop is observable: gone from SHOW DATABASES, re-creatable
    assert "mydb" not in [r["namespace"] for r in
                          eng.sql("SHOW DATABASES").collect()]
    eng.sql("CREATE DATABASE mydb")  # no TableAlreadyExistsError
    eng.sql("DROP DATABASE mydb")    # empty: no CASCADE needed, still gone
    assert "mydb" not in [r["namespace"] for r in
                          eng.sql("SHOW DATABASES").collect()]
    eng.sql("DROP DATABASE IF EXISTS nosuch")  # no error
    # without IF EXISTS a missing database is an error, not a false success
    with pytest.raises(Exception, match="nosuch"):
        eng.sql("DROP DATABASE nosuch")
    # read-only table blocks the cascade (ReadOnlyTableCheckRule parity)
    eng.sql("CREATE DATABASE ro")
    eng.sql("CREATE TABLE ro.t (id BIGINT) "
            "TBLPROPERTIES ('hive-ext.readOnly' = 'true')")
    with pytest.raises(Exception, match="read-only|read only"):
        eng.sql("DROP DATABASE ro CASCADE")


def test_sql_pivot_unpivot_round_trip(engine, spark):
    """Round 8 (VERDICT r7 #8, SQL-surface parity): the PIVOT / UNPIVOT
    matrix from events_pivot_hourly_matrix expressed as SQL TEXT through
    Engine.sql over an engine catalog table — the wide PIVOT clause, the
    UNPIVOT melt back to long, and equality with the DataFrame-form gate
    on the same rows."""
    from iceberg_demo_spark import registry
    from tests.conftest import SF_SMALL

    registry.load_all()
    eng = engine
    eng.sql("CREATE TABLE db.ev (event_type STRING, ts TIMESTAMP_NTZ)")
    src = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    eng.catalog.load_table("db.ev").append(
        src.select("event_type", "ts"))

    types = ("click", "error", "purchase", "signup", "view")
    in_list = ", ".join(f"'{t}' AS {t}" for t in types)
    cols = ", ".join(types)
    wide_sql = f"""
        SELECT * FROM (
          SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour_of_day,
                 event_type
          FROM db.ev
        ) PIVOT (count(1) FOR event_type IN ({in_list}))
    """
    wide = eng.sql(wide_sql)
    assert set(wide.columns) == {"hour_of_day", *types}

    long_sql = f"""
        SELECT hour_of_day, event_type, CAST(n AS BIGINT) AS n FROM (
          {wide_sql}
        ) UNPIVOT (n FOR event_type IN ({cols}))
        WHERE n > 0
        ORDER BY hour_of_day, event_type
    """
    got = [tuple(r) for r in eng.sql(long_sql).collect()]
    exp = [tuple(r) for r in registry.QUERIES["events_pivot_hourly_matrix"](
        spark, SF_SMALL).collect()]
    assert got == exp and got


def test_sql_pivot_resolves_engine_catalog_table(engine, spark):
    """PIVOT over a dotted engine-table ref binds through
    _bind_catalog_refs like any plain SELECT — no pre-registration."""
    eng = engine
    eng.sql("CREATE TABLE db.pv (k STRING, v BIGINT)")
    eng.catalog.load_table("db.pv").append(spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, v bigint"))
    r = eng.sql("SELECT * FROM db.pv "
                "PIVOT (SUM(v) FOR k IN ('a' AS a, 'b' AS b))").collect()
    assert [tuple(x) for x in r] == [(3, 5)]
