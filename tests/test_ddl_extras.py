"""Identifier fields (iceberg_it.py:395-396), the Spark-4 mergeInto builder
(docs/spark-writes.md:337-353), CREATE TABLE LIKE rejection
(iceberg_it.py:464-479), variant type (iceberg_it.py:1198-1228), and
write.distribution-mode (docs/spark-writes.md:380-430)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_demo_spark.tables import Catalog, merge_into
from iceberg_demo_spark.tables.catalog import UnsupportedOperationError
from iceberg_demo_spark.tables import procedures as proc


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _sample(catalog, name="db.t", partition_by=None):
    t = catalog.create_table(
        name, "id bigint not null, data string, category string, amount double",
        partition_by=partition_by,
    )
    t.append(catalog.spark.createDataFrame(
        [(1, "a", "x", 10.0), (2, "b", "x", 20.0), (3, "c", "y", 30.0)],
        schema=t.schema()))
    return t


# -- identifier fields -----------------------------------------------------

def test_set_and_drop_identifier_fields(catalog):
    t = _sample(catalog)
    t.set_identifier_fields("id")
    assert t.identifier_fields == ["id"]
    t2 = catalog.load_table("db.t")  # persisted across reload
    assert t2.identifier_fields == ["id"]
    t2.drop_identifier_fields("id")
    assert t2.identifier_fields == []


def test_identifier_fields_must_be_not_null(catalog):
    t = _sample(catalog)
    with pytest.raises(ValueError, match="required"):
        t.set_identifier_fields("data")  # nullable column


def test_changelog_defaults_to_identifier_fields(catalog):
    """With identifier fields set, an UPDATE shows as UPDATE_BEFORE/AFTER in
    the changelog without passing identifier_columns explicitly."""
    t = _sample(catalog)
    t.set_identifier_fields("id")
    t.update_where({"amount": "amount + 5"}, "id = 2")
    cl = proc.create_changelog_view(t, "idf_changes")
    types = {r["_change_type"] for r in cl.filter("id = 2").collect()}
    assert types == {"INSERT", "UPDATE_BEFORE", "UPDATE_AFTER"}


# -- mergeInto builder -----------------------------------------------------

def test_merge_into_update_all_insert_all(catalog):
    t = _sample(catalog)
    src = catalog.spark.createDataFrame(
        [(2, "B!", "x", 222.0), (9, "new", "z", 999.0)], schema=t.schema())
    merge_into(catalog, "db.t", src, on="t.id = s.id") \
        .when_matched().update_all() \
        .when_not_matched().insert_all() \
        .merge()
    rows = {r["id"]: (r["data"], r["amount"]) for r in t.refresh().scan().collect()}
    assert rows[2] == ("B!", 222.0)
    assert rows[9] == ("new", 999.0)
    assert rows[1] == ("a", 10.0)
    assert len(rows) == 4


def test_merge_into_conditional_clauses_and_nmbs(catalog):
    t = _sample(catalog)
    src = catalog.spark.createDataFrame(
        [(1, 100.0), (2, 1.0)], "id bigint, amt double")
    merge_into(catalog, "db.t", src, on="t.id = s.id") \
        .when_matched("s.amt >= 50").update({"amount": "s.amt"}) \
        .when_matched().delete() \
        .when_not_matched_by_source().update({"data": "concat(t.data, '_stale')"}) \
        .merge()
    rows = {r["id"]: (r["data"], r["amount"]) for r in t.refresh().scan().collect()}
    assert rows[1] == ("a", 100.0)      # first clause won
    assert 2 not in rows                 # second clause deleted
    assert rows[3] == ("c_stale", 30.0)  # not matched by source


def test_merge_into_cardinality_toggle(catalog):
    from iceberg_demo_spark.tables.table import MergeCardinalityError

    t = _sample(catalog)
    dup = catalog.spark.createDataFrame(
        [(1, 5.0), (1, 6.0)], "id bigint, amt double")
    b = merge_into(catalog, "db.t", dup, on="t.id = s.id") \
        .when_matched().update({"amount": "s.amt"})
    with pytest.raises(MergeCardinalityError):
        b.merge()


# -- CREATE TABLE LIKE (negative) ------------------------------------------

def test_create_table_like_rejected(catalog):
    _sample(catalog)
    with pytest.raises(UnsupportedOperationError, match="not supported"):
        catalog.create_table_like("db.t_like", "db.t")
    assert not catalog.table_exists("db.t_like")


# -- variant type ----------------------------------------------------------

def test_variant_type_round_trip(catalog, spark):
    """Variant column through a table: parse_json literals in,
    variant_get / to_json out (Spark 4, iceberg_it.py:1198-1228)."""
    try:
        t = catalog.create_table("db.var", "id bigint, v variant")
        df = spark.sql(
            "select 1 as id, parse_json('{\"a\": 1, \"tags\": [\"x\",\"y\"]}') as v "
            "union all select 2, parse_json('{\"a\": 2}') "
            "union all select 3, cast(null as variant)"
        )
        t.append(df)
    except Exception as e:  # pragma: no cover - mirror the reference SkipCase
        pytest.skip(f"variant unsupported in this build: {e}")
    out = t.scan().selectExpr(
        "id", "variant_get(v, '$.a', 'int') as a",
        "variant_get(v, '$.tags[0]', 'string') as tag0").orderBy("id").collect()
    assert [(r["id"], r["a"], r["tag0"]) for r in out] == \
        [(1, 1, "x"), (2, 2, None), (3, None, None)]


# -- write.distribution-mode -----------------------------------------------

def test_distribution_mode_hash_one_file_per_partition(catalog, spark):
    t = catalog.create_table(
        "db.dist", "id bigint, category string, amount double",
        partition_by=[("category",)],
        properties={"write.distribution-mode": "hash"},
    )
    df = spark.createDataFrame(
        [(i, "c" + str(i % 3), float(i)) for i in range(300)],
        schema=t.schema()).repartition(8)
    t.append(df)
    files = t.metadata.current_snapshot().files
    by_part = {}
    for f in files:
        by_part.setdefault(f.partition["_p_category"], []).append(f)
    assert set(by_part) == {"c0", "c1", "c2"}
    # hash distribution clusters each partition's rows into one task
    assert all(len(v) == 1 for v in by_part.values()), by_part


def test_distribution_mode_range_uses_sort_order(catalog, spark):
    t = catalog.create_table(
        "db.rng", "id bigint, amount double",
        properties={"write.distribution-mode": "range"},
    )
    t.set_write_order([{"col": "id", "dir": "asc"}])
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], schema=t.schema()).repartition(4)
    t.append(df)
    # range distribution ⇒ files cover disjoint id ranges
    import pyarrow.parquet as pq
    import os
    ranges = []
    for f in t.metadata.current_snapshot().files:
        md = pq.ParquetFile(os.path.join(t.location, f.path))
        tbl = md.read(columns=["id"])
        ids = tbl.column("id").to_pylist()
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges
    assert sorted(r["id"] for r in t.scan().collect()) == list(range(1000))


# -- DROP DATABASE [CASCADE] with the read-only guard ----------------------

def test_drop_database_cascade_blocked_by_readonly_table(catalog):
    from iceberg_demo_spark.tables.table import ReadOnlyTableError

    a = catalog.create_table("dropdb.a", "id bigint")
    catalog.create_table("dropdb.b", "id bigint")
    a.set_properties({"hive-ext.readOnly": "TRUE"})  # case-insensitive value
    with pytest.raises(ValueError, match="not empty"):
        catalog.drop_database("dropdb")
    with pytest.raises(ReadOnlyTableError):
        catalog.drop_database("dropdb", cascade=True)
    # both tables survive the blocked cascade
    assert catalog.table_exists("dropdb.a") and catalog.table_exists("dropdb.b")
    a.unset_properties(["hive-ext.readOnly"])
    dropped = catalog.drop_database("dropdb", cascade=True)
    assert sorted(dropped) == ["dropdb.a", "dropdb.b"]
    assert not catalog.table_exists("dropdb.a")


# -- char / varchar / time types (type-matrix completion) ------------------

def test_char_varchar_stored_as_string(catalog, spark):
    """char(n)/varchar(n) normalize to string in the table schema — the
    documented Iceberg conversion (iceberg_it.py:1024-1052)."""
    t = catalog.create_table("db.cv", "id bigint, c char(10), v varchar(50)")
    assert [f.type for f in t.metadata.schema] == ["bigint", "string", "string"]
    df = spark.sql(
        "SELECT 1 AS id, CAST('abc' AS char(10)) AS c, "
        "CAST('hello' AS varchar(50)) AS v")
    t.append(df)
    rows = t.scan().collect()
    assert rows[0]["v"] == "hello"
    assert rows[0]["c"].rstrip() == "abc"  # char pads to width under ANSI


def test_time_type_round_trip_or_skip(catalog, spark):
    """Iceberg `time`: unsupported by Spark <4.1 (reference expects SKIP,
    iceberg_it.py:1230-1262); Spark 4.1 adds TimeType — round-trip if the
    whole write/read path supports it, else skip like the reference."""
    try:
        t = catalog.create_table("db.tm", "id bigint, tcol time")
        t.append(spark.sql("SELECT 1 AS id, TIME'12:34:56' AS tcol"))
        rows = t.scan().collect()
    except Exception as e:
        pytest.skip(f"time type unsupported in this build: {e}")
    assert str(rows[0]["tcol"]) == "12:34:56"


def test_create_list_drop_database(catalog):
    catalog.create_database("salesdb")
    catalog.create_database("salesdb", if_not_exists=True)  # idempotent
    with pytest.raises(Exception, match="salesdb"):
        catalog.create_database("salesdb")
    catalog.create_table("salesdb.t1", "id bigint")
    assert "salesdb" in catalog.list_databases()
    assert catalog.list_tables("salesdb") == ["salesdb.t1"]
    catalog.drop_database("salesdb", cascade=True, purge=True)
    assert not catalog.table_exists("salesdb.t1")
