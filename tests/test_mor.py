"""Merge-on-read DML: position-delete files instead of copy-on-write
rewrites (reference: iceberg_it.py:2274-2294 sets write.delete.mode =
merge-on-read, deletes, then CALL rewrite_position_delete_files; mode
properties documented in docs/spark-configuration.md and
docs/spark-writes.md). Asserts both the row-level semantics (scans equal the
copy-on-write result) and the file-level mechanics (data files untouched,
delete files accumulate and compact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_demo_spark.tables import Catalog
from iceberg_demo_spark.tables import procedures as proc

MOR_PROPS = {
    "write.delete.mode": "merge-on-read",
    "write.update.mode": "merge-on-read",
    "write.merge.mode": "merge-on-read",
}


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _mor_table(catalog, name="db.mor", partition_by=None, n=8):
    t = catalog.create_table(
        name, "id bigint not null, data string, category string, amount double",
        partition_by=partition_by,
    )
    rows = [(i, f"d{i}", "x" if i % 2 == 0 else "y", 10.0 * i) for i in range(1, n + 1)]
    t.append(catalog.spark.createDataFrame(rows, schema=t.schema()))
    t.set_properties(MOR_PROPS)
    return t


def _data_paths(t):
    snap = t.metadata.current_snapshot()
    return sorted(f.path for f in snap.files)


def test_mor_delete_keeps_data_files(catalog):
    t = _mor_table(catalog)
    before = _data_paths(t)
    snap = t.delete_where("id <= 3")
    assert snap is not None and snap.operation == "delete"
    assert _data_paths(t) == before  # no data file rewritten or removed
    assert len(snap.delete_files) == 1
    assert snap.delete_files[0].records == 3
    assert sorted(r["id"] for r in t.scan().collect()) == [4, 5, 6, 7, 8]


def test_mor_delete_time_travel_sees_old_rows(catalog):
    t = _mor_table(catalog)
    v1 = t.metadata.current_snapshot().snapshot_id
    t.delete_where("category = 'x'")
    assert t.scan().count() == 4
    assert t.scan(snapshot_id=v1).count() == 8


def test_mor_delete_noop_returns_none(catalog):
    t = _mor_table(catalog)
    assert t.delete_where("id > 100") is None


def test_mor_deletes_accumulate_and_compound(catalog):
    t = _mor_table(catalog)
    t.delete_where("id = 1")
    t.delete_where("id = 2")
    snap = t.metadata.current_snapshot()
    assert len(snap.delete_files) == 2
    assert sorted(r["id"] for r in t.scan().collect()) == [3, 4, 5, 6, 7, 8]
    # a second delete of an already-deleted row is a no-op
    assert t.delete_where("id = 1") is None


def test_mor_update_appends_new_images(catalog):
    t = _mor_table(catalog)
    before = _data_paths(t)
    snap = t.update_where({"amount": "amount + 1000"}, "id <= 2")
    assert snap is not None
    assert set(before) <= set(_data_paths(t))  # originals retained
    rows = {r["id"]: r["amount"] for r in t.scan().collect()}
    assert rows[1] == 1010.0 and rows[2] == 1020.0 and rows[3] == 30.0
    assert len(rows) == 8


def test_mor_matches_cow_semantics(catalog):
    """Same DML sequence under both modes ⇒ identical table contents."""
    cow = _mor_table(catalog, "db.cow_twin")
    cow.set_properties({k: "copy-on-write" for k in MOR_PROPS})
    mor = _mor_table(catalog, "db.mor_twin")
    for t in (cow, mor):
        t.delete_where("id in (2, 5)")
        t.update_where({"data": "concat(data, '!')"}, "amount >= 60")
    assert sorted(map(tuple, cow.scan().collect())) == \
        sorted(map(tuple, mor.scan().collect()))


def test_mor_merge_upsert(catalog):
    t = _mor_table(catalog, n=4)
    src = catalog.spark.createDataFrame(
        [(3, 333.0), (4, 444.0), (9, 999.0)], "key bigint, amt double")
    before = _data_paths(t)
    snap = t.merge(
        src, on="t.id = s.key",
        matched=[{"action": "update", "set": {"amount": "s.amt"}}],
        not_matched=[{"values": {"id": "s.key", "data": "'new'",
                                 "category": "'z'", "amount": "s.amt"}}],
    )
    assert snap is not None
    assert set(before) <= set(_data_paths(t))
    rows = {r["id"]: (r["amount"], r["data"]) for r in t.scan().collect()}
    assert rows[3] == (333.0, "d3") and rows[4] == (444.0, "d4")
    assert rows[9] == (999.0, "new") and rows[1] == (10.0, "d1")
    assert len(rows) == 5


def test_mor_merge_matched_delete(catalog):
    t = _mor_table(catalog, n=4)
    src = catalog.spark.createDataFrame([(1,), (3,)], "key bigint")
    t.merge(src, on="t.id = s.key", matched=[{"action": "delete"}])
    assert sorted(r["id"] for r in t.scan().collect()) == [2, 4]
    # data files untouched: deletion is positional
    snap = t.metadata.current_snapshot()
    assert snap.delete_files and snap.removed_files == []


def test_rewrite_position_delete_files_compacts(catalog):
    t = _mor_table(catalog)
    t.delete_where("id = 1")
    t.delete_where("id = 2")
    t.delete_where("id = 3")
    assert len(t.metadata.current_snapshot().delete_files) == 3
    res = proc.rewrite_position_delete_files(t)
    assert res["rewritten_delete_files_count"] == 3
    assert res["added_delete_files_count"] == 1
    assert len(t.metadata.current_snapshot().delete_files) == 1
    assert t.metadata.current_snapshot().delete_files[0].records == 3
    assert sorted(r["id"] for r in t.scan().collect()) == [4, 5, 6, 7, 8]


def test_rewrite_position_deletes_drops_dangling(catalog):
    """CoW overwrite after MoR deletes leaves dangling entries; the rewrite
    procedure drops them."""
    t = _mor_table(catalog)
    t.delete_where("id <= 2")
    # full compaction rewrites every data file ⇒ all entries dangle
    proc.rewrite_data_files(t, min_input_files=1)
    assert sorted(r["id"] for r in t.scan().collect()) == [3, 4, 5, 6, 7, 8]
    res = proc.rewrite_position_delete_files(t)
    assert res["rewritten_delete_files_count"] >= 1
    head = t.metadata.current_snapshot()
    assert head.delete_files == []  # nothing live to keep
    assert sorted(r["id"] for r in t.scan().collect()) == [3, 4, 5, 6, 7, 8]


def test_compaction_folds_deletes_into_data(catalog):
    t = _mor_table(catalog)
    t.delete_where("category = 'x'")
    res = proc.rewrite_data_files(t, min_input_files=1)
    assert res["rewritten_data_files_count"] >= 1
    snap = t.metadata.current_snapshot()
    live_rows = sum(f.records for f in snap.files)
    assert live_rows == 4  # deleted rows physically gone from new files
    assert sorted(r["id"] for r in t.scan().collect()) == [1, 3, 5, 7]


def test_mor_on_partitioned_table(catalog):
    t = _mor_table(catalog, "db.mor_part", partition_by=[("category",)])
    t.delete_where("category = 'x' and id <= 4")
    assert sorted(r["id"] for r in t.scan().collect()) == [1, 3, 5, 6, 7, 8]


def test_mor_files_metadata_table(catalog):
    t = _mor_table(catalog)
    t.delete_where("id = 1")
    files = t.files_df()
    assert files.filter("content = 1").count() == 1
    assert files.filter("content = 0").count() >= 1
    assert t.delete_files_df().count() == 1
    assert t.data_files_df().filter("content = 1").count() == 0


def test_mor_changelog_sees_positional_deletes(catalog):
    t = _mor_table(catalog, n=4)
    t.delete_where("id = 2")
    cl = proc.create_changelog_view(t, "mor_changes")
    dels = cl.filter("_change_type = 'DELETE'").collect()
    assert [r["id"] for r in dels] == [2]
    assert cl.filter("_change_type = 'INSERT'").count() == 4  # initial append


def test_mor_expire_snapshots_keeps_live_delete_files(catalog):
    import os

    t = _mor_table(catalog)
    t.delete_where("id = 1")
    t.append(catalog.spark.createDataFrame(
        [(99, "z", "x", 1.0)], schema=t.schema()))
    proc.expire_snapshots(t, older_than_ms=2**62, retain_last=1)
    head = t.metadata.current_snapshot()
    assert len(head.delete_files) == 1
    assert os.path.exists(os.path.join(t.location, head.delete_files[0].path))
    assert sorted(r["id"] for r in t.scan().collect()) == [2, 3, 4, 5, 6, 7, 8, 99]


def test_mor_branch_isolation(catalog):
    t = _mor_table(catalog)
    t.create_branch("audit")
    t.delete_where("id <= 4", branch="audit")
    assert t.scan().count() == 8
    assert t.scan(branch="audit").count() == 4


# -- property-based: CoW and MoR are observationally equivalent -------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:
    _op = st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.integers(100, 999), min_size=1, max_size=3)),
        st.tuples(st.just("delete"), st.integers(0, 50)),
        st.tuples(st.just("update"), st.integers(0, 50)),
        st.tuples(st.just("merge"), st.lists(st.integers(1, 60),
                                             min_size=1, max_size=3)),
    )

    @given(ops=st.lists(_op, min_size=1, max_size=4))
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    def test_property_cow_equals_mor(spark, tmp_path_factory, ops):
        """Any DML sequence leaves identical table contents under
        copy-on-write and merge-on-read storage."""
        catalog = Catalog(spark, str(tmp_path_factory.mktemp("prop_wh")))
        tables = []
        for mode in ("copy-on-write", "merge-on-read"):
            name = f"db.prop_{mode.replace('-', '_')}_{abs(hash(tuple(map(str, ops)))) % 10**6}"
            t = catalog.create_table(
                name, "id bigint, category string, amount double")
            t.append(catalog.spark.createDataFrame(
                [(i, "x" if i % 2 == 0 else "y", 10.0 * i) for i in range(1, 9)],
                schema=t.schema()))
            t.set_properties({k: mode for k in MOR_PROPS})
            for op, arg in ops:
                if op == "append":
                    t.append(catalog.spark.createDataFrame(
                        [(v, "z", float(v)) for v in arg], schema=t.schema()))
                elif op == "delete":
                    t.delete_where(f"id % 7 = {arg % 7}")
                elif op == "update":
                    t.update_where({"amount": "amount + 1"}, f"id > {arg}")
                else:
                    src = catalog.spark.createDataFrame(
                        [(v, float(v)) for v in set(arg)], "key bigint, amt double")
                    t.merge(src, on="t.id = s.key",
                            matched=[{"action": "update", "set": {"amount": "s.amt"}}],
                            not_matched=[{"values": {"id": "s.key", "category": "'m'",
                                                     "amount": "s.amt"}}])
            tables.append(sorted(map(tuple, t.scan().collect())))
        assert tables[0] == tables[1]


def test_large_delete_set_skips_forced_broadcast(catalog, spark, monkeypatch):
    """Past the broadcast budget the MoR read must not force-broadcast the
    delete set (build-side OOM at scale); results stay identical."""
    import iceberg_demo_spark.tables.table as tt

    t = catalog.create_table("db.mor_big", "id bigint, v string")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(spark.range(0, 100).selectExpr("id", "concat('v', id) AS v"))
    t.delete_where("id % 3 = 0")
    expected = sorted(r["id"] for r in t.scan().collect())
    monkeypatch.setattr(tt, "_DELETE_BROADCAST_BYTES", 0)
    got = sorted(r["id"] for r in t.scan().collect())
    assert got == expected
    assert all(i % 3 != 0 for i in got) and len(got) == 66


def test_position_deletes_metadata_table(catalog, spark):
    """The position_deletes metadata table lists every (file_path, pos)
    delete entry with its target's partition and the owning delete file
    (docs/spark-queries.md:381-390)."""
    t = catalog.create_table(
        "db.pdmt", "id bigint, cat string",
        partition_by=[("cat",)],
        properties={"write.delete.mode": "merge-on-read"})
    t.append(spark.createDataFrame(
        [(i, "x" if i % 2 == 0 else "y") for i in range(10)],
        schema=t.schema()))
    t.delete_where("id IN (2, 3, 4)")
    rows = t.position_deletes_df().collect()
    assert len(rows) == 3
    for r in rows:
        assert r["delete_file_path"].endswith(".parquet")
        assert r["row"] is None and r["spec_id"] == 0
        assert r["partition"] and "_p_cat" in r["partition"]
        assert r["pos"] >= 0
    # live read excludes exactly those rows
    assert {x["id"] for x in t.scan().collect()} == {0, 1, 5, 6, 7, 8, 9}
    # dispatch surface
    assert t.metadata_table("position_deletes").count() == 3
    # empty case: a fresh CoW table yields an empty frame with the schema
    t2 = catalog.create_table("db.pdmt2", "id bigint")
    assert t2.position_deletes_df().count() == 0
    assert "delete_file_path" in t2.position_deletes_df().columns
