"""Round-6 ADVICE regressions.

high — engine._bind_catalog_refs extracted prune_where from the FIRST
WHERE in the statement without checking paren depth, so a WHERE that
belongs to a scalar subquery in the SELECT list was applied as a
partition-prune predicate to the depth-0 outer table, silently dropping
its other partitions. The extraction now runs on the length-preserving
flat shadow, requires the WHERE at paren depth 0, terminates the capture
only at a depth-0 GROUP BY/ORDER BY/LIMIT, and requires the captured
text paren-balanced.

low — _partition_allowed treated an empty (non-None) transform result as
a real constraint (allowed[pcol] = set() prunes EVERY file); empty now
means "no provable constraint".

low — time-transform range bounds compared lexicographically (wrong for
years >= 10000); now compared as parsed integer tuples.
"""

from __future__ import annotations

import pytest

from iceberg_demo_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def _setup_regions(engine):
    t = engine.catalog.create_table(
        "db.t", "o_id bigint, region string", partition_by=[("region",)])
    t.append(engine.spark.createDataFrame(
        [(1, "EU"), (2, "US"), (3, "AS")], schema=t.schema()))
    side = engine.catalog.create_table(
        "db.side", "v bigint, region string", partition_by=[("region",)])
    side.append(engine.spark.createDataFrame(
        [(10, "EU"), (20, "US"), (30, "AS")], schema=side.schema()))
    return t, side


def test_select_list_subquery_where_does_not_prune_outer(engine):
    """The exact ADVICE repro: the only WHERE belongs to a scalar
    subquery in the SELECT list — the outer table has no predicate and
    must return ALL its partitions."""
    _setup_regions(engine)
    got = engine.sql(
        "SELECT o_id, (SELECT v FROM db.side WHERE region = 'EU' "
        "ORDER BY v LIMIT 1) AS m FROM db.t").collect()
    assert sorted(r["o_id"] for r in got) == [1, 2, 3]
    assert all(r["m"] == 10 for r in got)


def test_where_subquery_where_does_not_prune_outer(engine):
    """A WHERE nested in an EXISTS subquery (still the only WHERE at
    depth > 0 … plus the outer one at depth 0): only the OUTER text may
    prune, and inner ORDER BY must not truncate the capture."""
    t, _side = _setup_regions(engine)
    got = engine.sql(
        "SELECT o_id FROM db.t WHERE region = 'US' AND o_id IN "
        "(SELECT v / 10 FROM db.side ORDER BY v LIMIT 3)").collect()
    assert [r["o_id"] for r in got] == [2]


def test_depth0_where_still_prunes(engine):
    """Positive control: a plain depth-0 WHERE keeps driver-side
    partition pruning engaged (file-level, not just row-level)."""
    t, _ = _setup_regions(engine)
    pruned = t._prune_files(t._branch_files("main"), "region = 'EU'")
    assert len(pruned) == 1
    got = engine.sql("SELECT o_id FROM db.t WHERE region = 'EU'").collect()
    assert [r["o_id"] for r in got] == [1]


def test_subquery_only_statement_no_outer_prune(engine):
    """No depth-0 WHERE at all (the statement's single WHERE is inside a
    FROM-subquery): nothing must be treated as the outer predicate."""
    _setup_regions(engine)
    got = engine.sql(
        "SELECT count(*) AS n FROM db.t, "
        "(SELECT v FROM db.side WHERE region = 'EU') s").collect()
    assert got[0]["n"] == 3  # 3 outer rows x 1 subquery row


# -- low: empty transform result must not prune every file ------------------

def test_empty_transform_result_keeps_all_files(engine, monkeypatch):
    t = engine.catalog.create_table(
        "db.emptyp", "id bigint, cat string", partition_by=[("cat",)])
    t.append(engine.spark.createDataFrame(
        [(0, "x"), (1, "y")], schema=t.schema()))
    files = t._branch_files("main")
    monkeypatch.setattr(type(t), "_eval_transform",
                        lambda self, p, vals: set())
    # the empty transform result must impose NO partition constraint
    # (an empty allowed-set would prune every file); column-stats
    # pruning is checked separately and stripped here
    assert t._partition_allowed("cat = 'x'") == {}
    import dataclasses

    blind = [dataclasses.replace(f, lower={}, upper={}, nulls={})
             for f in files]
    assert t._prune_files(blind, "cat = 'x'") == blind


# -- low: time-transform bounds compare as integer tuples -------------------

def test_passes_ranges_time_tuples():
    from iceberg_demo_spark.tables.table import Table

    # 5-digit year must NOT sort before '9999'
    assert Table._passes_ranges("10000", [("ge", "9999", "time")])
    assert not Table._passes_ranges("9998", [("ge", "9999", "time")])
    assert Table._passes_ranges("2024-03", [("ge", "2023-12", "time")])
    assert not Table._passes_ranges("2023-11", [("ge", "2023-12", "time")])
    assert Table._passes_ranges("2024-01-02-03",
                                [("le", "2024-01-02-04", "time")])
    # shape mismatch can't prove a violation — keep
    assert Table._passes_ranges("2024", [("le", "2023-12", "time")])
    # numeric + plain string kinds unchanged
    assert Table._passes_ranges("10", [("ge", "9", "num")])
    assert not Table._passes_ranges("10", [("ge", "9", "str")])


def test_time_partition_range_prune_still_correct(engine):
    """End-to-end: a months-partitioned table pruned with a range
    predicate returns exactly the right rows."""
    t = engine.catalog.create_table(
        "db.tm", "id bigint, ts timestamp",
        partition_by=[("ts", "month")])
    t.append(engine.spark.sql(
        "SELECT * FROM VALUES (1, TIMESTAMP'2023-11-05 00:00:00'), "
        "(2, TIMESTAMP'2023-12-15 00:00:00'), "
        "(3, TIMESTAMP'2024-03-20 00:00:00') AS v(id, ts)"))
    got = t.scan(where="ts >= '2023-12-01 00:00:00'").collect()
    assert {r["id"] for r in got} == {2, 3}
    pruned = t._prune_files(t._branch_files("main"),
                            "ts >= '2023-12-01 00:00:00'")
    assert len(pruned) == 2
