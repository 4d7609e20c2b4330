"""Multi-writer concurrency stress (VERDICT r6 #7).

The optimistic-commit protocol under real thread-level contention:
``metadata.save()`` is a compare-and-swap on the versioned metadata file
(format.py write-exclusive create), appends auto-retry lost races on
refreshed metadata (table.py::append, ``commit.retry.num-retries``), and
row-rewriting DML does NOT retry — its file rewrites were planned
against the pre-conflict snapshot, so it must either win the CAS or
surface ``CommitConflictError`` to the caller. The stress asserts the
documented semantics hold under 8 concurrent appenders + 2 concurrent
MERGE writers: every append lands exactly once, and every MERGE either
wins (its effect visible in the final state — the merges touch disjoint
keys, so a won merge can't be overwritten) or raises — never a silent
drop."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from iceberg_demo_spark.tables import Catalog
from iceberg_demo_spark.tables.format import CommitConflictError


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def test_concurrent_appends_all_land(spark, catalog):
    """8 writers × 3 appends each, every writer on its OWN Table handle
    (independent metadata state, as separate processes would have): all
    24 commits land, no row lost or duplicated, and the snapshot chain is
    a single linear history."""
    t0 = catalog.create_table(
        "db.conc", "writer bigint, seq bigint, v double",
        properties={"commit.retry.num-retries": "50"})

    def writer(w: int) -> int:
        t = catalog.load_table("db.conc")
        for seq in range(3):
            t.append(spark.createDataFrame(
                [(w, seq, float(w * 100 + seq))], schema=t.schema()))
        return w

    with ThreadPoolExecutor(max_workers=8) as ex:
        assert sorted(ex.map(writer, range(8))) == list(range(8))

    t0.refresh()
    rows = {(r["writer"], r["seq"]) for r in t0.scan().collect()}
    assert rows == {(w, s) for w in range(8) for s in range(3)}
    assert t0.scan().count() == 24  # exactly once — no duplicate commits
    # linear history: every snapshot's parent is the previous snapshot
    chain = list(reversed(t0.metadata.ancestors()))
    assert len(chain) == 24
    for prev, cur in zip(chain, chain[1:]):
        assert cur.parent_id == prev.snapshot_id


def test_concurrent_appends_and_merges_win_or_surface(spark, catalog):
    """8 appenders interleaved with 2 MERGE writers on disjoint key
    ranges: appends all land (auto-retry); each MERGE either commits —
    then its updates MUST be visible in the final state — or surfaces
    CommitConflictError. A merge that neither raised nor left its effect
    would be a silent drop, the one forbidden outcome."""
    t0 = catalog.create_table(
        "db.conc2", "k bigint, v double",
        properties={"commit.retry.num-retries": "50"})
    t0.append(spark.createDataFrame(
        [(k, 0.0) for k in range(20)], schema=t0.schema()))

    merge_result: dict[int, str] = {}

    def appender(w: int) -> None:
        t = catalog.load_table("db.conc2")
        t.append(spark.createDataFrame(
            [(100 + w, float(w))], schema=t.schema()))

    def merger(m: int) -> None:
        # disjoint key ranges: merger 0 owns keys 0-9, merger 1 owns 10-19
        t = catalog.load_table("db.conc2")
        src = spark.createDataFrame(
            [(k, 1000.0 + m) for k in range(m * 10, m * 10 + 10)],
            "k bigint, v double")
        try:
            t.merge(src, on="t.k = s.k",
                    matched=[{"action": "update", "set": {"v": "s.v"}}],
                    not_matched=[{"values": None}],
                    check_cardinality=False)
            merge_result[m] = "committed"
        except CommitConflictError:
            merge_result[m] = "conflict"

    with ThreadPoolExecutor(max_workers=10) as ex:
        futs = [ex.submit(appender, w) for w in range(8)]
        futs += [ex.submit(merger, m) for m in range(2)]
        for f in futs:
            f.result()  # propagate unexpected exceptions

    t0.refresh()
    final = {r["k"]: r["v"] for r in t0.scan().collect()}
    # every append landed exactly once
    for w in range(8):
        assert final[100 + w] == float(w)
    assert t0.scan().count() == 28
    # each merge: won → effect visible; lost → it RAISED (recorded above)
    assert set(merge_result) == {0, 1}
    for m, outcome in merge_result.items():
        keys = range(m * 10, m * 10 + 10)
        if outcome == "committed":
            assert all(final[k] == 1000.0 + m for k in keys), \
                f"merge {m} committed but its effect is missing"
        else:
            assert all(final[k] == 0.0 for k in keys), \
                f"merge {m} conflicted but partially applied"
