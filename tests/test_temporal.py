"""As-of join and range join: the scalable compositions must equal the
naive (quadratic) formulations."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from iceberg_demo_spark import registry
from iceberg_demo_spark.operators.temporal import asof_join, range_join_bins
from tests.conftest import SF_SMALL

registry.load_all()


def _events(spark):
    from iceberg_demo_spark.sources import load_tables

    return load_tables(spark, SF_SMALL, ("events",))["events"]


def test_asof_join_equals_naive(spark):
    ev = _events(spark)
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", "ts")
    views = ev.filter("event_type = 'view'").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("view_id"))
    got = {
        (r["click_id"], r["r_view_id"])
        for r in asof_join(
            clicks, views.select("user_id", F.col("vts").alias("ts"), "view_id"),
            key="user_id", ts="ts", right_cols=["view_id"], tiebreak="view_id",
        ).collect()
    }
    # naive: inequality join + row_number per click
    j = clicks.join(views, (clicks.user_id == views.user_id)
                    & (F.col("vts") <= F.col("ts")), "left")
    w = Window.partitionBy("click_id").orderBy(
        F.desc_nulls_last("vts"), F.desc_nulls_last("view_id"))
    want = {
        (r["click_id"], r["view_id"])
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").collect()
    }
    assert got == want and len(got) == clicks.count()


def test_asof_join_unmatched_left_is_null(spark):
    ev = _events(spark)
    first_view_ts = ev.filter("event_type = 'view'").agg(F.min("ts")).collect()[0][0]
    clicks = ev.filter("event_type = 'click'")
    early = clicks.filter(F.col("ts") < first_view_ts).count()
    if early == 0:
        return  # no early clicks at this SF — nothing to assert
    out = registry.QUERIES["asof_click_attribution"](spark, SF_SMALL)
    assert out.filter("view_id IS NULL").count() >= 1


def test_range_join_bins_equals_naive(spark):
    ev = _events(spark)
    err = ev.filter("event_type = 'error'").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t1"))
    points = ev.select("user_id", "ts", F.col("event_id").alias("pt_id"))
    got = {
        (r["err_id"], r["pt_id"])
        for r in range_join_bins(points, err, "user_id", "ts", "t0", "t1",
                                 600_000_000).collect()
    }
    naive = points.alias("p").join(
        err.alias("e"),
        (F.col("p.user_id") == F.col("e.user_id"))
        & (F.col("p.ts") > F.col("e.t0")) & (F.col("p.ts") <= F.col("e.t1")))
    want = {(r["err_id"], r["pt_id"]) for r in naive.collect()}
    assert got == want and got


def test_hourly_anomalies_match_python_recompute(spark):
    from collections import Counter

    from tests.conftest import SF_SMALL

    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_type", "ts").collect()
    hourly: Counter = Counter(
        (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        for r in rows)
    by_type: dict[str, list[tuple]] = {}
    for (et, h), c in hourly.items():
        by_type.setdefault(et, []).append((h, c))
    got = {r["event_type"]: r for r in registry.QUERIES[
        "events_hourly_anomalies"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_type)
    for et, hcs in by_type.items():
        n = len(hcs)
        s = sum(c for _h, c in hcs)
        ssq = sum(c * c for _h, c in hcs)
        n_anom = sum(1 for _h, c in hcs
                     if (c * n - s) ** 2 > 4 * (n * ssq - s * s))
        peak = max(c for _h, c in hcs)
        peak_hour = min(h for h, c in hcs if c == peak)
        r = got[et]
        assert (r["n_hours"], r["total_events"], r["n_anomalous"]) == \
            (n, s, n_anom)
        assert r["peak_count"] == peak and r["peak_hour"] == peak_hour


def test_type_transitions_match_python_recompute(spark):
    from collections import Counter, defaultdict

    from tests.conftest import SF_SMALL

    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "user_id", "event_type", "ts", "event_id").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"],
                                      r["event_type"]))
    pairs: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    outdeg: Counter = Counter()
    for (a, _b), n in pairs.items():
        outdeg[a] += n
    got = registry.QUERIES["events_type_transitions"](
        spark, SF_SMALL).collect()
    assert {(r["prev_type"], r["next_type"]) for r in got} == set(pairs)
    for r in got:
        k = (r["prev_type"], r["next_type"])
        assert r["n"] == pairs[k]
        assert r["p_next"] == round(pairs[k] / outdeg[k[0]], 4)


def test_distribution_drift_matches_pure_python(spark):
    """events_distribution_drift vs a pure-Python recompute at sf0.001:
    period split at the fixed timestamp, integer-bps shares, exact
    equality on every column."""
    import datetime
    from collections import defaultdict

    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_type", "ts").collect()
    split = datetime.datetime(2024, 1, 16)
    n = defaultdict(lambda: [0, 0])
    for r in rows:
        n[r["event_type"]][0 if r["ts"] < split else 1] += 1
    tot_a = sum(v[0] for v in n.values())
    tot_b = sum(v[1] for v in n.values())
    got = {r["event_type"]: r
           for r in registry.QUERIES["events_distribution_drift"](
               spark, SF_SMALL).collect()}
    assert set(got) == set(n)
    for et, (na, nb) in n.items():
        row = got[et]
        assert (row["n_a"], row["n_b"]) == (na, nb)
        assert row["bps_a"] == 10000 * na // tot_a
        assert row["bps_b"] == 10000 * nb // tot_b
        assert row["drift_bps"] == abs(10000 * na // tot_a
                                       - 10000 * nb // tot_b)
    # both periods must be populated or the monitor is vacuous
    assert tot_a > 0 and tot_b > 0


def test_scd2_history_matches_python_recompute(spark):
    from iceberg_demo_spark.operators.temporal import scd2_dimension
    from iceberg_demo_spark.sources import load_tables

    rows = scd2_dimension(spark, SF_SMALL).collect()
    orders = (load_tables(spark, SF_SMALL, ("orders",))["orders"]
              .select("o_custkey", "o_orderstatus", "o_orderdate",
                      "o_orderkey").collect())
    by_cust: dict[int, list] = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r)
    expected = []
    for ck, rs in by_cust.items():
        rs.sort(key=lambda r: (r.o_orderdate, r.o_orderkey))
        versions = []
        for r in rs:
            if not versions or versions[-1][0] != r.o_orderstatus:
                versions.append([r.o_orderstatus, r.o_orderdate])
        for i, (st, frm) in enumerate(versions):
            to = versions[i + 1][1] if i + 1 < len(versions) else None
            expected.append((ck, st, frm, to, i + 1))
    assert sorted((r.o_custkey, r.status, r.valid_from, r.valid_to,
                   r.version_n) for r in rows) == sorted(expected)
    # the GATE is the bounded audit over that same dimension (round 9):
    # recompute the histogram + checksums from the verified rows
    buckets: dict[int, list] = {}
    for ck, vs in (
            (ck, [r for r in rows if r.o_custkey == ck])
            for ck in {r.o_custkey for r in rows}):
        buckets.setdefault(len(vs), []).append(vs)
    got = {r["n_versions"]: r for r in registry.QUERIES[
        "orders_scd2_history"](spark, SF_SMALL).collect()}
    assert set(got) == set(buckets)
    for n, custs in buckets.items():
        flat = [v for vs in custs for v in vs]
        assert got[n]["n_customers"] == len(custs)
        assert got[n]["n_open"] == sum(
            1 for v in flat if v.valid_to is None) == len(custs)
        assert got[n]["covered_days"] == sum(
            (v.valid_to - v.valid_from).days
            for v in flat if v.valid_to is not None)
        for st, col in (("F", "n_f"), ("O", "n_o"), ("P", "n_p")):
            assert got[n][col] == sum(1 for v in flat if v.status == st)


def test_scd2_invariants(spark):
    from iceberg_demo_spark.operators.temporal import scd2_dimension

    rows = scd2_dimension(spark, SF_SMALL).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for vs in by_cust.values():
        vs.sort(key=lambda r: r.version_n)
        assert [v.version_n for v in vs] == list(range(1, len(vs) + 1))
        assert vs[-1].valid_to is None  # open-ended current version
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from  # gap-free ranges
            assert a.status != b.status  # a version IS a change
