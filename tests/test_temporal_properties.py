"""Property-based tests: the temporal join compositions must equal their
naive quadratic definitions on arbitrary generated inputs — not just on the
events table the gates use. Mirrors the hypothesis suite in test_mor.py."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_demo_spark.operators.temporal import asof_join, range_join_bins

_BASE = dt.datetime(2024, 1, 1)

# small key/timestamp domains force collisions (same key, equal timestamps,
# empty partitions) — the cases a naive implementation gets wrong
_key = st.integers(min_value=0, max_value=3)
_sec = st.integers(min_value=0, max_value=50)

_left_rows = st.lists(st.tuples(_key, _sec), min_size=1, max_size=12)
_right_rows = st.lists(st.tuples(_key, _sec, st.integers(0, 99)),
                       min_size=0, max_size=12)


def _ts(s: int) -> dt.datetime:
    return _BASE + dt.timedelta(seconds=s)


@given(left=_left_rows, right=_right_rows)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_equals_naive_latest_at_or_before(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
        "lid bigint, k bigint, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, _ts(s), v) for (k, s, v) in right],
        "k bigint, ts timestamp, v bigint")
    got = {r["lid"]: r["r_v"] for r in
           asof_join(ldf, rdf, key="k", ts="ts", right_cols=["v"],
                     tiebreak="v").collect()}
    for i, (k, s) in enumerate(left):
        cands = [(rs, rv) for (rk, rs, rv) in right if rk == k and rs <= s]
        # tiebreak=v: among max-ts candidates the highest v wins
        exp = max(cands, key=lambda c: (c[0], c[1]))[1] if cands else None
        assert got[i] == exp, (i, k, s, cands)


_points = st.lists(st.tuples(_key, _sec), min_size=0, max_size=12)
_ivals = st.lists(st.tuples(_key, _sec, st.integers(0, 9)),
                  min_size=0, max_size=8)


@given(points=_points, ivals=_ivals)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_range_join_bins_equals_naive_containment(spark, points, ivals):
    # interval widths ≤ 9s; bin = 10s satisfies the ≤-max-width contract
    pdf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(points)],
        "pid bigint, k bigint, ts timestamp")
    idf = spark.createDataFrame(
        [(j, k, _ts(s), _ts(s + w)) for j, (k, s, w) in enumerate(ivals)],
        "iid bigint, k bigint, t0 timestamp, t1 timestamp")
    got = {(r["pid"], r["iid"]) for r in
           range_join_bins(pdf, idf, key="k", ts="ts", t0="t0", t1="t1",
                           bin_micros=10_000_000).collect()}
    exp = {(i, j)
           for i, (pk, ps) in enumerate(points)
           for j, (ik, s, w) in enumerate(ivals)
           if pk == ik and s < ps <= s + w}
    assert got == exp


def test_gap_fill_matches_python_locf(spark):
    """Gap-fill gate vs a pure-Python hourly LOCF recompute."""
    import datetime as dt
    from collections import defaultdict

    from iceberg_demo_spark import registry
    from tests.conftest import SF_SMALL

    registry.load_all()
    got = {r["user_id"]: r for r in
           registry.QUERIES["events_gap_fill_resample"](spark, SF_SMALL)
           .collect()}
    by_user = defaultdict(list)
    for r in spark.read.parquet(f"{SF_SMALL}/events.parquet").collect():
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    assert set(got) == set(by_user)
    for uid, evs in by_user.items():
        hour = lambda t: t.replace(minute=0, second=0, microsecond=0)
        per_hour = {}
        for ts, eid, v in sorted(evs):
            per_hour[hour(ts)] = v  # sorted ⇒ max (ts, event_id) wins
        h0, h1 = hour(min(e[0] for e in evs)), hour(max(e[0] for e in evs))
        n_hours = n_obs = 0
        locf = None
        h = h0
        while h <= h1:
            n_hours += 1
            if h in per_hour:
                n_obs += 1
                locf = per_hour[h]
            h += dt.timedelta(hours=1)
        g = got[uid]
        assert (g["n_hours"], g["n_observed"], g["n_gap_hours"]) == (
            n_hours, n_obs, n_hours - n_obs)
        assert abs(g["end_value"] - locf) < 0.01
