"""Temporal join operators Spark lacks as built-ins: as-of join and
interval range join, composed from DataFrame primitives (no UDFs).

As-of join (each left row ↔ the latest right row at-or-before it, per key)
is THE time-series primitive (market data, attribution, sensor alignment).
Spark has no ASOF JOIN; the naive inequality-join + per-left-row max is a
nested-loop disaster at scale. The composition here is the standard
distributed form: union both sides, one window sort per key, carry the last
non-null right value forward — exactly ONE shuffle per input (the window's
hash partition by key), no pair blow-up, and whole-stage codegen throughout.
DuckDB has native ASOF JOIN, which makes a bit-exact oracle.

Range join (left rows ↔ right intervals containing them) uses time-bin
bucketing: intervals explode to the fixed-width bins they overlap, points
map to their single bin, the join is a plain equi-join on (key, bin)
refined by the exact bounds — pairs ∝ true matches instead of |L|·|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables


def _micros(c: Column | str) -> Column:
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ input.

    Parquet event times arrive as TIMESTAMP_NTZ (isAdjustedToUTC=false),
    which ``unix_micros`` rejects; the session timezone is pinned to UTC
    (session.py), so the cast is a pure reinterpretation."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: list[str], tiebreak: str | None = None) -> DataFrame:
    """For every left row, attach ``right_cols`` from the latest right row
    with ``right.ts <= left.ts`` on the same ``key`` (NULLs when no such row
    — an as-of LEFT join). ``tiebreak`` orders equal-timestamp right rows
    (highest wins), making results deterministic under ts collisions."""
    lcols = left.columns
    u = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        u = u.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rr = right.select(
        key, F.col(ts).alias(ts),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (key, ts):
            rr = rr.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = u.unionByName(rr)
    order: list[Column] = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_last())
    w = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(f"_m_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_m_{c}").alias(f"r_{c}") for c in right_cols]
    )


@query(
    "asof_click_attribution",
    oracle="""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         views  AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT c.event_id AS click_id,
           c.user_id AS user_id,
           v.event_id AS view_id,
           date_diff('microsecond', v.ts, c.ts) AS gap_us
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    ORDER BY click_id
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: every click matched to the user's latest
    prior (or simultaneous) view. Values checked against DuckDB's NATIVE
    ASOF JOIN — the composition must reproduce its semantics exactly,
    including unmatched-left NULLs."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"))
    out = asof_join(clicks, views, key="user_id", ts="ts",
                    right_cols=["view_id", "vts"], tiebreak="view_id")
    return out.select(
        "click_id", "user_id",
        F.col("r_view_id").alias("view_id"),
        (_micros("ts") - _micros("r_vts")).alias("gap_us"),
    ).orderBy("click_id")


def range_join_bins(points: DataFrame, intervals: DataFrame, key: str,
                    ts: str, t0: str, t1: str,
                    bin_micros: int) -> DataFrame:
    """Equi-join points to the (half-open ``(t0, t1]``) intervals containing
    them: intervals explode to overlapped bins, points map to one bin, join
    on (key, bin), refine on exact bounds. ``bin_micros`` must be >= the
    maximum interval width so an interval spans at most 2 bins."""
    p = points.withColumn(
        "_bin", F.floor(_micros(ts) / F.lit(bin_micros)))
    b0 = F.floor(_micros(t0) / F.lit(bin_micros))
    iv = intervals.withColumn(
        "_bin", F.explode(F.array(b0, b0 + 1)))
    return (
        p.join(iv, [key, "_bin"])
        .filter((F.col(ts) > F.col(t0)) & (F.col(ts) <= F.col(t1)))
        .drop("_bin")
    )


@query(
    "range_join_error_window",
    oracle="""
    WITH err AS (
      SELECT event_id AS err_id, user_id, ts AS t0,
             ts + INTERVAL 10 MINUTE AS t1
      FROM events WHERE event_type = 'error'
    )
    SELECT err.err_id AS err_id,
           COUNT(e.event_id) AS n_follow
    FROM err LEFT JOIN events e
      ON e.user_id = err.user_id AND e.ts > err.t0 AND e.ts <= err.t1
    GROUP BY err.err_id
    ORDER BY err_id
    """,
)
def range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: how many same-user events land in the 10 minutes
    after it. The bin-bucketed range join must equal the plain inequality
    join (the O(|L|·|R|) form DuckDB runs as the oracle)."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t1"))
    points = ev.select("user_id", "ts", F.col("event_id").alias("pt_id"))
    pairs = range_join_bins(points, err, key="user_id", ts="ts",
                            t0="t0", t1="t1", bin_micros=600_000_000)
    counts = pairs.groupBy("err_id").agg(F.count(F.lit(1)).alias("n_follow"))
    return (
        err.select("err_id").join(counts, "err_id", "left")
        .select("err_id", F.coalesce("n_follow", F.lit(0)).alias("n_follow"))
        .orderBy("err_id")
    )
