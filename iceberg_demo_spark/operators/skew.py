"""Skew-handling operators: explicit salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew; these
operators are the *explicit* forms for cases AQE can't fix:

- **Salted two-phase aggregation**: a groupBy on a low-cardinality/hot key
  (e.g. 3 return flags across 600k rows) puts each key's entire stream
  through one reducer task. Salting splits each key into N_SALT sub-keys for
  a parallel partial aggregate, then combines the partials — the second
  shuffle carries only (key × N_SALT) rows. This is what map-side combine
  does for algebraic aggregates; the explicit form also covers combiners
  Spark can't fuse (e.g. collect + post-process per key).
- **Salted broadcast-replicated join**: when the build side is small but the
  probe side's join key is skewed AND the join must shuffle (build side too
  big to broadcast whole), replicate each build row N_SALT times with a salt
  column and give each probe row a random salt — each hot key now spreads
  over N_SALT reducers. (When the build side fits in memory, plain
  broadcast — used everywhere else in this repo — is strictly better; this
  exists for the 100 TB case where neither side broadcasts.)

Results are IDENTICAL to the unsalted forms, so both operators sit under the
driver's DuckDB value gate with plain-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables

N_SALT = 16


def salted_sum_count(df: DataFrame, key: str, value: str,
                     n_salt: int = N_SALT) -> DataFrame:
    """Two-phase SUM/COUNT over a hot key: phase 1 aggregates (key, salt)
    partitions in parallel; phase 2 combines n_salt partials per key.
    Deterministic salt (hash of a stable row attribute mod n_salt) keeps the
    operator reproducible; pmod(hash(...)) spreads uniformly."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_psum"), F.count(F.lit(1)).alias("_pcnt"))
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("total"), F.sum("_pcnt").alias("cnt"))


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salt: int = N_SALT) -> DataFrame:
    """Inner equi-join with the build side replicated n_salt times and the
    probe side salted, so a hot probe key spreads across n_salt reducers.
    Output = plain ``probe JOIN build USING (key)``."""
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    build_rep = build.withColumn("_salt", F.explode(salts))
    probe_salted = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)))
    return probe_salted.join(build_rep, [key, "_salt"]).drop("_salt")


@query(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2) AS total,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 hot keys over the full lineitem: the salted two-phase aggregate must
    equal the plain GROUP BY (and parallelizes over n_salt×3 tasks instead
    of 3)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    out = salted_sum_count(t["lineitem"], "l_returnflag", "l_quantity")
    return out.select(
        "l_returnflag", F.round("total", 2).alias("total"), "cnt"
    ).orderBy("l_returnflag")


@query(
    "skew_salted_join",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT l_returnflag AS flag,
             CASE l_returnflag WHEN 'R' THEN 'returned' WHEN 'A' THEN 'ack'
                  ELSE 'none' END AS label
      FROM lineitem
    )
    SELECT d.label AS label,
           COUNT(*) AS cnt,
           ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
    GROUP BY d.label
    ORDER BY label
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed probe side (3 hot flags) joined to a tiny dim through the
    salted-replication join; aggregate of the join output must equal the
    plain-join SQL."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    dim = (
        li.select(F.col("l_returnflag").alias("flag")).distinct()
        .withColumn(
            "label",
            F.when(F.col("flag") == "R", "returned")
            .when(F.col("flag") == "A", "ack").otherwise("none"))
        .withColumnRenamed("flag", "l_returnflag")
    )
    joined = salted_join(li.select("l_returnflag", "l_extendedprice"), dim,
                         "l_returnflag")
    return (
        joined.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .orderBy("label")
    )
