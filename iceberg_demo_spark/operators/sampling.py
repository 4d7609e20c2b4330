"""Deterministic sampling operators for training-data pipelines.

Large-corpus curation needs *reproducible* downsampling: re-running the
pipeline (or running it on another engine) must select the same rows, so
experiments are comparable and incremental runs don't churn the corpus.
Both operators therefore gate on an md5-derived hash bucket instead of
rand() — md5 of the stringified key is bit-identical across Spark, DuckDB
and any other engine, making the sample itself oracle-checkable.

- ``stratified_sample``: hash-gated Bernoulli sampling with a per-stratum
  rate (e.g. keep 50% of web text but 100% of books). Pure JVM column ops,
  embarrassingly parallel, zero shuffle before the final aggregate.
- ``per_group_cap``: cap each group's contribution to k rows (domain
  balancing — no single source may dominate the corpus), deterministic
  order by content-independent hash so the kept set is stable. One window
  (= one shuffle on the group key); at 100 TB this is the standard
  rank-and-filter shape, skew-safe because the order key is a uniform hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables

#: Hash-bucket resolution: rates are expressed in 1/10000ths.
_BUCKETS = 10_000


def hash_bucket(col: Column) -> Column:
    """Uniform bucket in [0, 10000) from md5 of the stringified key —
    engine-portable (DuckDB: ``('0x' || substr(md5(k::VARCHAR),1,8))::UBIGINT
    % 10000`` yields the identical value)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % _BUCKETS
    )


def stratified_sample(df: DataFrame, key: str, stratum: str,
                      rates: dict[str, float],
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate(stratum)·10000 — exact,
    deterministic, per-stratum Bernoulli sampling with zero shuffle."""
    thresh = F.lit(int(default_rate * _BUCKETS))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(stratum) == value,
                        F.lit(int(rate * _BUCKETS))).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key)) < thresh)


def per_group_cap(df: DataFrame, key: str, group: str, k: int) -> DataFrame:
    """At most ``k`` rows per group, chosen deterministically by hash order
    (ties broken by the key itself, which is unique)."""
    w = Window.partitionBy(group).orderBy(hash_bucket(F.col(key)), F.col(key))
    return (
        df.withColumn("_g_rank", F.row_number().over(w))
        .filter(F.col("_g_rank") <= k)
        .drop("_g_rank")
    )


# Portable DuckDB spelling of hash_bucket for the oracles below.
_BUCKET_SQL = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
               "::UBIGINT AS BIGINT) % 10000")


@query(
    "doc_stratified_sample",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE {_BUCKET_SQL} <
          CASE WHEN source IN ('src0','src1','src2','src3','src4')
               THEN 2500
               WHEN source IN ('src5','src6','src7','src8','src9')
               THEN 7500
               ELSE 10000 END
    GROUP BY source
    ORDER BY source
    """,
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified downsampling of the document corpus: 25%
    of low-quality sources, 75% of mid, 100% of the rest — the rate mix a
    curation pipeline uses to rebalance source quality."""
    t = load_tables(spark, sf_dir, ("documents",))
    low = {f"src{i}": 0.25 for i in range(5)}
    mid = {f"src{i}": 0.75 for i in range(5, 10)}
    sampled = stratified_sample(
        t["documents"], key="doc_id", stratum="source",
        rates={**low, **mid}, default_rate=1.0)
    return (
        sampled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             F.sum("n_chars").alias("sampled_chars"))
        .orderBy("source")
    )


@query(
    "doc_per_source_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        ::UBIGINT AS BIGINT) % 10000, doc_id) AS rk
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM ranked WHERE rk <= 10
    GROUP BY source
    ORDER BY source
    """,
)
def doc_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: each source contributes at most 10 documents,
    selected by deterministic hash order so reruns keep the same set."""
    t = load_tables(spark, sf_dir, ("documents",))
    capped = per_group_cap(t["documents"], key="doc_id", group="source", k=10)
    return (
        capped.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.sum("n_chars").alias("kept_chars"),
             F.min("doc_id").alias("min_doc"))
        .orderBy("source")
    )
