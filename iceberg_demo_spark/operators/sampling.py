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
from iceberg_demo_spark.cache import (
    pin as _pin,
    pin_checkpoint as _pin_ckpt,
    pin_checkpoint_lazy as _pin_ckpt_lazy,
)
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


# ---------------------------------------------------------------------------
# Priority sampling (weighted, without replacement) — Duffield, Lund &
# Thorup, "Priority sampling for estimation of arbitrary subset sums"
# (JACM 2007, public): each item draws u ~ U(0,1] and gets priority
# q = w/u; the k highest-priority items are kept, and with
# τ = (k+1)-th priority, ŵ_i = max(w_i, τ) for kept items is (near-)
# unbiased for Σw over ANY subset — the canonical fixed-size weighted
# sample for "give me k docs per source, long docs proportionally more
# likely, and keep totals estimable".
# ---------------------------------------------------------------------------

#: per-source sample size (small enough that sf0.01's 25-doc sources
#: exercise the estimation regime, not just the exhaustive branch)
_PRIORITY_K = 16

#: u is a 32-bit md5 draw: h ∈ [1, 2^32], u = h/2^32. The integer
#: priority ⌊w·2^32/h⌋ is int64-exact for w < 2^30 (documents are
#: n_chars ≤ ~10⁶ by generation; a longer corpus would drop to a
#: 24-bit draw, same construction).
_PRIORITY_SCALE = 1 << 32


def priority_rank(df: DataFrame, key: str, weight: str,
                  group: str) -> DataFrame:
    """Rows + integer priority ``q = ⌊w·2^32/h⌋`` (h the md5 draw) and
    per-group priority rank ``rn`` (1 = highest; deterministic: priority
    ties break on the key). The rank filter a caller applies (rn ≤ k)
    executes as a map-side partial WindowGroupLimit, so the sampling
    shuffle carries O(tasks·k) rows per group — the corpus itself never
    reaches the exchange."""
    h = (F.conv(F.substring(
            F.md5(F.concat(F.col(key).cast("string"), F.lit(":ps"))),
            1, 8), 16, 10).cast("bigint") + 1)
    df = df.withColumn("_h", h).withColumn(
        "q", F.expr(f"({weight} * {_PRIORITY_SCALE}) div _h")).drop("_h")
    w = Window.partitionBy(group).orderBy(F.col("q").desc(), F.col(key))
    return df.withColumn("rn", F.row_number().over(w))


@query(
    "doc_priority_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             (n_chars * {_PRIORITY_SCALE}) //
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ps'),
                                   1, 8))::UBIGINT AS BIGINT) + 1) AS q
      FROM documents
    ), ranked AS (
      SELECT *, row_number()
                OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rn
      FROM pri QUALIFY rn <= {_PRIORITY_K + 1}
    ), tau AS (
      SELECT source,
             COALESCE(MAX(CASE WHEN rn = {_PRIORITY_K + 1} THEN q END),
                      0) AS tau
      FROM ranked GROUP BY source
    ), sel AS (
      SELECT r.source,
             CAST(COUNT(*) AS BIGINT) AS k_used,
             CAST(SUM(greatest(r.n_chars, t.tau)) AS BIGINT)
               AS est_total_chars,
             CAST(SUM(r.doc_id) AS BIGINT) AS sel_docid_sum
      FROM ranked r JOIN tau t USING (source)
      WHERE r.rn <= {_PRIORITY_K}
      GROUP BY r.source
    ), exact AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS exact_total_chars
      FROM documents GROUP BY source
    )
    SELECT e.source, e.n_docs, s.k_used, s.est_total_chars,
           e.exact_total_chars,
           CAST((10000 * abs(s.est_total_chars - e.exact_total_chars))
                // greatest(e.exact_total_chars, 1) AS BIGINT) AS err_bps,
           s.sel_docid_sum
    FROM exact e JOIN sel s USING (source)
    ORDER BY e.source
    """,
)
def doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling per source — priority sampling with
    w = n_chars (longer documents proportionally likelier, the natural
    weight when the budget is tokens): keep the k=16 highest-priority
    docs per source, and estimate each source's TOTAL character mass
    from the sample alone via the max(w, τ) estimator. The
    exact_total_chars / err_bps columns are the audit half (the
    recall-audit family): the truth is a cheap map-side partial
    aggregate here, and the estimator's error becomes a measured number.
    sel_docid_sum pins the SELECTED SET itself, not just the estimate —
    reruns and other engines must pick identical documents.

    Exactness: the u-draw is a 32-bit md5 prefix, the priority is exact
    int64 floor arithmetic (⌊w·2^32/h⌋, w < 2^30), ties break on doc_id
    — DuckDB replays selection and estimator bit-for-bit. The floor
    quantizes the published continuous priority; the selection it
    induces is a valid priority sample for the quantized u-grid (bias
    bounded by one part in 2^32/w per comparison).

    Scale shape: the rank-≤-k+1 filter executes as a map-side partial
    WindowGroupLimit (plan-pinned) — each task forwards at most k+1 rows
    per source, so the sampling exchange is O(tasks·k) per source no
    matter the corpus; the exact audit rides an ordinary partial
    aggregate (S rows per task). At 100 TB the sample IS the product —
    k·S rows out of the pipeline, totals still estimable per subset."""
    t = load_tables(spark, sf_dir, ("documents",))
    k = _PRIORITY_K
    ranked = (priority_rank(t["documents"], key="doc_id",
                            weight="n_chars", group="source")
              .filter(F.col("rn") <= k + 1)
              .select("doc_id", "source", "n_chars", "q", "rn")
              .transform(_pin))
    tau = (ranked.groupBy("source")
           .agg(F.coalesce(
                F.max(F.when(F.col("rn") == k + 1, F.col("q"))),
                F.lit(0)).alias("tau")))
    sel = (ranked.filter(F.col("rn") <= k)
           .join(F.broadcast(tau), "source")
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("k_used"),
                F.sum(F.greatest(F.col("n_chars"), F.col("tau")))
                 .cast("bigint").alias("est_total_chars"),
                F.sum("doc_id").cast("bigint").alias("sel_docid_sum")))
    exact = (t["documents"].groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").cast("bigint")
                   .alias("exact_total_chars")))
    return (exact.join(sel, "source")
            .select("source", "n_docs", "k_used", "est_total_chars",
                    "exact_total_chars",
                    F.expr("(10000 * abs(est_total_chars"
                           " - exact_total_chars))"
                           " div greatest(exact_total_chars, 1)")
                     .alias("err_bps"),
                    "sel_docid_sum")
            .orderBy("source"))
