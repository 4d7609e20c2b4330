"""Deterministic sampling operators (operators/sampling.py): reproducible
hash-gated stratified sampling and per-group caps for corpus curation."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_demo_spark.operators.sampling import (
    hash_bucket, per_group_cap, stratified_sample)
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_sampling_is_deterministic(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "source", {"src0": 0.5}).select("doc_id").collect()}
    b = {r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "source", {"src0": 0.5}).select("doc_id").collect()}
    assert a == b and a


def test_stratified_rates_honored(spark):
    docs = _docs(spark)
    out = stratified_sample(docs, "doc_id", "source",
                            {"src0": 0.25}, default_rate=1.0)
    tot = {r["source"]: r["n"] for r in
           docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # other strata survive whole; src0 lands near 25% (hash-uniform)
    for s, n in tot.items():
        if s == "src0":
            assert 0.1 * n <= got.get(s, 0) <= 0.4 * n
        else:
            assert got.get(s, 0) == n


def test_sample_membership_is_hash_gated(spark):
    """A row is in the sample iff its bucket clears the stratum rate — the
    sample is a pure function of the key, not of partitioning or order."""
    docs = _docs(spark).repartition(7)
    out = {r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "source", {"src0": 0.25},
        default_rate=0.0).select("doc_id").collect()}
    buckets = {r["doc_id"]: r["b"] for r in docs.filter(F.col("source") == "src0")
               .select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
               .collect()}
    assert out == {d for d, b in buckets.items() if b < 2500}


def test_per_group_cap_exact_and_stable(spark):
    docs = _docs(spark)
    capped = per_group_cap(docs, "doc_id", "source", 5)
    counts = {r["source"]: r["n"] for r in
              capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = {r["source"]: r["n"] for r in
           docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in counts.items():
        assert n == min(5, tot[s])
    again = {r["doc_id"] for r in per_group_cap(
        docs.repartition(13), "doc_id", "source", 5).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in capped.select("doc_id").collect()}


def test_priority_sample_exhaustive_when_group_smaller_than_k(spark):
    """n ≤ k ⇒ τ = 0, every doc selected, estimate EXACT by construction."""
    from iceberg_demo_spark.registry import QUERIES
    out = {r["source"]: r for r in
           QUERIES["doc_priority_sample"](spark, SF_SMALL).collect()}
    for s, r in out.items():
        if r["n_docs"] <= 16:
            assert r["k_used"] == r["n_docs"]
            assert r["est_total_chars"] == r["exact_total_chars"]
            assert r["err_bps"] == 0


def test_priority_sample_estimator_is_calibrated(spark):
    """Priority sampling is near-unbiased: averaged over the 20 sources
    (25 docs each, k=16 — the estimation regime), the relative error of
    est_total_chars collapses well below any single source's."""
    from iceberg_demo_spark.registry import QUERIES
    from tests.conftest import SF_MED
    rows = QUERIES["doc_priority_sample"](spark, SF_MED).collect()
    est, exact = (sum(r["est_total_chars"] for r in rows),
                  sum(r["exact_total_chars"] for r in rows))
    assert rows and all(r["k_used"] == 16 for r in rows)
    assert abs(est - exact) / exact < 0.15


def test_priority_rank_is_deterministic_and_weight_biased(spark):
    """Reruns rank identically; long docs are overrepresented in the
    kept set (that's what w = n_chars buys)."""
    from iceberg_demo_spark.operators.sampling import priority_rank
    docs = _docs(spark)
    a = {(r["doc_id"], r["rn"]) for r in
         priority_rank(docs, "doc_id", "n_chars", "source")
         .select("doc_id", "rn").collect()}
    b = {(r["doc_id"], r["rn"]) for r in
         priority_rank(docs, "doc_id", "n_chars", "source")
         .select("doc_id", "rn").collect()}
    assert a == b and a
    kept = (priority_rank(docs, "doc_id", "n_chars", "source")
            .filter(F.col("rn") <= 3))
    mean_kept = kept.agg(F.avg("n_chars")).collect()[0][0]
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert mean_kept > mean_all
