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
