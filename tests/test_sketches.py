"""Mergeable sketch tier (operators/sketches.py): KMV distinct sketches —
exactness when unsaturated, estimator quality when saturated, and the
merge law that makes them a 100 TB primitive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_demo_spark.operators.sketches import (
    _KMV_K, _KMV_M, kmv_estimate, kmv_sketch, kmv_value)
from iceberg_demo_spark.registry import QUERIES
from tests.conftest import SF_MED


def _values(spark, n, group="g", seed=""):
    """n distinct md5-derived 52-bit values under one group label."""
    return (spark.range(n)
            .select(F.lit(group).alias("g"),
                    kmv_value(F.md5(F.concat(F.col("id").cast("string"),
                                             F.lit(seed)))).alias("v")))


def test_unsaturated_sketch_is_the_whole_set_and_estimate_exact(spark):
    df = _values(spark, _KMV_K - 10)
    sk = kmv_sketch(df, "g", "v")
    rows = sk.collect()
    assert len(rows) == _KMV_K - 10
    est = sk.groupBy("g").agg(
        kmv_estimate(F.count(F.lit(1)), F.max("v")).alias("e")).collect()
    assert est[0]["e"] == _KMV_K - 10


def test_saturated_estimate_within_3_sigma(spark):
    # relative error of (k-1)/U_(k) is ~1/sqrt(k-2) ≈ 8.9% at k=128
    n = 5000
    sk = kmv_sketch(_values(spark, n), "g", "v")
    assert sk.count() == _KMV_K
    est = sk.groupBy("g").agg(
        kmv_estimate(F.count(F.lit(1)), F.max("v")).alias("e")).collect()
    assert abs(est[0]["e"] - n) / n < 3 / (_KMV_K - 2) ** 0.5


def test_merge_equals_sketch_of_union(spark):
    """k smallest of (sketch_a ∪ sketch_b) == sketch of (A ∪ B) — the
    associative merge law that lets per-cluster sketches combine."""
    a = _values(spark, 700, seed="a")
    b = _values(spark, 900, seed="b")
    merged = kmv_sketch(
        kmv_sketch(a, "g", "v").unionByName(kmv_sketch(b, "g", "v")),
        "g", "v")
    direct = kmv_sketch(a.unionByName(b), "g", "v")
    assert (sorted(r["v"] for r in merged.collect())
            == sorted(r["v"] for r in direct.collect()))


def test_values_are_52_bit(spark):
    mx = _values(spark, 2000).agg(F.max("v"), F.min("v")).collect()[0]
    assert 0 <= mx[1] and mx[0] < _KMV_M


def test_overlap_matrix_audit_columns_are_consistent(spark):
    out = QUERIES["dedup_kmv_overlap_matrix"](spark, SF_MED).collect()
    assert len(out) == 190  # C(20, 2) source pairs
    for r in out:
        assert r["k_used"] <= _KMV_K
        assert r["shared_in_sketch"] <= r["k_used"]
        assert 0 <= r["est_jaccard_bps"] <= 10000
        # est_shared is the product contract
        assert r["est_shared"] == (r["est_jaccard_bps"] * r["est_union"]) // 10000
        got = (10000 * abs(r["est_shared"] - r["exact_shared"])
               ) // max(r["exact_shared"], 1)
        assert r["err_bps"] == got


def test_kmv_estimate_floor_is_exact_across_divisors(spark):
    """The correction-snapped floor equals Python's exact // for
    divisors spanning the whole magnitude range, including
    quotient-near-integer cases double division alone can miss."""
    n_lit = (_KMV_K - 1) * _KMV_M
    # divisors that make the quotient land exactly on / next to integers
    divs = ([3, 7, 127, 1000003] +
            [n_lit // q for q in (5, 127, 128, 1000, 999983)] +
            [(n_lit // q) + d for q in (17, 129) for d in (-1, 0, 1)])
    df = spark.createDataFrame([(int(v),) for v in divs], "vk: bigint")
    got = df.select(
        "vk",
        kmv_estimate(F.lit(_KMV_K), F.col("vk")).alias("e")).collect()
    for r in got:
        assert r["e"] == n_lit // r["vk"], (r["vk"], r["e"])


def test_incremental_epochs_equal_direct_sketch(spark):
    """Re-sketching the union of three epoch sketches returns the exact
    per-source rows of the direct full-corpus sketch."""
    from iceberg_demo_spark.registry import QUERIES
    from iceberg_demo_spark.operators.dedup import _ingest_windows
    from tests.conftest import SF_SMALL
    inc = QUERIES["sketch_kmv_incremental"](spark, SF_SMALL).collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sv = (_ingest_windows(docs).select("source", "wh").distinct()
          .select("source", kmv_value(F.col("wh")).alias("v")).distinct())
    direct = (kmv_sketch(sv, "source", "v").groupBy("source")
              .agg(F.count(F.lit(1)).alias("n_sk"), F.max("v").alias("vk"),
                   kmv_estimate(F.count(F.lit(1)), F.max("v"))
                   .alias("est_distinct"))
              .orderBy("source").collect())
    assert [tuple(r) for r in inc] == [tuple(r) for r in direct]


def test_bloom_has_no_false_negatives_and_tracks_bound(spark):
    """Every true member must be bloom-positive (zero false negatives —
    the Bloom contract); the measured fp rate stays within 2.5× the
    emitted analytic bound (the KMV sizing error's exponential
    amplification is ~×/÷1.6 at 8 bits/key — VERDICT r9 #3); and the
    bound evaluated at the TRUE cardinality brackets the measurement
    tightly (the filter itself is ideal; the residual is the
    estimator)."""
    import math

    from tests.conftest import SF_MED
    from iceberg_demo_spark.operators.sketches import bloom_fp_bound_bps
    from iceberg_demo_spark.registry import QUERIES
    from iceberg_demo_spark.operators.dedup import _ingest_windows

    rows = QUERIES["sketch_bloom_membership"](spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r["bloom_hits"] >= r["true_hits"], r  # no false negatives
        assert r["false_pos"] == r["bloom_hits"] - r["true_hits"]
    bound = rows[0]["fp_bound_bps"]
    total_fp = sum(r["false_pos"] for r in rows)
    total_neg = sum(r["n_probes"] - r["true_hits"] for r in rows)
    measured_bps = 10000 * total_fp / max(total_neg, 1)
    assert measured_bps <= 2.5 * bound + 10  # +10 bps noise floor
    # the bound at TRUE n explains the measurement within noise
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    n_true = (_ingest_windows(docs.filter("doc_id % 5 <> 0"))
              .select("wh").distinct().count())
    true_bound = bloom_fp_bound_bps(
        n_true, rows[0]["m_bits"], rows[0]["k_hashes"])
    sigma_bps = 10000 * math.sqrt(
        (true_bound / 10000) / max(total_neg, 1))
    assert abs(measured_bps - true_bound) <= 4 * sigma_bps + 10


def test_bloom_geometry_scales_with_corpus():
    """VERDICT r9 #3: a 10× corpus gets a ~10× filter (the fixed-64k
    saturation hazard is gone), k stays at the design point, and the
    sizing is exact-integer monotone."""
    from iceberg_demo_spark.operators.sketches import (
        _BLOOM_BITS_PER_KEY, bloom_geometry)

    for n in (1_000, 30_000, 2_000_000):
        w1, m1, k1 = bloom_geometry(n)
        w10, m10, k10 = bloom_geometry(10 * n)
        assert 9.9 <= m10 / m1 <= 10.1
        assert k1 == k10
        assert m1 >= _BLOOM_BITS_PER_KEY * n
        assert m1 - 63 < _BLOOM_BITS_PER_KEY * n + 63
    # floor regime: tiny corpora still get a filter, k is capped
    w, m, k = bloom_geometry(1)
    assert w == 16 and 1 <= k <= 16


def test_bloom_resize_repairs_saturation(spark):
    """The maintenance gate's numbers must show the failure AND the
    repair: the under-sized filter's measured fp tracks its saturated
    analytic bound (and sits far above the design point), the re-sized
    filter returns to the design curve, no false negatives ever, and
    the fresh geometry is strictly larger."""
    from iceberg_demo_spark import registry
    from tests.conftest import SF_SMALL

    registry.load_all()
    r = registry.QUERIES["sketch_bloom_resize"](
        spark, SF_SMALL).collect()[0]
    assert r["m_new"] > r["m_old"] and r["n_full"] > r["n_design"]
    # no false negatives: every true member bloom-hits in BOTH filters
    assert r["hits_old"] >= r["true_hits"]
    assert r["hits_new"] >= r["true_hits"]
    # saturation visible: measured fp at least 10x the design bound,
    # and within the usual audit envelope of the saturated bound
    assert r["fp_old_bps"] >= 10 * r["bound_design_bps"]
    assert r["fp_old_bps"] <= 2.5 * r["bound_saturated_bps"]
    # repair lands back on the design curve
    assert r["fp_new_bps"] <= 2.5 * r["bound_new_bps"]
    assert r["fp_new_bps"] < r["fp_old_bps"] / 4


def test_quantile_sample_deterministic_mergeable_and_sane(spark):
    """The hash sample is seedless and row-local, so the sample of a
    union IS the union of the samples (the mergeability reservoir
    sampling lacks); estimates are monotone across the quantile ladder
    and the sample size sits inside loose binomial bounds of n/8."""
    from iceberg_demo_spark import registry
    from iceberg_demo_spark.operators.sketches import (
        _KMV_M, _QSAMPLE_RATE, kmv_value)
    from iceberg_demo_spark.sources import load_tables
    from tests.conftest import SF_SMALL

    registry.load_all()
    rows = registry.QUERIES["sketch_quantile_sample"](
        spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["p50_est"] <= r["p90_est"] <= r["p99_est"]
        assert r["p50_exact"] <= r["p90_exact"] <= r["p99_exact"]
        if r["n_total"] >= 100:
            assert r["n_total"] // 20 <= r["n_sample"] <= r["n_total"] // 2
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    keep = (kmv_value(F.md5(F.col("doc_id").cast("string")))
            * _QSAMPLE_RATE < F.lit(_KMV_M))
    whole = set(r["doc_id"] for r in
                docs.filter(keep).select("doc_id").collect())
    by_epoch = set()
    for e in range(3):
        by_epoch |= {r["doc_id"] for r in
                     docs.filter(F.col("doc_id") % 3 == e).filter(keep)
                     .select("doc_id").collect()}
    assert by_epoch == whole
