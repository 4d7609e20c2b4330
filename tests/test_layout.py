"""Round-4 layout operators: bucketed co-located join, partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_demo_spark import registry
from tests.conftest import SF_SMALL

registry.load_all()


def test_bucketed_join_matches_plain_join(spark):
    got = {r["o_orderpriority"]: r for r in
           registry.QUERIES["bucketed_colocated_join"](spark, SF_SMALL)
           .collect()}
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    exp = {r["o_orderpriority"]: r for r in
           o.join(li, o.o_orderkey == li.l_orderkey)
           .groupBy("o_orderpriority")
           .agg(F.countDistinct("o_orderkey").alias("n_orders"),
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("revenue"))
           .collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert (got[k]["n_orders"], got[k]["n_lines"]) == (
            exp[k]["n_orders"], exp[k]["n_lines"])
        assert abs(got[k]["revenue"] - exp[k]["revenue"]) < 0.02


def test_bucketed_write_produces_bucket_files(spark, tmp_path):
    from iceberg_demo_spark.operators.layout import write_bucketed

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_bucketed(df, "k", "glacier_bk_probe", str(tmp_path / "bk"),
                   n_buckets=4)
    files = [f for f in (tmp_path / "bk").rglob("*.parquet")]
    # bucket id is encoded in the file name: part-*_00000.c000 etc.
    buckets = {f.name.split("_")[-1].split(".")[0] for f in files}
    assert len(buckets) == 4
    got = dict(spark.table("glacier_bk_probe")
               .select("k", "v").rdd.map(tuple).collect())
    assert got == {i: i * 2 for i in range(100)}


def test_partition_pruned_scan_matches_filter(spark):
    got = {r["l_linestatus"]: r for r in
           registry.QUERIES["partition_pruned_scan"](spark, SF_SMALL)
           .collect()}
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    exp = {r["l_linestatus"]: r for r in
           li.filter(F.col("l_returnflag") == "R")
           .groupBy("l_linestatus")
           .agg(F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k]["n_lines"] == exp[k]["n_lines"]
        assert abs(got[k]["total_qty"] - exp[k]["total_qty"]) < 0.02


def test_bucket_pruning_on_key_filter(spark, tmp_path):
    """A point filter on the bucket key must prune the scan to ONE bucket
    (SelectedBucketsCount 1 out of N) — the read-side payoff of bucketing."""
    import contextlib
    import io

    from iceberg_demo_spark.operators.layout import write_bucketed

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    write_bucketed(df, "k", "glacier_bk_prune", str(tmp_path / "bkp"),
                   n_buckets=8)
    # autoBucketedScan drops the bucketed layout when no join/agg exploits
    # it, which also forfeits filter-time bucket pruning — a pure-filter
    # read wants it kept
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        q = spark.table("glacier_bk_prune").filter(F.col("k") == 421)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        assert "SelectedBucketsCount: 1 out of 8" in buf.getvalue()
        assert [r["v"] for r in q.collect()] == [421 % 7]
    finally:
        spark.conf.set(key, old)


def test_zorder_key_is_a_real_morton_interleave(spark):
    """_zorder_key: per-column linear binning over [min, max] into 2^16
    buckets, bits interleaved most-significant-first with the FIRST sort
    column taking the higher bit of each pair — verified against a pure-
    Python Morton recompute on a known grid."""
    from iceberg_demo_spark.tables.procedures import _zorder_key

    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = [r["z"] for r in df.select(
        _zorder_key(df, ["a", "b"]).alias("z")).collect()]

    def morton(a, b):
        ba = a * 65535 // 3          # linear bin over min=0, max=3
        bb = b * 65535 // 3
        z = 0
        for i in range(16):
            z |= ((ba >> i) & 1) << (i * 2 + 1)   # first col: higher bit
            z |= ((bb >> i) & 1) << (i * 2)
        return z

    assert got == [morton(a, b) for a, b in rows]
    # locality sanity: the all-low corner sorts before the all-high one
    assert morton(0, 0) < morton(1, 1) < morton(3, 3)


def test_zorder_layout_skips_files_binpack_cannot(spark):
    """layout_zorder_skipping's load-bearing claim, pinned with exact
    counts at sf0.001: after compaction to ~8 files each, every 2-D
    predicate admits ALL binpack files (hash-fragmented input keeps
    full-range bounds through a coalesce) but only a strict subset of
    the z-ordered ones — and both layouts return identical answers."""
    from iceberg_demo_spark.operators.layout import (
        _Z_PREDS, _zorder_tables)

    t_bin, t_z = _zorder_tables(spark, SF_SMALL)
    files_b = t_bin._branch_files("main")
    files_z = t_z._branch_files("main")
    assert len(files_b) >= 4 and len(files_z) >= 4
    for _pid, pred in _Z_PREDS:
        cand_b = len(t_bin._prune_files(files_b, pred))
        cand_z = len(t_z._prune_files(files_z, pred))
        assert cand_b == len(files_b)      # binpack: no skip possible
        assert cand_z < cand_b             # zorder: real skips
        a = sorted(map(tuple, t_bin.scan(where=pred).collect()))
        b = sorted(map(tuple, t_z.scan(where=pred).collect()))
        assert a == b and a                # layout never changes answers
