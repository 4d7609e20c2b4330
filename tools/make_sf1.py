"""Derive the sf1 scale-checkpoint dataset from the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1} only; VERDICT r7 #7 asks for one sf1
bench checkpoint so scale claims stop being pure extrapolation. This tool
writes a DETERMINISTIC 10x replication of /root/testdata/sf0.1 into the
scratch root (never into the read-only testdata tree):

- region/nation are fixed dimensions — copied as-is (like TPC-H itself);
- every entity key (custkey, suppkey, partkey, orderkey, event/user/doc/
  vec ids) is offset by copy*10^7, consistently across referencing
  tables, so referential integrity and join selectivity are preserved;
- document TEXT gets a 2-char per-copy prefix (copy 0 untouched): the
  fixed-offset 64/32 dedup windows of a prefixed copy share nothing with
  the original, so near-duplicate DENSITY stays that of the base corpus
  and dedup-family work scales ~linearly — naive replication would make
  every window 10x-shared and blow candidate pairs up 100x, a data
  artifact, not a plan property (n_chars is adjusted to match);
- embeddings are rotated by copy index (same norm, decorrelated), for
  the same reason in cosine space.

No oracle runs at sf1 — this is a BENCH artifact (bench.py already
re-derives everything it builds per sf_dir). Usage:

    python tools/make_sf1.py            # writes <scratch>/glacier_sf1
    SPARK_GRAFT_SF_DIR=<that dir> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_demo_spark.scratch import scratch_path
from iceberg_demo_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10
OFF = 10_000_000

#: per-table key columns that get the per-copy offset
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(spark, name: str, out_dir: str) -> None:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    parts = []
    for k in range(COPIES):
        c = df
        for col in KEY_COLS[name]:
            c = c.withColumn(col, (F.col(col) + F.lit(k * OFF))
                             .cast(dict(df.dtypes)[col]))
        if name == "documents" and k > 0:
            c = (c.withColumn("text", F.concat(F.lit(f"{k}#"), F.col("text")))
                 .withColumn("n_chars", F.col("n_chars") + F.lit(2)))
        if name == "embeddings" and k > 0:
            dim = len(df.select("embedding").first()["embedding"])
            r = k % dim
            c = c.withColumn(
                "embedding",
                F.expr(f"concat(slice(embedding, {r + 1}, {dim - r}), "
                       f"slice(embedding, 1, {r}))"))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def main() -> str:
    out_dir = scratch_path("glacier_sf1")
    spark = get_spark("make_sf1")
    for name in ("region", "nation"):
        (spark.read.parquet(f"{SRC}/{name}.parquet")
         .write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet"))
    for name in KEY_COLS:
        replicate(spark, name, out_dir)
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"# {name}: {n} rows", file=sys.stderr)
    print(out_dir)
    return out_dir


if __name__ == "__main__":
    main()
