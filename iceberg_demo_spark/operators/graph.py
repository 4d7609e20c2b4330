"""Graph operators over the document-similarity graph (round 7).

The fleet's iterative-algorithm family: dedup_clusters (dedup.py) does
min-label propagation to a fixpoint; this module adds fixed-iteration
PageRank — the canonical "loop of shuffles" workload — with ALL-INTEGER
arithmetic so each unrolled iteration is value-exact against the DuckDB
oracle (no float accumulation-order hazard).

Scale design: one shuffle per iteration (contributions grouped by dst);
the rank and degree frames are node-sized, the edge frame is persisted
once and re-joined per iteration — exactly how a 100-iteration run would
be structured (checkpoint every ~10 iterations to cut the lineage, as
dedup.py::connected_components already demonstrates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables

#: fixed-point rank scale — integer "1.0"; floor divisions below make
#: every iteration bit-exact across engines
_S = 1_000_000_000


@query(
    "graph_doc_pagerank",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT doc_id, md5(substr(text, s::INT, 64)) AS wh
      FROM documents,
           UNNEST(range(1, greatest(n_chars - 63, 1) + 1, 32)) AS t(s)
    ),
    e AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM w a JOIN w b ON a.wh = b.wh AND a.doc_id <> b.doc_id
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM e GROUP BY src),
    r0 AS (SELECT src AS node, CAST({_S} AS BIGINT) AS rank FROM deg),
    c1 AS (SELECT e.dst AS node,
                  CAST(SUM(r0.rank // d.outdeg) AS BIGINT) AS s
           FROM e JOIN r0 ON e.src = r0.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r1 AS (SELECT node,
                  CAST({15 * _S // 100} + (85 * s) // 100 AS BIGINT)
                    AS rank
           FROM c1),
    c2 AS (SELECT e.dst AS node,
                  CAST(SUM(r1.rank // d.outdeg) AS BIGINT) AS s
           FROM e JOIN r1 ON e.src = r1.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r2 AS (SELECT node,
                  CAST({15 * _S // 100} + (85 * s) // 100 AS BIGINT)
                    AS rank
           FROM c2)
    SELECT node AS doc_id, rank
    FROM r2 ORDER BY rank DESC, doc_id LIMIT 20
    """,
)
def graph_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled PageRank iterations over the shared-window document
    graph (edges = doc pairs sharing a 64-char dedup window, both
    directions), damping 0.85, fixed-point integer arithmetic at scale
    10^9 — the hub documents whose content radiates through the corpus,
    i.e. the ones whose removal de-duplicates the most. Top 20 by
    (rank DESC, doc_id).

    Integer discipline: start rank = S; each iteration is
    r(b) = 0.15·S + floor(0.85 · Σ floor(r(a)/outdeg(a)))
    with every division a floor on bigints, so Spark and DuckDB agree
    bit-exactly — no float accumulation-order hazard, unlike a naive
    double-based PageRank.

    Scale shape: the edge list is built once from the distinct
    (doc_id, wh) frame (digest-keyed self-join, per-key fan-out bounded
    by window repetition) and persisted; each iteration is ONE shuffle —
    contributions grouped by dst — with the node-sized rank frame
    re-joined to the edge frame on src. A production 50-iteration run
    keeps this exact loop, checkpointing every ~10 iterations to cut
    lineage (the connected-components pattern, dedup.py:599). Isolated
    documents never enter the edge frame and are excluded, matching the
    oracle."""
    t = load_tables(spark, sf_dir, ("documents",))
    from iceberg_demo_spark.operators.dedup import _ingest_windows

    w = (_ingest_windows(t["documents"])
         .select("doc_id", "wh").distinct())
    x, y = w.alias("x"), w.alias("y")
    e = (x.join(y, "wh")
         .filter(F.col("x.doc_id") != F.col("y.doc_id"))
         .select(F.col("x.doc_id").alias("src"),
                 F.col("y.doc_id").alias("dst"))
         .distinct()
         .persist())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    rank = deg.select(F.col("src").alias("node"),
                      F.lit(_S).cast("bigint").alias("rank"))
    for _ in range(2):
        contrib = (e.join(rank, e.src == rank.node)
                   .join(deg, "src")
                   .select("dst", F.expr("rank div outdeg").alias("share")))
        rank = (contrib.groupBy(F.col("dst").alias("node"))
                .agg(F.sum("share").cast("bigint").alias("s"))
                .select("node",
                        (F.lit(15 * _S // 100)
                         + F.expr("(85 * s) div 100"))
                        .cast("bigint").alias("rank")))
    return (rank.select(F.col("node").alias("doc_id"), "rank")
            .orderBy(F.desc("rank"), "doc_id").limit(20))
