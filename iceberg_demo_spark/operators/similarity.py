"""Similarity search over the `embeddings` table (vec_id, embedding
array<float>, label).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the full corpus, so the corpus side streams through one scan
with no shuffle of the vectors themselves; per-query top-k runs as a window
over the (n_queries × corpus) pair stream.

Scale path: random-hyperplane LSH bucketing — vectors hash to sign-pattern
buckets; candidate generation joins on bucket key, cutting the pair stream
from n² to ~n·bucket_size. At 100 TB the bucket join shuffles only
(id, bucket, vec) once.

Cross-engine determinism: cosine is computed as a sequential left fold over
the zipped double arrays — F.aggregate in Spark, list_reduce in DuckDB —
both left-to-right over identical doubles, so results are bit-identical
(0.0 + x == x in IEEE-754 makes the differing seeds equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_demo_spark.functions import cosine_sim
from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables

_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), "
    "(acc, x) -> acc + x)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT_SQL.format(a=a, b=b)
    na = _DOT_SQL.format(a=a, b=a)
    nb = _DOT_SQL.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (oracle-checked)
# ---------------------------------------------------------------------------

@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 8
    ), pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_cos_sql('q.qv', 'e.embedding::DOUBLE[]')} AS sim
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, rank, neighbor_id, ROUND(sim, 4) AS sim
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    pairs = emb.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_sim(F.col("qv"), F.col("vec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 4).alias("sim"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# All-pairs above a cosine threshold (oracle-checked)
# ---------------------------------------------------------------------------

@query(
    "sim_threshold_pairs",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 120
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_cos_sql('a.v', 'b.v')}, 4) AS sim,
           CAST(a.label = b.label AS INT) AS same_label
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE {_cos_sql('a.v', 'b.v')} > 0.30
    ORDER BY id_a, id_b
    """,
)
def sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    sub = t["embeddings"].filter(F.col("vec_id") < 120).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = sub.alias("a")
    b = sub.alias("b")
    sim = cosine_sim(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("sim_raw"),
            (F.col("a.label") == F.col("b.label")).cast("int").alias("same_label"),
        )
        .filter(F.col("sim_raw") > 0.30)
        .select("id_a", "id_b", F.round("sim_raw", 4).alias("sim"), "same_label")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (oracle-checked: planes are literal constants, and both
# engines fold the projection left-to-right over identical doubles)
# ---------------------------------------------------------------------------

_N_PLANES = 8


def _plane(seed: int, dim: int = 64) -> list[float]:
    """Deterministic pseudo-random hyperplane (no RNG state; pure function of
    seed+index so regenerable on any executor)."""
    vals = []
    x = (seed * 2654435761 + 1) & 0xFFFFFFFF
    for _ in range(dim):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        vals.append((x / 0x7FFFFFFF) * 2.0 - 1.0)
    return vals


_PLANES = [_plane(s) for s in range(_N_PLANES)]


def _bucket_sql(vec: str) -> str:
    """DuckDB spelling of the sign-bit bucket — plane values embedded as
    exact (repr round-trip) double literals."""
    terms = []
    for i, p in enumerate(_PLANES):
        lit = "[" + ", ".join(repr(v) for v in p) + "]"
        proj = _DOT_SQL.format(a=vec, b=lit)
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


@query(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
    ), b AS (
      SELECT vec_id, vec, {_bucket_sql('vec')} AS bucket FROM emb
    ), q AS (
      SELECT vec_id AS query_id, vec AS qv, bucket AS qbucket
      FROM b WHERE vec_id < 8
    ), cand AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_cos_sql('q.qv', 'e.vec')} AS sim
      FROM q JOIN b e ON e.bucket = q.qbucket AND e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, rank, neighbor_id, ROUND(sim, 4) AS sim
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH: bucket = sign bits of
    projections onto _N_PLANES fixed planes; candidates share a bucket.
    Oracle-checked end to end (the planes are shared literals); recall vs
    brute force additionally asserted in tests/test_similarity.py.
    """
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )

    def bucket_expr(vec_col):
        bits = []
        for i, p in enumerate(_PLANES):
            proj = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(v) for v in p]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    bucketed = emb.withColumn("bucket", bucket_expr(F.col("vec")))
    queries = bucketed.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = cosine_sim(F.col("qv"), F.col("vec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 4).alias("sim"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Label centroid similarity (vector aggregation without UDFs)
# ---------------------------------------------------------------------------

@query(
    "sim_label_centroid_norms",
    oracle="""
    WITH expanded AS (
      SELECT label, u.dim, u.val
      FROM embeddings,
           LATERAL (SELECT UNNEST(range(len(embedding))) AS dim,
                           UNNEST(embedding::DOUBLE[]) AS val) u
    ), centroid AS (
      SELECT label, dim,
             CAST(SUM(CAST(val AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS c
      FROM expanded GROUP BY label, dim
    )
    SELECT label,
           ROUND(SQRT(CAST(SUM(CAST(c * c AS DECIMAL(28,14))) AS DOUBLE)), 4) AS centroid_norm,
           COUNT(*) AS dim_count
    FROM centroid
    GROUP BY label
    ORDER BY label
    """,
)
def sim_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    expanded = t["embeddings"].select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val"),
    )
    centroid = expanded.groupBy("label", "dim").agg(
        (F.sum(F.col("val").cast("decimal(28,14)")).cast("double") / F.count("*")).alias("c")
    )
    return (
        centroid.groupBy("label")
        .agg(
            F.round(
                F.sqrt(
                    F.sum((F.col("c") * F.col("c")).cast("decimal(28,14)")).cast("double")
                ),
                4,
            ).alias("centroid_norm"),
            F.count("*").alias("dim_count"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (oracle-checked: centroid choice is pure SQL)
# ---------------------------------------------------------------------------

_IVF_CELLS = 16   # coarse centroids (√n-ish at test scale)
_IVF_NPROBE = 3   # cells probed per query

#: shared by sim_ann_ivf_topk (inline assignment) and sim_ann_ivf_bucketed
#: (persisted, partition-pruned inverted lists) — identical semantics, so
#: one oracle proves both
_IVF_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cent AS (
      SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < {_IVF_CELLS}
    ), assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.v', 'cent.cv')} DESC, cent.cell_id)
                 AS rn
        FROM e CROSS JOIN cent
      ) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), probe AS (
      SELECT query_id, cell_id FROM (
        SELECT q.query_id, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_cos_sql('q.qv', 'cent.cv')} DESC, cent.cell_id)
                 AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn <= {_IVF_NPROBE}
    ), cand AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_cos_sql('q.qv', 'e.v')} AS sim
      FROM probe
      JOIN assign ON assign.cell_id = probe.cell_id
      JOIN e ON e.vec_id = assign.vec_id
      JOIN q ON q.query_id = probe.query_id
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, rank, neighbor_id, ROUND(sim, 4) AS sim
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("sim_ann_ivf_topk", oracle=_IVF_ORACLE)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest of
    _IVF_CELLS coarse centroids (here: the first 16 corpus vectors — a
    deterministic stand-in for k-means so the oracle is pure SQL), probe the
    _IVF_NPROBE cells nearest each query, rank candidates exactly.

    Scale shape: all centroids travel as ONE broadcast row (array of
    structs) and each corpus vector folds over it inline, so building the
    inverted lists is a pure map — the corpus is NEVER shuffled or
    row-multiplied for assignment (the earlier broadcast-join + window
    argmax expanded every vector ×cells and shuffled that on vec_id); the
    candidate join then touches ~nprobe/cells of the data — this is the
    IVF recall/cost dial. The persisted form of this index is
    sim_ann_ivf_bucketed below: assignment written ONCE with cell_id as
    the partition key, every query pruned to its probed cells. The fold
    keeps a strictly-greater maximum over cell_id-sorted centroids —
    exactly the oracle's ORDER BY csim DESC, cell_id tie-break."""
    emb, cent = _ivf_emb_cent(spark, sf_dir)
    assign = _ivf_assign(emb, cent)
    probe = _ivf_probe(emb, cent)
    cand = (
        assign.join(F.broadcast(probe), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine_sim(F.col("qv"), F.col("v")).alias("sim"))
    )
    return _ivf_rank(cand)


_DOT_E = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D,"
          " (acc2, w2) -> acc2 + w2)")


def _ivf_emb_cent(spark: SparkSession, sf_dir: str):
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("cv")
    )
    return emb, cent


def _ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, v, cell_id): nearest-centroid assignment as a pure map.

    Centroid norms are hoisted into the broadcast row and the corpus
    vector's norm into its own column, so each (vector, centroid) pair
    costs exactly ONE fold; argmax = first index of the array max, which
    on cell_id-sorted centroids reproduces the oracle's
    ORDER BY csim DESC, cell_id tie-break (sqrt(na)*sqrt(nb) is the same
    op sequence as the oracle, so sims stay bit-identical)."""
    cents = cent.select(
        "cell_id", "cv",
        F.expr(f"sqrt({_DOT_E.format(a='cv', b='cv')})").alias("ncv"),
    ).agg(
        F.expr("array_sort(collect_list(struct(cell_id, cv, ncv)))")
        .alias("cents"))
    sims_e = (f"transform(cents, s -> {_DOT_E.format(a='v', b='s.cv')}"
              " / (nv * s.ncv))")
    return (
        emb.withColumn("nv", F.expr(f"sqrt({_DOT_E.format(a='v', b='v')})"))
        .crossJoin(F.broadcast(cents))
        .withColumn("sims", F.expr(sims_e))
        .select(
            "vec_id", "v",
            F.expr("element_at(cents, CAST(array_position(sims,"
                   " array_max(sims)) AS INT)).cell_id").alias("cell_id"),
        )
    )


def _ivf_probe(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(query_id, qv, cell_id): the _IVF_NPROBE nearest cells per query."""
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("cell_id"))
    return (
        queries.join(F.broadcast(cent))
        .select("query_id", "qv", "cell_id",
                cosine_sim(F.col("qv"), F.col("cv")).alias("csim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(f"rn <= {_IVF_NPROBE}")
        .select("query_id", "qv", "cell_id")
    )


def _ivf_rank(cand: DataFrame) -> DataFrame:
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id",
                F.round("sim", 4).alias("sim"))
        .orderBy("query_id", "rank")
    )


def ivf_index_path(sf_dir: str) -> str:
    """Deterministic per-SF location of the persisted inverted lists."""
    import os
    import re as _re
    import tempfile

    tag = _re.sub(r"\W", "_", sf_dir.strip("/").replace("/", "_"))
    from iceberg_demo_spark.scratch import scratch_path

    return scratch_path(f"glacier_ivf_{tag}")


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the IVF inverted lists ONCE per SF: the cell assignment is
    written `partitionBy(cell_id)`, so cell_id becomes a directory key
    and every later probe is a partition-pruned read. Rebuilt whenever
    the SOURCE manifest (embeddings.parquet mtime+size) mismatches
    (ADVICE r9 #3 applied tier-wide) — bench reps measure the pruned
    QUERY, not index construction, exactly as a served ANN system
    would."""
    import os

    from iceberg_demo_spark.scratch import (
        index_current, write_index_manifest)

    path = ivf_index_path(sf_dir)
    if not (index_current(path, sf_dir, ("embeddings",))
            and os.path.exists(os.path.join(path, "_SUCCESS"))):
        emb, cent = _ivf_emb_cent(spark, sf_dir)
        (_ivf_assign(emb, cent)
         .write.partitionBy("cell_id").mode("overwrite").parquet(path))
        write_index_manifest(path, sf_dir, ("embeddings",))
    return path


@query("sim_ann_ivf_bucketed", oracle=_IVF_ORACLE)
def sim_ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over PERSISTED cell-partitioned inverted lists (round 6 —
    turns sim_ann_ivf_topk's '100 TB: write the assignment bucketed'
    prose into code).

    Scale shape: the index write pays the assignment map + one directory
    fanout once; each query then (1) picks probe cells against the
    broadcast centroids, (2) collects the ≤ queries×nprobe distinct cell
    ids (probe PLANNING, bounded by the query batch — never corpus
    rows), (3) reads ONLY those cell directories — the scan's
    PartitionFilters prune the rest, so bytes read ∝ nprobe/cells of
    the corpus (plan-asserted in tests/test_plans.py) — and (4) joins
    candidates with the broadcast probe set: the corpus side needs NO
    exchange at any point. Identical semantics to sim_ann_ivf_topk, one
    shared oracle proves both."""
    emb, cent = _ivf_emb_cent(spark, sf_dir)
    path = ensure_ivf_index(spark, sf_dir)
    probe = _ivf_probe(emb, cent)
    cells = sorted(r["cell_id"]
                   for r in probe.select("cell_id").distinct().collect())
    inv = (spark.read.parquet(path)
           .filter(F.col("cell_id").isin(cells)))
    cand = (
        inv.join(F.broadcast(probe), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine_sim(F.col("qv"), F.col("v")).alias("sim"))
    )
    return _ivf_rank(cand)


# ---------------------------------------------------------------------------
# ANN evaluation: IVF top-k recall vs exact brute-force top-k
# ---------------------------------------------------------------------------

from iceberg_demo_spark.registry import oracle_cte_body as _as_cte_body  # noqa: E402


@query("sim_ann_recall", oracle=None)  # oracle composed below
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximation audit for the ANN family (round 7, twin of
    dedup_minhash_recall): recall@5 of the IVF inverted-list probe
    against the exact brute-force cosine top-5, composed from the two
    shipped operators verbatim. The one number that decides whether
    nprobe/cell sizing is adequate before pointing the IVF index at the
    full corpus. All-integer outputs (basis points) — no float boundary
    in the oracle comparison."""
    exact = sim_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = sim_ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    m = (approx.join(exact, ["query_id", "neighbor_id"])
         .agg(F.count(F.lit(1)).alias("n_match")))
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    na = approx.agg(F.count(F.lit(1)).alias("n_approx"))
    return (
        ne.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(m))
        .select("n_exact", "n_approx", "n_match",
                F.expr("(10000 * n_match) div n_exact").alias("recall_bp"))
    )


from iceberg_demo_spark.registry import ORACLES as _OR  # noqa: E402

_OR["sim_ann_recall"] = f"""
    WITH exact AS ({_as_cte_body(_OR["sim_cosine_topk"])}),
    approx AS ({_as_cte_body(_OR["sim_ann_ivf_topk"])}),
    m AS (SELECT COUNT(*) AS n_match
          FROM approx a JOIN exact e
            ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id),
    e2 AS (SELECT COUNT(*) AS n_exact FROM exact),
    a2 AS (SELECT COUNT(*) AS n_approx FROM approx)
    SELECT e2.n_exact, a2.n_approx, m.n_match,
           (10000 * m.n_match) // e2.n_exact AS recall_bp
    FROM e2, a2, m
""".strip()


# ---------------------------------------------------------------------------
# Streaming IVF index maintenance (exactly-once partitioned file sink)
# ---------------------------------------------------------------------------

def _stage_emb_src(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic 3-file staging of the embeddings table (split by
    vec_id % 3, mtimes staggered) — reused across invocations; the
    streamed-index RESULT is split-order-invariant anyway (the index is
    a union and assignment is a pure map), the stagger just keeps the
    micro-batch boundaries reproducible."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path

    out = scratch_path(f"glacier_stream_emb_{_sf_tag(sf_dir)}")
    if all(_os.path.exists(f"{out}/{i:03d}.parquet") for i in range(3)):
        return out
    stage = scratch_path(f"glacier_stream_emb_stage_{_sf_tag(sf_dir)}")
    _os.makedirs(out, exist_ok=True)
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].select(
        "vec_id", "embedding")
    now = _time.time()
    for i in range(3):
        (emb.filter(F.col("vec_id") % 3 == i)
         .coalesce(1).write.mode("overwrite").parquet(f"{stage}/f{i}"))
        part = _glob.glob(f"{stage}/f{i}/part-*.parquet")[0]
        dst = f"{out}/{i:03d}.parquet"
        _shutil.copy(part, dst)
        _os.utime(dst, (now - 300 + i * 50, now - 300 + i * 50))
    _shutil.rmtree(stage, ignore_errors=True)
    return out


@query("streaming_ann_ingest", oracle=None)  # shares the IVF oracle below
def streaming_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index maintenance: embeddings arrive in three
    micro-batches, each centroid-assigned in-stream (the same broadcast
    fold as sim_ann_ivf_topk — a pure map, no shuffle) and written by
    Structured Streaming's EXACTLY-ONCE partitioned parquet file sink
    (`partitionBy(cell_id)` + `_spark_metadata` transaction log). The
    final top-5 probe over the streamed index must equal the batch IVF
    answer exactly — shared oracle — proving continuous index growth
    changes nothing about query results.

    Scale shape: this is how a served ANN system ingests — new vectors
    stream into their cells (append-only, O(batch) per trigger, the
    standing index is never rewritten), queries keep partition-pruned
    reads of probed cells only. Centroids are trained offline and
    broadcast (re-clustering is a periodic batch job, not the stream's
    concern). The file sink's metadata log gives atomic per-batch
    visibility: a reader never sees a half-committed batch."""
    emb, cent = _ivf_emb_cent(spark, sf_dir)
    idx_dir = _stream_build_ann_index(spark, sf_dir)
    return _ivf_probe_dir(spark, idx_dir, emb, cent)


def _stream_build_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Stream-build the cell-partitioned IVF index (3 micro-batches →
    exactly-once partitionBy(cell_id) parquet file sink); fresh per call
    so the gates always exercise the full ingest path."""
    import shutil as _shutil

    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path

    _, cent = _ivf_emb_cent(spark, sf_dir)
    src = _stage_emb_src(spark, sf_dir)
    tag = _sf_tag(sf_dir)
    idx_dir = scratch_path(f"glacier_stream_ann_{tag}")
    ck = scratch_path(f"glacier_stream_ann_ck_{tag}")
    for d in (idx_dir, ck):
        _shutil.rmtree(d, ignore_errors=True)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .select("vec_id",
                      F.col("embedding").cast("array<double>").alias("v")))
    q = (_ivf_assign(stream, cent)
         .writeStream.format("parquet")
         .option("path", idx_dir)
         .partitionBy("cell_id")
         .option("checkpointLocation", ck)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return idx_dir


def _ivf_probe_dir(spark: SparkSession, idx_dir: str,
                   emb: DataFrame, cent: DataFrame) -> DataFrame:
    """The shared partition-pruned probe over any cell-partitioned index
    directory (streamed, compacted, or batch-built)."""
    probe = _ivf_probe(emb, cent)
    cells = sorted(r["cell_id"]
                   for r in probe.select("cell_id").distinct().collect())
    inv = (spark.read.parquet(idx_dir)
           .filter(F.col("cell_id").isin(cells)))
    cand = (
        inv.join(F.broadcast(probe), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine_sim(F.col("qv"), F.col("v")).alias("sim"))
    )
    return _ivf_rank(cand)


_OR["streaming_ann_ingest"] = _OR["sim_ann_ivf_topk"]


def compact_ann_index(spark: SparkSession, idx_dir: str,
                      compact_dir: str) -> str:
    """Bin-pack a streamed IVF index: one shuffle keyed on ``cell_id``
    re-clusters every cell's micro-batch fragments into a single file
    per cell directory (``repartition("cell_id")`` puts each cell in
    exactly one task; ``partitionBy`` then writes one file per cell), in
    a NEW directory the serving reader swaps to — the streaming sink's
    ``_spark_metadata`` log and checkpoint stay untouched, so ingest
    continues appending to the live tier while queries move to the
    compacted tier (the classic two-tier small-files answer).

    Scale shape: at production trigger rates the streamed tier grows one
    file per cell per micro-batch — the small-files death for
    open-cost-dominated probes. Compaction is one full-index shuffle,
    amortized over a maintenance window; at 100 TB it runs per-cell-range
    (a WHERE over cell_id, the rewrite_data_files(where=...) discipline)
    instead of whole-index."""
    import shutil as _shutil

    _shutil.rmtree(compact_dir, ignore_errors=True)
    (spark.read.parquet(idx_dir)
     .repartition("cell_id")
     .write.partitionBy("cell_id").mode("overwrite").parquet(compact_dir))
    return compact_dir


@query("sim_ann_index_compact", oracle=None)  # shares the IVF oracle below
def sim_ann_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance (round 8, VERDICT r7 #4): stream-build the
    cell-partitioned index (one parquet fragment per cell per
    micro-batch — the small-files hazard streaming_ann_ingest leaves
    behind), bin-pack it with compact_ann_index into one file per cell,
    and answer the standard top-5 probe from the COMPACTED tier. The
    result must equal the batch IVF answer exactly (shared oracle):
    compaction changes file layout, never answers. Files-per-cell
    before/after and partition pruning over the compacted tier are
    pytest-pinned (test_streaming / test_plans)."""
    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path

    emb, cent = _ivf_emb_cent(spark, sf_dir)
    idx_dir = _stream_build_ann_index(spark, sf_dir)
    compact_dir = compact_ann_index(
        spark, idx_dir,
        scratch_path(f"glacier_stream_ann_compact_{_sf_tag(sf_dir)}"))
    return _ivf_probe_dir(spark, compact_dir, emb, cent)


_OR["sim_ann_index_compact"] = _OR["sim_ann_ivf_topk"]


# ---------------------------------------------------------------------------
# Hard-negative mining: the mid-rank band behind the top-k positives
# ---------------------------------------------------------------------------

@query(
    "emb_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS q_label, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 8
    ), pairs AS (
      SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id, e.label,
             {_cos_sql('q.qv', 'e.embedding::DOUBLE[]')} AS sim
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, q_label, neighbor_id, label, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, rank, neighbor_id, ROUND(sim, 4) AS sim,
           CAST(label = q_label AS INT) AS same_label
    FROM ranked WHERE rank BETWEEN 6 AND 15
    ORDER BY query_id, rank
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the MID-RANK band (ranks 6–15) behind the top-5 positives — close
    enough to be informative gradients, far enough to (probably) be
    true negatives; `same_label` flags the probable false negatives a
    curation pass would drop before batching. Same anchors, cosine and
    deterministic tiebreak as sim_cosine_topk, so the two gates compose
    into a (positives, hard negatives) training-pair feed.

    Scale shape: anchors are training-batch-sized and travel as ONE
    broadcast (the corpus is never shuffled to meet them); similarities
    are a pure map over the corpus. The rank window keys on query_id —
    at production anchor counts the band select runs behind the IVF
    probe (sim_ann_ivf_*) so the window ranks candidate lists, not the
    corpus; this gate is the exact-reference form of that feed."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("vec").alias("qv"),
    )
    pairs = emb.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id", "q_label",
        F.col("vec_id").alias("neighbor_id"), "label",
        cosine_sim(F.col("qv"), F.col("vec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") >= 6) & (F.col("rank") <= 15))
        .select(
            "query_id", "rank", "neighbor_id",
            F.round("sim", 4).alias("sim"),
            (F.col("label") == F.col("q_label")).cast("int")
            .alias("same_label"),
        )
        .orderBy("query_id", "rank")
    )
