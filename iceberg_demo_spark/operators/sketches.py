"""Mergeable sketch operators — the sub-linear estimation tier.

The exact audits in dedup.py (cross-source matrix, pair joins) are the
ground truth; at 100 TB a pipeline owner first wants the SAME answers
approximately, from state that is tiny, mergeable and one-pass. This
module adds that tier, starting with the KMV (k-minimum-values) distinct
sketch of Bar-Yossef et al. 2002 / Beyer et al. 2007 ("Distinct-value
synopses for multiset operations"): keep the k smallest hash values of a
set; the k-th smallest value U_(k) estimates the distinct count as
(k-1)/U_(k), and two sketches MERGE by taking the k smallest of their
union — giving union size, Jaccard and intersection estimates for every
source pair from S·k numbers instead of a digest self-join.

Engine-portability discipline (the repo standard): the hash is an md5 hex
prefix truncated to 52 bits, so every value is BOTH exactly representable
and int64-product-safe — (k-1)·2^52 < 2^63 — and the whole estimator is
exact integer arithmetic DuckDB replays bit-for-bit. No floats anywhere.

Scale shape: one pass over distinct (source, value); the per-source
bottom-k is a rank-≤-k window that Spark 4 executes with a map-side
partial WindowGroupLimit (each task forwards at most k rows per source
before the exchange — plan-pinned in tests/test_plans.py), so the shuffle
carries O(tasks·S·k) rows, never the corpus. Everything after the sketch
frame (≤ S·k rows) is driver-trivial and the pairwise stage is S²-bounded,
independent of corpus size. The EXACT columns in the gate below are the
audit half (the recall-audit family pattern): they ride the same digest
self-join as dedup_cross_source_matrix and exist to price the sketch's
error honestly; the production path at 100 TB returns the estimate
columns only.
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

#: sketch size — the standard accuracy knob (relative error ~ 1/sqrt(k))
_KMV_K = 128

#: hash domain: 52 bits = 13 md5 hex chars. Chosen so (k-1)·M and every
#: downstream product stays inside int64 AND every value is exactly
#: representable as a double should a consumer want ratios.
_KMV_M = 1 << 52

#: overflow guard for products with bps factors (ADVICE r9 #2): a union
#: estimate is capped at 10^14 inside any ·10^4 product — unreachable by
#: real corpora (100 TB ≈ 3·10¹² windows), keeps products < 2^63
_KMV_EST_CAP = 10 ** 14


def kmv_value(col: Column) -> Column:
    """52-bit uniform hash value from an md5 hex digest column —
    engine-portable (DuckDB: ``('0x' || substr(h, 1, 13))::UBIGINT``)."""
    return F.conv(F.substring(col, 1, 13), 16, 10).cast("bigint")


def kmv_sketch(df: DataFrame, group_col: str, value_col: str,
               k: int = _KMV_K) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct 52-bit values.

    One exchange on the group key; the rank-≤-k filter is executed as a
    map-side partial WindowGroupLimit (each task emits ≤ k rows per
    group), so the exchange input is bounded by tasks·k per group
    regardless of group size."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    return (df.select(group_col, value_col).distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn"))


def kmv_estimate(n_sk: Column, vk: Column, k: int = _KMV_K) -> Column:
    """Distinct-count estimate from sketch cardinality + k-th smallest
    value: exact when the sketch is unsaturated (it then holds the whole
    set), else the unbiased ⌊(k-1)·M / U_(k)⌋ in EXACT floor arithmetic.

    The floor needs care: the dividend N = (k-1)·M ≈ 5.7·10¹⁷ exceeds
    2⁵³, so a double quotient is off by up to one double ulp — ~64
    UNITS at this magnitude, far past what a ±1 snap fixes. Exact
    two-stage correction, all overflow-safe in int64: (1) rough double
    quotient j0 (N is an exact double — 127·2⁵² has a 7-bit mantissa;
    error ≤ ~65); (2) the int64 residual N − j0·c refines j0 by its own
    small double quotient (error now ≤ 2, since the residual is ≤ 65·c
    and quantization error ≤ 32 absolute); (3) the second exact residual
    is within a few c, so a CASE ladder over [−4c, 4c) lands the exact
    floor. Unit-swept against Python ``//`` in test_sketches.py,
    including quotient-on-integer divisors."""
    n_lit = (k - 1) * _KMV_M
    n = F.lit(n_lit)
    c = F.greatest(vk, F.lit(1))
    j0 = (F.lit(float(n_lit)) / c).cast("bigint")
    r0 = n - j0 * c
    j1 = j0 + (r0.cast("double") / c).cast("bigint")
    r1 = n - j1 * c
    corr = (F.when(r1 >= 3 * c, 3)
             .when(r1 >= 2 * c, 2)
             .when(r1 >= c, 1)
             .when(r1 >= 0, 0)
             .when(r1 >= -c, -1)
             .when(r1 >= -2 * c, -2)
             .when(r1 >= -3 * c, -3)
             .otherwise(-4))
    return F.when(n_sk < k, n_sk).otherwise(j1 + corr).cast("bigint")


@query(
    "dedup_kmv_overlap_matrix",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT source, md5(substr(text, s::INT, 64)) AS wh
      FROM documents,
           UNNEST(range(1, greatest(n_chars - 63, 1) + 1, 32)) AS t(s)
    ), sv AS (
      SELECT DISTINCT source,
             CAST(('0x' || substr(wh, 1, 13))::UBIGINT AS BIGINT) AS v
      FROM w
    ), sk AS (
      SELECT source, v,
             row_number() OVER (PARTITION BY source ORDER BY v) AS rn
      FROM sv QUALIFY rn <= {_KMV_K}
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM (SELECT DISTINCT source FROM sv) a
      JOIN (SELECT DISTINCT source FROM sv) b ON a.source < b.source
    ), tagged AS (
      SELECT p.source_a, p.source_b, s.v,
             MAX(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s ON s.source IN (p.source_a, p.source_b)
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT *, row_number()
                OVER (PARTITION BY source_a, source_b ORDER BY v) AS rn
      FROM tagged
    ), uagg AS (
      SELECT source_a, source_b,
             CAST(COUNT(*) AS BIGINT) AS n_union_all,
             CAST(SUM(CASE WHEN rn <= {_KMV_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS ku,
             CAST(SUM(CASE WHEN rn <= {_KMV_K} THEN in_a * in_b ELSE 0 END)
                  AS BIGINT) AS shared_in_sketch,
             MAX(CASE WHEN rn <= {_KMV_K} THEN v END) AS vku
      FROM ranked GROUP BY 1, 2
    ), est AS (
      SELECT source_a, source_b, ku, shared_in_sketch,
             CAST(CASE WHEN n_union_all < {_KMV_K} THEN n_union_all
                  ELSE ({_KMV_K - 1} * {_KMV_M}) // greatest(vku, 1)
                  END AS BIGINT) AS est_union,
             CAST((10000 * shared_in_sketch) // greatest(ku, 1)
                  AS BIGINT) AS est_jaccard_bps
      FROM uagg
    ), exact AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS exact_shared
      FROM sv a JOIN sv b ON a.v = b.v AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT e.source_a, e.source_b, e.ku AS k_used, e.est_union,
           e.shared_in_sketch, e.est_jaccard_bps,
           CAST((e.est_jaccard_bps * least(e.est_union, 100000000000000))
                // 10000 AS BIGINT) AS est_shared,
           CAST(COALESCE(x.exact_shared, 0) AS BIGINT) AS exact_shared,
           CAST((10000 * abs((e.est_jaccard_bps
                              * least(e.est_union, 100000000000000)) // 10000
                             - COALESCE(x.exact_shared, 0)))
                // greatest(COALESCE(x.exact_shared, 0), 1)
                AS BIGINT) AS err_bps
    FROM est e LEFT JOIN exact x USING (source_a, source_b)
    ORDER BY e.source_a, e.source_b
    """,
)
def dedup_kmv_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap matrix from MERGED KMV sketches — the
    sub-linear estimation tier next to the exact
    ``dedup_cross_source_matrix`` (dedup.py:1344): per source, the k=128
    smallest 52-bit window-hash values; per source pair, the merged
    sketch (k smallest of the union) yields the union-size estimate
    (k-1)·M/U_(k), the Jaccard estimate |both-flagged ∩ merged-k|/k and
    their product as the shared-window estimate. The ``exact_shared`` and
    ``err_bps`` columns are the audit half — the recall-audit family
    pattern (dedup_minhash_recall, sim_ann_recall): they recompute the
    truth through the digest self-join so the sketch's error is a
    measured number, not a claim.

    Scale shape: ONE corpus pass to the distinct (source, v) frame; the
    per-source bottom-k is a rank window whose rank-≤-k filter Spark
    executes as a map-side partial WindowGroupLimit (≤ k rows per source
    leave each task — plan-pinned), so the sketch build shuffles
    O(tasks·k) rows per source. Everything pairwise runs on the S·k-row
    sketch frame — S²·k work regardless of corpus size, the whole point
    of the sketch tier. At 100 TB the production form drops the exact
    columns (their self-join is the cost the sketch avoids) and ships
    sketches between clusters as S·k ints — they merge associatively.

    Exactness: md5-prefix values, integer floor division everywhere —
    DuckDB replays the estimator bit-for-bit (oracle above); unsaturated
    sketches (sources with < k distinct windows, the sf0.001 regime)
    degrade to exact counts by construction."""
    from iceberg_demo_spark.operators.dedup import _ingest_windows

    t = load_tables(spark, sf_dir, ("documents",))
    sv = (_ingest_windows(t["documents"])
          .select("source", "wh").distinct()
          .select("source", kmv_value(F.col("wh")).alias("v"))
          .distinct()
          .transform(_pin))
    sk = kmv_sketch(sv, "source", "v").transform(_pin)

    # pairwise stage: everything below runs on the ≤ S·k-row sketch frame
    srcs = sk.select("source").distinct()
    pairs = (srcs.select(F.col("source").alias("source_a"))
             .join(srcs.select(F.col("source").alias("source_b")),
                   F.col("source_a") < F.col("source_b")))
    tag_a = (pairs.join(sk.withColumnRenamed("source", "source_a"),
                        "source_a")
             .select("source_a", "source_b", "v",
                     F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    tag_b = (pairs.join(sk.withColumnRenamed("source", "source_b"),
                        "source_b")
             .select("source_a", "source_b", "v",
                     F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    tagged = (tag_a.unionByName(tag_b)
              .groupBy("source_a", "source_b", "v")
              .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    wnd = Window.partitionBy("source_a", "source_b").orderBy("v")
    ranked = tagged.withColumn("rn", F.row_number().over(wnd))
    in_k = F.col("rn") <= _KMV_K
    uagg = ranked.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_union_all"),
        F.sum(in_k.cast("bigint")).alias("ku"),
        F.sum(F.when(in_k, F.col("in_a") * F.col("in_b")).otherwise(0))
         .cast("bigint").alias("shared_in_sketch"),
        F.max(F.when(in_k, F.col("v"))).alias("vku"))
    est = uagg.select(
        "source_a", "source_b",
        F.col("ku").alias("k_used"),
        F.when(F.col("n_union_all") < _KMV_K, F.col("n_union_all"))
         .otherwise(F.expr(f"({_KMV_K - 1} * {_KMV_M}) div greatest(vku, 1)"))
         .cast("bigint").alias("est_union"),
        "shared_in_sketch",
        F.expr("(10000 * shared_in_sketch) div greatest(ku, 1)")
         .alias("est_jaccard_bps"))
    # ADVICE r9 #2: est_jaccard_bps·est_union can theoretically reach
    # 10^4·(k−1)·M ≈ 5.7·10²¹ (> int64) when vku is tiny; Spark
    # (non-ANSI) would wrap silently while DuckDB errors — an asymmetric
    # failure. Cap the union estimate inside the product at 10^14
    # distinct windows (a 100 TB corpus at the 32-byte stride is ~3·10¹²
    # windows, so the cap is unreachable by real data and the product
    # stays ≤ 10^18 < 2^63). The est_union OUTPUT stays uncapped.
    est = est.withColumn(
        "est_shared",
        F.expr(f"(est_jaccard_bps * least(est_union, {_KMV_EST_CAP}))"
               " div 10000"))

    # audit half: the exact digest self-join the sketch tier replaces
    exact = (sv.select(F.col("source").alias("source_a"), "v")
             .join(sv.select(F.col("source").alias("source_b"), "v"), "v")
             .filter(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).alias("exact_shared")))
    return (est.join(exact, ["source_a", "source_b"], "left")
            .select("source_a", "source_b", "k_used", "est_union",
                    "shared_in_sketch", "est_jaccard_bps", "est_shared",
                    F.coalesce("exact_shared", F.lit(0)).cast("bigint")
                     .alias("exact_shared"),
                    F.expr("(10000 * abs(est_shared"
                           " - coalesce(exact_shared, 0)))"
                           " div greatest(coalesce(exact_shared, 0), 1)")
                     .alias("err_bps"))
            .orderBy("source_a", "source_b"))


@query(
    "sketch_kmv_incremental",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT source, md5(substr(text, s::INT, 64)) AS wh
      FROM documents,
           UNNEST(range(1, greatest(n_chars - 63, 1) + 1, 32)) AS t(s)
    ), sv AS (
      SELECT DISTINCT source,
             CAST(('0x' || substr(wh, 1, 13))::UBIGINT AS BIGINT) AS v
      FROM w
    ), sk AS (
      SELECT source, v,
             row_number() OVER (PARTITION BY source ORDER BY v) AS rn
      FROM sv QUALIFY rn <= {_KMV_K}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sk,
           MAX(v) AS vk,
           CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                ELSE ({_KMV_K - 1} * {_KMV_M}) // greatest(MAX(v), 1)
                END AS BIGINT) AS est_distinct
    FROM sk GROUP BY source ORDER BY source
    """,
)
def sketch_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MAINTENANCE: the corpus arrives as three ingest
    epochs (doc_id mod 3 — the streaming_dedup_ingest batching scheme),
    each epoch is sketched INDEPENDENTLY, and the per-source standing
    sketch is the re-sketch of the three epochs' union — never a
    recompute over history. The output (sketch size, k-th value,
    distinct estimate per source) is oracled against the DIRECT
    full-corpus sketch: the merge law (k smallest of unioned bottom-k's
    = k smallest of the union, test_sketches.py) makes incremental
    maintenance LOSSLESS, and this gate makes that a driver-verified
    number rather than a unit-test claim.

    Scale shape: per epoch, one pass + a map-side-group-limited
    bottom-k (O(tasks·k) shuffle); the merge runs on 3·S·k rows. At
    100 TB this is the sketch tier's ingest story — history is never
    re-read, per-cluster sketches combine associatively (epoch ∪ epoch
    here; datacenter ∪ datacenter the same way)."""
    from iceberg_demo_spark.operators.dedup import _ingest_windows

    t = load_tables(spark, sf_dir, ("documents",))
    epochs = []
    for i in range(3):
        sv = (_ingest_windows(t["documents"]
                              .filter(F.col("doc_id") % 3 == i))
              .select("source", "wh").distinct()
              .select("source", kmv_value(F.col("wh")).alias("v"))
              .distinct())
        epochs.append(kmv_sketch(sv, "source", "v"))
    merged = epochs[0]
    for e in epochs[1:]:
        merged = merged.unionByName(e)
    # re-sketch of the union of epoch sketches == direct corpus sketch
    # (kmv_sketch distincts its input itself — no pre-distinct shuffle)
    std = kmv_sketch(merged, "source", "v")
    return (std.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_sk"),
                 F.max("v").alias("vk"),
                 kmv_estimate(F.count(F.lit(1)), F.max("v"))
                  .alias("est_distinct"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Bloom-filter membership (the second classic sketch, beside KMV)
# ---------------------------------------------------------------------------

#: filter geometry (VERDICT r9 #3 — sized FROM DATA, not hard-coded):
#: the corpus cardinality n comes from the KMV estimate (one bottom-k
#: pass, exact integer arithmetic both engines replay); the filter gets
#: _BLOOM_BITS_PER_KEY bits per estimated key rounded up to whole
#: 63-bit words (shifts stay ≤ 62 — DuckDB refuses 1<<63 on BIGINT and
#: Spark's would go negative; positive words are bit-identical across
#: engines), and k* = (m/n)·ln2 rounded in integer ppm arithmetic. A
#: fixed 64k-bit filter saturates (fp → 1) once the corpus outgrows it
#: and silently stops guarding the index probe; sizing from the KMV
#: estimate keeps fp pinned near the design point at every scale.
_BLOOM_BITS_PER_KEY = 8
_BLOOM_MIN_WORDS = 16      #: floor so tiny corpora still get a filter
_BLOOM_MAX_K = 16          #: probe-count ceiling (floor-regime corpora)
_BLOOM_LN2_PPM = 693147    #: ⌊ln2 · 10⁶⌋ — integer k rounding, engine-exact


def bloom_geometry(n: int) -> tuple[int, int, int]:
    """(words, m_bits, k) for an n-key corpus — EXACT integer arithmetic
    so DuckDB replays the sizing bit-for-bit from its own KMV estimate:

    * words = max(floor, ceil(bits_per_key·n / 63)), m = 63·words
    * k = clamp(round(m·ln2/n), 1, max) with round(x) = ⌊x + ½⌋ computed
      as (2·m·ln2_ppm + n·10⁶) // (2·n·10⁶).
    """
    n1 = max(n, 1)
    words = max(_BLOOM_MIN_WORDS, (_BLOOM_BITS_PER_KEY * n1 + 62) // 63)
    m = 63 * words
    k = min(_BLOOM_MAX_K,
            max(1, (2 * m * _BLOOM_LN2_PPM + n1 * 10 ** 6)
                // (2 * n1 * 10 ** 6)))
    return words, m, k


def bloom_positions(df: DataFrame, key: str, m_bits: int, k: int,
                    carry: tuple[str, ...] = ()) -> DataFrame:
    """One row per (carry…, pos): the k INDEPENDENT bit positions of
    each digest — pos_i = md5(key‖'#'‖i) mod m on the md5's first 52
    bits. THE single definition of the filter's hash family, shared by
    the sketch gate, the curation index tier, the streaming guard and
    the gate seeds (VERDICT r10 #6) — a geometry change lands
    everywhere or nowhere. Deliberately NOT Kirsch–Mitzenmacher double
    hashing: measured 1.5–2.2× over the analytic fp bound at small m/k;
    k independent md5s restore the textbook curve exactly."""
    keep = list(dict.fromkeys(carry))
    cols = list(dict.fromkeys([*keep, key]))
    pos = (F.conv(F.substring(F.md5(F.concat(
               F.col(key), F.lit("#"), F.col("i").cast("string"))),
               1, 13), 16, 10).cast("bigint") % m_bits).alias("pos")
    return (df.select(*cols, F.explode(F.sequence(
                F.lit(0), F.lit(k - 1))).alias("i"))
            .select(*keep, pos))


def bloom_words(df: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """(word, wv) sign-safe 63-bit filter words for a digest frame —
    the build/fold side (callers pass an already-distinct digest frame;
    duplicates would only waste hashing, never change bits). bit_or is
    order-independent, so an incremental fold reaches the same bits as
    a fresh build (the replay-repair invariant streaming/pipeline.py
    relies on)."""
    return (bloom_positions(df.select(key), key, m_bits, k)
            .groupBy(F.expr("pos div 63").alias("word"))
            .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                        "CAST(pos % 63 AS INT)))").alias("wv")))


def bloom_member(df: DataFrame, key: str, words: DataFrame,
                 m_bits: int, k: int,
                 carry: tuple[str, ...] = ()) -> DataFrame:
    """(carry…, key, member) — probe each digest against a broadcast
    words frame; member = 1 iff every one of the k bits is set (no
    false negatives by construction)."""
    keep = list(dict.fromkeys([*carry, key]))
    return (bloom_positions(df, key, m_bits, k, carry=tuple(keep))
            .join(F.broadcast(words),
                  F.col("word") == F.expr("pos div 63"), "left")
            .groupBy(*keep)
            .agg(F.min(F.expr("(coalesce(wv, 0) >> "
                              "CAST(pos % 63 AS INT)) & 1"))
                 .alias("member")))


def bloom_fp_bound_bps(n: int, m: int, k: int) -> int:
    """The analytic false-positive bound (1 − e^{−kn/m})^k in basis
    points, ⌊·+½⌋-rounded. Both engines evaluate exp/pow through the
    platform libm on identical doubles (the Spark side embeds THIS
    number as a literal — the JVM's Math.exp, which may differ from
    libm by an ulp, never touches it)."""
    import math

    n1 = max(n, 1)
    return int(math.floor(
        10000 * (1 - math.exp(-(k * n1) / m)) ** k + 0.5))


def kmv_count_estimate(df: DataFrame, col: str = "wh") -> int:
    """Driver-side KMV distinct-count estimate of a digest column — the
    bounded planning read that sizes a Bloom filter before its build
    plan exists. Exact integer arithmetic, bit-identical to the
    _BLOOM_SIZE_SQL replay."""
    sk = (df.select(kmv_value(F.col(col)).alias("v")).distinct()
          .orderBy("v").limit(_KMV_K)
          .agg(F.count(F.lit(1)).alias("cnt"), F.max("v").alias("vk"))
          .first())
    n = (sk["cnt"] if sk["cnt"] < _KMV_K
         else ((_KMV_K - 1) * _KMV_M) // max(sk["vk"], 1))
    return max(int(n), 1)


def bloom_size_sql(src: str, suffix: str = "") -> str:
    """The KMV-sizing CTE chain over an arbitrary source view, with
    optionally suffixed CTE names — so one oracle can size TWO filters
    (the resize gate compares a saturated geometry against a fresh
    one). ``bloom_size_sql('corpus')`` is byte-compatible with the
    legacy _BLOOM_SIZE_SQL."""
    s = suffix
    return f"""
    nest{s} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt, MAX(v) AS maxv
      FROM (SELECT DISTINCT CAST(('0x' || substr(wh, 1, 13))::UBIGINT
                                 AS BIGINT) AS v
            FROM {src} ORDER BY v LIMIT {_KMV_K})
    ),
    nn{s} AS (
      SELECT GREATEST(CASE WHEN cnt < {_KMV_K} THEN cnt
                  ELSE ({_KMV_K - 1} * {_KMV_M}) // GREATEST(maxv, 1)
                  END, 1) AS n
      FROM nest{s}
    ),
    size{s} AS (
      SELECT n,
             63 * GREATEST({_BLOOM_MIN_WORDS},
                 ({_BLOOM_BITS_PER_KEY} * n + 62) // 63) AS m,
             LEAST({_BLOOM_MAX_K}, GREATEST(1,
                 (2 * (63 * GREATEST({_BLOOM_MIN_WORDS},
                       ({_BLOOM_BITS_PER_KEY} * n + 62) // 63))
                    * {_BLOOM_LN2_PPM} + n * 1000000)
                 // (2 * n * 1000000))) AS k
      FROM nn{s}
    )"""


#: the sizing subquery, shared verbatim by the oracle: ONE
#: definition via bloom_size_sql (the resize gate sizes twice
#: through the same generator)
_BLOOM_SIZE_SQL = bloom_size_sql("corpus")


@query(
    "sketch_bloom_membership",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT doc_id, source, md5(substr(text, s::INT, 64)) AS wh
      FROM documents,
           UNNEST(range(1, greatest(n_chars - 63, 1) + 1, 32)) AS t(s)
    ),
    corpus AS (SELECT DISTINCT wh FROM w WHERE doc_id % 5 <> 0),
    batch AS (SELECT DISTINCT source, wh FROM w WHERE doc_id % 5 = 0),
    {_BLOOM_SIZE_SQL},
    cpos AS (
      SELECT CAST(('0x' || substr(md5(wh || '#' || t.i::VARCHAR), 1, 13))
                  ::UBIGINT AS BIGINT) % s.m AS pos
      FROM corpus, size s, UNNEST(range(0, s.k)) AS t(i)
    ),
    filt AS (
      SELECT pos // 63 AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % 63)) AS wv
      FROM cpos GROUP BY pos // 63
    ),
    ppos AS (
      SELECT source, wh,
             CAST(('0x' || substr(md5(wh || '#' || t.i::VARCHAR), 1, 13))
                  ::UBIGINT AS BIGINT) % s.m AS pos
      FROM batch, size s, UNNEST(range(0, s.k)) AS t(i)
    ),
    tested AS (
      SELECT p.source, p.wh,
             MIN((COALESCE(f.wv, 0) >> (p.pos % 63)) & 1) AS member
      FROM ppos p LEFT JOIN filt f ON f.word = p.pos // 63
      GROUP BY p.source, p.wh
    ),
    truth AS (
      SELECT b.source, b.wh,
             CASE WHEN c.wh IS NULL THEN 0 ELSE 1 END AS is_true
      FROM batch b LEFT JOIN corpus c ON b.wh = c.wh
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(t.member) AS BIGINT) AS bloom_hits,
           CAST(SUM(x.is_true) AS BIGINT) AS true_hits,
           CAST(SUM(t.member) - SUM(x.is_true) AS BIGINT) AS false_pos,
           CAST((10000 * (SUM(t.member) - SUM(x.is_true)))
                // greatest(COUNT(*) - SUM(x.is_true), 1) AS BIGINT)
             AS fp_bps,
           (SELECT n FROM size) AS n_est,
           (SELECT m FROM size) AS m_bits,
           (SELECT k FROM size) AS k_hashes,
           (SELECT CAST(FLOOR(10000 * POW(1 - EXP(
                -(CAST(k * n AS DOUBLE) / m)), k) + 0.5) AS BIGINT)
            FROM size) AS fp_bound_bps
    FROM tested t JOIN truth x ON t.source = x.source AND t.wh = x.wh
    GROUP BY t.source ORDER BY t.source
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership — the second classic mergeable sketch
    beside KMV, now SIZED FROM DATA (VERDICT r9 #3): the standing corpus
    (doc_id % 5 ≠ 0, the incremental-dedup split) is first KMV-estimated
    (bottom-128, exact integer estimator), the filter geometry derives
    from that estimate (8 bits per estimated key rounded to 63-bit
    words; k = round(m/n·ln2) in integer ppm arithmetic — engine-exact,
    the oracle replays the sizing from its OWN estimate), and the corpus
    folds in via k INDEPENDENT hashes (pos_i = md5(wh‖'#'‖i) mod m —
    Kirsch–Mitzenmacher double hashing was measured 1.5–2.2× over the
    analytic bound at this m/k regime, its known small-m distortion;
    independent hashes restore the classic analysis, and an md5 per
    probe is noise next to scan I/O). The ingest batch probes it.
    Output per source: probe count, bloom hits, EXACT hits (the audit
    half: a digest semi-join recomputes truth), false positives, the
    measured fp rate in bps — AND the geometry columns (n_est, m_bits,
    k_hashes) with the analytic bound (1 − e^{−kn/m})^k in bps beside
    the measured number, so saturation is a visible diff instead of a
    silent decay. No false negatives by construction (pytest-pinned).
    Measured fp tracks the bound within the KMV error's exponential
    amplification (±1/√128 ≈ 9% in n → ~×/÷1.6 in fp at 8 bits/key):
    at sf0.1 measured 320 bps vs bound-at-n_est 216 bps vs
    bound-at-TRUE-n 325 bps — the filter is ideal; the residual is the
    estimator, priced by the audit (pytest pins measured ≤ 2.5× bound;
    SCALE.md records all three SFs).

    Exactness: every position is exact int64 arithmetic on md5 halves;
    the filter is sign-safe 63-bit words built with bit_or and tested
    with shift/mask — DuckDB replays the BITS, not just the counts. The
    one float (the analytic bound) is computed ONCE driver-side through
    libm and embedded as a literal, keeping JVM exp out of the value
    path. Scale shape: sizing is a bottom-k read (O(tasks·k) shuffle);
    the build is one digest pass + a ≤words-row bit_or aggregate; the
    filter broadcasts (8 bits/key — a 10⁹-key corpus is a 1 GB filter,
    still a broadcast, and fp stays ~2% instead of saturating); probes
    are map-side against the broadcast words; the exact-truth join
    exists only for the audit. At 100 TB the filter guards the expensive
    index probe: only bloom-positive windows (true dups + fp_bps of the
    rest) touch the bucketed hash index."""
    from iceberg_demo_spark.operators.dedup import _ingest_windows

    t = load_tables(spark, sf_dir, ("documents",))
    w = _ingest_windows(t["documents"]).transform(_pin)
    corpus = (w.filter(F.col("doc_id") % 5 != 0)
              .select("wh").distinct().transform(_pin))
    batch = (w.filter(F.col("doc_id") % 5 == 0)
             .select("source", "wh").distinct().transform(_pin))
    # sizing: KMV bottom-k over the corpus (a bounded planning read —
    # the filter geometry must exist before the build plan does)
    n_est = kmv_count_estimate(corpus, "wh")
    _, m_bits, k_h = bloom_geometry(n_est)
    bound = bloom_fp_bound_bps(n_est, m_bits, k_h)
    filt = bloom_words(corpus, "wh", m_bits, k_h)
    tested = bloom_member(batch, "wh", filt, m_bits, k_h,
                          carry=("source",))
    truth = (batch.join(corpus.withColumn("is_true", F.lit(1)), "wh", "left")
             .select("source", "wh",
                     F.coalesce("is_true", F.lit(0)).alias("is_true")))
    return (tested.join(truth, ["source", "wh"])
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_probes"),
                 F.sum("member").cast("bigint").alias("bloom_hits"),
                 F.sum("is_true").cast("bigint").alias("true_hits"))
            .select("source", "n_probes", "bloom_hits", "true_hits",
                    (F.col("bloom_hits") - F.col("true_hits"))
                     .cast("bigint").alias("false_pos"),
                    F.expr("(10000 * (bloom_hits - true_hits))"
                           " div greatest(n_probes - true_hits, 1)")
                     .cast("bigint").alias("fp_bps"),
                    F.lit(n_est).cast("bigint").alias("n_est"),
                    F.lit(m_bits).cast("bigint").alias("m_bits"),
                    F.lit(k_h).cast("bigint").alias("k_hashes"),
                    F.lit(bound).cast("bigint").alias("fp_bound_bps"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Bloom maintenance: saturation measured, geometry re-sized (round 11)
# ---------------------------------------------------------------------------

def _bloom_pos_sql(src: str, size: str) -> str:
    """Positions CTE body over a digest view at a sizing CTE — the SQL
    twin of bloom_positions (kept beside the Python definition so the
    two hash families cannot drift: same md5(wh‖'#'‖i) 52-bit prefix)."""
    return (f"SELECT wh, CAST(('0x' || substr(md5(wh || '#' || "
            f"t.i::VARCHAR), 1, 13))::UBIGINT AS BIGINT) % s.m AS pos "
            f"FROM {src}, {size} s, UNNEST(range(0, s.k)) AS t(i)")


def _bloom_probe_sql(tag: str) -> str:
    """filt/tested CTE pair for one geometry: build the word array from
    the corpus positions, probe the batch positions."""
    return f"""
    filt{tag} AS (
      SELECT pos // 63 AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % 63)) AS wv
      FROM ({_bloom_pos_sql('corpus', f'size{tag}')}) GROUP BY pos // 63
    ),
    tested{tag} AS (
      SELECT p.wh, MIN((COALESCE(f.wv, 0) >> (p.pos % 63)) & 1) AS member
      FROM ({_bloom_pos_sql('batch', f'size{tag}')}) p
      LEFT JOIN filt{tag} f ON f.word = p.pos // 63
      GROUP BY p.wh
    )"""


_BOUND_SQL = ("CAST(FLOOR(10000 * POW(1 - EXP(-(CAST({k} * {n} AS DOUBLE)"
              " / {m})), {k}) + 0.5) AS BIGINT)")


@query(
    "sketch_bloom_resize",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT doc_id, md5(substr(text, s::INT, 64)) AS wh
      FROM documents,
           UNNEST(range(1, greatest(n_chars - 63, 1) + 1, 32)) AS t(s)
    ),
    corpus AS (SELECT DISTINCT wh FROM w WHERE doc_id % 5 <> 0),
    seed AS (SELECT DISTINCT wh FROM w
             WHERE doc_id % 5 <> 0 AND doc_id % 3 = 0),
    batch AS (SELECT DISTINCT wh FROM w WHERE doc_id % 5 = 0),
    {bloom_size_sql('seed', '_old')},
    {bloom_size_sql('corpus', '_new')},
    {_bloom_probe_sql('_old').strip()},
    {_bloom_probe_sql('_new').strip()},
    truth AS (
      SELECT b.wh, CASE WHEN c.wh IS NULL THEN 0 ELSE 1 END AS is_true
      FROM batch b LEFT JOIN corpus c ON b.wh = c.wh
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(SUM(x.is_true) AS BIGINT) AS true_hits,
             CAST(SUM(o.member) AS BIGINT) AS hits_old,
             CAST(SUM(n.member) AS BIGINT) AS hits_new
      FROM truth x
      JOIN tested_old o ON x.wh = o.wh
      JOIN tested_new n ON x.wh = n.wh
    )
    SELECT (SELECT n FROM size_old) AS n_design,
           (SELECT m FROM size_old) AS m_old,
           (SELECT k FROM size_old) AS k_old,
           (SELECT n FROM size_new) AS n_full,
           (SELECT m FROM size_new) AS m_new,
           (SELECT k FROM size_new) AS k_new,
           a.n_probes, a.true_hits, a.hits_old,
           CAST((10000 * (a.hits_old - a.true_hits))
                // greatest(a.n_probes - a.true_hits, 1) AS BIGINT)
             AS fp_old_bps,
           a.hits_new,
           CAST((10000 * (a.hits_new - a.true_hits))
                // greatest(a.n_probes - a.true_hits, 1) AS BIGINT)
             AS fp_new_bps,
           (SELECT {_BOUND_SQL.format(k='s.k', n='s.n', m='s.m')}
            FROM size_old s) AS bound_design_bps,
           (SELECT {_BOUND_SQL.format(k='o.k', n='nn.n', m='o.m')}
            FROM size_old o, size_new nn) AS bound_saturated_bps,
           (SELECT {_BOUND_SQL.format(k='s.k', n='s.n', m='s.m')}
            FROM size_new s) AS bound_new_bps
    FROM agg a
    """,
)
def sketch_bloom_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter MAINTENANCE: saturation measured, then repaired by
    a re-size (round 11 — the 're-sized at maintenance windows' policy
    the guard tiers document, now an implemented, oracle-pinned
    operator). A filter sized for the corpus as it stood at SEED time
    (here: the doc_id % 3 = 0 third of the standing corpus — the KMV
    estimate a younger corpus would have produced) keeps absorbing
    digests as the corpus grows past its design point; the analytic
    bound at the TRUE folded cardinality (bound_saturated_bps) and the
    measured fp rate both climb ~an order of magnitude above the design
    point. Maintenance re-estimates cardinality from the CURRENT digest
    set (one KMV bottom-k pass over the index — the filter itself can't
    be resized in place, but the index it guards is the ground truth),
    rebuilds at the fresh geometry, and the measured fp returns to the
    design curve. Output: both geometries, measured fp under each, and
    all three analytic bounds — saturation and repair as NUMBERS, the
    audit a production maintenance loop alerts on.

    Exactness: geometry and fp rates are exact integer arithmetic (the
    sketch_bloom_membership discipline); the three bounds are computed
    once driver-side through libm and embedded as literals. Scale
    shape: the re-estimate is a bottom-k pass over digests; the rebuild
    is one pass + a words-sized bit_or — amortized over a maintenance
    window, never per batch."""
    from iceberg_demo_spark.operators.dedup import _ingest_windows

    t = load_tables(spark, sf_dir, ("documents",))
    w = _ingest_windows(t["documents"]).transform(_pin)
    corpus = (w.filter(F.col("doc_id") % 5 != 0)
              .select("wh").distinct().transform(_pin))
    seed = (w.filter((F.col("doc_id") % 5 != 0)
                     & (F.col("doc_id") % 3 == 0))
            .select("wh").distinct())
    batch = (w.filter(F.col("doc_id") % 5 == 0)
             .select("wh").distinct().transform(_pin))
    n_design = kmv_count_estimate(seed, "wh")
    _, m_old, k_old = bloom_geometry(n_design)
    n_full = kmv_count_estimate(corpus, "wh")
    _, m_new, k_new = bloom_geometry(n_full)
    # the saturated filter: seed geometry, FULL corpus folded in (the
    # bits are identical whether folded incrementally or built fresh —
    # bit_or is order-independent)
    tested_old = bloom_member(batch, "wh",
                              bloom_words(corpus, "wh", m_old, k_old),
                              m_old, k_old)
    tested_new = bloom_member(batch, "wh",
                              bloom_words(corpus, "wh", m_new, k_new),
                              m_new, k_new)
    truth = (batch.join(corpus.withColumn("is_true", F.lit(1)),
                        "wh", "left")
             .select("wh", F.coalesce("is_true", F.lit(0)).alias("is_true")))
    agg = (truth
           .join(tested_old.withColumnRenamed("member", "m_old"), "wh")
           .join(tested_new.withColumnRenamed("member", "m_new"), "wh")
           .agg(F.count(F.lit(1)).alias("n_probes"),
                F.sum("is_true").cast("bigint").alias("true_hits"),
                F.sum("m_old").cast("bigint").alias("hits_old"),
                F.sum("m_new").cast("bigint").alias("hits_new")))
    fp = ("(10000 * ({h} - true_hits))"
          " div greatest(n_probes - true_hits, 1)")
    return agg.select(
        F.lit(n_design).cast("bigint").alias("n_design"),
        F.lit(m_old).cast("bigint").alias("m_old"),
        F.lit(k_old).cast("bigint").alias("k_old"),
        F.lit(n_full).cast("bigint").alias("n_full"),
        F.lit(m_new).cast("bigint").alias("m_new"),
        F.lit(k_new).cast("bigint").alias("k_new"),
        "n_probes", "true_hits", "hits_old",
        F.expr(fp.format(h="hits_old")).cast("bigint").alias("fp_old_bps"),
        "hits_new",
        F.expr(fp.format(h="hits_new")).cast("bigint").alias("fp_new_bps"),
        F.lit(bloom_fp_bound_bps(n_design, m_old, k_old))
         .cast("bigint").alias("bound_design_bps"),
        F.lit(bloom_fp_bound_bps(n_full, m_old, k_old))
         .cast("bigint").alias("bound_saturated_bps"),
        F.lit(bloom_fp_bound_bps(n_full, m_new, k_new))
         .cast("bigint").alias("bound_new_bps"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash-sample quantiles (round 11 — the third sketch family)
# ---------------------------------------------------------------------------

#: sampling rate denominator: keep keys whose 52-bit hash falls in the
#: lowest 1/8 of the domain (a deterministic ~12.5% Bernoulli sample)
_QSAMPLE_RATE = 8


#: ONE oracle for both quantile gates (the lifecycle discipline every
#: sketch family follows: sketch_quantile_advance's chained state must
#: change no answer, so it shares sketch_quantile_sample's oracle
#: verbatim — like sim_ivfpq_index_compact ↔ sim_ivfpq_search)
_QSAMPLE_ORACLE = f"""
    WITH v AS (
      SELECT source, doc_id, n_chars,
             CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
                  AS BIGINT) AS hv
      FROM documents
    ),
    samp AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM v WHERE hv * {_QSAMPLE_RATE} < {_KMV_M}
    ),
    full_r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM v
    ),
    est AS (
      SELECT source,
             CAST(MAX(ns) AS BIGINT) AS n_sample,
             CAST(MAX(CASE WHEN rn = GREATEST(1, (ns * 50 + 99) // 100)
                      THEN n_chars END) AS BIGINT) AS p50_est,
             CAST(MAX(CASE WHEN rn = GREATEST(1, (ns * 90 + 99) // 100)
                      THEN n_chars END) AS BIGINT) AS p90_est,
             CAST(MAX(CASE WHEN rn = GREATEST(1, (ns * 99 + 99) // 100)
                      THEN n_chars END) AS BIGINT) AS p99_est
      FROM samp GROUP BY source
    ),
    ex AS (
      SELECT source,
             CAST(MAX(ns) AS BIGINT) AS n_total,
             CAST(MAX(CASE WHEN rn = GREATEST(1, (ns * 50 + 99) // 100)
                      THEN n_chars END) AS BIGINT) AS p50_exact,
             CAST(MAX(CASE WHEN rn = GREATEST(1, (ns * 90 + 99) // 100)
                      THEN n_chars END) AS BIGINT) AS p90_exact,
             CAST(MAX(CASE WHEN rn = GREATEST(1, (ns * 99 + 99) // 100)
                      THEN n_chars END) AS BIGINT) AS p99_exact
      FROM full_r GROUP BY source
    )
    SELECT e.source, x.n_total, e.n_sample,
           e.p50_est, x.p50_exact,
           e.p90_est, x.p90_exact,
           e.p99_est, x.p99_exact
    FROM est e JOIN ex x ON e.source = x.source
    ORDER BY e.source
    """


def _qsample_project(docs: DataFrame) -> DataFrame:
    """(source, doc_id, n_chars, hv) — the hash-sample domain frame."""
    return docs.select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"),
        kmv_value(F.md5(F.col("doc_id").cast("string"))).alias("hv"))


def _qsample_keep(v: DataFrame) -> DataFrame:
    """The deterministic keep predicate (hv·rate < 2^52, exact int64).
    Row-wise and seedless, so sample(A ∪ B) == sample(A) ∪ sample(B) —
    the mergeability proof the advancement lifecycle rides."""
    return v.filter(F.col("hv") * _QSAMPLE_RATE < F.lit(_KMV_M))


def _qsample_order_stats(df: DataFrame, prefix: str,
                         n_name: str) -> DataFrame:
    """p50/p90/p99 as exact ⌈q·n⌉ order statistics per source (ties
    broken by doc_id; engine-identical integer rank arithmetic)."""
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ws = Window.partitionBy("source")
    ranked = (df.withColumn("rn", F.row_number().over(w))
              .withColumn("ns", F.count(F.lit(1)).over(ws)))
    rank = "greatest(1, (ns * {p} + 99) div 100)"
    return ranked.groupBy("source").agg(
        F.max("ns").cast("bigint").alias(n_name),
        *[F.max(F.when(F.col("rn") == F.expr(rank.format(p=p)),
                       F.col("n_chars")))
          .cast("bigint").alias(f"p{p}_{prefix}")
          for p in (50, 90, 99)])


def _qsample_report(spark: SparkSession, samp: DataFrame,
                    full: DataFrame) -> DataFrame:
    """Sampled estimates beside the full-data audit — the shared output
    shape both quantile gates emit."""
    est = _qsample_order_stats(samp, "est", "n_sample")
    exact = _qsample_order_stats(full, "exact", "n_total")
    return (est.join(exact, "source")
            .select("source", "n_total", "n_sample",
                    "p50_est", "p50_exact",
                    "p90_est", "p90_exact",
                    "p99_est", "p99_exact")
            .orderBy("source"))


def quantile_sample_state_advance(state_dir: str,
                                  batch_docs: DataFrame) -> None:
    """Fold ONE ingest batch into the persisted hash-sample state: the
    batch's keep-predicate survivors append to the state parquet — no
    history re-read, no re-ranking, O(batch) per advance. Because the
    predicate is row-wise and deterministic, the advanced state equals
    the one-shot sample of the unioned corpus exactly (pytest-pinned),
    so quantile reads off the state are indistinguishable from a
    rebuild."""
    (_qsample_keep(_qsample_project(batch_docs)).drop("hv")
     .write.mode("append").parquet(state_dir))


@query("sketch_quantile_sample", oracle=_QSAMPLE_ORACLE)
def sketch_quantile_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a DETERMINISTIC hash sample — the third sketch
    family (KMV cardinality, Bloom membership, now quantiles): keep
    the rows whose 52-bit key hash falls in the lowest 1/{rate} of the
    domain (a fixed, seedless Bernoulli sample) and read p50/p90/p99
    as exact ⌈q·n⌉ order statistics of the sample, beside the same
    order statistics of the full data (the audit half). Determinism is
    the production property reservoir sampling lacks: the sample of a
    UNION is the union of the samples — every worker, batch and rerun
    selects the same keys, so sampled quantiles are mergeable across
    ingest epochs and reproducible in an incident review.

    Exactness: the hash, the keep predicate (hv·rate < 2^52, exact
    int64) and the ⌈·⌉ rank arithmetic are engine-identical; both
    engines pick literally the same sample rows and the same order
    statistics (ties broken by doc_id), so est AND audit columns
    value-match bit-for-bit — no floats anywhere.

    Scale shape: the keep predicate is a map-side filter (no shuffle
    added to the scan); the per-source rank window runs over the
    SAMPLE (1/{rate} of rows); the full-data window is the audit only —
    a production profile drops it and quantile cost becomes
    O(sample log sample) per source. At 100 TB with rate 1/1024 this
    is the only way per-source length/quality quantiles stay a
    dashboard query."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    v = _qsample_project(docs)
    return _qsample_report(spark, _qsample_keep(v), v)


@query("sketch_quantile_advance", oracle=_QSAMPLE_ORACLE)
def sketch_quantile_advance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sample STATE ADVANCEMENT (VERDICT r11 #7) — the third
    sketch family completes its lifecycle like KMV
    (`sketch_kmv_incremental`) and Bloom (`sketch_bloom_resize`): the
    corpus arrives as three ingest epochs (doc_id mod 3, the standing
    batching scheme), each epoch's keep-predicate survivors APPEND into
    the persisted per-source sample state — history is never re-read —
    and the standing quantiles are read straight off the advanced
    state. Because the keep predicate is row-wise, seedless and
    deterministic, union-of-samples == sample-of-union EXACTLY, so the
    gate shares `sketch_quantile_sample`'s oracle verbatim: advancement
    must change no answer, driver-verified. The full-data audit columns
    recompute from the unioned corpus as before.

    Scale shape: each advance is one map-side filter over the batch +
    an append of ~batch/{rate} rows; the quantile read ranks only the
    accumulated sample. At 100 TB/day this keeps per-source length
    quantiles fresh per ingest batch with no nightly re-rank — the
    reservoir-sampling alternative cannot merge across batches without
    a seed registry, the hash sample merges by construction."""
    import shutil as _shutil

    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    state = scratch_path(f"glacier_qsample_state_{_sf_tag(sf_dir)}")
    _shutil.rmtree(state, ignore_errors=True)
    for i in range(3):
        quantile_sample_state_advance(
            state, docs.filter(F.col("doc_id") % 3 == i))
    samp = spark.read.parquet(state)
    return _qsample_report(spark, samp, _qsample_project(docs))
