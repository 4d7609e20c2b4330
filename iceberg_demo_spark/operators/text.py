"""Text-analysis operators for training-data pipelines over `documents`.

Beyond-reference surface (BASELINE.json north star): language-ID heuristic,
quality scoring, token counting, document fingerprinting. All built-in
column functions — no Python UDFs — so the hot path stays in whole-stage
codegen and scales linearly with data at 100 TB (pure map-side work, one
shuffle only at the final per-group aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_demo_spark.functions import davg
from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables


def tokens_col(col: str = "text"):
    """Whitespace tokens (documents are single-space separated)."""
    return F.split(F.col(col), " ")


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

@query(
    "doc_token_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MAX(len(string_split(text, ' '))) AS max_tokens,
           MIN(len(string_split(text, ' '))) AS min_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    n_tok = F.size(tokens_col())
    return (
        t["documents"]
        .select("lang", "n_chars", n_tok.alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            davg(F.col("n_tok")).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_tok").alias("max_tokens"),
            F.min("n_tok").alias("min_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Quality scoring: stopword ratio + mean word length buckets
# ---------------------------------------------------------------------------

@query(
    "doc_quality_buckets",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tok,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop
      FROM documents
    )
    SELECT lang,
           CAST(FLOOR(10.0 * n_stop / n_tok) AS INT) AS stop_decile,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM scored
    GROUP BY lang, stop_decile
    ORDER BY lang, stop_decile
    """,
)
def doc_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    toks = tokens_col()
    stopwords = ("the", "a", "of", "and", "to")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    scored = t["documents"].select(
        "lang",
        F.size(toks).alias("n_tok"),
        n_stop.alias("n_stop"),
    )
    return (
        scored.groupBy(
            "lang",
            F.floor(10.0 * F.col("n_stop") / F.col("n_tok")).cast("int").alias("stop_decile"),
        )
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .orderBy("lang", "stop_decile")
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic: marker-word voting, compared against the labeled lang
# ---------------------------------------------------------------------------

_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}


@query(
    "doc_langid_confusion",
    oracle="""
    WITH pred AS (
      SELECT lang,
             CASE WHEN len(list_filter(string_split(text,' '), t -> t IN ('the','and','of'))) > 0 THEN 'en'
                  WHEN len(list_filter(string_split(text,' '), t -> t IN ('el','la','de'))) > 0 THEN 'es'
                  WHEN len(list_filter(string_split(text,' '), t -> t IN ('le','la','et'))) > 0 THEN 'fr'
                  WHEN len(list_filter(string_split(text,' '), t -> t IN ('der','die','und'))) > 0 THEN 'de'
                  ELSE 'und' END AS predicted
      FROM documents
    )
    SELECT lang, predicted, COUNT(*) AS n_docs
    FROM pred
    GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
)
def doc_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    toks = tokens_col()

    def hits(markers):
        # NB: single-param lambda only — PySpark treats a second lambda
        # parameter as the element index.
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    predicted = (
        F.when(hits(_MARKERS["en"]) > 0, "en")
        .when(hits(_MARKERS["es"]) > 0, "es")
        .when(hits(_MARKERS["fr"]) > 0, "fr")
        .when(hits(_MARKERS["de"]) > 0, "de")
        .otherwise("und")
    )
    return (
        t["documents"]
        .select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 content hash + length histogram
# ---------------------------------------------------------------------------

@query(
    "doc_fingerprints",
    oracle="""
    SELECT source,
           COUNT(DISTINCT md5(lower(text))) AS n_unique,
           COUNT(*) AS n_docs,
           MIN(md5(lower(text))) AS min_fp
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    fp = F.md5(F.lower(F.col("text")))
    return (
        t["documents"]
        .select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.countDistinct("fp").alias("n_unique"),
            F.count("*").alias("n_docs"),
            F.min("fp").alias("min_fp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (subword-style pre-tokenizer counts)
# ---------------------------------------------------------------------------

#: GPT-2-style pre-tokenizer shape: letter runs | digit runs | single
#: punctuation marks. Same regex dialect subset works in Java (Spark) and
#: RE2 (DuckDB), so counts match bit-for-bit.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "doc_bpe_token_stats",
    oracle=f"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
           ROUND(CAST(SUM(CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS DECIMAL(18,4))) AS DOUBLE)
                 / SUM(len(string_split(text, ' '))), 4) AS bpe_per_word
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style token counts next to whitespace words: the
    tokens-per-word ratio is the classic tokenizer-cost estimator for
    training-data budgeting. Pure regexp column work — JVM-side, no UDF."""
    t = load_tables(spark, sf_dir, ("documents",))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)"))
    ws = F.size(tokens_col())
    return (
        t["documents"]
        .select("lang", bpe.alias("n_bpe"), ws.alias("n_ws"))
        .groupBy("lang")
        .agg(
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum("n_ws").alias("total_ws_tokens"),
            F.round(
                F.sum(F.col("n_bpe").cast("decimal(18,4)")).cast("double")
                / F.sum("n_ws"), 4).alias("bpe_per_word"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint (windowed content hashes, stride-sampled)
# ---------------------------------------------------------------------------

_FP_WIDTH = 32
_FP_STRIDE = 16


@query(
    "doc_rolling_fingerprints",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang,
             list_min(list_transform(
               range(1, greatest(2, n_chars - {_FP_WIDTH - 1}) + 1, {_FP_STRIDE}),
               i -> md5(substring(text, CAST(i AS INT), {_FP_WIDTH}))
             )) AS fingerprint
      FROM documents
    )
    SELECT lang,
           COUNT(DISTINCT fingerprint) AS n_unique,
           COUNT(*) AS n_docs,
           MIN(fingerprint) AS min_fp
    FROM fp
    GROUP BY lang
    ORDER BY lang
    """,
)
def doc_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed content fingerprint: hash every {width}-char window at
    {stride}-char steps, keep the minimum (a winnowing-style robust
    fingerprint — stable under small edits outside the minimal window,
    unlike whole-document hashes). The rolling-hash formulation is the O(1)
    incremental update of exactly these window hashes; with a fixed stride
    the windowed form is equivalent and stays in whole-stage codegen."""
    t = load_tables(spark, sf_dir, ("documents",))
    fp = F.expr(
        f"array_min(transform(sequence(1, greatest(2, n_chars - {_FP_WIDTH - 1}), "
        f"{_FP_STRIDE}), i -> md5(substring(text, i, {_FP_WIDTH}))))"
    )
    return (
        t["documents"]
        .select("lang", fp.alias("fingerprint"))
        .groupBy("lang")
        .agg(
            F.countDistinct("fingerprint").alias("n_unique"),
            F.count("*").alias("n_docs"),
            F.min("fingerprint").alias("min_fp"),
        )
        .orderBy("lang")
    )


@query(
    "doc_zipf_slope",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), c AS (
      SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), r AS (
      SELECT source, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, token) AS rank
      FROM c
    ), t AS (
      SELECT source, ln(rank) AS x, ln(c) AS y FROM r WHERE rank <= 100
    ), s AS (
      SELECT source, COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(20,12))) AS sx,
             SUM(CAST(y AS DECIMAL(20,12))) AS sy,
             SUM(CAST(x * y AS DECIMAL(20,12))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(20,12))) AS sxx
      FROM t GROUP BY source HAVING COUNT(*) > 1
    )
    SELECT source, n AS n_top_tokens,
           ROUND((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 4) AS zipf_slope
    FROM s
    ORDER BY source
    """,
)
def doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-fit diagnostic (round 6): per source, the least-squares slope
    of ln(token frequency) against ln(rank) over the top-100 tokens —
    natural text sits near -1; templated or synthetic text drifts, so a
    per-source slope is a cheap corpus-health signal for training-data
    mixes.

    Determinism: ln of exact integer counts/ranks is bit-identical in
    both engines; all regression sums run over exact decimals (order-
    independent), and the closed-form slope is then a fixed double
    expression.

    Scale shape: one (source, token) count shuffle with map-side
    combine, a per-source rank window over the DISTINCT-token frame
    (≤ vocabulary, not corpus, rows), and a ≤100-row-per-source
    regression aggregate."""
    t = load_tables(spark, sf_dir, ("documents",))
    counts = (
        t["documents"]
        .select("source", F.explode(tokens_col()).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), "token")
    top = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
        .select("source",
                F.log(F.col("rank").cast("double")).alias("x"),
                F.log(F.col("c").cast("double")).alias("y"))
    )
    dec = "decimal(20,12)"
    s = (
        top.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("x").cast(dec)).alias("sx"),
             F.sum(F.col("y").cast(dec)).alias("sy"),
             F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
             F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"))
        .filter(F.col("n") > 1)
    )
    slope = (
        (F.col("n") * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (F.col("n") * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double"))
    )
    return (
        s.select("source", F.col("n").alias("n_top_tokens"),
                 F.round(slope, 4).alias("zipf_slope"))
        .orderBy("source")
    )
