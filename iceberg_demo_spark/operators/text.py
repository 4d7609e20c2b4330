"""Text-analysis operators for training-data pipelines over `documents`.

Beyond-reference surface (BASELINE.json north star): language-ID heuristic,
quality scoring, token counting, document fingerprinting. All built-in
column functions — no Python UDFs — so the hot path stays in whole-stage
codegen and scales linearly with data at 100 TB (pure map-side work, one
shuffle only at the final per-group aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
           SUM(len(string_split(text, ' '))) AS total_tokens,
           ROUND(CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_tokens,
           SUM(n_chars) AS total_chars,
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
           SUM(n_tok) AS total_tokens
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
