"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers a named query builder and (when
SQL-expressible) a DuckDB oracle. ``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is equivalent DuckDB SQL.

    Omit ``oracle`` for non-SQL-expressible operators (the driver then runs a
    weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run.

    Import order IS registration order, and the driver evaluates ``queries()``
    in registration order — so the modules whose gates most need external
    verification (DML/time-travel/changelog/MV, temporal, skew, sampling,
    similarity) register first, followed by the LLM-pipeline operators, with
    the many-times-verified relational suite last.

    STANDING POLICY: any gate added mid-round must register inside the first
    50 entries — the driver's CORRECTNESS window runs exactly the first 50 in
    registration order, so a gate registered past that point is never
    externally verified. End-of-round-4 window (exactly 50): table_ops 20
    (incl. the 2 stateful-streaming gates + SQL-text CTAS/RTAS),
    temporal 2, skew 2, layout 2, sampling 2, similarity 4, multimodal 3,
    analytics 6, curation 6, dedup 2 (minhash, simhash) + q15 (the one
    relational gate with no prior driver row) at position 50; the 13
    rotated-out gates and the round-5 queue follow, then the long-verified
    relational tail.
    """
    from iceberg_demo_spark.operators import (  # noqa: F401
        table_ops,
        temporal,
        skew,
        layout,
        sampling,
        similarity,
        multimodal,
        text,
        analytics,
        curation,
        dedup,
        relational,
    )

    # Window rotation: gates with green driver rows in BOTH rounds 2 and 3
    # yield their slot to gates that have never been externally verified.
    # They stay registered (local oracle checks still cover them) but move
    # to the end of the driver's evaluation order.
    for _name in (
        "dedup_exact",
        "dedup_exact_keepers",
        # rotated in round 4 to admit the curation module's 6 new gates:
        "doc_token_stats",
        "doc_quality_buckets",
        "doc_langid_confusion",
        "doc_fingerprints",
        "doc_bpe_token_stats",
        "doc_rolling_fingerprints",
        # rotated in round 4 to admit the 2 stateful-streaming gates:
        "sim_cosine_topk",
        "multimodal_payload_stats",
        # rotated in round 4 to admit the 2 layout gates:
        "dedup_ngram_jaccard_pairs",
        "dedup_embedding_cosine",
        # rotated in round 4 to admit the sql_ctas_rtas gate:
        "dedup_clusters",
        # ROUND-5 ROTATION QUEUE: added late in round 4 with no rotation
        # candidates left (every remaining in-window gate still awaits its
        # first or second driver row). Locally oracle-green at sf0.01 and
        # sf0.1; promote into the window in round 5 once this round's run
        # double-verifies the current window.
        "events_gap_fill_resample",
        "orders_rfm_segments",
    ):
        if _name in QUERIES:
            QUERIES[_name] = QUERIES.pop(_name)
            if _name in ORACLES:
                ORACLES[_name] = ORACLES.pop(_name)
