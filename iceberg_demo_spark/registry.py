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
    externally verified. Round-5 window (exactly 50): the round-4 window
    minus 9 gates green in BOTH r3 and r4 (rotated out: 4 table_ops —
    dml_overwrite_dynamic, tt_snapshot_counts, insert_overwrite_static,
    incremental_read_appends — 2 similarity — sim_threshold_pairs,
    sim_ann_lsh_topk — asof_click_attribution,
    range_join_error_window and sim_label_centroid_norms), plus 9
    promoted at positions 41-49: the 4 gates
    that never had a driver row (cube_flag_status_price,
    quantity_percentiles_by_flag, events_gap_fill_resample,
    orders_rfm_segments) and the 5 new round-5 operators
    (orders_market_basket, emb_feature_norm_stats,
    events_hourly_anomalies, events_type_transitions,
    emb_dominant_dims). Green rows for the 9 complete 104/104 gates
    driver-verified at least once. The rotated-out
    gates and the long-verified relational tail follow (local oracle
    checks still cover them every round).
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

    # Window rotation: gates with green driver rows in TWO rounds yield
    # their slot to gates that have never been externally verified. They
    # stay registered (local oracle checks still cover them) but move to
    # the end of the driver's evaluation order.
    _promoted = (
        # ROUND 5: the 4 gates added late in round 4 with no driver row
        # yet, plus the 5 new round-5 operators — placed at window
        # positions 41-49 so the driver's first-50 run verifies them
        # (→ 104 gates, 99 with a prior driver row + these 9 in-window).
        "cube_flag_status_price",
        "quantity_percentiles_by_flag",
        "events_gap_fill_resample",
        "orders_rfm_segments",
        "orders_market_basket",
        "emb_feature_norm_stats",
        "events_hourly_anomalies",
        "events_type_transitions",
        "emb_dominant_dims",
    )
    _rotated_out = (
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
        # rotated in round 5 (green in BOTH r3 and r4) to admit the 9
        # promoted gates above:
        "dml_overwrite_dynamic",
        "tt_snapshot_counts",
        "insert_overwrite_static",
        "incremental_read_appends",
        "sim_threshold_pairs",
        "sim_ann_lsh_topk",
        "asof_click_attribution",
        "range_join_error_window",
        "sim_label_centroid_norms",
    )
    _names = [n for n in QUERIES
              if n not in _rotated_out and n not in _promoted]
    _order = (
        _names[: 50 - len(_promoted)]
        + [n for n in _promoted if n in QUERIES]
        + _names[50 - len(_promoted):]
        + [n for n in _rotated_out if n in QUERIES]
    )
    for _name in _order:
        QUERIES[_name] = QUERIES.pop(_name)
        if _name in ORACLES:
            ORACLES[_name] = ORACLES.pop(_name)
