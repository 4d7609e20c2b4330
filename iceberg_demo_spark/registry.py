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


def oracle_cte_body(sql: str) -> str:
    """A registered oracle SELECT as a nestable CTE body.

    An inner WITH is legal in both engines; a trailing ORDER BY is not, so
    strip it — but only when the tail after the LAST ``ORDER BY`` is a pure
    ordering list (identifiers/commas/ASC/DESC/NULLS FIRST|LAST/LIMIT n).
    Composed-audit gates (dedup_minhash_recall, sim_ann_recall) nest other
    gates' oracles through this; a window-function ORDER BY or any other
    non-trailing match must NOT be cut mid-query, so anything unrecognized
    raises instead of silently corrupting the composed oracle.
    """
    import re as _re

    # case-insensitive: a lowercase/mixed-case trailing ORDER BY must get
    # the same strip-or-refuse treatment, never silently pass through
    matches = list(_re.finditer(r"(?i)ORDER\s+BY", sql))
    if not matches:
        return sql
    head, tail = sql[:matches[-1].start()], sql[matches[-1].end():]
    if _re.fullmatch(
            r"(?is)\s*[\w.\"]+(\s+(asc|desc))?(\s+nulls\s+(first|last))?"
            r"(\s*,\s*[\w.\"]+(\s+(asc|desc))?(\s+nulls\s+(first|last))?)*"
            r"\s*", tail):
        return head
    raise ValueError(
        "oracle_cte_body: last ORDER BY is not a pure trailing ordering "
        "clause (window ORDER BY, LIMIT, or other tail?); refusing to cut "
        "mid-query: ..." + sql[-120:])


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
    externally verified.

    ROUND-7 WINDOW — continues the stalest-first freshness rotation
    (VERDICT r6 #1, queue order fixed by COVERAGE.md / VERDICT r5-r6):
    the six late-round-6 gates that have never had a driver row lead at
    positions 0-5; the six NEW round-7 TPC-H partsupp gates (never
    driver-verified, standing policy) follow at 6-11; the eight
    late-round-7 gates (emb_semdedup, multimodal_audio_stats,
    dedup_minhash_recall, sim_ann_recall, doc_dup_span_coverage,
    dedup_incremental_batch, events_distribution_drift,
    doc_bigram_vocab, dedup_incremental_indexed,
    streaming_dedup_ingest, dedup_cross_source_matrix,
    graph_doc_pagerank, streaming_ann_ingest,
    events_session_window_stats, events_pivot_hourly_matrix,
    source_python_datasource, dedup_fuzzy_name_pairs) at 12-28; then
    the five r3-green gates displaced late in round 6, all nine gates
    last green in round 4, and 8 of the 50 round-5-green gates (the
    parity-critical write-path set: the dml/branch/compaction block,
    dml_merge_upsert, changelog_row_counts and mv_incremental_refresh).
    The remaining 42 r5-green gates queue for round 8 and are covered
    every round by the full local oracle artifact
    (ORACLES_LOCAL_r{N}.json via tools/check_oracles.py --emit).
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
        tpch_partsupp,
        graph,
    )

    # Round-7 window: explicit, stalest-first (see docstring). Derived
    # from CORRECTNESS_r01..r06 — each gate's LAST driver-green round.
    _window = (
        "doc_bm25_search",
        "doc_token_entropy",
        "orders_pareto_share",
        "lineitem_column_profile",
        "referential_integrity_audit",
        "streaming_stream_stream_join",
        "q2_min_cost_supplier",
        "q9_product_profit",
        "q11_important_stock",
        "q16_supplier_part_counts",
        "q20_promotion_suppliers",
        "q21_suppliers_kept_waiting",
        # -- never driver-verified: round-7 semantic dedup + audio codec
        #    + the two approximation-audit gates --
        "emb_semdedup",
        "multimodal_audio_stats",
        "dedup_minhash_recall",
        "sim_ann_recall",
        "doc_dup_span_coverage",
        "dedup_incremental_batch",
        "events_distribution_drift",
        "doc_bigram_vocab",
        "dedup_incremental_indexed",
        "streaming_dedup_ingest",
        "dedup_cross_source_matrix",
        "graph_doc_pagerank",
        "streaming_ann_ingest",
        "events_session_window_stats",
        "events_pivot_hourly_matrix",
        "source_python_datasource",
        "dedup_fuzzy_name_pairs",
        "sim_cosine_topk",
        "doc_token_stats",
        "doc_quality_buckets",
        "doc_bpe_token_stats",
        "multimodal_payload_stats",
        "dml_overwrite_dynamic",
        "tt_snapshot_counts",
        "insert_overwrite_static",
        "incremental_read_appends",
        "sim_threshold_pairs",
        "sim_ann_lsh_topk",
        "asof_click_attribution",
        "range_join_error_window",
        "sim_label_centroid_norms",
        "dml_merge_upsert",
        "dml_delete_update",
        "dml_delete_update_mor",
        "branch_write_isolation",
        "compaction_preserves_table",
        "changelog_row_counts",
        "mv_incremental_refresh",
        # changelog_update_images and merge_not_matched_by_source yield
        # their slots to keep the MV representative in-window and admit
        # dedup_fuzzy_name_pairs (changelog coverage stays via
        # changelog_row_counts, MERGE coverage via dml_merge_upsert);
        # they head the round-8 queue below
        "changelog_update_images",
        "merge_not_matched_by_source",
        "mv_rollup_correctness",
        "schema_evolution_read",
        "partition_evolution_read",
        "partition_pruned_scan",
        "sql_ctas_rtas",
        # (skew_salted_agg, skew_salted_join, q15_top_supplier,
        #  cube_flag_status_price, dedup_simhash_hamming_pairs,
        #  streaming_stateful_dedup, bucketed_colocated_join,
        #  dedup_minhash_lsh_pairs, streaming_running_counts,
        #  streaming_ingest_hourly, partition_pruned_scan, sql_ctas_rtas,
        #  partition_evolution_read, schema_evolution_read,
        #  mv_rollup_correctness, changelog_update_images and
        #  merge_not_matched_by_source rotate to the round-8 queue —
        #  their slots went to the seventeen late-round-7 gates at
        #  positions 12-28, which must sit in the window per the
        #  standing new-gate policy; the displaced gates stay in the
        #  tuple so they lead the post-window order, and streaming
        #  coverage stays in-window through streaming_stream_stream_join
        #  at position 5 plus the new streaming_dedup_ingest and
        #  streaming_ann_ingest)
    )
    _order = ([n for n in _window if n in QUERIES]
              + [n for n in QUERIES if n not in _window])
    for _name in _order:
        QUERIES[_name] = QUERIES.pop(_name)
        if _name in ORACLES:
            ORACLES[_name] = ORACLES.pop(_name)
