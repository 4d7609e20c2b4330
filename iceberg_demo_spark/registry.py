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

    ROUND-8 WINDOW — the stalest-first rotation (VERDICT r7 #1): the 43
    gates whose last driver row is ROUND 5 — the only gates not
    driver-verified since then (freshness histogram entering r8: r7:50,
    r6:50, r5:43) — LEAD at positions 0-42, in the queue order VERDICT
    r7 fixed (alphabetical). Positions 43-47 hold the round-8 gates that
    MUST be (re-)verified: dedup_fuzzy_name_pairs (semantics changed —
    symmetric-delete multi-pass blocking + ubiquitous-key cap, VERDICT
    r7 #2/#6), dedup_fuzzy_recall (new recall audit),
    graph_doc_pagerank (semantics changed — directed edges, dangling
    mass, 10 iterations, VERDICT r7 #3), sim_ann_index_compact (new
    streamed-index bin-packing gate, VERDICT r7 #4), sql_pivot_unpivot
    (new SQL-surface gate, VERDICT r7 #8); positions 48-49 the
    late-round-8 product-quantization pair (emb_pq_codes,
    sim_pq_adc_recall). After this window runs, no
    gate's last driver row is older than round 6. Every other gate is
    covered each round by the full local oracle artifact
    (ORACLES_LOCAL_r{N}.json via tools/check_oracles.py --emit).

    ROUND-9 QUEUE: eleven gates were added AFTER the r8 window was fixed
    and full — doc_lm_quality_score (bigram-LM quality scoring),
    dedup_cascade_lsh_cosine (LSH-candidates → cosine-confirm cascade),
    orders_scd2_history (SCD Type-2 dimension build),
    doc_mixture_materialize (temperature-mixture token-budget
    materialization), emb_hard_negatives (mid-rank-band hard-negative
    mining), dedup_cluster_survivorship (keep-longest election + removal
    ledger over the near-dup clusters), streaming_pydatasource_ingest
    (the streamReader half of the Spark 4 Python DataSource extension
    point — checkpointed file-index offsets, exactly-once across
    restarts), changelog_replication (CDC apply: an empty replica
    consumes the changelog per-commit and must converge to the source
    exactly — n_mismatches pinned to 0 by the oracle),
    dedup_prefix_filter_pairs (PPJoin-style prefix filtering — lossless
    at τ, shares the exact Jaccard gate's oracle verbatim),
    doc_split_leakage_audit (content-hash train/valid split + near-dup
    pairs straddling the boundary — the eval-leakage number),
    doc_mixture_epochs (upsampling plan: ⌈budget/corpus⌉ epochs +
    repetition ppm per source). They register past position 50
    (locally oracle-verified in ORACLES_LOCAL_r08) and, per the standing
    policy, must LEAD the round-9 window together with whatever gates
    are then stalest (entering r9 the histogram is r8:50, r7:50,
    late-r8+r6-carryover for the rest).
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

    # Round-8 window: explicit, stalest-first (see docstring). Positions
    # 0-42 are exactly the 43 gates whose last driver-green round is 5
    # (computed from CORRECTNESS_r01..r07: green in r5, absent from the
    # r6 and r7 windows), in VERDICT r7's queue order.
    _window = (
        "bucketed_colocated_join",
        "changelog_update_images",
        "cube_flag_status_price",
        "dedup_minhash_lsh_pairs",
        "dedup_simhash_hamming_pairs",
        "doc_decontamination",
        "doc_mixture_weights",
        "doc_per_source_cap",
        "doc_pii_redaction",
        "doc_quality_pipeline",
        "doc_repetition_metrics",
        "doc_sequence_packing",
        "doc_shard_assignment",
        "doc_stratified_sample",
        "doc_tfidf_top_terms",
        "emb_dominant_dims",
        "emb_feature_norm_stats",
        "emb_int8_quantization",
        "emb_kmeans_clusters",
        "events_funnel_conversion",
        "events_gap_fill_resample",
        "events_hourly_anomalies",
        "events_type_transitions",
        "merge_not_matched_by_source",
        "multimodal_decode_features",
        "multimodal_frame_sample",
        "multimodal_resize",
        "mv_rollup_correctness",
        "orders_cohort_retention",
        "orders_market_basket",
        "orders_rfm_segments",
        "partition_evolution_read",
        "partition_pruned_scan",
        "q15_top_supplier",
        "quantity_percentiles_by_flag",
        "schema_evolution_read",
        "sim_ann_ivf_topk",
        "skew_salted_agg",
        "skew_salted_join",
        "sql_ctas_rtas",
        "streaming_ingest_hourly",
        "streaming_running_counts",
        "streaming_stateful_dedup",
        # -- positions 43-47: round-8 new/changed gates (standing
        #    policy: every new or semantics-changed gate sits inside the
        #    50-entry window so the driver value-verifies it this round)
        "dedup_fuzzy_name_pairs",
        "dedup_fuzzy_recall",
        "graph_doc_pagerank",
        "sim_ann_index_compact",
        "sql_pivot_unpivot",
        # -- positions 48-49: late-round-8 product-quantization pair
        #    (encoding audit + ADC search recall) --
        "emb_pq_codes",
        "sim_pq_adc_recall",
        # -- the r6/r7-green gates (freshest) follow in QUERIES order
        #    and stay covered by ORACLES_LOCAL_r08 --
    )
    _order = ([n for n in _window if n in QUERIES]
              + [n for n in QUERIES if n not in _window])
    for _name in _order:
        QUERIES[_name] = QUERIES.pop(_name)
        if _name in ORACLES:
            ORACLES[_name] = ORACLES.pop(_name)
