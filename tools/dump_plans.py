"""Regenerate PLANS.md: formatted physical plans for the headline queries.

Evidence artifact for plan-quality review (broadcasts, pushed filters,
pruned schemas) — regenerate after changing any headline query:

    python tools/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from iceberg_demo_spark import registry  # noqa: E402
from iceberg_demo_spark.session import get_spark  # noqa: E402

registry.load_all()

#: queries whose plan is meaningful to snapshot (pure reads; the DML/MV/
#: compaction gates build scratch tables whose plans vary per tempdir;
#: checkpoint-backed final plans are pinned in test_plans instead — a
#: snapshot would show only ExistingRDD)
_CKPT_BACKED = {"doc_bpe_merges", "doc_curation_incremental"}
SNAPSHOT = [q for q in HEADLINE
            if not q.startswith(("dml_", "mv_", "compaction"))
            and q not in _CKPT_BACKED]

#: read queries outside the (frozen, round-comparable) bench headline set
#: whose plans are still worth auditing
EXTRA = [
    "doc_repetition_metrics",
    "doc_tfidf_top_terms",
    "events_funnel_conversion",
    "orders_cohort_retention",
    "emb_int8_quantization",
    # round-5 window promotions (reshaped plans are the audit target):
    "cube_flag_status_price",
    "quantity_percentiles_by_flag",
    "events_gap_fill_resample",
    "orders_rfm_segments",
    "orders_market_basket",
    "emb_feature_norm_stats",
    "events_hourly_anomalies",
    "events_type_transitions",
    # round-6 additions (the partition-pruned IVF probe is the audit
    # target; the stream/stats gates build scratch state per call):
    "events_moving_avg",
    # late round-6 additions (bm25 is in HEADLINE; the stream-stream
    # join reads a scratch sink, so its plan varies per call):
    "doc_token_entropy",
    "orders_pareto_share",
    "lineitem_column_profile",
    "referential_integrity_audit",
    # round-7 TPC-H partsupp gates (q9/q21 are in HEADLINE): correlated
    # scalar-MIN, scalar-threshold HAVING, NOT-IN anti, nested IN
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_promotion_suppliers",
    # round-7 multimodal audio (mapInPandas synth+parse, per-source agg)
    "multimodal_audio_stats",
    # late round-7 additions: batch-vs-corpus broadcast dedup (cached
    # batch frame, 2-scan budget), single-scan drift monitor, bigram
    # top-k (TakeOrderedAndProject)
    "dedup_incremental_batch",
    "events_distribution_drift",
    "doc_bigram_vocab",
    # persisted bucketed corpus hash index probe (zero index-side
    # exchange — the beyond-broadcast ingest-dedup path)
    "dedup_incremental_indexed",
    # cross-source contamination matrix (digest-only self-join) and the
    # iterative integer PageRank (persisted edges, one shuffle/iteration)
    "dedup_cross_source_matrix",
    "graph_doc_pagerank",
    # streamed IVF index probe: MetadataLogFileIndex + PartitionFilters
    "streaming_ann_ingest",
    # native session windows (MergingSessions after one user exchange)
    "events_session_window_stats",
    # pivot/unpivot round-trip (two-level partial agg + Expand melt)
    "events_pivot_hourly_matrix",
    # custom Python datasource scan (BatchScanExec over the jsonl reader)
    "source_python_datasource",
    # blocked Levenshtein entity resolution (round 8: symmetric-delete
    # key-blocked self-join with the ubiquitous-key cap) + its sampled
    # recall audit (length-keyed equi-join ground truth, no cartesian)
    "dedup_fuzzy_name_pairs",
    "dedup_fuzzy_recall",
    # round-8 compacted streamed-IVF tier probe (partition pruning must
    # survive the bin-pack)
    "sim_ann_index_compact",
    # round-8 product quantization: broadcast-codebook pure-map encode
    # (zero corpus shuffle) + the ADC recall audit's broadcast-queries
    # candidate stream
    "emb_pq_codes",
    "sim_pq_adc_recall",
    # round-9: candidate-bound prefix-filter verify (array_intersect on
    # per-doc sorted shingle arrays — no shingle-keyed exchange in the
    # verifier), the end-to-end curation pipeline (checkpoint-cut
    # stages; the final plan re-reads the corpus at most twice), DSIR
    # importance weights (one conditional-agg LM pass + broadcast LLR
    # scoring pass) and the length-bucketed batching plan
    "dedup_prefix_filter_pairs",
    "doc_curation_pipeline",
    "doc_dsir_weights",
    "doc_length_bucketing",
    # late round-9: composed IVF-PQ serving (one corpus map pass over two
    # broadcast rows) and the LM-threshold yield sweep (per-doc score
    # frame × 5-row literal). events_bloom_pruned_join is pinned in
    # test_plans instead — its returned frame is a collected 5-row local
    # relation (the gate materializes under its conf surrogates), so a
    # snapshot here would show only a LocalTableScan.
    "sim_ivfpq_search",
    "doc_lm_threshold_sweep",
    # session additions after the round-9 artifacts froze (round-10
    # queue): KMV sketch overlap (map-side WindowGroupLimit bottom-k),
    # priority sampling (group-limited rank + partial-agg audit),
    # UDTF chunking (ArrowEvalPythonUDTF inside the scan stage),
    # degree-ordered triangles, sufficient-statistics regression and
    # the five-window ranking matrix on one exchange.
    # source_format_round_trip is pinned in tests only — it writes
    # scratch per call, so a snapshot would drift per tempdir.
    "dedup_kmv_overlap_matrix",
    "doc_priority_sample",
    "source_python_udtf",
    "graph_doc_triangles",
    "lineitem_price_qty_regression",
    "customer_balance_window_ranks",
    # third late wave: postings-probe BM25 (PartitionFilters on the
    # term buckets), lossless epoch-merged KMV, BPE encode (the corpus
    # word stream joined to the broadcast vocab lookup), and the
    # int8-code covariance (broadcast maxabs array, (i,j)-partials-only
    # shuffle). doc_bpe_merges' final plan is checkpoint-backed
    # (ExistingRDD) by design — pinned in test_plans instead.
    "doc_bm25_indexed",
    "sketch_kmv_incremental",
    "doc_bpe_encode",
    "emb_code_covariance",
    # temporal multimodal pattern: scan-stage signatures + doc_id window
    "multimodal_scene_changes",
    # packing priced in trained-tokenizer tokens (broadcast vocab lookup
    # + per-source cumsum; training half is checkpoint-backed)
    "doc_bpe_packing",
    # bit-exact Bloom membership: KMV-sized broadcast filter, map-side
    # probes, exact-truth join only for the audit
    "sketch_bloom_membership",
    # round 10: persisted IVF-PQ probe — cell_id PartitionFilters on the
    # code tier, broadcast probe/codebook frames — and the compacted
    # text-index probe (tok_bucket PartitionFilters survive the
    # bin-pack). doc_curation_incremental's final plan is
    # checkpoint-backed — pinned in tests; streaming_bloom_guarded_dedup
    # reads a per-invocation scratch sink — tests only.
    "sim_ivfpq_indexed",
    "doc_bm25_index_compact",
    # round 11: the compacted IVF-PQ tier's probe — cell_id
    # PartitionFilters must survive the bin-pack (the shared
    # _ivfpq_probe plan over the idxcomp root) — and the Bloom
    # saturation/resize audit (broadcast word joins, one digest scan
    # per geometry). The MV delta gates and the curation chain mutate
    # per-invocation scratch/DML state — plan-pinned in tests instead.
    "sim_ivfpq_index_compact",
    "sketch_bloom_resize",
    # round 11 late + round 12: the one-shot hash-sample quantiles and
    # their state-advancement twin (the est branch must rank the
    # persisted pre-filtered state, corpus only as audit). The
    # streaming/dim MV delta gates mutate per-invocation DML state —
    # in-gate mode asserts + tests instead.
    "sketch_quantile_sample",
    "sketch_quantile_advance",
]
SNAPSHOT = SNAPSHOT + [q for q in EXTRA if q not in SNAPSHOT]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans")
    out = [
        "# PLANS — formatted physical plans for the headline read queries",
        "",
        f"Generated by `python tools/dump_plans.py` at {sf_dir} "
        "(regenerate after plan-affecting changes; tests/test_plans.py "
        "asserts the load-bearing properties).",
        "",
    ]
    for name in SNAPSHOT:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path} ({len(SNAPSHOT)} plans)")


if __name__ == "__main__":
    main()
