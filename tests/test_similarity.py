"""Similarity-search tests: LSH ANN recall vs brute force, centroid sanity."""

from __future__ import annotations

from iceberg_demo_spark import registry
from tests.conftest import SF_MED, SF_SMALL

registry.load_all()


def test_ann_lsh_recall_vs_brute_force(spark):
    brute = registry.QUERIES["sim_cosine_topk"](spark, SF_MED).collect()
    ann = registry.QUERIES["sim_ann_lsh_topk"](spark, SF_MED).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ann_sets = {}
    for r in ann:
        ann_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # 8 hyperplanes on random 64-d data is a coarse hash: require that the
    # ANN path returns candidates for most queries and that what it returns
    # overlaps the true top-5 at all (recall floor, not a tight bound).
    assert len(ann_sets) >= len(brute_sets) // 2
    overlaps = [
        len(brute_sets[q] & ann_sets.get(q, set())) for q in brute_sets
    ]
    assert sum(overlaps) > 0


def test_topk_is_five_per_query(spark):
    rows = registry.QUERIES["sim_cosine_topk"](spark, SF_SMALL).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, grp in per_q.items():
        assert len(grp) == 5
        sims = [r["sim"] for r in sorted(grp, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in grp)


def test_centroid_norms_small_for_random_data(spark):
    rows = registry.QUERIES["sim_label_centroid_norms"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    # random unit-ish vectors: centroid norm far below individual norms
    assert all(0 <= r["centroid_norm"] < 1.0 for r in rows)
    assert all(r["dim_count"] == 64 for r in rows)


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=3/16 cells: every query answered, ranked output well
    formed, and aggregate recall vs exact top-5 is non-trivial."""
    brute = registry.QUERIES["sim_cosine_topk"](spark, SF_MED).collect()
    ivf = registry.QUERIES["sim_ann_ivf_topk"](spark, SF_MED).collect()
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(ivf_sets) == 8  # every query produced candidates
    assert all(len(v) == 5 for v in ivf_sets.values())
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(brute_sets[q] & ivf_sets[q]) for q in brute_sets) / (5 * 8)
    assert recall >= 0.2, recall


def test_streaming_ann_ingest_equals_batch_ivf(spark):
    """The streamed cell-partitioned index is pure layout: the probe
    result must equal sim_ann_ivf_topk row-for-row, and the index must
    hold every corpus vector exactly once after the 3-batch drain."""
    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path
    from tests.conftest import SF_SMALL

    a = registry.QUERIES["sim_ann_ivf_topk"](spark, SF_SMALL).collect()
    b = registry.QUERIES["streaming_ann_ingest"](spark, SF_SMALL).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a
    idx = spark.read.parquet(
        scratch_path(f"glacier_stream_ann_{_sf_tag(SF_SMALL)}"))
    n = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert idx.count() == n
    assert idx.select("vec_id").distinct().count() == n


def test_ann_index_compact_equals_batch_and_packs_files(spark):
    """sim_ann_index_compact (round 8): compaction is pure layout — the
    probe over the bin-packed tier equals the batch IVF answer
    row-for-row — and it actually packs: the streamed tier holds one
    fragment per cell per micro-batch (>1 somewhere after 3 batches),
    the compacted tier exactly ONE file per cell, with no rows lost."""
    import glob
    import os

    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path
    from tests.conftest import SF_SMALL

    a = registry.QUERIES["sim_ann_ivf_topk"](spark, SF_SMALL).collect()
    b = registry.QUERIES["sim_ann_index_compact"](spark, SF_SMALL).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a

    def files_per_cell(root):
        return {os.path.basename(d): len(glob.glob(f"{d}/*.parquet"))
                for d in glob.glob(f"{root}/cell_id=*")}

    streamed = files_per_cell(
        scratch_path(f"glacier_stream_ann_{_sf_tag(SF_SMALL)}"))
    packed = files_per_cell(
        scratch_path(f"glacier_stream_ann_compact_{_sf_tag(SF_SMALL)}"))
    assert streamed and max(streamed.values()) > 1, streamed
    assert packed and set(packed.values()) == {1}, packed
    assert set(packed) == set(streamed)
    n = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    comp = spark.read.parquet(
        scratch_path(f"glacier_stream_ann_compact_{_sf_tag(SF_SMALL)}"))
    assert comp.count() == n
    assert comp.select("vec_id").distinct().count() == n


def test_hard_negatives_band_matches_numpy(spark):
    """ranks 6-15 of the exact cosine ordering, per anchor, with the
    (sim DESC, neighbor_id) tiebreak — recomputed with numpy."""
    import numpy as np

    from iceberg_demo_spark.sources import load_tables

    emb = {r.vec_id: (r.label, np.asarray(r.embedding, dtype=np.float64))
           for r in load_tables(spark, SF_SMALL, ("embeddings",))
           ["embeddings"].collect()}
    rows = registry.QUERIES["emb_hard_negatives"](spark, SF_SMALL).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {i for i in emb if i < 8}
    for qid, band in by_q.items():
        ql, qv = emb[qid]
        sims = sorted(
            ((-float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), nid)
             for nid, (_, v) in emb.items() if nid != qid))
        expect = [(i + 1, nid, -s) for i, (s, nid) in enumerate(sims)][5:15]
        band.sort(key=lambda r: r.rank)
        assert [(r.rank, r.neighbor_id) for r in band] == [
            (rk, nid) for rk, nid, _ in expect]
        for r, (_, _, s) in zip(band, expect):
            assert abs(r.sim - s) < 5e-4
            assert r.same_label == int(emb[r.neighbor_id][0] == ql)
