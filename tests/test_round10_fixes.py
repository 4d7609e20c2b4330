"""Round-10 regression tests — VERDICT r9 asks + ADVICE r9 findings.

Covers: the machine-checked staleness SLO (VERDICT r9 #1), the
artifact-claim validator (ADVICE r9 #1), and (added as they land) the
round's operator fixes.
"""

from __future__ import annotations

import json
import os

import tools.check_coverage as cc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_staleness_projection_flags_violations():
    gates = ["a", "b", "c", "d"]
    ledger = {"a": 9, "b": 6, "c": 5}  # d never verified
    # window covers c and d → all fine (b at staleness 4 == SLO edge)
    projected, probs = cc.project_staleness(gates, ledger, 10, ["c", "d"])
    assert probs == []
    assert projected == {"a": 9, "b": 6, "c": 10, "d": 10}
    # window covers neither the never-verified d nor the >SLO-stale c'
    ledger2 = {"a": 9, "b": 6, "c": 4}
    _, probs2 = cc.project_staleness(gates, ledger2, 10, ["a"])
    msgs = "\n".join(probs2)
    assert "'d' has never had a driver row" in msgs
    assert "'c' last driver-verified in round 4" in msgs
    # b is exactly at the SLO boundary (10-6=4) — allowed, not flagged
    assert "'b'" not in msgs


def test_repo_satisfies_staleness_slo_and_persists_ledger():
    probs = cc.check_staleness()
    assert probs == []
    ledger = json.load(open(os.path.join(REPO, "GATE_FRESHNESS.json")))
    assert ledger["slo_rounds"] == cc.SLO_ROUNDS
    assert len(ledger["window"]) == 50
    # every registered gate appears in both maps
    from iceberg_demo_spark import registry
    registry.load_all()
    assert set(ledger["last_driver_round"]) == set(registry.QUERIES)
    assert set(ledger["projected_after_window"]) == set(registry.QUERIES)
    # the window refreshes every projected-stale gate to current_round
    cur = ledger["current_round"]
    for name in ledger["window"]:
        assert ledger["projected_after_window"][name] == cur


def test_artifact_claims_validator_catches_drift():
    # the real COVERAGE.md passes
    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    assert cc.check_artifact_claims(cov) == []
    # a synthetic stale claim is caught against the real r09 artifact
    bad = "blah ORACLES_LOCAL_r09 at 180/180 blah"
    probs = cc.check_artifact_claims(bad)
    assert len(probs) == 1 and "records 182/182" in probs[0]


# ---------------------------------------------------------------------------
# VERDICT r9 #2: persisted IVF-PQ index
# ---------------------------------------------------------------------------

from tests.conftest import SF_MED, SF_SMALL  # noqa: E402


def test_ivfpq_index_one_file_per_cell(spark):
    """The codes tier is written one file per cell directory — the
    compacted serving layout (files-per-cell pytest, VERDICT r9 #2)."""
    import glob as _glob

    from iceberg_demo_spark.operators.curation import (
        _IVFPQ_CELLS, ensure_ivfpq_index)

    path = ensure_ivfpq_index(spark, SF_MED)
    cell_dirs = sorted(_glob.glob(os.path.join(path, "codes", "cell_id=*")))
    assert len(cell_dirs) == _IVFPQ_CELLS
    for d in cell_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_ivfpq_indexed_equals_in_gate_composition(spark):
    """Persistence must not change the answer: the indexed probe and the
    in-gate composition return identical rows."""
    from iceberg_demo_spark import registry

    registry.load_all()
    a = registry.QUERIES["sim_ivfpq_search"](spark, SF_SMALL).collect()
    b = registry.QUERIES["sim_ivfpq_indexed"](spark, SF_SMALL).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_index_manifest_triggers_rebuild(tmp_path):
    """ADVICE r9 #3: a regenerated source file (changed mtime or size)
    invalidates the persisted index; a crashed build (no manifest) too."""
    from iceberg_demo_spark import scratch

    src = tmp_path / "sf"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"x" * 64)
    idx = tmp_path / "idx"
    idx.mkdir()
    # no manifest yet -> stale
    assert not scratch.index_current(str(idx), str(src), ("documents",))
    scratch.write_index_manifest(str(idx), str(src), ("documents",))
    assert scratch.index_current(str(idx), str(src), ("documents",))
    # regenerate the source -> stale again
    os.utime(src / "documents.parquet", ns=(1, 1))
    assert not scratch.index_current(str(idx), str(src), ("documents",))
