"""Randomized DML consistency: seeded sequences of append / delete / update /
merge / dynamic-overwrite applied to BOTH the table format and a pure-Python
row model must agree after every step — and earlier snapshots must stay
stable (immutable history) while ops proceed.

This is the missing randomized layer the reference suite lacks
(SURVEY.md §5.3); 2 seeds × 12 ops each, in BOTH copy-on-write and
merge-on-read modes (round 6: MoR sequences also interleave
rewrite_position_delete_files compaction, which must never change
state) — stats-based file pruning is live under every step.
"""

from __future__ import annotations

import random

import pytest

from iceberg_demo_spark.tables import Catalog

CATS = ["a", "b", "c"]


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _mk_rows(rng, n, next_id):
    return [(next_id + i, rng.choice(CATS), round(rng.uniform(0, 100), 2))
            for i in range(n)]


def _table_state(t):
    return sorted(tuple(r) for r in t.scan().collect())


def _model_state(model):
    return sorted(model)


@pytest.mark.parametrize("seed,mode", [
    (7, "copy-on-write"), (42, "copy-on-write"),
    (7, "merge-on-read"), (42, "merge-on-read"),
])
def test_random_dml_matches_model(catalog, spark, seed, mode):
    rng = random.Random(seed)
    props = ({"write.delete.mode": mode, "write.update.mode": mode,
              "write.merge.mode": mode} if mode == "merge-on-read" else {})
    t = catalog.create_table(
        f"db.rand{seed}_{mode[:3]}", "id bigint, cat string, val double",
        partition_by=[("cat",)], properties=props)
    model: list[tuple] = []
    next_id = 0
    snapshots: list[tuple[int, list]] = []  # (snapshot_id, state at commit)

    def sync_append(rows):
        nonlocal next_id
        t.append(spark.createDataFrame(rows, t.schema()))
        model.extend(rows)
        next_id += len(rows)

    sync_append(_mk_rows(rng, 20, next_id))

    for step in range(12):
        ops = ["append", "delete", "update", "merge", "overwrite_dynamic"]
        if mode == "merge-on-read":
            ops.append("compact_deletes")
        op = rng.choice(ops)
        if op == "append":
            sync_append(_mk_rows(rng, rng.randint(1, 8), next_id))
        elif op == "delete":
            cut = round(rng.uniform(0, 100), 2)
            cat = rng.choice(CATS)
            t.delete_where(f"cat = '{cat}' AND val < {cut}")
            model[:] = [r for r in model if not (r[1] == cat and r[2] < cut)]
        elif op == "update":
            cut = round(rng.uniform(0, 100), 2)
            t.update_where({"val": "round(val + 1.5, 2)"}, f"val >= {cut}")
            model[:] = [
                (i, c, round(v + 1.5, 2)) if v >= cut else (i, c, v)
                for (i, c, v) in model
            ]
        elif op == "merge":
            # upsert: half existing ids (update val), half new ids (insert)
            ids = [r[0] for r in model]
            upd = rng.sample(ids, min(3, len(ids))) if ids else []
            new = _mk_rows(rng, 2, next_id)
            next_id += 2
            src_rows = [(i, "m", 55.5) for i in upd] + new
            src = spark.createDataFrame(src_rows, "id bigint, cat string, val double")
            t.merge(
                src, on="t.id = s.id",
                matched=[{"action": "update", "set": {"val": "s.val"}}],
                not_matched=[{}],
            )
            by_id = {r[0]: r for r in src_rows}
            model[:] = [
                (i, c, by_id[i][2]) if i in by_id else (i, c, v)
                for (i, c, v) in model
            ]
            existing = {r[0] for r in model}
            model.extend(r for r in src_rows if r[0] not in existing)
        elif op == "overwrite_dynamic":
            cat = rng.choice(CATS)
            rows = [(10_000 + next_id + i, cat, 9.99) for i in range(3)]
            next_id += 3
            t.overwrite_dynamic(spark.createDataFrame(rows, t.schema()))
            model[:] = [r for r in model if r[1] != cat] + rows
        elif op == "compact_deletes":
            from iceberg_demo_spark.tables import procedures as proc

            proc.rewrite_position_delete_files(t)  # state must not change

        got, want = _table_state(t), _model_state(model)
        assert got == want, f"seed={seed} step={step} op={op}:\n{got[:5]}...\nvs\n{want[:5]}..."
        snap = t.metadata.current_snapshot()
        snapshots.append((snap.snapshot_id, list(want)))

    # immutable history: every recorded snapshot still reads its own state
    for sid, state in rng.sample(snapshots, min(4, len(snapshots))):
        tt = sorted(tuple(r) for r in t.scan(snapshot_id=sid).collect())
        assert tt == sorted(state), f"time travel drifted for snapshot {sid}"


@pytest.mark.parametrize("seed,mode", [
    (11, "copy-on-write"), (23, "merge-on-read"),
])
def test_random_branch_dml_matches_model(catalog, spark, seed, mode):
    """Branch-aware randomized layer: interleave DML on main and on a dev
    branch, with fast_forward syncs and branch re-creation, against TWO
    pure-Python row models. Checks after every step that (a) main and dev
    read their own states, (b) fast_forward succeeds exactly when main
    has not diverged since the last sync and errors (state untouched)
    when it has — the WAP lifecycle under adversarial interleaving.
    """
    from iceberg_demo_spark.tables import procedures as proc

    rng = random.Random(seed)
    props = ({"write.delete.mode": mode, "write.update.mode": mode,
              "write.merge.mode": mode} if mode == "merge-on-read" else {})
    t = catalog.create_table(
        f"db.br{seed}_{mode[:3]}", "id bigint, cat string, val double",
        partition_by=[("cat",)], properties=props)
    next_id = 0

    def mk(n):
        nonlocal next_id
        rows = _mk_rows(rng, n, next_id)
        next_id += n
        return rows

    seedrows = mk(15)
    t.append(spark.createDataFrame(seedrows, t.schema()))
    model_main: list[tuple] = list(seedrows)
    t.create_branch("dev")
    model_dev: list[tuple] = list(model_main)
    diverged = False  # has main moved since the last branch sync?

    def state(branch=None):
        df = t.scan(branch=branch) if branch else t.scan()
        return sorted(tuple(r) for r in df.collect())

    for step in range(14):
        op = rng.choice([
            "main_append", "main_delete", "dev_append", "dev_delete",
            "dev_update", "fast_forward", "recreate_branch",
        ])
        if op == "main_append":
            rows = mk(rng.randint(1, 5))
            t.append(spark.createDataFrame(rows, t.schema()))
            model_main.extend(rows)
            diverged = True
        elif op == "main_delete":
            # divergence must track HEAD movement, not row changes: a
            # no-match DELETE that still commits breaks the ancestry
            head = t.metadata.current_snapshot().snapshot_id
            cat = rng.choice(CATS)
            t.delete_where(f"cat = '{cat}'")
            model_main[:] = [r for r in model_main if r[1] != cat]
            diverged = diverged or (
                t.metadata.current_snapshot().snapshot_id != head)
        elif op == "dev_append":
            rows = mk(rng.randint(1, 5))
            t.append(spark.createDataFrame(rows, t.schema()), branch="dev")
            model_dev.extend(rows)
        elif op == "dev_delete":
            cut = round(rng.uniform(0, 100), 2)
            t.delete_where(f"val < {cut}", branch="dev")
            model_dev[:] = [r for r in model_dev if not (r[2] < cut)]
        elif op == "dev_update":
            cut = round(rng.uniform(0, 100), 2)
            t.update_where({"val": "round(val + 2.25, 2)"}, f"val >= {cut}",
                           branch="dev")
            model_dev[:] = [
                (i, c, round(v + 2.25, 2)) if v >= cut else (i, c, v)
                for (i, c, v) in model_dev
            ]
        elif op == "fast_forward":
            if diverged:
                before_main, before_dev = state(), state("dev")
                with pytest.raises(ValueError):
                    proc.fast_forward(t, "main", "dev")
                assert state() == before_main and state("dev") == before_dev
            else:
                proc.fast_forward(t, "main", "dev")
                model_main[:] = list(model_dev)
        elif op == "recreate_branch":
            t.create_branch("dev", or_replace=True)  # at main's head
            model_dev[:] = list(model_main)
            diverged = False

        assert state() == sorted(model_main), f"seed={seed} step={step} op={op} (main)"
        assert state("dev") == sorted(model_dev), f"seed={seed} step={step} op={op} (dev)"
