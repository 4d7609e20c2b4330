"""Round-8 ADVICE regressions.

1. (low) ``drop_database`` rmtree'd the namespace directory
   unconditionally, so DROP DATABASE CASCADE without PURGE permanently
   deleted contained tables' data files — inconsistent with DROP TABLE
   (no PURGE) preservation. Now purge=False preserves surviving data
   files by moving the directory to a hidden ``.dropped-*`` path.
2. (low) the Python DataSource's ``_admit`` compared pushed-filter
   values with Python operators; a NULL column value raised TypeError
   and crashed the scan task. SQL semantics: the row is dropped.
3. (low) ``stream_dedup_to_table`` was not idempotent under
   foreachBatch's at-least-once replay. Snapshots are now stamped with
   (checkpoint, batch_id); a replayed batch skips the table append and
   idempotently repairs the index from the stamped snapshot's own rows.
4. (low) ``oracle_cte_body`` matched only the uppercase literal
   'ORDER BY'; a lowercase/mixed-case trailing clause silently bypassed
   both the strip and the refuse-to-cut check.
"""

from __future__ import annotations

import json
import os

import pytest

from iceberg_demo_spark.registry import oracle_cte_body
from iceberg_demo_spark.tables.catalog import Catalog
from tests.conftest import SF_SMALL


# -- 1: DROP DATABASE purge semantics --------------------------------------

def _data_files(root):
    return [os.path.join(dp, f) for dp, _, fs in os.walk(root)
            for f in fs if f.endswith(".parquet")]


def test_drop_database_without_purge_preserves_data_files(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_database("kept")
    t = cat.create_table("kept.t", "id bigint")
    t.append(spark.range(5))
    assert _data_files(wh)
    cat.drop_database("kept", cascade=True)          # no PURGE
    assert "kept" not in cat.list_databases()
    # the data files survive, outside the visible catalog tree
    assert _data_files(wh), "non-purge drop deleted data files"
    cat.create_database("kept")                      # name is reusable
    assert cat.list_tables("kept") == []


def test_drop_database_with_purge_deletes_everything(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_database("gone")
    t = cat.create_table("gone.t", "id bigint")
    t.append(spark.range(5))
    cat.drop_database("gone", cascade=True, purge=True)
    assert "gone" not in cat.list_databases()
    assert not _data_files(wh)


# -- 2: NULL values under pushed filters -----------------------------------

def test_pydatasource_null_column_under_pushed_filter_drops_row(tmp_path):
    from pyspark.sql.datasource import GreaterThan
    from pyspark.sql.types import StructType

    from iceberg_demo_spark.sources.pydatasource import (
        _SCHEMA, GlacierJsonlReader)

    d = tmp_path / "jsonl"
    d.mkdir()
    recs = [
        {"doc_id": 1, "source": "a", "n_chars": None, "lang": "en"},
        {"doc_id": 2, "source": "a", "n_chars": 500, "lang": "en"},
    ]
    (d / "000.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in recs))
    r = GlacierJsonlReader({"path": str(d)}, StructType.fromDDL(_SCHEMA))
    assert list(r.pushFilters([GreaterThan(("n_chars",), 100)])) == []
    rows = [row for p in r.partitions() for batch in r.read(p)
            for row in batch.to_pylist()]
    # NULL > 100 is not TRUE: row dropped, no TypeError
    assert [x["doc_id"] for x in rows] == [2]


# -- 3: streaming dedup replay idempotency ---------------------------------

def test_stream_dedup_replay_of_committed_batch_is_idempotent(
        spark, tmp_path):
    """Crash-replay simulation: delete the last foreachBatch commit from
    the checkpoint and re-run. Spark re-delivers that batch with the SAME
    batch id; the (checkpoint, batch_id) stamp must skip the table append
    (no duplicate rows, no new snapshot) and leave the index unchanged
    (the repair anti-join is a no-op when the fold already happened)."""
    from iceberg_demo_spark.operators.dedup import _ingest_windows
    from iceberg_demo_spark.operators.table_ops import _dedup_ingest_src
    from iceberg_demo_spark.sources import load_tables
    from iceberg_demo_spark.streaming.pipeline import stream_dedup_to_table

    src = _dedup_ingest_src(spark, SF_SMALL)
    schema = spark.read.parquet(src).schema
    idx_dir = str(tmp_path / "idx")
    corpus = (load_tables(spark, SF_SMALL, ("documents",))["documents"]
              .filter("doc_id % 5 <> 0"))
    (_ingest_windows(corpus).select("wh").distinct()
     .write.parquet(idx_dir))
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "db.clean",
        [(f.name, f.dataType.simpleString(), f.nullable)
         for f in schema.fields])
    ck = str(tmp_path / "ck")
    stream_dedup_to_table(spark, src, schema, t, ck, idx_dir,
                          _ingest_windows)
    t.refresh()
    kept = sorted(r["doc_id"] for r in t.scan().select("doc_id").collect())
    n_snaps = len(t.metadata.snapshots)
    n_idx = spark.read.parquet(idx_dir).count()
    assert kept and n_snaps >= 2, "need >=2 micro-batches for the replay"

    commits = sorted(f for f in os.listdir(os.path.join(ck, "commits"))
                     if not f.startswith("."))
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    stream_dedup_to_table(spark, src, schema, t, ck, idx_dir,
                          _ingest_windows)
    t.refresh()
    assert sorted(r["doc_id"]
                  for r in t.scan().select("doc_id").collect()) == kept
    assert len(t.metadata.snapshots) == n_snaps
    assert spark.read.parquet(idx_dir).count() == n_idx
    assert spark.read.parquet(idx_dir).distinct().count() == n_idx


# -- 4: case-insensitive trailing ORDER BY ---------------------------------

def test_oracle_cte_body_strips_lowercase_order_by():
    assert oracle_cte_body(
        "SELECT a FROM t order by a desc").rstrip() == "SELECT a FROM t"
    assert oracle_cte_body(
        "SELECT a FROM t Order  By a, b nulls last").rstrip() \
        == "SELECT a FROM t"


def test_oracle_cte_body_refuses_lowercase_order_by_with_limit():
    with pytest.raises(ValueError, match="refusing"):
        oracle_cte_body("SELECT a FROM t order by a limit 5")
