"""Custom Python DataSource tests (sources/pydatasource.py)."""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    StringContains,
)
from pyspark.sql.types import StructType

from iceberg_demo_spark import registry
from iceberg_demo_spark.sources.pydatasource import (
    _SCHEMA,
    GlacierJsonlReader,
    register_jsonl_source,
)
from tests.conftest import SF_SMALL

registry.load_all()


def _mk_dir(tmp_path, files):
    d = tmp_path / "jsonl"
    d.mkdir()
    for name, recs in files.items():
        (d / name).write_text(
            "".join(json.dumps(r) + "\n" for r in recs))
    return str(d)


def _reader(path):
    return GlacierJsonlReader({"path": path}, StructType.fromDDL(_SCHEMA))


def test_reader_partitions_per_file_and_filter_pushdown(spark, tmp_path):
    recs = [{"doc_id": i, "source": f"s{i % 2}", "n_chars": 100 * i,
             "lang": "en"} for i in range(1, 7)]
    path = _mk_dir(tmp_path, {"000.jsonl": recs[:3], "001.jsonl": recs[3:]})
    r = _reader(path)
    # supported filters are absorbed; unsupported ones handed back
    leftover = list(r.pushFilters([
        EqualTo(("source",), "s1"),
        GreaterThanOrEqual(("n_chars",), 300),
        StringContains(("lang",), "e"),
    ]))
    assert len(leftover) == 1 and isinstance(leftover[0], StringContains)
    parts = r.partitions()
    assert len(parts) == 2
    rows = [row for p in parts for batch in r.read(p)
            for row in batch.to_pylist()]
    # s1 docs with n_chars >= 300: doc_id 3 (300) and 5 (500)
    assert sorted(x["doc_id"] for x in rows) == [3, 5]


def test_reader_batches_are_arrow_and_schema_ordered(spark, tmp_path):
    recs = [{"doc_id": 1, "source": "a", "n_chars": 10, "lang": "fr"}]
    path = _mk_dir(tmp_path, {"000.jsonl": recs})
    r = _reader(path)
    (batch,) = [b for p in r.partitions() for b in r.read(p)]
    assert batch.schema.names == ["doc_id", "source", "n_chars", "lang"]
    assert batch.num_rows == 1


def test_datasource_scan_matches_parquet_and_pins_pushdown_gate(spark):
    """The custom-source scan equals the parquet-derived truth (format
    plumbing never changes data), and Spark FAIL-FASTS — rather than
    silently skipping pushdown — when a pushFilters reader runs with
    spark.sql.python.filterPushdown.enabled off (behavior we rely on:
    a misconfigured session can't quietly de-optimize the scan)."""
    import pytest
    from pyspark.sql import functions as F
    from iceberg_demo_spark.sources.pydatasource import stage_jsonl_docs

    register_jsonl_source(spark)
    path = stage_jsonl_docs(spark, SF_SMALL)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")

    def run():
        return sorted(tuple(r) for r in (
            spark.read.format("glacier_jsonl").option("path", path).load()
            .filter(F.col("n_chars") >= 200)
            .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
            .collect()))

    got = run()
    exp = sorted(tuple(r) for r in (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter(F.col("n_chars") >= 200)
        .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .collect()))
    assert got == exp and got

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    try:
        with pytest.raises(Exception, match="PUSHDOWN_DISABLED"):
            run()
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
