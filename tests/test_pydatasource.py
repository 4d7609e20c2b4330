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


def _run_stream(spark, src, out, ck):
    from iceberg_demo_spark.sources.pydatasource import register_jsonl_source

    register_jsonl_source(spark)
    q = (spark.readStream.format("glacier_jsonl")
         .option("path", src).load()
         .writeStream.format("parquet")
         .option("path", str(out)).option("checkpointLocation", str(ck))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def test_stream_reader_exactly_once_across_restarts(spark, tmp_path):
    """A second availableNow run on the SAME checkpoint re-ingests
    nothing (offsets recovered); a file appended between runs is
    ingested exactly once (only the [start, end) delta is read)."""
    recs = [{"doc_id": i, "source": "s0", "n_chars": 10 * i, "lang": "en"}
            for i in range(1, 5)]
    src = _mk_dir(tmp_path, {"a.jsonl": recs[:2], "b.jsonl": recs[2:]})
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_stream(spark, src, out, ck)
    assert spark.read.parquet(str(out)).count() == 4
    _run_stream(spark, src, out, ck)  # restart, no new files
    assert spark.read.parquet(str(out)).count() == 4
    (tmp_path / "jsonl" / "c.jsonl").write_text(
        json.dumps({"doc_id": 9, "source": "s1", "n_chars": 1,
                    "lang": "fr"}) + "\n")
    _run_stream(spark, src, out, ck)  # delta only
    df = spark.read.parquet(str(out))
    assert df.count() == 5
    assert df.filter("doc_id = 9").count() == 1


def test_stream_gate_matches_batch_gate_transport_invariance(spark):
    """The streamed rollup equals the same rollup computed through the
    batch reader path — transport must not change data."""
    got = {tuple(r) for r in registry.QUERIES
           ["streaming_pydatasource_ingest"](spark, SF_SMALL).collect()}
    from iceberg_demo_spark.sources.pydatasource import (
        register_jsonl_source, stage_jsonl_docs)
    from pyspark.sql import functions as F

    register_jsonl_source(spark)
    path = stage_jsonl_docs(spark, SF_SMALL)
    batch = (spark.read.format("glacier_jsonl").option("path", path).load()
             .groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").cast("bigint").alias("sum_chars"),
                  F.countDistinct("lang").alias("n_langs")))
    assert got == {tuple(r) for r in batch.collect()}


def test_stream_reader_fails_loudly_on_reordered_log(spark, tmp_path):
    """A file that sorts BEFORE the consumed range remaps count offsets
    (re-ingest + skip under the old contract) — the boundary-name guard
    must turn that into a loud failure instead of silent corruption."""
    import pytest

    recs = [{"doc_id": i, "source": "s0", "n_chars": i, "lang": "en"}
            for i in range(2)]
    src = _mk_dir(tmp_path, {"b.jsonl": recs[:1], "c.jsonl": recs[1:]})
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_stream(spark, src, out, ck)
    assert spark.read.parquet(str(out)).count() == 2
    # violate the append-only-in-name-order contract
    (tmp_path / "jsonl" / "a.jsonl").write_text(
        json.dumps({"doc_id": 9, "source": "s1", "n_chars": 9,
                    "lang": "fr"}) + "\n")
    with pytest.raises(Exception, match="file order changed"):
        _run_stream(spark, src, out, ck)
    # nothing was re-ingested or skipped silently
    assert spark.read.parquet(str(out)).count() == 2


# -- Python UDTF (third extension point) -------------------------------------

def test_udtf_chunks_conserve_char_mass(spark):
    """Σ chunk_len per source == Σ n_chars — the UDTF fans rows out
    without creating or losing characters."""
    from iceberg_demo_spark.registry import QUERIES
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL
    got = {r["source"]: r["sum_chunk_chars"] for r in
           QUERIES["source_python_udtf"](spark, SF_SMALL).collect()}
    want = {r["source"]: r["s"] for r in
            spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .groupBy("source").agg(F.sum("n_chars").alias("s")).collect()}
    assert got == {k: int(v) for k, v in want.items()}


def test_udtf_empty_text_yields_one_empty_chunk(spark):
    from iceberg_demo_spark.operators.table_ops import _chunk_udtf
    spark.udtf.register("chunk_doc_t", _chunk_udtf())
    rows = spark.sql(
        "SELECT c.* FROM VALUES ('') AS v(t), LATERAL chunk_doc_t(t) c"
    ).collect()
    assert len(rows) == 1 and rows[0]["chunk_len"] == 0
    # 600 chars -> 3 chunks of 256/256/88
    rows = spark.sql(
        "SELECT c.* FROM VALUES (repeat('x', 600)) AS v(t), "
        "LATERAL chunk_doc_t(t) c ORDER BY chunk_idx").collect()
    assert [r["chunk_len"] for r in rows] == [256, 256, 88]


def test_udtf_runs_arrow_batched_in_scan_stage(spark):
    """The UDTF executes as ArrowEvalPythonUDTF with no exchange below
    it — chunking happens inside the scan stage, Arrow-batched."""
    from iceberg_demo_spark.registry import QUERIES
    from tests.conftest import SF_SMALL
    df = QUERIES["source_python_udtf"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    below = plan[plan.index("ArrowEvalPythonUDTF"):]
    assert "Exchange" not in below


# -- format round-trip (CSV / JSON / ORC) ------------------------------------

def test_format_round_trip_preserves_every_row(spark):
    """Stronger than the gate's aggregates: the read-back frame is
    row-for-row identical (two-way exceptAll empty) for every format,
    including microsecond timestamps and double bit-patterns."""
    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path
    from tests.conftest import SF_SMALL

    proj = (spark.read.parquet(f"{SF_SMALL}/events.parquet")
            .select("event_id", "ts", "user_id", "event_type", "value"))
    fmtspec = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    for fmt in ("csv", "json", "orc"):
        path = scratch_path(f"glacier_fmt_t_{fmt}_{_sf_tag(SF_SMALL)}")
        w = proj.write.mode("overwrite").format(fmt)
        r = spark.read.format(fmt).schema(proj.schema)
        if fmt == "csv":
            w, r = w.option("header", "true"), r.option("header", "true")
        if fmt in ("csv", "json"):
            w = w.option("timestampNTZFormat", fmtspec)
            r = r.option("timestampNTZFormat", fmtspec)
        w.save(path)
        back = r.load(path)
        assert back.exceptAll(proj).count() == 0, fmt
        assert proj.exceptAll(back).count() == 0, fmt
