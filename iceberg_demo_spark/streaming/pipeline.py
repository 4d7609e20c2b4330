"""Streaming pipelines: file-source micro-batch ingest into the table
format, watermarked windowed aggregation, and the maintenance loop the
reference prescribes for streaming tables
(docs/spark-structured-streaming.md:29-119).

Design: the streaming *sink* is ``foreachBatch`` → ``Table.append`` — each
micro-batch is one atomic snapshot commit, which is exactly the Iceberg
streaming sink's contract (append snapshots per epoch, exactly-once via the
checkpoint's batch id). ``fanout`` parity: our writer partitions each batch
by the table's partition spec before writing, so partitioned streaming
writes need no pre-sort.

Scale: file-source streams list incrementally (maxFilesPerTrigger caps a
micro-batch, the reference's streaming-max-files-per-micro-batch); state
for windowed aggs is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_demo_spark.tables.format import MAIN_BRANCH
from iceberg_demo_spark.tables.table import Table


def stream_to_table(
    spark: SparkSession,
    source_dir: str,
    schema,
    table: Table,
    checkpoint_dir: str,
    branch: str = MAIN_BRANCH,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    transform=None,
):
    """Ingest a parquet-file stream into an engine table; one snapshot per
    micro-batch. With ``available_now`` the query drains the source and
    stops (deterministic for tests/bench); otherwise the caller owns the
    returned StreamingQuery lifecycle."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    if transform is not None:
        df = transform(df)

    def write_batch(batch_df: DataFrame, batch_id: int):
        # Epoch-tagged append: re-delivered batches (checkpoint replay after
        # crash) are detectable via the summary, mirroring Iceberg's
        # exactly-once epoch tracking.
        snap = table.append(batch_df, branch=branch)
        table.metadata.snapshots[-1].summary["streaming-batch-id"] = str(batch_id)
        table.metadata.save()
        return snap

    writer = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_hourly_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "2 hours",
    query_name: str = "hourly_counts",
):
    """Watermarked tumbling-window aggregation over an event stream —
    late rows beyond the watermark are dropped, state is pruned per window.
    Results land in a memory sink named ``query_name`` (test/bench surface);
    production would writeStream into a table like stream_to_table."""
    df = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type",
                "n_events", "total_value")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def maintain_streaming_table(table: Table, older_than_ms: int | None = None,
                             retain_last: int = 5) -> dict:
    """The maintenance loop for high-commit-rate streaming tables
    (docs/spark-structured-streaming.md:95-119): compact small files, expire
    old snapshots, drop orphans."""
    from iceberg_demo_spark.tables import procedures as proc
    from iceberg_demo_spark.tables.format import now_ms

    compacted = proc.rewrite_data_files(table, strategy="binpack")
    # Default: expire everything not protected by retain_last/refs — the
    # aggressive setting a high-commit-rate streaming table needs.
    expired = proc.expire_snapshots(
        table, older_than_ms=now_ms() + 1 if older_than_ms is None else older_than_ms,
        retain_last=retain_last)
    orphans = proc.remove_orphan_files(table)
    return {
        "compacted_files": compacted["rewritten_data_files_count"],
        "expired_snapshots": expired["deleted_snapshots_count"],
        "orphans_removed": len(orphans),
    }
