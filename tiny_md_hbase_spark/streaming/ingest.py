"""Structured Streaming ingest (SURVEY.md §7 phase 5).

The reference's ingest is a synchronous per-point RPC loop
(``Client.insert``, ``Client.java:55-59``). The Spark-native equivalent is
a micro-batched stream: ``readStream`` over arriving files (or any
source), z-encode each batch with the same native expressions the batch
path uses, append to the z-clustered table via ``foreachBatch``, and
refresh the bucket index per batch — amortizing what the reference paid
per point. Index state is recomputed-by-aggregation each batch rather
than held in the streaming state store: exact, restart-safe (state lives
in the table, not the query), and identical to the batch semantics.

Also provides a watermarked windowed aggregation over the ``events``
fixture — the streaming analog of ``range_count`` for time ranges — to
exercise late-data handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tiny_md_hbase_spark.operators.index import DEFAULT_THRESHOLD
from tiny_md_hbase_spark.operators.write import refresh_index, with_generated_ids
from tiny_md_hbase_spark.sources.writer import with_zvalue

__all__ = ["events_as_points", "stream_ingest_points", "stream_windowed_counts"]

# ts arrives as TIMESTAMP(NANOS) in the fixtures, surfaced as nanos-long
# (see session.py nanosAsLong); ts_ts() converts where real timestamp
# semantics (windows, watermarks) are needed
EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def ts_ts(col: str = "ts") -> Column:
    """nanos-long → timestamp (exact integer µs division)."""
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def events_as_points(events: DataFrame) -> DataFrame:
    """Deterministic spatial projection of the events fixture (same spirit
    as the points view, FIXTURES.md): works identically on batch and
    streaming DataFrames."""
    return events.select(
        F.col("event_id").alias("id"),
        (F.col("user_id") % 4096).cast("int").alias("x"),
        ((F.col("event_id") * 997 + F.col("user_id")) % 4096).cast("int").alias("y"),
    )


def stream_ingest_points(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    threshold: int = DEFAULT_THRESHOLD,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream event files into the z-clustered points table.

    Each micro-batch is the reference's insert loop amortized: one
    z-encode pass, one sorted append, one index refresh. ``availableNow``
    drains the current backlog and stops (used by tests/backfills); leave
    it False for a continuous ingest."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        enc = with_zvalue(with_generated_ids(events_as_points(batch)))
        (
            enc.sortWithinPartitions("zvalue")
            .write.mode("append")
            .parquet(f"{table_path}/points")
        )
        refresh_index(spark, table_path, threshold=threshold)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type — the
    streaming DataFrame to attach to any sink. Late rows beyond the
    watermark are dropped; state is bounded by watermark horizon ×
    window count, independent of stream length."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(source_dir)
        .withColumn("ts", ts_ts("ts"))
    )
    w = (
        F.window("ts", window, slide)
        if slide
        else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
