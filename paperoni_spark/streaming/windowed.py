"""Structured Streaming ingestion mode.

The reference is strictly batch (one run over a finite URL list,
main.rs:42-113); streaming is our additive ingestion mode for the same
operators.  The windowed aggregation below runs as a real Structured
Streaming query (file source → watermark → tumbling window → memory/Iceberg
sink) with ``availableNow`` so it is testable against a static parquet
directory and identical to the continuous deployment shape.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch-shape of the streaming aggregation: tumbling-window counts and
    value sums per event type (shared by the streaming and batch paths)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_streaming_window_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    state_partitions: int | None = None,
) -> DataFrame:
    """Run the windowed aggregation as a Structured Streaming query over the
    events parquet with an availableNow trigger; returns the result table."""
    table = f"stream_counts_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    from .util import state_shuffle_partitions

    with state_shuffle_partitions(spark, state_partitions):
        query = (
            agg.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(table)
