"""Streaming ingestion mode for the extraction pipeline.

``readStream`` over the ``documents`` table (file source; Kafka/Iceberg
incremental sources are drop-in replacements) → ``foreachBatch`` running the
same batch ``extract_pipeline`` → append sink + lineage.  ``foreachBatch``
(rather than a plain streaming mapInPandas) is deliberate: it reuses the
exact batch operator including metrics/lineage and gives exactly-once file
sink semantics via the streaming checkpoint, so a continuously-fed corpus
and a backfill run share one code path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def run_streaming_extraction(
    spark: SparkSession,
    documents_dir: str,
    output_path: str,
    checkpoint_dir: str,
    metrics_path: str | None = None,
    base_url: str = "http://example.com/",
    max_files_per_trigger: int | None = None,
) -> None:
    """Run extraction as a Structured Streaming job (availableNow drains the
    backlog and stops; drop the trigger for continuous operation)."""
    from ..pipeline.job import extract_pipeline, write_output

    reader = spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(documents_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        extracted = extract_pipeline(batch_df, base_url=base_url)
        write_output(
            extracted,
            output_path,
            metrics_path=metrics_path,
            run_id=f"stream-batch-{batch_id}",
        )

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
