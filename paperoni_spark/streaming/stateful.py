"""Custom stateful streaming operator: ``applyInPandasWithState``.

Demonstrates the engine's arbitrary-stateful-processing path (the Spark
construct the reference has no analogue for — its pipeline is strictly
batch).  ``running_user_totals`` keeps per-user running aggregates in group
state across micro-batches and emits the updated totals each batch; with an
``availableNow`` trigger over a static events directory the final state must
equal the batch ``groupBy`` — which is exactly what the tests assert.
"""

from __future__ import annotations

import uuid
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .windowed import EVENTS_SCHEMA

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def spark_round(x: float, scale: int) -> float:
    """Spark's ROUND(double, n): BigDecimal.valueOf(x) (shortest decimal
    repr, like Python repr) then setScale(n, HALF_UP).  Python's round() is
    banker's (HALF_EVEN) — on an exact x.xxxxx5 boundary the two differ and
    the stream would mismatch the batch/oracle gate by one ulp."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP)
    )


def _update_user_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [spark_round(total, 6)]}
    )


def running_user_totals(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run the stateful aggregation as a Structured Streaming query
    (availableNow) and return the final per-user totals."""
    table = f"user_totals_{uuid.uuid4().hex[:8]}"
    reader = spark.readStream.schema(EVENTS_SCHEMA).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(events_dir)
    totals = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from .util import state_shuffle_partitions

    with state_shuffle_partitions(spark, state_partitions):
        query = (
            totals.writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    # update-mode memory sink accumulates one row per (batch, user); the
    # final state is the row with the highest n_events (strictly monotone —
    # a group only emits when it saw data).  A struct-max keeps (n_events,
    # total_value) from the SAME row: independent column-wise maxes could
    # mix micro-batches when event values are negative (total_value is not
    # monotone).
    from pyspark.sql import functions as F

    return (
        spark.table(table)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )
