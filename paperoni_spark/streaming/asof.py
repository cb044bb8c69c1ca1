"""Streaming as-of enrichment: ``applyInPandasWithState`` over the event
stream — the ingest-time twin of operators/temporal.asof_enrich.

Per-user group state is ONE (ts_us, event_id) pair: the latest ref event
seen so far (the same struct-max the persisted user_state index keeps, so
the streaming, incremental-index, and batch shapes share one winner rule).
Each micro-batch sorts its group rows by the batch contract's total order
(ts_us, is_tgt, event_id) and walks once: refs advance the state, targets
emit enriched rows in APPEND mode (each target exactly once).

Order contract (the event-log-tailing invariant): micro-batches are
time-split — every event in batch k precedes every event in batch k+1.
Under it the final output is EXACTLY the batch as-of join (the gate
hash-checks that identity against the full union-window oracle).  Within
a batch arrival order is free (the sort restores it); across batches a
late ref older than the state is ignored by the max rule rather than
corrupting it.
"""

from __future__ import annotations

import uuid
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from .windowed import EVENTS_SCHEMA

ASOF_STATE_SCHEMA = StructType(
    [StructField("ts_us", LongType()), StructField("event_id", LongType())]
)

ASOF_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("ref_event_id", LongType()),
        StructField("ref_ts_us", LongType()),
        StructField("lag_us", LongType()),
    ]
)

_NO_REF = (-1, -1)  # GroupState tuples cannot hold None


def _update_asof(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    s_ts, s_id = state.get if state.exists else _NO_REF
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # restore the contract's total order within the batch
    pdf = pdf.sort_values(["ts_us", "is_tgt", "event_id"], kind="mergesort")
    out: dict[str, list[int]] = {
        k: [] for k in ("event_id", "user_id", "ts_us", "ref_event_id", "ref_ts_us", "lag_us")
    }
    for eid, ts, tgt in zip(pdf["event_id"], pdf["ts_us"], pdf["is_tgt"]):
        eid, ts = int(eid), int(ts)
        if tgt == 0:
            # max rule (not blind assignment): an out-of-order late ref
            # must not roll the state back
            if (ts, eid) > (s_ts, s_id):
                s_ts, s_id = ts, eid
        else:
            has = s_ts >= 0
            out["event_id"].append(eid)
            out["user_id"].append(int(user_id))
            out["ts_us"].append(ts)
            out["ref_event_id"].append(s_id if has else -1)
            out["ref_ts_us"].append(s_ts if has else -1)
            out["lag_us"].append(ts - s_ts if has else -1)
    state.update((s_ts, s_id))
    yield pd.DataFrame(out)


def run_streaming_asof_enrich(
    spark: SparkSession,
    events_dir: str,
    target_type: str,
    ref_type: str,
    max_files_per_trigger: int | None = None,
    state_partitions: int | None = None,
    path_glob: str = "*.parquet",
) -> DataFrame:
    """Run the enrichment as a Structured Streaming query (availableNow)
    and return the emitted target rows.  APPEND output — every target is
    emitted exactly once, so the memory sink holds O(targets) rows (the
    production sink would be a parquet/foreachBatch writer; the memory
    table is the gate-collectable shape)."""
    table = f"asof_stream_{uuid.uuid4().hex[:8]}"
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("pathGlobFilter", path_glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = (
        reader.parquet(events_dir)
        .where(F.col("event_type").isin(ref_type, target_type))
        .select(
            "user_id",
            F.col("event_id").cast("long").alias("event_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            (F.col("event_type") == target_type).cast("int").alias("is_tgt"),
        )
    )
    enriched = stream.groupBy("user_id").applyInPandasWithState(
        _update_asof,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from .util import state_shuffle_partitions

    with state_shuffle_partitions(spark, state_partitions):
        query = (
            enriched.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(table)
