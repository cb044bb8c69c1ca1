"""Gap-based sessionization over the events stream (batch shape).

Classic two-window plan: lag() to detect gap starts, running sum to assign
session indexes, then a per-session aggregate.  All window work happens in
one shuffle keyed by user_id (both windows share the partitioning, Catalyst
plans a single Exchange); the final groupBy is partial-aggregated on the
same key so it's shuffle-free after the windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MINUTES) -> DataFrame:
    """Assign session indexes: a session breaks when the gap to the previous
    event of the same user exceeds ``gap_minutes``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000  # microsecond-exact (ts has µs)

    def _us(col):  # parquet NTZ timestamps: interpret in (UTC) session tz
        return F.unix_micros(col.cast("timestamp"))

    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull() | (_us(F.col("ts")) - _us(prev_ts) > gap_us)
    ).cast("int")
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("is_new", new_session).withColumn(
        "session_idx", F.sum("is_new").over(running)
    )


def session_stats(
    events: DataFrame, gap_minutes: int = DEFAULT_GAP_MINUTES
) -> DataFrame:
    """Per-session summary rows (the oracle-checked shape)."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            .cast("long")
            .alias("duration_us"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .withColumn("session_idx", F.col("session_idx").cast("long"))
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered funnel conversion over the event stream: how many users
    completed step i STRICTLY AFTER completing step i-1 (first-touch
    semantics — each step's completion time is the user's earliest
    qualifying event, so the funnel is deterministic and
    order-of-ingestion independent).  The product-analytics twin of the
    corpus queries: same engine, the events table instead of documents.

    Plan: one user-keyed aggregate per step over the PREVIOUS step's
    per-user completion times — the joined side shrinks monotonically
    (funnels only narrow), every join is user-keyed (no windows, no
    cross products), and each step's event scan pushes the event_type
    filter into parquet.  Timestamp comparisons are exact (µs integers
    on both engines).

    Returns (step, event_type, n_users, conv_rate) with conv_rate
    relative to step 1."""
    counts = []
    prev = None
    for i, s in enumerate(steps):
        ev = events.where(F.col("event_type") == s).select("user_id", "ts")
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            p = prev.select("user_id", F.col("t").alias("t_prev"))
            cur = (
                ev.join(p, "user_id")
                .where(F.col("ts") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        prev = cur
        counts.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                F.col("n_users").cast("long").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    first = counts[0].select(F.col("n_users").alias("n_first"))
    return out.crossJoin(F.broadcast(first)).select(
        "step",
        "event_type",
        "n_users",
        F.round(F.col("n_users") / F.col("n_first"), 6).alias("conv_rate"),
    )
