"""Watermark semantics over multi-batch file-source streams.

What Structured Streaming guarantees (and what we assert):
* on-time windows aggregate correctly and are emitted in append mode only
  once the watermark passes their end;
* windows still open at the end of the run are NOT emitted (append gating);
* late-data dropping is best-effort — this Spark build plans no late-input
  filter before the stateful aggregation (verified via the micro-batch
  physical plan), so a beyond-watermark row re-opens its window and emits
  late rather than being silently dropped.  The test pins that behavior so
  an engine upgrade that tightens it is caught deliberately.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from paperoni_spark.streaming.windowed import EVENTS_SCHEMA


def _rows(spark, times_and_types):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(minutes=m), 1, et, 1.0, "{}")
        for i, (m, et) in enumerate(times_and_types)
    ]
    return spark.createDataFrame(data, schema=EVENTS_SCHEMA)


def test_watermark_append_semantics(spark, tmp_path_factory):
    base_dir = tmp_path_factory.mktemp("wm")
    events_dir = str(base_dir / "events")
    os.makedirs(events_dir)

    # batch 1: two on-time windows + a far-future event advancing the
    # watermark to 05:10 − 2h = 03:10
    _rows(
        spark, [(70, "click"), (80, "click"), (130, "view"), (310, "late-driver")]
    ).coalesce(1).write.parquet(os.path.join(events_dir, "batch1"))
    time.sleep(2.1)  # file source orders batches by modification time
    # batch 2: one beyond-watermark event and one future event
    _rows(spark, [(30, "too-late"), (370, "tail")]).coalesce(1).write.parquet(
        os.path.join(events_dir, "batch2")
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir + "/*")
        .withWatermark("ts", "2 hours")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "count",
        )
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = {
        (r["ws"], r["event_type"]): r["count"]
        for r in spark.table("wm_test").collect()
    }

    # on-time windows emitted exactly once the watermark passed their end
    assert rows.get(("2024-01-01 01:00:00", "click")) == 2
    assert rows.get(("2024-01-01 02:00:00", "view")) == 1
    # windows newer than the final watermark stay open — never emitted
    assert not any(et in ("tail", "late-driver") for _, et in rows)
    # best-effort lateness: this engine build re-opens the late window
    # (no late-input filter in the plan) instead of dropping the row
    assert rows.get(("2024-01-01 00:00:00", "too-late")) == 1

def test_watermark_update_mode_late_rows(spark, tmp_path_factory):
    """Update-mode twin of the append test: two-trigger file source, a
    beyond-watermark row in the second trigger."""
    base_dir = tmp_path_factory.mktemp("wmu")
    events_dir = str(base_dir / "events")
    os.makedirs(events_dir)

    # trigger 1: watermark advances to 05:10 - 2h = 03:10
    _rows(spark, [(70, "click"), (80, "click"), (310, "driver")]).coalesce(
        1
    ).write.parquet(os.path.join(events_dir, "batch1"))
    time.sleep(2.1)
    # trigger 2: 00:30 is far beyond the 03:10 watermark
    _rows(spark, [(30, "too-late"), (200, "ontime")]).coalesce(1).write.parquet(
        os.path.join(events_dir, "batch2")
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir + "/*")
        .withWatermark("ts", "2 hours")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "count",
        )
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("wmu_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = {
        (r["ws"], r["event_type"]): r["count"]
        for r in spark.table("wmu_test").collect()
    }
    # update mode emits every on-time window when it changes
    assert rows.get(("2024-01-01 01:00:00", "click")) == 2
    assert rows.get(("2024-01-01 05:00:00", "driver")) == 1
    assert rows.get(("2024-01-01 03:00:00", "ontime")) == 1
    # same best-effort lateness as append mode: this engine build plans no
    # late-input filter before the stateful agg, so the beyond-watermark row
    # re-opens its (already-evicted) window and emits — pinned so an engine
    # upgrade that starts dropping late rows is caught deliberately
    assert rows.get(("2024-01-01 00:00:00", "too-late")) == 1


def test_streaming_sessionization_matches_batch(spark, tmp_path_factory):
    """Gap-sessionization via applyInPandasWithState: fed the same events
    split across THREE micro-batches in a session-hostile order (a later
    batch delivers the bridging event that MERGES two sessions already
    emitted as separate), the final read-back must equal the batch
    session_stats rows exactly."""
    from paperoni_spark.operators.sessionize import session_stats
    from paperoni_spark.streaming.sessions import run_streaming_sessionization

    base_dir = tmp_path_factory.mktemp("sess")
    events_dir = str(base_dir / "events")
    os.makedirs(events_dir)
    # user 1: events at 0min and 50min (gap 50 > 30 → two sessions) plus a
    # 25min bridge arriving LAST (merges them into one); user 2: one session
    batches = [
        [(0, 1), (50, 1), (100, 2)],
        [(105, 2), (120, 2)],
        [(25, 1)],  # the bridge — arrives after both sessions were emitted
    ]
    eid = 0
    batch_dt = dt.datetime(2024, 3, 1)
    all_rows = []
    for bi, batch in enumerate(batches):
        rows = [
            (
                (eid := eid + 1),
                batch_dt + dt.timedelta(minutes=m),
                uid,
                "click",
                float(eid),
                "{}",
            )
            for m, uid in batch
        ]
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.parquet(
            os.path.join(events_dir, f"b{bi}")
        )
        time.sleep(2.1)  # file source orders batches by modification time

    streamed = run_streaming_sessionization(
        spark, events_dir + "/*", max_files_per_trigger=1, path_glob="*.parquet"
    )
    batch = session_stats(spark.createDataFrame(all_rows, schema=EVENTS_SCHEMA))
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    # the merge actually happened: user 1 ends with ONE session of 3 events
    u1 = [r for r in streamed.collect() if r["user_id"] == 1]
    assert len(u1) == 1 and u1[0]["n_events"] == 3


def test_evicting_sessionization_finals_match_batch(spark, tmp_path_factory):
    """The per-session eviction path: a session is emitted exactly once as
    FINAL when the watermark passes its end + gap — via the group timeout
    for idle users AND on data arrival for continuously-active users (whose
    closed history must drain, not accumulate).  session_idx stays
    batch-identical across eviction waves; open sessions never emit."""
    from paperoni_spark.operators.sessionize import session_stats
    from paperoni_spark.streaming.sessions import (
        run_streaming_sessionization_evicting,
    )

    base_dir = tmp_path_factory.mktemp("sessev")
    events_dir = str(base_dir / "events")
    os.makedirs(events_dir)
    # user1 spans THREE sessions delivered across batches: sessions 1-2
    # close while user1 is still active (data-path eviction), session 3
    # closes later via the group timeout (second eviction wave -> the
    # session_idx counter must carry over).  user2 closes via timeout.
    # user3 gets one event; user4 only advances the watermark and stays
    # open (never emitted).
    batches = [
        [(0, 1), (5, 1), (0, 2)],
        [(50, 1), (120, 3)],
        [(125, 1), (121, 3)],
        [(200, 4)],
        [(201, 4)],
    ]
    eid = 0
    batch_dt = dt.datetime(2024, 4, 1)
    all_rows = []
    for bi, batch in enumerate(batches):
        rows = [
            (
                (eid := eid + 1),
                batch_dt + dt.timedelta(minutes=m),
                uid,
                "click",
                float(eid),
                "{}",
            )
            for m, uid in batch
        ]
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.parquet(
            os.path.join(events_dir, f"b{bi}")
        )
        time.sleep(2.1)

    finals = run_streaming_sessionization_evicting(
        spark, events_dir + "/*", max_files_per_trigger=1, path_glob="*.parquet"
    ).collect()
    batch = {
        (r["user_id"], r["session_idx"]): tuple(r)
        for r in session_stats(
            spark.createDataFrame(all_rows, schema=EVENTS_SCHEMA)
        ).collect()
    }
    got = {}
    for r in finals:
        key = (r["user_id"], r["session_idx"])
        assert key not in got, f"duplicate final emission for {key}"
        got[key] = tuple(r)
    # user1: all three sessions final, idx 1..3 continuous across the two
    # eviction waves; user2 and user3 one each; user4 open -> absent
    assert sorted(got) == [(1, 1), (1, 2), (1, 3), (2, 1), (3, 1)]
    for key, row in got.items():
        assert row == batch[key], key
