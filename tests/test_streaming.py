"""Streaming tests: deterministic micro-batch replay of the events fixture
through the WINDOW VIEW wrappers; watermark late-data drop; batch/stream
parity (same F.window expression ⇒ same final results).

Reference semantics under test (SURVEY.md §2.9):
  - tumble fires once the watermark passes window end (append mode)
  - events behind the fired watermark are dropped
  - hop assigns each row to size/slide windows
  - session windows close after `gap` of silence
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from clickhouse_23_3_19_32_lts_spark.streaming import (
    hop_window_view,
    materialized_view,
    replay_source,
    session_window_view,
    tumble_window_view,
)

EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _ts(s: str):
    from datetime import datetime

    return datetime.fromisoformat(s)


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    return str(src), str(out), str(ckpt)


def _write_batch(spark, src_dir: str, name: str, rows):
    import time

    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, name)
    )
    # distinct mtimes → deterministic file-source batch order
    time.sleep(1.05)


def _run_stream(spark, src_dir, out_dir, ckpt_dir, view_fn):
    stream = replay_source(spark, os.path.join(src_dir, "*"), EVENT_SCHEMA)
    q = materialized_view(view_fn(stream), out_dir, ckpt_dir)
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_tumble_window_view_counts(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    rows = [
        Row(ts=_ts("2024-01-01 00:00:10"), user_id=1, event_type="a", value=1.0),
        Row(ts=_ts("2024-01-01 00:00:50"), user_id=2, event_type="a", value=2.0),
        Row(ts=_ts("2024-01-01 00:01:10"), user_id=1, event_type="b", value=3.0),
        # closes both windows above once watermark passes:
        Row(ts=_ts("2024-01-01 00:05:00"), user_id=9, event_type="z", value=0.0),
    ]
    _write_batch(spark, src, "b0", rows)

    def view(stream):
        return tumble_window_view(
            stream, "ts", "1 minute", [F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")]
        )

    got = {
        (r["wstart"].isoformat(), r["n"], r["v"])
        for r in _run_stream(spark, src, out, ckpt, view).collect()
    }
    # append mode emits only watermark-closed windows: the 00:05 window stays open
    assert got == {
        ("2024-01-01T00:00:00", 2, 3.0),
        ("2024-01-01T00:01:00", 1, 3.0),
    }


def test_watermark_drops_late_rows(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    # batch 1: rows up to 00:10 → watermark advances to 00:10
    _write_batch(
        spark, src, "b0",
        [
            Row(ts=_ts("2024-01-01 00:00:30"), user_id=1, event_type="a", value=1.0),
            Row(ts=_ts("2024-01-01 00:10:00"), user_id=2, event_type="a", value=1.0),
        ],
    )
    # batch 2: neutral row — lets the 00:10 watermark take effect and the
    # 00:00 window get evicted (watermark application lags one batch)
    _write_batch(
        spark, src, "b1",
        [Row(ts=_ts("2024-01-01 00:11:00"), user_id=5, event_type="a", value=1.0)],
    )
    # batch 3: a late row for the already-fired 00:00 window → dropped
    _write_batch(
        spark, src, "b2",
        [
            Row(ts=_ts("2024-01-01 00:00:45"), user_id=3, event_type="a", value=100.0),
            Row(ts=_ts("2024-01-01 00:20:00"), user_id=4, event_type="a", value=1.0),
        ],
    )

    def view(stream):
        return tumble_window_view(
            stream, "ts", "1 minute", [F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")],
            watermark_delay="0 seconds",
        )

    df = _run_stream(spark, src, out, ckpt, view)
    first_window = [r for r in df.collect() if r["wstart"] == _ts("2024-01-01 00:00:00")]
    assert len(first_window) == 1
    # late (ts=00:00:45, value=100) row NOT counted — StorageWindowView.h:77-89 drop
    assert first_window[0]["n"] == 1 and first_window[0]["v"] == 1.0


def test_hop_window_multiplicity(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    _write_batch(
        spark, src, "b0",
        [
            Row(ts=_ts("2024-01-01 00:02:30"), user_id=1, event_type="a", value=1.0),
            Row(ts=_ts("2024-01-01 00:30:00"), user_id=9, event_type="z", value=0.0),
        ],
    )

    def view(stream):
        return hop_window_view(
            stream, "ts", "1 minute", "3 minutes", [F.count(F.lit(1)).alias("n")]
        )

    rows = [
        r
        for r in _run_stream(spark, src, out, ckpt, view).collect()
        if r["n"] == 1 and r["wstart"] < _ts("2024-01-01 00:10:00")
    ]
    # size/slide = 3 overlapping windows contain 00:02:30
    starts = sorted(r["wstart"].isoformat() for r in rows)
    assert starts == ["2024-01-01T00:00:00", "2024-01-01T00:01:00", "2024-01-01T00:02:00"]


def test_session_window(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    _write_batch(
        spark, src, "b0",
        [
            Row(ts=_ts("2024-01-01 00:00:00"), user_id=1, event_type="a", value=1.0),
            Row(ts=_ts("2024-01-01 00:00:30"), user_id=1, event_type="a", value=1.0),
            # > 1 min gap → new session
            Row(ts=_ts("2024-01-01 00:05:00"), user_id=1, event_type="a", value=1.0),
            Row(ts=_ts("2024-01-01 01:00:00"), user_id=9, event_type="z", value=0.0),
        ],
    )

    def view(stream):
        return session_window_view(
            stream, "ts", "1 minute", [F.count(F.lit(1)).alias("n")], keys=["user_id"]
        )

    rows = [r for r in _run_stream(spark, src, out, ckpt, view).collect() if r["user_id"] == 1]
    ns = sorted(r["n"] for r in rows)
    assert ns == [1, 2]  # two sessions: (00:00,00:00:30) and (00:05)


def test_batch_stream_parity(spark, stream_dirs, sf_dir):
    """The streaming tumble over the events fixture must equal the batch
    groupBy(window(...)) — same expression, same results."""
    src, out, ckpt = stream_dirs
    from clickhouse_23_3_19_32_lts_spark.engine import read_parquet_table

    ev = read_parquet_table(spark, f"{sf_dir}/events.parquet").select(
        "ts", "user_id", "event_type", "value"
    )
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))

    def view(stream):
        return tumble_window_view(
            stream, "ts", "1 hour",
            [F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")],
            keys=["event_type"],
            watermark_delay=None,  # no watermark: all windows emitted at end
        )

    stream = replay_source(spark, os.path.join(src, "*"), EVENT_SCHEMA)
    q = (
        view(stream)
        .writeStream.format("memory")
        .queryName("parity_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["wstart"], r["event_type"], r["n"], round(r["v"], 6))
        for r in spark.sql("SELECT * FROM parity_out").collect()
    }
    want = {
        (r["wstart"], r["event_type"], r["n"], round(r["v"], 6))
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "v")
        .collect()
    }
    assert got == want


def test_stateful_running_aggregate(spark, stream_dirs):
    """applyInPandasWithState: state persists across micro-batches — the
    incremental-materialized-view pattern (SURVEY §2.9, -State combinator)."""
    from clickhouse_23_3_19_32_lts_spark.streaming.stateful import running_aggregate

    src, out, ckpt = stream_dirs
    _write_batch(
        spark, src, "b0",
        [
            Row(ts=_ts("2024-01-01 00:00:01"), user_id=1, event_type="a", value=10.0),
            Row(ts=_ts("2024-01-01 00:00:02"), user_id=1, event_type="a", value=20.0),
            Row(ts=_ts("2024-01-01 00:00:03"), user_id=2, event_type="a", value=5.0),
        ],
    )
    _write_batch(
        spark, src, "b1",
        [Row(ts=_ts("2024-01-01 00:01:00"), user_id=1, event_type="a", value=30.0)],
    )

    stream = replay_source(spark, os.path.join(src, "*"), EVENT_SCHEMA)
    q = (
        running_aggregate(stream, "user_id", "value")
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_out").collect()
    # update mode: user 1 appears once per batch that touched it; the LAST
    # emission carries state accumulated across batches
    u1 = sorted([r for r in rows if r["user_id"] == 1], key=lambda r: r["n"])[-1]
    assert (u1["n"], u1["total"], u1["mn"], u1["mx"]) == (3, 60.0, 10.0, 30.0)
    u2 = [r for r in rows if r["user_id"] == 2][-1]
    assert (u2["n"], u2["total"]) == (1, 5.0)
