"""Structured Streaming tests: batch/stream parity under
Trigger.AvailableNow (deterministic replay), session windows,
streaming dedup — SURVEY.md §7 Step 4."""

from __future__ import annotations

import pandas as pd

from map_reduce_spark.registry import load_all
from map_reduce_spark.streaming.events_batch import events_tumbling_1h
from map_reduce_spark.streaming.streams import (
    read_events_stream,
    run_available_now,
    session_window_stats,
    sliding_counts,
    stream_stream_error_click_join,
    streaming_dedup,
    tumbling_counts,
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def test_tumbling_stream_equals_batch(spark, sf_dir):
    """The streaming tumbling agg must produce exactly the batch
    result once the stream is drained (complete mode, no late data
    beyond watermark in a replay)."""
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "t_tumbling", output_mode="complete").toPandas()
    batch = events_tumbling_1h(spark, sf_dir).drop("n_users").toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(batch))


def test_sliding_stream_equals_batch(spark, sf_dir):
    stream = sliding_counts(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "t_sliding", output_mode="complete").toPandas()
    batch = load_all()["events_sliding_1h_30m"].builder(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(batch))


def test_session_windows(spark, sf_dir):
    stream = session_window_stats(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "t_sessions", output_mode="complete").toPandas()
    assert len(got) > 0
    # session bounds are ordered and grouped per user
    assert (got["session_start"] <= got["session_end"]).all()
    # every event lands in exactly one session
    assert got["n_events"].sum() == 1000 * (0.001 / 0.001)  # sf0.001: 1000 events


def test_streaming_dedup_is_noop_on_unique_ids(spark, sf_dir):
    stream = streaming_dedup(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "t_dedup", output_mode="append")
    assert got.count() == 1000  # event_ids are unique in the fixture


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """The watermarked interval join over the replayed stream must
    produce exactly the rows of the equivalent static self-join."""
    from map_reduce_spark.sources import load_table
    from pyspark.sql import functions as F

    stream = stream_stream_error_click_join(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "t_ssjoin").toPandas()

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    )
    want = errors.join(
        clicks,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("error_ts")),
        "inner",
    ).select("error_id", "e_user", "error_ts", "click_id", "click_ts").toPandas()
    assert len(got), "fixture should produce interval-join matches"
    pd.testing.assert_frame_equal(canon(got), canon(want))
