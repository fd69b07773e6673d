"""Streaming jobs: rows-only driver check locally + equivalence of
streaming results to their oracle-checked batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.plans.windows import window_tumbling_counts
    from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
        streaming_tumbling_counts,
    )

    stream = streaming_tumbling_counts(spark, sf_dir)
    # map window_start_epoch back to the batch bucket id (epoch/300)
    stream_c = stream.select(
        (F.col("window_start_epoch") / 300).cast("bigint").alias("bucket"),
        "event_type",
        "n",
        "sum_value",
    )
    batch = window_tumbling_counts(spark, sf_dir)
    assert stream_c.count() == batch.count()
    assert stream_c.subtract(batch).count() == 0
    assert batch.subtract(stream_c).count() == 0


def test_streaming_session_equals_batch(spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.plans.windows import sessionize_events
    from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
        streaming_session_window,
    )

    stream = streaming_session_window(spark, sf_dir)
    batch = sessionize_events(spark, sf_dir)
    # same number of sessions per user, same per-session event counts
    s = stream.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n_events").alias("total")
    )
    b = batch.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n_events").alias("total")
    )
    assert s.subtract(b).count() == 0 and b.subtract(s).count() == 0


def test_streaming_dedup(spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.catalog import table
    from tiny_etl_multiproc_bigdata_spark.streaming.jobs import streaming_dedup

    out = streaming_dedup(spark, sf_dir)
    n_keys = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert out.count() == n_keys
    assert out.select("user_id", "event_type").distinct().count() == n_keys
