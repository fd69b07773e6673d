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


def test_streaming_anomaly_zscore_tail_carries_across_batches(spark, tmp_path):
    """Two-micro-batch replay: the events fixture is split at its median
    timestamp into two files streamed with maxFilesPerTrigger=1, so the
    second batch's early rows can only score correctly if the <=6-value
    tail really carried through the state store. The union of the two
    update emissions must equal the batch window plan row-for-row."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

    from tiny_etl_multiproc_bigdata_spark.catalog import table
    from tiny_etl_multiproc_bigdata_spark.plans.registry import REGISTRY
    from tiny_etl_multiproc_bigdata_spark.plans.windows import (
        anomaly_rolling_zscore,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(
        F.percentile_approx("ts", 0.5).alias("m")
    ).collect()[0]["m"]
    stage = str(tmp_path / "events_split")
    os.makedirs(stage, exist_ok=True)
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage + "/f1.dir")
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage + "/f2.dir")
    # one file per batch, mtime order = time order
    import glob
    import shutil
    import time

    f1 = glob.glob(stage + "/f1.dir/part-*.parquet")[0]
    f2 = glob.glob(stage + "/f2.dir/part-*.parquet")[0]
    shutil.copy(f1, stage + "/a_early.parquet")
    shutil.copy(f2, stage + "/b_late.parquet")
    now = time.time()
    os.utime(stage + "/a_early.parquet", (now - 100, now - 100))
    os.utime(stage + "/b_late.parquet", (now, now))
    shutil.rmtree(stage + "/f1.dir")
    shutil.rmtree(stage + "/f2.dir")

    # run the registry entry against the split dir: _events_stream
    # reads pathGlobFilter="events.parquet", so drive the same scoring
    # via a locally-built stream over the split files instead
    import tiny_etl_multiproc_bigdata_spark.operators.grouped_pandas as gp

    schema = spark.read.parquet(stage).schema
    orig = gp.__dict__  # noqa: F841  (documentation: uses same module fn)
    from pyspark.sql.streaming.state import GroupState  # noqa: F401

    # reuse the registered callable but with a monkeypatched source:
    # simplest faithful route — run the registered entry code path by
    # temporarily pointing _events_stream at the split directory
    import tiny_etl_multiproc_bigdata_spark.streaming.jobs as jobs

    real_stream = jobs._events_stream

    def split_stream(
        spark_, _sf_dir, *, require_event_time=False,
        require_measure_domain=False,
        require_time_domain=False,
        require_kernel_time_domain=False,
    ):
        # the r13 time-domain kwargs are accepted but not applied: the
        # split fixtures carry only committed 2024 rows, mid-domain
        # for every tier, so the filters are no-ops by construction
        from pyspark.sql.types import LongType, TimestampType

        raw = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        # same ts normalization as the real _events_stream: watermarks
        # need TIMESTAMP (with local tz)
        if isinstance(schema["ts"].dataType, LongType):
            out = raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(schema["ts"].dataType, TimestampType):
            out = raw
        else:
            epoch_us = F.to_unix_timestamp("ts") * F.lit(1_000_000).cast(
                "bigint"
            ) + F.date_format("ts", "SSSSSS").cast("bigint")
            out = raw.withColumn("ts", F.timestamp_micros(epoch_us))
        if require_event_time:
            out = out.filter(F.col("ts").isNotNull())
        if require_measure_domain:
            from tiny_etl_multiproc_bigdata_spark.functions.numerics import (
                in_grid_domain,
            )

            out = out.filter(in_grid_domain(F.col("value")))
        return out

    jobs._events_stream = split_stream
    try:
        got = (
            REGISTRY["streaming_anomaly_zscore"]
            .fn(spark, sf_dir)
            .collect()
        )
    finally:
        jobs._events_stream = real_stream

    want = anomaly_rolling_zscore(spark, sf_dir).collect()
    key = lambda r: (r["user_id"], r["event_id"])  # noqa: E731
    got_m = {key(r): (r["n_baseline"], r["zscore"], r["is_anomaly"]) for r in got}
    want_m = {key(r): (r["n_baseline"], r["zscore"], r["is_anomaly"]) for r in want}
    assert len(got_m) == len(want_m) == len(want)
    assert got_m == want_m


def _stage_two_batch_split(spark, tmp_path):
    """Split the sf0.001 events fixture at its median timestamp into two
    parquet files (mtime-ordered) and return a _events_stream substitute
    reading them with maxFilesPerTrigger=1 — shared by the CUSUM and
    SPRT state-carry tests."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from tiny_etl_multiproc_bigdata_spark.catalog import table

    sf_dir = "/root/testdata/sf0.001"
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(F.percentile_approx("ts", 0.5).alias("m")).collect()[0]["m"]
    stage = str(tmp_path / "events_split")
    os.makedirs(stage, exist_ok=True)
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage + "/f1.dir")
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage + "/f2.dir")
    f1 = glob.glob(stage + "/f1.dir/part-*.parquet")[0]
    f2 = glob.glob(stage + "/f2.dir/part-*.parquet")[0]
    shutil.copy(f1, stage + "/a_early.parquet")
    shutil.copy(f2, stage + "/b_late.parquet")
    now = time.time()
    os.utime(stage + "/a_early.parquet", (now - 100, now - 100))
    os.utime(stage + "/b_late.parquet", (now, now))
    shutil.rmtree(stage + "/f1.dir")
    shutil.rmtree(stage + "/f2.dir")
    schema = spark.read.parquet(stage).schema

    def split_stream(
        spark_, _sf_dir, *, require_event_time=False,
        require_measure_domain=False,
        require_time_domain=False,
        require_kernel_time_domain=False,
    ):
        # the r13 time-domain kwargs are accepted but not applied: the
        # split fixtures carry only committed 2024 rows, mid-domain
        # for every tier, so the filters are no-ops by construction
        from pyspark.sql.types import LongType, TimestampType

        raw = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        if isinstance(schema["ts"].dataType, LongType):
            out = raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(schema["ts"].dataType, TimestampType):
            out = raw
        else:
            epoch_us = F.to_unix_timestamp("ts") * F.lit(1_000_000).cast(
                "bigint"
            ) + F.date_format("ts", "SSSSSS").cast("bigint")
            out = raw.withColumn("ts", F.timestamp_micros(epoch_us))
        if require_event_time:
            out = out.filter(F.col("ts").isNotNull())
        if require_measure_domain:
            from tiny_etl_multiproc_bigdata_spark.functions.numerics import (
                in_grid_domain,
            )

            out = out.filter(in_grid_domain(F.col("value")))
        return out

    return split_stream


def test_streaming_cusum_state_carries_across_batches(spark, tmp_path):
    """Two-micro-batch replay for streaming_cusum_alert: the CUSUM
    statistic is a prefix recurrence — every row of the second batch is
    wrong unless (S, min S) really carried through the state store.
    Union of update emissions must equal the batch closed form
    row-for-row."""
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )
    from tiny_etl_multiproc_bigdata_spark.plans.windows import cusum_alert_path

    _load_all()
    import tiny_etl_multiproc_bigdata_spark.streaming.jobs as jobs

    sf_dir = "/root/testdata/sf0.001"
    real_stream = jobs._events_stream
    jobs._events_stream = _stage_two_batch_split(spark, tmp_path)
    try:
        got = REGISTRY["streaming_cusum_alert"].fn(spark, sf_dir).collect()
    finally:
        jobs._events_stream = real_stream

    want = cusum_alert_path(spark, sf_dir).collect()
    key = lambda r: (r["event_type"], r["event_id"])  # noqa: E731
    got_m = {key(r): (r["g"], r["alert"]) for r in got}
    want_m = {key(r): (r["g"], r["alert"]) for r in want}
    assert len(got_m) == len(want_m) == len(want)
    assert got_m == want_m


def test_streaming_sprt_decides_once_across_batches(spark, tmp_path):
    """Two-micro-batch replay for streaming_sprt_decision: the decision
    may land in either batch depending on where the walk crosses; the
    union of emissions must contain each decided cohort EXACTLY ONCE
    with the same (n, llr, decision) as the batch entry — a duplicate
    emission (decided state not carried) or a shifted n (walk state
    lost) both fail."""
    from tiny_etl_multiproc_bigdata_spark.plans.advanced import (
        sprt_sequential_test,
    )
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    import tiny_etl_multiproc_bigdata_spark.streaming.jobs as jobs

    sf_dir = "/root/testdata/sf0.001"
    real_stream = jobs._events_stream
    jobs._events_stream = _stage_two_batch_split(spark, tmp_path)
    try:
        got = REGISTRY["streaming_sprt_decision"].fn(spark, sf_dir).collect()
    finally:
        jobs._events_stream = real_stream

    want = sprt_sequential_test(spark, sf_dir).collect()
    assert len(got) == len(want)
    got_m = {r["cohort"]: (r["n_at_decision"], r["llr_micro"], r["decision"]) for r in got}
    want_m = {r["cohort"]: (r["n_at_decision"], r["llr_micro"], r["decision"]) for r in want}
    assert got_m == want_m
