"""Streaming checkpoint recovery: the exactly-once contract across
restarts that makes a file-sink pipeline production-grade — a restarted
query must neither reprocess committed input (no duplicates) nor skip
new input. availableNow + checkpointLocation is the batch-replay shape
every entry in streaming/jobs.py builds on; this pins the recovery half
the memory-sink entries can't exercise."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _run_once(spark, src_dir, out_dir, ckpt_dir, schema):
    q = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withColumn("doubled", F.col("v") * 2)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_file_sink_is_exactly_once_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    batch1 = spark.range(0, 100).select(F.col("id").alias("v"))
    batch1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    # first run processes batch 1
    _run_once(spark, src, out, ckpt, schema)
    got1 = spark.read.parquet(out)
    assert got1.count() == 100
    assert {r["doubled"] for r in got1.collect()} == {2 * v for v in range(100)}

    # restart with NO new input: the checkpoint must prevent any
    # reprocessing — zero new rows, not 200
    _run_once(spark, src, out, ckpt, schema)
    assert spark.read.parquet(out).count() == 100

    # new input arrives; a restarted query picks up ONLY the delta
    spark.range(100, 130).select(F.col("id").alias("v")).write.mode(
        "append"
    ).parquet(src)
    _run_once(spark, src, out, ckpt, schema)
    final = spark.read.parquet(out)
    assert final.count() == 130
    # no duplicates anywhere: every source value exactly once
    assert (
        final.groupBy("v").count().filter(F.col("count") > 1).count() == 0
    )
