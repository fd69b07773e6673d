"""Partitioned parquet write + partition-pruned read-back: the storage
layout primitive for 100 TB datasets (hive-style partition dirs; a
filter on the partition column must prune at planning, not scan)."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F


def test_partitioned_write_and_pruned_read(spark, sf_dir, tmp_path):
    from tiny_etl_multiproc_bigdata_spark.catalog import table

    out = str(tmp_path / "events_by_type")
    e = table(spark, sf_dir, "events")
    e.write.partitionBy("event_type").mode("overwrite").parquet(out)

    # hive-style layout on disk
    dirs = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    assert len(dirs) >= 2, dirs

    back = spark.read.parquet(out)
    one_type = dirs[0].split("=", 1)[1]
    q = back.filter(F.col("event_type") == one_type).select("event_id")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and one_type in plan, plan

    # correctness: pruned read equals source-side filter
    expected = e.filter(F.col("event_type") == one_type).count()
    assert q.count() == expected
