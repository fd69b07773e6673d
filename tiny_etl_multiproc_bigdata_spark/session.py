"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
setting here is chosen to also hold on a large multi-executor cluster:

* AQE on (runtime re-plan, partition coalescing, skew-join splitting) —
  at 100 TB the static ``shuffle.partitions`` guess is always wrong, AQE
  fixes it from observed map output sizes;
* broadcast threshold raised to 64 MiB so TPC-H-style dims (region,
  nation, supplier, date-like dims) never sort-merge;
* Arrow enabled so any Pandas-UDF fallback moves columnar batches, not
  pickled rows;
* session timezone pinned to UTC so event-time semantics are stable and
  oracle comparisons (DuckDB, naive timestamps) agree.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "tiny-etl-multiproc-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``shuffle_partitions`` defaults to the local core count; on a real
    cluster you would size it to ~2-3x total executor cores and let AQE
    coalesce — the configs below are identical either way.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as int64 nanos and convert in the catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
