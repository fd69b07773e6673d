"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``tiny_etl_multiproc_bigdata_spark``; this file
is only the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tiny_etl_multiproc_bigdata_spark.plans import registry as _registry
from tiny_etl_multiproc_bigdata_spark.plans.flagship import flagship_words


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §3-EP3): tokenize the documents corpus,
    per-file distinct words + per-file total word count, on sf0.001."""
    return flagship_words(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return _registry.oracle_sql()
