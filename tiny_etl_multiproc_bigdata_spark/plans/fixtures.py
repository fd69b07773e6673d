"""Literal fixture-row plumbing, shared by entries whose behavior the
synthetic corpus cannot exercise (PII, decontamination overlap,
boilerplate sentences, Arabic text): both the Spark input and the
DuckDB oracle union the same literal rows, keeping the driver
comparison non-vacuous. Rows must avoid apostrophes — they are
embedded in single-quoted SQL literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tiny_etl_multiproc_bigdata_spark.catalog import table


def fixture_docs_sql(rows: list[tuple[int, str]]) -> str:
    """FROM-substitutable view: documents(doc_id, text) ∪ literal rows."""
    values = ", ".join(f"(CAST({i} AS BIGINT), '{t}')" for i, t in rows)
    return (
        "(SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {values}) v(doc_id, text))"
    )


def fixture_docs(
    spark: SparkSession, sf_dir: str, rows: list[tuple[int, str]]
) -> DataFrame:
    """Spark twin of fixture_docs_sql."""
    base = table(spark, sf_dir, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    return base.unionByName(extra)
