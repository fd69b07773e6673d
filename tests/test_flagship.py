"""Flagship pipeline invariants — the reference's own manual SQL checks
(example/readme.md:41-69) re-expressed as assertions (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _flagship(spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.plans.flagship import flagship_words

    return flagship_words(spark, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "word_len", "word_truncated", "file", "words_count"]


def test_uniqueness_invariant(spark, sf_dir):
    # (word, file) is a key — example/readme.md:68
    df = _flagship(spark, sf_dir)
    dups = (
        df.groupBy(F.lower("word").alias("w"), "file")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_conservation_invariant(spark, sf_dir):
    # SUM(words_count) over DISTINCT(file, words_count) == total token
    # count — example/readme.md:52-55
    df = _flagship(spark, sf_dir)
    recovered = (
        df.select("file", "words_count")
        .distinct()
        .agg(F.sum("words_count"))
        .collect()[0][0]
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = (
        docs.select(F.explode(F.split("text", r"\s+", -1)).alias("t"))
        .count()
    )
    assert recovered == total


def test_registry_contract():
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        oracle_sql,
        queries,
    )

    q, o = queries(), oracle_sql()
    assert set(o) <= set(q), "oracle without query"
    assert len(q) > 0
