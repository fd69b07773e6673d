"""Plan-level pin for functions/partitioning.py (r14, guide §2.4).

The iterative graph tier's whole optimization rests on one mechanism:
``localCheckpoint`` taken with AQE disabled captures the physical
plan's real ``outputPartitioning`` into the LogicalRDD, so downstream
joins/aggregations keyed the same way plan with ZERO Exchange on the
checkpointed side. These tests pin that mechanism directly (a Spark
upgrade that silently stops preserving the partitioning would
reintroduce ITERS full shuffles of the edge tables without failing
any value-equality test).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.functions.partitioning import (
    ckpt_hash,
    ckpt_keep,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ckpt_hash_join_and_agg_need_no_exchange(spark):
    left = ckpt_hash(
        spark.range(1000).select(
            (F.col("id") % 97).alias("k"), F.col("id").alias("v")
        ),
        "k",
    )
    right = ckpt_hash(
        spark.range(97).select(F.col("id").alias("k"), F.lit(1).alias("w")),
        "k",
    )
    plan = _executed(left.hint("shuffle_hash").join(right, "k"))
    assert "Exchange" not in plan
    agg_plan = _executed(left.groupBy("k").agg(F.count("*").alias("n")))
    assert "Exchange" not in agg_plan


def test_ckpt_keep_preserves_aggregate_partitioning(spark):
    base = spark.range(1000).select(
        (F.col("id") % 53).alias("k"), F.col("id").alias("v")
    )
    kept = ckpt_keep(base.groupBy("k").agg(F.sum("v").alias("s")))
    plan = _executed(kept.groupBy("k").agg(F.count("*").alias("n")))
    assert "Exchange" not in plan


def test_ckpt_hash_restores_aqe_and_values(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    df = ckpt_hash(
        spark.range(100).select((F.col("id") % 7).alias("k")), "k"
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev
    assert df.count() == 100
    # values unchanged by the repartition+checkpoint
    got = sorted(r["k"] for r in df.distinct().collect())
    assert got == list(range(7))
