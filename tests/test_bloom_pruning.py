"""Runtime Bloom-filter join pruning, demonstrated mechanically.

At 100 TB the single biggest scan-saver on a selective dim-fact join is
Spark's runtime filter: a Bloom filter built from the (filtered)
creation side is pushed into the application side's scan, so fact rows
that can never match are dropped BEFORE the shuffle. The optimizer
only injects it past size thresholds meant for real clusters, so the
test lowers the application-side threshold to fixture scale — the
assertion is about the MECHANISM (injection + correct results), the
thresholds are cluster-tuning.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from conftest import confs


def test_bloom_filter_injected_and_result_unchanged(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def q():
        # selective creation side: 1-URGENT orders only (~1/5 of keys);
        # the runtime filter should prune lineitem rows pre-shuffle
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT")
        return (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum("l_quantity").cast("double").alias("qty"),
            )
        )

    with confs(
        spark,
        **{
            "spark__sql__optimizer__runtime__bloomFilter__enabled": "true",
            # fixture files are KB-scale; drop the 10 GB application-side
            # gate so injection is decided by shape, not size
            "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "0",
            "spark__sql__optimizer__runtimeFilter__semiJoinReduction__enabled": "false",
            # force the non-broadcast join path: broadcast joins skip
            # runtime filters (the broadcast itself prunes)
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__autoBroadcastJoinThreshold": "-1",
        },
    ):
        df = q()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan or "bloom_filter" in plan.lower(), (
            "runtime bloom filter was not injected:\n" + plan[:4000]
        )
        with_bloom = {tuple(r) for r in df.collect()}

    with confs(
        spark,
        **{"spark__sql__optimizer__runtime__bloomFilter__enabled": "false"},
    ):
        without = {tuple(r) for r in q().collect()}

    assert with_bloom == without
