"""Bucketing: pre-shuffled storage for co-located joins — the 100 TB
answer to repeated fact-fact joins on the same key (SURVEY §2.5 /
README scale design). Both sides bucketed by the join key ⇒ the join
plans with ZERO exchanges."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # external tables at explicit paths — warehouse dir is a static conf
    wh = tmp_path_factory.mktemp("warehouse")
    from tiny_etl_multiproc_bigdata_spark.catalog import table

    (
        table(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "li"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        table(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "o"))
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed):
    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        tree = plan.split("\n\n(1)")[0]
        # the join itself must not exchange either side; the only
        # exchange allowed is the tiny post-join aggregation
        join_part = tree.split("SortMergeJoin")[-1] if "SortMergeJoin" in tree else tree
        assert "Exchange" not in join_part, plan
        # correctness unchanged vs the plain-table join
        from tiny_etl_multiproc_bigdata_spark.catalog import table

        plain = (
            table(spark, sf_dir, "lineitem")
            .join(
                table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
