"""Equivalence pins for the r13 money-units rewrites (q1/q3/q5/q9/
window_running_sum): per-row DECIMAL(30,2) casts+products → exact
integer cent/1e-4-unit folds with one decimal conversion per group.

The old decimal lowerings are kept verbatim here as the semantic
reference; the rewrites must match them bit-for-bit on the fixtures,
on NULL-spiked rows, and under adversarial repartitioning (the q1/q5/
q9 two-level partition-id fold must be layout-invariant)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
    exact_round,
    round_half_up,
)
from tiny_etl_multiproc_bigdata_spark.plans.relational import (
    _dec,
    _money,
    q1_from_lineitem,
)


def _q1_decimal_reference(li):
    qty, price, disc, tax = (
        _dec("l_quantity"),
        _dec("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
    )
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _money(F.sum(qty)).alias("sum_qty"),
        _money(F.sum(price)).alias("sum_base_price"),
        _money(F.sum(price * _dec(F.lit(1) - disc))).alias("sum_disc_price"),
        _money(
            F.sum(price * _dec(F.lit(1) - disc) * _dec(F.lit(1) + tax))
        ).alias("sum_charge"),
        round_half_up(F.sum(qty).cast("double") / cnt, 6).alias("avg_qty"),
        round_half_up(F.sum(price).cast("double") / cnt, 6).alias("avg_price"),
        round_half_up(F.sum(_dec("l_discount")).cast("double") / cnt, 6).alias(
            "avg_disc"
        ),
        cnt.alias("count_order"),
    )


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def test_q1_bitwise_matches_decimal_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert _rows(q1_from_lineitem(li)) == _rows(_q1_decimal_reference(li))
    assert (
        q1_from_lineitem(li).schema.simpleString()
        == _q1_decimal_reference(li).schema.simpleString()
    )


def test_q1_null_spikes_and_layout_invariance(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spikes = spark.createDataFrame(
        [
            # all-money-NULL rows in a fresh group: sums must stay NULL
            (999991, 1, 1, 1, None, None, None, None, "Z", "Z", None),
            (999992, 1, 1, 1, None, None, None, None, "Z", "Z", None),
            # partially NULL row: present columns still aggregate
            (999993, 1, 1, 1, 5.0, None, 0.05, None, "Z", "Z", None),
        ],
        li.schema,
    )
    spiked = li.unionAll(spikes)
    want = _rows(_q1_decimal_reference(spiked))
    assert _rows(q1_from_lineitem(spiked)) == want
    for parts in (1, 3, 64):
        assert _rows(q1_from_lineitem(spiked.repartition(parts))) == want


def test_q1_empty_input(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    empty = spark.createDataFrame([], li.schema)
    assert q1_from_lineitem(empty).count() == 0


def test_window_running_sum_matches_decimal_reference(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = o.select(
        "o_custkey",
        "o_orderkey",
        exact_round(
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .over(w)
            .cast("double"),
            2,
        ).alias("running_total"),
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    new = o.select(
        "o_custkey",
        "o_orderkey",
        exact_round(
            F.sum(cents).over(w).cast("double") / F.lit(100.0), 2
        ).alias("running_total"),
    )
    assert _rows(new) == _rows(ref)


def test_q359_vs_oracle_exact(spark, sf_dir, duck):
    """q3/q5/q9 equivalence is pinned the strongest way available: the
    driver-exact (bit-level, no float normalization) comparison against
    the unchanged DuckDB decimal oracles."""
    import __spark_entry__ as E
    from compare import compare

    q, o = E.queries(), E.oracle_sql()
    for name in (
        "q3_shipping_priority",
        "q5_region_revenue",
        "q9_product_profit",
    ):
        assert not compare(
            q[name](spark, sf_dir), duck, o[name], exact_floats=True
        ), name
