"""Relational operator surface: aggregations, joins, set ops, grouping
sets, sorts/limits, date & string functions (SURVEY §2.4-§2.6).

The reference engine has no joins/sorts/set-ops (SURVEY §2.5-2.6) — its
downstream MySQL SQL does (example/readme.md:41-69) — so this module is
where our engine surfaces the full relational capability natively.

Cross-engine numeric determinism recipe (used everywhere a double is
aggregated): cast each row to DECIMAL before SUM (exact arithmetic, no
float accumulation-order dependence), cast the exact result back to
DOUBLE, then ROUND to a fixed scale. This is also the right call at
100 TB: decimal sums are associative, so map-side partial aggregation
stays exact regardless of partitioning.

Scale notes: every dim→fact join here broadcasts the dim side
(region/nation/supplier are tiny by construction; customer at TPC-H
scale is bucketable); fact-fact joins shuffle on their keys and rely on
AQE skew handling. Aggregations are all partial+final hash aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.timedomain import (
    in_time_domain,
    time_domain_sql,
)
from tiny_etl_multiproc_bigdata_spark.functions.jsonpath import (
    duck_json_bigint,
    json_bigint,
)
from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
    exact_round,
    round_half_up,
)
from tiny_etl_multiproc_bigdata_spark.plans.registry import register


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(30,{scale})") if isinstance(col, str) else col.cast(f"decimal(30,{scale})")


def _cents(col) -> F.Column:
    """Integer cent units of a cent-exact money double — exact, and
    value-equal to ``_dec(col) * 100`` on the whole input class the
    oracle comparison admits (r13 optimization; see q1_from_lineitem's
    docstring for the equivalence argument). Summing these longs
    replaces per-row BigDecimal allocation with codegen'd integer
    folds; convert back to the oracle's decimal scale once per group."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _units_to_money(sum_col: F.Column, scale_units: int) -> F.Column:
    """Exact integer units → the identical double the decimal lowering
    produced: one decimal division (exact — result scale 6 covers every
    unit scale used) then ONE cast to double, then the same half-up
    cent rounding."""
    return round_half_up(
        (sum_col.cast("decimal(38,0)") / F.lit(scale_units)).cast("double"), 2
    )


def _money(col) -> F.Column:
    """Exact decimal → double, rounded to cents — via the engine-
    portable half-up formula, because _money also receives scale-4/6
    product sums (price×(1−disc)[×(1+tax)]) whose exact value CAN land
    on a …xx50 half boundary where built-in round() diverges between
    engines (r07 rounding sweep; oracle twins use the same floor form,
    which is value-identical for the exact-cent scale-2 inputs)."""
    return round_half_up(col.cast("double"), 2)


# --------------------------------------------------------------------------
# Aggregations (reference A1/A2/A5 generalized; SURVEY §2.4)
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           (floor(CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100)      AS sum_qty,
           (floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS sum_base_price,
           (floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))
                           * CAST(1 - l_discount AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS sum_disc_price,
           (floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))
                           * CAST(1 - l_discount AS DECIMAL(30,2))
                           * CAST(1 + l_tax AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100)      AS sum_charge,
           (floor(CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000) AS avg_qty,
           (floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000) AS avg_price,
           (floor(CAST(sum(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial+final hash
    aggregation. At 100 TB this is one scan + one tiny shuffle (group key
    cardinality ~6); map-side combine does ~all the work."""
    return q1_from_lineitem(table(spark, sf_dir, "lineitem"))


def q1_from_lineitem(li: DataFrame) -> DataFrame:
    """The Q1 aggregation over any lineitem-shaped DataFrame — also used
    by bench.py's amplified run (union of k parquet scans = k× input
    splits, the honest more-data shape).

    r13 optimization (guide §2.3 "narrower types" / §1.2 per-task
    work): the decimal lowering spent ~70% of the query allocating
    BigDecimals per row — four double→DECIMAL(30,2) casts plus two
    wide-precision products per row feed six >18-precision sum buffers
    (amplified ×16 A/B: decimal 2.76s vs the same sums over scaled
    longs 0.83s; per-row work is identical on a cluster, so the win
    transfers to 100 TB directly). The rewrite folds each money column
    to integer cent units (floor(x*100 + 0.5) — exact and equal to the
    DECIMAL(30,2) cast for every cent-exact money double, the same
    input class the oracle comparison already requires: a non-cent
    double diverges Spark-vs-DuckDB under the OLD lowering too, since
    Spark rounds the shortest-repr BigDecimal where DuckDB rounds the
    binary value), sums exact integer units, and converts to the
    oracle's decimal scale once per GROUP, not once per row.

    Overflow honesty at 100 TB (ANSI sum(long) throws, it does not
    wrap): the charge units reach ~1e11/row, so a single-level long
    sum would overflow past ~9e7 rows per group. The aggregation is
    therefore two-level: level 1 groups by (partition id, flags) —
    partial sums bounded by rows-per-task (~6e5 at 128 MB splits →
    ≤ ~6e16, 150× headroom), level 2 folds the per-partition longs
    into DECIMAL(38,0) (exact, unbounded) and divides back to the
    exact decimal the old plan produced. Every output double is
    bit-identical: both lowerings cast the same exact rational
    (Σunits/10^scale) to double exactly once
    (tests/test_q1_money_rewrite.py pins this on fixtures, NULL
    spikes, and adversarial groupings)."""
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    qc, pc, dc, tc = (
        cents("l_quantity"),
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
    )
    part = (
        li.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "l_returnflag", "l_linestatus")
        .agg(
            F.sum(qc).alias("sq"),
            F.sum(pc).alias("sp"),
            F.sum(pc * (F.lit(100) - dc)).alias("sdp"),
            F.sum(pc * (F.lit(100) - dc) * (F.lit(100) + tc)).alias("sch"),
            F.sum(dc).alias("sd"),
            F.count("*").alias("n"),
        )
    )
    d0 = lambda c: F.sum(F.col(c).cast("decimal(38,0)"))  # noqa: E731
    tot = part.groupBy("l_returnflag", "l_linestatus").agg(
        d0("sq").alias("sq"),
        d0("sp").alias("sp"),
        d0("sdp").alias("sdp"),
        d0("sch").alias("sch"),
        d0("sd").alias("sd"),
        F.sum("n").alias("n"),
    )
    # exact decimal division (≤6 fractional digits, result scale 6) →
    # ONE double rounding per output, same as the old decimal sums
    qty_d = (F.col("sq") / F.lit(100)).cast("double")
    price_d = (F.col("sp") / F.lit(100)).cast("double")
    disc_d = (F.col("sd") / F.lit(100)).cast("double")
    cnt = F.col("n")
    return tot.select(
        "l_returnflag",
        "l_linestatus",
        round_half_up(qty_d, 2).alias("sum_qty"),
        round_half_up(price_d, 2).alias("sum_base_price"),
        round_half_up((F.col("sdp") / F.lit(10_000)).cast("double"), 2).alias(
            "sum_disc_price"
        ),
        round_half_up(
            (F.col("sch") / F.lit(1_000_000)).cast("double"), 2
        ).alias("sum_charge"),
        round_half_up(qty_d / cnt, 6).alias("avg_qty"),
        round_half_up(price_d / cnt, 6).alias("avg_price"),
        round_half_up(disc_d / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — the reference only has this downstream in MySQL
    (example/readme.md:58-61); Spark plans it as a two-phase expand+agg."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           (floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY … HAVING (example/readme.md:68 pattern)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            _money(F.sum(_dec("o_totalprice"))).alias("total_spent"),
        )
        .filter(F.col("n_orders") > 12)
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           (floor(CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _money(F.sum(_dec("l_quantity"))).alias("sum_qty")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_sum_over_distinct",
    oracle="""
    SELECT (floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS sum_distinct_price
    FROM (SELECT DISTINCT o_custkey, o_totalprice FROM orders)
    """,
)
def agg_sum_over_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM over a distinct subquery — the reference's conservation
    invariant shape (example/readme.md:52-55)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_totalprice")
        .distinct()
        .agg(_money(F.sum(_dec("o_totalprice"))).alias("sum_distinct_price"))
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.5 — native capability the reference lacks)
# --------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           (floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))
                          * CAST(1 - l.l_discount AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter → fact joins → top-k.

    customer is broadcast (post-filter it is tiny); orders⋈lineitem
    shuffles on orderkey. Revenue sums integer 1e-4 units (exact; see
    q1_from_lineitem) — per-group row count is bounded by order size,
    so a single-level long sum cannot overflow at any corpus scale.
    Top-k carries a full tiebreak (orderkey) so the limit is
    deterministic for the oracle hash. (r13 note: a reorder that
    pre-joins broadcast(c) onto orders before the orderkey join was
    A/B'd and REVERTED — locally every join broadcasts, and nesting
    the broadcast build serialized an extra job per run: q3 1.03s →
    1.23s paired median. At cluster scale the pre-filter would cut
    the orders side of the orderkey exchange ~5×; that belongs with a
    size-based planner decision, not a hardcoded local pessimization.)
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    units = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_units_to_money(F.sum(units), 10_000).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           (floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))
                          * CAST(1 - l.l_discount AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-hop star join; all dims broadcast so the only
    wide exchange is orders⋈lineitem. Revenue folds integer 1e-4 units
    cast to DECIMAL(38,0) (r13): one cheap per-row decimal cast of an
    exact long replaces three double→DECIMAL(30,2) casts plus a wide
    product, and the (38,0) sum is overflow-free at any corpus scale
    without q1's two-level fold — A/B'd against both the old lowering
    and a q1-style two-level pid fold (old 2.44s / units 2.26s /
    two-level 2.77s paired medians under load; the join chain, not the
    agg, dominates this query locally, and the extra pid stage is pure
    overhead at 5-row group cardinality). The q3-style
    broadcast-reorder was A/B'd and reverted here too: q5 1.12s →
    1.45s paired median — see q3's docstring."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    units = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        _units_to_money(F.sum(units.cast("decimal(38,0)")), 10_000).alias(
            "revenue"
        )
    )


@register(
    "join_inner",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM customer c RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 99000
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .filter(F.col("o_totalprice") > 99000)
        .select("o_orderkey", "c_name")
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(s.s_nationkey, c.c_nationkey) AS nationkey,
           count(s.s_suppkey) AS n_suppliers,
           count(c.c_custkey) AS n_customers
    FROM (SELECT DISTINCT s_nationkey, s_suppkey FROM supplier) s
    FULL JOIN (SELECT DISTINCT c_nationkey, c_custkey FROM customer) c
      ON s.s_nationkey = c.c_nationkey
    GROUP BY coalesce(s.s_nationkey, c.c_nationkey)
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").select("s_nationkey", "s_suppkey").distinct()
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_custkey").distinct()
    return (
        s.join(c, s.s_nationkey == c.c_nationkey, "full")
        .groupBy(F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"))
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.count("c_custkey").alias("n_customers"),
        )
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 90000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 90000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast_chain",
    oracle="""
    SELECT r.r_name, count(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint (SURVEY §2.5): small-dim join must never
    shuffle — `.explain` shows BroadcastHashJoin."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
    )


@register(
    "scalar_subquery_filter",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate: rows above the global mean. Planned as
    a broadcast of a 1-row aggregate — no shuffle of the fact side."""
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("_sq_customer")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM _sq_customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM _sq_customer)
        """
    )


# --------------------------------------------------------------------------
# Set ops / sorts / limits (SURVEY §2.6)
# --------------------------------------------------------------------------

@register(
    "setop_union_all",
    oracle="""
    SELECT nationkey, kind FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    )
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return c.unionAll(s)


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # SQL EXCEPT = distinct difference


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, no full sort at any scale."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", exact_round("o_totalprice", 2).alias("totalprice"))
    )


# --------------------------------------------------------------------------
# Date / string / JSON scalar functions
# --------------------------------------------------------------------------

@register(
    "date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT)  AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           count(*) AS n,
           (floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) * 100 + 0.5) / 100) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
    ).agg(
        F.count("*").alias("n"),
        _money(F.sum(_dec("o_totalprice"))).alias("total"),
    )


@register(
    "string_functions",
    oracle="""
    SELECT upper(p_brand)                        AS brand,
           CAST(min(length(p_name)) AS BIGINT)   AS min_name_len,
           CAST(max(length(p_name)) AS BIGINT)   AS max_name_len,
           count(DISTINCT substr(p_type, 1, 5))  AS n_type_prefixes
    FROM part
    GROUP BY upper(p_brand)
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.groupBy(F.upper("p_brand").alias("brand")).agg(
        F.min(F.length("p_name")).cast("bigint").alias("min_name_len"),
        F.max(F.length("p_name")).cast("bigint").alias("max_name_len"),
        F.countDistinct(F.substring("p_type", 1, 5)).alias("n_type_prefixes"),
    )


@register(
    "json_extract_scalar",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum({duck_json_bigint("props", "$.k")}) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the events.props column (SURVEY
    fixture table `events`; JVM-side get_json_object, no UDF). Rides
    the r13 --jsonedge contract (functions/jsonpath.py): malformed or
    non-numeric $.k is NULL on both engines (the SUM skips it) — one
    truncated props row must not crash a corpus-scale aggregate."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(json_bigint("props", "$.k"))
        .cast("bigint")
        .alias("sum_k"),
    )


# ONE template for both engines — the literal duplicated twice would be
# a silent-drift hazard (a predicate edited in only one copy can stay
# green at small sf while the oracle no longer describes the query).
# Rounding: the price×discount sum is exact at scale 4, so rounding it
# at 2 can land exactly on a half boundary (…xx50) where built-in
# round() diverges between engines — half-up floor form on both sides
# (r07 rounding sweep; portable SQL, valid in Spark SQL and DuckDB).
_Q6_SQL = """
    SELECT (floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                  * 100 + 0.5) / 100)
             AS revenue,
           count(*) AS n_lines
    FROM {tbl}
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24 AS DOUBLE)
"""


@register("sql_q6_forecast", oracle=_Q6_SQL.format(tbl="lineitem"))
def sql_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change; window shifted to 1996 —
    the fixture ships 1995-2001) through the SQL front door: the table
    registers as a temp view and the query is a literal SQL string via
    ``spark.sql`` — same Catalyst plan as the DataFrame API, proving
    both surfaces are first-class. All three predicates push down to
    the parquet scan; the money product goes through per-factor
    DECIMAL casts (the q1 recipe) so the sum is exact and
    shuffle-order-independent."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("q6_lineitem")
    return spark.sql(_Q6_SQL.format(tbl="q6_lineitem"))


@register(
    "user_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS f FROM events GROUP BY user_id
    )
    SELECT CAST(floor(epoch(f.f) / 604800) AS BIGINT) AS cohort_week,
           CAST(floor(epoch(e.ts) / 604800)
                - floor(epoch(f.f) / 604800) AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, active
    user counts per (cohort, weeks-since-cohort) cell — the standard
    retention triangle. The firsts table is one row per user (tiny next
    to the event log) so it broadcasts; the distinct-count shuffles once
    on the cohort cell."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("f"))
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800)  # noqa: E731
    j = e.join(F.broadcast(firsts), "user_id")
    return (
        j.select(
            "user_id",
            week(F.col("f")).cast("bigint").alias("cohort_week"),
            (week(F.col("ts")) - week(F.col("f"))).cast("bigint").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "join_null_safe",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT nullif(c_custkey % 100, 0) AS nk FROM customer
    )
    SELECT d.nk, count(o.o_orderkey) AS n_orders
    FROM dim d
    LEFT JOIN orders o ON nullif(o.o_custkey % 100, 0) IS NOT DISTINCT FROM d.nk
    GROUP BY d.nk
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the
    NULL bucket on both sides matches itself instead of silently
    dropping, the semantics ETL needs when a join key is legitimately
    absent. Derived nullable keys (mod-100, 0 → NULL) exercise the
    NULL row explicitly."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    dim = c.select(
        F.nullif(F.col("c_custkey") % 100, F.lit(0)).alias("nk")
    ).distinct()
    fact = o.select(
        "o_orderkey", F.nullif(F.col("o_custkey") % 100, F.lit(0)).alias("fk")
    )
    joined = dim.join(fact, dim["nk"].eqNullSafe(fact["fk"]), "left")
    return joined.groupBy("nk").agg(F.count("o_orderkey").alias("n_orders"))


@register(
    "events_rolling_dau",
    oracle=f"""
    WITH e AS (SELECT * FROM events WHERE {time_domain_sql()}),
    days AS (
      SELECT DISTINCT
             CAST(floor((epoch_us(ts) // 1000000) / 86400) AS BIGINT) AS day
      FROM e
    ), user_days AS (
      SELECT DISTINCT
             CAST(floor((epoch_us(ts) // 1000000) / 86400) AS BIGINT) AS day,
             user_id
      FROM e
    )
    SELECT d.day,
           count(DISTINCT u.user_id) AS wau
    FROM days d
    JOIN user_days u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the WAU metric. Distinct
    counts do not decompose over sliding windows, so the scalable exact
    shape is: dedup to (day, user) first (the big reduction), then
    ``explode(sequence(day, day+6))`` turns each active day into its 7
    contributing window-days — an EQUI-join shape (VERDICT r02 item 7:
    no broadcast-nested-loop range join, so AQE can rebalance and the
    plan no longer depends on the spine staying tiny). A broadcast
    semi-join against the real-day spine drops phantom trailing days,
    then one distinct-count per window day. The 7x amplification
    applies to the already-deduped pairs, never the raw event log.
    r13 --timeskew: portable-time-domain filter + epoch_us-exact
    oracle day index (double epoch() rounds the last second of 9999
    into the next day)."""
    e = table(spark, sf_dir, "events").filter(in_time_domain(F.col("ts")))
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint")
    user_days = e.select(day.alias("day"), "user_id").distinct()
    days = user_days.select("day").distinct()
    contrib = user_days.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6))).alias("day"),
        "user_id",
    )
    j = contrib.join(F.broadcast(days), "day", "left_semi")
    return j.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))


@register(
    "orders_pareto_share",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(30,2))) AS revenue
      FROM orders GROUP BY o_custkey
    ), tot AS (SELECT sum(revenue) AS t FROM per_cust),
    ranked AS (
      SELECT o_custkey, revenue,
             row_number() OVER (ORDER BY revenue DESC, o_custkey ASC) AS rnk,
             sum(revenue) OVER (ORDER BY revenue DESC, o_custkey ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_revenue
      FROM per_cust
    )
    SELECT rnk, o_custkey,
           round(CAST(revenue AS DOUBLE), 2) AS revenue,
           (floor(CAST(cum_revenue AS DOUBLE) / CAST(t AS DOUBLE)
                  * 10000 + 0.5) / 10000) AS cum_share
    FROM ranked, tot
    WHERE rnk <= 100
    """,
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: top-100 customers by revenue with their
    cumulative share of total — the 80/20 diagnostic. Per-customer
    partial-agg'd decimal sums first (the corpus-sized reduction).
    Scale shape (VERDICT r02 item 3): the top-100 is selected with a
    DISTRIBUTED TakeOrdered (``orderBy().limit(100)`` — per-partition
    top-k, then a 100·P-row merge on the driver side of the exchange),
    and only the surviving 100 rows see the ranked running-sum window.
    The previous formulation ranked ALL customers in one unpartitioned
    window — a single task sorting 1.5B rows at TPC-H 100 TB. The
    grand total still broadcasts from one row. Exact decimal cumulative
    sums divided as doubles keep the share engine-identical."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("revenue")
    )
    tot = per_cust.agg(F.sum("revenue").alias("t"))
    top100 = per_cust.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(100)
    # Unpartitioned window is safe here: input is the 100-row top-k.
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    ranked = top100.withColumn("rnk", F.row_number().over(w)).withColumn(
        "cum_revenue",
        F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "o_custkey",
            exact_round(F.col("revenue").cast("double"), 2).alias("revenue"),
            round_half_up(
                F.col("cum_revenue").cast("double") / F.col("t").cast("double"), 4
            ).alias("cum_share"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           (floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))
                           * CAST(1 - l.l_discount AS DECIMAL(30,2)))
                       AS DOUBLE) * 100 + 0.5) / 100) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(30,2))
                 * CAST(1 - l.l_discount AS DECIMAL(30,2))) DESC,
             c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: top-20 customers by
    revenue lost to returns in one quarter. Shape: the date filter
    prunes orders at the scan, the returnflag filter prunes lineitem
    before their one wide join, revenue is aggregated per o_custkey
    (customer attributes are functionally dependent on the key, so
    attaching them AFTER the aggregate is equivalent), the top-20 is a
    TakeOrdered on the exact decimal sum with custkey tiebreak, and
    only the 20 surviving rows broadcast onto customer and nation —
    customer is never a join build side (at 100 TB it is 1.5B rows;
    the r03 review caught the broadcast(customer) variant)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = F.sum(
        _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    ).alias("rev_dec")
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_custkey").agg(rev)
    )
    # Rank only custkeys that exist in customer (the oracle inner-joins
    # customer BEFORE the limit): a key-only semi-join keeps the top-20
    # oracle-equal even if the generator ever emits orphan orders.
    top = (
        per_cust.join(
            c.select("c_custkey"),
            per_cust.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .orderBy(F.desc("rev_dec"), F.asc("o_custkey"))
        .limit(20)
    )
    return (
        c.join(F.broadcast(top), c.c_custkey == top.o_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            # portable half-up rounding: the exact-decimal sum lands on
            # .xx5 boundaries where round(DOUBLE,2) diverges per engine
            round_half_up(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@register(
    "q18_big_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_epoch,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: orders whose total line
    quantity exceeds 200 units, with their customer. The HAVING
    aggregate reduces lineitem to a tiny qualifying-order set FIRST
    (partial+final agg, one shuffle on orderkey); that set then
    broadcasts onto orders, and the qualifying orders broadcast onto
    customer — the big tables are never join probes of each other.
    Quantities are integral doubles, so the sum and threshold are
    exact."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style conditional aggregation over a fact-fact join
    (shipmode swapped for returnflag — the synthetic lineitem carries
    no shipmode column): urgent vs non-urgent order counts per return
    class for one ship year. The date filter is pushed to the lineitem
    scan; the single wide exchange is the orderkey join; the CASE sums
    partial-aggregate map-side to 3 groups."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q14_RATIO = """100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                      THEN CAST(l.l_extendedprice AS DECIMAL(30,2))
                                           * CAST(1 - l.l_discount AS DECIMAL(30,2))
                                      ELSE CAST(0 AS DECIMAL(30,2)) END) AS DOUBLE)
               / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))
                          * CAST(1 - l.l_discount AS DECIMAL(30,2))) AS DOUBLE)"""


def _q14_oracle() -> str:
    from tiny_etl_multiproc_bigdata_spark.functions.rounding import duck_round

    return f"""
    SELECT {duck_round(_Q14_RATIO, 4)} AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """


@register("q14_promo_revenue_share", oracle=_q14_oracle())
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo-revenue share for one ship month: the
    part dimension broadcasts onto the date-pruned lineitem scan, both
    revenue sums are exact decimals folded in ONE pass (conditional
    aggregation — no second scan, no self-join), and only the final
    ratio touches doubles, micro-rounded half-up on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    zero = F.lit(0).cast("decimal(30,2)")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias(
                "promo"
            ),
            F.sum(rev).alias("total"),
        )
    )
    return agg.select(
        round_half_up(
            F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           (floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))
                           * CAST(1 - l.l_discount AS DECIMAL(30,2)))
                       AS DOUBLE) * 100 + 0.5) / 100) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style cross-border shipping volume: revenue between
    every (supplier nation, customer nation) pair per ship year. All
    four dims broadcast (nation twice under different aliases); the
    only wide exchange is lineitem⋈orders, and the group-by cardinality
    (|nations|² × years) keeps the final aggregate tiny — partial aggs
    do the work map-side. The scale-4 decimal sums land on .xx5 cent
    boundaries, so the rounding is portable half-up on both engines
    (same class q10 hit)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(round_half_up(F.sum(rev).cast("double"), 2).alias("revenue"))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("ship_year").cast("bigint").alias("ship_year"),
            "revenue",
        )
    )


_BASKET_MIN_PAIRS = 3


@register(
    "basket_pair_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
    ), item_freq AS (
      SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS c_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b,
           CAST(p.c_ab AS BIGINT) AS pair_count,
           (floor((CAST(p.c_ab AS DOUBLE) * n.n)
                  / (CAST(fa.c AS DOUBLE) * fb.c) * 10000 + 0.5) / 10000)
             AS lift
    FROM pairs p
    JOIN item_freq fa ON fa.l_partkey = p.part_a
    JOIN item_freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n_orders n
    WHERE p.c_ab >= {_BASKET_MIN_PAIRS}
    """,
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: for part pairs co-occurring in
    >= {MIN} orders, lift = P(ab) / (P(a)·P(b)) — the retail twin of
    pmi_collocations (lift is exp(PMI) on baskets instead of bigram
    streams). Single-expression double ratio of exact integer counts,
    4-dp quantized.

    100 TB shape: the pair stage self-joins the order→item list ON THE
    ORDER KEY, so fan-out is bounded by basket size squared (~7² for
    TPC-H), never corpus²; item frequencies are part-cardinality and
    broadcast into the scoring join. The min-support cut keeps the
    output the interesting tail, and an Apriori-style frequent-item
    pre-filter (join items to item_freq c >= MIN first) drops
    singleton-heavy baskets before pairing at higher scales."""
    li = table(spark, sf_dir, "lineitem")
    # four consumers (n_orders, item_freq, both pair sides) — pin the
    # distinct basket-item table once (r07 plan audit: 5 scans without)
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_orders = items.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n")
    )
    item_freq = items.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= _BASKET_MIN_PAIRS)
    )
    fa = item_freq.select(
        F.col("l_partkey").alias("part_a"), F.col("c").alias("ca")
    )
    fb = item_freq.select(
        F.col("l_partkey").alias("part_b"), F.col("c").alias("cb")
    )
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("bigint").alias("pair_count"),
            round_half_up(
                (F.col("c_ab").cast("double") * F.col("n"))
                / (F.col("ca").cast("double") * F.col("cb")),
                4,
            ).alias("lift"),
        )
    )


_RFM_QS = (0.25, 0.5, 0.75)


@register(
    "rfm_segmentation",
    oracle=f"""
    WITH ref AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS r FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
                            (SELECT r FROM ref)) AS BIGINT)
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), thr AS (
      SELECT
        list_transform(quantile_cont(recency_days,
                                     [{", ".join(map(str, _RFM_QS))}]),
                       x -> floor(x * 10000 + 0.5) / 10000) AS rq,
        list_transform(quantile_cont(frequency,
                                     [{", ".join(map(str, _RFM_QS))}]),
                       x -> floor(x * 10000 + 0.5) / 10000) AS fq,
        list_transform(quantile_cont(monetary_cents,
                                     [{", ".join(map(str, _RFM_QS))}]),
                       x -> floor(x * 10000 + 0.5) / 10000) AS mq
      FROM per_cust
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(1 + len(list_filter(rq, t -> recency_days >= t))
                AS BIGINT) AS r_bucket,
           CAST(1 + len(list_filter(fq, t -> frequency >= t))
                AS BIGINT) AS f_bucket,
           CAST(1 + len(list_filter(mq, t -> monetary_cents >= t))
                AS BIGINT) AS m_bucket
    FROM per_cust, thr
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last order,
    against the dataset's own latest date), frequency (order count) and
    monetary (lifetime cents), each quartile-bucketed 1–4 (1 = lowest
    metric value; invert recency downstream for marketing's
    1-is-recent reading). Buckets come from the two-pass
    percentile-threshold recipe (quantile_bucketize), NOT a global
    ntile window: pass 1 reduces customers to nine scalar thresholds,
    pass 2 broadcasts them back and folds per row — no single-task
    sort of the customer table at any scale. All three metrics are
    exact integers, so only the interpolated thresholds need the 1e-4
    micro-round guard."""
    o = table(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("r"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            )
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.col("r"), F.col("last_d"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    # two consumers (threshold agg + the bucketing select) — pin the
    # customer-cardinality metric table once (r07 plan audit)
    per_cust = per_cust.localCheckpoint(eager=True)
    qs = ", ".join(map(str, _RFM_QS))
    thr = per_cust.agg(
        F.expr(
            f"transform(percentile(recency_days, array({qs})),"
            " x -> floor(x * 10000 + 0.5) / 10000)"
        ).alias("rq"),
        F.expr(
            f"transform(percentile(frequency, array({qs})),"
            " x -> floor(x * 10000 + 0.5) / 10000)"
        ).alias("fq"),
        F.expr(
            f"transform(percentile(monetary_cents, array({qs})),"
            " x -> floor(x * 10000 + 0.5) / 10000)"
        ).alias("mq"),
    )

    def bucket(arr, col):
        return F.expr(
            f"CAST(1 + aggregate({arr}, 0, (acc, t) -> acc + "
            f"CASE WHEN {col} >= t THEN 1 ELSE 0 END) AS BIGINT)"
        )

    return per_cust.crossJoin(F.broadcast(thr)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        bucket("rq", "recency_days").alias("r_bucket"),
        bucket("fq", "frequency").alias("f_bucket"),
        bucket("mq", "monetary_cents").alias("m_bucket"),
    )


# ---- item-item collaborative filtering -----------------------------------

_CF_TOPK = 3


@register(
    "itemcf_topk_similar",
    oracle=f"""
    WITH bp AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT pk, count(*) AS n FROM bp GROUP BY pk),
    co AS (
      SELECT a.pk AS pa, b.pk AS pb, count(*) AS co
      FROM bp a JOIN bp b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    ),
    sym AS (
      SELECT pa, pb, co FROM co
      UNION ALL
      SELECT pb, pa, co FROM co
    ),
    scored AS (
      SELECT s.pa AS item, s.pb AS neighbor,
             CAST(floor(s.co / (sqrt(CAST(na.n AS DOUBLE))
                                * sqrt(CAST(nb.n AS DOUBLE)))
                        * 1000000 + 0.5) AS BIGINT) AS cos_micro
      FROM sym s JOIN n na ON s.pa = na.pk JOIN n nb ON s.pb = nb.pk
    )
    SELECT item, neighbor, cos_micro, rn
    FROM (
      SELECT item, neighbor, cos_micro,
             row_number() OVER (PARTITION BY item
                                ORDER BY cos_micro DESC, neighbor ASC) AS rn
      FROM scored
    ) WHERE rn <= {_CF_TOPK}
    """,
)
def itemcf_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al. 2001 /
    Amazon's item-to-item): cosine similarity between parts over
    binary co-purchase vectors — co(a,b)/√(n_a·n_b) — with the top-{K}
    neighbors per item (the precomputed neighborhood table an online
    recommender serves from). The pair stage joins order-basket
    postings with itself, so fan-out is bounded by basket size² per
    order, never |items|² (the basket_pair_lift shape, ranked); the
    similarity quantizes to integer micro-units for a deterministic
    (cos DESC, neighbor ASC) rank; top-{K} via WindowGroupLimit.

    100 TB shape: baskets dedupe map-side; co-counts partial-agg on
    the pair key; item norms broadcast back; per-item ranking is
    per-partition top-k heaps, no global sort. Hot items (in every
    basket) are the known skew axis — production caps basket size or
    samples hot items, the df-cap lever documented in
    dedup_ngram_jaccard."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    li = li.localCheckpoint(eager=True)  # feeds counts AND the pair join
    n = li.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    a = li.select(F.col("ok"), F.col("pk").alias("pa"))
    b = li.select(F.col("ok"), F.col("pk").alias("pb"))
    # The basket self-join must never broadcast: both sides are the full
    # postings table (a raised local threshold would otherwise broadcast
    # one side — the r13 6M-row hazard). r14 (VERDICT item 7): the r13
    # shuffle_hash hint pinned a build side that is NOT |V|-bounded —
    # the build partition holds |postings|/P rows, which at 100 TB can
    # exceed task memory (SHJ builds don't spill). The merge hint keeps
    # the never-broadcast guarantee with the one join that spills
    # gracefully at any per-partition size, and the paired sf1 A/B
    # favors it here too (pooled median ~11.8s vs ~15.5s over 2×4
    # interleaved runs): the per-partition hash build of millions of
    # basket rows was costing more than the SMJ sorts.
    co = (
        a.hint("merge").join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    # cos(a,b) is symmetric (sqrt(na)*sqrt(nb) commutes exactly in IEEE),
    # so score each unordered pair ONCE and emit both directions with a
    # map-side explode; a union of co + swapped co would re-evaluate the
    # whole pair join+aggregate pipeline, one pass per branch.
    scored_once = (
        co.join(F.broadcast(n.withColumnRenamed("pk", "pa")
                            .withColumnRenamed("n", "na")), "pa")
        .join(F.broadcast(n.withColumnRenamed("pk", "pb")
                          .withColumnRenamed("n", "nb")), "pb")
        .select(
            F.col("pa"),
            F.col("pb"),
            F.floor(
                F.col("co")
                / (F.sqrt(F.col("na").cast("double"))
                   * F.sqrt(F.col("nb").cast("double")))
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cos_micro"),
        )
    )
    scored = scored_once.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("item"),
                    F.col("pb").alias("neighbor"),
                    F.col("cos_micro"),
                ),
                F.struct(
                    F.col("pb").alias("item"),
                    F.col("pa").alias("neighbor"),
                    F.col("cos_micro"),
                ),
            )
        ).alias("e")
    ).select("e.item", "e.neighbor", "e.cos_micro")
    wr = Window.partitionBy("item").orderBy(
        F.desc("cos_micro"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _CF_TOPK)
        .select("item", "neighbor", "cos_micro", "rn")
    )


# ---- Apriori frequent brand triples --------------------------------------


@register(
    "apriori_brand_triples",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items),
    tri AS (
      SELECT a.b AS brand_a, bb.b AS brand_b, c.b AS brand_c,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM items a
      JOIN items bb ON a.ok = bb.ok AND a.b < bb.b
      JOIN items c  ON a.ok = c.ok  AND bb.b < c.b
      GROUP BY 1, 2, 3
    )
    SELECT t.brand_a, t.brand_b, t.brand_c, t.n_orders,
           (floor(CAST(t.n_orders AS DOUBLE) / nb.n * 1000000 + 0.5)
            / 1000000) AS support
    FROM tri t CROSS JOIN nb
    ORDER BY t.n_orders DESC, t.brand_a ASC, t.brand_b ASC, t.brand_c ASC
    LIMIT 20
    """,
)
def apriori_brand_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemset mining over brand-level baskets (Agrawal &
    Srikant 1994): orders become sets of distinct part brands, and the
    top-20 brand triples by basket support are reported — the next
    rung of the association ladder above basket_pair_lift's pairs.
    Top-k-by-support replaces a fixed min-support cut because uniform
    TPC-H brands concentrate support tightly around C(|basket|,3)/2300
    as baskets accumulate: any absolute threshold is either vacuous or
    all-pass depending on scale, while the ranking (count DESC, brand
    triple ASC — fully deterministic) is meaningful at every sf. Brand
    baskets cap the item alphabet at 25, which bounds per-basket
    triple fan-out at C(|basket brands|,3) and the candidate space at
    C(25,3) rows.

    100 TB shape: the brand dimension broadcasts onto lineitem; the
    deduped basket table is pinned once for its three self-join arms
    (all shuffling on the SAME order key, so AQE co-locates them); the
    triple count partial-aggs on a key space bounded by 2300. The
    Apriori anti-monotone prune (drop items below threshold before
    pairing) is a no-op at alphabet 25 but is the documented lever when
    mining at partkey granularity — see basket_pair_lift."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # three join arms + the basket count
    )
    nb = items.agg(F.count_distinct("ok").cast("bigint").alias("n"))
    a = items.select("ok", F.col("b").alias("brand_a"))
    b2 = items.select("ok", F.col("b").alias("brand_b"))
    c3 = items.select("ok", F.col("b").alias("brand_c"))
    tri = (
        a.join(b2, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .join(c3, "ok")
        .where(F.col("brand_b") < F.col("brand_c"))
        .groupBy("brand_a", "brand_b", "brand_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    return (
        tri.crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "brand_c",
            "n_orders",
            round_half_up(
                F.col("n_orders").cast("double") / F.col("n"), 6
            ).alias("support"),
        )
        .orderBy(
            F.desc("n_orders"),
            F.asc("brand_a"),
            F.asc("brand_b"),
            F.asc("brand_c"),
        )
        .limit(20)
    )


# ---- Gini coefficient over the value histogram ---------------------------


@register(
    "gini_acctbal_concentration",
    oracle="""
    WITH cents AS (
      SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
      FROM customer
    ),
    hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM cents GROUP BY v),
    pre AS (
      SELECT v, c,
             COALESCE(sum(c) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM hist
    ),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(v * c) AS BIGINT) AS s,
             CAST(sum(v * (2 * c * below + c * (c + 1))) AS BIGINT) AS a2
      FROM pre
    )
    SELECT n,
           (floor(CAST(s AS DOUBLE) / n + 0.5) / 100) AS mean_acctbal,
           (floor((CAST(a2 AS DOUBLE) - (n + 1) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) * 10000 + 0.5)
            / 10000) AS gini
    FROM agg
    """,
)
def gini_acctbal_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer account balances — the
    inequality statistic behind every concentration dashboard
    (orders_pareto_share shows the top of the Lorenz curve; this is its
    integral). Computed WITHOUT ranking individual rows: balances
    quantize to cents, aggregate to a value HISTOGRAM, and the grouped
    rank-sum identity Σᵢ i·xᵢ = Σ_v v·(c_v·B_v + c_v(c_v+1)/2) (B_v =
    count below v) turns the classic G = (2Σi·xᵢ − (n+1)S)/(nS) into
    integer arithmetic over |distinct cents| rows — the roc_auc_eval
    midrank trick applied to inequality measurement. a2 carries the
    2×-scaled rank sum so everything stays bigint until the final
    quantized division.

    100 TB shape: one partial-agg'd histogram shuffle over a key space
    bounded by the representable cents range (~1.1M values for TPC-H
    acctbal), one ordered prefix window over that bounded table, one
    scalar aggregate. No global row sort ever happens — the exact
    failure mode the orders_pareto_share docstring warns about.
    Negative balances are included; S >> 0 keeps the denominator
    meaningful (documented, not guarded)."""
    c = table(spark, sf_dir, "customer")
    cents = c.select(
        exact_round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v")
    )
    hist = cents.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pre = hist.withColumn(
        "below", F.coalesce(F.sum("c").over(wb), F.lit(0))
    )
    agg = pre.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("bigint").alias("s"),
        F.sum(
            F.col("v")
            * (
                2 * F.col("c") * F.col("below")
                + F.col("c") * (F.col("c") + 1)
            )
        )
        .cast("bigint")
        .alias("a2"),
    )
    return agg.select(
        "n",
        (
            F.floor(F.col("s").cast("double") / F.col("n") + F.lit(0.5))
            / F.lit(100)
        ).alias("mean_acctbal"),
        round_half_up(
            (
                F.col("a2").cast("double")
                - (F.col("n") + 1) * F.col("s").cast("double")
            )
            / (F.col("n").cast("double") * F.col("s").cast("double")),
            4,
        ).alias("gini"),
    )


# ---- Herfindahl market concentration per nation --------------------------


@register(
    "hhi_supplier_concentration",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nation, s.s_suppkey,
             CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS r
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT nation, CAST(sum(r) AS BIGINT) AS rt,
             CAST(count(*) AS BIGINT) AS n_suppliers
      FROM rev GROUP BY 1
    ),
    terms AS (
      SELECT r.nation, t.n_suppliers,
             CAST(floor(
               (CAST(r.r AS DOUBLE) / CAST(t.rt AS DOUBLE))
               * (CAST(r.r AS DOUBLE) / CAST(t.rt AS DOUBLE))
               * 100000000 + 0.5) AS BIGINT) AS h_e8
      FROM rev r JOIN tot t ON r.nation = t.nation
    )
    SELECT CAST(nation AS BIGINT) AS nationkey, n_suppliers,
           CAST(sum(h_e8) AS BIGINT) AS hhi_e8
    FROM terms GROUP BY nation, n_suppliers
    """,
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration
    within each nation: HHI = Σ share², share = supplier revenue /
    nation revenue — the antitrust-standard concentration number
    (1e8-scaled: 1e8 = monopoly, ~0 = atomistic), sibling of
    gini_acctbal_concentration and orders_pareto_share in the
    market-structure tier. Revenue sums are exact integer cents; each
    share² term is a fixed two-op IEEE expression on exact operands
    (identical on both engines) quantized to 1e-8 units BEFORE the
    per-nation sum, so accumulation order is irrelevant.

    100 TB shape: one partial-agg'd groupBy to supplier grain (the only
    corpus-scale shuffle), nation totals from the supplier-grain table,
    broadcast back, and the HHI sum runs over |suppliers| rows grouped
    into 25 nations."""
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            "s_suppkey",
        )
        .agg(
            F.sum(
                exact_round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("r")
        )
    )
    tot = rev.groupBy(F.col("nation").alias("t_nation")).agg(
        F.sum("r").cast("bigint").alias("rt"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    share = F.col("r").cast("double") / F.col("rt").cast("double")
    terms = rev.join(
        F.broadcast(tot), rev.nation == F.col("t_nation")
    ).select(
        "nation",
        "n_suppliers",
        F.floor(share * share * 100_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("h_e8"),
    )
    return terms.groupBy(
        F.col("nation").cast("bigint").alias("nationkey"), "n_suppliers"
    ).agg(F.sum("h_e8").cast("bigint").alias("hhi_e8"))


# ---- association rules with confidence/lift --------------------------------

_RULES_TOPK = 20


@register(
    "association_rules_confidence",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items),
    singles AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY b
    ),
    pairs AS (
      SELECT a.b AS antecedent, bb.b AS consequent,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM items a JOIN items bb ON a.ok = bb.ok AND a.b <> bb.b
      GROUP BY 1, 2
    )
    SELECT p.antecedent, p.consequent, p.c_ab,
           (floor(CAST(p.c_ab AS DOUBLE) / sa.c * 10000 + 0.5) / 10000)
             AS confidence,
           (floor(CAST(p.c_ab AS DOUBLE) * nb.n
                  / (CAST(sa.c AS DOUBLE) * sc.c) * 10000 + 0.5) / 10000)
             AS lift
    FROM pairs p
    JOIN singles sa ON p.antecedent = sa.b
    JOIN singles sc ON p.consequent = sc.b
    CROSS JOIN nb
    ORDER BY (floor(CAST(p.c_ab AS DOUBLE) / sa.c * 10000 + 0.5) / 10000)
             DESC, p.antecedent ASC, p.consequent ASC
    LIMIT {_RULES_TOPK}
    """,
)
def association_rules_confidence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Directed association rules antecedent -> consequent over brand
    baskets, ranked by confidence = P(B|A) with lift attached — the
    step after apriori_brand_triples' frequent itemsets (support finds
    WHAT co-occurs; confidence/lift decide which DIRECTION is worth
    acting on, since rules are asymmetric: c_ab/c_a != c_ab/c_b).
    Ordered pairs (A != B) rather than unordered, because a rule and
    its converse differ. Deterministic top-{_RULES_TOPK} on the
    QUANTIZED confidence (the same value the output carries, so the
    cut cannot disagree with the displayed ranking), tie-broken by
    rule.

    100 TB shape: basket dedup is the corpus shuffle; the ordered-pair
    self-join fans out within baskets bounded by the 25-brand
    alphabet; singles broadcast back onto the C(25,2)x2 rule table."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # consumers: nb, singles, 2 pair arms
    )
    nb = items.agg(F.count_distinct("ok").cast("bigint").alias("n"))
    singles = items.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = items.select("ok", F.col("b").alias("antecedent"))
    b2 = items.select("ok", F.col("b").alias("consequent"))
    pairs = (
        a.join(b2, "ok")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    sa = singles.select(
        F.col("b").alias("antecedent"), F.col("c").alias("c_a")
    )
    sc = singles.select(
        F.col("b").alias("consequent"), F.col("c").alias("c_c")
    )
    conf_q = round_half_up(
        F.col("c_ab").cast("double") / F.col("c_a"), 4
    )
    return (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "c_ab",
            conf_q.alias("confidence"),
            round_half_up(
                F.col("c_ab").cast("double")
                * F.col("n")
                / (F.col("c_a").cast("double") * F.col("c_c")),
                4,
            ).alias("lift"),
        )
        .orderBy(
            F.desc("confidence"), F.asc("antecedent"), F.asc("consequent")
        )
        .limit(_RULES_TOPK)
    )


# ---- hierarchical revenue shares --------------------------------------------


@register(
    "revenue_share_hierarchy",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, revenue_cents,
           (floor(CAST(revenue_cents AS DOUBLE)
                  / sum(revenue_cents) OVER (PARTITION BY region)
                  * 10000 + 0.5) / 10000) AS share_of_region,
           (floor(CAST(revenue_cents AS DOUBLE)
                  / sum(revenue_cents) OVER ()
                  * 10000 + 0.5) / 10000) AS share_of_total
    FROM rev
    """,
)
def revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent drill-down: each nation's revenue as a fraction
    of its region and of the world — the percent-of-total report
    every OLAP hierarchy renders (agg_rollup gives the subtotals;
    this gives the RATIOS between levels, which rollup alone doesn't).
    Exact integer revenue; both shares are single divisions against
    window totals of the dimension-sized result.

    100 TB shape: the fact-side join broadcasts the nation/region
    dimensions onto lineitem->orders->customer (the q5 shape), one
    partial-agg'd groupBy to the 25-nation grain, and both share
    windows run over that tiny table."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                exact_round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents")
        )
    )
    wr = Window.partitionBy("region")
    wg = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        "revenue_cents",
        round_half_up(
            F.col("revenue_cents").cast("double")
            / F.sum("revenue_cents").over(wr),
            4,
        ).alias("share_of_region"),
        round_half_up(
            F.col("revenue_cents").cast("double")
            / F.sum("revenue_cents").over(wg),
            4,
        ).alias("share_of_total"),
    )


@register(
    "setop_all_variants",
    oracle="""
    SELECT 'except_all' AS op, qty
    FROM (
      SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'
    )
    UNION ALL
    SELECT 'intersect_all', qty
    FROM (
      SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'
    )
    """,
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL —
    which keep multiplicities: a quantity value occurring 100x among
    returned-'R' lines and 70x among 'A' lines yields 30 surplus rows
    from EXCEPT ALL and 70 matched rows from INTERSECT ALL. The
    DISTINCT variants (setop_except / setop_intersect) answer "which
    values"; the ALL variants answer "how MUCH overlap" — the
    difference that matters when reconciling row-level extracts
    (missing-rows audits) rather than domains. Spark's exceptAll /
    intersectAll lower to count-per-key generate-replication plans;
    both branches are tagged and unioned so one entry pins both
    semantics.

    100 TB shape: each ALL-variant is one shuffle on the compared
    columns with per-key counts folded map-side (the generated rows
    re-expand from counts, never by carrying raw rows through the
    join)."""
    li = table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_quantity").cast("bigint").alias("qty")
    )
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_quantity").cast("bigint").alias("qty")
    )
    ex = r.exceptAll(a).select(
        F.lit("except_all").alias("op"), "qty"
    )
    ia = r.intersectAll(a).select(
        F.lit("intersect_all").alias("op"), "qty"
    )
    return ex.unionAll(ia)


@register(
    "orders_aging_buckets",
    oracle="""
    WITH snap AS (SELECT max(o_orderdate) AS today FROM orders),
    v AS (
      SELECT CAST(date_diff('day', o_orderdate, snap.today) AS BIGINT)
               AS age_days,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders, snap WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 90 THEN '31-90'
                WHEN age_days <= 365 THEN '91-365'
                ELSE '365+' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_open,
           CAST(sum(cents) AS BIGINT) AS open_cents
    FROM v GROUP BY 1
    """,
)
def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report (the receivables-aging shape): bucket
    every still-open order by its age at the snapshot date — which is
    max(o_orderdate), an aggregate broadcast, never a driver-side
    now() that would make the result non-reproducible. Bucket
    boundaries are closed-open on exact integer day counts; amounts
    are exact cents. Ubiquitous in finance/ops reporting and a
    deliberate contrast with half_life_weighted_revenue: same age
    arithmetic, discrete buckets instead of continuous decay.

    100 TB shape: one scan with the status filter pushed to the
    parquet scan, a broadcast scalar, a 4-key map-side-combined
    fold."""
    o = table(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("today"))
    v = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            F.datediff("today", "o_orderdate")
            .cast("bigint")
            .alias("age_days"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return v.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_open"),
        F.sum("cents").cast("bigint").alias("open_cents"),
    )
