"""TPC-H adaptations, round 4: the subquery-shaped quartet (Q4 EXISTS,
Q13 outer-join distribution, Q16 NOT-IN anti-join, Q17 correlated
scalar) plus Q19 disjunctive pushdown, Q22 NOT-EXISTS with a global
threshold, and the Q2-style argmin join-back.

The reference engine exposes none of these shapes natively — its SQL
surface lives downstream in MySQL (example/readme.md:41-69) — so, as
with plans/relational.py, this module is where the engine's relational
breadth is surfaced Spark-first. Schemas are adapted to the fixture
tables (no partsupp: lineitem serves as the part↔supplier link; no
phone column: cntrycode derives from c_nationkey).

Numeric determinism follows the repo-wide recipe: DECIMAL(30,2) sums,
cast back to DOUBLE, round_half_up to a fixed scale (see
plans/relational.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
    duck_round,
    round_half_up,
)
from tiny_etl_multiproc_bigdata_spark.plans.registry import register
from tiny_etl_multiproc_bigdata_spark.plans.relational import _dec


def _rev() -> F.Column:
    """Discounted revenue l_extendedprice·(1−l_discount) as exact
    DECIMAL(30,2)×DECIMAL(30,2) — the determinism-sensitive expression
    shared by q8/q9/q15/q19; defined once so a precision-recipe change
    cannot drift between them (r05 review)."""
    return _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): EXISTS decorrelates to a
    LEFT SEMI join with a non-equi residual. The date filter prunes the
    orders scan first; the semi join shuffles both facts on orderkey —
    at 100 TB both sides would be bucketed on orderkey, making this a
    co-located join with no exchange."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left outer join
    with a filtered ON clause (customers with zero qualifying orders
    must survive with c_count = 0), then a second aggregation over the
    first's output. Two shuffles total — custkey, then c_count (tiny
    domain, map-side combine collapses it)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adaptation (lineitem as the part↔supplier link):
    NOT IN over a key subquery (s_suppkey is non-null, so NOT IN is a
    plain anti join — with nullable keys it would need the null-aware
    variant) plus COUNT(DISTINCT). The excluded-supplier set is tiny →
    broadcast anti join; part is dim-sized → broadcast equi join; the
    only shuffle is the distinct aggregation."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3") & (~F.col("p_type").like("PROMO%"))
    ).select("p_partkey", "p_brand", "p_type")
    bad_supp = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {duck_round("CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0", 2)}
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                      / count(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): a correlated scalar
    subquery per part, decorrelated into a per-part aggregate joined
    back. The per-part averages are |parts-of-brand| rows → broadcast;
    lineitem is scanned twice (once for thresholds, once for revenue) —
    at 100 TB the threshold pass is the cheap one (two columns, partial
    agg). The threshold uses the exact decimal-sum/count form so both
    engines compute the identical double."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    # per-part avg over ALL lineitem rows of that part (matches the
    # correlated subquery, which is not brand-filtered). The semi join
    # runs BEFORE the groupBy: a part's average over its own rows is
    # unchanged by dropping other parts' rows, and pruning first keeps
    # the threshold shuffle to brand-part rows only instead of
    # aggregating every partkey and discarding ~97% (r05 review).
    thresholds = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey")
        .agg(
            (
                F.lit(0.2)
                * (F.sum(_dec("l_quantity")).cast("double") / F.count("*"))
            ).alias("qty_cap")
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(thresholds.withColumnRenamed("l_partkey", "t_partkey")),
            F.col("l_partkey") == F.col("t_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            round_half_up(
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {duck_round("CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2)) * CAST(1 - l_discount AS DECIMAL(30,2))) AS DOUBLE)", 2)}
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): an OR of
    three brand/size/quantity bundles mixing both join sides. Catalyst
    extracts the per-side implied disjunctions (p_brand IN (...),
    p_size <= 35, quantity bounds) and pushes them below the join, so
    the broadcast hash join sees pre-filtered inputs instead of
    evaluating the full OR against the raw cross-product."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bundle = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(bundle).agg(
        round_half_up(F.sum(_rev()).cast("double"), 2).alias("revenue")
    )


@register(
    "q22_idle_customers",
    oracle=f"""
    SELECT cntrycode, count(*) AS numcust,
           {duck_round("CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)", 2)}
             AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    )
    GROUP BY cntrycode
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): rich customers with no
    urgent orders (every fixture customer has SOME order, so the
    original "no orders at all" predicate would be vacuous — the
    filtered NOT EXISTS keeps the same plan shape non-trivially).
    Three classic shapes in one: an uncorrelated scalar subquery
    (global average → broadcast 1-row cross join), NOT EXISTS (left
    anti join on custkey), and a derived grouping key (cntrycode from
    c_nationkey, standing in for the phone prefix). The anti join
    probes the filtered orders' custkey set — at 100 TB that side
    would be reduced to distinct custkeys first and bloom-pruned."""
    c = table(spark, sf_dir, "customer")
    avg_pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("thresh")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    rich = (
        c.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
    )
    return (
        rich.select(
            F.pmod(F.col("c_nationkey"), F.lit(5)).cast("bigint").alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            round_half_up(F.sum(_dec("c_acctbal")).cast("double"), 2).alias(
                "totacctbal"
            ),
        )
    )


@register(
    "q2_min_acctbal_supplier",
    oracle="""
    SELECT n_name, s_suppkey, s_name, s.s_acctbal
    FROM supplier s
    JOIN nation ON s.s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s.s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier, adapted to the fixture
    schema): a correlated MIN subquery decorrelated into a per-group
    aggregate joined back on (group, value) — the argmin-with-ties
    pattern. MIN over doubles is exact (no accumulation), so the
    equality join-back is safe cross-engine. All three non-fact inputs
    are dim-sized → every join broadcasts; zero wide shuffles."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    mins = s.groupBy(F.col("s_nationkey").alias("m_nationkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(mins),
            (F.col("s_nationkey") == F.col("m_nationkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           (floor(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                                THEN rev ELSE CAST(0 AS DECIMAL(30,4)) END)
                       AS DOUBLE)
                  / CAST(sum(rev) AS DOUBLE) * 1000000 + 0.5) / 1000000)
             AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(30,2))
               * CAST(1 - l.l_discount AS DECIMAL(30,2)) AS rev,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey = c.c_custkey
      JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
      JOIN region rc   ON nc.n_regionkey = rc.r_regionkey
      JOIN supplier s  ON l.l_suppkey = s.s_suppkey
      JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
      JOIN part p      ON l.l_partkey = p.p_partkey
      WHERE rc.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's revenue share of
    a region's market per year — the conditional-ratio aggregation over
    a six-way join. Every dimension (customer, both nation roles,
    region, supplier, part) broadcasts; the only wide shuffle is
    lineitem⋈orders on orderkey, and BOTH its inputs are pre-pruned by
    their broadcast filters first (p_type cuts lineitem ~6×, the
    customer→nation→region='ASIA' chain cuts orders ~5×) — Catalyst
    without CBO stats executes inner joins in written order, so the
    selective broadcasts must precede the shuffle join in code (r05
    review). The share is a single double division of two exact decimal
    sums → bit-identical cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rc = r.filter(F.col("r_name") == "ASIA").select("r_regionkey")
    rev = _rev().alias("rev")
    li_pruned = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select("l_orderkey", rev, "supp_nation")
    )
    o_pruned = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(rc), F.col("nc_region") == F.col("r_regionkey"))
        .select("o_orderkey", "o_orderdate")
    )
    base = li_pruned.join(
        o_pruned, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        "rev",
        "supp_nation",
    )
    zero = F.lit(0).cast("decimal(30,4)")
    return base.groupBy("o_year").agg(
        round_half_up(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("rev")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, o_year,
           {duck_round("CAST(sum(profit) AS DOUBLE)", 2)} AS sum_profit
    FROM (
      SELECT ns.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(30,2))
               * CAST(1 - l.l_discount AS DECIMAL(30,2))
             - CAST(p.p_retailprice AS DECIMAL(30,2))
               * CAST(l.l_quantity AS DECIMAL(30,2)) AS profit
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE '%ol%'
    )
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit, adapted: retailprice·quantity
    stands in for ps_supplycost·quantity): profit rollup by supplier
    nation × order year over a LIKE-filtered part subset. The LIKE
    filter prunes part before its broadcast, and the broadcast joins
    run BEFORE the lineitem⋈orders shuffle so the part prune shrinks
    the only wide exchange (written join order is executed order
    without CBO stats — r05 review); profit is exact decimal
    arithmetic per row, summed exactly, rounded once at the end."""
    return q9_from_tables(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "part"),
    )


def q9_from_tables(li, orders, supplier, nation, part) -> DataFrame:
    """The Q9 plan over caller-supplied tables — split out so bench.py
    can amplify the lineitem side (unioned scans) against single-read
    dims while driving the identical join tree."""
    o = orders.select("o_orderkey", "o_orderdate")
    s = supplier.select("s_suppkey", "s_nationkey")
    ns = nation.select("n_nationkey", "n_name")
    p = part.filter(F.col("p_name").like("%ol%")).select(
        "p_partkey", "p_retailprice"
    )
    # r13: profit in integer 1e-4 units (exact; relational._cents) —
    # the decimal lowering paid four BigDecimal casts + two wide
    # products per row. (nation, year) groups are unbounded at scale,
    # so the fold is two-level like q1: per-partition long partials,
    # exact DECIMAL(38,0) totals, ONE decimal→double conversion per
    # group (same rational → same double as the old plan).
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    units = (
        cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
        - cents("p_retailprice") * cents("l_quantity")
    ).alias("u")
    part_sums = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == ns.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            units,
        )
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "nation", "o_year")
        .agg(F.sum("u").alias("pu"))
    )
    tot = part_sums.groupBy("nation", "o_year").agg(
        F.sum(F.col("pu").cast("decimal(38,0)")).alias("tu")
    )
    return tot.select(
        "nation",
        "o_year",
        round_half_up(
            (F.col("tu") / F.lit(10_000)).cast("double"), 2
        ).alias("sum_profit"),
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(30,2))
                 * CAST(1 - l_discount AS DECIMAL(30,2))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {duck_round("CAST(total_revenue AS DOUBLE)", 2)} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a per-supplier revenue view consumed
    twice — once for the global max (1-row broadcast), once for the
    equality filter. The view is computed ONCE and persisted only
    logically (Catalyst reuses the subplan under AQE; at 100 TB an
    explicit cache or a two-pass TakeOrdered(1)-with-ties would pin
    it). Revenue stays DECIMAL through the max/equality — exact, so
    the argmax-with-ties equality is safe — and rounds to double only
    in the final projection."""
    li = table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            round_half_up(F.col("total_revenue").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders o
    WHERE s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted to
    shipdate-vs-orderdate lateness): the double-correlation shape —
    EXISTS (another supplier participated in the order) plus NOT EXISTS
    (no OTHER supplier was also late). Decorrelated as a semi join and
    an anti join against per-order supplier aggregates on the same
    key, so all three correlations ride ONE orderkey shuffle
    partitioning. The NOT EXISTS depends on the outer row's suppkey
    (l3.suppkey <> l1.suppkey), so the anti side pre-aggregates late
    suppliers per order: another-late-supplier exists iff the order's
    late-supplier count > 1 (the outer row itself is late)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # INTERVAL add (not date_add) so time-of-day survives if a future
    # fixture vintage ships intraday o_orderdate — matches the oracle's
    # `+ INTERVAL 60 DAY` exactly regardless of alignment.
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    # per-order facts: distinct suppliers, distinct LATE suppliers
    per_order = (
        late.groupBy(F.col("l_orderkey").alias("lo_key"))
        .agg(F.countDistinct("l_suppkey").alias("n_late_supps"))
    )
    multi_supp = (
        li.groupBy(F.col("l_orderkey").alias("ms_key"))
        .agg(F.countDistinct("l_suppkey").alias("n_supps"))
        .filter(F.col("n_supps") > 1)
        .select("ms_key")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    waiting = (
        late
        # EXISTS another supplier in the order
        .join(multi_supp, F.col("l_orderkey") == F.col("ms_key"), "left_semi")
        # NOT EXISTS another LATE supplier ⇔ this order has exactly one
        .join(per_order, F.col("l_orderkey") == F.col("lo_key"))
        .filter(F.col("n_late_supps") == 1)
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(30,2))
                 * CAST(l_quantity AS DECIMAL(30,2))) AS value
      FROM lineitem GROUP BY l_partkey
    ), tot AS (
      SELECT CAST(sum(value) AS DOUBLE) AS total FROM pv
    )
    SELECT l_partkey,
           {duck_round("CAST(value AS DOUBLE)", 2)} AS part_value
    FROM pv, tot
    WHERE CAST(value AS DOUBLE) > total * 0.0008
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock, adapted: no partsupp table, so
    extendedprice·quantity over lineitem stands in for
    supplycost·availqty): a grouped value rollup kept only where the
    group exceeds a FRACTION of the global total — the HAVING-against-
    scalar-subquery shape. The global total is the 1-row result of
    re-aggregating the per-part aggregate (no second fact scan),
    broadcast into the filter; exact decimal sums both levels, one
    double comparison. At 100 TB: one partkey shuffle, a 1-row
    broadcast, zero extra passes."""
    li = table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("value")
    )
    tot = pv.agg(F.sum("value").cast("double").alias("total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value").cast("double") > F.col("total") * 0.0008)
        .select(
            "l_partkey",
            round_half_up(F.col("value").cast("double"), 2).alias(
                "part_value"
            ),
        )
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_quantity AS DECIMAL(30,2))) AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%ol%')
      GROUP BY l_suppkey, l_partkey
    ), pt AS (
      SELECT l_partkey, sum(qty) AS part_total, count(*) AS n_supp
      FROM sp GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
    JOIN sp ON sp.l_suppkey = s_suppkey
    JOIN pt ON pt.l_partkey = sp.l_partkey
    WHERE CAST(sp.qty AS DOUBLE) * pt.n_supp
          > 4.0 * CAST(pt.part_total AS DOUBLE)
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-supply suppliers, adapted: shipped
    quantity per (supplier, part) stands in for ps_availqty): keep a
    nation's suppliers who DOMINATE the supply of some LIKE-filtered
    part — a correlated quantity comparison against a per-part
    aggregate, decorrelated onto the (supplier, part) rollup's own
    partkey re-aggregation, then the supplier/nation dim chain. The
    dominance test is RELATIVE (ships > 4× the part's average supplier
    share: qty·n_supp > 4·total — scale-invariant where an absolute
    fraction would go vacuous as supplier counts grow; selects ~25% of
    suppliers at sf0.01). Both aggregates ride one partkey-compatible
    shuffle tree; part and the dims broadcast; DISTINCT collapses
    multi-part qualifiers. BOTH aggregation levels sum exact decimals
    (a double re-sum would be accumulation-order-sensitive — r05
    review); doubles appear only as single casts of the exact values
    inside the final comparison."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%ol%")
    ).select("p_partkey")
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    ).select("n_nationkey")
    sp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    pt = sp.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("qty").alias("part_total"),
        F.count("*").alias("n_supp"),
    )
    excess = (
        sp.join(pt, sp.l_partkey == F.col("pt_key"))
        .filter(
            F.col("qty").cast("double") * F.col("n_supp")
            > F.lit(4.0) * F.col("part_total").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
