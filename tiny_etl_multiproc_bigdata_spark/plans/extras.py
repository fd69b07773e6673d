"""Remaining function-surface coverage: conditional aggregation,
LIKE/regexp predicates, first/last/nth window values, union-by-name,
null-handling scalars, date arithmetic, and an event-sequence (funnel)
query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.functions.ordering import (
    event_time_order,
)
from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.jsonpath import (
    duck_json_string,
)
from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
    exact_round,
    round_half_up,
)
from tiny_etl_multiproc_bigdata_spark.plans.registry import register


@register(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25)             AS n_bulk,
           count(*) FILTER (WHERE l_discount = 0)              AS n_undiscounted,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2)))
                      FILTER (WHERE l_tax > 0.05) AS DOUBLE), 2) AS taxed_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count_if): one scan,
    many predicates — instead of N filtered sub-queries."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.count_if(F.col("l_discount") == 0).alias("n_undiscounted"),
        exact_round(
            F.sum(
                F.when(
                    F.col("l_tax") > 0.05,
                    F.col("l_extendedprice").cast("decimal(30,2)"),
                )
            ).cast("double"),
            2,
        ).alias("taxed_price"),
    )


@register(
    "string_predicates",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%ol%' AND regexp_matches(p_type, '^(STANDARD|SMALL)')
      AND p_brand NOT LIKE 'Brand#4%'
    """,
)
def string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / regexp predicates — LIKE pushes to the scan as
    StringContains/StartsWith."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%ol%")
        & F.col("p_type").rlike("^(STANDARD|SMALL)")
        & ~F.col("p_brand").like("Brand#4%")
    ).select("p_partkey", "p_name")


@register(
    "window_first_last_nth",
    oracle="""
    SELECT user_id, event_id,
           first_value(event_type) OVER w AS first_event,
           last_value(event_type)  OVER (PARTITION BY user_id
                                         ORDER BY ts ASC, event_id ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_event,
           nth_value(event_type, 2) OVER w AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(*event_time_order())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_event"),
        F.last("event_type").over(w).alias("last_event"),
        F.nth_value("event_type", 2).over(w).alias("second_event"),
    )


@register(
    "union_by_name",
    oracle="""
    SELECT nationkey, acctbal, kind FROM (
      SELECT c_nationkey AS nationkey, round(c_acctbal, 2) AS acctbal,
             'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, round(s_acctbal, 2) AS acctbal,
             'supplier' AS kind FROM supplier
    )
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union regardless of column order —
    the safe union for evolving pipelines."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        exact_round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),  # different column order on purpose
        exact_round("s_acctbal", 2).alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return c.unionByName(s).select("nationkey", "acctbal", "kind")


@register(
    "null_handling_scalars",
    oracle=f"""
    SELECT event_id,
           coalesce({duck_json_string("props", "$.missing")}, 'absent') AS with_default,
           nullif(event_type, 'error')                                 AS non_error_type,
           CASE WHEN value IS NULL THEN -1 ELSE round(value, 2) END    AS value_or_flag,
           ({duck_json_string("props", "$.k")} IS NOT NULL)            AS has_k
    FROM events WHERE event_id < 300
    """,
)
def null_handling_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event_id<300 slice excludes the --jsonedge spike rows, but
    the oracle still rides the jsonpath string contract
    (functions/jsonpath.py): Spark's get_json_object is lenient
    (malformed props → NULL → 'absent') while ungated
    json_extract_string raises — the gate keeps the semantics
    filter-independent."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return e.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.missing"), F.lit("absent")
        ).alias("with_default"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("non_error_type"),
        F.when(F.col("value").isNull(), F.lit(-1.0))
        .otherwise(exact_round("value", 2))
        .alias("value_or_flag"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR)      AS order_day,
           CAST(strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS VARCHAR)
                                                                    AS due_day,
           CAST(date_diff('day', DATE '2024-01-01', o_orderdate) AS BIGINT)
                                                                    AS days_since_2024
    FROM orders WHERE o_orderkey < 2000
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + formatting + day difference."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_day"
        ),
        F.datediff(F.to_date("o_orderdate"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_2024"),
    )


@register(
    "event_funnel",
    oracle="""
    WITH signup AS (
      SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), purchase AS (
      SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t_first_purchase
      FROM events e JOIN signup s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(floor(epoch(e.ts)) AS BIGINT) > s.t_signup
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.t_signup, p.t_first_purchase,
           p.t_first_purchase IS NOT NULL AS converted
    FROM signup s LEFT JOIN purchase p ON s.user_id = p.user_id
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (signup → later purchase): the event-sequence
    join shape — per-user aggregates joined on the user key, one
    shuffle partitioning reused across both steps."""
    e = table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("bigint")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch).alias("t_signup"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", epoch.alias("t_evt")
    )
    purchase = (
        purchases.join(signup, "user_id")
        .filter(F.col("t_evt") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("t_evt").alias("t_first_purchase"))
    )
    return (
        signup.join(purchase, "user_id", "left")
        .select(
            "user_id",
            "t_signup",
            "t_first_purchase",
            F.col("t_first_purchase").isNotNull().alias("converted"),
        )
    )


# ---- funnel conversion latency ----------------------------------------------


@register(
    "funnel_latency_quantiles",
    oracle="""
    WITH s AS (
      SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id,
             min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t_purchase
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s.t_signup
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT p.t_purchase - s.t_signup AS latency_s
      FROM s JOIN p ON s.user_id = p.user_id
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_signup FROM s)
    SELECT tot.n_signup,
           CAST(count(*) AS BIGINT) AS n_converted,
           (floor(CAST(count(*) AS DOUBLE) / tot.n_signup * 10000 + 0.5)
            / 10000) AS conversion_rate,
           (floor(quantile_cont(latency_s, 0.5) * 100 + 0.5) / 100)
             AS p50_latency_s,
           (floor(quantile_cont(latency_s, 0.9) * 100 + 0.5) / 100)
             AS p90_latency_s
    FROM lat CROSS JOIN tot
    GROUP BY tot.n_signup
    """,
)
def funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the signup -> purchase funnel:
    conversion rate plus exact p50/p90 of (first qualifying purchase -
    first signup) — event_funnel emits the per-user rows; this is the
    aggregate a growth dashboard heads with, and latency quantiles are
    the piece a rate alone hides (a funnel can convert well but take
    weeks). Purchases BEFORE the signup are excluded (the funnel is
    ordered, not just co-present). Exact interpolated percentiles per
    the agg_percentiles engine-pair property.

    100 TB shape: two filtered per-user min-aggregations (partial-agg
    map-side), one user-key join, then a single-row quantile over the
    converted-user latencies — at 100 TB that last exact quantile is
    the documented approx_percentile switch."""
    e = table(spark, sf_dir, "events")
    ep = F.floor(F.unix_timestamp("ts")).cast("bigint")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ep).alias("t_signup"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", ep.alias("t"))
        .join(s, "user_id")
        .filter(F.col("t") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    lat = s.join(p, "user_id").select(
        (F.col("t_purchase") - F.col("t_signup")).alias("latency_s")
    )
    tot = s.agg(F.count(F.lit(1)).cast("bigint").alias("n_signup"))
    return (
        lat.crossJoin(F.broadcast(tot))
        .groupBy("n_signup")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_converted"),
            round_half_up(F.percentile("latency_s", F.lit(0.5)), 2).alias(
                "p50_latency_s"
            ),
            round_half_up(F.percentile("latency_s", F.lit(0.9)), 2).alias(
                "p90_latency_s"
            ),
        )
        .select(
            "n_signup",
            "n_converted",
            round_half_up(
                F.col("n_converted").cast("double") / F.col("n_signup"), 4
            ).alias("conversion_rate"),
            "p50_latency_s",
            "p90_latency_s",
        )
    )
