"""Temporal join extensions (beyond reference scope, noted in SURVEY
§2.5): as-of join and range join — with the plan shapes that survive
scale, oracle-checked against the naive formulations.

* as-of: "for each row, the latest earlier row of kind X" — expressed
  as a running window aggregate, NOT a join at all: one shuffle on the
  partition key, no quadratic term, streaming-friendly.
* range join: "pairs within a time window" — the naive inequality join
  is O(n²) per key; the bucketed form joins on (key, coarse bucket)
  with each left row exploded to the 2 candidate buckets, bounding
  comparisons to adjacent buckets. Identical semantics (the oracle IS
  the naive inequality join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.functions.ordering import (
    event_time_order,
)
from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.timedomain import (
    epoch_us_ntz,
)
from tiny_etl_multiproc_bigdata_spark.plans.registry import register


@register(
    "asof_last_signup",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS t_us,
             max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_signup_us
      FROM events
    )
    SELECT user_id, event_id,
           CAST(floor(last_signup_us / 1000000) AS BIGINT) AS last_signup_epoch,
           CAST(floor((t_us - last_signup_us) / 1000000) AS BIGINT) AS secs_since_signup
    FROM marked
    WHERE event_type = 'purchase' AND last_signup_us IS NOT NULL
    """,
)
def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join within one stream: each purchase gets the most recent
    signup at-or-before it (per user). A running MAX over the unioned
    event stream — zero join, one shuffle on user_id; the same shape
    works as a streaming stateful op. (A two-table as-of join unions
    the tagged tables first, then applies this window.)"""
    e = table(spark, sf_dir, "events")
    t_us = (epoch_us_ntz("ts")).alias("t_us")
    marked = e.select("user_id", "event_id", "event_type", t_us)
    # asc_nulls_last matches DuckDB's ASC default (NULLS LAST): a
    # NULL-ts purchase must see every signup in its running frame like
    # the oracle does, not sort first and see none (r11 NULL-parity
    # audit class; latent on the NULL-free driver fixtures)
    w = (
        Window.partitionBy("user_id")
        .orderBy(*event_time_order("t_us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("t_us"))
    ).over(w)
    return (
        marked.withColumn("last_signup_us", last_signup)
        .filter((F.col("event_type") == "purchase") & F.col("last_signup_us").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("last_signup_us") / 1_000_000).cast("bigint").alias(
                "last_signup_epoch"
            ),
            F.floor((F.col("t_us") - F.col("last_signup_us")) / 1_000_000)
            .cast("bigint")
            .alias("secs_since_signup"),
        )
    )


_RANGE_S = 60  # pair window: 0 < tb - ta <= 60s


@register(
    "range_join_bucketed",
    oracle=f"""
    SELECT a.user_id,
           a.event_id AS event_a, b.event_id AS event_b,
           CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= {_RANGE_S} * 1000000
     AND a.event_id <> b.event_id
    """,
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via time bucketing: pairs of same-user events within
    60 s. The left side is exploded to its bucket AND the next bucket,
    the right side keyed by its own bucket — every qualifying pair
    shares a (user, bucket) key, so the equi-join bounds comparisons to
    adjacent buckets instead of all same-user pairs. The residual
    inequality filter restores exact semantics (oracle = naive
    inequality join)."""
    e = table(spark, sf_dir, "events")
    t_us = (
        epoch_us_ntz("ts")
    )
    ev = e.select("user_id", "event_id", t_us.alias("t_us")).withColumn(
        "bucket", F.floor(F.col("t_us") / (_RANGE_S * 1_000_000))
    )
    left = ev.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("event_a"),
        F.col("t_us").alias("ta"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") + 1)
        ).alias("a_bucket"),
    )
    right = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("event_b"),
        F.col("t_us").alias("tb"),
        F.col("bucket").alias("b_bucket"),
    )
    # BOTH user and bucket are equi-join keys — the hash key must carry
    # the user, or same-bucket rows of every user pair up first
    pairs = left.join(
        right,
        (F.col("a_bucket") == F.col("b_bucket"))
        & (F.col("a_user") == F.col("b_user")),
    ).filter(
        (F.col("tb") > F.col("ta"))
        & (F.col("tb") - F.col("ta") <= _RANGE_S * 1_000_000)
        & (F.col("event_a") != F.col("event_b"))
    )
    return pairs.select(
        F.col("a_user").alias("user_id"),
        "event_a",
        "event_b",
        (
            F.floor(F.col("tb") / 1_000_000) - F.floor(F.col("ta") / 1_000_000)
        ).cast("bigint").alias("gap_s"),
    )


_ASOF_TOL_S = 3600  # max allowed staleness of the matched left row


@register(
    "asof_tolerance_join",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS t_us,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts) ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_us
      FROM events
    )
    SELECT user_id, event_id,
           CAST(floor((t_us - last_click_us) / 1000000) AS BIGINT)
             AS secs_since_click,
           (t_us - last_click_us) <= CAST({_ASOF_TOL_S * 1_000_000} AS BIGINT)
             AS within_tolerance
    FROM marked
    WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
    """,
)
def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness tolerance (pandas merge_asof's
    ``tolerance=`` semantics): each purchase gets its most recent click,
    and matches older than _ASOF_TOL_S are flagged out-of-tolerance —
    the guard that stops an as-of join from silently attributing to
    arbitrarily stale context. Same zero-join running-window shape as
    asof_last_signup (one shuffle on user_id); the tolerance is a
    map-side predicate on the matched timestamp delta, so it adds
    nothing to the shuffle or state."""
    e = table(spark, sf_dir, "events")
    t_us = (
        epoch_us_ntz("ts")
    ).alias("t_us")
    marked = e.select("user_id", "event_id", "event_type", t_us)
    # asc_nulls_last: same NULL-ordering parity as asof_last_signup
    # (r11 NULL-parity audit class)
    w = (
        Window.partitionBy("user_id")
        .orderBy(*event_time_order("t_us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("t_us"))
    ).over(w)
    return (
        marked.withColumn("last_click_us", last_click)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click_us").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            F.floor((F.col("t_us") - F.col("last_click_us")) / 1_000_000)
            .cast("bigint")
            .alias("secs_since_click"),
            (
                (F.col("t_us") - F.col("last_click_us"))
                # constant folded in Python: 3600e6 overflows INT32 if
                # built as an int-literal product inside the engine
                <= F.lit(_ASOF_TOL_S * 1_000_000).cast("bigint")
            ).alias("within_tolerance"),
        )
    )


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH np AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type <> 'purchase'
    ), flagged AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC)
               AS prev_type
      FROM np
    ), changes AS (
      SELECT user_id, event_type AS state, epoch_us(ts) AS valid_from_us
      FROM flagged
      WHERE prev_type IS NULL OR prev_type <> event_type
    ), vers AS (
      SELECT user_id, state, valid_from_us,
             lead(valid_from_us) OVER (PARTITION BY user_id
                                       ORDER BY valid_from_us ASC, state ASC)
               AS valid_to_us
      FROM changes
    ), p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.purchase_id,
           coalesce(v.state, 'none') AS state_at_purchase,
           v.valid_from_us
    FROM p
    LEFT JOIN vers v
      ON v.user_id = p.user_id
     AND v.valid_from_us <= p.pt
     AND (v.valid_to_us IS NULL OR p.pt < v.valid_to_us)
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension (the temporal
    warehouse primitive consuming scd2_intervals' output shape): each
    purchase event retrieves the activity-state version valid AT its
    timestamp. The dimension is the SCD2 chain over the user's
    non-purchase events; a purchase before any version reports 'none'.

    Plan shape: ZERO joins — dimension-version starts and purchases
    union into one tagged stream per user, and a running
    last-non-null-state window answers every lookup (dim rows sort
    before purchases at equal timestamps, and equal-timestamp version
    changes sort by state, matching the interval chain's
    (valid_from, state) ordering exactly). The oracle is the NAIVE
    interval BETWEEN join, so the window formulation is proven
    equivalent — the asof_last_signup argument, now over versioned
    state instead of a single marker event. One shuffle on user_id at
    any scale; the interval join it replaces is O(|facts|·|versions|)
    per user under skew."""
    e = table(spark, sf_dir, "events")
    t_us = (
        epoch_us_ntz("ts")
    ).alias("t_us")
    base = e.select("user_id", "event_id", "event_type", t_us)
    np_ = base.filter(F.col("event_type") != "purchase")
    # asc_nulls_last mirrors the oracle's change-detection sequence;
    # NULL-ts changes then become NULL-valid_from versions, which the
    # oracle's interval predicate (valid_from <= pt) can never match —
    # dropping them from the tagged stream is exactly that invisibility
    # (they sort last, so they never affect earlier rows' lag either)
    # (r11 NULL-parity audit class)
    wlag = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("t_us"), F.asc_nulls_last("event_id")
    )
    changes = (
        np_.withColumn("prev_type", F.lag("event_type").over(wlag))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .filter(F.col("t_us").isNotNull())
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            "t_us",
            F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("purchase_id"),
        )
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.lit(None).cast("string").alias("state"),
        "t_us",
        F.lit(1).alias("tag"),
        F.col("event_id").alias("purchase_id"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(
            F.asc("t_us"),
            F.asc("tag"),
            F.asc("state"),
            F.asc("purchase_id"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = changes.unionAll(purchases).select(
        "user_id",
        "purchase_id",
        "tag",
        "t_us",
        F.last("state", ignorenulls=True).over(wrun).alias("cur_state"),
        F.last(
            F.when(F.col("tag") == 0, F.col("t_us")), ignorenulls=True
        )
        .over(wrun)
        .alias("valid_from_us"),
    )
    # a purchase with no event time OR no user key matches no version
    # in the oracle (valid_from <= NULL and user = NULL are never
    # true) — mask the running state so it reports 'none' instead of
    # whatever sorted nearby (window partitions group NULL users
    # together; the oracle's equi-join never does)
    no_time = F.col("t_us").isNull() | F.col("user_id").isNull()
    return tagged.filter(F.col("tag") == 1).select(
        "user_id",
        "purchase_id",
        F.coalesce(
            F.when(~no_time, F.col("cur_state")), F.lit("none")
        ).alias("state_at_purchase"),
        F.when(~no_time, F.col("valid_from_us")).alias("valid_from_us"),
    )
