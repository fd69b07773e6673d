"""Collection-typed results and generators: collect_set, posexplode,
string scalar suite, time-series densification."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.timedomain import (
    in_obs_window,
    obs_window_sql,
)
from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
    duck_round,
    round_half_up,
)
from tiny_etl_multiproc_bigdata_spark.plans.registry import register


@register(
    "agg_collect_set",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',')
             AS nation_keys,
           count(DISTINCT c_nationkey) AS n_nations
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set with a deterministic canonical representation —
    collection order out of a shuffle is undefined, so the set is sorted
    then string-encoded (``array_join``). The string form (vs a raw
    array column) is deliberate: list-valued cells are unhashable for
    the verification driver's canonicalizer (r01 ``unhashable type:
    'list'`` err — VERDICT item 3)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.array_join(
            F.array_sort(F.collect_set("c_nationkey")).cast("array<string>"), ","
        ).alias("nation_keys"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@register(
    "posexplode_embedding",
    oracle=f"""
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           {duck_round("embedding[i]::DOUBLE", 4)} AS component
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    WHERE vec_id < 20
    """,
)
def posexplode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, value) rows — the wide→long
    primitive for vector columns. Components are arbitrary float32 (not
    exact at scale 4), so rounding uses the engine-portable half-up
    formula (functions/rounding.py), not built-in round()."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode(F.col("embedding"))
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        round_half_up(F.col("col").cast("double"), 4).alias("component"),
    )


@register(
    "string_transform_suite",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS masked,
           lpad(p_brand, 12, '.')                       AS padded,
           CAST(strpos(p_type, 'A') AS BIGINT)          AS first_a,
           reverse(p_name)                              AS reversed,
           repeat(p_brand, 2)                           AS doubled
    FROM part WHERE p_partkey < 100
    """,
)
def string_transform_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_replace / lpad / instr / reverse / repeat — the remaining
    scalar string surface in one entry."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("masked"),
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.instr(F.col("p_type"), "A").cast("bigint").alias("first_a"),
        F.reverse(F.col("p_name")).alias("reversed"),
        F.repeat(F.col("p_brand"), 2).alias("doubled"),
    )


@register(
    "time_series_densify",
    oracle=f"""
    WITH e AS (
      SELECT * FROM events WHERE ts IS NOT NULL AND {obs_window_sql()}
    ), bounds AS (
      SELECT CAST(floor((epoch_us(min(ts)) // 1000000) / 300) AS BIGINT)
               AS b0,
             CAST(floor((epoch_us(max(ts)) // 1000000) / 300) AS BIGINT)
               AS b1
      FROM e
    ), grid AS (
      SELECT t.bucket FROM bounds, unnest(range(b0, b1 + 1)) AS t(bucket)
    ), agg AS (
      SELECT CAST(floor((epoch_us(ts) // 1000000) / 300) AS BIGINT)
               AS bucket,
             count(*) AS n
      FROM e GROUP BY 1
    )
    SELECT g.bucket, coalesce(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a ON a.bucket = g.bucket
    """,
)
def time_series_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling a time series: generate the full 5-min bucket grid
    with `sequence` + explode, left-join the sparse aggregate, zero-fill.
    The grid generation is a 1-row cross join — no data-volume cost.

    r13 --timeskew: SPINE-GENERATING entry — grid cost is proportional
    to the max-min SPAN, so it rides the bounded observation window
    [1970, 2100) (functions/timedomain.py): one corrupt year-57552
    event made the grid a 6-billion-bucket sequence and OOMed the JVM;
    the NULL-ts exclusion keeps min/max honest and the oracle seconds
    are epoch_us-integer-exact (the double epoch() rounds the last
    second of 9999)."""
    e = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & in_obs_window(F.col("ts"))
    )
    bucket = F.floor(F.unix_timestamp("ts") / 300).cast("bigint")
    agg = e.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))
    bounds = e.agg(
        F.min(bucket).alias("b0"), F.max(bucket).alias("b1")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket")
    )
    return grid.join(agg, "bucket", "left").select(
        "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )
