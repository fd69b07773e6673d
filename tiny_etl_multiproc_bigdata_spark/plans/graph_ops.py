"""Iterative graph scoring with an EXACT cross-engine oracle.

``pagerank_scaled`` runs fixed-iteration PageRank over the bipartite
customer→supplier purchase graph in pure integer arithmetic
(scale 1e6, bigint ``div`` everywhere a quotient appears), so unlike
float PageRank the result is bit-identical across engines, runs and
partitionings — the oracle is the same recurrence unrolled as chained
SQL CTEs. k-means (ivf_kmeans.py) demonstrated the iterative-algorithm
pattern with a rows-only check; this one upgrades the pattern to a
full value-hash driver row.

Scale shape: each iteration is one equi-join of the edge list against
the current score table plus one partial-agg'd sum — the standard
distributed PageRank step (Pregel/GraphX do the same joins under the
message-passing API). Iteration count is fixed (3) rather than
convergence-driven, so plan depth is bounded and the whole thing stays
one lazy Catalyst plan — no driver-side loop state, no checkpoints
needed at this depth.

Dangling nodes (suppliers, which have no out-edges in the bipartite
direction) simply contribute nothing — the usual "remove dangling
mass" simplification; documented so the oracle and engine agree by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.plans.registry import register

_PR_SCALE = 1_000_000
_PR_BASE = 150_000  # (1 - 0.85) * scale
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    head = """
    WITH e AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (
      SELECT DISTINCT node
      FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
    ),
    outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)"""
    steps = []
    for k in range(1, _PR_ITERS + 1):
        steps.append(
            f""",
    pr{k} AS (
      SELECT n.node,
             CAST({_PR_BASE} + (85 * COALESCE(sum(p.pr // od.d), 0)) // 100
                  AS BIGINT) AS pr
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN outdeg od ON od.src = e.src
      LEFT JOIN pr{k - 1} p ON p.node = e.src
      GROUP BY n.node
    )"""
        )
    return head + "".join(steps) + f"\n    SELECT node, pr FROM pr{_PR_ITERS}"


@register("pagerank_scaled", oracle=_pagerank_oracle())
def pagerank_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer PageRank over customer→supplier edges:
    pr_{k+1}(v) = 150000 + (85 · Σ_{u→v} (pr_k(u) div outdeg(u))) div
    100, scale 1e6, 3 iterations. See module docstring for the scale
    and determinism story."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e2 = edges.join(outdeg, "src")
    pr = nodes.withColumn("pr", F.lit(_PR_SCALE).cast("bigint"))
    for _ in range(_PR_ITERS):
        contrib = (
            e2.join(pr, e2.src == pr.node)
            .select(F.col("dst").alias("node"), F.expr("pr div d").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            F.expr(f"CAST({_PR_BASE} + (85 * coalesce(s, 0)) div 100 AS BIGINT)")
            .alias("pr"),
        )
    return pr
