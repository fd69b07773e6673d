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
from tiny_etl_multiproc_bigdata_spark.functions.timedomain import (
    in_time_domain,
    time_domain_sql,
)
from tiny_etl_multiproc_bigdata_spark.functions.partitioning import (
    ckpt_hash,
    ckpt_keep,
)
from tiny_etl_multiproc_bigdata_spark.functions.rounding import round_half_up
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
    # int64 node codes for every iteration's shuffle (r13 optimization
    # round, the LPA _lpa_enc port): the dedup shuffle moves 16-byte
    # INT pairs and each round's join/agg hashes longs, not 8-13-byte
    # strings; the recurrence only needs node IDENTITY (sums commute),
    # so any bijection works — decode on the final |V|-row result.
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .select(
            _lpa_enc("ck", False).alias("src"),
            _lpa_enc("sk", True).alias("dst"),
        )
    )
    # materialization barriers (r07 plan audit: 28 parquet scans —
    # every per-iteration reference of nodes/e2 re-executed the
    # lineitem-orders edge build; the kcore/sssp convention applied):
    # edges once, the node table and degree-annotated edges once. The
    # rank recurrence itself is NOT barriered (r10, the LPA finding
    # applied): each iteration's pr has exactly ONE consumer (the next
    # contrib join), so the fused ITERS-deep plan recomputes nothing —
    # the per-round eager localCheckpoint measured as pure overhead at
    # sf1 (21.0s -> 10.2s mean, -51%, bit-identical at two scales).
    #
    # r14 (guide §2.4, VERDICT item 1): the barriers now PRESERVE
    # partitioning — ckpt_hash/ckpt_keep capture hashpartitioning on
    # the LogicalRDD (see functions/partitioning.py), so e2 stays
    # hash(src), nodes stays hash(node), and each iteration's pr chain
    # stays hash(node) end to end. Per-iteration Exchanges drop 3 -> 1
    # (only the contrib partial-sum shuffle, |V|-bounded partials);
    # the |E|-row e2 table crosses ZERO per-round exchanges.
    edges = ckpt_hash(edges, "src")
    nodes = ckpt_keep(
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e2 = ckpt_keep(edges.join(outdeg, "src"))
    pr = nodes.withColumn("pr", F.lit(_PR_SCALE).cast("bigint"))
    for _ in range(_PR_ITERS):
        # shuffle_hash hints: keep the rank recurrence off the driver
        # (no per-round broadcast collect; measured −25% at sf1 in the
        # r13 bench session) and, with both sides pre-partitioned, skip
        # the SortMergeJoin sorts. Build sides are per-partition
        # |V|/P-row score/contrib tables of 16-byte longs — bounded by
        # the node count, never the edge count, at any scale (the
        # VERDICT item-7 sizing rule: a build partition of a 10^9-node
        # graph at P=20k is ~50k rows ≈ 1 MB).
        pr = pr.hint("shuffle_hash")
        contrib = (
            e2.join(pr, e2.src == pr.node)
            .select(F.col("dst").alias("node"), F.expr("pr div d").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(contrib.hint("shuffle_hash"), "node", "left").select(
            "node",
            F.expr(f"CAST({_PR_BASE} + (85 * coalesce(s, 0)) div 100 AS BIGINT)")
            .alias("pr"),
        )
    return pr.select(_lpa_dec("node").alias("node"), "pr")


# --------------------------------------------------------------------------
# Triangle counting (graph analytics)
# --------------------------------------------------------------------------

# Undirected edge list of a deterministic affine graph that PROVABLY
# contains triangles: each customer k < 1000 contributes the three
# edges k–f(k), k–g(k), f(k)–g(k) with f(k)=(3k+7)%1000 and
# g(k)=(5k+11)%1000, closing the wedge at k into the triangle
# {k, f(k), g(k)} (the two-map referral graph alone — the BFS fixture —
# is triangle-free, which would make this entry vacuous). Canonicalized
# a < b, self-loops dropped, duplicates collapsed — one template for
# both engines.
_TRI_EDGES_TMPL = """
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM (
      SELECT c_custkey AS src, (c_custkey * 3 + 7) % 1000 AS dst
      FROM {cust} WHERE c_custkey < 1000
      UNION ALL
      SELECT c_custkey AS src, (c_custkey * 5 + 11) % 1000 AS dst
      FROM {cust} WHERE c_custkey < 1000
      UNION ALL
      SELECT (c_custkey * 3 + 7) % 1000 AS src,
             (c_custkey * 5 + 11) % 1000 AS dst
      FROM {cust} WHERE c_custkey < 1000
    )
    WHERE src <> dst
"""


def _oriented_edges(e: DataFrame) -> DataFrame:
    """Degree-orientation: re-canonicalize each undirected edge from
    its lower- to higher-(degree, id) endpoint. Triangle counts are
    orientation-invariant, but under THIS total order every node's
    out-degree is O(sqrt(m)) (a node of degree d only keeps edges to
    >= d-degree neighbors, and there are at most 2m/d of those), so the
    wedge fan-out that makes a skewed 100 TB graph quadratic under id
    ordering — one celebrity node expands deg² wedges — collapses to
    O(m^1.5) total work. Encoded as one sortable key deg*2^32 + id so
    the downstream join topology is IDENTICAL to the id-ordered form:
    only the canonicalization changed (the upgrade documented in r05,
    now real; equality with id ordering is pinned in
    tests/test_plans.py::test_triangle_degree_orientation_invariant)."""
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    key = (F.col("deg").cast("bigint") * F.lit(2**32)).cast("bigint")
    keyed = deg.select("node", (key + F.col("node")).alias("k"))
    ka = keyed.select(F.col("node").alias("a"), F.col("k").alias("ka"))
    kb = keyed.select(F.col("node").alias("b"), F.col("k").alias("kb"))
    return (
        e.join(ka, "a")
        .join(kb, "b")
        .select(
            F.least("ka", "kb").alias("a"), F.greatest("ka", "kb").alias("b")
        )
    )


@register(
    "triangle_count",
    oracle=f"""
    WITH e AS ({_TRI_EDGES_TMPL.format(cust="customer")})
    SELECT count(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the deterministic affine referral graph
    via the DEGREE-ORIENTED ordered-wedge join: edges are
    re-canonicalized low→high (degree, id) endpoint (`_oriented_edges`)
    and each triangle is counted exactly once because the two joins
    extend a<b to a<b<c under that total order. Complements the BFS /
    PageRank / connected-components entries with the clustering-
    coefficient primitive. Scale shape: two equi-joins shuffled on the
    join keys, with per-node wedge fan-out bounded O(sqrt(m)) by the
    orientation — the skew lever that keeps a celebrity node from
    expanding deg² wedges. The oracle stays the straightforward
    id-ordered count (orientation-invariance IS the cross-engine
    check); equality of both orderings on the fixture graph is pinned
    in pytest."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("_tri_customer")
    # pin the canonical edge list (referenced 3x inside the orientation:
    # both degree halves + the join input) and the oriented result
    # (three wedge-join sides) — r07 plan audit measured 45 customer
    # scans without the barriers
    canon = spark.sql(
        _TRI_EDGES_TMPL.format(cust="_tri_customer")
    ).localCheckpoint(eager=True)
    e = _oriented_edges(canon).localCheckpoint(eager=True)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )


# --------------------------------------------------------------------------
# Z-order clustering keys (data-layout optimization)
# --------------------------------------------------------------------------

_Z_BITS = 8


def _interleave_expr(x: str, y: str) -> str:
    """SQL for the Morton/Z-order interleave of two _Z_BITS-bit values.
    Pure `>> & <<` arithmetic, valid verbatim in BOTH Spark SQL and
    DuckDB — the formula is shared so the engines cannot drift."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _zorder_oracle() -> str:
    z = _interleave_expr("x", "y")
    return f"""
    WITH c AS (
      SELECT event_id,
             CAST(user_id & 255 AS BIGINT) AS x,
             CAST(CAST(floor((epoch_us(ts) // 1000000) / 86400) AS BIGINT)
                  & 255 AS BIGINT) AS y
      FROM events
      WHERE {time_domain_sql()}
    )
    SELECT event_id, CAST({z} AS BIGINT) AS zvalue,
           CAST(({z}) >> {_Z_BITS} AS BIGINT) AS cluster
    FROM c
    """


@register("zorder_cluster_assign", oracle=_zorder_oracle())
def zorder_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (user, day) — the
    data-layout primitive behind multi-dimensional file clustering
    (Delta/Iceberg OPTIMIZE ZORDER): rows close in BOTH dimensions get
    close z-values, so writing files in z-order lets min/max file
    statistics prune scans on EITHER predicate column — the layout
    lever that turns a 100 TB full scan into a targeted read. Emits
    the interleaved z-value and a 256-way cluster id (the write-path
    would `repartitionByRange(cluster)` before the sink). Pure bit
    arithmetic from ONE shared SQL formula (`_interleave_expr`), zero
    shuffle, zero Python. r13 --timeskew: portable-time-domain filter
    + epoch_us-exact oracle day index (double epoch() rounds the last
    second of 9999 into the next day and flips z-bits)."""
    e = table(spark, sf_dir, "events").filter(in_time_domain(F.col("ts")))
    z = _interleave_expr("x", "y")
    return (
        e.selectExpr(
            "event_id",
            "CAST(user_id & CAST(255 AS BIGINT) AS BIGINT) AS x",
            "CAST(CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) "
            "& CAST(255 AS BIGINT) AS BIGINT) AS y",
        )
        .selectExpr(
            "event_id",
            f"CAST({z} AS BIGINT) AS zvalue",
            f"CAST(({z}) >> {_Z_BITS} AS BIGINT) AS cluster",
        )
    )


# ---- single-source shortest paths (fixed-iteration Bellman-Ford) --------
#
# The min-plus twin of pagerank_scaled's fixed-iteration pattern, and
# strictly easier to make cross-engine-exact: relaxation is min over
# integer sums — no division at all, so no quantization or offset-space
# argument is needed. Reachable-set representation (absent = infinity)
# sidesteps NULL-vs-sentinel drift between engines.

_SSSP_ITERS = 4
_SSSP_SOURCE = "c1"  # customer 1 — present at every fixture sf


def _sssp_oracle() -> str:
    head = f"""
    WITH pairs AS (
      SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
             's' || CAST(l.l_suppkey AS VARCHAR) AS snode,
             CAST(min(l.l_quantity) AS BIGINT) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    e AS (
      SELECT cnode AS src, snode AS dst, w FROM pairs
      UNION ALL
      SELECT snode, cnode, w FROM pairs
    ),
    d0 AS (SELECT '{_SSSP_SOURCE}' AS node, CAST(0 AS BIGINT) AS dist)"""
    steps = []
    for k in range(1, _SSSP_ITERS + 1):
        steps.append(
            f""",
    d{k} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{k - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM e JOIN d{k - 1} d ON d.node = e.src
      ) GROUP BY node
    )"""
        )
    return (
        head
        + "".join(steps)
        + f"\n    SELECT node, dist FROM d{_SSSP_ITERS}"
    )


@register("sssp_bellman_ford", oracle=_sssp_oracle())
def sssp_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths over the undirected customer↔
    supplier trading graph (edge weight = the pair's minimum lineitem
    quantity), {ITERS} Bellman-Ford relaxations from customer c1 as ONE
    lazy Catalyst plan — reachable frontier only, so iteration k's
    table is exactly the ≤k-hop ball around the source. Pure integer
    min-plus algebra: bit-identical across engines and partitionings
    with no quantization at all (contrast pagerank_scaled, which needs
    the integer-division offset argument).

    100 TB shape: per iteration one equi-join of the current distance
    table against edges (both shuffle on node id — co-partitioned
    across iterations under AQE) and a min-combine that is map-side
    partial-agg'd. Frontier-only state keeps early iterations tiny on
    high-diameter graphs; on low-diameter graphs it converges to the
    component size, the same bound as any SSSP. Fixed iteration count =
    bounded plan depth (the recursive-CTE alternative is
    recursive_bfs_levels' shape, hops instead of weights)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # int64 node codes for every round's shuffle (r13, the LPA port):
    # min-plus relaxation only needs node identity, so the weight
    # aggregate groups on the raw INT pair and the codes decode once
    # on the final reachable set.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.min("l_quantity").cast("bigint").alias("w"))
        .select(
            _lpa_enc("ck", False).alias("cnode"),
            _lpa_enc("sk", True).alias("snode"),
            "w",
        )
    )
    # materialize the edge list once and each round's distance table:
    # every iteration references `d` twice (in `relaxed` and in the
    # unionAll), so without a barrier the lineage doubles per round —
    # ~2^ITERS copies of the lineitem-orders edge-build subtree in the
    # final plan (the kcore_fixed_peels lesson, r6 review finding)
    # r14 (guide §2.4): ckpt_hash keeps the |E|-row edge table
    # hash(src) across all ITERS relaxations — the per-round join
    # shuffles only the frontier; ckpt_keep on each round's d captures
    # the min-agg's hash(node) so the NEXT round's join needs no
    # exchange on d either. Per-round Exchanges drop to 1 (the
    # min-combine partials). shuffle_hash builds the frontier side —
    # bounded by |V|/P rows of 16-byte longs per partition.
    e = ckpt_hash(
        pairs.select(
            F.col("cnode").alias("src"), F.col("snode").alias("dst"), "w"
        ).unionAll(
            pairs.select(
                F.col("snode").alias("src"), F.col("cnode").alias("dst"), "w"
            )
        ),
        "src",
    )
    d = spark.createDataFrame(
        [(int(_SSSP_SOURCE[1:]), 0)], "ck long, dist long"
    ).select(
        _lpa_enc("ck", False).alias("node"),
        F.col("dist").cast("bigint").alias("dist"),
    )
    for _ in range(_SSSP_ITERS):
        d = ckpt_keep(d)
        relaxed = e.join(d.hint("shuffle_hash"), e.src == d.node).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        d = (
            d.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
    return d.select(_lpa_dec("node").alias("node"), "dist")


# ---- k-core peeling (fixed iterations) ----------------------------------

_KCORE_K = 8
_KCORE_PEELS = 3


def _kcore_oracle() -> str:
    head = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS snode
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (
      SELECT cnode AS src, snode AS dst FROM pairs
      UNION ALL
      SELECT snode, cnode FROM pairs
    ),
    n0 AS (SELECT DISTINCT src AS node FROM e)"""
    steps = []
    for k in range(1, _KCORE_PEELS + 1):
        steps.append(
            f""",
    n{k} AS (
      SELECT e.src AS node
      FROM e
      JOIN n{k - 1} a ON a.node = e.src
      JOIN n{k - 1} b ON b.node = e.dst
      GROUP BY e.src
      HAVING count(*) >= {_KCORE_K}
    )"""
        )
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node,
           CAST(count(*) OVER () AS BIGINT) AS surviving_nodes
    FROM n{_KCORE_PEELS}"""
    )


@register("kcore_fixed_peels", oracle=_kcore_oracle())
def kcore_fixed_peels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling ({PEELS} fixed rounds,
    k={K}): each round keeps only nodes with >= k neighbors among the
    CURRENT survivors — after convergence the survivor set is exactly
    the k-core (the standard dense-subgraph primitive for spam/bot
    cluster detection and graph sparsification before expensive
    analytics). Fixed rounds = bounded plan depth, same contract as
    pagerank_scaled/sssp; purely integer degree counting, so the
    chained-CTE oracle is bit-exact with no quantization.

    100 TB shape: per round, one self-equi-join of the edge list
    against the survivor set (both shuffle on node id, co-partitioned
    round over round under AQE) and a map-side-combined degree count.
    Edges leave the plan as soon as either endpoint is peeled — rounds
    shrink monotonically."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # int64 node codes for every peel's join/agg shuffle (r13, the LPA
    # port): degree counting only needs node identity; the dedup
    # shuffle moves INT pairs and the codes decode once on the
    # surviving-node result.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .select(
            _lpa_enc("ck", False).alias("cnode"),
            _lpa_enc("sk", True).alias("snode"),
        )
    )
    # materialize the edge list once and each round's survivor set:
    # every round references `nodes` TWICE (both join sides), so without
    # a barrier the survivor lineage doubles per round — 2^PEELS copies
    # of the edge-build subtree in the final plan (the _cc_labels
    # lesson, dedup_groups.py; r6 review finding)
    #
    # r14 (guide §2.4, VERDICT item 1): partitioning-preserving
    # barriers + aggregate-then-semi-join. The edge table is pinned
    # hash(dst) once; each peel counts degrees toward SURVIVING dst
    # first (zero-exchange co-partitioned join: survivors are
    # hash(node) from the previous peel's groupBy, renamed to dst),
    # then semi-joins the surviving-src condition AFTER the count —
    # equivalent because the old src-join only FILTERED rows (survivor
    # sets are distinct single-column), never changed a surviving
    # src's count: count(dst∈b | src=s) is the same number whether
    # non-surviving s rows are dropped before or after grouping. The
    # |E|-row table crosses ZERO per-peel exchanges; only the
    # |V|-bounded degree partials shuffle. shuffle_hash builds the
    # survivor side — |V|/P rows of 8-byte longs per partition at any
    # scale.
    e = ckpt_hash(
        pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
        .unionAll(
            pairs.select(
                F.col("snode").alias("src"), F.col("cnode").alias("dst")
            )
        ),
        "dst",
    )
    nodes = e.select(F.col("src").alias("node")).distinct()
    for _ in range(_KCORE_PEELS):
        nodes = ckpt_keep(nodes)
        a = nodes.select(F.col("node").alias("src"))
        b = nodes.select(F.col("node").alias("dst"))
        nodes = (
            e.join(b.hint("shuffle_hash"), "dst")
            .groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .join(a.hint("shuffle_hash"), "src", "left_semi")
            .select(F.col("src").alias("node"))
        )
    from pyspark.sql import Window as W

    return nodes.select(
        _lpa_dec("node").alias("node"),
        F.count("*").over(W.partitionBy()).cast("bigint").alias(
            "surviving_nodes"
        ),
    )


# ---- personalized PageRank ----------------------------------------------

_PPR_SEED_MOD = 50  # seed set: customers with custkey % 50 == 7


def _ppr_oracle() -> str:
    head = f"""
    WITH e AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS dst,
                      o.o_custkey AS ck
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (
      SELECT node, max(seed) AS seed FROM (
        SELECT src AS node,
               CASE WHEN ck % {_PPR_SEED_MOD} = 7 THEN 1 ELSE 0 END AS seed
        FROM e
        UNION ALL
        SELECT dst, 0 FROM e
      ) GROUP BY node
    ),
    outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    pr0 AS (
      SELECT node, seed,
             CAST(CASE WHEN seed = 1 THEN 1000000 ELSE 0 END AS BIGINT)
               AS pr
      FROM nodes
    )"""
    steps = []
    for k in range(1, _PR_ITERS + 1):
        steps.append(
            f""",
    pr{k} AS (
      SELECT n.node, n.seed,
             CAST(CASE WHEN n.seed = 1 THEN {_PR_BASE} ELSE 0 END
                  + (85 * COALESCE(sum(p.pr // od.d), 0)) // 100
                  AS BIGINT) AS pr
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN outdeg od ON od.src = e.src
      LEFT JOIN pr{k - 1} p ON p.node = e.src
      GROUP BY n.node, n.seed
    )"""
        )
    return (
        head
        + "".join(steps)
        + f"\n    SELECT node, pr FROM pr{_PR_ITERS} WHERE pr > 0"
    )


@register("pagerank_personalized", oracle=_ppr_oracle())
def pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: identical integer recurrence to
    pagerank_scaled except the teleport mass goes ONLY to the seed set
    (customers with custkey % {MOD} == 7) — rank flows outward from the
    seeds, scoring every node by proximity to them. The
    similar-account / recommendation primitive (and, over a doc-link
    graph, the seed-quality propagation used for corpus source scoring
    à la Common Crawl's harmonic-centrality ranking). Zero-mass nodes
    are filtered at the end, so the result is the seeds' forward
    neighborhood — sparse even on a 100 TB graph.

    Scale shape per iteration: identical to pagerank_scaled (the
    teleport term is a per-row CASE, free); the only new cost is
    carrying the 1-bit seed flag through the node table."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # int64 node codes for every iteration's shuffle (r13, the LPA
    # port); the seed flag derives from the raw custkey, and the old
    # distinct over (src, dst, ck) was definitionally the (ck, sk)
    # distinct (src/dst are functions of ck/sk).
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .select(
            _lpa_enc("ck", False).alias("src"),
            _lpa_enc("sk", True).alias("dst"),
            "ck",
        )
    )
    # same barriers as pagerank_scaled (r07 plan audit); like there,
    # the single-consumer rank recurrence is left un-barriered (r10).
    # r14: partitioning-preserving barriers (ckpt_hash/ckpt_keep, see
    # pagerank_scaled) — e2 stays hash(src), nodes stays hash(node),
    # per-iteration Exchanges 3 -> 1 (contrib partials only). nodes is
    # now built FROM the checkpointed edges (it used to close over the
    # pre-barrier frame and re-execute the whole edge build).
    edges = ckpt_hash(edges, "src")
    nodes = ckpt_keep(
        edges.select(
            F.col("src").alias("node"),
            (F.col("ck") % _PPR_SEED_MOD == 7).cast("int").alias("seed"),
        )
        .unionAll(
            edges.select(F.col("dst").alias("node"), F.lit(0).alias("seed"))
        )
        .groupBy("node")
        .agg(F.max("seed").alias("seed"))
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e2 = ckpt_keep(edges.select("src", "dst").join(outdeg, "src"))
    pr = nodes.select(
        "node",
        "seed",
        F.when(F.col("seed") == 1, F.lit(_PR_SCALE))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pr"),
    )
    for _ in range(_PR_ITERS):
        # shuffle_hash hint: same rationale as pagerank_scaled's
        prs = pr.select("node", "pr").hint("shuffle_hash")
        contrib = (
            e2.join(prs, e2.src == F.col("node"))
            .select(F.col("dst").alias("node"), F.expr("pr div d").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(contrib.hint("shuffle_hash"), "node", "left").select(
            "node",
            "seed",
            F.expr(
                f"CAST(CASE WHEN seed = 1 THEN {_PR_BASE} ELSE 0 END"
                " + (85 * coalesce(s, 0)) div 100 AS BIGINT)"
            ).alias("pr"),
        )
    return pr.filter(F.col("pr") > 0).select(
        _lpa_dec("node").alias("node"), "pr"
    )


# ---- HITS (hubs & authorities, fixed iterations, unnormalized) ----------

_HITS_ITERS = 2


def _hits_oracle() -> str:
    head = """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS hub, l.l_suppkey AS auth
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hubs AS (SELECT DISTINCT hub FROM e),
    auths AS (SELECT DISTINCT auth FROM e),
    h0 AS (SELECT hub, CAST(1 AS BIGINT) AS s FROM hubs),
    a0 AS (SELECT auth, CAST(0 AS BIGINT) AS s FROM auths)"""
    steps = []
    for k in range(1, _HITS_ITERS + 1):
        steps.append(
            f""",
    a{k} AS (
      SELECT a.auth, CAST(COALESCE(sum(h.s), 0) AS BIGINT) AS s
      FROM auths a
      LEFT JOIN e ON e.auth = a.auth
      LEFT JOIN h{k - 1} h ON h.hub = e.hub
      GROUP BY a.auth
    ),
    h{k} AS (
      SELECT hb.hub, CAST(COALESCE(sum(a.s), 0) AS BIGINT) AS s
      FROM hubs hb
      LEFT JOIN e ON e.hub = hb.hub
      LEFT JOIN a{k} a ON a.auth = e.auth
      GROUP BY hb.hub
    )"""
        )
    return (
        head
        + "".join(steps)
        + f"""
    SELECT 'h' || CAST(hub AS VARCHAR) AS node, s AS score FROM h{_HITS_ITERS}
    UNION ALL
    SELECT 'a' || CAST(auth AS VARCHAR), s FROM a{_HITS_ITERS}"""
    )


@register("hits_hub_authority", oracle=_hits_oracle())
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) over the bipartite customer→supplier graph,
    {ITERS} fixed mutual-reinforcement rounds: auth(v) = Σ hub(u) over
    in-edges, then hub(u) = Σ auth(v) over out-edges. UNNORMALIZED —
    the per-round L2 normalization only rescales, so the integer sums
    preserve the exact ranking while staying bit-exact cross-engine
    with no quantization at all (degrees ~10, so {ITERS} rounds stay
    far below 2^63; one more round than PageRank's scale would need a
    DECIMAL(38,0) accumulator — the embedding_standardize recipe).

    100 TB shape: each half-round is one equi-join + map-side-combined
    sum, alternating shuffle keys between the two node columns —
    co-partitioned across rounds per side under AQE."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("hub"), F.col("l_suppkey").alias("auth")
        )
        .distinct()
    )
    # materialization barriers (r07 plan audit: 32 parquet scans —
    # h references a's whole lineage and vice versa each half-round,
    # and the final union embeds both): edge list + node sets once,
    # both score tables per half-round
    #
    # r14 (guide §2.4, VERDICT item 1): the half-rounds alternate join
    # keys (hub, then auth), so ONE edge partitioning can never serve
    # both. Pin TWO partitioning-preserving copies of the |E|-row edge
    # list — e_h hash(hub), e_a hash(auth) — and keep each score table
    # hash-partitioned on its own key (hubs/auths from distinct, the
    # recurrence from the left join on them). Every half-round's edge
    # join is then exchange-free on BOTH sides; only the |node|-bounded
    # score partials shuffle. Storage cost: 2× the edge longs — paid
    # once, saves ITERS×|E| exchange bytes.
    e_h = ckpt_hash(e, "hub")
    # derive the auth-keyed copy FROM the hub-keyed checkpoint so the
    # lineitem⋈orders edge build executes once, not twice
    e_a = ckpt_hash(e_h, "auth")
    hubs = ckpt_keep(e_h.select("hub").distinct())
    auths = ckpt_keep(e_a.select("auth").distinct())
    h = hubs.withColumn("s", F.lit(1).cast("bigint"))
    # zero-score auth state so the final union is well-defined even if
    # _HITS_ITERS is tuned to 0 (matches the oracle's a0 CTE semantics)
    a = auths.withColumn("s", F.lit(0).cast("bigint"))
    # r13 optimization round (guide §2.4 / §3.1): each half-round used
    # to run nodes ⟕ e ⟕ other_score → groupBy — the EDGE table crossed
    # two exchanges (by auth, then the joined rows by hub) plus a third
    # for the partials, all SortMergeJoins. Reordered: score joins the
    # edge list FIRST (inner — the score table covers every node of its
    # side each round, so the inner join matches every e row; NULL keys
    # never equi-join in either form), then the groupBy partial-
    # aggregates map-side, so the edge table crosses ONE exchange per
    # half-round and the second exchange carries |nodes|-bounded
    # partials. Edge-less nodes get s=0 via the final left join exactly
    # as before (bit-identical at two SFs: tests/test_hits_rewrite.py).
    # shuffle_hash pins the score side as the per-partition build (the
    # checkpointed score table has no stats, so the planner would fall
    # back to sort-merge and pay a sort of the edge table; the build
    # side is |V|/P rows — bounded at any scale, no broadcast of a
    # |V|-row table anywhere).
    for _ in range(_HITS_ITERS):
        h = ckpt_keep(h)
        pa = (
            e_h.join(h.select("hub", F.col("s").alias("hs")).hint("shuffle_hash"), "hub")
            .groupBy("auth")
            .agg(F.sum("hs").alias("ps"))
        )
        a = auths.join(pa.hint("shuffle_hash"), "auth", "left").select(
            "auth", F.coalesce(F.col("ps"), F.lit(0)).cast("bigint").alias("s")
        )
        a = ckpt_keep(a)
        ph = (
            e_a.join(a.select("auth", F.col("s").alias("as_")).hint("shuffle_hash"), "auth")
            .groupBy("hub")
            .agg(F.sum("as_").alias("ps"))
        )
        h = hubs.join(ph.hint("shuffle_hash"), "hub", "left").select(
            "hub", F.coalesce(F.col("ps"), F.lit(0)).cast("bigint").alias("s")
        )
    return (
        h.select(
            F.concat(F.lit("h"), F.col("hub").cast("string")).alias("node"),
            F.col("s").alias("score"),
        )
        .unionAll(
            a.select(
                F.concat(F.lit("a"), F.col("auth").cast("string")).alias(
                    "node"
                ),
                F.col("s").alias("score"),
            )
        )
    )


# ---- label propagation communities ---------------------------------------

_LPA_ITERS = 3


def _lpa_oracle() -> str:
    head = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS snode
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (
      SELECT cnode AS src, snode AS dst FROM pairs
      UNION ALL
      SELECT snode, cnode FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)"""
    steps = []
    for k in range(1, _LPA_ITERS + 1):
        steps.append(
            f""",
    c{k} AS (
      SELECT e.dst AS node, p.lbl, count(*) AS cnt
      FROM e JOIN l{k - 1} p ON p.node = e.src
      GROUP BY e.dst, p.lbl
    ),
    l{k} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (
                 PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
        FROM c{k}
      ) WHERE rn = 1
    )"""
        )
    return (
        head
        + "".join(steps)
        + f"\n    SELECT node, lbl AS community FROM l{_LPA_ITERS}"
    )


# r13 optimization round: order-preserving int64 node encoding for the
# LPA rounds (guide §2.3 "shuffle narrower bytes"). Node ids are
# 'c<digits>' / 's<digits>' strings whose LEXICOGRAPHIC order the
# tie-break depends on; enc() is a strict order-isomorphism into
# int64, so min(struct(-cnt, lbl)) over encoded longs picks exactly
# the label the string comparison picked, and every round's join/agg
# shuffles 16-byte long pairs instead of ~40-byte strings. The
# encoding is purely arithmetic and invertible, so the final decode is
# a per-row expression — no mapping table, no extra join.
#
# enc('c'+d) = num(rightpad(d, W, '0'))·16 + len(d); 's' adds 2^61.
# For digit strings without leading zeros, lex order == numeric order
# of the right-padded value with length as tiebreak (right-padding
# with '0', the smallest digit, preserves every non-prefix comparison;
# prefix pairs pad to the same value and resolve by length), and all
# 'c*' sort before all 's*' ('c' < 's'). Exact for keys < 10^W
# (W=12: custkey at sf ~100k is ~11 digits; the cast chain is
# int64-exact throughout). Pinned by tests/test_lpa_rewrite.py:
# adversarial prefix/length cases, and full-output equivalence vs the
# old string lowering at two SFs.
_LPA_PAD_W = 12
_LPA_S_BIT = 1 << 61


def _lpa_enc(key: str, is_s: bool) -> F.Column:
    """Order-preserving encode of a positive bigint key column into the
    node id space ('c<key>' when is_s=False, 's<key>' when True)."""
    padded = F.col(key).cast("bigint") * F.expr(
        f"cast(pow(10, {_LPA_PAD_W} - length(cast({key} as string))) as bigint)"
    )
    base = padded * 16 + F.length(F.col(key).cast("string")).cast("bigint")
    return base + F.lit(_LPA_S_BIT) if is_s else base


def _lpa_dec(col: str) -> F.Column:
    """Inverse of _lpa_enc — back to the 'c<digits>'/'s<digits>' string.
    Pure int64 arithmetic (bigint ``div``), evaluated per row on the
    tiny |V|-sized result."""
    base = f"(case when {col} >= {_LPA_S_BIT} then {col} - {_LPA_S_BIT} else {col} end)"
    key = (
        f"(({base} div 16) div "
        f"cast(pow(10, {_LPA_PAD_W} - {base} % 16) as bigint))"
    )
    return F.expr(
        f"concat(case when {col} >= {_LPA_S_BIT} then 's' else 'c' end, "
        f"cast({key} as string))"
    )


@register("label_propagation_communities", oracle=_lpa_oracle())
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over the undirected customer↔supplier purchase graph,
    {ITERS} fixed rounds, made DETERMINISTIC: each node adopts the
    most frequent neighbor label with ties broken by smallest label —
    classic LPA is order-dependent, so the tie rule is what makes the
    result bit-exact cross-engine and run-over-run. Labels start as
    the node id itself. Reference scope comparison: the reference
    engine has no graph tier at all (SURVEY §2.5); this completes the
    community-structure member of the suite beside components
    (dedup_cc_groups), PageRank, HITS, k-core.

    100 TB shape: one round = equi-join of the edge list against the
    |V|-row label table (shuffle on node id, co-partitioned round over
    round under AQE) + a partially-aggregated (node,label) count + a
    partial-agg argmax via min(struct(-cnt, lbl)) — NO per-node sort
    and no window: the argmax folds map-side, so the second shuffle
    moves at most one candidate struct per (node,label) group. Only
    the edge list is localCheckpointed (it is consumed once per
    round); the label recurrence is deliberately left UN-barriered —
    each round's table is consumed exactly once, so the fused
    ITERS-deep plan recomputes nothing, and the r10 A/B (SCALE_NOTES)
    measured the per-round eager localCheckpoint as pure overhead:
    sf1 17.1s -> 11.9s (-30%, bit-identical at two scales) from
    removing it. Lineage depth is bounded by the fixed iteration
    count; a LARGE-iteration LPA variant would reinstate a periodic
    (every-k-rounds) checkpoint, the kcore/sssp convention."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # distinct over the (custkey, suppkey) INT pairs, encode after —
    # the big dedup shuffle moves 16-byte pairs, not node strings
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
        .select(
            _lpa_enc("ck", False).alias("cnode"),
            _lpa_enc("sk", True).alias("snode"),
        )
    )
    # r14 (guide §2.4, VERDICT item 1): partitioning-preserving barrier
    # — the |E|-row edge table stays hash(src) across all rounds, so
    # each round's label join needs NO exchange on e; and each round's
    # argmax groupBy leaves lbl hash(node), which (renamed to src)
    # co-partitions with e for the NEXT round. Per-round exchanges
    # drop to the two |V|-bounded partial-agg shuffles.
    e = ckpt_hash(
        pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
        .unionAll(
            pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
        ),
        "src",
    )
    lbl = e.select(F.col("src").alias("node"), F.col("src").alias("lbl")).distinct()
    for _ in range(_LPA_ITERS):
        # shuffle_hash hint (r10): without it, small-sf sessions with a
        # raised broadcast threshold BROADCAST the label recurrence —
        # collecting each round's labels to the driver, exactly the
        # round-trip the un-barriered plan avoids (measured in the
        # bench session at sf1: 20.3s -> 16.1s mean, every paired rep
        # faster, bit-identical). It is also the honest 100 TB plan: a
        # |V|-row label table never broadcasts at scale.
        counts = (
            e.join(
                lbl.withColumnRenamed("node", "src").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax(count) with smallest-label tie break as a partial-agg
        # min over (-cnt, lbl) structs — orderable, combiner-friendly
        lbl = counts.groupBy("node").agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("lbl"))).alias("m")
        ).select("node", F.col("m.lbl").alias("lbl"))
    # decode back to the contract's 'c<digits>'/'s<digits>' strings —
    # per-row arithmetic on the final |V|-row result, no mapping join
    return lbl.select(
        _lpa_dec("node").alias("node"), _lpa_dec("lbl").alias("community")
    )


# ---- Hilbert-curve clustering keys ---------------------------------------

_H_BITS = 8  # 256 x 256 grid, same key space as zorder_cluster_assign
_H_N = 1 << _H_BITS


def _hilbert_round_exprs(s: int) -> tuple[str, str, str]:
    """One xy2d round (grid step s) as portable SQL over columns
    (x, y, d): returns (new_x, new_y, new_d) expressions. The quadrant
    index (3·rx) XOR ry is rewritten as 3·rx + ry − 2·rx·ry (identical
    on {{0,1}}²) because DuckDB spells XOR differently from Spark SQL —
    pure arithmetic is the only dialect both parse verbatim. ONE
    generator feeds engine and oracle, the zorder/_interleave_expr
    convention."""
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    nd = f"d + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    nx = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
        f"THEN {_H_N - 1} - y ELSE y END) ELSE x END"
    )
    ny = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
        f"THEN {_H_N - 1} - x ELSE x END) ELSE y END"
    )
    return nx, ny, nd


def _hilbert_steps() -> list[int]:
    return [1 << i for i in range(_H_BITS - 1, -1, -1)]


def _hilbert_oracle() -> str:
    head = f"""
    WITH h0 AS (
      SELECT event_id,
             CAST(user_id & 255 AS BIGINT) AS x,
             CAST(CAST(floor((epoch_us(ts) // 1000000) / 86400) AS BIGINT)
                  & 255 AS BIGINT) AS y,
             CAST(0 AS BIGINT) AS d
      FROM events
      WHERE {time_domain_sql()}
    )"""
    ctes = []
    for k, s in enumerate(_hilbert_steps(), start=1):
        nx, ny, nd = _hilbert_round_exprs(s)
        ctes.append(
            f""",
    h{k} AS (
      SELECT event_id, CAST({nx} AS BIGINT) AS x,
             CAST({ny} AS BIGINT) AS y, CAST({nd} AS BIGINT) AS d
      FROM h{k - 1}
    )"""
        )
    return (
        head
        + "".join(ctes)
        + f"""
    SELECT event_id, d AS hvalue,
           CAST(d >> {_H_BITS} AS BIGINT) AS cluster
    FROM h{_H_BITS}"""
    )


@register("hilbert_cluster_assign", oracle=_hilbert_oracle())
def hilbert_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering keys over (user, day) — the
    locality-preserving space-filling curve behind modern lakehouse
    clustering (better neighborhood preservation than the Morton keys
    of zorder_cluster_assign, which this entry twins: same 8-bit key
    space, same cluster = top-bits file assignment, so the two layouts
    are directly comparable). The xy2d transform unrolls its
    {BITS} rounds as one expression chain per row — map-only, zero
    shuffle; each round's (x, y, d) update is generated from ONE
    Python function into both the engine's selectExpr chain and the
    oracle's CTE chain, so the two cannot drift. The space-filling
    property (consecutive keys are grid-adjacent) is pinned
    exhaustively in tests/test_plans.py."""
    e = table(spark, sf_dir, "events").filter(in_time_domain(F.col("ts")))
    df = e.selectExpr(
        "event_id",
        "CAST(user_id & 255 AS BIGINT) AS x",
        "CAST(CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) & 255"
        " AS BIGINT) AS y",
        "CAST(0 AS BIGINT) AS d",
    )
    for s in _hilbert_steps():
        nx, ny, nd = _hilbert_round_exprs(s)
        df = df.selectExpr(
            "event_id",
            f"CAST({nx} AS BIGINT) AS x",
            f"CAST({ny} AS BIGINT) AS y",
            f"CAST({nd} AS BIGINT) AS d",
        )
    return df.selectExpr(
        "event_id",
        "d AS hvalue",
        f"CAST(d >> {_H_BITS} AS BIGINT) AS cluster",
    )


# ---- modularity of the nation partition ----------------------------------


@register(
    "modularity_nations",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    pe AS (
      SELECT p.ck, p.sk,
             CAST(c.c_nationkey AS BIGINT) AS cn,
             CAST(s.s_nationkey AS BIGINT) AS sn
      FROM pairs p
      JOIN customer c ON p.ck = c.c_custkey
      JOIN supplier s ON p.sk = s.s_suppkey
    ),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pe),
    intra AS (
      SELECT cn AS nation, CAST(count(*) AS BIGINT) AS e_c
      FROM pe WHERE cn = sn GROUP BY 1
    ),
    degc AS (SELECT cn AS nation, ck, count(*) AS d FROM pe GROUP BY 1, 2),
    degs AS (SELECT sn AS nation, sk, count(*) AS d FROM pe GROUP BY 1, 2),
    dsum AS (
      SELECT nation, CAST(sum(d) AS BIGINT) AS d_c
      FROM (SELECT nation, d FROM degc
            UNION ALL SELECT nation, d FROM degs)
      GROUP BY 1
    )
    SELECT ds.nation AS nationkey,
           COALESCE(i.e_c, 0) AS intra_edges,
           ds.d_c AS degree_sum,
           (floor(CAST(4 * mm.m * COALESCE(i.e_c, 0) - ds.d_c * ds.d_c
                       AS DOUBLE)
                  / CAST(4 * mm.m * mm.m AS DOUBLE) * 100000000 + 0.5)
            / 100000000) AS modularity_contrib
    FROM dsum ds LEFT JOIN intra i ON ds.nation = i.nation CROSS JOIN mm
    """,
)
def modularity_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the nation partition over the undirected
    customer↔supplier trading graph: per community c, Q_c = e_c/m −
    (d_c/2m)² where e_c = intra-community edges, d_c = summed degrees,
    m = total edges — the quality functional every community-detection
    method (Louvain/Leiden, and this repo's label_propagation_
    communities) optimizes, here evaluated for the geographic partition
    the schema already provides. The contribution collapses to ONE
    exact-integer expression (4·m·e_c − d_c²)/(4m²): both operands are
    bigint-exact (< 2^53 through sf1), so the quantized double division
    is bit-exact cross-engine. Σ over the 25 rows gives corpus Q;
    per-community rows are returned because they are the actionable
    readout (which nations actually trade internally).

    100 TB shape: pairs dedupe with one shuffle; the nation attributes
    broadcast onto the edge list; degrees are two partial-agg'd
    groupBys; everything after is |nations|-sized. m and the products
    pass 2^53 around ~5·10⁷ distinct trading pairs — switch the
    contribution numerator to DECIMAL(38,0) at that scale. The edge
    list is localCheckpointed once for its four consumers (m, intra,
    two degree passes)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("bigint").alias("cn")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("bigint").alias("sn")
    )
    pe = (
        pairs.join(F.broadcast(c), pairs.ck == c.c_custkey)
        .join(F.broadcast(s), pairs.sk == s.s_suppkey)
        .select("ck", "sk", "cn", "sn")
        .localCheckpoint(eager=True)  # four consumers below
    )
    mm = pe.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    intra = (
        pe.filter(F.col("cn") == F.col("sn"))
        .groupBy(F.col("cn").alias("nation"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    degc = pe.groupBy(F.col("cn").alias("nation"), "ck").agg(
        F.count(F.lit(1)).alias("d")
    )
    degs = pe.groupBy(F.col("sn").alias("nation"), "sk").agg(
        F.count(F.lit(1)).alias("d")
    )
    dsum = (
        degc.select("nation", "d")
        .unionAll(degs.select("nation", "d"))
        .groupBy("nation")
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    joined = (
        dsum.join(F.broadcast(intra), "nation", "left")
        .withColumn("e_c", F.coalesce(F.col("e_c"), F.lit(0)))
        .crossJoin(F.broadcast(mm))
    )
    return joined.select(
        F.col("nation").alias("nationkey"),
        F.col("e_c").alias("intra_edges"),
        F.col("d_c").alias("degree_sum"),
        round_half_up(
            (
                4 * F.col("m") * F.col("e_c") - F.col("d_c") * F.col("d_c")
            ).cast("double")
            / (4 * F.col("m") * F.col("m")).cast("double"),
            8,
        ).alias("modularity_contrib"),
    )


# --------------------------------------------------------------------------
# local clustering coefficient
# --------------------------------------------------------------------------


@register(
    "local_clustering_coefficient",
    oracle=f"""
    WITH e AS ({_TRI_EDGES_TMPL.format(cust="customer")}),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    t AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY node
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      GROUP BY node
    )
    SELECT d.node, d.deg,
           CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           (floor(2 * CAST(COALESCE(t.n_triangles, 0) AS DOUBLE)
                  / (CAST(d.deg AS DOUBLE) * (d.deg - 1))
                  * 1000000 + 0.5) / 1000000) AS lcc
    FROM deg d LEFT JOIN t ON d.node = t.node
    WHERE d.deg >= 2
    """,
)
def local_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-node local clustering coefficient over the affine referral
    graph: lcc(v) = 2*T_v / (deg_v*(deg_v-1)) — triangle_count's global
    number broken down to the per-node transitivity profile
    (Watts-Strogatz), the feature spam/fraud graph models key on
    (organic neighborhoods close triangles; bot farms don't). Each
    id-ordered triangle from the same wedge join credits all three
    corners via ONE explode, so the triangle stage is shared work, and
    the ratio is a single IEEE expression on exact integers.

    100 TB shape: the wedge join is the cost and at celebrity-skew
    scale it runs degree-ORIENTED exactly as triangle_count documents
    (orientation preserves per-triangle corner credits — the count is
    per triangle, not per wedge); degrees join back on node keys. The
    fixture keeps the oracle-shaped id ordering since the 1000-node
    graph cannot skew."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("_lcc_customer")
    e = spark.sql(
        _TRI_EDGES_TMPL.format(cust="_lcc_customer")
    ).localCheckpoint(eager=True)  # consumers: 3 wedge arms + 2 degree arms
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.explode(
                F.array(F.col("e1.a"), F.col("e1.b"), F.col("e2.b"))
            ).alias("node")
        )
    )
    t = tri.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    tt = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
    return (
        deg.join(t, "node", "left")
        .filter(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            tt.alias("n_triangles"),
            round_half_up(
                2 * tt.cast("double")
                / (F.col("deg").cast("double") * (F.col("deg") - 1)),
                6,
            ).alias("lcc"),
        )
    )
