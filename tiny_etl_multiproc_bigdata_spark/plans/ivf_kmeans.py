"""IVF-style similarity search and iterative Lloyd k-means over the
embeddings table.

IVF (inverted file) is the second scale path for ANN next to LSH
(vector_queries.py): partition the corpus into coarse cells around
centroids, search only the query's cell. Here centroids are a
deterministic sample (every 100th vector) so the whole structure — and
its DuckDB oracle — is reproducible without training; `kmeans_lloyd`
below is the training loop that would refine them (float math,
rows-only, with a monotone-inertia test), and `kmeans_fixed_iters` is
its integer-quantized twin with a FULL value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.rounding import round_half_up
from tiny_etl_multiproc_bigdata_spark.functions.vectors import cosine_similarity
from tiny_etl_multiproc_bigdata_spark.plans.registry import register

_CENTROID_MOD = 100  # vec_id % 100 == 7 → deterministic centroid sample
_N_QUERIES = 5
_TOP_K = 10


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_cells(e: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroid set, rank by
    micro-scaled integer distance (cross-engine-stable ties). Shared by
    ann_ivf_topk and each kmeans_lloyd iteration — the 'cell' here and
    the k-means assignment step are the same primitive."""
    joined = e.crossJoin(F.broadcast(centroids))
    d = _l2sq(F.col("embedding"), F.col("cvec"))
    w = Window.partitionBy("vec_id").orderBy(
        F.floor(d * 1_000_000 + F.lit(0.5)).cast("bigint").asc(), F.asc("cid")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id", "embedding", F.col("cid").alias("cell"), d.alias("dist")
        )
    )


_DUCK_L2SQ = (
    "list_aggregate(list_transform(range(1, len({a}) + 1), "
    "i -> (({a})[i]::DOUBLE - ({b})[i]::DOUBLE)"
    " * (({a})[i]::DOUBLE - ({b})[i]::DOUBLE)), 'sum')"
)
_DUCK_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id % {_CENTROID_MOD} = 7
    ), assigned AS (
      SELECT vec_id, emb, cell FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, c.cid AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(floor({_DUCK_L2SQ.format(a="e.embedding::DOUBLE[]", b="c.cvec")} * 1000000 + 0.5) AS BIGINT) ASC,
                          c.cid ASC) AS rn
        FROM embeddings e, centroids c
      ) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, emb AS qv, cell FROM assigned
      WHERE vec_id < {_N_QUERIES}
    ), scored AS (
      SELECT q.query_id, a.vec_id AS candidate_id,
             {_DUCK_COS.format(a="q.qv", b="a.emb")} AS cos
      FROM q JOIN assigned a ON a.cell = q.cell AND a.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, candidate_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY CAST(floor(cos * 1000000 + 0.5) AS BIGINT) DESC,
                                         candidate_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, candidate_id, (floor(cos * 10000 + 0.5) / 10000) AS cosine, rn
    FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign every vector to its nearest coarse centroid
    (broadcast centroid set — one corpus scan, no shuffle), then search
    only the query's cell. Cells ≈ corpus/|centroids|, so each query
    compares ~1/50th of the corpus; recall rises with multi-cell
    probing, same plan shape."""
    e = table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") % _CENTROID_MOD == 7).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assigned = _assign_cells(e, centroids)
    q = assigned.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    scored = (
        F.broadcast(q)
        .join(
            assigned,
            (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("candidate_id"),
            cosine_similarity(F.col("qv"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.floor(F.col("cos") * 1_000_000 + F.lit(0.5)).cast("bigint").desc(), F.asc("candidate_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "candidate_id", round_half_up(F.col("cos"), 4).alias("cosine"), "rn")
    )


@register("kmeans_lloyd", oracle=None)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, 3 iterations (rows-only: iterative algorithms
    have no single-statement SQL twin — driver contract's documented
    exception). The distributed iteration pattern: per-iteration
    assign (broadcast centroids) → recompute means (one partial+final
    agg over posexploded components) → collect the tiny centroid set
    back to the driver for the next broadcast. Deterministic start
    (every 100th vector) and integer-scaled distance ranking keep runs
    reproducible. Returns per-cluster sizes and rounded inertia."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e.persist()
    centroids = [
        (r.cid, list(r.cvec))
        for r in e.filter(F.col("vec_id") % _CENTROID_MOD == 7)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
        .collect()
    ]
    assigned = None
    for _ in range(3):
        cdf = spark.createDataFrame(
            [(cid, [float(x) for x in vec]) for cid, vec in centroids],
            "cid long, cvec array<double>",
        )
        assigned = _assign_cells(e, cdf)
        # new means: posexplode components → groupBy (cell, pos) avg →
        # regroup to arrays; stays fully distributed
        comp = assigned.select(
            "cell", F.posexplode(F.col("embedding")).alias("pos", "x")
        )
        means = (
            comp.groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("cvec"))
        )
        centroids = [(r.cell, list(r.cvec)) for r in means.collect()]
    # the cache paid for itself across the per-iteration collect()s;
    # release it before returning (the final agg just recomputes one
    # scan) so repeated registry sweeps don't accumulate pinned blocks
    e.unpersist()
    return assigned.groupBy("cell").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum(F.col("dist").cast("decimal(30,8)")).cast("double"), 2).alias(
            "inertia"
        ),
    )


# ---- kmeans_fixed_iters: the value-hash upgrade of kmeans_lloyd ----
#
# Same recurrence as kmeans_lloyd but in PURE INTEGER arithmetic so the
# result is bit-identical across engines/partitionings (the
# pagerank_scaled pattern, graph_ops.py): components quantize once to
# integer micro-units, distances are exact integer sums of squares,
# argmin ties break (d, cid), and centroid updates use integer floor
# division. Everything runs in a translation-invariant OFFSET space
# (q = quant(v) + _KM_OFFSET > 0): distances are unchanged by the
# shift, and floor-dividing sums of positive integers is where Spark's
# truncating `div` and DuckDB's flooring `//` provably agree — the one
# semantic trap of cross-engine integer division. _KM_OFFSET = 2e6
# keeps q positive for any |v| < 1.5 (fixture max |v| ≈ 0.58; the
# margin is pinned in tests/test_kmeans.py so a hotter future vintage
# fails loudly there instead of silently flipping a division).
_KM_SCALE = 1_000_000
_KM_OFFSET = 2_000_000
_KM_ITERS = 3

_DUCK_KM_COMP = (
    "SELECT vec_id, x.i AS pos,\n"
    "             CAST(floor(CAST(x.v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)\n"
    "               + 2000000 AS q\n"
    "      FROM embeddings,\n"
    "           unnest(list_transform(range(1, len(embedding) + 1),\n"
    "                                 i -> {'i': i, 'v': embedding[i]})) AS t(x)"
)


def _kmeans_oracle() -> str:
    parts = [
        f"""
    WITH comp AS (
      {_DUCK_KM_COMP}
    ),
    cent0 AS (
      SELECT vec_id AS cid, pos, q AS cq
      FROM comp WHERE vec_id % {_CENTROID_MOD} = 7
    )"""
    ]
    for k in range(1, _KM_ITERS + 1):
        parts.append(
            f""",
    dist{k} AS (
      SELECT c.vec_id, ct.cid,
             CAST(sum((c.q - ct.cq) * (c.q - ct.cq)) AS BIGINT) AS d
      FROM comp c JOIN cent{k - 1} ct ON ct.pos = c.pos
      GROUP BY c.vec_id, ct.cid
    ),
    assign{k} AS (
      SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM dist{k}
      ) WHERE rn = 1
    )"""
        )
        if k < _KM_ITERS:
            parts.append(
                f""",
    cent{k} AS (
      SELECT a.cid, c.pos, CAST(sum(c.q) // count(*) AS BIGINT) AS cq
      FROM assign{k} a JOIN comp c ON c.vec_id = a.vec_id
      GROUP BY a.cid, c.pos
    )"""
            )
    parts.append(
        f"""
    SELECT cid AS cell, count(*) AS n_vectors,
           CAST(sum(d) AS BIGINT) AS inertia_q
    FROM assign{_KM_ITERS}
    GROUP BY cid"""
    )
    return "".join(parts)


@register("kmeans_fixed_iters", oracle=_kmeans_oracle())
def kmeans_fixed_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means, {ITERS} fixed iterations, with a FULL value-hash
    oracle — the upgrade of ``kmeans_lloyd`` from rows-only to exact
    (VERDICT r05 item 1): integer micro-unit quantization makes every
    assignment, centroid update and the final inertia bit-identical to
    the chained-CTE DuckDB twin. See the module comment above
    ``_KM_SCALE`` for the offset-space floor-division argument.

    Scale shape per iteration: one pos-keyed join of the exploded
    corpus against the (k·64)-row centroid table — broadcast-sized at
    any corpus scale — partial+final agg to (vec_id, cid) distances, a
    vec_id-partitioned argmin window, and a vec_id-keyed regroup for
    the next centroid table. The exploded corpus is localCheckpointed
    once for its 2·ITERS−1 consumers (the minhash lesson). Inertia sums
    stay < 2^63 to ~10^5 vectors at this scale/offset; beyond that,
    aggregate d in DECIMAL(38,0) (the embedding_standardize recipe).
    Unlike kmeans_lloyd no centroid ever touches the driver: the loop
    builds one lazy Catalyst plan of bounded depth (fixed ITERS), so
    the same code runs unchanged on a 1000-executor cluster."""
    e = table(spark, sf_dir, "embeddings")
    comp = (
        e.select("vec_id", F.posexplode("embedding").alias("pos0", "v"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            (
                F.floor(
                    F.col("v").cast("double") * _KM_SCALE + F.lit(0.5)
                ).cast("bigint")
                + F.lit(_KM_OFFSET)
            ).alias("q"),
        )
        .localCheckpoint(eager=True)
    )
    cent = comp.filter(F.col("vec_id") % _CENTROID_MOD == 7).select(
        F.col("vec_id").alias("cid"), "pos", F.col("q").alias("cq")
    )
    assign = None
    for it in range(_KM_ITERS):
        diff = F.col("c.q") - F.col("ct.cq")
        dist = (
            comp.alias("c")
            .join(F.broadcast(cent.alias("ct")), F.col("c.pos") == F.col("ct.pos"))
            .groupBy(F.col("c.vec_id").alias("vec_id"), F.col("ct.cid").alias("cid"))
            .agg(F.sum(diff * diff).cast("bigint").alias("d"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cid"))
        assign = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "d")
        )
        if it < _KM_ITERS - 1:
            cent = (
                assign.join(comp, "vec_id")
                .groupBy("cid", "pos")
                .agg(F.expr("CAST(sum(q) div count(*) AS BIGINT)").alias("cq"))
            )
    return assign.groupBy(F.col("cid").alias("cell")).agg(
        F.count("*").alias("n_vectors"),
        F.sum("d").cast("bigint").alias("inertia_q"),
    )


_N_PROBES = 2


@register(
    "ann_ivf_multiprobe",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id % {_CENTROID_MOD} = 7
    ), assigned AS (
      SELECT vec_id, emb, cell FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, c.cid AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(floor({_DUCK_L2SQ.format(a="e.embedding::DOUBLE[]", b="c.cvec")} * 1000000 + 0.5) AS BIGINT) ASC,
                          c.cid ASC) AS rn
        FROM embeddings e, centroids c
      ) WHERE rn = 1
    ), qcells AS (
      SELECT vec_id AS query_id, emb AS qv, cell AS qcell FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, c.cid AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(floor({_DUCK_L2SQ.format(a="e.embedding::DOUBLE[]", b="c.cvec")} * 1000000 + 0.5) AS BIGINT) ASC,
                          c.cid ASC) AS rn
        FROM embeddings e, centroids c
        WHERE e.vec_id < {_N_QUERIES}
      ) WHERE rn <= {_N_PROBES}
    ), scored AS (
      SELECT q.query_id, a.vec_id AS candidate_id,
             {_DUCK_COS.format(a="q.qv", b="a.emb")} AS cos
      FROM qcells q JOIN assigned a
        ON a.cell = q.qcell AND a.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, candidate_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY CAST(floor(cos * 1000000 + 0.5) AS BIGINT) DESC,
                                         candidate_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, candidate_id, (floor(cos * 10000 + 0.5) / 10000) AS cosine, rn
    FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN: queries search their 2 (_N_PROBES) nearest
    cells instead of one — the standard recall lever (a query near a
    cell boundary misses true neighbors assigned to the adjacent cell;
    probing both recovers them at ~2× the candidate cost, still
    ~2/|centroids| of the corpus). The corpus keeps single-cell
    assignment; only the tiny query set fans out, so the broadcast
    query table doubles and nothing else changes — identical plan
    shape to ann_ivf_topk. Candidate sets from different probes are
    disjoint by construction (each corpus vector lives in exactly one
    cell), so no dedup stage is needed."""
    e = table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") % _CENTROID_MOD == 7).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assigned = _assign_cells(e, centroids)
    # query-side: top-_N_PROBES cells (rn <= P instead of == 1)
    qj = e.filter(F.col("vec_id") < _N_QUERIES).crossJoin(
        F.broadcast(centroids)
    )
    qd = _l2sq(F.col("embedding"), F.col("cvec"))
    qw = Window.partitionBy("vec_id").orderBy(
        F.floor(qd * 1_000_000 + F.lit(0.5)).cast("bigint").asc(),
        F.asc("cid"),
    )
    qcells = (
        qj.withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _N_PROBES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("cid").alias("qcell"),
        )
    )
    scored = (
        F.broadcast(qcells)
        .join(
            assigned,
            (F.col("cell") == F.col("qcell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("candidate_id"),
            cosine_similarity(F.col("qv"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.floor(F.col("cos") * 1_000_000 + F.lit(0.5)).cast("bigint").desc(),
        F.asc("candidate_id"),
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "query_id",
            "candidate_id",
            round_half_up(F.col("cos"), 4).alias("cosine"),
            "rn",
        )
    )
