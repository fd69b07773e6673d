"""IVF-style similarity search and iterative Lloyd k-means over the
embeddings table.

IVF (inverted file) is the second scale path for ANN next to LSH
(vector_queries.py): partition the corpus into coarse cells around
centroids, search only the query's cell. Here centroids are a
deterministic sample (every 100th vector) so the whole structure — and
its DuckDB oracle — is reproducible without training; `kmeans_lloyd`
below is the training loop that would refine them (iterative, hence
rows-only per the driver contract, with a monotone-inertia test).
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
