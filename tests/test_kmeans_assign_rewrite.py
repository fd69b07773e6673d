"""Equivalence pin for the r14 `_km_assign` rewrite (ivf_kmeans.py).

The r14 optimization replaces the per-iteration N×64×k pos-join +
window argmin with a cogrouped NumPy int64 matmul (guide §4.2/§3.3,
VERDICT r13 item 4). This test keeps the OLD lowering verbatim and
asserts the full assignment frame (vec_id, cid, d) — not just the
aggregated query output — is bit-identical at two SFs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
import pytest

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.vectors import (
    is_complete_vector,
)
from tiny_etl_multiproc_bigdata_spark.plans.ivf_kmeans import (
    _CENTROID_MOD,
    _KM_ITERS,
    _KM_OFFSET,
    _KM_SCALE,
    _km_assign,
)


def _km_assign_old(spark, sf_dir):
    """The pre-r14 lowering, verbatim (ivf_kmeans.py @ 2ff3797)."""
    e = table(spark, sf_dir, "embeddings").filter(
        is_complete_vector(F.col("embedding"))
    )
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
            .join(
                F.broadcast(cent.alias("ct")),
                F.col("c.pos") == F.col("ct.pos"),
            )
            .groupBy(
                F.col("c.vec_id").alias("vec_id"),
                F.col("ct.cid").alias("cid"),
            )
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
    return comp, assign


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_km_assign_bit_identical(spark, sf):
    sf_dir = f"/root/testdata/sf{sf}"
    _, new_assign = _km_assign(spark, sf_dir)
    _, old_assign = _km_assign_old(spark, sf_dir)
    new_rows = sorted(map(tuple, new_assign.collect()))
    old_rows = sorted(map(tuple, old_assign.collect()))
    assert new_rows == old_rows
    assert len(new_rows) > 0


@pytest.mark.parametrize("sf", ["0.001"])
def test_km_comp_view_matches_old(spark, sf):
    """The lazy comp view (silhouette's input) carries the same rows
    as the old checkpointed comp table."""
    sf_dir = f"/root/testdata/sf{sf}"
    new_comp, _ = _km_assign(spark, sf_dir)
    old_comp, _ = _km_assign_old(spark, sf_dir)
    assert sorted(map(tuple, new_comp.collect())) == sorted(
        map(tuple, old_comp.collect())
    )
