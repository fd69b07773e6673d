"""Focused equivalence pins for the r13 gram_from_embeddings rewrite
(explode of d(d+1)/2 structs → one Arrow boundary + per-partition
int64 matmul). The rewrite must be bit-identical to the old explode
lowering on every input shape the old one accepted: the fixture corpus,
ragged lengths, NULL rows, empty arrays, empty input, and skewed
partitionings (partial triangles merge across tasks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.plans.vector_queries import (
    _GRAM_Q,
    gram_from_embeddings,
)


def _gram_explode_reference(e):
    """The pre-r13 lowering, kept verbatim as the semantic reference."""
    q = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * _GRAM_Q + 0.5).cast("bigint"),
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                q,
                lambda xi, i: F.transform(
                    q,
                    lambda xj, j: F.struct(
                        (i + 1).alias("i"),
                        (j + 1).alias("j"),
                        (xi * xj).alias("prod"),
                    ),
                ),
            )
        ),
        lambda s: s["j"] >= s["i"],
    )
    return (
        e.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .agg(F.sum("p.prod").cast("bigint").alias("gram_units"))
    )


def _as_dict(df):
    return {(r["i"], r["j"]): r["gram_units"] for r in df.collect()}


def test_gram_rewrite_matches_explode_on_fixture(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("embedding")
    assert _as_dict(gram_from_embeddings(e)) == _as_dict(
        _gram_explode_reference(e)
    )


def test_gram_rewrite_ragged_null_and_empty_rows(spark):
    rows = [
        ([1.0] * 64,),
        ([0.5] * 3,),
        (None,),
        ([],),
        ([2.0] * 64,),
        ([0.25, -0.75, 1.5, -2.25, 3.0],),
        ([-1.0],),
    ]
    e = spark.createDataFrame(rows, "embedding: array<double>")
    got = _as_dict(gram_from_embeddings(e))
    want = _as_dict(_gram_explode_reference(e))
    assert got == want
    # key set is the triangle of the longest row (64), incl. pairs only
    # the 64-dim rows reach
    assert len(got) == 64 * 65 // 2


def test_gram_rewrite_empty_input(spark):
    e = spark.createDataFrame([], "embedding: array<double>")
    assert gram_from_embeddings(e).count() == 0


def test_gram_rewrite_partitioning_invariant(spark, sf_dir):
    """Partial triangles from differently-sized tasks must merge to the
    same exact integers (modular int64 addition is associative)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("embedding")
    one = _as_dict(gram_from_embeddings(e.coalesce(1)))
    many = _as_dict(gram_from_embeddings(e.repartition(7)))
    assert one == many
