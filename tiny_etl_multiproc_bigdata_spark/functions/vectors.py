"""Vector math over ``array<float/double>`` columns — built-in
higher-order functions (``zip_with`` / ``aggregate``), no UDFs, so the
whole similarity pipeline stays JVM-side and codegen'd.

Accumulation is a strict left-to-right fold, which matches DuckDB's
list_* kernels and keeps cross-engine float results bit-comparable after
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
