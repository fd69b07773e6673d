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


def is_complete_vector(a: Column) -> Column:
    """The embeddings INPUT CONTRACT predicate (r12 NULL-parity matrix
    extension): a usable vector is non-NULL and has no NULL elements.

    Why the class exists: the r11 contract covered ``embedding IS NOT
    NULL`` only; an array with NULL *elements* (the realistic shape of
    a partially-failed decode at corpus scale — schema-legal, the
    parquet list element is nullable) is a DIFFERENT input. Spark's
    ``aggregate``/``zip_with`` folds NULL-propagate element-wise while
    DuckDB's ``list_inner_product`` REFUSES NULL elements outright
    (InvalidInputException), so any similarity query diverged —
    crash-on-one-side — the moment such a row appeared (18 entries,
    found by extending tools/null_parity_audit.py's spike matrix). A
    vector missing a dimension is not comparable under dot/cosine
    (treating the hole as 0 silently biases every distance), so the
    symmetric contract is an explicit scan-pushed DROP on both engines
    — the oracle-side twin is ``COMPLETE_VECTOR_SQL``."""
    return a.isNotNull() & ~F.exists(a, lambda x: x.isNull())


def complete_vector_sql(col: str = "embedding") -> str:
    """DuckDB twin of ``is_complete_vector`` for oracle WHERE clauses."""
    return (
        f"{col} IS NOT NULL"
        f" AND length(list_filter({col}, x -> x IS NULL)) = 0"
    )
