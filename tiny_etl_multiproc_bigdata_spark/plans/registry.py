"""Central query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers a named query callable and, when SQL-expressible,
a DuckDB oracle twin. The driver hash-compares them at sf0.01; entries
without an oracle get a weaker rows-only check (streaming/stateful ops).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from tiny_etl_multiproc_bigdata_spark.plans import (  # noqa: F401
        advanced,
        collections,
        dedup_queries,
        extras,
        flagship,
        generators,
        ivf_kmeans,
        reference_ops,
        relational,
        scale_patterns,
        temporal_joins,
        text_queries,
        vector_queries,
        windows,
    )
    from tiny_etl_multiproc_bigdata_spark.operators import (  # noqa: F401
        grouped_pandas,
        multimodal,
    )
    from tiny_etl_multiproc_bigdata_spark.streaming import jobs  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
