"""Fixture catalog: the driver-generated TPC-H-ish parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

At cluster scale these would be partitioned/bucketed parquet datasets; the
read path is identical (``spark.read.parquet``) and all engine code keeps
filters/projections declarative so parquet pushdown + pruning apply.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The fixture generator has shipped `ts` two ways across rounds:
        # TIMESTAMP(NANOS) (which Spark's reader rejects without the
        # legacy conf — read as int64 nanos, then integer-`div` to micros;
        # double division would lose precision on ~1.7e18 nanos) and plain
        # TIMESTAMP(MICROS). Branch on the actual dtype so the engine
        # works against either vintage, and normalize to TIMESTAMP_NTZ,
        # matching DuckDB's naive timestamps.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            # NTZ-pure conversion: epoch micros added to an NTZ zero
            # point stays in the NTZ domain end to end. The previous
            # lowering (timestamp_micros(..).cast("timestamp_ntz"))
            # went through TIMESTAMP_LTZ, and LTZ->NTZ renders the
            # instant in the SESSION time zone — on any cluster whose
            # TZ isn't UTC, every nanos-vintage event shifted by the
            # zone offset while the oracle read the same bytes as
            # naive UTC wall-clock (found by the r12 TZ-perturbation
            # arm of tools/partition_invariance_audit.py; latent-only:
            # committed fixtures are micros-vintage and this branch is
            # untaken on them).
            # `div` truncates toward zero, which for PRE-epoch nanos
            # that aren't a whole microsecond rounds up by 1µs versus
            # floor semantics. That is DELIBERATE: DuckDB's native
            # TIMESTAMP(NANOS)→micros read truncates toward zero too
            # (verified empirically: -1500ns → -1µs, -999ns → 0µs), so
            # trunc — not floor — is the parity-correct choice; floor
            # division would diverge from the oracle on every pre-epoch
            # sub-µs value (pinned cross-engine in
            # tests/test_catalog_vintages.py::test_nanos_preepoch_parity).
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view (mirrors the DuckDB
    oracle, which pre-registers same-named views)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
