"""The events fixture has shipped `ts` two ways across driver rounds:
TIMESTAMP(NANOS) (Spark reads it only as int64 via the legacy conf) and
native TIMESTAMP(MICROS). catalog.table and the streaming source branch
on the actual dtype; these tests pin that both vintages normalize to
identical values, using a synthesized nanos twin of the real fixture.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tiny_etl_multiproc_bigdata_spark.catalog import table


@pytest.fixture(scope="module")
def nanos_sf_dir(tmp_path_factory, sf_dir) -> str:
    """A copy of the fixture dir where events.ts is TIMESTAMP(NANOS) —
    the pre-r4 on-disk encoding (other tables symlinked unchanged)."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts_ns = src.column("ts").cast(pa.timestamp("ns"))
    nanos = src.set_column(src.schema.get_field_index("ts"), "ts", ts_ns)
    out = tmp_path_factory.mktemp("nanos_vintage")
    pq.write_table(nanos, os.path.join(str(out), "events.parquet"))
    for name in os.listdir(sf_dir):
        if name != "events.parquet":
            os.symlink(
                os.path.join(sf_dir, name), os.path.join(str(out), name)
            )
    return str(out)


def test_catalog_normalizes_both_vintages(spark, sf_dir, nanos_sf_dir):
    new = table(spark, sf_dir, "events")
    old = table(spark, nanos_sf_dir, "events")
    assert new.schema == old.schema
    assert str(new.schema["ts"].dataType) == "TimestampNTZType()"
    a = sorted(new.select("event_id", "ts").collect())
    b = sorted(old.select("event_id", "ts").collect())
    assert a == b


def test_streaming_source_normalizes_both_vintages(spark, sf_dir, nanos_sf_dir):
    from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
        _events_stream,
        _run_to_memory,
    )

    from pyspark.sql import functions as F

    # compare epoch micros, not collected datetimes: collect() renders
    # TimestampType through the OS timezone, which must not matter here
    outs = []
    for d in (sf_dir, nanos_sf_dir):
        df = _events_stream(spark, d)
        mem = _run_to_memory(df, spark, "vintage", "append")
        outs.append(
            sorted(
                mem.select("event_id", F.unix_micros("ts").alias("us")).collect()
            )
        )
    assert outs[0] == outs[1]
    # the LTZ instant must equal the naive value interpreted as UTC —
    # pin against the batch NTZ read via the tz-free epoch expression
    batch = dict(
        table(spark, sf_dir, "events")
        .select(
            "event_id",
            (
                F.to_unix_timestamp("ts") * F.lit(1_000_000).cast("bigint")
                + F.date_format("ts", "SSSSSS").cast("bigint")
            ).alias("us"),
        )
        .limit(50)
        .collect()
    )
    streamed = dict(outs[0])
    for eid, us in batch.items():
        assert streamed[eid] == us
