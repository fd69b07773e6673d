from __future__ import annotations

import contextlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tiny_etl_multiproc_bigdata_spark.session import get_spark

    # small local session for unit tests; shuffle partitions low so tiny
    # fixtures don't pay 32-task scheduling overhead per stage
    spark = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    from compare import duck_connect

    return duck_connect(SF_DIR)


@contextlib.contextmanager
def confs(spark, **kv):
    """Temporarily set Spark SQL confs (double-underscore = dot);
    restores (or unsets) previous values on exit. Shared by the
    skew/AQE and Bloom-pruning tests."""
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)
