"""Skew handling demonstrated under ACTUAL skew (VERDICT r05 item 5).

The salting entries (scale_patterns.py) and AQE's skew-join split were
correct-by-construction but never exercised against a genuinely hot
key. These tests amplify a deliberately skewed distribution to 10^7
rows — one celebrity key owning ~90% of the fact side, the
key_skew_profile shape — and pin, mechanically:

1. the salted join beats the unsalted sort-merge join (wall clock, AQE
   off so the comparison isolates the salting itself), with identical
   results;
2. AQE's skew-join split activates on the unsalted plan
   (``skew=true`` on the SortMergeJoin node of the final adaptive
   plan) once the skewed-partition thresholds are sized to the data.

Measured numbers live in SCALE_NOTES.md §"Skew under amplification".
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from conftest import confs

N_ROWS = 10_000_000
N_KEYS = 1_000
N_SALT = 16


def _skewed_fact(spark):
    # 90% of rows carry key 0 (the celebrity), the rest spread uniformly
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % N_KEYS)
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 97).cast("bigint").alias("payload"),
    )


def _dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("w")
    )


def _unsalted(spark):
    f, d = _skewed_fact(spark), _dim(spark)
    return f.join(d, "k").agg(
        F.sum(F.col("payload") * F.col("w")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def _salted(spark):
    # the skew_salted_join pattern at amplified scale: deterministic
    # per-row salt on the hot side, dim replicated across all salts
    f = _skewed_fact(spark).withColumn(
        "salt", (F.col("payload") % N_SALT).cast("int")
    )
    d = _dim(spark).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
    )
    return f.join(d, ["k", "salt"]).agg(
        F.sum(F.col("payload") * F.col("w")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


# 1-min load above which a LOSING wall-clock comparison is attributed
# to machine contention, not a salting regression (the r10 board saw
# one spurious red when a concurrent local[16] sf0.1 sweep ran during
# this test). A WIN always passes regardless of load; a loss on a
# quiet machine still fails after the retries.
_LOAD_SKIP = 12.0
_ATTEMPTS = 3


def test_salted_join_beats_unsalted_under_skew(spark):
    """AQE and broadcast OFF so both plans are shuffle sort-merge joins
    and the only difference is the salt: unsalted puts ~9M rows of key
    0 in ONE reducer task; salted spreads them over N_SALT (key, salt)
    groups. Same answer, bounded max task — the wall-clock gap is the
    point. Deflaked (VERDICT r10 item 4): retries on a loss, and skips
    only when EVERY losing attempt coincided with a loaded machine —
    wall-clock under contention says nothing about the plan, but one
    quiet losing attempt is a real signal and still fails."""
    attempts = []
    loads = []
    for _ in range(_ATTEMPTS):
        with confs(
            spark,
            spark__sql__adaptive__enabled="false",
            spark__sql__autoBroadcastJoinThreshold="-1",
        ):
            un = _unsalted(spark)
            sa = _salted(spark)
            assert (
                "SortMergeJoin"
                in un._jdf.queryExecution().executedPlan().toString()
            )

            t0 = time.monotonic()
            r_un = un.collect()
            t_un = time.monotonic() - t0

            t0 = time.monotonic()
            r_sa = sa.collect()
            t_sa = time.monotonic() - t0

        # value equality is load-independent — asserted on every attempt
        assert [tuple(r) for r in r_un] == [tuple(r) for r in r_sa]
        assert r_un[0]["n"] == N_ROWS
        # the hot reducer is ~9M rows vs ~max(1/N_SALT) after salting;
        # even with scheduling noise the salted run must win clearly
        if t_sa < t_un * 0.8:
            return
        loads.append(os.getloadavg()[0])
        attempts.append(
            f"salted={t_sa:.2f}s unsalted={t_un:.2f}s load={loads[-1]:.1f}"
        )
    # All attempts lost. Skip ONLY if every loss coincided with a
    # loaded machine — skipping on the first loaded loss would let a
    # real salting regression hide forever on a busy box, and would
    # waste the remaining retries on a transient spike.
    if min(loads) > _LOAD_SKIP:
        pytest.skip(
            "machine loaded during every losing attempt — wall-clock "
            "comparison not meaningful: " + "; ".join(attempts)
        )
    pytest.fail(
        "salting no longer pays under skew (quiet machine on at least "
        f"one of {_ATTEMPTS} attempts): " + "; ".join(attempts)
    )


def test_aqe_skew_join_split_activates(spark):
    """The automatic path: same unsalted join, AQE ON with the skew
    thresholds sized to the fixture (the defaults target 256 MiB
    cluster shuffles). The final adaptive plan must carry the
    ``skew=true`` marker on the sort-merge join — proof the runtime
    split actually fired, not just that the conf was set."""
    with confs(
        spark,
        spark__sql__adaptive__enabled="true",
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__enabled="true",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="4m",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="4m",
        spark__sql__adaptive__coalescePartitions__enabled="false",
    ):
        df = _unsalted(spark)
        rows = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert rows[0]["n"] == N_ROWS
    assert "skew=true" in plan, plan
