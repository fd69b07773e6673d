"""Knob-desync regression pin for the winnowing (k, w) knobs (VERDICT
r07 item 2).

The r07 ADVICE class: the engine and oracle each encode the window
width w as a GENERATED operand list; before the fix one side
hard-coded 4 operands, so tuning _WIN_W skewed only the other side —
a silent value divergence that no default-knob sweep can see. Both
sides are now generated from explicit (k, w) parameters
(corpus_ops.win_fingerprint_oracle / winnow_fingerprints); this test
re-runs the full engine-vs-DuckDB comparison at PERTURBED knob values,
so any future edit that re-hard-codes an operand count, window bound,
or length pre-filter on one side goes red here instead of waiting for
a knob tweak to ship wrong values.
"""

from __future__ import annotations

import pytest

from compare import compare
from conftest import SF_DIR

from pyspark.sql import functions as F

# perturb BOTH knobs away from the module defaults (k=5, w=4), in both
# directions — narrower and wider windows exercise different operand
# counts and length cutoffs
_KNOBS = [(4, 3), (6, 5), (5, 7)]


@pytest.mark.parametrize("k,w", _KNOBS)
def test_winnow_engine_oracle_lockstep(spark, duck, k, w):
    from tiny_etl_multiproc_bigdata_spark.catalog import table
    from tiny_etl_multiproc_bigdata_spark.plans.corpus_ops import (
        win_fingerprint_oracle,
        winnow_fingerprints,
    )

    d = table(spark, SF_DIR, "documents")
    base = d.select("doc_id", F.lower("text").alias("low")).where(
        F.length("low") >= k + w - 1
    )
    mismatches = compare(
        winnow_fingerprints(base, k=k, w=w),
        duck,
        win_fingerprint_oracle(k, w),
    )
    assert not mismatches, f"(k={k}, w={w}): {mismatches}"
