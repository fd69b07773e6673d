"""Physical-plan budget lint (r07 plan audit, made permanent): every
batch registry entry's executed plan must stay within a parquet-scan
budget. Multi-consumer lineage re-execution multiplies CORRECT results
by integer work factors that value sweeps cannot see (HITS re-ran its
edge build 16x, triangle_count scanned customer 45x before the r07
barriers) — the node count is the only cheap detector. Budget 8 covers
the documented eval compositions (ivf/pq recall run an index path AND
an exact path); anything above has historically been a genuine bug."""

from __future__ import annotations

import re

import pytest

from conftest import SF_DIR

_SCAN_BUDGET = 8


def _batch_entries():
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    return sorted(n for n in REGISTRY if not n.startswith("streaming_"))


@pytest.mark.parametrize("name", _batch_entries())
def test_plan_scan_budget(spark, name):
    from tiny_etl_multiproc_bigdata_spark.plans.registry import REGISTRY

    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = len(re.findall(r"Scan parquet", plan))
    assert scans <= _SCAN_BUDGET, (
        f"{name}: {scans} parquet scans in one plan (budget "
        f"{_SCAN_BUDGET}) — a multi-consumer subtree is probably "
        "re-executing; pin it with localCheckpoint (see SCALE_NOTES r07)"
    )
