"""Driver-shaped correctness gate, run locally at sf0.001: every
registry query with an oracle must hash-match DuckDB order-insensitively.
"""

from __future__ import annotations

import pytest

from compare import compare


def _cases():
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        queries,
    )

    q = queries()
    return [
        (name, q[name], REGISTRY[name].oracle, REGISTRY[name].ulp_sensitive)
        for name in sorted(q)
    ]


@pytest.mark.parametrize(
    "name,fn,oracle,ulp_sensitive", _cases(), ids=[c[0] for c in _cases()]
)
def test_query_matches_oracle(spark, duck, sf_dir, name, fn, oracle, ulp_sensitive):
    df = fn(spark, sf_dir)
    assert df is not None, f"{name} returned None"
    if oracle is None:
        # rows-only check (streaming / non-SQL-expressible)
        assert df.count() >= 0
        return
    # ulp_sensitive entries compare with the driver's exact float
    # semantics so a boundary-landing vintage reds here first
    problems = compare(df, duck, oracle, exact_floats=ulp_sensitive)
    assert not problems, f"{name}: " + "; ".join(problems)
