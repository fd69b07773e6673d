"""Driver-shaped correctness gate, run locally at sf0.001: every
registry query with an oracle must hash-match DuckDB order-insensitively.
"""

from __future__ import annotations

import pytest

from compare import compare


def _cases():
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        oracle_sql,
        queries,
    )

    q = queries()
    o = oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, sf_dir, name, fn, oracle):
    df = fn(spark, sf_dir)
    assert df is not None, f"{name} returned None"
    if oracle is None:
        # rows-only check (streaming / non-SQL-expressible)
        assert df.count() >= 0
        return
    problems = compare(df, duck, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
