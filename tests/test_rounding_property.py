"""Property test for functions/rounding.py: the portable round must
produce identical results in Spark and DuckDB for arbitrary doubles —
including the adversarial ratio-of-small-ints class that breaks the
engines' built-in round()."""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# adversarial values: small-integer ratios (terminate near round
# boundaries) mixed with random doubles
_ratios = st.tuples(
    st.integers(min_value=0, max_value=500), st.integers(min_value=1, max_value=128)
).map(lambda t: float(Fraction(t[0], t[1])))
_doubles = st.floats(
    min_value=0.0, max_value=1000.0, allow_nan=False, allow_infinity=False
)
_vals = st.one_of(_ratios, _doubles)


@settings(max_examples=3, deadline=None)
@given(st.lists(_vals, min_size=50, max_size=50), st.sampled_from([2, 4, 6]))
def test_round_half_up_cross_engine(spark, values, scale):
    from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
        duck_round,
        round_half_up,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["i", "x"]
    )
    got_spark = {
        r.i: r.r
        for r in df.select("i", round_half_up(F.col("x"), scale).alias("r")).collect()
    }
    con = duckdb.connect()
    expr = duck_round("x", scale)
    got_duck = {
        i: con.execute(f"SELECT {expr} FROM (SELECT {v!r}::DOUBLE AS x)").fetchone()[0]
        for i, v in enumerate(values)
    }
    for i in range(len(values)):
        assert got_spark[i] == got_duck[i], (
            f"portable round diverged at {values[i]!r} scale {scale}: "
            f"spark={got_spark[i]!r} duck={got_duck[i]!r}"
        )
