"""Engine-portable rounding for ratio-valued doubles.

Built-in round() is NOT cross-engine stable on doubles: Spark rounds
the shortest-decimal-repr BigDecimal (HALF_UP), DuckDB shortens to ~15
significant digits first — so a value like 50/96*0.3 + … =
0.8402499999999999 rounds to 0.8402 in Spark but 0.8403 in DuckDB
(observed on the sf0.1 sweep). Any ratio of small integers rounded at
a scale finer than the ratio's decimal termination is exposed.

``round_half_up`` computes floor(x·10^k + 0.5)/10^k — every step is an
exact IEEE operation on the (verified bit-identical) input double, so
both engines agree by construction. ``duck_round`` emits the identical
formula for oracle SQL. Money-style values rounded at their own scale
(e.g. exact cent sums rounded to 2) are immune and keep built-in
round().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int) -> Column:
    s = float(10**scale)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def duck_round(expr: str, scale: int) -> str:
    s = 10**scale
    return f"(floor(({expr}) * {s} + 0.5) / {s})"


def exact_round(col: Column, scale: int = 0) -> Column:
    """Built-in round() for operands EXACT at the rounded scale — a
    representation normalization, not a float rounding decision.

    Safe iff the operand is the double image of a decimal with ≤
    ``scale`` fractional digits (cent-exact money columns, integer
    quantities, DECIMAL(p,≤scale) partial sums cast to double below
    2^53/10^scale). Such a double sits within ~1 ULP of k·10^-scale
    while the nearest rounding boundary is 0.5·10^-scale away — ~10
    orders of magnitude of margin — so Spark's BigDecimal HALF_UP and
    DuckDB's libm round() cannot disagree. Computed ratios, averages,
    percentiles, or raw float32 readings do NOT qualify: use
    ``round_half_up`` + ``duck_round`` for those (see module header).

    Calling this instead of F.round is the declaration that the
    exactness argument above has been checked for the operand;
    tests/test_rounding_lint.py rejects bare F.round in plan code so
    the declaration can't be skipped silently (VERDICT r06 item 4)."""
    return F.round(col, scale)
