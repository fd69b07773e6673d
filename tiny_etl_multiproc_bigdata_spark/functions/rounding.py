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
