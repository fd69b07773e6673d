"""The measurement INPUT CONTRACT for double-typed scalar columns
(r13 non-finite parity matrix extension — tools/null_parity_audit.py
``--nonfinite``).

Why the class exists: the r11 contract covered ``value IS NOT NULL``
only. A schema-legal non-finite double (NaN from a failed parse, ±Inf
from an upstream divide, a 1e308 corruption) is a DIFFERENT input, and
the engines diverge three ways on it:

* Spark 4 runs ANSI mode, so the registry's quantization idiom
  ``CAST(floor(value * Q + 0.5) AS BIGINT)`` throws
  ``ArithmeticException CAST_OVERFLOW`` on NaN/±Inf — one bad sensor
  reading takes down the whole query at corpus scale;
* DuckDB's identical oracle SQL raises ``ConversionException`` — the
  same crash for a different reason, at a different set of rows
  (DuckDB's ``floor`` keeps NaN where Spark's returns BIGINT 0);
* where neither side crashes the values silently corrupt: Spark
  saturates ``CAST(-Inf AS BIGINT)`` to Long.MIN inside aggregates
  (observed: a label centroid of -922337203685000.0 vs the oracle's
  -inf), and DuckDB's stddev/corr family raises Out-of-Range on ±Inf
  where Spark folds to NaN.

The symmetric contract: a usable measurement lies strictly inside the
QUANTIZATION-GRID DOMAIN — ``|x| < 2**53 / 1e6`` — the magnitude below
which ``x * Q`` stays on the exactly-representable double integer grid
for every quantization scale the registry uses (max 1e6). Outside the
grid the quantized value is undefined, exactly like a NULL, so the
contract is an explicit scan-pushed DROP on both engines.

One predicate shape, deliberately: ``x IS NULL OR (x > -LIM AND
x < LIM)``. The range conjuncts exclude NaN, +Inf, -Inf and
out-of-grid magnitudes identically in BOTH engines (NaN compares
greater than every value: first conjunct true, second false —
dropped) with no ``isnan``/``isfinite`` vendor spelling, and the
whole disjunction is still parquet-pushable (Or(IsNull, And(Gt,
Lt))). The ``IS NULL`` arm is LOAD-BEARING: NULL-value handling is
the r11 NULL-parity contract, decided per entry (windowed SUMs
deliberately keep NULL rows — an all-NULL frame must yield a NULL
sum, pinned by tests/test_plans.py's interval-RANGE pin; other
entries filter NULLs explicitly). The r13 contract covers only the
NEW input class — a PRESENT but non-finite/out-of-grid measurement —
and must compose with, never override, those r11 decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2**53 / 1e6: exact-integer-grid validity bound for every
# quantization scale (<= 1e6) used in the registry. Spelled as a
# literal so the engine predicate and the oracle SQL are guaranteed
# the same constant.
GRID_LIMIT = 9007199254.740992
assert GRID_LIMIT == 2.0**53 / 1e6


def in_grid_domain(c: Column) -> Column:
    """Engine-side measurement contract predicate (see module doc)."""
    return c.isNull() | ((c > F.lit(-GRID_LIMIT)) & (c < F.lit(GRID_LIMIT)))


def grid_domain_sql(col: str = "value") -> str:
    """DuckDB twin of ``in_grid_domain`` for oracle WHERE clauses."""
    return (
        f"({col} IS NULL OR ({col} > -9007199254.740992"
        f" AND {col} < 9007199254.740992))"
    )
