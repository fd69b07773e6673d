"""The event-time INPUT CONTRACT for ``events.ts`` (r13 extreme-
timestamp parity matrix — tools/null_parity_audit.py ``--timeskew``).

Why the class exists: a timestamp column in a real log pipeline
carries clock/unit corruption that is perfectly schema-legal int64
micros: a zeroed field (epoch exactly), a wrong-century parse (1890),
a far-future sentinel (9999-12-31), a nanos-written-as-micros unit
bug (year 57552), a negative overflow (pre-0001). Both engines
COMPUTE on all of them — micros span ±292k years — but the
beyond-``datetime`` values (year > 9999 or < 1) diverge at the
client boundary and inside event-time machinery:

* Spark's driver/Arrow conversion CRASHES at collect
  (``ValueError: year 57552 is out of range``) for any entry that
  returns a ts-derived column (a date, a window bound, the raw ts) —
  one corrupt row takes down the whole query;
* DuckDB silently DEGRADES the same cell to a VARCHAR rendering
  ('57552-01-18') — no crash, a type-skewed wrong answer;
* a single year-57552 event advances a streaming WATERMARK past
  every honest row — the silent drop-everything failure mode, no
  crash anywhere.

The symmetric contract: a usable observation time lies inside the
PORTABLE TIMESTAMP DOMAIN — years 1..9999, the exact range every
client stack in the comparison (Python ``datetime``, Arrow→pandas,
JDBC ``java.sql.Timestamp``) can represent — spelled as the
NULL-keeping disjunction ``ts IS NULL OR (ts >= 0001-01-01 AND
ts <= 9999-12-31 23:59:59.999999)``, two scan-pushable range
conjuncts. The ``IS NULL`` arm is LOAD-BEARING exactly as in
functions/numerics.py: NULL event-time handling is the r11 contract,
decided per entry (``require_event_time`` / event_time_order); this
contract covers only the NEW class — a PRESENT but unportable
instant — and composes with, never overrides, those decisions.

Batch entries compare TIMESTAMP_NTZ against NTZ literals — zone-free
by construction. The streaming variant filters on epoch micros
(``timestamp_micros`` literals against the normalized LTZ column —
instant comparisons, zone-free), because parsing a string literal to
LTZ would reintroduce the session-zone dependence the r12
partition-invariance board exists to catch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Epoch-micros bounds of the portable domain; the string forms are the
# same instants for NTZ-literal and oracle SQL spellings.
TIME_DOMAIN_MIN_US = -62_135_596_800_000_000   # 0001-01-01 00:00:00
TIME_DOMAIN_MAX_US = 253_402_300_799_999_999   # 9999-12-31 23:59:59.999999
_MIN_SQL = "0001-01-01 00:00:00"
_MAX_SQL = "9999-12-31 23:59:59.999999"


def epoch_us_ntz(col: str = "ts") -> Column:
    """Exact epoch micros of an NTZ event time (int64, every in-domain
    magnitude): pure NTZ micro-arithmetic, zone-free. This REPLACES
    the repo's old reconstruction ``unix_timestamp(ts)*1e6 +
    date_format(ts,'SSSSSS')`` — unix_timestamp truncates toward zero,
    so for PRE-EPOCH timestamps the positive sub-second fraction adds
    the wrong way (every 1890-01-20 03:04:05.123456 became
    ...05.876544's micros; r13 --timeskew, latent on post-epoch
    committed fixtures). The DuckDB twin is ``epoch_us(ts)``, exact by
    construction."""
    return F.expr(
        f"timestampdiff(MICROSECOND,"
        f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def in_time_domain(c: Column) -> Column:
    """Engine-side event-time contract predicate for BATCH entries
    (NTZ column vs NTZ literals; see module doc)."""
    lo = F.expr(f"TIMESTAMP_NTZ '{_MIN_SQL}'")
    hi = F.expr(f"TIMESTAMP_NTZ '{_MAX_SQL}'")
    return c.isNull() | ((c >= lo) & (c <= hi))


def in_time_domain_instant(c: Column) -> Column:
    """Streaming twin over the normalized LTZ event time: epoch-micros
    literal comparisons — instant-based, session-zone-free."""
    lo = F.timestamp_micros(F.lit(TIME_DOMAIN_MIN_US))
    hi = F.timestamp_micros(F.lit(TIME_DOMAIN_MAX_US))
    return c.isNull() | ((c >= lo) & (c <= hi))


def time_domain_sql(col: str = "ts") -> str:
    """DuckDB twin of ``in_time_domain`` for oracle WHERE clauses."""
    return (
        f"({col} IS NULL OR ({col} >= TIMESTAMP '{_MIN_SQL}'"
        f" AND {col} <= TIMESTAMP '{_MAX_SQL}'))"
    )


# ARROW/PANDAS-KERNEL entries (applyInPandas / applyInPandasWithState /
# mapInPandas consumers whose input schema carries the raw ts) need a
# TIGHTER bound than Python-datetime portability: pandas represents
# timestamps as datetime64[ns], whose int64 range is 1677-09-21 ..
# 2262-04-11 — an in-portable-domain year-9999 event crashes the
# Arrow→pandas batch conversion INSIDE the worker (observed r13
# --timeskew: five stateful streaming entries raised
# StreamingQueryException one side only). The kernel domain
# [1677-09-22, 2262-04-11) is the exactly-representable ns window
# with a day of margin on each end; same NULL-keeping disjunction.
KERNEL_TIME_MIN_SQL = "1677-09-22 00:00:00"
KERNEL_TIME_MAX_SQL = "2262-04-11 00:00:00"
KERNEL_TIME_MIN_US = -9_223_286_400_000_000   # 1677-09-22 00:00:00
KERNEL_TIME_MAX_US = 9_223_286_400_000_000    # 2262-04-11 00:00:00


def in_kernel_time_domain(c: Column) -> Column:
    """Engine-side pandas/Arrow-kernel contract for BATCH entries
    (NTZ column vs NTZ literals)."""
    lo = F.expr(f"TIMESTAMP_NTZ '{KERNEL_TIME_MIN_SQL}'")
    hi = F.expr(f"TIMESTAMP_NTZ '{KERNEL_TIME_MAX_SQL}'")
    return c.isNull() | ((c >= lo) & (c < hi))


def in_kernel_time_domain_instant(c: Column) -> Column:
    """Streaming twin over the normalized LTZ event time (epoch-micros
    literals — instant comparisons, session-zone-free)."""
    lo = F.timestamp_micros(F.lit(KERNEL_TIME_MIN_US))
    hi = F.timestamp_micros(F.lit(KERNEL_TIME_MAX_US))
    return c.isNull() | ((c >= lo) & (c < hi))


def kernel_time_domain_sql(col: str = "ts") -> str:
    """DuckDB twin of ``in_kernel_time_domain``."""
    return (
        f"({col} IS NULL OR ({col} >= TIMESTAMP '{KERNEL_TIME_MIN_SQL}'"
        f" AND {col} < TIMESTAMP '{KERNEL_TIME_MAX_SQL}'))"
    )


# WATERMARKED STREAMING operators have one more engine-imposed floor:
# Spark's event-time watermark clock STARTS AT THE EPOCH (initial
# watermark 0) and only advances, so any pre-epoch event is born
# "late" and silently dropped no matter how generous the delay —
# observed r13 --timeskew as three missing pre-epoch sessions on the
# engine side only. The floor is STRICT (> epoch, not >=): AT the
# epoch instant itself Spark's per-operator late-row boundary
# predicates disagree with each other (windowed aggregations keep a
# ts == initial-watermark row because the window END is compared;
# stream-stream joins and applyInPandasWithState drop it — observed),
# so no portable semantics exist at that one instant — which is also
# exactly the zeroed-field corruption shape. The streaming domain is
# therefore (epoch, portable/kernel max]. Batch entries keep the full
# portable domain — the floor is a property of the watermark
# machinery, not of event time itself.
def in_stream_time_domain_instant(c: Column) -> Column:
    """Watermarked-streaming contract over the normalized LTZ event
    time: (epoch, portable max], instant comparisons."""
    lo = F.timestamp_micros(F.lit(0))
    hi = F.timestamp_micros(F.lit(TIME_DOMAIN_MAX_US))
    return c.isNull() | ((c > lo) & (c <= hi))


def in_stream_kernel_time_domain_instant(c: Column) -> Column:
    """Watermarked pandas/Arrow-kernel contract: (epoch, ns max)."""
    lo = F.timestamp_micros(F.lit(0))
    hi = F.timestamp_micros(F.lit(KERNEL_TIME_MAX_US))
    return c.isNull() | ((c > lo) & (c < hi))


def stream_time_domain_sql(col: str = "ts") -> str:
    """DuckDB twin of ``in_stream_time_domain_instant``."""
    return (
        f"({col} IS NULL OR ({col} > TIMESTAMP '1970-01-01 00:00:00'"
        f" AND {col} <= TIMESTAMP '{_MAX_SQL}'))"
    )


def stream_kernel_time_domain_sql(col: str = "ts") -> str:
    """DuckDB twin of ``in_stream_kernel_time_domain_instant``."""
    return (
        f"({col} IS NULL OR ({col} > TIMESTAMP '1970-01-01 00:00:00'"
        f" AND {col} < TIMESTAMP '{KERNEL_TIME_MAX_SQL}'))"
    )


# SPINE-GENERATING entries (gap interpolation, series densify) need a
# tighter bound than portability: they materialize one row per
# day/hour between the min and max observed time, so their cost is
# proportional to the SPAN — a single corrupt year-1 or year-9999
# event turns an O(|observed days|) plan into a 3.65-million-row
# spine per group (and the pre-domain-contract unit-bug shape, year
# 57552, OOMed the whole JVM; observed r13 --timeskew). The declared
# OBSERVATION WINDOW [1970, 2100) bounds the spine at ~47k days:
# wide enough for any real log/metric series, and an explicit,
# greppable constant a deployment can widen knowingly. Same
# NULL-keeping disjunction as the portable domain.
OBS_WINDOW_MIN_SQL = "1970-01-01 00:00:00"
OBS_WINDOW_MAX_SQL = "2100-01-01 00:00:00"


def in_obs_window(c: Column) -> Column:
    """Engine-side bounded-span contract for spine-generating
    entries (see comment above)."""
    lo = F.expr(f"TIMESTAMP_NTZ '{OBS_WINDOW_MIN_SQL}'")
    hi = F.expr(f"TIMESTAMP_NTZ '{OBS_WINDOW_MAX_SQL}'")
    return c.isNull() | ((c >= lo) & (c < hi))


def obs_window_sql(col: str = "ts") -> str:
    """DuckDB twin of ``in_obs_window``."""
    return (
        f"({col} IS NULL OR ({col} >= TIMESTAMP '{OBS_WINDOW_MIN_SQL}'"
        f" AND {col} < TIMESTAMP '{OBS_WINDOW_MAX_SQL}'))"
    )
