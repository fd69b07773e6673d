"""Shared event-time ordering keys.

Why a helper exists (r11 NULL-parity audit + review): Spark's ASC
default places NULLs FIRST while DuckDB's — and therefore every
oracle in this repo — places them LAST, so any window written with the
natural ``F.asc("ts")`` silently diverges on NULL event times and
stays green on the NULL-free driver fixtures. Routing the ubiquitous
``(ts, event_id)`` ordering through one function fixes the class at
depth: new entries that use the helper cannot reintroduce it.

DESC orderings don't need a twin: Spark and DuckDB both default DESC
to NULLS LAST. The one intentional exception is a DESC-*mirror* of an
ASC NULLS LAST oracle frame, which needs ``desc_nulls_first``
(asof_next_purchase) — that is a semantic choice, spelled explicitly
at its site.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def event_time_order(ts: str = "ts", tiebreak: str = "event_id") -> list[Column]:
    """ASC NULLS LAST ordering keys for an event stream — matches the
    DuckDB oracles' default NULL placement. Use for every window
    ordered by a nullable event time."""
    return [F.asc_nulls_last(ts), F.asc_nulls_last(tiebreak)]
