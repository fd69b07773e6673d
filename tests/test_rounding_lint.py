"""Mechanical rounding-convention lint (VERDICT r06 item 4).

The repo's cross-engine rounding policy (functions/rounding.py):

* computed floats (ratios, means, percentiles, float32 readings,
  decimal sums rounded at a COARSER scale than their own) must round
  via the engine-portable half-up formula — ``round_half_up`` on the
  engine, ``duck_round`` / the literal floor form in the oracle —
  because built-in round() diverges between Spark (BigDecimal HALF_UP)
  and DuckDB (~15-significant-digit shortening) exactly at half
  boundaries;
* operands EXACT at the rounded scale (cent-exact money columns,
  integer quantities, DECIMAL(p,s) sums rounded at scale >= s) may use
  built-in round(): the value sits ~10 orders of magnitude away from
  any rounding boundary, so the engines cannot disagree. Engine code
  declares this via ``exact_round``; oracles declare it by membership
  in _EXACT_AT_SCALE_OK below.

This test makes the policy self-enforcing: a new bare F.round in plan
code, or a new oracle round() not justified in the allowlist, fails CI
instead of waiting to go red on some future fixture vintage.
"""

from __future__ import annotations

import pathlib
import re

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "tiny_etl_multiproc_bigdata_spark"
)

# Entries whose oracle uses built-in round() on an operand exact at the
# rounded scale. Every name here carries the justification; adding a
# new oracle round() means either adding it here WITH a reason or
# using the duck_round floor form.
_EXACT_AT_SCALE_OK = {
    # DECIMAL(30,2) sums cast to double, rounded at their own scale 2
    "agg_conditional",
    "group_by_all_summary",
    "grouped_arrow_value_stats",
    "pipe_syntax_summary",
    "streaming_stateful_counter",
    "streaming_stream_static_join",
    "streaming_tumbling_counts",
    "width_bucket_histogram",
    "window_running_sum",
    "window_sliding_counts",
    "window_tumbling_counts",
    # revenue column is itself a DECIMAL(30,2) aggregate, rounded at 2
    "orders_pareto_share",
    # DECIMAL(18,2) upsert totals (×2 keeps scale 2), rounded at 2
    "merge_upsert",
    # cent-exact stored doubles (o_totalprice / acctbal / events.value)
    # rounded at 2 — representation normalization only
    "agg_min_by_max_by",  # round(o_totalprice*100) to integer cents
    "map_functions",
    "null_handling_scalars",
    "scalar_subquery_filter",
    "sort_limit_topk",
    "topk_per_group",
    "union_by_name",
    "window_lag_lead",
    "window_row_number_topk",
    # integer-valued l_quantity / int p_size / cent p_retailprice
    # rounded at >= their scale
    "p9_filter_rows",
    "unpivot_part_measures",
    # cent-exact p_retailprice * 100 rounded at 0 (integer cents)
    "skyline_pareto_parts",
    # cent-exact events.value * 100 rounded at 0 (integer cents)
    "rolling_median_exact",
    "cusum_changepoint",
}

_BARE_ROUND = re.compile(r"(?<![a-zA-Z_.])round\s*\(")


def test_no_bare_f_round_in_plan_code():
    """Engine code must use exact_round / round_half_up — the helper
    names ARE the exactness declaration; bare F.round carries none."""
    offenders = []
    for path in PKG.rglob("*.py"):
        if path.name == "rounding.py":
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "F.round(" in line:
                offenders.append(f"{path.relative_to(PKG.parent)}:{i}")
    assert not offenders, (
        "bare F.round in plan code (use exact_round for "
        f"exact-at-scale operands, round_half_up otherwise): {offenders}"
    )


def test_oracle_bare_round_is_allowlisted():
    """Every oracle using built-in round() must be justified in
    _EXACT_AT_SCALE_OK (and the allowlist must not go stale)."""
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    using = {
        n
        for n, s in REGISTRY.items()
        if s.oracle and _BARE_ROUND.search(s.oracle)
    }
    unjustified = using - _EXACT_AT_SCALE_OK
    assert not unjustified, (
        "oracle uses built-in round() without an exact-at-scale "
        f"justification (convert to duck_round or allowlist): "
        f"{sorted(unjustified)}"
    )
    stale = _EXACT_AT_SCALE_OK - using
    assert not stale, f"allowlist entries no longer using round(): {sorted(stale)}"


@pytest.mark.parametrize("scale", [0, 2, 4])
def test_half_up_floor_form_matches_duck_round(scale):
    """duck_round's emitted SQL is the same IEEE arithmetic as
    round_half_up — pin the string shape so the two can't drift."""
    from tiny_etl_multiproc_bigdata_spark.functions.rounding import (
        duck_round,
    )

    s = 10**scale
    assert duck_round("x", scale) == f"(floor((x) * {s} + 0.5) / {s})"
