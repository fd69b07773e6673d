"""Plan-quality regression tests: the physical plans that matter at
100 TB must keep their shape — pushdown reaching the scan, dims
broadcast, top-k via TakeOrderedAndProject, no full-column scans."""

from __future__ import annotations

import contextlib
import io
import re


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _q(name, spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.plans.registry import queries

    return queries()[name](spark, sf_dir)


def test_q1_scans_only_needed_columns(spark, sf_dir):
    plan = _plan(_q("q1_pricing_summary", spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
    }, f"column pruning regressed: scan reads {cols}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(_q("p9_filter_rows", spark, sf_dir))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThan(l_quantity,45.0)" in m.group(1), plan
    assert "EqualTo(l_returnflag,R)" in m.group(1)


def test_dim_joins_broadcast_never_sort_merge(spark, sf_dir):
    for name in ("q3_shipping_priority", "q5_region_revenue", "join_broadcast_chain"):
        plan = _plan(_q(name, spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join"
        assert "SortMergeJoin" not in plan, (
            f"{name}: dim join degraded to sort-merge"
        )


def test_topk_uses_take_ordered(spark, sf_dir):
    for name in ("q3_shipping_priority", "sort_limit_topk"):
        plan = _plan(_q(name, spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, (
            f"{name}: global top-k fell back to full sort"
        )


def test_flagship_has_two_exchanges(spark, sf_dir):
    """The single-pass design: one shuffle on (source, norm) with a
    partial aggregate below it, one on source for the window — the
    token stream itself must never cross a wide exchange un-reduced."""
    plan = _plan(_q("flagship_words", spark, sf_dir))
    body = plan.split("\n\n(1)")[0]  # tree section only (AQE repeats nodes)
    assert body.count("Exchange") == 2, body
    tree_before_first_exchange = body.split("Exchange")[-1]
    assert "Aggregate" in tree_before_first_exchange, (
        "no partial aggregate below the first exchange"
    )


def test_flagship_scan_prunes_to_two_columns(spark, sf_dir):
    plan = _plan(_q("flagship_words", spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"text", "source"}, cols
