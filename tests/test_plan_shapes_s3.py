"""Physical-plan pins for the session-3 entries whose docstrings make
shape claims — shared shuffles, join-free expansions, broadcast-only
joins. A value sweep can't see a second Exchange; these can.
"""

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


def _tree(plan: str) -> str:
    return plan.split("\n\n(1)")[0]


def test_groups_frame_shares_one_shuffle(spark, sf_dir):
    """dense_rank pass + RANGE-frame pass must reuse the single
    event_type partitioning — the docstring's 'no second shuffle'."""
    tree = _tree(_plan(_q("window_groups_frame_sum", spark, sf_dir)))
    assert tree.count("Exchange") == 1, tree


def test_ohlc_single_shuffle(spark, sf_dir):
    """Both rank directions and the final groupBy share the
    (event_type, day) partitioning: one Exchange total."""
    tree = _tree(_plan(_q("ohlc_daily_candles", spark, sf_dir)))
    assert tree.count("Exchange") == 1, tree


def test_gram_matrix_is_join_free(spark, sf_dir):
    """The d^2 pair expansion is a per-row lambda — any Join node
    means the plan regressed to a self-join."""
    tree = _tree(_plan(_q("embedding_gram_matrix", spark, sf_dir)))
    assert "Join" not in tree, tree
    # partial aggregation must fold below the single exchange
    assert tree.count("Exchange") == 1, tree
    below = tree.split("Exchange")[-1]
    assert "HashAggregate" in below, tree


def test_bloom_probe_side_never_shuffles_for_the_filter(spark, sf_dir):
    """The bitset and membership joins must both be broadcasts —
    no hashpartitioning exchange keyed on the bloom position."""
    tree = _tree(_plan(_q("bloom_membership_fpr", spark, sf_dir)))
    assert len(re.findall(r"BroadcastHashJoin", tree)) >= 2, tree
    assert "SortMergeJoin" not in tree, tree


def test_leave_one_out_has_no_self_join(spark, sf_dir):
    """The EXCLUDE lowering is algebraic (window minus own row) —
    a Join node means someone rewrote it as a self-join."""
    tree = _tree(_plan(_q("leave_one_out_encoding", spark, sf_dir)))
    assert "Join" not in tree, tree
    assert tree.count("Exchange") == 1, tree


def test_sequential_pattern_join_is_copartitioned(spark, sf_dir):
    """The per-user type-pair self-join must reuse the (user) side
    partitioning — at most the agg shuffle + one join shuffle pair,
    and no broadcast of the corpus-sized per-(user,type) table."""
    tree = _tree(_plan(_q("sequential_pattern_support", spark, sf_dir)))
    # small fixture may broadcast; accept either but forbid cartesian
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_hard_negative_query_side_broadcasts(spark, sf_dir):
    """Query set joins the corpus by broadcast nested loop on the
    label-mismatch predicate — the corpus side must NOT shuffle."""
    tree = _tree(_plan(_q("hard_negative_mining", spark, sf_dir)))
    assert "SortMergeJoin" not in tree, tree
    assert "Exchange hashpartitioning" not in tree.split("Join")[0], tree


def test_quantile_normalize_mapping_joins_broadcast(spark, sf_dir):
    """Histogram mapping and row application are broadcast joins —
    the corpus is never shuffled for the mapping."""
    tree = _tree(_plan(_q("quantile_normalize_histogram", spark, sf_dir)))
    assert len(re.findall(r"Broadcast", tree)) >= 2, tree


def test_ransac_scoring_broadcasts_models(spark, sf_dir):
    """8 model rows cross the point stream by broadcast; the anchors
    fold is one aggregation (no per-seed sort of the events table)."""
    tree = _tree(_plan(_q("ransac_slope_fit", spark, sf_dir)))
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree, (
        tree
    )
    assert "Exchange rangepartitioning" not in tree.split("Window")[0], tree


def test_pandas_api_merge_asof_has_no_nested_loop(spark, sf_dir):
    """r10 lowering pin (VERDICT r09 item 4): the pandas-API asof
    entry must compile to the union + running-window shape — one
    Exchange on user_id, one Window, and NO join node at all. The
    r01–r09 formulation lowered to a conditioned corpus×corpus
    BroadcastNestedLoopJoin on the bare ts inequality; this test
    fails any regression back to ps.merge_asof's native plan."""
    tree = _tree(_plan(_q("pandas_api_merge_asof", spark, sf_dir)))
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree
    assert "Join" not in tree, tree
    assert tree.count("Window") == 1, tree
    assert tree.count("Exchange") == 1, tree
