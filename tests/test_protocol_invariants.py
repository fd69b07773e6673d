"""Semantic invariants for the r07-session3 protocol entries — the
properties their DuckDB oracles share by construction and therefore
cannot check (an oracle twin catches divergence, not a wrong shared
spec). Each pin here is an INDEPENDENT restatement of the operator's
contract.
"""

from __future__ import annotations

import duckdb


def _rows(spark, name, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.plans import registry

    return registry.queries()[name](spark, sf_dir).collect()


def test_holt_matches_independent_recurrence(spark, sf_dir):
    """Engine Holt state must equal a plain-Python replay of the
    recurrence from the raw monthly series (computed via DuckDB, not
    via the registry oracle)."""
    monthly = duckdb.sql(
        f"""
        SELECT n.n_name, date_trunc('month', o.o_orderdate) AS mon,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM parquet_scan('{sf_dir}/orders.parquet') o
        JOIN parquet_scan('{sf_dir}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN parquet_scan('{sf_dir}/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for nat, _, x in monthly:
        series.setdefault(nat, []).append(int(x))
    expect = {}
    for nat, xs in series.items():
        level, trend = xs[0], 0
        for x in xs[1:]:
            nl = (x + 3 * (level + trend)) // 4
            trend = (nl - level + trend) // 2
            level = nl
        expect[nat] = (level, trend, level + 3 * trend)
    got = {
        r["n_name"]: (r["level_cents"], r["trend_cents"], r["forecast3_cents"])
        for r in _rows(spark, "holt_linear_forecast", sf_dir)
    }
    assert got == expect


def test_rbo_bounds_and_units(spark, sf_dir):
    """RBO ratio must sit in [0, 1]; units can never exceed the
    identical-rankings maximum."""
    from tiny_etl_multiproc_bigdata_spark.plans.quality import _RBO_MAX

    rows = _rows(spark, "rank_biased_overlap_eval", sf_dir)
    assert rows
    for r in rows:
        assert 0 <= r["rbo_units"] <= _RBO_MAX
        assert 0.0 <= r["rbo_ratio"] <= 1.0


def test_bloom_no_false_negatives(spark, sf_dir):
    """A Bloom filter can over-approximate but never miss a member:
    true positives == members among probed keys, exactly."""
    (r,) = _rows(spark, "bloom_membership_fpr", sf_dir)
    assert r["n_bloom_positive"] - r["n_false_positive"] == r["n_members"]
    assert r["n_probed"] >= r["n_bloom_positive"]


def test_ushaped_attribution_conserves_credit(spark, sf_dir):
    """Channel totals must sum to the number of credited purchases —
    the 40/20/40 split with floor-remainder assignment is exactly
    conservative per purchase (channel-level 4-dp rounding can shift
    the sum by < 1e-3)."""
    n_credited = duckdb.sql(
        f"""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us
          FROM parquet_scan('{sf_dir}/events.parquet')
        )
        SELECT count(DISTINCT p.event_id)
        FROM ev p JOIN ev t
          ON p.event_type = 'purchase'
         AND t.event_type IN ('click', 'view')
         AND t.user_id = p.user_id
         AND t.t_us <= p.t_us
         AND t.t_us > p.t_us - 7 * 86400 * 1000000::BIGINT
        """
    ).fetchall()[0][0]
    total = sum(
        r["attributed_conversions"]
        for r in _rows(spark, "attribution_u_shaped", sf_dir)
    )
    assert abs(total - n_credited) < 1e-3


def test_sequential_pattern_support_dominance(spark, sf_dir):
    """Support (ordered co-occurrence) can never exceed co-presence,
    and a type never precedes itself in the pair table."""
    rows = _rows(spark, "sequential_pattern_support", sf_dir)
    assert rows
    for r in rows:
        assert r["antecedent"] != r["consequent"]
        assert 0 <= r["n_support"] <= r["n_both"]


def test_quantile_normalize_is_monotone(spark, sf_dir):
    """Within each source, the histogram quantile map must be
    monotone non-decreasing in the input value — a non-monotone map
    would reorder documents, which quantile normalization must never
    do."""
    rows = _rows(spark, "quantile_normalize_histogram", sf_dir)
    per_source: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(
            (r["n_chars"], r["norm_chars"])
        )
    for pairs in per_source.values():
        pairs.sort()
        for (_, n1), (_, n2) in zip(pairs, pairs[1:]):
            assert n1 <= n2


def test_webdataset_shards_partition_the_corpus(spark, sf_dir):
    """Shard manifests must partition each source's documents exactly:
    doc counts and bytes sum to the source totals, and id ranges are
    disjoint in shard order."""
    rows = _rows(spark, "webdataset_shard_manifest", sf_dir)
    totals = dict(
        duckdb.sql(
            f"""SELECT source, sum(n_chars)
            FROM parquet_scan('{sf_dir}/documents.parquet') GROUP BY 1"""
        ).fetchall()
    )
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    assert set(per_source) == set(totals)
    for src, shards in per_source.items():
        shards.sort(key=lambda r: r["shard_id"])
        assert sum(s["shard_bytes"] for s in shards) == totals[src]
        for a, b in zip(shards, shards[1:]):
            assert a["last_doc_id"] < b["first_doc_id"]
