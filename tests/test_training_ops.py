"""Invariant tests for the batch-3 training-pipeline operators.

Oracle equality is covered by test_correctness/the driver sweep; these
pin the properties that equality alone can't express (packing
feasibility, split/sample disjointness semantics, interval algebra).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _q(name, spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.plans.registry import queries

    return queries()[name](spark, sf_dir)


def test_pack_sequences_invariants(spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.plans.training_ops import (
        _PACK_CAPACITY,
        _PACK_SHARDS,
    )

    rows = _q("pack_sequences_greedy", spark, sf_dir).collect()
    docs = {r.doc_id for r in rows}
    assert len(docs) == len(rows), "a document was packed twice"

    fills: dict[tuple[int, int], int] = {}
    counts: dict[tuple[int, int], int] = {}
    for r in rows:
        assert 0 <= r.shard < _PACK_SHARDS
        key = (r.shard, r.bin)
        fills[key] = fills.get(key, 0) + r.n_tokens
        counts[key] = counts.get(key, 0) + 1
    for key, fill in fills.items():
        # a bin may exceed capacity only as a single oversized document
        assert fill <= _PACK_CAPACITY or counts[key] == 1, (key, fill)

    # bins are contiguous from 0 within each shard (greedy never skips)
    by_shard: dict[int, set[int]] = {}
    for shard, b in fills:
        by_shard.setdefault(shard, set()).add(b)
    for shard, bins in by_shard.items():
        assert bins == set(range(len(bins))), (shard, sorted(bins))

    # greedy never starts a new bin while the previous could still fit
    # the smallest doc of the next bin — check adjacent-bin boundary:
    # refilling in doc_id order must reproduce the same fill levels,
    # which the oracle equality already guarantees; here just assert
    # every non-final bin is "full enough" that its successor's first
    # doc would overflow it.
    rows_sorted = sorted(rows, key=lambda r: (r.shard, r.doc_id))
    prev = None
    for r in rows_sorted:
        if prev is not None and prev.shard == r.shard and r.bin == prev.bin + 1:
            assert fills[(prev.shard, prev.bin)] + r.n_tokens > _PACK_CAPACITY
        prev = r


def test_stratified_sample_subset_and_rates(spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.catalog import table

    sample = _q("sample_stratified_hash", spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    # deterministic: running twice yields the identical id set
    a = {r.doc_id for r in sample.collect()}
    b = {r.doc_id for r in sample.collect()}
    assert a == b
    assert a <= {r.doc_id for r in docs.select("doc_id").collect()}
    # every sampled row respects its stratum's bucket cutoff
    for r in sample.collect():
        cutoff = {"en": 10, "fr": 30}.get(r.lang, 50)
        assert r.bucket < cutoff


def test_scd2_intervals_partition_users(spark, sf_dir):
    iv = _q("scd2_intervals", spark, sf_dir)
    # zero-length intervals are legal (two changes on one microsecond,
    # tiebroken by state); negative ones are not
    bad = iv.filter(
        F.col("valid_to_us").isNotNull()
        & (F.col("valid_to_us") < F.col("valid_from_us"))
    ).count()
    assert bad == 0, "negative validity interval"
    # exactly one open (current) interval per user
    per_user = (
        iv.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert per_user == 0


def test_quantile_bucketize_monotone_and_balanced(spark, sf_dir):
    from tiny_etl_multiproc_bigdata_spark.catalog import table

    b = _q("quantile_bucketize", spark, sf_dir)
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    j = b.join(o, "o_orderkey")
    # deciles are monotone in price: max price of decile d <= min of d+1
    stats = (
        j.groupBy("decile")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .orderBy("decile")
        .collect()
    )
    assert [r.decile for r in stats] == list(range(1, len(stats) + 1))
    for a, bb in zip(stats, stats[1:]):
        assert a.hi <= bb.lo
    # roughly balanced: each decile holds 10% +/- 5pp of rows
    n = j.count()
    for r in j.groupBy("decile").count().collect():
        assert abs(r["count"] / n - 0.1) < 0.05, (r.decile, r["count"], n)
