"""Benchmark runner — prints ONE JSON line for the driver.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is fully
materialized through the noop sink (whole-plan execution, no driver-side
collect), mirroring how a cluster job would be measured.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from tiny_etl_multiproc_bigdata_spark.session import get_spark
    from tiny_etl_multiproc_bigdata_spark.plans.registry import queries

    headline = [
        "flagship_words",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "window_running_sum",
        "sessionize_events",
        "dedup_minhash_lsh",
        "text_quality_score",
        "ann_bruteforce_topk",
        "corpus_curation",
    ]

    spark = get_spark(app_name="bench")
    all_queries = queries()

    # one untimed warmup job: first-run JVM costs (codegen compilation,
    # committer/broadcast class loading) are ~3s and would otherwise be
    # billed to the first query — the baseline rate we compare against
    # (BASELINE.md) is a steady-state throughput constant
    all_queries["flagship_words"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in headline:
        fn = all_queries.get(name)
        if fn is None:
            continue
        # warm the plan (analysis/IO metadata) outside the timed region
        df = fn(spark, sf_dir)
        # median of 3: single-shot numbers vary up to 5× under VM load
        # (BENCH_r03 recorded q1 at 8.98s vs 1.6s steady-state), and
        # round-over-round comparisons need a robust stat
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        dt = sorted(runs)[1]
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s (runs: {[round(r, 3) for r in runs]})", file=sys.stderr)

    # sustained-throughput measurement: the fixture corpus is ~1.5 MB at
    # sf0.1, so per-query wall time above is dominated by fixed job
    # overhead, not work. Amplify the corpus in-memory (cross join with
    # a replication range — no extra IO) and measure the flagship
    # tokenize→dedup→count pipeline in MB/s for the BASELINE.md
    # comparison (reference: 1.95 MB/s).
    from pyspark.sql import functions as F

    from tiny_etl_multiproc_bigdata_spark.plans.flagship import words_from_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_bytes = docs.select(
        F.sum(F.length(F.col("text").cast("binary")))
    ).collect()[0][0]
    # 512 reps ≈ 600 MB at sf0.1: per-run wall is seconds of sustained
    # compute, so round-over-round deltas measure throughput, not the
    # ~0.1s fixed job-setup cost that dominated at n_rep=64 (VERDICT r04
    # item 6)
    n_rep = 512
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # replication range is the partitioned stream side, tiny corpus is
    # broadcast: each task GENERATES its replicas locally — no shuffle
    # of the amplified text (a real corpus gets this from input splits)
    amplified = (
        spark.range(n_rep)
        .repartition(cpus)
        .select(F.col("id").alias("rep"))
        .crossJoin(F.broadcast(docs))
        .select(F.concat_ws("#", "source", "rep").alias("source"), "text")
    )
    # median of 3 runs: VM load makes single-shot numbers vary up to 5×
    # across rounds, so round-over-round comparisons need a robust stat
    runs: list[float] = []
    for i in range(3):
        t0 = time.perf_counter()
        words_from_docs(amplified).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        print(f"# sustained run {i + 1}: {runs[-1]:.1f}s", file=sys.stderr)
    dt = sorted(runs)[1]
    mb_per_s = (corpus_bytes * n_rep / 1e6) / dt
    print(
        f"# flagship sustained (median of 3): {corpus_bytes * n_rep / 1e6:.0f} MB in "
        f"{dt:.1f}s = {mb_per_s:.1f} MB/s",
        file=sys.stderr,
    )

    # Amplified runs for the five heaviest join/shuffle topologies
    # (VERDICT r04 item 6 widened by r05 item 3): at sf0.1 the
    # per-query medians are well under job-setup cost, so scale the
    # INPUT and report work-rate.
    amp_rep = 16
    amplified: dict[str, dict[str, float]] = {}

    from functools import reduce

    from tiny_etl_multiproc_bigdata_spark.plans.relational import q1_from_lineitem

    # k unioned parquet scans = k× input splits — the honest more-data
    # shape (each branch re-reads the file; no broadcast of a big side)
    li_scan = lambda: spark.read.parquet(f"{sf_dir}/lineitem.parquet")  # noqa: E731
    li_amp = reduce(lambda a, b: a.unionAll(b), [li_scan() for _ in range(amp_rep)])
    li_bytes = os.path.getsize(f"{sf_dir}/lineitem.parquet")
    t0 = time.perf_counter()
    q1_from_lineitem(li_amp).write.format("noop").mode("overwrite").save()
    dt_q1 = time.perf_counter() - t0
    # basis is COMPRESSED parquet bytes (what the scan reads) — not
    # comparable with the minhash entry's uncompressed text basis; each
    # entry is for round-over-round deltas of itself, so the basis is
    # named in the key instead of sharing a falsely-common unit
    amplified["q1_pricing_summary"] = {
        "rep": amp_rep,
        "sec": round(dt_q1, 3),
        "parquet_mb_per_s": round(li_bytes * amp_rep / 1e6 / dt_q1, 2),
    }
    print(f"# q1 amplified x{amp_rep}: {dt_q1:.1f}s", file=sys.stderr)

    from tiny_etl_multiproc_bigdata_spark.plans.dedup_queries import (
        minhash_pairs_from_docs,
    )

    # replicate docs under distinct ids + a per-replica hash salt, so
    # candidate pairs scale linearly (independent corpora per replica)
    # instead of quadratically (cross-replica duplicate clusters)
    docs_amp = (
        spark.range(amp_rep)
        .repartition(cpus)
        .select(F.col("id").alias("rep"))
        .crossJoin(F.broadcast(docs.select("doc_id", "text")))
        .select(
            (F.col("doc_id") * amp_rep + F.col("rep")).alias("doc_id"),
            "text",
            F.col("rep").cast("string").alias("salt"),
        )
    )
    t0 = time.perf_counter()
    minhash_pairs_from_docs(docs_amp).write.format("noop").mode(
        "overwrite"
    ).save()
    dt_mh = time.perf_counter() - t0
    amplified["dedup_minhash_lsh"] = {
        "rep": amp_rep,
        "sec": round(dt_mh, 3),
        "text_mb_per_s": round(corpus_bytes * amp_rep / 1e6 / dt_mh, 2),
    }
    print(f"# minhash amplified x{amp_rep}: {dt_mh:.1f}s", file=sys.stderr)

    # q9: the deepest broadcast-chain + wide-exchange TPC-H shape —
    # amplified lineitem (unioned scans) against single-read dims
    from tiny_etl_multiproc_bigdata_spark.plans.tpch_extra import q9_from_tables

    li_amp9 = reduce(
        lambda a, b: a.unionAll(b), [li_scan() for _ in range(amp_rep)]
    )
    t0 = time.perf_counter()
    q9_from_tables(
        li_amp9,
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/supplier.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
        spark.read.parquet(f"{sf_dir}/part.parquet"),
    ).write.format("noop").mode("overwrite").save()
    dt_q9 = time.perf_counter() - t0
    amplified["q9_product_profit"] = {
        "rep": amp_rep,
        "sec": round(dt_q9, 3),
        "parquet_mb_per_s": round(li_bytes * amp_rep / 1e6 / dt_q9, 2),
    }
    print(f"# q9 amplified x{amp_rep}: {dt_q9:.1f}s", file=sys.stderr)

    # prefix-filter join: the heaviest candidate-generation topology
    # (df-ordered postings, window, inverted-index self-join, verify);
    # replica salt keeps candidate growth linear, as with minhash
    from tiny_etl_multiproc_bigdata_spark.plans.dedup_queries import (
        prefix_filter_pairs_from_docs,
    )

    t0 = time.perf_counter()
    prefix_filter_pairs_from_docs(docs_amp).write.format("noop").mode(
        "overwrite"
    ).save()
    dt_pf = time.perf_counter() - t0
    amplified["dedup_jaccard_prefix_filter"] = {
        "rep": amp_rep,
        "sec": round(dt_pf, 3),
        "text_mb_per_s": round(corpus_bytes * amp_rep / 1e6 / dt_pf, 2),
    }
    print(f"# prefix-filter amplified x{amp_rep}: {dt_pf:.1f}s", file=sys.stderr)

    # corpus_curation: the end-to-end selection pipeline (quality scan +
    # minhash clustering + survivor filter). The label-propagation loop
    # runs Spark jobs at plan-CONSTRUCTION time, so the timed region
    # wraps construction + the final materialization.
    from tiny_etl_multiproc_bigdata_spark.plans.curation import (
        curation_from_docs,
    )

    t0 = time.perf_counter()
    curation_from_docs(docs_amp).write.format("noop").mode("overwrite").save()
    dt_cu = time.perf_counter() - t0
    amplified["corpus_curation"] = {
        "rep": amp_rep,
        "sec": round(dt_cu, 3),
        "text_mb_per_s": round(corpus_bytes * amp_rep / 1e6 / dt_cu, 2),
    }
    print(f"# curation amplified x{amp_rep}: {dt_cu:.1f}s", file=sys.stderr)

    # pretrain_corpus_pipeline: the round-6 end-to-end curation chain
    # (gate → corpus segment dedup → chunk accounting). Replica salt in
    # the segment hash keeps replicas independent corpora (same
    # convention as the minhash/prefix-filter salt), so dedup load
    # scales linearly with rep.
    from tiny_etl_multiproc_bigdata_spark.plans.corpus_ops import (
        pipeline_from_docs,
    )

    docs_pipe = (
        spark.range(amp_rep)
        .repartition(cpus)
        .select(F.col("id").alias("rep"))
        .crossJoin(F.broadcast(docs.select("doc_id", "source", "lang", "text")))
        .select(
            (F.col("doc_id") * amp_rep + F.col("rep")).alias("doc_id"),
            F.concat_ws("#", "source", "rep").alias("source"),
            "lang",
            "text",
            F.col("rep").cast("string").alias("salt"),
        )
    )
    t0 = time.perf_counter()
    pipeline_from_docs(docs_pipe).write.format("noop").mode(
        "overwrite"
    ).save()
    dt_pp = time.perf_counter() - t0
    amplified["pretrain_corpus_pipeline"] = {
        "rep": amp_rep,
        "sec": round(dt_pp, 3),
        "text_mb_per_s": round(corpus_bytes * amp_rep / 1e6 / dt_pp, 2),
    }
    print(f"# pipeline amplified x{amp_rep}: {dt_pp:.1f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "flagship_sustained_mb_per_s": round(mb_per_s, 2),
                "amplified": amplified,
            }
        )
    )


if __name__ == "__main__":
    main()
