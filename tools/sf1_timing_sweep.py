"""Full-registry sf1 TIMING sweep (r10) — the wall-clock companion to
tools/sf1_cardinality_audit.py: run every registry entry against the
.bench_sf1 fixture (10x sf0.1, replica-disjoint key remap), noop-write
the result (materializes every column — .count() lets Catalyst prune
windows away and hides exactly the cost being hunted), record wall
seconds, and cancel any entry that exceeds the watchdog.

This is the instrument that found `window_range_interval_frame`'s
89.9s quadratic (r10; fixed at -97%) after the cardinality audit had
caught theil_sen_grouped and the causal battery had caught
caliper_nearest_match — cardinality proves the scaling CLASS, this
catches engine-execution pathologies (frame re-aggregation, skewed
tasks) that candidate counts can't see.

Run AFTER a bench run has materialized the sf1 fixture:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py
    python tools/sf1_timing_sweep.py

Known non-ok statuses at sf1 (all artifacts of the fixture, not the
engine): embedding entries skip (no embeddings.parquet in .bench_sf1),
roc_auc_eval throws (the replica source remap `src0` -> `src0#k`
empties the positive class; both classes exist at every real corpus
scale).
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

WATCHDOG_S = 150


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("sf1-timing-sweep")
        .getOrCreate()
    )
    sc = spark.sparkContext
    from tiny_etl_multiproc_bigdata_spark.plans.registry import queries

    q = queries()
    sf1 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_sf1",
    )
    results: dict[str, dict] = {}
    names = sorted(q)
    t_all = time.time()
    for i, name in enumerate(names):
        group = f"sweep-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        cancelled = [False]

        def cancel():
            cancelled[0] = True
            sc.cancelJobGroup(group)

        timer = threading.Timer(WATCHDOG_S, cancel)
        timer.start()
        t0 = time.time()
        try:
            df = q[name](spark, sf1)
            df.write.format("noop").mode("overwrite").save()
            results[name] = {
                "sec": round(time.time() - t0, 2),
                "status": "ok",
            }
        except Exception as ex:  # noqa: BLE001 — per-entry isolation
            msg = repr(ex)
            if cancelled[0]:
                status = "WATCHDOG_CANCELLED"
            elif "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                status = "no_fixture"
            else:
                status = f"error: {msg[:160]}"
            results[name] = {
                "sec": round(time.time() - t0, 2),
                "status": status,
            }
        finally:
            timer.cancel()
            sc.setJobGroup("idle", "idle")
        if (i + 1) % 25 == 0:
            print(f"{i+1}/{len(names)} {time.time()-t_all:.0f}s", flush=True)

    ok = {n: r["sec"] for n, r in results.items() if r["status"] == "ok"}
    bad = {n: r for n, r in results.items() if r["status"] != "ok"}
    print(
        f"TOTAL {time.time()-t_all:.1f}s; {len(ok)} ok, {len(bad)} non-ok",
        flush=True,
    )
    slow = sorted(ok.items(), key=lambda kv: -kv[1])[:25]
    print("SLOWEST 25:", json.dumps(slow), flush=True)
    print("NON-OK:", json.dumps(bad, indent=1), flush=True)


if __name__ == "__main__":
    main()
