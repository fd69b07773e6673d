"""Partition-invariance differential audit — does any entry's RESULT
depend on the physical partition layout?

The class this hunts: on local[32] with a fixed shuffle-partition
count, every run sees the same partition boundaries and the same
within-partition row order, so an operator whose output depends on
either — a top-k that breaks ties by arrival order, a first()/last()
without a total ordering, a collect_list consumed order-sensitively, a
merge whose result drifts with combine order — stays green against its
oracle forever. On a 1000-executor cluster the layout is the FIRST
thing that changes (input split sizing, AQE coalescing, task
scheduling, speculative re-execution), so layout-dependence is a
latent wrong-answer bug at exactly the scale the engine targets.
Hand-auditing 435 entries for it is hopeless; this tool finds the
class mechanically:

  1. re-materialize the sf0.001 tables into a scratch fixture with
     MANY SMALL ROW GROUPS per file (identical rows, identical
     schema — pyarrow writer pinned to the source schema so physical
     types survive, same trick as null_parity_audit). Spark can only
     split a parquet file at row-group boundaries: the driver's
     single-row-group fixtures are physically unsplittable, so a
     split-size perturbation alone silently degenerates to "16
     partitions, 15 empty, every row still in partition 0" and
     scan-level order/index dependence stays invisible (measured:
     table_sample — seeded per-partition-index RNG — came out
     bit-identical under the first, fixture-unaware version of this
     tool);
  2. run EVERY registry entry on that scratch fixture under the
     baseline layout (driver-like: 16 shuffle partitions, 128 MiB
     input splits = one partition per file, AQE on);
  3. re-run under an adversarial layout — 5 shuffle partitions, 16 KiB
     max input split (now every row group is its own partition, so
     the partition COUNT, each row's PARTITION INDEX, and the
     row-to-task distribution of every scan all change), AQE off
     (different physical planning), 64-row Arrow batches (a
     mapInPandas kernel that assumes batch == partition breaks), and
     a non-UTC session time zone (executors inherit the CLUSTER's
     zone — any result that moves with it detoured through
     TIMESTAMP_LTZ). The scratch fixture also ships events as the
     NANOS vintage so catalog.table's int64 conversion branch — dead
     on the committed micros-vintage fixtures — is exercised
     board-wide; that branch is where the r12 zone finding lived;
  4. canonicalize both results with the driver's own comparator
     normalization (tests/compare.py canon: column-name sort +
     row sort + 12-significant-digit float rounding, so benign
     last-ulp reassociation of float sums does NOT alarm) and diff.

INVARIANCE is the bar: a mismatch means the same query over the same
data returned different VALUES under a different physical layout —
the one thing a deterministic engine must never do. Mismatches where
only float columns moved beyond 12 significant digits are classified
separately (accumulation-order drift — still worth knowing, but a
different severity than a structural row/value change).

Entries whose output is DEFINED BY the physical layout are exempt
with the reason stated (e.g. table_sample draws per-split Bernoulli
samples, so a different split count IS a different sample; that is
the documented contract of sampling, not a bug).

    python tools/partition_invariance_audit.py            # full board
    python tools/partition_invariance_audit.py name1 ...  # just these
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
WATCHDOG_S = 120
ROW_GROUPS = 8  # splittable units per re-materialized table file

# Baseline: what the driver-sim and the sf0.001 pytest board run with.
# (Arrow batch size and session TZ pinned to Spark's defaults so the
# baseline is explicit about the dimensions the perturbed pass moves.)
BASELINE_CONFS = {
    "spark.sql.shuffle.partitions": "16",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "Etc/UTC",
}

# Adversarial: different shuffle fan-out, shattered input splits
# (the scratch fixture's files carry ROW_GROUPS row groups each, a
# few KiB apiece, so 16 KiB splits scatter each table's rows across
# several partition indices), no AQE (different physical plans where
# AQE was load-bearing).
PERTURBED_CONFS = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.files.maxPartitionBytes": str(16 * 1024),
    "spark.sql.files.openCostInBytes": str(1024),
    "spark.sql.adaptive.enabled": "false",
    # A mapInPandas / iterator-pandas_udf kernel receives its
    # partition as an ITERATOR of Arrow batches. At sf0.001 every
    # table is under the default 10000-row batch size, so locally
    # every kernel sees exactly one batch per partition and a kernel
    # that silently assumes batch == partition (cross-row state not
    # carried across next(it)) can never be caught — until real data
    # splits it. 64 rows shatters every partition into many batches.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
    # Executors inherit the cluster's zone, not the dev box's. Any
    # result that moves with this conf is wall-clock arithmetic that
    # silently detoured through TIMESTAMP_LTZ (the engine's event
    # time is TIMESTAMP_NTZ end to end; unix_timestamp/window on NTZ
    # are zone-free in Spark 4 — verified — so a hit here is a real
    # lowering bug, not noise). Anchorage: -9h and observes DST.
    "spark.sql.session.timeZone": "America/Anchorage",
}


def build_fixture(dst: str) -> None:
    """Re-materialize every SF_DIR table into `dst` with ROW_GROUPS
    row groups per file: identical rows in identical order, identical
    schema (writer pinned to the source schema so physical types —
    the events nanos timestamp especially — survive), but physically
    SPLITTABLE, which the driver's single-row-group files are not.
    Both passes read this same fixture; only the session confs differ,
    so any result difference is attributable to layout alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    from tiny_etl_multiproc_bigdata_spark.catalog import TABLES

    for name in TABLES:
        src = pq.read_table(f"{SF_DIR}/{name}.parquet")
        if name == "events":
            # ship events as the NANOS vintage (the OTHER encoding
            # catalog.table supports) so the audit exercises the
            # int64-nanos conversion branch board-wide — the branch
            # where the r12 TZ finding lived (LTZ-detour rendered
            # every event in session TZ); committed fixtures are all
            # micros-vintage, leaving that branch otherwise untested
            # against layout/zone perturbation
            i = src.schema.get_field_index("ts")
            src = src.set_column(
                i,
                pa.field("ts", pa.timestamp("ns")),
                src.column("ts").cast(pa.timestamp("ns")),
            )
        n = max(1, src.num_rows // ROW_GROUPS)
        with pq.ParquetWriter(
            f"{dst}/{name}.parquet", src.schema
        ) as writer:
            for start in range(0, src.num_rows, n):
                writer.write_table(src.slice(start, n))

# Entries whose output is DEFINED BY the physical layout — exempt,
# with the contract that makes that the documented behavior rather
# than a bug. Everything else must be bit-identical (mod the 12g
# float normalization) across layouts.
KNOWN_LAYOUT_DEFINED: dict[str, str] = {
    # df.sample draws an independent Bernoulli stream per partition
    # from seed + partition index: once the scan actually splits, a
    # row's partition index changes and so does its draw — a
    # different (equally valid) sample. The entry's contract is the
    # sampling fraction, not the row set (rows-only by design; its
    # docstring says exactly this). Every OTHER sampling/bootstrap
    # entry in the registry derives uniforms from row CONTENT
    # (md5-based), precisely so results don't depend on layout —
    # this is the one deliberate exception, kept as API coverage of
    # df.sample itself.
    "table_sample": (
        "per-partition-index seeded Bernoulli sample; the split "
        "layout defines the draw (fraction is the contract, not the "
        "row set)"
    ),
}


def _canon_result(df):
    from compare import canon

    rows = [tuple(r) for r in df.collect()]
    return canon(rows, list(df.columns))


def _diff(a, b) -> str | None:
    """None if canonical results match; else a classified description."""
    (ac, ar), (bc, br) = a, b
    if ac != bc:
        return f"columns differ: {ac} vs {bc}"
    if len(ar) != len(br):
        return f"row count differs: {len(ar)} vs {len(br)}"
    float_only = True
    first = None
    for i, (ra, rb) in enumerate(zip(ar, br)):
        if ra != rb:
            if first is None:
                first = f"row #{i}: {ra!r} vs {rb!r}"
            for va, vb in zip(ra, rb):
                if va != vb and not (
                    isinstance(va, float) and isinstance(vb, float)
                ):
                    float_only = False
    if first is None:
        return None
    kind = "FLOAT-DRIFT(>12g)" if float_only else "STRUCTURAL"
    return f"{kind} {first}"


def run_pass(spark, names, registry, confs, label: str, sf_dir: str) -> dict:
    """One full-board pass under `confs`; returns name -> canonical
    result tuple, or ('__error__', repr) / ('__watchdog__', '')."""
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.catalog.clearCache()
    sc = spark.sparkContext
    out: dict = {}
    t0 = time.time()
    for i, name in enumerate(names):
        spec = registry[name]
        group = f"payout-{label}-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        cancelled = [False]

        def cancel():
            cancelled[0] = True
            sc.cancelJobGroup(group)
            # job groups are thread-local; streaming entries block in
            # awaitTermination on a stream-execution thread — stop the
            # (serially-run, so necessarily ours) active queries too
            try:
                for q in spark.streams.active:
                    q.stop()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass

        timer = threading.Timer(WATCHDOG_S, cancel)
        timer.start()
        try:
            out[name] = _canon_result(spec.fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — per-entry isolation
            kind = "__watchdog__" if cancelled[0] else "__error__"
            out[name] = (kind, repr(ex)[:300])
        finally:
            timer.cancel()
            sc.setJobGroup("idle", "idle")
        if (i + 1) % 50 == 0:
            print(
                f"[{label}] {i + 1}/{len(names)} {time.time() - t0:.0f}s",
                flush=True,
            )
    print(f"[{label}] TOTAL {time.time() - t0:.1f}s", flush=True)
    return out


def main() -> None:
    only = set(sys.argv[1:])
    from pyspark.sql import SparkSession

    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    bad = sorted(only - set(REGISTRY))
    if bad:
        raise SystemExit(f"not registry entries: {bad}")
    names = [n for n in sorted(REGISTRY) if not only or n in only]

    fix = os.path.join(
        tempfile.mkdtemp(prefix="pinvar_audit_"), "fixture"
    )
    build_fixture(fix)

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .appName("partition-invariance-audit")
        .getOrCreate()
    )

    base = run_pass(spark, names, REGISTRY, BASELINE_CONFS, "baseline", fix)
    pert = run_pass(spark, names, REGISTRY, PERTURBED_CONFS, "perturbed", fix)

    results: dict[str, str] = {}
    for n in names:
        a, b = base[n], pert[n]
        if a[0] in ("__error__", "__watchdog__") or b[0] in (
            "__error__",
            "__watchdog__",
        ):
            results[n] = f"ERROR: baseline={a[0] if a[0].startswith('__') else 'ok'} perturbed={b[0] if b[0].startswith('__') else 'ok'}"
            continue
        d = _diff(a, b)
        if d is None:
            results[n] = "ok"
        elif n in KNOWN_LAYOUT_DEFINED:
            results[n] = (
                f"ok (layout-defined by contract: {KNOWN_LAYOUT_DEFINED[n]})"
            )
        else:
            results[n] = f"MISMATCH {d[:400]}"

    ok = sum(1 for v in results.values() if v.startswith("ok"))
    bad_map = {n: v for n, v in results.items() if not v.startswith("ok")}
    exempt = {
        n: v for n, v in results.items() if v.startswith("ok (layout-")
    }
    print(f"INVARIANCE {ok} ok, {len(bad_map)} non-ok", flush=True)
    # surface which exemptions actually FIRED (diverged and were
    # excused): an exemption that never fires is stale documentation,
    # one that fires for a new name is a finding someone waved through
    print("LAYOUT-DEFINED (diverged, by contract):", sorted(exempt), flush=True)
    print("NON-OK:", {k: v[:200] for k, v in bad_map.items()}, flush=True)


if __name__ == "__main__":
    main()
