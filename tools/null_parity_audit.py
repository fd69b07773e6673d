"""NULL-injection differential audit — the instrument version of the
r11 `window_range_interval_frame` null-safe-join finding.

That bug's CLASS: a lowering that computes per-row results and hands
them back through an equi-join on columns the oracle's semantics keep
as NULL groups (window PARTITION BY / ORDER BY, GROUP BY) silently
drops NULL-keyed rows — and stays green forever on the NULL-free
driver fixtures. Hand-auditing every join-back is hopeless at 435
entries; this tool finds the class mechanically:

  1. build a fixture dir that is sf0.001 verbatim EXCEPT events /
     documents / embeddings get a handful of NULL-spiked rows (every
     nullable column, alone and in combination, appended with the
     exact pyarrow schema so physical types survive);
  2. run EVERY oracle-paired registry entry on Spark AND DuckDB over
     that same dir and diff with the driver's comparator
     (tests/compare.py — row count + columns + normalized values);
  3. report ok / MISMATCH / error per entry.

PARITY is the bar, not "handles NULLs gracefully": if both engines
drop a NULL row the same way (e.g. an inner join key), that's green —
only behavioral DIVERGENCE between the engine and its own declared
oracle is a finding. Entries without an oracle are smoke-run
(.count()) to catch NULL-input crashes.

The relational TPC-H tables are NOT spiked: their columns are NOT NULL
by spec, so NULL behavior there is not a contract anyone holds.

    python tools/null_parity_audit.py            # full board, NULL spikes
    python tools/null_parity_audit.py name1 ...  # just these entries
    python tools/null_parity_audit.py --empty    # zero-row tables instead
                                                 # (the empty-date-slice
                                                 # robustness board)
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import pyarrow as pa
import pyarrow.parquet as pq

# Same override tests/conftest.py honors (ADVICE r11): the spiked
# fixture derives from the real sf0.001 tables, so point both at the
# same place on machines where /root/testdata does not exist.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
WATCHDOG_S = 120

_TS = datetime.datetime(2021, 6, 15, 12, 0, 0)


def _spiked_events() -> list[dict]:
    """NULLs in every nullable column, alone and combined. event_ids
    continue past the fixture's range so spikes never collide."""
    base = dict(
        event_id=0, ts=_TS, user_id=7, event_type="click", value=1.5, props="{}"
    )
    out = []
    combos = [
        {"ts": None},
        {"event_type": None},
        {"value": None},
        {"user_id": None},
        {"props": None},
        {"ts": None, "event_type": None},
        {"ts": None, "value": None},
        {"event_type": None, "value": None},
        {"user_id": None, "event_type": None},
        {"ts": None, "user_id": None, "event_type": None, "value": None,
         "props": None},
        # duplicates of a NULL key — NULL groups with >1 member
        {"event_type": None},
        {"ts": None},
        # NULL keys on the event types entries FILTER on (the asof
        # family keeps purchase rows and scans signup/click context —
        # a NULL-ts click alone never reaches their output)
        {"ts": None, "event_type": "purchase"},
        {"ts": None, "event_type": "signup"},
        {"value": None, "event_type": "purchase"},
        {"user_id": None, "event_type": "purchase"},
        # NULL-user CONTEXT rows (review of the r11 audit): without a
        # NULL-user signup/click, a by-key window that wrongly groups
        # NULL users has no right-side rows to mis-match, so the
        # divergence class stays invisible (found live in
        # _ps_merge_asof_backward)
        {"user_id": None, "event_type": "signup"},
        {"user_id": None, "event_type": "click"},
        # an all-NULL-value group: kernels that build typed output
        # from min/max of a group's values must not infer a null
        # Arrow column
        {"value": None, "event_type": "refund"},
        {"value": None, "event_type": "refund"},
    ]
    for i, combo in enumerate(combos):
        row = dict(base, event_id=1_000_000 + i)
        row.update(combo)
        # vary the non-null values a little so aggregates are non-trivial
        if row["value"] is not None:
            row["value"] = 1.5 + i
        if row["ts"] is not None:
            row["ts"] = _TS + datetime.timedelta(hours=i)
        out.append(row)
    return out


def _spiked_documents() -> list[dict]:
    base = dict(doc_id=0, text="the quick brown fox", lang="en",
                source="src0", n_chars=19)
    combos = [
        {"text": None},
        {"lang": None},
        {"source": None},
        {"n_chars": None},
        {"text": None, "lang": None, "source": None, "n_chars": None},
        {"source": None},
    ]
    out = []
    for i, combo in enumerate(combos):
        row = dict(base, doc_id=1_000_000 + i)
        row.update(combo)
        out.append(row)
    return out


def _spiked_embeddings() -> list[dict]:
    out = [
        {"vec_id": 1_000_000, "embedding": None, "label": 3},
        {"vec_id": 1_000_001, "embedding": [0.5] * 64, "label": None},
        {"vec_id": 1_000_002, "embedding": None, "label": None},
        # NULL ELEMENTS inside a non-NULL array (r12 matrix extension
        # per the standing obligation): schema-legal (list<element:
        # float> is element-nullable) and the realistic shape of a
        # partially-failed decode at corpus scale — a DIFFERENT class
        # from embedding-IS-NULL, exercising element-wise kernels
        # (F.aggregate/zip_with dot products, Arrow-batched numpy
        # paths, PQ code assignment) where one NULL term must not
        # silently zero/crash while the oracle's list arithmetic
        # NULL-propagates.
        {
            "vec_id": 1_000_003,
            "embedding": [0.5] * 32 + [None] + [0.25] * 31,
            "label": 3,
        },
    ]
    return out


def build_fixture(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    spikes = {
        "events": _spiked_events(),
        "documents": _spiked_documents(),
        "embeddings": _spiked_embeddings(),
    }
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        shutil.copy(f"{SF_DIR}/{name}.parquet", f"{dst}/{name}.parquet")
    for name, rows in spikes.items():
        src = pq.read_table(f"{SF_DIR}/{name}.parquet")
        # strip pandas metadata; build the spike batch on the SAME
        # physical schema so e.g. timestamp[us] survives verbatim
        schema = pa.schema([src.schema.field(i) for i in range(len(src.schema))])
        cols = {
            f.name: [r[f.name] for r in rows] for f in schema
        }
        spike = pa.table(cols, schema=schema)
        out = pa.concat_tables([src.cast(schema), spike])
        pq.write_table(out, f"{dst}/{name}.parquet")


def build_empty_fixture(dst: str) -> None:
    """--empty mode: every table schema-identical but ZERO rows — the
    shape of an empty date-slice / fresh partition at 100 TB. Stresses
    a different failure set than the NULL spikes: global aggregates
    (one row with NULL/0 in SQL vs whatever the lowering collects),
    driver-side .first() guards, element_at over empty collects,
    percentile bounds on no data."""
    os.makedirs(dst, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        # schema-only read: no reason to deserialize data pages just
        # to slice them away (metadata stripped like build_fixture)
        src_schema = pq.read_schema(f"{SF_DIR}/{name}.parquet")
        schema = pa.schema(
            [src_schema.field(i) for i in range(len(src_schema))]
        )
        pq.write_table(schema.empty_table(), f"{dst}/{name}.parquet")


# --empty mode only: engine-level semantic deviations on ZERO-row
# input that are documented rather than worked around (each would
# need a count-then-union plan distortion to paper over):
#
# - Spark's rollup/cube/grouping-sets emit NO rows over empty input,
#   dropping even the global () grouping set, where the SQL standard
#   (and DuckDB) aggregate the empty input to one grand-total row —
#   verified directly: df.rollup(a).count() -> [] vs groupBy() -> [0].
# - DataFrame.transpose derives its output COLUMNS from the data, so
#   an empty summary frame transposes to a key-only schema while the
#   oracle's static F/O/P columns exist regardless — the documented
#   contract of a data-dependent-schema API.
# value = (expected-result-prefix, reason): the mask applies ONLY when
# the failure matches the documented signature — any OTHER failure in
# these entries (crash, wrong per-key values) still reds the board.
_KNOWN_EMPTY_DEVIATIONS: dict[str, tuple[str, str]] = {
    "agg_rollup": (
        "MISMATCH: row count differs: spark=0 duckdb=",
        "Spark rollup omits the () grouping set on empty input",
    ),
    "agg_cube": (
        "MISMATCH: row count differs: spark=0 duckdb=",
        "Spark cube omits the () grouping set on empty input",
    ),
    "time_grouping_sets_rollup": (
        "MISMATCH: row count differs: spark=0 duckdb=",
        "Spark grouping-sets omit the () grouping set on empty input",
    ),
    "transpose_status_metrics": (
        "MISMATCH: columns differ:",
        "transpose derives columns from data; empty input has none",
    ),
}


def main() -> None:
    args = sys.argv[1:]
    empty_mode = "--empty" in args
    unknown = [a for a in args if a.startswith("--") and a != "--empty"]
    if unknown:
        raise SystemExit(f"unknown flag(s): {unknown}; only --empty is supported")
    only = set(a for a in args if a != "--empty")
    from pyspark.sql import SparkSession

    from compare import compare  # tests/compare.py
    import duckdb

    from tiny_etl_multiproc_bigdata_spark.catalog import TABLES
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    from tiny_etl_multiproc_bigdata_spark.plans.registry import REGISTRY as _R
    bad_names = sorted(only - set(_R))
    if bad_names:
        raise SystemExit(f"not registry entries: {bad_names}")
    scratch = tempfile.mkdtemp(prefix="null_audit_")
    fix = os.path.join(scratch, "fixture")
    (build_empty_fixture if empty_mode else build_fixture)(fix)

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("null-parity-audit")
        .getOrCreate()
    )
    sc = spark.sparkContext
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fix}/{t}.parquet')"
        )

    results: dict[str, str] = {}
    names = [n for n in sorted(REGISTRY) if not only or n in only]
    t_all = time.time()
    for i, name in enumerate(names):
        spec = REGISTRY[name]
        group = f"nullaudit-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        cancelled = [False]

        def cancel():
            cancelled[0] = True
            sc.cancelJobGroup(group)
            # Job groups are thread-local: a registry entry that runs a
            # StreamingQuery executes its micro-batches on the stream
            # execution thread and blocks this one in awaitTermination,
            # so cancelJobGroup alone cannot interrupt it (ADVICE r11).
            # Stop every active query too — the audit runs entries
            # serially, so anything active belongs to the hung entry,
            # and stop() unblocks awaitTermination on the main thread.
            try:
                for q in spark.streams.active:
                    q.stop()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass

        timer = threading.Timer(WATCHDOG_S, cancel)
        timer.start()
        try:
            df = spec.fn(spark, fix)
            if spec.oracle is None:
                df.count()
                results[name] = "ok (rows-only)"
            else:
                problems = compare(df, con, spec.oracle, spec.ulp_sensitive)
                results[name] = (
                    "ok" if not problems else "MISMATCH: " + "; ".join(problems)[:400]
                )
        except Exception as ex:  # noqa: BLE001 — per-entry isolation
            kind = "WATCHDOG" if cancelled[0] else "error"
            results[name] = f"{kind}: {repr(ex)[:300]}"
        finally:
            timer.cancel()
            sc.setJobGroup("idle", "idle")
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{len(names)} {time.time() - t_all:.0f}s", flush=True)

    if empty_mode:
        for n, (sig, why) in _KNOWN_EMPTY_DEVIATIONS.items():
            if n in results and results[n].startswith(sig):
                results[n] = f"ok (known empty-input deviation: {why})"
    ok = sum(1 for v in results.values() if v.startswith("ok"))
    bad = {n: v for n, v in results.items() if not v.startswith("ok")}
    print(f"TOTAL {time.time() - t_all:.1f}s; {ok} ok, {len(bad)} non-ok", flush=True)
    print("NON-OK:", json.dumps(bad, indent=1, sort_keys=True), flush=True)
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
