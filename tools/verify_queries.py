"""Targeted driver-sim verify: run named registry queries against
their DuckDB oracles (order-insensitive rows+schema compare, the
tests/compare.py harness == the driver's t2 check) at one or more SFs.

Usage: python tools/verify_queries.py [--sf 0.01[,0.1]] name [name ...]

VERDICT r13 item 8: the driver's rotating 50-query sample left 23 of
28 rewritten queries unverified by the driver; this tool produces the
committed board for every query an optimization round touches.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sfs = ["0.01"]
    if args and args[0] == "--sf":
        sfs = args[1].split(",")
        args = args[2:]
    names = args
    if not names:
        print("usage: verify_queries.py [--sf 0.01,0.1] name ...")
        sys.exit(2)

    from tiny_etl_multiproc_bigdata_spark.session import get_spark
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        queries,
        oracle_sql,
    )
    from tests.compare import canon, duck_connect

    spark = get_spark(app_name="verify-queries")
    q = queries()
    o = oracle_sql()
    board: dict[str, dict] = {}
    n_bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duck_connect(sf_dir)
        for name in names:
            key = f"{name}@sf{sf}"
            try:
                df = q[name](spark, sf_dir)
                s_rows = df.collect()
                s_cols = df.columns
                rel = con.execute(o[name])
                d_cols = [d[0] for d in rel.description]
                d_rows = rel.fetchall()
                sc, sr = canon(s_rows, s_cols)
                dc, dr = canon(d_rows, d_cols)
                ok = sc == dc and sr == dr
                board[key] = {
                    "ok": bool(ok),
                    "spark_rows": len(s_rows),
                    "oracle_rows": len(d_rows),
                }
                if not ok:
                    n_bad += 1
                    board[key]["first_diff"] = next(
                        (
                            {"spark": repr(a)[:200], "oracle": repr(b)[:200]}
                            for a, b in zip(sr, dr)
                            if a != b
                        ),
                        {"note": "row count or schema mismatch",
                         "spark_cols": sc, "oracle_cols": dc},
                    )
            except Exception as exc:  # noqa: BLE001
                n_bad += 1
                board[key] = {"ok": False, "err": repr(exc)[:300]}
            print(f"{key}: {'OK' if board[key]['ok'] else 'FAIL'}", flush=True)
        con.close()
    print(json.dumps(board, indent=1))
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
