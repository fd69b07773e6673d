"""Attestation ledger — the drain's audit trail, printable.

For every registry entry, reports the LATEST committed driver row
(round + verdict, latest-wins — the same derivation the sweep order
uses via plans/registry._attestation_rows) and the tier the entry
occupies in the current queries() ordering (0 = never-attested sample
window, 1 = _REQUEUE changed-code hygiene, 2 = attested & current).
Lets a reviewer verify in one read that

  * the next round's 50-row sample window contains only never-sampled
    entries (drain discipline: sample ∩ prior rounds = ∅),
  * no red row is being counted as attested (latest-wins),
  * rows-only attestations are confined to the oracle=None-by-design
    set.

Usage:  python tools/attestation_ledger.py [--json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_ledger() -> dict:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _CHECKED,
        _REQUEUE,
        _ROWS_ONLY_BY_DESIGN,
        _load_all,
        _ordered_names,
    )

    _load_all()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # per-name: (round, verdict-string) of the latest row
    latest: dict[str, tuple[int, str]] = {}
    import glob

    def _round_no(path: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    for path in sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=_round_no
    ):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        rnd = _round_no(path)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                verdict = (
                    "rows_only"
                    if name in _ROWS_ONLY_BY_DESIGN
                    else "no_oracle_UNEXPECTED"
                )
            elif (
                row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            ):
                verdict = "pass"
            else:
                verdict = "RED"
            latest[name] = (rnd, verdict)

    names = _ordered_names()
    entries = []
    for pos, n in enumerate(names):
        rnd, verdict = latest.get(n, (None, "never_sampled"))
        tier = (
            0
            if n not in _CHECKED
            else (1 if n in _REQUEUE else 2)
        )
        entries.append(
            {
                "pos": pos,
                "name": n,
                "tier": tier,
                "last_round": rnd,
                "verdict": verdict,
                "rows_only_by_design": n in _ROWS_ONLY_BY_DESIGN,
            }
        )
    n_never = sum(1 for e in entries if e["verdict"] == "never_sampled")
    window = [e["name"] for e in entries[: min(50, max(n_never, 1))]]
    return {
        "registry": len(REGISTRY),
        "attested": len(_CHECKED & set(names)),
        "never_sampled": n_never,
        "requeue": [n for n in _REQUEUE if n in set(names)],
        "next_sample_window_clean": all(
            e["verdict"] == "never_sampled"
            for e in entries[: min(50, n_never)]
        ),
        "next_sample_window": window[: min(50, n_never)] or [],
        "entries": entries,
    }


def main() -> None:
    ledger = build_ledger()
    if "--json" in sys.argv:
        print(json.dumps(ledger, indent=1))
        return
    print(
        f"registry={ledger['registry']} attested={ledger['attested']} "
        f"never_sampled={ledger['never_sampled']} "
        f"requeue={len(ledger['requeue'])} "
        f"window_clean={ledger['next_sample_window_clean']}"
    )
    for e in ledger["entries"]:
        if e["verdict"] in ("RED", "no_oracle_UNEXPECTED"):
            print(f"!! {e['name']}: {e['verdict']} (r{e['last_round']})")
    print("next sample window:")
    for n in ledger["next_sample_window"]:
        print(f"  {n}")


if __name__ == "__main__":
    main()
