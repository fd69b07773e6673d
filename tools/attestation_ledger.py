"""Attestation ledger — the drain's audit trail, printable.

For every registry entry, reports the LATEST committed driver row
(round + verdict, latest-wins — the same derivation the sweep order
uses via plans/registry._attestation_rows) and the tier the entry
occupies in the current queries() ordering (0 = never-attested sample
window, 1 = PENDING _REQUEUE changed-code hygiene, 2 = attested &
current — including inert requeue listings, which sink automatically
once a row of round >= their requeue vintage lands; r12, VERDICT r11
item 2). Lets a reviewer verify in one read that

  * the next round's 50-row sample window contains only entries that
    NEED a row — never-sampled ones first, then pending requeues
    (drain discipline: window ∩ current-attested = ∅),
  * no red row is being counted as attested (latest-wins),
  * rows-only attestations are confined to the oracle=None-by-design
    set,
  * which requeue listings are still live debt (pending: latest row
    predates the requeue round) vs inert history awaiting the
    remove-at-next-touch prune.

Usage:  python tools/attestation_ledger.py [--json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WINDOW = 50  # the driver's per-round sample size


def build_ledger(root: str | None = None) -> dict:
    from tiny_etl_multiproc_bigdata_spark.plans.registry import (
        REGISTRY,
        _REQUEUE_VINTAGE,
        _ROWS_ONLY_BY_DESIGN,
        _driver_attested,
        _load_all,
        _ordered_names,
        _requeue_pending,
    )

    _load_all()
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # Recompute against `root` (not the import-time module constants)
    # so the ledger can be pointed at a synthetic CORRECTNESS set in
    # tests; with root=None this equals the registry's own view.
    checked = _driver_attested(root)
    pending = _requeue_pending(root)

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
    live = set(names)
    entries = []
    for pos, n in enumerate(names):
        rnd, verdict = latest.get(n, (None, "never_sampled"))
        tier = 0 if n not in checked else (1 if n in pending else 2)
        e = {
            "pos": pos,
            "name": n,
            "tier": tier,
            "last_round": rnd,
            "verdict": verdict,
            "rows_only_by_design": n in _ROWS_ONLY_BY_DESIGN,
        }
        if n in _REQUEUE_VINTAGE:
            e["requeue_round"] = _REQUEUE_VINTAGE[n]
            e["requeue_state"] = "pending" if n in pending else "inert"
        entries.append(e)

    n_never = sum(1 for e in entries if e["verdict"] == "never_sampled")
    # The next sample window is everything that still NEEDS a row:
    # tier 0 (never sampled / regressed-red) then tier 1 (pending
    # requeues), capped at the driver's 50-row budget. Before r12 the
    # window stopped at never-sampled entries, so once the original
    # drain completed it printed empty while 44 pending requeues were
    # actually next in line (VERDICT r11 item 2). Count by TIER, not by
    # verdict: tier 0 also contains regressed-RED entries (sampled but
    # not attested), which owe a row just like never-sampled ones — the
    # verdict-based count truncated the window by one slot per red,
    # silently pushing pending requeues out (r12 ADVICE item 1).
    n_need = sum(1 for e in entries if e["tier"] in (0, 1))
    window_entries = entries[: min(WINDOW, n_need)]
    # clean = every window slot is spent on an entry that OWES a row
    # (tier 0: never-sampled or regressed-red; tier 1: pending requeue)
    # — never on an attested-and-current one.
    window_clean = all(e["tier"] in (0, 1) for e in window_entries)
    return {
        "registry": len(REGISTRY),
        "attested": len(checked & live),
        "never_sampled": n_never,
        "requeue": [n for n in _REQUEUE_VINTAGE if n in live],
        "requeue_pending": [
            e["name"] for e in entries if e.get("requeue_state") == "pending"
        ],
        "requeue_inert": [
            e["name"] for e in entries if e.get("requeue_state") == "inert"
        ],
        "next_sample_window_clean": window_clean,
        "next_sample_window": [e["name"] for e in window_entries],
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
        f"requeue_pending={len(ledger['requeue_pending'])} "
        f"requeue_inert={len(ledger['requeue_inert'])} "
        f"window_clean={ledger['next_sample_window_clean']}"
    )
    if ledger["requeue_inert"]:
        print(
            "inert requeue listings (prune at next registry touch): "
            + ", ".join(ledger["requeue_inert"])
        )
    for e in ledger["entries"]:
        if e["verdict"] in ("RED", "no_oracle_UNEXPECTED"):
            print(f"!! {e['name']}: {e['verdict']} (r{e['last_round']})")
    print("next sample window:")
    for n in ledger["next_sample_window"]:
        print(f"  {n}")


if __name__ == "__main__":
    main()
